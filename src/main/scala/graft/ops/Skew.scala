package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §2.12 scale notes).
  *
  * AQE's skew-join split handles most hot keys at runtime; explicit
  * salting is the fallback when one build-side key is so hot that even a
  * split shuffle partition can't hold it (the classic null-key /
  * celebrity-key problem at 100 TB). `saltedJoin` is semantically
  * identical to `left.join(right, keys)` — verified by the equivalence
  * spec — but shards each hot key across `salts` shuffle partitions.
  */
object Skew {

  /** Inner equi-join with the LEFT side salted and the RIGHT side
    * replicated `salts` times. Use when `right` is small enough to
    * replicate (dimension-sized) but too skew-hot to broadcast whole,
    * or when AQE is unavailable. Row-for-row equal to the unsalted join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight,
        saltedLeft(key) === saltedRight(key) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop(saltedRight(key)).drop("__salt")
  }

  /** Top-N hottest values of `col` with counts — the diagnostic that
    * decides between broadcast, AQE skew split, and salting.
    */
  def keyHistogram(df: DataFrame, c: Column, topN: Int = 20): DataFrame =
    df.groupBy(c.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).limit(topN)

  /** Join-key fanout profile (q120): per power-of-two fanout class of
    * `l_orderkey`, how many keys and rows land there and each class's
    * share of all rows — the quantified answer to "is this join key
    * skewed enough to need salting". Unlike [[keyHistogram]] (top-N
    * hottest keys) this is a full distribution in a bounded number of
    * rows: one per-key count aggregate, one ≤64-class histogram, and a
    * window over those classes; nothing downstream of the first
    * aggregate scales with the table. The class index reuses the exact
    * integer floor(log2) trick (`length(bin(n)) - 1`).
    */
  def keySkewProfile(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val perKey = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_orderkey")
      .groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
    val classes = perKey
      .withColumn("fanout_class", (length(bin($"n")) - 1).cast("long"))
      .groupBy($"fanout_class")
      .agg(count(lit(1)).as("n_keys"), sum($"n").as("rows_in_class"),
        max($"n").as("max_fanout"))
    val total = org.apache.spark.sql.expressions.Window.partitionBy()
    classes.withColumn("share_rows",
      round($"rows_in_class" / sum($"rows_in_class").over(total), 6))
  }
}
