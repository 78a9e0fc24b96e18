package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class TablesSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("spark.sql runs over registered views and custom functions") {
    Tables.register(spark, sf)
    val joined = spark.sql(
      """SELECT n_name, count(*) AS n FROM customer
        |JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name""".stripMargin)
    assert(joined.count() > 0)

    val vec = spark.sql(
      """SELECT vec_id, round(vec_dot(embedding, embedding) /
        |  (vec_norm(embedding) * vec_norm(embedding)), 6) AS self_cos
        |FROM embeddings LIMIT 5""".stripMargin).collect()
    assert(vec.forall(_.getDouble(1) == 1.0)) // v·v / |v|² ≡ 1

    val events = spark.sql(
      "SELECT count(*) AS n, min(ts) AS t0 FROM events WHERE ts IS NOT NULL")
    assert(events.head().getLong(0) > 0)

    val ch = spark.sql(
      """SELECT count(DISTINCT lower(hex(
        |  chunk_hash(CAST(doc_id AS STRING), 0L, encode(text, 'UTF-8'), 'sha256')))) AS n
        |FROM documents""".stripMargin).head().getLong(0)
    assert(ch > 0)
  }

  test("SQL view results agree with the DataFrame operators") {
    Tables.register(spark, sf)
    val sqlCount = spark.sql(
      "SELECT count(*) FROM lineitem WHERE l_shipdate < '1999-01-01'").head().getLong(0)
    val dfCount = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(org.apache.spark.sql.functions.col("l_shipdate") < "1999-01-01").count()
    assert(sqlCount == dfCount)
  }
}
