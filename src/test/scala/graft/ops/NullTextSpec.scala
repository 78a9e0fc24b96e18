package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Degraded-corpus robustness: the documents contract admits null and
  * empty text (the ADVICE-r3 mediaTable NPE class), so EVERY query must
  * plan and run — not throw — on a corpus containing both, alongside
  * empty embeddings/events side tables. Output semantics for such rows
  * are engine-defined per operator (null stats, dropped rows); the
  * invariant this suite pins is no-throw.
  */
class NullTextSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark

  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-nulltext").toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val text1 = "the quick brown fox jumps over a lazy dog and runs to the data lake"
    val rows = java.util.Arrays.asList(
      Row(1L, text1, "en", "s1", text1.length.toLong),
      Row(2L, null, "en", "s1", 0L),
      Row(3L, "", "de", "s2", 0L))
    spark.createDataFrame(rows, docSchema)
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val eventSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(new java.util.ArrayList[Row](), embSchema)
      .write.parquet(s"$tmp/embeddings.parquet")
    spark.createDataFrame(new java.util.ArrayList[Row](), eventSchema)
      .write.parquet(s"$tmp/events.parquet")
    tmp
  }

  // the relational (tpch) queries read tables this corpus doesn't carry.
  // Match the full qNN prefix — take(3) would make q100+ collide with q10
  private def readsDocsOnly(name: String): Boolean = {
    val tpch = Set("q01", "q02", "q03", "q04", "q05", "q06", "q07", "q08",
      "q09", "q10", "q11", "q12", "q29", "q37", "q38", "q42", "q43", "q44",
      "q58", "q71", "q111", "q114", "q115", "q120", "q141", "q149",
      "q150", "q151", "q156", "q173", "q217", "q218", "q219",
      "q259", "q260", "q266", "q267", "q273", "q274", "q278", "q279",
      "q281", "q282", "q283", "q284", "q285", "q286", "q287", "q288",
      "q289", "q290", "q291", "q292")
    !tpch.contains(name.takeWhile(_ != '_'))
  }

  for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
      if readsDocsOnly(name))
    test(s"$name does not throw on null/empty text") {
      fn(spark, dir).collect()
      ()
    }
}
