package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** All-empty-corpus robustness: a 100-TB pipeline routinely meets an
  * empty source, partition, or snapshot — every docs/embeddings/events
  * query must PLAN AND RUN on 0-row tables (NullTextSpec covers the
  * degraded-rows case; this suite pins the fully-empty one). The
  * invariant is no-throw; an empty or zero-row result is each
  * operator's own contract.
  */
class EmptyCorpusSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark

  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val eventSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(new java.util.ArrayList[Row](), docSchema)
      .write.parquet(s"$tmp/documents.parquet")
    spark.createDataFrame(new java.util.ArrayList[Row](), embSchema)
      .write.parquet(s"$tmp/embeddings.parquet")
    spark.createDataFrame(new java.util.ArrayList[Row](), eventSchema)
      .write.parquet(s"$tmp/events.parquet")
    tmp
  }

  // same scoping as NullTextSpec: the relational (tpch) queries read
  // tables this corpus doesn't carry
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
    test(s"$name does not throw on an all-empty corpus") {
      fn(spark, dir).collect()
    }
}
