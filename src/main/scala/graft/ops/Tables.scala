package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-surface entry point: registers every testdata table as a temp view
  * plus the engine's custom functions (vec_dot, vec_norm, chunk_hash), so
  * `spark.sql("SELECT ...")` works over the same names the DuckDB oracle
  * uses. The events view exposes both the raw nano `ts_ns` and a
  * microsecond `ts` timestamp (Spark's parquet reader rejects
  * TIMESTAMP(NANOS) columns outright).
  */
object Tables {

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit = {
    graft.functions.VectorOps.register(spark)
    graft.functions.ChunkHashOps.register(spark)
    names.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts_ns div 1000")))
      .createOrReplaceTempView("events")
  }

  /** Convenience: register + run one SQL statement. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    spark.sql(query)
  }
}
