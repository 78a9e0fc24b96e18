package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sensitivity harness behind BASELINE.md's validation table: the
  * documents/embeddings tables replicated k× (ids shifted per replica, so
  * every doc exists in k byte-identical copies — the near-dup worst case)
  * and the dedup / similarity / pipeline-prep queries timed at each
  * factor. Prints one JSON line per (factor, query) with secs + rows.
  *
  * Usage: ScaleBench [outBaseDir] [factors...]   (defaults: /tmp/graft_scale 1 3 10)
  */
object ScaleBench {

  private val queriesUnderTest = Seq(
    "q13_exact_duplicates", "q14_minhash_signatures", "q15_minhash_candidates",
    "q16_jaccard_pairs", "q27_simhash", "q28_simhash_near_dups",
    "q39_deduped_jaccard", "q41_dedup_clusters",
    "q17_cosine_topk", "q19_ann_ivf_topk", "q31_srp_lsh_ann",
    "q45_doc_chunks", "q46_quality_topk_per_lang", "q47_stratified_sample",
    "q48_text_cleaning", "q49_char_bigram_profile", "q50_label_centroid_stats",
    "q51_cosine_near_dup_lsh", "q52_repetition_ratio", "q53_boilerplate_phrases",
    "q54_knn_graph", "q55_quantization_error", "q56_training_mix")

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_scale")
    val factors = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(1, 3, 10)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def replicate(table: String, idCol: String, k: Int, outDir: String): Unit = {
      val df = spark.read.parquet(s"$srcDir/$table.parquet")
      val maxId = df.agg(max(col(idCol))).head().getLong(0) + 1
      val reps = spark.range(k).select($"id".as("rep"))
      df.crossJoin(reps)
        .withColumn(idCol, col(idCol) + $"rep" * maxId)
        .drop("rep")
        .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    }

    for (k <- factors) {
      val dir = s"$base/x$k"
      replicate("documents", "doc_id", k, dir)
      replicate("embeddings", "vec_id", k, dir)
      for (name <- queriesUnderTest) {
        val fn = SparkEntry.queries(name)
        // timed: the noop materialization only (same action Bench times);
        // the row count runs separately, untimed — count()+write would
        // execute the query twice and double every number
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"$name@x$k: $e"); false }
        val secs = (System.nanoTime() - t0) / 1e9
        val rows = if (ok) fn(spark, dir).count() else -1L
        println(f"""{"factor":$k,"query":"$name","secs":$secs%.2f,"rows":$rows}""")
      }
    }
    spark.stop()
  }
}
