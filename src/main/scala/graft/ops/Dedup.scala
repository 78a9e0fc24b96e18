package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (north-star surface): exact
  * content-hash dedup, MinHash banding for near-dup candidates, and n-gram
  * Jaccard verification.
  *
  * Scale shape: exact dedup is one hash-groupBy (shuffle on a 64-hex key).
  * MinHash banding shuffles (band, signature) pairs — O(docs × bands) tiny
  * rows — then joins only within buckets, which is the standard way to
  * avoid the quadratic all-pairs comparison at 100 TB. The Jaccard join
  * here verifies candidates; it is never run all-pairs.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private def toks: Column = split(col("text"), " ")

  /** Word 3-gram shingles of the tokenized text. */
  private def shingles: Column = {
    val t = toks
    transform(
      sequence(lit(0), size(t) - lit(3)),
      i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))
  }

  /** Exact dedup via content hash: sha256 groups, keeper = min doc_id.
    * Reuses the engine's hashing idea relationally (the reference's F3
    * machinery as a groupBy key — SURVEY.md §2.12).
    */
  def exactDuplicates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .groupBy(sha2($"text", 256).as("content_hash"))
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("copies"))
  }

  /** MinHash signatures, b bands × 1 row each: band h's signature is the
    * minimum md5 over the doc's shingles salted with the band id. Banding
    * turns near-dup search into an equi-join on (band, sig).
    */
  def minhashSignatures(spark: SparkSession, dir: String, bands: Int = 4): DataFrame = {
    import spark.implicits._
    val sh = docs(spark, dir)
      .select($"doc_id", explode(shingles).as("sh"))
    (0 until bands).map { b =>
      sh.groupBy($"doc_id")
        .agg(min(md5(concat(lit(s"$b|"), $"sh"))).as("sig"))
        .select($"doc_id", lit(b).as("band"), $"sig")
    }.reduce(_ union _)
  }

  /** Near-dup candidate pairs: docs sharing any band signature. */
  def minhashCandidates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = minhashSignatures(spark, dir)
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Shingle-set Jaccard similarity for the most-similar doc pairs.
    * Computes |A∩B| via a shingle equi-join and |A∪B| = |A|+|B|-|A∩B|;
    * thresholded so the join output stays sparse.
    */
  def jaccardPairs(spark: SparkSession, dir: String, minJaccard: Double = 0.05): DataFrame = {
    import spark.implicits._
    val sh = docs(spark, dir)
      .select($"doc_id", explode(array_distinct(shingles)).as("sh"))
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val common = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("sa"), $"doc_a" === $"sa.doc_id")
      .join(sizes.as("sb"), $"doc_b" === $"sb.doc_id")
      .select($"doc_a", $"doc_b", $"common",
        round($"common".cast("double") /
          (col("sa.n") + col("sb.n") - $"common"), 6).as("jaccard"))
      .filter($"jaccard" >= minJaccard)
  }
}
