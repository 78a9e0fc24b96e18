package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values distinct sketch as a typed [[Aggregator]]: the state
  * is the k smallest DISTINCT hash values seen, kept sorted ascending.
  * Companion of [[MisraGries]] (frequencies) on the cardinality side —
  * from one KMV per group you get a distinct-count estimate
  * ((k−1)/normalized kth value, Bar-Yossef et al. 2002) and, from two,
  * the Beyer et al. 2007 Jaccard estimator |A_k ∩ B_k ∩ U_k| / |U_k|
  * where U_k is the k smallest of the union.
  *
  * Distribution shape: partial aggregation folds one capped sorted array
  * per partition and merges by sorted-merge-keep-k — O(k) state per
  * partial regardless of input size, so a per-source corpus-overlap pass
  * at 100 TB shuffles #sources × k longs instead of the full distinct
  * shingle set (contrast `sourceVocabOverlap`, which is exact and pays
  * the vocabulary-sized shuffle). Deterministic given the input hashes:
  * no RNG, so a DuckDB oracle replays it with row_number over the same
  * md5-derived values.
  */
object KmvSketch {

  /** Insert one value into a sorted-ascending capped buffer. */
  private[functions] def insert(b: Vector[Long], v: Long, k: Int): Vector[Long] = {
    if (b.length >= k && v >= b.last) b
    else {
      val i = searchInsert(b, v)
      if (i < b.length && b(i) == v) b // already present
      else {
        val grown = (b.take(i) :+ v) ++ b.drop(i)
        if (grown.length > k) grown.dropRight(grown.length - k) else grown
      }
    }
  }

  /** First index whose value is >= v (binary search on sorted vector). */
  private def searchInsert(b: Vector[Long], v: Long): Int = {
    var lo = 0
    var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Sorted-merge two sketches, dedup, keep the k smallest. */
  private[functions] def mergeTwo(b1: Vector[Long], b2: Vector[Long], k: Int): Vector[Long] = {
    val out = Vector.newBuilder[Long]
    var i = 0
    var j = 0
    var n = 0
    var last = Long.MinValue
    var first = true
    while (n < k && (i < b1.length || j < b2.length)) {
      val v =
        if (j >= b2.length || (i < b1.length && b1(i) <= b2(j))) { val x = b1(i); i += 1; x }
        else { val x = b2(j); j += 1; x }
      if (first || v != last) {
        out += v
        n += 1
        last = v
        first = false
      }
    }
    out.result()
  }

  private class KmvAggregator(k: Int)
      extends Aggregator[Long, Vector[Long], Seq[Long]] {
    require(k > 0, s"KMV sketch size k must be positive, got $k")
    override def zero: Vector[Long] = Vector.empty
    override def reduce(b: Vector[Long], a: Long): Vector[Long] = insert(b, a, k)
    override def merge(b1: Vector[Long], b2: Vector[Long]): Vector[Long] =
      mergeTwo(b1, b2, k)
    override def finish(r: Vector[Long]): Seq[Long] = r
    override def bufferEncoder: ExpressionEncoder[Vector[Long]] =
      ExpressionEncoder[Vector[Long]]()
    override def outputEncoder: ExpressionEncoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Column aggregate: `kmvSketch(k)(hashCol)` → array<bigint>, sorted
    * ascending, the k smallest distinct values.
    */
  def kmvSketch(k: Int): Column => Column = {
    val f = udaf(new KmvAggregator(k), ExpressionEncoder[Long]())
    (c: Column) => f(c)
  }
}
