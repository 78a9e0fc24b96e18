package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The PQ-training (block, code, dim) rollup as ONE mergeable typed
  * [[Aggregator]]: per input row (its per-block code assignment + its
  * e6-quantized components), accumulate component sums and member
  * counts for every (block, assigned code, in-block dim) cell, plus the
  * global component minimum (the floor-division guard's witness).
  *
  * This replaces the posexplode route, which multiplied the corpus ×dim
  * into (block, code, dim, x) rows and shuffled them into a 4096-key
  * groupBy — at 10× that was 38M exploded rows per Lloyd round. Here
  * the scan folds into a flat long[1 + blocks·codes + blocks·codes·bw]
  * buffer (≤ ~32 KB at the 16×64 sweep config), partials merge
  * elementwise, and the shuffle carries one buffer per partition
  * instead of the exploded corpus. Exact i64 sums — identical values to
  * the groupBy, so the q271/q277 oracles are untouched.
  *
  * Buffer layout: [0] = min component (Long.MaxValue when empty);
  * [1 .. blocks·codes] = counts per (block, code);
  * then sums per ((block·codes + code)·bw + dim).
  */
object PqRollup {

  final class PqRollupAgg(nBlocks: Int, codes: Int, bw: Int)
      extends Aggregator[(Seq[Long], Seq[Long]), Array[Long], Seq[Long]] {
    private val nCnt = nBlocks * codes
    private val size = 1 + nCnt + nCnt * bw
    override def zero: Array[Long] = {
      val a = new Array[Long](size)
      a(0) = Long.MaxValue
      a
    }
    override def reduce(buf: Array[Long], in: (Seq[Long], Seq[Long])): Array[Long] = {
      val (cs, xq) = in
      // a null embedding reaches here as (null, null) through the tuple
      // encoder (pq_encode is null-safe); the posexplode route this
      // aggregator replaced emitted ZERO rows for such inputs, so skip
      // — not NPE — to keep the Lloyd rollup's tolerance identical
      if (cs == null || xq == null) return buf
      var b = 0
      while (b < nBlocks) {
        val code = cs(b).toInt
        buf(1 + b * codes + code) += 1L
        val base = 1 + nCnt + (b * codes + code) * bw
        var i = 0
        while (i < bw) {
          val x = xq(b * bw + i)
          buf(base + i) += x
          if (x < buf(0)) buf(0) = x
          i += 1
        }
        b += 1
      }
      buf
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      b1(0) = math.min(b1(0), b2(0))
      var i = 1
      while (i < size) { b1(i) += b2(i); i += 1 }
      b1
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: ExpressionEncoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: ExpressionEncoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** `pqRollup(blocks, codes, bw)(codesCol, xqCol)` → the flat buffer
    * (see layout above) as array<bigint>.
    */
  def pqRollup(nBlocks: Int, codes: Int, bw: Int): (Column, Column) => Column = {
    val f = udaf(new PqRollupAgg(nBlocks, codes, bw),
      ExpressionEncoder[(Seq[Long], Seq[Long])]())
    (cs: Column, xq: Column) => f(cs, xq)
  }
}
