package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter BUILD as a typed [[Aggregator]] over bit
  * positions: the state is the raw bitmap (`Array[Long]`, mBits/64
  * words), `reduce` sets one bit, `merge` is a word-wise OR — the
  * canonical mergeable-sketch shape, so partial aggregation builds the
  * filter map-side and the shuffle carries one bitmap per partition
  * instead of the key set. Companion of [[KmvSketch]] (cardinality) and
  * MisraGries (frequency) on the MEMBERSHIP side.
  *
  * Position derivation lives in the PLAN, not in JVM hash code:
  * [[BloomFilter.positionsOf]] emits `pmod(xxhash64(key, i), mBits)`
  * for i in [0, nHashes) — the Kirsch–Mitzenmacher multi-hash scheme
  * with Spark's codegen'd xxhash64 as the family, no raw long
  * multiplication (which ANSI mode would turn into overflow errors).
  * Build and probe share the one expression, so a probe can never
  * disagree with the build on where a key's bits live.
  *
  * Determinism: xxhash64 is seed-fixed and the bitmap is an OR-fold —
  * commutative, associative, idempotent — so the filter is identical
  * regardless of partitioning. False positives are therefore
  * reproducible too; callers that need exactness (decontamination)
  * must re-verify bloom hits against the exact key set.
  */
object BloomFilter {

  /** ONE (mBits, nHashes) default shared by the batch decontamination
    * check (q243, `TextAnalysis.decontaminationBloom`) and the streaming
    * tripwire (`DocStreams.contaminationGate`): the two claim to agree
    * on what the filter would pass, which only holds when they build
    * the SAME filter — round-8 shipped them at 1<<20 vs 1<<18 and the
    * claim held only for callers passing explicit matching parameters.
    */
  val DefaultMBits: Int = 1 << 20
  val DefaultNHashes: Int = 4

  /** The nHashes bit positions of one key column, as an array<int>
    * column. `mBits` must be a positive multiple of 64.
    */
  def positionsOf(key: Column, mBits: Int, nHashes: Int): Column = {
    require(mBits > 0 && (mBits & 63) == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
    require(nHashes > 0, s"nHashes must be positive, got $nHashes")
    array((0 until nHashes).map(i =>
      pmod(xxhash64(key, lit(i)), lit(mBits.toLong)).cast("int")): _*)
  }

  /** Membership predicate: all bits of `positions` (array<int>) set in
    * `bitmap` (array<bigint>, the aggregator's output). Generated as a
    * plan-time conjunction of `nHashes` element_at/shift/mask tests —
    * codegen-friendly, no lambda dispatch per element.
    */
  /** Membership predicate computing the positions INLINE from the key —
    * the form that works inside higher-order-function lambdas (where a
    * precomputed positions column isn't available, e.g. filtering a
    * per-row gram-hash array against a joined-in bitmap). Same position
    * family as [[positionsOf]], so build and probe cannot disagree.
    */
  def mightContainKey(bitmap: Column, key: Column, mBits: Int,
      nHashes: Int): Column = {
    require(mBits > 0 && (mBits & 63) == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
    (0 until nHashes).map { i =>
      val p = pmod(xxhash64(key, lit(i)), lit(mBits.toLong)).cast("int")
      val word = element_at(bitmap,
        call_function("shiftright", p, lit(6)) + lit(1))
      call_function("shiftright", word, p.bitwiseAND(lit(63)))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  def mightContain(bitmap: Column, positions: Column, nHashes: Int): Column =
    (0 until nHashes).map { i =>
      val p = element_at(positions, i + 1)
      val word = element_at(bitmap,
        call_function("shiftright", p, lit(6)) + lit(1))
      call_function("shiftright", word, p.bitwiseAND(lit(63)))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  private[graft] def setBit(b: Array[Long], p: Int): Array[Long] = {
    b(p >>> 6) |= 1L << (p & 63)
    b
  }

  private class BloomBuildAggregator(mBits: Int)
      extends Aggregator[Int, Array[Long], Seq[Long]] {
    require(mBits > 0 && (mBits & 63) == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
    override def zero: Array[Long] = new Array[Long](mBits >>> 6)
    override def reduce(b: Array[Long], p: Int): Array[Long] = setBit(b, p)
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) |= b2(i); i += 1 }
      b1
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: ExpressionEncoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: ExpressionEncoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Column aggregate: `bloomBuild(mBits)(posCol)` → array<bigint>
    * bitmap; feed it the EXPLODED output of [[positionsOf]].
    */
  def bloomBuild(mBits: Int): Column => Column = {
    val f = udaf(new BloomBuildAggregator(mBits), ExpressionEncoder[Int]())
    (c: Column) => f(c)
  }
}
