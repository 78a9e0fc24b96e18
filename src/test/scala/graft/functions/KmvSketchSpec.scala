package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch invariants against the naive model (sorted distinct, keep
  * the k smallest): insert-fold equals the model on seeded random
  * streams, merge is split-invariant (any partition of the stream merges
  * to the fold of the whole), and the Spark typed-Aggregator path agrees
  * with the model through a real shuffle. The sketch is deterministic —
  * no RNG — so equality is exact, not statistical.
  */
class KmvSketchSpec extends AnyFunSuite {

  private def model(xs: Seq[Long], k: Int): Vector[Long] =
    xs.distinct.sorted.take(k).toVector

  private def fold(xs: Seq[Long], k: Int): Vector[Long] =
    xs.foldLeft(Vector.empty[Long])((b, x) => KmvSketch.insert(b, x, k))

  private def randomStream(rnd: scala.util.Random, len: Int): Seq[Long] =
    // small value domain on purpose: lots of duplicate inserts, ties,
    // and values landing below/above the current kth
    (1 to len).map(_ => rnd.nextInt(40).toLong)

  test("insert-fold equals sorted-distinct-take-k on seeded streams") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val xs = randomStream(rnd, rnd.nextInt(100))
      val k = 1 + rnd.nextInt(12)
      assert(fold(xs, k) == model(xs, k), s"k=$k xs=$xs")
    }
  }

  test("insert is idempotent for present values and caps at k") {
    val b = fold(Seq(5L, 3L, 9L, 1L), 3)
    assert(b == Vector(1L, 3L, 5L))
    assert(KmvSketch.insert(b, 3L, 3) == b)   // already present
    assert(KmvSketch.insert(b, 9L, 3) == b)   // above the kth — rejected
    assert(KmvSketch.insert(b, 0L, 3) == Vector(0L, 1L, 3L)) // evicts 5
  }

  test("mergeTwo of any split equals the fold of the whole stream") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val xs = randomStream(rnd, 2 + rnd.nextInt(100))
      val k = 1 + rnd.nextInt(12)
      val cut = rnd.nextInt(xs.length)
      val (l, r) = xs.splitAt(cut)
      val merged = KmvSketch.mergeTwo(fold(l, k), fold(r, k), k)
      assert(merged == model(xs, k), s"k=$k cut=$cut xs=$xs")
      // commutative
      assert(KmvSketch.mergeTwo(fold(r, k), fold(l, k), k) == merged)
    }
  }

  test("mergeTwo with an empty side is identity; both empty is empty") {
    val b = fold(Seq(4L, 2L, 8L), 2)
    assert(KmvSketch.mergeTwo(b, Vector.empty, 2) == b)
    assert(KmvSketch.mergeTwo(Vector.empty, b, 2) == b)
    assert(KmvSketch.mergeTwo(Vector.empty, Vector.empty, 2) == Vector.empty)
  }

  test("k <= 0 is rejected") {
    intercept[IllegalArgumentException](KmvSketch.kmvSketch(0))
    intercept[IllegalArgumentException](KmvSketch.kmvSketch(-1))
  }

  test("Spark aggregator path equals the model through a real shuffle") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val xs = (1 to 5000).map(_ => rnd.nextInt(600).toLong)
    val got = xs.toDF("h")
      .repartition(7) // force partial sketches + merge
      .agg(KmvSketch.kmvSketch(16)(org.apache.spark.sql.functions.col("h")))
      .as[Seq[Long]].head()
    assert(got.toVector == model(xs, 16))
    // under-full sketch IS the distinct set
    val small = Seq(9L, 9L, 1L, 4L).toDF("h")
      .agg(KmvSketch.kmvSketch(16)(org.apache.spark.sql.functions.col("h")))
      .as[Seq[Long]].head()
    assert(small.toVector == Vector(1L, 4L, 9L))
  }
}
