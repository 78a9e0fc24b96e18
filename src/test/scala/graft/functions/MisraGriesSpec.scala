package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries invariants, driver-side (pure fold/merge) and through the
  * Spark typed-Aggregator path: capacity never exceeded, the
  * stored ≤ true ≤ stored + n/(k+1) sandwich for EVERY token (present or
  * evicted), and merge preserving the summed bound across arbitrary
  * stream splits — checked over seeded random skewed streams.
  */
class MisraGriesSpec extends AnyFunSuite {

  private def foldStream(xs: Seq[String], k: Int): MisraGries.Summary =
    xs.foldLeft(Map.empty[String, Long])((b, x) => MisraGries.reduceOne(b, x, k))

  private def checkBound(xs: Seq[String], summary: MisraGries.Summary,
      k: Int): Unit = {
    assert(summary.size <= k)
    assert(summary.values.forall(_ > 0))
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val err = xs.size.toDouble / (k + 1)
    truth.foreach { case (t, n) =>
      val est = summary.getOrElse(t, 0L)
      assert(est <= n, s"overcounted $t: $est > $n")
      assert(n - est <= err, s"undercount beyond bound for $t: $n - $est > $err")
    }
  }

  private def randomStream(rnd: scala.util.Random, len: Int): Seq[String] =
    (1 to len).map { _ =>
      rnd.nextInt(10) match {
        case x if x < 5 => "heavy"
        case x if x < 8 => "mid"
        case _ => s"t${rnd.nextInt(10)}"
      }
    }

  test("fold satisfies the n/(k+1) sandwich on seeded skewed streams") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val xs = randomStream(rnd, rnd.nextInt(200))
      val k = 2 + rnd.nextInt(5)
      checkBound(xs, foldStream(xs, k), k)
    }
  }

  test("merge of split streams preserves capacity and the summed bound") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val xs = randomStream(rnd, rnd.nextInt(200))
      val ys = randomStream(rnd, rnd.nextInt(200))
      val k = 2 + rnd.nextInt(5)
      val merged = MisraGries.mergeTwo(foldStream(xs, k), foldStream(ys, k), k)
      checkBound(xs ++ ys, merged, k)
    }
  }

  test("a heavy hitter above n/(k+1) is always present after merge") {
    // 40 of one token in 100 with k=4 → threshold n/5 = 20 < 40
    val xs = Seq.fill(40)("big") ++ (1 to 60).map(i => s"t${i % 30}")
    val (l, r) = xs.splitAt(57)
    val m = MisraGries.mergeTwo(foldStream(l, 4), foldStream(r, 4), 4)
    assert(m.contains("big"))
  }

  test("Spark aggregator path: summary bounds hold on a real token column") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // skewed stream across multiple partitions so partial merges happen
    val xs = (1 to 400).map(i =>
      if (i % 2 == 0) "alpha" else if (i % 3 == 0) "beta" else s"rare${i % 50}")
    val df = xs.toDF("tok").repartition(8)
    val k = 10
    val summary = df.agg(MisraGries.mgSummary(k)($"tok"))
      .collect()(0).getMap[String, Long](0).toMap
    checkBound(xs, summary, k)
  }
}
