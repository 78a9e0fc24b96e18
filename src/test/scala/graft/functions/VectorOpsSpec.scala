package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** vec_dot / vec_norm must equal the plain sequential double fold for
  * arbitrary float arrays, in both codegen and interpreted eval, and be
  * bit-equal to the aggregate(zip_with(...)) HOF route they replaced.
  */
class VectorOpsSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val vecGen: Gen[Array[Float]] = for {
    n <- Gen.oneOf(1, 3, 64, 257)
    xs <- Gen.listOfN(n, Gen.chooseNum(-10f, 10f))
  } yield xs.toArray

  private def refDot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    for (i <- 0 until math.min(a.length, b.length))
      acc += a(i).toDouble * b(i).toDouble
    acc
  }

  test("vec_dot/vec_norm equal the sequential reference fold") {
    VectorOps.register(spark)
    val pairs = samples(vecGen, 12).zip(samples(vecGen, 12))
      .map { case (a, b) => (a, b.take(a.length) ++ a.drop(b.length).map(_ => 1f)) }
      .map { case (a, b) => (a, if (b.length == a.length) b else a) }
    val df = pairs.toDF("a", "b")
      .select($"a", $"b",
        call_function("vec_dot", $"a", $"b").as("d"),
        call_function("vec_norm", $"a").as("n"))
    df.collect().foreach { r =>
      val a = r.getSeq[Float](0).toArray
      val b = r.getSeq[Float](1).toArray
      assert(r.getDouble(2) == refDot(a, b)) // bit-equal, not approx
      assert(r.getDouble(3) == math.sqrt(refDot(a, a)))
    }
  }

  test("codegen and interpreted eval agree with the HOF route") {
    VectorOps.register(spark)
    val df = samples(vecGen, 8).filter(_.length == 64).map(a => (a, a.reverse))
      .toDF("a", "b")
    val hof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("d")).collect().map(_.getDouble(0))
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try df.select(call_function("vec_dot", $"a", $"b").as("d"))
        .collect().map(_.getDouble(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(run("true") == hof.toSeq)
    assert(run("false") == hof.toSeq)
  }

  test("null inputs yield null, not a crash") {
    VectorOps.register(spark)
    val r = spark.sql("SELECT vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
      .head()
    assert(r.isNullAt(0))
  }
}
