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

  private val longVecGen: Gen[Array[Long]] = for {
    xs <- Gen.listOfN(64, Gen.chooseNum(-4000000L, 4000000L))
  } yield xs.toArray

  test("pq_d2/pq_res_d2 equal the aggregate(zip_with) i64 fold, codegen and interpreted") {
    VectorOps.register(spark)
    val rows = samples(longVecGen, 6)
    val cent = samples(longVecGen, 1).head.slice(0, 16).toSeq
    val sel = samples(longVecGen, 2).last.slice(0, 16).toSeq
    val df = rows.map(Tuple1(_)).toDF("xq")
    def hof(off: Int): Seq[Long] = df.select(
      aggregate(zip_with(slice($"xq", off + 1, 16), array(cent.map(lit): _*),
        (x, c) => (x - c) * (x - c)), lit(0L), (acc, t) => acc + t).as("d"))
      .collect().map(_.getLong(0)).toSeq
    def hofRes(off: Int): Seq[Long] = df.select(
      aggregate(zip_with(
        zip_with(slice($"xq", off + 1, 16), array(sel.map(lit): _*), (x, s) => x - s),
        array(cent.map(lit): _*),
        (x, c) => (x - c) * (x - c)), lit(0L), (acc, t) => acc + t).as("d"))
      .collect().map(_.getLong(0)).toSeq
    def run(off: Int, codegen: String): (Seq[Long], Seq[Long]) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val out = df.select(
          VectorOps.pqD2Col(spark, $"xq", off, cent).as("d"),
          VectorOps.pqResD2Col(spark, $"xq", off, array(sel.map(lit): _*), cent).as("r"))
          .collect()
        (out.map(_.getLong(0)).toSeq, out.map(_.getLong(1)).toSeq)
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    for (off <- Seq(0, 16, 48)) {
      val (d2t, rest) = run(off, "true")
      val (d2f, resf) = run(off, "false")
      assert(d2t == hof(off) && d2f == hof(off))
      assert(rest == hofRes(off) && resf == hofRes(off))
    }
  }

  test("pq_encode equals the least(struct(pq_d2, code)) route, codegen and interpreted") {
    VectorOps.register(spark)
    // small value range on purpose: collisions force d² ties, which must
    // resolve to the LOWEST code (the least(struct) contract)
    val tieGen: Gen[Array[Long]] = for {
      xs <- Gen.listOfN(8, Gen.chooseNum(-2L, 2L))
    } yield xs.toArray
    val rows = samples(tieGen, 10)
    val cb: Seq[Seq[Seq[Long]]] = (0 until 2).map { b =>
      (0 until 5).map(c => samples(tieGen, 1 + b * 5 + c).last.slice(0, 4).toSeq)
    }
    val df = rows.map(Tuple1(_)).toDF("xq")
    val ref = df.select((0 until 2).flatMap { b =>
      val arg = cb(b).zipWithIndex.map { case (c, code) =>
        struct(VectorOps.pqD2Col(spark, $"xq", b * 4, c).as("d2"),
          lit(code.toLong).as("code"))
      }.reduceLeft((a, x) => least(a, x))
      Seq(arg.getField("code").as(s"c$b"), arg.getField("d2").as(s"d$b"))
    }: _*).collect().map(r => (0 until 2).map(b =>
      (r.getLong(2 * b), r.getLong(2 * b + 1))))
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try df.select(VectorOps.pqEncodeCol(spark, $"xq", cb).as("e"))
        .select($"e.codes", $"e.d2s").collect().map { r =>
          val cs = r.getSeq[Long](0); val ds = r.getSeq[Long](1)
          (0 until 2).map(b => (cs(b), ds(b)))
        }.toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(run("true") == ref.toSeq)
    assert(run("false") == ref.toSeq)
  }

  test("pq_res_encode equals the least(struct(pq_res_d2, code)) route") {
    VectorOps.register(spark)
    val tieGen: Gen[Array[Long]] = for {
      xs <- Gen.listOfN(8, Gen.chooseNum(-2L, 2L))
    } yield xs.toArray
    val rows = samples(tieGen, 10)
    val sel = samples(tieGen, 3).last.toSeq // full-width (8) centroid
    val cb: Seq[Seq[Seq[Long]]] = (0 until 2).map { b =>
      (0 until 5).map(c => samples(tieGen, 20 + b * 5 + c).last.slice(0, 4).toSeq)
    }
    val df = rows.map(Tuple1(_)).toDF("xq")
    val selCol = array(sel.map(lit): _*)
    val ref = df.select((0 until 2).map { b =>
      val selB = array(sel.slice(b * 4, (b + 1) * 4).map(lit): _*)
      cb(b).zipWithIndex.map { case (c, code) =>
        struct(VectorOps.pqResD2Col(spark, $"xq", b * 4, selB, c).as("d2"),
          lit(code.toLong).as("code"))
      }.reduceLeft((a, x) => least(a, x)).getField("code").as(s"c$b")
    }: _*).collect().map(r => (r.getLong(0), r.getLong(1)))
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try df.select(VectorOps.pqResEncodeCol(spark, $"xq", selCol, cb)
          .getField("codes").as("cs"))
        .collect().map { r =>
          val cs = r.getSeq[Long](0); (cs(0), cs(1))
        }.toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(run("true") == ref.toSeq)
    assert(run("false") == ref.toSeq)
  }

  test("pq_d2 null array yields null") {
    VectorOps.register(spark)
    val r = spark.sql(
      "SELECT pq_d2(CAST(NULL AS ARRAY<BIGINT>), 0, array(1L))").head()
    assert(r.isNullAt(0))
  }
}
