package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the q140-q142 batch: grouping-set grain accounting,
  * rank-family window invariants, and unpivot round-trip against the
  * wide aggregate.
  */
class RelationalSuiteSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  test("groupingSets: four grains, each grain's doc total equals the corpus") {
    val rows = Relational.groupingSetsSummary(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    // gid bitmask over (lang, source): 0 = both set, 1 = lang only
    // (source aggregated), 2 = source only, 3 = grand total
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    for ((gid, rs) <- byGid)
      assert(rs.map(_.getAs[Long]("n_docs")).sum == total, s"gid $gid")
    assert(byGid(3L).length == 1)
    assert(byGid(1L).forall(r => r.getString(0) != null && r.isNullAt(1)))
    assert(byGid(2L).forall(r => r.isNullAt(0) && r.getString(1) != null))
  }

  test("windowSuite: rank-family invariants hold per customer") {
    val rows = Relational.windowSuite(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val q = r.getAs[Long]("quartile")
      assert(q >= 1 && q <= 4)
      val pr = r.getAs[Double]("pct_rank")
      assert(pr >= 0.0 && pr <= 1.0)
      val c = r.getAs[Double]("cume")
      assert(c > 0.0 && c <= 1.0)
    }
    // every customer's last order has cume_dist exactly 1; customers
    // with < 3 orders never get a third_price
    val perCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    for ((_, rs) <- perCust) {
      assert(rs.map(_.getAs[Double]("cume")).max == 1.0)
      if (rs.length < 3) assert(rs.forall(_.isNullAt(5)))
      else assert(rs.count(!_.isNullAt(5)) == rs.length - 2)
    }
  }

  test("langIdConfusion: recalls sum to 1 per true lang; counts partition the corpus") {
    val rows = TextAnalysis.langIdConfusion(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    for ((_, rs) <- rows.groupBy(_.getString(0)))
      assert(math.abs(rs.map(_.getAs[Double]("recall")).sum - 1.0) < 1e-4)
  }

  test("quantileNormalize: deciles partition each source; counts near-uniform") {
    val rows = PipelinePrep.quantileNormalize(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    for ((src, rs) <- rows.groupBy(_.getString(0))) {
      val byDec = rs.map(r => r.getAs[Long]("decile") -> r.getAs[Long]("n_docs")).toMap
      assert(byDec.keySet.subsetOf((0L to 9L).toSet), src)
      // percent_rank deciles are balanced within ±2 of n/10 per source
      val n = byDec.values.sum
      for ((d, c) <- byDec if n >= 20)
        assert(math.abs(c - n / 10.0) <= n / 10.0 + 2, s"$src decile $d: $c of $n")
    }
  }

  test("editVerifyCandidates: similarity bounds hold and a planted near-pair scores right") {
    val tmp = java.nio.file.Files.createTempDirectory("editv").toString
    try {
      // two near-identical docs (1-char edit over 39 chars) + one far doc;
      // texts share shingles so minhash banding emits the near pair
      val a = "the quick brown fox jumps over the dog"
      val b = "the quick brown fox jumps over the hog"
      Seq((1L, a, "en", "s", a.length.toLong), (2L, b, "en", "s", b.length.toLong),
        (3L, "completely different words entirely here", "en", "s", 40L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$tmp/documents.parquet")
      val got = Dedup.editVerifyCandidates(spark, tmp)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(4))).toMap
      assert(got.contains((1L, 2L)), s"near pair must survive: $got")
      val (dist, sim) = got((1L, 2L))
      assert(dist == 1L)
      assert(sim == BigDecimal(1.0 - 1.0 / a.length).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(got.values.forall { case (_, s) => s >= 0.8 && s <= 1.0 })
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("contractAudit: clean corpus audits clean; planted violations are counted") {
    val clean = PipelinePrep.contractAudit(spark, sf).collect()
    assert(clean.forall(_.getAs[Boolean]("id_unique")))
    assert(clean.map(_.getAs[Long]("n_len_mismatch")).sum == 0L)
    val tmp = java.nio.file.Files.createTempDirectory("contract").toString
    try {
      Seq((1L, "abc", "en", "s", 3L), (1L, "abcd", "en", "s", 99L),
        (2L, null.asInstanceOf[String], "en", "s", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$tmp/documents.parquet")
      val r = PipelinePrep.contractAudit(spark, tmp).collect().head
      assert(r.getAs[Long]("n_rows") == 3L)
      assert(r.getAs[Long]("n_ids") == 2L)
      assert(!r.getAs[Boolean]("id_unique"))
      assert(r.getAs[Long]("n_null_text") == 1L)
      assert(r.getAs[Long]("n_len_mismatch") == 1L)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("prefixJaccardJoin equals the naive all-pairs join at the same threshold") {
    // the no-false-negative property, checked pair-for-pair: the prefix
    // route and q16's exhaustive route must produce identical sets
    val fast = Dedup.prefixJaccardJoin(spark, sf, t = 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val naive = Dedup.jaccardPairs(spark, sf, minJaccard = 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(fast == naive)
    assert(fast.nonEmpty, "corpus has near-dups by construction")
  }

  test("cmsTokenFreq: exact counts match a direct recount; guarantees hold") {
    val got = TextAnalysis.cmsTokenFreq(spark, sf).collect()
    val want = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split($"text", " ")).as("tok")).filter($"tok" =!= "")
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.length == 20)
    for (r <- got) {
      assert(r.getLong(1) == want(r.getString(0)))
      assert(r.getBoolean(2), s"${r.getString(0)} undercounted")
      assert(r.getBoolean(3), s"${r.getString(0)} overcount beyond eps*N")
    }
  }

  test("unpivot: long rows reproduce the wide aggregate exactly") {
    val long = Relational.unpivotStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val wide = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy($"lang")
      .agg(count(lit(1)).cast("double").as("n_docs"),
        sum(length($"text")).cast("double").as("total_chars"),
        round(avg($"n_chars"), 4).as("avg_chars"))
      .collect()
    assert(long.size == wide.length * 3)
    for (w <- wide; m <- Seq("n_docs", "total_chars", "avg_chars"))
      assert(long((w.getString(0), m)) == w.getAs[Double](m), s"${w.getString(0)}/$m")
  }

  test("spearman: bounded in [-1,1]; midrank construction matches a driver-side recompute") {
    val r = Relational.spearmanCorrelation(spark, sf).collect()(0)
    for (c <- Seq("rho_qty_disc", "rho_qty_tax", "rho_disc_tax"))
      assert(math.abs(r.getAs[Double](c)) <= 1.0, c)
    // independent driver-side Spearman on (quantity, discount)
    val pairs = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_quantity", $"l_discount").collect()
      .map(x => (x.getDouble(0), x.getDouble(1)))
    def midranks(xs: Array[Double]): Map[Double, Double] = {
      val sorted = xs.sorted
      xs.distinct.map { v =>
        val lt = sorted.count(_ < v); val eq = sorted.count(_ == v)
        v -> (lt + (eq + 1) / 2.0)
      }.toMap
    }
    val rx = midranks(pairs.map(_._1)); val ry = midranks(pairs.map(_._2))
    val xs = pairs.map(p => rx(p._1)); val ys = pairs.map(p => ry(p._2))
    val n = xs.length
    val mx = xs.sum / n; val my = ys.sum / n
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val rho = cov / math.sqrt(
      xs.map(a => (a - mx) * (a - mx)).sum * ys.map(b => (b - my) * (b - my)).sum)
    assert(math.abs(r.getAs[Double]("rho_qty_disc") - rho) < 1e-3)
  }

  test("benford: digits are 1..9, observed shares partition the order count") {
    val rows = Relational.benfordPrices(spark, sf).collect()
    val digits = rows.map(_.getAs[Long]("digit")).toSet
    assert(digits.subsetOf((1L to 9L).toSet) && digits.nonEmpty)
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nOrders)
    // Benford expectations themselves sum to 1 over the full digit set
    if (digits == (1L to 9L).toSet)
      assert(math.abs(rows.map(_.getAs[Double]("benford")).sum - 1.0) < 1e-4)
    for (r <- rows) assert(r.getAs[Double]("chi2") >= 0.0)
  }

  test("scd2: versions bound order counts; closed days span first to last change") {
    val rows = Relational.scd2History(spark, sf).collect()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_custkey", $"o_orderkey", $"o_orderpriority",
        datediff(to_date($"o_orderdate"), lit("1970-01-01")).as("d"))
      .collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    assert(rows.length == orders.size)
    for (r <- rows) {
      val cust = r.getAs[Long]("o_custkey")
      val hist = orders(cust).sortBy(x => (x.getAs[Int]("d"), x.getAs[Long]("o_orderkey")))
      val prios = hist.map(_.getAs[String]("o_orderpriority"))
      // independent change-point count on the driver
      val nVersions = 1 + prios.sliding(2).count(w => w.length == 2 && w(0) != w(1))
      assert(r.getAs[Long]("n_versions") == nVersions, s"cust $cust")
      assert(r.getAs[String]("current_priority") == prios.last, s"cust $cust")
      assert(r.getAs[String]("first_priority") == prios.head, s"cust $cust")
      // closed intervals tile [first change, last change]
      val changeDays = prios.zip(hist.map(_.getAs[Int]("d"))).foldLeft(List.empty[(String, Int)]) {
        case (acc, (p, d)) => if (acc.headOption.exists(_._1 == p)) acc else (p, d) :: acc
      }.reverse.map(_._2)
      val expectedClosed = if (changeDays.length < 2) 0L else (changeDays.last - changeDays.head).toLong
      assert(r.getAs[Long]("closed_days") == expectedClosed, s"cust $cust")
    }
  }
}
