package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Physical-layout contracts: bucketing eliminates the join shuffle;
  * partitioning prunes at planning time. These are the two write-side
  * levers a 100-TB deployment has — the spec pins that the plans
  * actually realize them, not just that results are correct.
  */
class LayoutsSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def formatted(df: org.apache.spark.sql.DataFrame): String = {
    val qe = df.queryExecution
    org.apache.spark.sql.execution.ExplainMode.fromString("formatted") match {
      case m => qe.explainString(m)
    }
  }

  test("join of co-bucketed tables plans with zero Exchange and matches the shuffled join") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // sf0.001 tables are broadcast-sized, which would hide the layout:
      // disable auto-broadcast so the plan shows what a 100-TB join does
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Layouts.writeBucketed(orders, "b_orders", 4, Seq("o_orderkey"))
      Layouts.writeBucketed(lineitem, "b_lineitem", 4, Seq("o_orderkey"))

      val joined = Layouts.bucketedJoin(spark, "b_orders", "b_lineitem", Seq("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
      val plan = formatted(joined)
      // the join itself AND the downstream groupBy on the same key ride
      // the bucket layout: no Exchange anywhere in the plan
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      val expected = orders.join(lineitem, "o_orderkey")
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      val got = joined.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("ensureBucketed: files survive a catalog loss — re-register, never rewrite") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val base = "/tmp/graft_ensure_bucketed_spec"
    val dir = Paths.get(base)
    if (Files.exists(dir))
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // first call: cold path — writes the files
      Layouts.ensureBucketed(spark, orders, "eb_orders", 4,
        Seq("o_orderkey"), s"$base/orders")
      Layouts.ensureBucketed(spark, lineitem, "eb_lineitem", 4,
        Seq("o_orderkey"), s"$base/lineitem")
      def mtimes = Files.walk(Paths.get(s"$base/orders")).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
        .toMap
      val before = mtimes
      assert(before.nonEmpty)
      val expected = orders.join(lineitem, "o_orderkey")
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      // second call, same session: catalog hit — pure no-op
      Layouts.ensureBucketed(spark, orders, "eb_orders", 4,
        Seq("o_orderkey"), s"$base/orders")
      assert(mtimes == before, "catalog-hit path rewrote the files")
      // simulate a fresh JVM: drop ONLY the catalog entries (external
      // tables keep their files) — ensure must re-REGISTER, not rewrite
      spark.sql("DROP TABLE eb_orders")
      spark.sql("DROP TABLE eb_lineitem")
      Layouts.ensureBucketed(spark, orders, "eb_orders", 4,
        Seq("o_orderkey"), s"$base/orders")
      Layouts.ensureBucketed(spark, lineitem, "eb_lineitem", 4,
        Seq("o_orderkey"), s"$base/lineitem")
      assert(mtimes == before, "re-registration rewrote the files")
      // the re-registered tables still carry the bucket layout (zero
      // Exchange) and the exact values
      val joined = Layouts
        .bucketedJoin(spark, "eb_orders", "eb_lineitem", Seq("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity").as("qty"))
      val plan = formatted(joined)
      assert(!plan.contains("Exchange"),
        s"re-registered bucketed join shuffles:\n$plan")
      val got = joined.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS eb_orders")
      spark.sql("DROP TABLE IF EXISTS eb_lineitem")
    }
  }

  test("compact: small-file directory collapses to the computed count, rows intact") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val root = java.nio.file.Files.createTempDirectory("graft-compact").toString
    try {
      // simulate a micro-batch ingest: 16 tiny files
      docs.repartition(16).write.parquet(s"$root/small")
      def parquetFiles(dir: String): Seq[java.io.File] =
        new java.io.File(dir).listFiles.toSeq
          .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
      assert(parquetFiles(s"$root/small").size == 16)
      val onDisk = parquetFiles(s"$root/small").map(_.length).sum
      // target half the corpus per file → exactly 2 outputs
      val n = Layouts.compact(spark, s"$root/small", s"$root/big",
        targetBytes = (onDisk + 1) / 2)
      assert(n == 2, s"expected 2 target files, got $n")
      assert(parquetFiles(s"$root/big").size == 2)
      // content identical (coalesce is a pure re-layout)
      val before = docs.collect().map(_.getLong(0)).sorted.toSeq
      val after = spark.read.parquet(s"$root/big")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(after == before)
      // evenSizes path: same content through the shuffle variant
      val n2 = Layouts.compact(spark, s"$root/small", s"$root/even",
        targetBytes = (onDisk + 1) / 2, evenSizes = true)
      assert(n2 == 2)
      val even = spark.read.parquet(s"$root/even")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(even == before)
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(root))
  }

  test("partitioned layout: partition filter prunes at the scan, result unchanged") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val root = java.nio.file.Files.createTempDirectory("graft-part").toString
    try {
      Layouts.writePartitioned(docs, s"$root/docs", Seq("lang"))
      val scan = spark.read.parquet(s"$root/docs").filter(col("lang") === "en")
      val plan = formatted(scan)
      // the lang predicate must appear as a PartitionFilter on the scan
      // node (directory pruning), not only as a post-read Filter
      assert(plan.contains("PartitionFilters") &&
        plan.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("lang")),
        s"lang filter did not reach PartitionFilters:\n$plan")
      assert(scan.count() == docs.filter(col("lang") === "en").count())
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(root))
  }
}
