package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the q133-q135 batch: anomaly flags on a planted spike
  * (and none on a flat series), the resize audit against a byte-level
  * recompute, and k-core pruning against a driver-side replay of the
  * same rounds on the same edge set.
  */
class AnomalyGraphSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._
  private val dayNs = 86400000000000L

  test("anomalyDays: planted 10x spike flagged, flat series clean") {
    val tmp = java.nio.file.Files.createTempDirectory("anom").toString
    try {
      // type "a": 1 event/day for 28 days except day 14 gets 20 events;
      // type "flat": uniform 2/day
      val spike = (0 until 28).flatMap { d =>
        val n = if (d == 14) 20 else 1
        (0 until n).map(i => (d * 100L + i, d * dayNs + i + 1, 1L, "a", 1.0, "{}"))
      }
      val flat = (0 until 28).flatMap { d =>
        Seq((10000L + d * 2, d * dayNs + 1, 2L, "flat", 1.0, "{}"),
          (10001L + d * 2, d * dayNs + 2, 2L, "flat", 1.0, "{}"))
      }
      (spike ++ flat).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$tmp/events.parquet")
      val got = Series.anomalyDays(spark, tmp).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(5)).toMap
      assert(got(("a", 14L)), "spike day must flag")
      assert(!got.exists { case ((t, d), f) => t == "flat" && f },
        "flat series must not flag")
    } finally graft.TestFiles.rmrf(java.nio.file.Paths.get(tmp))
  }

  test("resizeAudit equals a byte-level stride recompute on real data") {
    val got = graft.multimodal.Multimodal.resizeAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"text".isNotNull)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def sig(bytes: Array[Byte]): Long = java.lang.Long.parseLong(
      md.digest(bytes).take(4).map("%02x".format(_)).mkString, 16)
    val want = docs.groupBy { case (id, _) =>
      Seq("image", "audio", "video")((id % 3).toInt)
    }.map { case (kind, rows) =>
      val rz = rows.map { case (_, t) =>
        val b = t.getBytes("UTF-8")
        val out = new Array[Byte]((b.length + 3) / 4)
        var i = 0
        while (i < out.length) { out(i) = b(i * 4); i += 1 }
        out
      }
      kind -> (rows.length.toLong,
        rows.map(_._2.getBytes("UTF-8").length.toLong).sum,
        rz.map(_.length.toLong).sum, rz.map(sig).sum)
    }
    assert(got == want)
  }

  test("kCore equals a driver-side replay of the same pruning rounds") {
    val got = Graph.kCore(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    // independent replay: same canonical edge set, same 3 rounds, k=2
    var edges = Similarity.knnGraph(spark, sf)
      .select(least($"vec_id", $"neighbor_id"), greatest($"vec_id", $"neighbor_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    var keep = Set.empty[Long]
    for (_ <- 1 to 3) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.length }
      keep = deg.filter(_._2 >= 2).keySet.toSet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
    }
    val coreDeg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.length.toLong }
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(got.size == total)
    for ((vid, (inCore, cd)) <- got) {
      assert(inCore == keep(vid), s"vec $vid in_core mismatch")
      assert(cd == coreDeg.getOrElse(vid, 0L), s"vec $vid core_deg mismatch")
    }
    // the operator actually prunes something on this corpus
    assert(got.count(_._2._1) < total)
    assert(got.count(_._2._1) > 0)
  }
}
