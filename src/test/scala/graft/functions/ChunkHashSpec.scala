package graft.functions

import graft.hash.Algos
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The chunk_hash Catalyst expression must agree byte-for-byte with the
  * core Digest spec (path || 0x00 || ascii(idx) || 0x00 || content) for
  * every whitelisted algorithm, in both codegen and interpreted eval.
  */
class ChunkHashSpec extends AnyFunSuite {

  private val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def reference(path: String, idx: Long, content: Array[Byte],
      algo: String): String = {
    val d = Algos.get(algo)
    val zero = Array(0.toByte)
    d.update(path); d.update(zero); d.update(idx.toString); d.update(zero)
    d.update(content)
    Algos.hex(d.digest())
  }

  test("chunk_hash matches the core Digest spec for all ten algorithms") {
    ChunkHashOps.register(spark)
    val rows = Seq(
      ("some/file.bin", 0L, "hello world"),
      ("dir/empty", 7L, ""),
      ("space name.txt", 1L, "abc"))
    val df = rows.toDF("path", "idx", "text")
    for (algo <- Algos.supported) {
      val got = df.select($"path", $"idx",
          lower(hex(call_function("chunk_hash",
            $"path", $"idx", encode($"text", "UTF-8"), lit(algo)))).as("d"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      got.foreach { case (p, i, d) =>
        val text = rows.find(t => t._1 == p && t._2 == i).get._3
        assert(d == reference(p, i, text.getBytes("UTF-8"), algo),
          s"algo=$algo path=$p idx=$i")
      }
    }
  }

  test("chunk_hash in SQL text (registered function) and in a groupBy key") {
    ChunkHashOps.register(spark)
    Seq(("a", "same"), ("b", "same"), ("c", "other"))
      .toDF("id", "text").createOrReplaceTempView("ch_docs")
    // same content but different path => different digest (domain separation)
    val distinctDigests = spark.sql(
      """SELECT count(DISTINCT lower(hex(
        |  chunk_hash(id, 0L, encode(text, 'UTF-8'), 'sha256')))) AS n
        |FROM ch_docs""".stripMargin).head().getLong(0)
    assert(distinctDigests == 3)
    // same path+idx+content => equal digests regardless of algo family
    for (algo <- Seq("sha256", "sha3_256", "blake2b")) {
      val d = spark.sql(
        s"""SELECT lower(hex(chunk_hash('p', 0L, encode('x', 'UTF-8'), '$algo')))"""
      ).head().getString(0)
      assert(d == reference("p", 0L, "x".getBytes, algo))
    }
  }

  test("whole-stage codegen and interpreted eval agree") {
    ChunkHashOps.register(spark)
    val df = (1 to 100).map(i => (s"path$i", i.toLong, s"content$i"))
      .toDF("path", "idx", "text")
    def run(codegen: String): Seq[String] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try df.select(lower(hex(call_function("chunk_hash",
          $"path", $"idx", encode($"text", "UTF-8"), lit("blake2s")))).as("d"))
        .collect().map(_.getString(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(run("true") == run("false"))
  }
}
