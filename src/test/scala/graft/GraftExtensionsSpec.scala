package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A session built with the extension class (the spark.sql.extensions
  * deployment route) must expose every graft function from plain SQL,
  * with results identical to the per-session register() route.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions session serves all graft functions from SQL") {
    // getOrCreate() returns any existing default session (ignoring
    // extensions), so detach the shared test session first; the new
    // session reuses its SparkContext but gets its own extension set —
    // exactly what the spark.sql.extensions conf does at startup
    val shared = graft.SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT
          |  vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |          array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          |  vec_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n,
          |  bigram_counts('abab') AS bc,
          |  lower(hex(chunk_hash('p', 0L, CAST('x' AS BINARY), 'sha256'))) AS ch,
          |  feature_hash('a b a') AS fh,
          |  gram_hashes('a b c d', 3) AS gh,
          |  distinct_grams('a b a b c', 2) AS dg,
          |  char_counts('abab') AS cc,
          |  bloom_contains((SELECT bloom_agg(xxhash64(k), 1024L, 8192L)
          |                  FROM VALUES (1L), (2L) AS t(k)),
          |                 xxhash64(1L)) AS bl
          |""".stripMargin).head()
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 5.0)
      assert(row.getMap[String, Long](2).toSeq.sorted == Seq("ab" -> 2L, "ba" -> 1L))
      assert(row.getSeq[Long](4).sum == 3L) // 3 tokens hashed into 64 dims
      assert(row.getSeq[Long](5).length == 2) // "a b c", "b c d"
      assert(row.getSeq[String](6) == Seq("a b", "b a", "b c"))
      assert(row.getMap[String, Long](7).toSeq.sorted == Seq("a" -> 2L, "b" -> 2L))
      assert(row.getBoolean(8)) // inserted key: bloom may never say no
      // same digest the per-session register() route produces
      graft.functions.ChunkHashOps.register(shared)
      val expected = shared.sql(
        "SELECT lower(hex(chunk_hash('p', 0L, CAST('x' AS BINARY), 'sha256')))").head().getString(0)
      assert(row.getString(3) == expected)
    } finally {
      // reattach the shared session for every later suite; do NOT stop()
      // (both sessions ride one SparkContext)
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
