package graft.ops

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Bounded, corpus-fingerprinted memoization for the shared-scan caches
  * (the KMV sketch table q228+q230, the spectral moment pass q255/q256/
  * q262). Two hardenings over a bare TrieMap.getOrElseUpdate:
  *
  *  1. **Fingerprint in the key**: callers fold [[fingerprint]] (a hash
  *     of every file's name, length and mtime under the corpus path)
  *     into the cache key, so rewriting the corpus at `dir` in-session
  *     misses the cache and recomputes — strictly better than either
  *     serving stale checkpoints or failing loudly. The fingerprint is
  *     a driver-side listing (O(#files), no data read), negligible next
  *     to the scan it guards.
  *  2. **Entry cap**: at [[maxEntries]] distinct keys the cache clears
  *     wholesale before inserting (memoization is pure — a clear only
  *     costs a recompute), so pinned localCheckpoint blocks and d×d
  *     matrices can't accumulate without bound across many
  *     (dir, params) combinations in one long-lived JVM.
  */
object Memo {

  /** Keys beyond this clear the cache (correctness-neutral: entries are
    * pure memoizations of deterministic scans).
    */
  val maxEntries = 64

  /** Order-sensitive FNV-style fold of (name, length, mtime) over the
    * recursive listing of `path` (a file lists as itself). Missing path
    * fingerprints as 0 — the compute body sees the same absent-corpus
    * error it would have seen uncached.
    */
  def fingerprint(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true)
      var h = 1125899906842597L
      while (it.hasNext) {
        val st = it.next()
        h = h * 31 + st.getPath.getName.hashCode
        h = h * 31 + st.getLen
        h = h * 31 + st.getModificationTime
      }
      h
    }
  }

  /** getOrElseUpdate with the [[maxEntries]] cap. `onEvict` runs once per
    * evicted value BEFORE the clear, so values holding executor state
    * (localCheckpoint'd DataFrames pin block-manager blocks) release it
    * deterministically at eviction time instead of waiting for driver GC
    * plus the ContextCleaner to notice the dropped references.
    */
  def cached[K, V](cache: TrieMap[K, V], key: K,
      onEvict: V => Unit = (_: V) => ())(compute: => V): V =
    cache.get(key) match {
      case Some(v) => v
      case None =>
        if (cache.size >= maxEntries) {
          cache.values.foreach { v =>
            try onEvict(v)
            catch { case _: Exception => () } // a dead session must not
            // poison the recompute — eviction cleanup is best-effort
          }
          cache.clear()
        }
        cache.getOrElseUpdate(key, compute)
    }
}
