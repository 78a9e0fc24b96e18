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

  /** Build-attribution log (round-14, the bench's `memo_builds`
    * section): one entry per compute-body run — (table label, the
    * consumer that triggered the build, seconds spent in the body).
    * `currentConsumer` is set by the bench around each timed query so
    * shared-table build cost is attributable to the query that paid it
    * (per-query times for memoized families are otherwise
    * order-dependent across runs — round-13 verdict #2); outside the
    * bench it stays "" and entries are still recorded. A LAZY memo's
    * body only plans (its materialization lands in the same consumer's
    * wall clock); eager builders (checkpointing/counting bodies) pay
    * the whole build inside the body, so `secs` is the build cost.
    */
  val buildLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Double)]
  @volatile var currentConsumer: String = ""

  /** Deterministic storage release for an EVICTED memoized DataFrame
    * (round-13 ADVICE): a cached plan unpersists through the Dataset
    * API, but a localCheckpoint'd value holds its blocks on an internal
    * RDD that API can't reach — unpersist that RDD directly. ROOT node
    * only, on purpose: a derived value (e.g. a sampled filter OVER
    * another entry's checkpoint) must never release the table it reads
    * — its own root is a Filter, which falls through to the no-op
    * Dataset unpersist.
    */
  def releaseOnEvict(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(false); ()
      case _ => df.unpersist(false); ()
    }

  /** getOrElseUpdate with a per-cache entry cap (default
    * [[maxEntries]]; corpus-sized caches pass a smaller `cap` so a few
    * parameterizations cannot pin several corpus-scale tables at once —
    * round-13 ADVICE). `onEvict` runs once per evicted value BEFORE the
    * clear, so values holding executor state (localCheckpoint'd
    * DataFrames pin block-manager blocks) release it deterministically
    * at eviction time instead of waiting for driver GC plus the
    * ContextCleaner to notice the dropped references.
    *
    * The insert is compute-then-putIfAbsent (NOT getOrElseUpdate, whose
    * losing duplicate under concurrent first calls would leak an
    * eagerly-persisted value for the session lifetime — round-13
    * ADVICE): if another thread won the race, the loser's value goes
    * through `onEvict` so its resources release deterministically.
    */
  def cached[K, V](cache: TrieMap[K, V], key: K,
      onEvict: V => Unit = (_: V) => (), label: String = "",
      cap: Int = maxEntries)(
      compute: => V): V =
    cache.get(key) match {
      case Some(v) => v
      case None =>
        if (cache.size >= cap) {
          cache.values.foreach { v =>
            try onEvict(v)
            catch { case _: Exception => () } // a dead session must not
            // poison the recompute — eviction cleanup is best-effort
          }
          cache.clear()
        }
        val t0 = System.nanoTime()
        val v = compute
        if (label.nonEmpty)
          buildLog.add((label, currentConsumer, (System.nanoTime() - t0) / 1e9))
        cache.putIfAbsent(key, v) match {
          case Some(winner) =>
            try onEvict(v) catch { case _: Exception => () }
            winner
          case None => v
        }
    }
}
