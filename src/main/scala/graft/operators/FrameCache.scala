package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped cache of expensive intermediate frames (minhash
  * signatures, shingle sets, ANN signatures, LSH candidate pairs).
  *
  * The dedup/similarity operators share these stages: d02, d04 and d06
  * all start from the same per-document minhash signatures, and s02
  * prunes on per-vector hyperplane signatures. Rebuilding (and
  * re-persisting) the stage per query triples the dominant scan cost
  * and leaks cache — at 100 TB a pipeline computes signatures once at
  * ingest and stores them as table columns. This cache is the
  * single-session analog of that stored-signature table: one persisted
  * frame per (session, stage, dataset), shared by every operator that
  * needs it, released with [[clear]] when the pipeline ends.
  */
object FrameCache {

  private final case class Entry(owner: SparkSession, df: DataFrame)

  private val frames = new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** The frame cached under (session, tag), building and persisting it
    * on first use. Keyed by sessionUUID (collision-free; an identity
    * hash could recur after GC and serve a frame bound to a dead
    * session). NOT computeIfAbsent: builds nest (the candidate frame's
    * build reads the signature frame), and ConcurrentHashMap forbids
    * recursive mapping functions. The lock is reentrant, so a nested
    * getOrBuild from inside `build` is safe. */
  def getOrBuild(s: SparkSession, tag: String)(build: => DataFrame): DataFrame = {
    sweepStopped()
    val key = sessionKey(s) + "|" + tag
    val hit = frames.get(key)
    if (hit != null) hit.df
    else synchronized {
      val again = frames.get(key)
      if (again != null) again.df
      else {
        val df = build.persist(StorageLevel.MEMORY_AND_DISK)
        frames.put(key, Entry(s, df))
        df
      }
    }
  }

  /** Entries whose owning session's context is stopped are dead weight
    * (their cached blocks are already gone with the executors) — drop
    * them so a long-lived JVM that starts and stops many contexts
    * doesn't accumulate frames bound to dead sessions. Swept on every
    * getOrBuild. */
  private def sweepStopped(): Unit =
    frames.forEach { (key, e) =>
      if (e.owner.sparkContext.isStopped) {
        frames.remove(key, e)
        try e.df.unpersist() catch { case _: Throwable => () }
      }
    }

  /** Unpersist and forget one session's cached frames (end of that
    * session's pipeline) without touching other sessions sharing the
    * JVM. */
  def clear(s: SparkSession): Unit = {
    val prefix = sessionKey(s) + "|"
    frames.forEach { (key, e) =>
      if (key.startsWith(prefix) && frames.remove(key, e))
        try e.df.unpersist() catch { case _: Throwable => () }
    }
  }

  /** Number of frames cached for `s` (test observability). */
  def cachedCount(s: SparkSession): Int = {
    val prefix = sessionKey(s) + "|"
    var n = 0
    frames.forEach { (key, _) => if (key.startsWith(prefix)) n += 1 }
    n
  }

  /** Collision-free session identity (sessionUUID on classic Spark). */
  def sessionKey(s: SparkSession): String =
    org.apache.spark.sql.GraftColumnBridge.sessionUUID(s)
      .getOrElse(String.valueOf(System.identityHashCode(s)))

  /** Unpersist and forget every cached frame (end of pipeline). */
  def clear(): Unit = {
    frames.values.forEach(e => try e.df.unpersist() catch { case _: Throwable => () })
    frames.clear()
    clearHooks.forEach(h => try h() catch { case _: Throwable => () })
  }

  /** Callback run on every global [[clear]] — how non-frame caches
    * that follow the same lifecycle (e.g. the streaming queries'
    * staged sentinel directories) release their resources with the
    * pipeline, without this module knowing about them. */
  def onClear(hook: () => Unit): Unit = clearHooks.add(hook): Unit

  private val clearHooks =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()
}

/** Per-key memoization for trained assets whose builders run Spark
  * jobs (quantizer training, Bloom-filter builds, staged snapshot
  * chains): the build runs under a PER-KEY lock — never inside a
  * ConcurrentHashMap mapping function (whose bin lock would stall
  * unrelated keys behind a multi-second build — the contention the
  * TCP server's concurrent sessions actually produce) and never twice
  * for one key (a losing duplicate build would waste a full training
  * run, or orphan a store directory). Builders must not call back
  * into the same memo (per-key locks don't nest). LOCK ORDER
  * INVARIANT: a [[FrameCache.getOrBuild]] builder MAY call a
  * KeyedMemo (s14CorpusAssigned does — the FrameCache monitor is then
  * held across the memo build, so a slow build stalls other FrameCache
  * misses, acceptable for the bounded trained assets here); a
  * KeyedMemo builder MUST NOT call FrameCache.getOrBuild — that
  * reversed ordering against the codebase's existing direction is the
  * ABBA deadlock. One direction only, and this is the direction. */
final class KeyedMemo[V <: AnyRef] {
  private val map = new java.util.concurrent.ConcurrentHashMap[String, V]()
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def getOrBuild(key: String)(build: => V): V = {
    val hit = map.get(key)
    if (hit != null) hit
    else locks.computeIfAbsent(key, _ => new Object).synchronized {
      val again = map.get(key)
      if (again != null) again
      else { val built = build; map.put(key, built); built }
    }
  }
  def clear(): Unit = { map.clear(); locks.clear() }
}
