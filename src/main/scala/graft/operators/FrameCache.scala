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

  private val frames = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** The frame cached under (session, tag), building and persisting it
    * on first use. Keyed by sessionUUID (collision-free; an identity
    * hash could recur after GC and serve a frame bound to a dead
    * session). NOT computeIfAbsent: builds nest (the candidate frame's
    * build reads the signature frame), and ConcurrentHashMap forbids
    * recursive mapping functions. The lock is reentrant, so a nested
    * getOrBuild from inside `build` is safe. */
  def getOrBuild(s: SparkSession, tag: String)(build: => DataFrame): DataFrame = {
    val key = sessionKey(s) + "|" + tag
    val hit = frames.get(key)
    if (hit != null) hit
    else synchronized {
      val again = frames.get(key)
      if (again != null) again
      else {
        val df = build.persist(StorageLevel.MEMORY_AND_DISK)
        frames.put(key, df)
        df
      }
    }
  }

  /** Collision-free session identity (sessionUUID on classic Spark). */
  def sessionKey(s: SparkSession): String =
    org.apache.spark.sql.GraftColumnBridge.sessionUUID(s)
      .getOrElse(String.valueOf(System.identityHashCode(s)))

  /** Unpersist and forget every cached frame (end of pipeline). */
  def clear(): Unit = {
    frames.values.forEach(df => try df.unpersist() catch { case _: Throwable => () })
    frames.clear()
  }
}
