package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY.md §2 st01/st02).
  *
  * The reference is a transactional store, not a stream processor; the
  * streaming surface here is the Spark-native capability its `events`
  * workloads imply: the same declarative transforms over an unbounded
  * source, with watermarks bounding state. Both entry points take a
  * generic DataFrame/Dataset so they run identically on a batch frame
  * (tests, backfill) and a readStream frame (production) — the
  * batch/streaming unification that makes the operator reusable at
  * either scale.
  */
object Streams {

  case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)

  case class Session(
    user_id: Long,
    start_ts: java.sql.Timestamp,
    end_ts: java.sql.Timestamp,
    n_events: Int,
    total_value: Double)

  // public, not private: the state encoder's generated code must be
  // able to call the accessors from Janino-compiled classes.
  // Times in epoch MICROSECONDS: the event timestamps carry µs
  // precision, and Timestamp.getTime alone (ms) would truncate
  // session boundaries away from the batch/oracle computation.
  case class SessionBuf(startUs: Long, lastUs: Long, n: Int, total: Double)

  /** Keyed state: ALL of a user's sessions the watermark has not yet
    * passed, sorted by start, pairwise more than a gap apart. Holding
    * closed-but-within-watermark sessions (not just the open one) is
    * what makes multi-batch late arrival correct: an event in a later
    * batch that lands adjacent to an earlier late session merges into
    * it instead of emitting a split session. A session leaves state
    * only when no admissible future event (ts ≥ watermark) could still
    * extend or front-merge it — i.e. when lastUs + gap < watermark. */
  case class SessionState(bufs: List[SessionBuf])

  /** st01: watermarked tumbling-window aggregation. State is bounded
    * by the watermark: windows older than `watermark` behind the max
    * seen event time are finalized and dropped from the state store. */
  def windowedAgg(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,10)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** st02: per-user sessionization via flatMapGroupsWithState — a
    * session closes after `gapMinutes` of silence (event-time timeout,
    * watermark-driven). Custom keyed state, the Spark-native analog of
    * a hand-written stateful operator. */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int = 30,
      watermark: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L

    // local defs (not object members): the state function must not
    // capture the non-serializable enclosing object
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def fromMicros(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    def flush(userId: Long, b: SessionBuf): Session =
      Session(userId, fromMicros(b.startUs), fromMicros(b.lastUs), b.n, b.total)

    // A session is FINAL (safe to emit and drop from state) only when
    // lastUs + gap < watermark: any future event is >= watermark, so it
    // can neither extend the session's tail (t - last <= gap would need
    // t < watermark) nor attach before a session whose whole span is
    // already behind the watermark. Until then the session stays in
    // state, where a late event from a later batch can still merge
    // into it — the property the batch gaps-and-islands result has.
    def isFinal(b: SessionBuf, wmUs: Long): Boolean = b.lastUs + gapUs < wmUs
    // gaps-and-islands sweep over buffered sessions + new events
    // (sorted by start): adjacent items closer than a gap merge. New
    // events can bridge two previously-separate buffered sessions.
    def merge(items: List[SessionBuf]): List[SessionBuf] = {
      val sorted = items.sortBy(b => (b.startUs, b.lastUs))
      val out = List.newBuilder[SessionBuf]
      var cur: Option[SessionBuf] = None
      for (b <- sorted) cur = cur match {
        case Some(c) if b.startUs - c.lastUs <= gapUs =>
          Some(c.copy(lastUs = math.max(c.lastUs, b.lastUs),
            n = c.n + b.n, total = c.total + b.total))
        case Some(c) => out += c; Some(b)
        case None => Some(b)
      }
      cur.foreach(out += _)
      out.result()
    }
    // keep the pending sessions and arm the next event-time timeout at
    // the earliest lastUs+gap — clamped above the watermark, because
    // setTimeoutTimestamp THROWS on a timestamp <= watermark, killing
    // the whole query
    def park(state: GroupState[SessionState], kept: List[SessionBuf]): Unit = {
      state.update(SessionState(kept))
      state.setTimeoutTimestamp(
        math.max(kept.map(b => b.lastUs / 1000L + gapUs / 1000L).min,
          state.getCurrentWatermarkMs() + 1))
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed some pending session's gap: emit every
            // session that is final, keep (and re-arm) the rest
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (ready, kept) = state.get.bufs.partition(isFinal(_, wmUs))
            if (kept.isEmpty) state.remove() else park(state, kept)
            ready.map(flush(userId, _)).iterator
          } else {
            // batch execution never fires event-time timeouts (there is
            // no watermark), so every session must be emitted at
            // end-of-iterator instead of parked in state that batch
            // execution discards — this is what makes the operator give
            // the same answer on a bounded frame
            val isStreaming =
              try { state.getCurrentWatermarkMs(); true }
              catch { case _: UnsupportedOperationException => false }
            // NOTE: the group's batch iterator is buffered for the
            // sort; per-user per-batch volume is bounded by session
            // activity. A backfill over a pathologically hot user
            // should use the window-based batch twin (q26Sessionize).
            val fresh = it.map(e =>
              SessionBuf(micros(e.ts), micros(e.ts), 1, e.value)).toList
            val merged = merge(state.getOption.map(_.bufs).getOrElse(Nil) ++ fresh)
            if (isStreaming) {
              val wmUs = state.getCurrentWatermarkMs() * 1000L
              val (ready, kept) = merged.partition(isFinal(_, wmUs))
              if (kept.isEmpty) state.remove() else park(state, kept)
              ready.map(flush(userId, _)).iterator
            } else {
              merged.map(flush(userId, _)).iterator
            }
          }
      }
  }
}
