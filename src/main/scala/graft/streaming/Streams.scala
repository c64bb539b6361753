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

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionBuf]) =>
          if (state.hasTimedOut) {
            // watermark passed the gap: the open session is final
            val out = state.getOption.map(flush(userId, _)).toList
            state.remove()
            out.iterator
          } else {
            // batch execution never fires event-time timeouts (there is
            // no watermark), so the trailing open session must be
            // emitted at end-of-iterator instead of parked in state
            // that batch execution discards — this is what makes the
            // operator give the same answer on a bounded frame
            val isStreaming =
              try { state.getCurrentWatermarkMs(); true }
              catch { case _: UnsupportedOperationException => false }
            // NOTE: the group's batch iterator is buffered for the
            // sort; per-user per-batch volume is bounded by session
            // activity. A backfill over a pathologically hot user
            // should use the window-based batch twin (q26Sessionize).
            val sorted = it.toSeq.sortBy(e => micros(e.ts))
            var buf = state.getOption
            // late-but-within-watermark events older than a gap before
            // the open session build their own gap-merged sessions
            // (emitting each as a singleton would double-count where
            // the batch twin merges them)
            var lateBuf: Option[SessionBuf] = None
            val closed = List.newBuilder[Session]
            for (e <- sorted) {
              val t = micros(e.ts)
              buf match {
                case Some(b) if t >= b.startUs - gapUs && t - b.lastUs <= gapUs =>
                  // in-range (possibly a cross-batch late event just
                  // before the open session — extend its start)
                  buf = Some(b.copy(startUs = math.min(b.startUs, t),
                    lastUs = math.max(b.lastUs, t), n = b.n + 1,
                    total = b.total + e.value))
                case Some(b) if t < b.startUs =>
                  lateBuf match {
                    case Some(lb) if t - lb.lastUs <= gapUs =>
                      lateBuf = Some(lb.copy(startUs = math.min(lb.startUs, t),
                        lastUs = math.max(lb.lastUs, t), n = lb.n + 1,
                        total = lb.total + e.value))
                    case Some(lb) =>
                      closed += flush(userId, lb)
                      lateBuf = Some(SessionBuf(t, t, 1, e.value))
                    case None =>
                      lateBuf = Some(SessionBuf(t, t, 1, e.value))
                  }
                case Some(b) =>
                  closed += flush(userId, b)
                  buf = Some(SessionBuf(t, t, 1, e.value))
                case None =>
                  buf = Some(SessionBuf(t, t, 1, e.value))
              }
            }
            // the last late session may now bridge into the (possibly
            // start-extended) open session — the batch gaps-and-islands
            // result for the same sorted sequence
            (lateBuf, buf) match {
              case (Some(lb), Some(b)) if b.startUs - lb.lastUs <= gapUs =>
                buf = Some(b.copy(startUs = lb.startUs, n = b.n + lb.n,
                  total = b.total + lb.total))
                lateBuf = None
              case _ =>
            }
            lateBuf.foreach(lb => closed += flush(userId, lb))
            if (isStreaming) {
              buf.foreach { b =>
                state.update(b)
                // clamp above the watermark: a very late event can leave
                // lastUs+gap behind it, and setTimeoutTimestamp THROWS
                // on a timestamp <= watermark, killing the whole query
                state.setTimeoutTimestamp(
                  math.max(b.lastUs / 1000L + gapUs / 1000L,
                    state.getCurrentWatermarkMs() + 1))
              }
            } else {
              buf.foreach(b => closed += flush(userId, b))
            }
            closed.result().iterator
          }
      }
  }
}
