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
  // able to call the accessors from Janino-compiled classes
  case class SessionBuf(startMs: Long, lastMs: Long, n: Int, total: Double)

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
    val gapMs = gapMinutes * 60000L

    def flush(userId: Long, b: SessionBuf): Session =
      Session(userId, new java.sql.Timestamp(b.startMs), new java.sql.Timestamp(b.lastMs),
        b.n, b.total)

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
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var buf = state.getOption
            val closed = List.newBuilder[Session]
            for (e <- sorted) {
              val t = e.ts.getTime
              buf match {
                case Some(b) if t - b.lastMs <= gapMs =>
                  buf = Some(b.copy(lastMs = math.max(b.lastMs, t), n = b.n + 1,
                    total = b.total + e.value))
                case Some(b) =>
                  closed += flush(userId, b)
                  buf = Some(SessionBuf(t, t, 1, e.value))
                case None =>
                  buf = Some(SessionBuf(t, t, 1, e.value))
              }
            }
            buf.foreach { b =>
              state.update(b)
              state.setTimeoutTimestamp(b.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
