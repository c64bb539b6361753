package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Driver-visible streaming queries: real Structured Streaming
  * executions (readStream → stateful agg → memory sink) whose result
  * frames are comparable to their batch twins — so the same DuckDB
  * oracle that checks the batch query checks the streaming engine's
  * answer. Bounded input + complete mode ⇒ the streaming result must
  * equal the batch result exactly.
  */
object StreamQueries {

  /** st01: the q19 hour-bucket aggregation executed by the streaming
    * engine. Source: file stream over the events parquet (one batch —
    * bounded); sink: in-memory table. */
  def st01StreamWindow(s: SparkSession, d: String): DataFrame = {
    // schema via the batch loader (handles TIMESTAMP(NANOS) → µs)
    val batch = Tables.events(s, d)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file-stream source wants a directory: stream the sf dir with
    // a glob pinned to the events file
    val raw = s.readStream
      .schema(s.read.parquet(s"$d/events.parquet").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(d)
    val events = raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))

    val agg = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,10)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

    val q = agg.writeStream
      .format("memory").queryName("graft_st01_sink")
      .outputMode(OutputMode.Complete)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    s.table("graft_st01_sink").orderBy("hour_start", "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st01_stream_window" -> (st01StreamWindow _))

  /** Same oracle as the batch twin: tumbling 1h windows aligned to the
    * epoch are exactly date_trunc('hour'). */
  val oracleSql: Map[String, String] = Map(
    "st01_stream_window" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin)
}
