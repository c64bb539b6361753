package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory for the graft engine.
  *
  * The reference (entangleDB) boots a server exposing a SQL surface over
  * its storage engine (/root/reference/src/server.rs); on Spark the
  * equivalent "server" is a configured SparkSession with the graft
  * function library registered so the full surface is reachable from
  * both the DataFrame API and `spark.sql`.
  *
  * Scale defaults: AQE on (runtime re-plan, skew-join splitting),
  * shuffle partitions sized for the local harness (a real cluster would
  * set this to ~2-3x total cores or rely on AQE coalescing).
  */
object GraftSession {

  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .withExtensions(new plans.GraftExtensions) // domain optimizer rules
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def create(master: String = "local[32]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    prepare(spark)
    spark
  }

  /** Idempotent per-session setup: registers the graft SQL functions
    * and declares the TIMESTAMP(NANOS) parquet handling session-wide
    * (the events table needs it; without the conf Spark refuses such
    * files outright, so setting it up front makes the behavior explicit
    * instead of dependent on which loader happened to run first).
    * Safe to call on an externally-created session (the driver's
    * Verify/Bench mains own their session). */
  def prepare(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    functions.Registry.registerAll(spark)
    // the TopKPerGroup planner strategy, for sessions NOT built through
    // GraftSession.builder (extensions bind at construction only; the
    // experimental hook is the supported post-hoc route — the driver's
    // Verify main owns its own session)
    if (!spark.experimental.extraStrategies.contains(plans.TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ plans.TopKPerGroupStrategy
    spark
  }

  /** EXPLAIN analog (reference: ast.rs:17 `Explain`). Returns the
    * formatted physical plan, the artifact a user would inspect for
    * pushdown / join strategy / codegen spans. */
  def explainPlan(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  /** Bind `bindings` as temp views for the duration of `body`, then
    * RESTORE whatever TEMP VIEW each name held before (or drop the
    * view if none existed): no caller-private snapshot may linger in
    * the session's shared temp-view namespace, and a permanent catalog
    * table is never re-materialized as a view (that would pin stale
    * data over it). Safe because spark.sql/DataFrame ops analyze
    * eagerly — frames built inside `body` stay valid after restore. */
  def withTempViews[A](spark: SparkSession, bindings: Seq[(String, DataFrame)])(body: => A): A = {
    val saved = bindings.flatMap { case (n, _) =>
      scala.util.Try(spark.catalog.getTable(n)).toOption
        .filter(_.isTemporary)
        .map(_ => n -> spark.table(n))
    }.toMap
    bindings.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    try body
    finally bindings.foreach { case (n, _) =>
      saved.get(n) match {
        case Some(prior) => prior.createOrReplaceTempView(n)
        case None        => spark.catalog.dropTempView(n)
      }
    }
  }
}
