package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset splitting / sampling for training pipelines (SURVEY.md §2
  * scale ops). Both are single-scan, shuffle-free column operations —
  * assignment is a function of the row, so it is stable under
  * re-partitioning, retries, and incremental reprocessing (the
  * property `randomSplit` does NOT have: its assignment depends on
  * partition layout). */
object Sampling {

  /** p01: deterministic train/val/test assignment by key hash:
    * pmod(xxhash64(doc_id), 100) → <90 train, <95 val, else test.
    * Re-running over a grown corpus never reassigns an existing row. */
  def p01HashSplit(s: SparkSession, d: String): DataFrame = {
    val bucket = pmod(xxhash64(col("doc_id")), lit(100))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
          .as("split"))
      .orderBy("doc_id")
  }

  /** p02: stratified sample — per-stratum Bernoulli decided by a PURE
    * row function (key hash vs per-stratum threshold), so membership
    * is stable under re-partitioning, task retries, and corpus growth.
    * `sampleBy` would not be: it draws from rand(seed), whose value
    * depends on partition index and row position — the moment file
    * splits shift, a different sample comes back. Strata absent from
    * the fraction map are excluded (sampleBy semantics). */
  def p02StratifiedSample(s: SparkSession, d: String): DataFrame = {
    val fractions = Seq("en" -> 0.5, "fr" -> 0.5, "de" -> 0.5, "es" -> 0.5, "zh" -> 0.5)
    val seed = 42L
    val draw = pmod(xxhash64(col("doc_id"), col("lang"), lit(seed)), lit(10000))
    val threshold = fractions.foldLeft(lit(-1)) { case (acc, (l, f)) =>
      when(col("lang") === l, lit((f * 10000).toInt)).otherwise(acc)
    }
    Tables.documents(s, d)
      .filter(draw < threshold)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** p03: leakage-safe TEMPORAL split — train strictly before the
    * cutoff, test at/after it. The split every time-series / events
    * model needs: a hash split would leak future rows of a user into
    * training. Pure row predicate → single scan, no shuffle except the
    * final presentation sort, stable under reprocessing; and unlike
    * p01/p02's engine-specific hashes, exactly SQL-expressible, so it
    * is DuckDB-oracle-checked. */
  def p03TimeSplit(s: SparkSession, d: String): DataFrame = {
    // to_timestamp resolves in the pinned SESSION timezone (UTC) —
    // java.sql.Timestamp.valueOf would parse in the JVM default zone
    // and silently shift the cutoff against the UTC-literal oracle
    val cutoff = to_timestamp(lit("2024-01-22 00:00:00"))
    Tables.events(s, d)
      .select(
        col("event_id"), col("user_id"),
        when(col("ts") < cutoff, "train").otherwise("test").as("split"))
      .orderBy("event_id")
  }

  val p03OracleSql: String =
    """SELECT event_id, user_id,
      |       CASE WHEN ts < TIMESTAMP '2024-01-22 00:00:00'
      |            THEN 'train' ELSE 'test' END AS split
      |FROM events ORDER BY event_id""".stripMargin

  /** p04: per-group quota cap — "keep at most N documents per
    * language/domain", the balance pass crawl pipelines run so one
    * giant domain can't dominate the corpus. Deterministic rank
    * (doc_id order, no RNG) so reprocessing keeps the same rows. One
    * shuffle on the group key; at 100 TB the rank never materializes
    * the group — row_number streams each partition, and AQE's skew
    * split doesn't apply to windows, so a pathological mega-group is
    * the one skew [[Scale.saltedCapPerGroup]] bounds (rank within
    * hash-salted subgroup, then exact re-rank of the ≤ salt·N
    * survivors — spec-proven identical to this plain cap). */
  def p04CapPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 50)
      .orderBy("lang", "doc_id")
  }

  val p04OracleSql: String =
    """SELECT doc_id, lang, CAST(rn AS INT) AS rn FROM (
      |  SELECT doc_id, lang,
      |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      |  FROM documents) t
      |WHERE rn <= 50 ORDER BY lang, doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_hash_split"        -> (p01HashSplit _),
    "p02_stratified_sample" -> (p02StratifiedSample _),
    "p03_time_split"        -> (p03TimeSplit _),
    "p04_cap_per_group"     -> (p04CapPerGroup _))

  // p01/p02 rows-only: engine-specific RNG/hash
  val oracleSql: Map[String, String] = Map(
    "p03_time_split"    -> p03OracleSql,
    "p04_cap_per_group" -> p04OracleSql)
}
