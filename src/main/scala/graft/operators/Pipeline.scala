package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end curation pipeline COMPOSITION (SURVEY.md §2 scale ops):
  * the point of having every operator in one engine is that the whole
  * chain runs as ONE declarative plan Catalyst can optimize globally,
  * instead of N materialization round-trips between tools.
  *
  * e01 composes quality scoring (t02's formula) → blocklist filtering
  * (t12's predicate) → exact dedup (d01's hash grouping) → the final
  * curated training set. The gate expressions are the SINGLE shared
  * definitions in [[TextAnalysis]] (consumed by t02, t12, e01, st09 —
  * four call sites, zero drift). Plan shape: both filters are
  * scan-stage predicates evaluated BEFORE the only shuffle, so
  * rejected documents never leave their input partition; the dedup
  * window shuffles the survivors keyed on an 8-byte content hash
  * (never the text — the projection drops it first), carrying only
  * the slim output columns. At 100 TB: one pass over the corpus, one
  * survivors-only exchange.
  */
object Pipeline {
  import TextAnalysis.{nTokensCol, qualityScoreCol, nBlockedCol,
    nTokensSql, qualityScoreSql, nBlockedSql, qualityGate}

  // ---------------------------------------------------------------- e01
  def e01Curate(s: SparkSession, d: String): DataFrame = {
    val staged = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        nTokensCol.cast("int").as("n_tokens"), qualityScoreCol.as("quality_score"),
        nBlockedCol.as("n_blocked"), xxhash64(col("text")).as("h"))
      .filter(col("quality_score") >= qualityGate && col("n_blocked") === 0)
    // d01's dedup contract: min doc_id per content hash is the keeper
    // (2^-64 collision odds, the established d01 precedent)
    staged
      .withColumn("keeper", min("doc_id").over(Window.partitionBy("h")))
      .filter(col("doc_id") === col("keeper"))
      .select("doc_id", "lang", "source", "n_tokens", "quality_score")
      .orderBy("doc_id")
  }

  /** Oracle: the same three stages in the same order (filters first,
    * dedup among survivors), with DuckDB partitioning the dedup window
    * by the text itself where Spark uses the 64-bit hash. */
  val e01OracleSql: String =
    s"""WITH q AS (
       |  SELECT doc_id, lang, source, text,
       |    $nTokensSql AS n_tokens,
       |    $qualityScoreSql AS quality_score
       |  FROM documents),
       |f AS (
       |  SELECT * FROM q
       |  WHERE quality_score >= $qualityGate
       |    AND $nBlockedSql = 0),
       |k AS (SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS keeper FROM f)
       |SELECT doc_id, lang, source, n_tokens, quality_score
       |FROM k WHERE doc_id = keeper ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- e02
  /** e02: the curation pipeline landed in the LAKEHOUSE — e01's curated
    * set ingested into the versioned [[graft.sources.TableCatalog]] as
    * one atomic MVCC version with PRIMARY KEY validation at write time,
    * then read back through the catalog's manifest scan. This is the
    * production handoff the pipeline ends with: downstream trainers
    * read a published table version (time-travelable, constraint-
    * checked), never a loose directory of files. The ingest cost is
    * e01's plan + one parquet write; the scan result must equal e01's
    * output exactly, which the same DuckDB oracle checks. */
  def e02CurateIngest(s: SparkSession, d: String): DataFrame = {
    val root = graft.sources.TableCatalog.tempRoot("graft-e02")
    val cat = new graft.sources.TableCatalog(s, root)
    val curated = e01Curate(s, d)
    cat.createTable("curated_docs", curated.schema, primaryKey = Some("doc_id"))
    cat.insert("curated_docs", curated)
    cat.scan("curated_docs").orderBy("doc_id")
  }

  // ---------------------------------------------------------------- e03
  /** e03: INCREMENTAL curation — the steady-state production run: a
    * NEW batch (odd doc_ids, d07's convention) is gated, deduped
    * within itself, and then checked for near-dups against the STORED
    * corpus (even doc_ids) — only survivors come out, and nothing
    * corpus-sized is recomputed: the corpus side is d07's stored
    * signature table, the gates are scan predicates on the new batch
    * only, the in-batch dedup shuffles survivors on an 8-byte hash,
    * and the corpus check is an anti-join against d07's incremental
    * match set (new-batch bands probing stored corpus bands — never a
    * corpus self-join). At 100 TB/day of new data against an existing
    * 100 TB corpus, per-run cost scales with the BATCH, not the
    * corpus. */
  def e03CurateIncremental(s: SparkSession, d: String): DataFrame = {
    val gated = Tables.documents(s, d)
      .filter(col("doc_id") % 2 =!= 0) // the new batch
      .select(col("doc_id"), col("lang"), col("source"),
        nTokensCol.cast("int").as("n_tokens"),
        qualityScoreCol.as("quality_score"),
        nBlockedCol.as("n_blocked"), xxhash64(col("text")).as("h"))
      .filter(col("quality_score") >= qualityGate && col("n_blocked") === 0)
    val deduped = gated
      .withColumn("keeper", min("doc_id").over(Window.partitionBy("h")))
      .filter(col("doc_id") === col("keeper"))
    val corpusMatched = Dedup.d07Incremental(s, d)
      .select(col("new_doc").as("doc_id")).distinct()
    deduped.join(corpusMatched, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "source", "n_tokens", "quality_score")
      .orderBy("doc_id")
  }

  /** Oracle: e01's gate/dedup stages restricted to the odd batch, then
    * the brute-force cross-parity near-dup matches removed (d07's
    * oracle restriction). */
  val e03OracleSql: String =
    s"""WITH ${Dedup.bruteCtes("\n   AND (a.doc_id % 2 = 0) != (b.doc_id % 2 = 0)")},
       |matched AS (
       |  SELECT DISTINCT CASE WHEN doc_b % 2 != 0 THEN doc_b ELSE doc_a END AS nd
       |  FROM scored WHERE jaccard >= 0.8),
       |q AS (
       |  SELECT doc_id, lang, source, text,
       |    $nTokensSql AS n_tokens,
       |    $qualityScoreSql AS quality_score
       |  FROM documents WHERE doc_id % 2 != 0),
       |f AS (
       |  SELECT * FROM q
       |  WHERE quality_score >= $qualityGate
       |    AND $nBlockedSql = 0),
       |k AS (SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS keeper FROM f)
       |SELECT doc_id, lang, source, n_tokens, quality_score
       |FROM k
       |WHERE doc_id = keeper AND doc_id NOT IN (SELECT nd FROM matched)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- e04
  /** e04: the FULL training-data materialization — quality gate +
    * blocklist → exact dedup → SEQUENCE PACKING — composed as ONE
    * Catalyst plan. This is the end state every stage in the library
    * builds toward: gates run in the scan (rejects never leave their
    * partition), survivors cross the one hash-keyed dedup exchange,
    * and p07's distributed exclusive prefix sum assigns every
    * surviving token its position in the packed 256-token training
    * layout — per-bucket windows in parallel, only ≤32 bucket
    * subtotals through the single-row stage. No stage materializes:
    * Catalyst plans gate+dedup+pack globally, which is the argument
    * for one engine instead of N tools with N round-trips. */
  def e04CuratePack(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val bounds = docs.agg(min("doc_id"), max("doc_id")).head()
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0L, 0L) else (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(1L, hi - lo + 1)
    val bsz = math.max(1L, (span + 31) / 32)
    val survivors = docs
      .select(col("doc_id"), nTokensCol.cast("long").as("n_tokens"),
        qualityScoreCol.as("quality_score"), nBlockedCol.as("n_blocked"),
        xxhash64(col("text")).as("h"))
      .filter(col("quality_score") >= qualityGate && col("n_blocked") === 0)
      .withColumn("keeper", min("doc_id").over(Window.partitionBy("h")))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("n_tokens"),
        ((col("doc_id") - lo) / bsz).cast("long").as("pid"))
    val wPrev = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wPid = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = survivors.groupBy("pid").agg(sum("n_tokens").as("bt"))
      .select(col("pid"), coalesce(sum("bt").over(wPid), lit(0L)).as("pid_offset"))
    survivors.join(broadcast(offsets), "pid")
      .select(col("doc_id"), col("n_tokens"),
        (coalesce(sum("n_tokens").over(wPrev), lit(0L)) + col("pid_offset"))
          .as("tokens_before"))
      .select(col("doc_id"), col("n_tokens"), col("tokens_before"),
        shiftright(col("tokens_before"), 8).as("pack_id"))
      .orderBy("doc_id")
  }

  val e04OracleSql: String =
    s"""WITH q AS (
       |  SELECT doc_id, text,
       |    CAST($nTokensSql AS BIGINT) AS n_tokens,
       |    $qualityScoreSql AS quality_score
       |  FROM documents),
       |f AS (
       |  SELECT * FROM q
       |  WHERE quality_score >= $qualityGate
       |    AND $nBlockedSql = 0),
       |k AS (SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS keeper FROM f),
       |surv AS (SELECT doc_id, n_tokens FROM k WHERE doc_id = keeper),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |           AS tokens_before
       |  FROM surv)
       |SELECT doc_id, n_tokens, tokens_before,
       |       tokens_before // 256 AS pack_id
       |FROM c ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- e05
  /** e05: the e04 materialization with DSIR DATA SELECTION composed in
    * — gates + blocklist → importance keep (t18's target-vs-raw LLR >
    * 0, the "select data that looks like the target domain" pass) →
    * exact dedup → sequence packing, ONE Catalyst plan. The DSIR score
    * is a pure function of `text`, so the keep filter commutes with
    * the hash dedup (every duplicate carries the same score) and is
    * applied BEFORE the dedup exchange — rejected docs never shuffle.
    * The scoring subtree is [[TextAnalysis.dsirScoreFrame]] (shared
    * with t18 — one definition); its vocabulary-sized LM tables ride
    * broadcast joins, so composing selection in adds ZERO corpus-side
    * exchanges beyond e04's: the doc_id-keyed score join is the only
    * new shuffle, against an already-gated survivor set. */
  def e05CurateSelectPack(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val bounds = docs.agg(min("doc_id"), max("doc_id")).head()
    val (lo, hi) =
      if (bounds.isNullAt(0)) (0L, 0L) else (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(1L, hi - lo + 1)
    val bsz = math.max(1L, (span + 31) / 32)
    val survivors = docs
      .select(col("doc_id"), nTokensCol.cast("long").as("n_tokens"),
        qualityScoreCol.as("quality_score"), nBlockedCol.as("n_blocked"),
        xxhash64(col("text")).as("h"))
      .filter(col("quality_score") >= qualityGate && col("n_blocked") === 0)
      .join(TextAnalysis.dsirScoreFrame(s, d), "doc_id")
      .filter(col("dsir_score") > 0) // the selection pass
      .withColumn("keeper", min("doc_id").over(Window.partitionBy("h")))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("n_tokens"),
        ((col("doc_id") - lo) / bsz).cast("long").as("pid"))
    val wPrev = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wPid = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = survivors.groupBy("pid").agg(sum("n_tokens").as("bt"))
      .select(col("pid"), coalesce(sum("bt").over(wPid), lit(0L)).as("pid_offset"))
    survivors.join(broadcast(offsets), "pid")
      .select(col("doc_id"), col("n_tokens"),
        (coalesce(sum("n_tokens").over(wPrev), lit(0L)) + col("pid_offset"))
          .as("tokens_before"))
      .select(col("doc_id"), col("n_tokens"), col("tokens_before"),
        shiftright(col("tokens_before"), 8).as("pack_id"))
      .orderBy("doc_id")
  }

  val e05OracleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |         unnest(list_filter(string_split(lower(text), ' '), t -> t != '')) AS term
       |  FROM documents),
       |dt AS (SELECT doc_id, term, COUNT(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
       |raw AS (SELECT term, COUNT(*)::BIGINT AS cr FROM toks GROUP BY 1),
       |tgt AS (SELECT term, COUNT(*)::BIGINT AS ct FROM toks WHERE source = 'src0' GROUP BY 1),
       |tot AS (SELECT (SELECT SUM(cr) FROM raw) AS nr,
       |               (SELECT COUNT(*) FROM raw) AS v,
       |               (SELECT SUM(ct) FROM tgt) AS nt),
       |dsir AS (
       |  SELECT doc_id,
       |         ROUND(SUM(c * (ln((COALESCE(ct, 0) + 1.0) / (nt + v))
       |                      - ln((cr + 1.0) / (nr + v)))), 4) + 0.0 AS dsir_score
       |  FROM dt JOIN raw USING (term) LEFT JOIN tgt USING (term) CROSS JOIN tot
       |  GROUP BY doc_id),
       |q AS (
       |  SELECT doc_id, text,
       |    CAST($nTokensSql AS BIGINT) AS n_tokens,
       |    $qualityScoreSql AS quality_score
       |  FROM documents),
       |f AS (
       |  SELECT q.* FROM q JOIN dsir USING (doc_id)
       |  WHERE quality_score >= $qualityGate
       |    AND $nBlockedSql = 0
       |    AND dsir_score > 0),
       |k AS (SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS keeper FROM f),
       |surv AS (SELECT doc_id, n_tokens FROM k WHERE doc_id = keeper),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |           AS tokens_before
       |  FROM surv)
       |SELECT doc_id, n_tokens, tokens_before,
       |       tokens_before // 256 AS pack_id
       |FROM c ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e01_curate" -> (e01Curate _),
    "e02_curate_ingest" -> (e02CurateIngest _),
    "e03_curate_incremental" -> (e03CurateIncremental _),
    "e04_curate_pack" -> (e04CuratePack _),
    "e05_curate_select_pack" -> (e05CurateSelectPack _))

  val oracleSql: Map[String, String] = Map(
    "e01_curate" -> e01OracleSql,
    // the ingested managed table must equal the curated set exactly
    "e02_curate_ingest" -> e01OracleSql,
    "e03_curate_incremental" -> e03OracleSql,
    "e04_curate_pack" -> e04OracleSql,
    "e05_curate_select_pack" -> e05OracleSql)
}
