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
  * curated training set. Plan shape: both filters are scan-stage
  * predicates evaluated BEFORE the only shuffle, so rejected documents
  * never leave their input partition; the dedup window shuffles the
  * survivors keyed on an 8-byte content hash (never the text — the
  * projection drops it first), carrying only the slim output columns.
  * At 100 TB: one pass over the corpus, one survivors-only exchange.
  */
object Pipeline {

  /** The gate expressions, shared by batch e01 and streaming st09 so
    * the two twins cannot drift. All pure functions of `text`. */
  private[graft] def nTokensCol: org.apache.spark.sql.Column = {
    val nChars  = length(col("text"))
    nChars - length(regexp_replace(col("text"), " ", "")) + 1
  }

  /** t02's quality score, verbatim — bit-identical across engines
    * (t02's oracle passes hash-exact), so thresholding on it agrees. */
  private[graft] def qualityScoreCol: org.apache.spark.sql.Column = {
    val nChars  = length(col("text"))
    val charDen = greatest(nChars, lit(1))
    val nSpaces = nChars - length(regexp_replace(col("text"), " ", ""))
    val nTokens = nSpaces + 1
    val nPunct  = nChars - length(regexp_replace(col("text"), "[.,!?;:]", ""))
    val nDigit  = nChars - length(regexp_replace(col("text"), "[0-9]", ""))
    least(lit(1.0), nTokens.cast("double") / 50.0) *
      (lit(1.0) - least(lit(0.5),
        nPunct.cast("double") / charDen + nDigit.cast("double") / charDen)) *
      least(lit(1.0), ((nChars - nSpaces).cast("double") / nTokens) / 8.0)
  }

  private[graft] def nBlockedCol: org.apache.spark.sql.Column =
    size(filter(typedLit(TextAnalysis.blockPhrases), p => col("text").contains(p)))

  // ---------------------------------------------------------------- e01
  def e01Curate(s: SparkSession, d: String): DataFrame = {
    val staged = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        nTokensCol.cast("int").as("n_tokens"), qualityScoreCol.as("quality_score"),
        nBlockedCol.as("n_blocked"), xxhash64(col("text")).as("h"))
      .filter(col("quality_score") >= 0.35 && col("n_blocked") === 0)
    // d01's dedup contract: min doc_id per content hash is the keeper
    // (2^-64 collision odds, the established d01 precedent)
    staged
      .withColumn("keeper", min("doc_id").over(Window.partitionBy("h")))
      .filter(col("doc_id") === col("keeper"))
      .select("doc_id", "lang", "source", "n_tokens", "quality_score")
      .orderBy("doc_id")
  }

  /** DuckDB fragments of the gate expressions, shared with st09's
    * oracle the same way the Column forms are shared with st09. */
  private[graft] val nTokensSql: String =
    "CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, ' ', '', 'g')) + 1 AS INT)"
  private[graft] val qualityScoreSql: String =
    """LEAST(1.0, CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, ' ', '', 'g')) + 1 AS DOUBLE) / 50.0)
      |    * (1.0 - LEAST(0.5,
      |         CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / GREATEST(LENGTH(text), 1)
      |       + CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')) AS DOUBLE) / GREATEST(LENGTH(text), 1)))
      |    * LEAST(1.0, (CAST(LENGTH(REGEXP_REPLACE(text, ' ', '', 'g')) AS DOUBLE)
      |        / (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, ' ', '', 'g')) + 1)) / 8.0)""".stripMargin
  private[graft] val nBlockedSql: String = {
    val lst = TextAnalysis.blockPhrases
      .map(p => s"'${p.replace("'", "''")}'").mkString("[", ", ", "]")
    s"len(list_filter($lst, p -> contains(text, p)))"
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
       |  WHERE quality_score >= 0.35
       |    AND $nBlockedSql = 0),
       |k AS (SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS keeper FROM f)
       |SELECT doc_id, lang, source, n_tokens, quality_score
       |FROM k WHERE doc_id = keeper ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e01_curate" -> (e01Curate _))

  val oracleSql: Map[String, String] = Map(
    "e01_curate" -> e01OracleSql)
}
