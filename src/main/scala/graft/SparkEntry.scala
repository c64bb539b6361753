package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.prepare(spark)
    operators.Relational.q04AggGroup(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = operators.Relational.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.TextAnalysis.queries ++
      operators.Multimodal.queries ++
      operators.Sampling.queries ++
      operators.Pipeline.queries ++
      streaming.StreamQueries.queries
    all.map { case (name, fn) =>
      name -> { (s: SparkSession, d: String) =>
        GraftSession.prepare(s)
        fn(s, d)
      }
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracleSql ++
      operators.Dedup.oracleSql ++
      operators.Similarity.oracleSql ++
      operators.TextAnalysis.oracleSql ++
      operators.Multimodal.oracleSql ++
      operators.Sampling.oracleSql ++
      operators.Pipeline.oracleSql ++
      streaming.StreamQueries.oracleSql
}
