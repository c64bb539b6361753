package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities: the join strategies a 100 TB deployment reaches
  * for when the defaults hit their limits (SURVEY.md §3).
  *
  * - [[saltedJoin]]: skew mitigation when one key dominates — AQE's
  *   skew-join splits oversized *partitions*, but a single hot KEY
  *   still lands in one task; salting spreads it over `salt` tasks.
  * - [[writeBucketed]] / co-located joins: pre-shuffling fact tables
  *   into matching bucket layouts makes every later equi-join on the
  *   bucket key shuffle-free — the biggest single lever for repeated
  *   joins over the same keys.
  */
object Scale {

  /** Skew-safe inner equi-join: replicates each `right` row `salt`
    * times (salt id appended to the key) and scatters `left` rows
    * uniformly over the salt ids, so a hot key's probe rows spread
    * across `salt` tasks instead of one. Semantics identical to
    * `left.join(right, key)` for inner joins. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt >= 1, s"saltedJoin: salt must be >= 1, got $salt (0 would drop every row)")
    val saltCol = "__graft_salt"
    val l = left.withColumn(saltCol, (rand(seed = 7) * salt).cast("int"))
    val r = right.withColumn(saltCol, explode(array((0 until salt).map(lit): _*)))
    l.join(r, Seq(key, saltCol), "inner").drop(saltCol)
  }

  /** Writes `df` bucketed by `key` into the session catalog as
    * `table`. Two tables bucketed the same way equi-join on the
    * bucket key with NO exchange on either side. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Reads a bucketed table back from the session catalog. */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
