package graft.operators

import graft.functions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding column
  * (SURVEY.md §2 scale ops).
  *
  * s01 is the exact baseline: one scan, cosine against a broadcast
  * query vector, TakeOrdered top-k — O(n) compute, no shuffle of the
  * vectors themselves. s02 is the scale path: a cheap per-row LSH
  * signature prunes the corpus to a small candidate set before any
  * cosine is evaluated (IVF-style two-stage retrieval); at 100 TB the
  * signature filter drops ~90% of rows at the scan, and only
  * candidates pay the O(dim) kernel.
  */
object Similarity {

  private val SigBits = 16
  private val Seed    = 7L
  private val K       = 10

  /** The fixed probe: embedding of vec_id 0, broadcast to all rows. */
  private def probe(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))

  // ---------------------------------------------------------------- s01
  def s01BruteForce(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe(s, d)))
      .select(col("vec_id"), cosine_sim(col("embedding"), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(K)

  // ---------------------------------------------------------------- s02
  /** LSH-pruned ANN: only rows whose 16-bit hyperplane signature is
    * within hamming distance 5 of the probe's signature pay the
    * cosine. Approximate by construction (recall < 1 vs s01). */
  def s02LshAnn(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe(s, d)))
      .filter(
        hamming64(
          hyperplane_sig(col("embedding"), SigBits, Seed),
          hyperplane_sig(col("qv"), SigBits, Seed)) <= 5)
      .select(col("vec_id"), cosine_sim(col("embedding"), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(K)

  // ---------------------------------------------------------------- s03
  /** Per-label embedding centroids via the one-pass [[graft.functions
    * .VectorAgg]] aggregator (custom typed Aggregator — constant
    * shuffle bytes per group). The coarse quantizer step of an IVF
    * index build. */
  def s03Centroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .groupBy("label")
      .agg(
        count(lit(1)).as("n"),
        graft.functions.VectorAgg.centroid_agg(col("embedding")).as("centroid"))
      .select(col("label"), col("n"),
        size(col("centroid")).as("dim"),
        round(element_at(col("centroid"), 1).cast("double"), 5).as("c0"))
      .orderBy("label")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_ann_brute" -> (s01BruteForce _),
    "s02_ann_lsh"   -> (s02LshAnn _),
    "s03_centroids" -> (s03Centroids _))

  val oracleSql: Map[String, String] = Map.empty
}
