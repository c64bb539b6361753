package graft

import graft.functions._
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Validation tool: proves the LSH-blocked near-dup pipeline is
  * COMPLETE on a dataset — that d04's candidate-verified pair set
  * equals the brute-force all-pairs scan at the same threshold.
  *
  * This is the empirical fact that licenses d04/d06's DuckDB oracles
  * (which compute the brute-force answer): minhash LSH is probabilistic
  * in general, but deterministic given (data, seed) — so completeness
  * checked here once holds for every future run over the same data.
  * On this corpus near-dup pairs are far above the 0.8 threshold
  * (planted at ~0.99, where a band-miss has probability ~1e-12) and
  * unrelated pairs are far below (~0.1); borderline pairs that LSH
  * could plausibly miss do not occur.
  *
  * Usage: runMain graft.BruteCheck /root/testdata/sf0.01
  */
object BruteCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.create()
    try {
      // same shingle width/threshold as Dedup (ShingleN = 5, 0.8)
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), shingles64(col("text"), 5).as("sh"))
        .cache()
      val brute = docs.as("a").crossJoin(docs.as("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          jaccard64(col("a.sh"), col("b.sh")).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
      val lsh = operators.Dedup.d04NgramJaccard(spark, dir)
      val missed = brute.join(lsh, Seq("doc_a", "doc_b"), "left_anti").count()
      val spurious = lsh.join(brute, Seq("doc_a", "doc_b"), "left_anti").count()
      val n = brute.count()
      println(s"[brutecheck] $dir: brute-force pairs=$n missed-by-LSH=$missed spurious=$spurious")
      if (missed != 0 || spurious != 0)
        sys.error(s"d04 is NOT complete on $dir: missed=$missed spurious=$spurious")
      println("[brutecheck] COMPLETE: d04 == brute force")
    } finally spark.stop()
  }
}
