package graft

import org.apache.spark.sql.functions._

/** t19 at a PRODUCTION merge budget — train 1,000 BPE merges on sf0.1
  * through the exact suite code path ([[operators.TextAnalysis
  * .bpeTrainOn]]) and report merges learned, Spark rounds paid, and
  * wall time. The batched-greedy acceptance rule is the claim under
  * measurement: rounds ≪ merges (a naive trainer pays one
  * count+argmax+apply round PER merge).
  *
  *   sbt "runMain graft.BpeScale /root/testdata/sf0.1 1000"
  *
  * Two corpora, both reported:
  *  - `words`: the documents table's real word vocabulary. The fixture
  *    has ~31 distinct words, so BPE COLLAPSES (every word one symbol)
  *    long before 1,000 merges — the honest result on this data, and
  *    the early-exit path's proof at scale.
  *  - `trigrams`: 3-word sequences as "words" (~20k distinct) — the
  *    vocabulary RICHNESS of a production corpus, so the budget is
  *    actually reachable and the rounds≪merges claim is exercised at
  *    full depth. (BPE cost is vocabulary-bounded after the first
  *    corpus pass, so vocabulary richness — not corpus row count — is
  *    the scale axis that matters here.)
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val budget = args.lift(1).map(_.toInt).getOrElse(1000)
    val spark = GraftSession.create(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
    val docs = sources.Tables.documents(spark, d).filter(col("text").isNotNull)

    def run(tag: String, words: org.apache.spark.sql.DataFrame): Unit = {
      val vocabSize = words.count()
      val t0 = System.nanoTime()
      val (merges, vocab) = operators.TextAnalysis.bpeTrainOn(spark, words, budget)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[bpescale] corpus=$tag budget=$budget distinct_words=$vocabSize " +
        f"merges=${merges.size} rounds=${operators.TextAnalysis.t19TrainRounds} " +
        f"vocab=${vocab.size} wall=$secs%.1f s " +
        f"merges_per_round=${merges.size.toDouble / operators.TextAnalysis.t19TrainRounds}%.1f")
    }

    run("words", docs
      .select(explode(split(col("text"), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("freq")))

    // docs shorter than the gram width are filtered BEFORE the
    // transform: sequence(1, 0) would be the DESCENDING [1, 0] (Spark
    // infers step -1), and slice with a non-positive start throws
    run("trigrams", docs
      .filter(size(split(col("text"), " ")) >= 3)
      .select(explode(expr(
        """transform(sequence(1, size(split(text, ' ')) - 2),
          |  i -> concat_ws('_', slice(split(text, ' '), i, 3)))""".stripMargin))
        .as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("freq")))

    spark.stop()
  }
}
