package graft

import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.{Column, SparkSession}

/** Column-API surface for the graft custom expressions, mirroring
  * `org.apache.spark.sql.functions`. */
package object functions {

  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))

  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def sq8_cos_ub(v: Column, q: Seq[Float]): Column =
    column(Sq8CosUb(expression(v), q))

  def hyperplane_sig(v: Column, bits: Int, seed: Long): Column =
    column(HyperplaneSig(expression(v), bits, seed))

  def simhash64(text: Column): Column =
    column(SimHash64(expression(text)))

  def hamming64(a: Column, b: Column): Column =
    column(Hamming64(expression(a), expression(b)))

  def nearest_centroid(v: Column, centroids: Column): Column =
    column(NearestCentroid(expression(v), expression(centroids)))

  def shingles64(text: Column, n: Int): Column =
    column(Shingles64(expression(text), n))

  def minhash_sig(text: Column, n: Int, k: Int, seed: Long): Column =
    column(MinHashSig(expression(text), n, k, seed))

  def fingerprint64(text: Column, n: Int, w: Int): Column =
    column(Fingerprint64(expression(text), n, w))

  def word_grams64(text: Column, n: Int): Column =
    column(WordGrams64(expression(text), n))

  def word_gram_stats(text: Column, n: Int): Column =
    column(WordGramStats(expression(text), n))

  def jaccard64(a: Column, b: Column): Column =
    column(Jaccard64(expression(a), expression(b)))

  def char_entropy(text: Column): Column =
    column(CharEntropy(expression(text)))

  def multi_contains(text: Column, phrases: Seq[String]): Column =
    column(MultiContains(expression(text), phrases))

  def bpe_merge(seg: Column, left: Column, right: Column): Column =
    column(BpeMerge(expression(seg), expression(left), expression(right)))

  def bpe_encode(terms: Column, merges: Seq[(String, String)],
      vocab: Seq[String], firstK: Int): Column =
    column(BpeEncode(expression(terms), merges, vocab, firstK))

  def pack_codes(codes: Column): Column =
    column(PackCodes(expression(codes)))

  def pq_adc(codes: Column, lut: Seq[Double], k: Int): Column =
    column(PqAdc(expression(codes), lut, k))

  def bloom_might_contain(v: Column,
      bf: org.apache.spark.util.sketch.BloomFilter): Column =
    column(BloomMightContain(expression(v), bf))

  def cdc_chunks(text: Column, maskBits: Int, minLen: Int, maxLen: Int): Column =
    column(CdcChunks(expression(text), maskBits, minLen, maxLen))
}

package functions {

  import org.apache.spark.sql.catalyst.expressions.Expression

  /** SQL registration so the functions are reachable from `spark.sql`
    * — the analog of the reference exposing functions through its SQL
    * front (/root/reference/src/sql/plan/planner.rs:378). */
  object Registry {
    private def intArg(e: Expression): Int =
      e.eval(null) match {
        case i: Int  => i
        case l: Long => l.toInt
        case other   => throw new IllegalArgumentException(s"expected integer literal, got $other")
      }
    private def longArg(e: Expression): Long =
      e.eval(null) match {
        case i: Int  => i.toLong
        case l: Long => l
        case other   => throw new IllegalArgumentException(s"expected integer literal, got $other")
      }

    def registerAll(spark: SparkSession): Unit = {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "scala_udf")
      reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "scala_udf")
      reg.createOrReplaceTempFunction("hyperplane_sig",
        es => HyperplaneSig(es(0), intArg(es(1)), longArg(es(2))), "scala_udf")
      reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es(0)), "scala_udf")
      reg.createOrReplaceTempFunction("hamming64", es => Hamming64(es(0), es(1)), "scala_udf")
      reg.createOrReplaceTempFunction("nearest_centroid",
        es => NearestCentroid(es(0), es(1)), "scala_udf")
      reg.createOrReplaceTempFunction("shingles64",
        es => Shingles64(es(0), intArg(es(1))), "scala_udf")
      reg.createOrReplaceTempFunction("minhash_sig",
        es => MinHashSig(es(0), intArg(es(1)), intArg(es(2)), longArg(es(3))), "scala_udf")
      reg.createOrReplaceTempFunction("fingerprint64",
        es => Fingerprint64(es(0), intArg(es(1)), intArg(es(2))), "scala_udf")
      reg.createOrReplaceTempFunction("word_grams64",
        es => WordGrams64(es(0), intArg(es(1))), "scala_udf")
      reg.createOrReplaceTempFunction("word_gram_stats",
        es => WordGramStats(es(0), intArg(es(1))), "scala_udf")
      reg.createOrReplaceTempFunction("jaccard64", es => Jaccard64(es(0), es(1)), "scala_udf")
      reg.createOrReplaceTempFunction("char_entropy", es => CharEntropy(es(0)), "scala_udf")
      reg.createOrReplaceTempFunction("bpe_merge",
        es => BpeMerge(es(0), es(1), es(2)), "scala_udf")
      // merge/vocab tables must be FOLDABLE array literals: the codec
      // is compiled once at plan time (the multi_contains discipline)
      reg.createOrReplaceTempFunction("bpe_encode", es => {
        def strings(e: Expression, what: String): Seq[String] = {
          require(e.foldable, s"bpe_encode: $what must be a literal array")
          val arr = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
        }
        val lefts = strings(es(1), "merge lefts")
        val rights = strings(es(2), "merge rights")
        require(lefts.length == rights.length,
          "bpe_encode: merge lefts/rights length mismatch")
        BpeEncode(es(0), lefts.zip(rights), strings(es(3), "vocab"),
          intArg(es(4)))
      }, "scala_udf")
      reg.createOrReplaceTempFunction("pack_codes", es => PackCodes(es(0)), "scala_udf")
      // ADC table must be a FOLDABLE array literal — compiled into the
      // plan once, like multi_contains' phrase list
      reg.createOrReplaceTempFunction("pq_adc", es => {
        require(es(1).foldable, "pq_adc: lookup table must be a literal array")
        val arr = es(1).eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        PqAdc(es(0), arr.toDoubleArray().toSeq, intArg(es(2)))
      }, "scala_udf")
      // phrase list must be a FOLDABLE array literal: the automaton is
      // built once at plan time, which is the whole point
      reg.createOrReplaceTempFunction("multi_contains", es => {
        require(es(1).foldable, "multi_contains: phrase list must be a literal array")
        val arr = es(1).eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val phrases = (0 until arr.numElements())
          .map(i => arr.getUTF8String(i).toString)
        MultiContains(es(0), phrases)
      }, "scala_udf")
    }
  }
}
