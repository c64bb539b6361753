package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE ENCODER — applies a trained ranked merge table (t19's output,
  * Sennrich et al. 2016 apply semantics) to a document's term array in
  * ONE kernel call per document, instead of one DataFrame pass per
  * merge rank. This is the t20 corpus-tokenization kernel: the most-run
  * pass of an LLM data pipeline, so the whole merge table rides the
  * plan as a reference object (vocabulary-sized — 30k merges is a few
  * hundred KB, shipped once per executor, never per row).
  *
  * Per word: initial segmentation is code points + the `</w>`
  * end-of-word marker, then each merge is applied in RANK ORDER as a
  * left-to-right non-overlapping pass — byte-for-byte the semantics of
  * [[Kernels.bpeMerge]], which is what t19 trained with (and what the
  * equivalence spec pins). Token ids index the vocabulary array.
  *
  * Words repeat enormously in any natural corpus (Zipf), so encoded
  * words are memoized in a bounded per-codec cache: the hot path for a
  * typical document is a hash lookup per word, not a merge loop. The
  * cache is a ConcurrentHashMap because ONE codec instance is shared by
  * every task of an executor (it ships as a codegen reference object);
  * the size cap bounds memory, and on overflow new words just encode
  * uncached (no eviction scan on the hot path).
  */
final class BpeCodec(
    merges: Array[(String, String)],
    vocab: Array[String],
    firstK: Int) extends Serializable {
  require(firstK >= 0, s"BpeCodec: firstK must be >= 0, got $firstK")

  @transient private lazy val ids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.length * 2)
    var i = 0
    // putIfAbsent: if two merges produce the same surface string (e.g.
    // (a,bc) and (ab,c) both yielding "abc"), the LOWEST id wins
    // deterministically
    while (i < vocab.length) { m.putIfAbsent(vocab(i), Integer.valueOf(i)); i += 1 }
    m
  }

  @transient private lazy val wordCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
  private val WordCacheCap = 1 << 16

  /** One left-to-right non-overlapping merge pass IN PLACE over
    * seg[0,n): returns the new length. Mirrors [[Kernels.bpeMerge]]:
    * "aaa" under (a,a) becomes ["aa","a"]. */
  private def mergePass(seg: Array[String], n: Int, a: String, b: String): Int = {
    var i = 0
    var k = 0
    while (i < n) {
      if (i + 1 < n && seg(i) == a && seg(i + 1) == b) {
        seg(k) = a + b; k += 1; i += 2
      } else {
        seg(k) = seg(i); k += 1; i += 1
      }
    }
    k
  }

  /** Token ids of one word under the full ranked merge table. A token
    * absent from the vocabulary (impossible when the word's code
    * points all occurred in the training corpus) maps to -1. */
  def encodeWord(w: String): Array[Int] = {
    val cached = wordCache.get(w)
    if (cached != null) return cached
    // code-point segmentation + end-of-word marker (t19's
    // split(term, "") init — Java's zero-width split keeps surrogate
    // pairs whole, so iterate by code point here too)
    val nCp = w.codePointCount(0, w.length)
    var seg = new Array[String](nCp + 1)
    var i = 0
    var ci = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      seg(ci) = new String(Character.toChars(cp))
      ci += 1
      i += Character.charCount(cp)
    }
    seg(ci) = "</w>"
    var n = nCp + 1
    var r = 0
    while (r < merges.length && n >= 2) {
      n = mergePass(seg, n, merges(r)._1, merges(r)._2)
      r += 1
    }
    val out = new Array[Int](n)
    var j = 0
    while (j < n) {
      val id = ids.get(seg(j))
      out(j) = if (id == null) -1 else id.intValue()
      j += 1
    }
    if (wordCache.size < WordCacheCap) wordCache.put(w, out)
    out
  }

  /** struct(n_bpe_tokens BIGINT, token_ids ARRAY<INT>) for a document's
    * term array: total BPE token count plus the first `firstK` ids —
    * the bounded projection a 100 TB tokenization job materializes
    * (full id arrays would be the packed-sequence writer's job, p07). */
  def encode(terms: ArrayData): InternalRow = {
    var n = 0L
    val first = new Array[Int](firstK)
    var have = 0
    val nTerms = terms.numElements()
    var t = 0
    while (t < nTerms) {
      val idsW = encodeWord(terms.getUTF8String(t).toString)
      n += idsW.length
      var j = 0
      while (have < firstK && j < idsW.length) {
        first(have) = idsW(j); have += 1; j += 1
      }
      t += 1
    }
    new GenericInternalRow(Array[Any](n,
      new GenericArrayData(java.util.Arrays.copyOf(first, have))))
  }
}

/** t20's whole-document encode: term array in, (count, first-k ids)
  * struct out. The merge table and vocabulary are expression
  * parameters (Seq equality keeps plan canonicalization structural),
  * compiled into a [[BpeCodec]] reference object at codegen — one
  * table per plan, shipped once per executor. */
case class BpeEncode(
    child: Expression,
    merges: Seq[(String, String)],
    vocab: Seq[String],
    firstK: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_bpe_tokens", LongType, nullable = false),
    StructField("token_ids", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"
  @transient private lazy val codec =
    new BpeCodec(merges.toArray, vocab.toArray, firstK)
  override protected def nullSafeEval(a: Any): Any =
    codec.encode(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec, classOf[BpeCodec].getName)
    defineCodeGen(ctx, ev, a => s"$ref.encode($a)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
