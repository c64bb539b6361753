package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst Expressions for the graft per-row kernels.
  *
  * All generate inline code calling the static [[Kernels]] forwarders,
  * so they participate in whole-stage codegen (no interpreted fallback,
  * no UDF serialization). All are deterministic and null-intolerant
  * (null in → null out), which lets Catalyst propagate IsNotNull
  * constraints through them. All declare ImplicitCastInputTypes: the
  * kernels read Tungsten arrays with a fixed element stride, so an
  * unchecked array<double> argument (easy to produce from SQL literals)
  * would be reinterpreted as garbage floats — declared input types make
  * the analyzer insert the cast or fail loudly instead.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** s12's certified SQ8 cosine upper bound against a fixed probe. The
  * probe is an expression parameter (Seq equality keeps plan
  * canonicalization structural) compiled to a float[] reference object
  * at codegen — shipped once per executor, like [[BpeEncode]]'s codec.
  * Its norm and abs-sum fold driver-side into plan literals. */
case class Sq8CosUb(child: Expression, q: Seq[Float]) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_cos_ub"
  @transient private lazy val qArr = q.toArray
  @transient private lazy val qNorm = math.sqrt(qArr.map(x => x.toDouble * x).sum)
  @transient private lazy val qAbsSum = qArr.map(x => math.abs(x.toDouble)).sum
  override protected def nullSafeEval(a: Any): Any =
    Kernels.sq8CosUb(a.asInstanceOf[ArrayData], qArr, qNorm, qAbsSum)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8Probe", qArr, "float[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.Kernels.sq8CosUb($a, $ref, ${qNorm}D, ${qAbsSum}D)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Random-hyperplane LSH bucket signature for ANN blocking. */
case class HyperplaneSig(child: Expression, bits: Int, seed: Long) extends UnaryExpression with ImplicitCastInputTypes {
  require(bits >= 1 && bits <= 64, s"hyperplane_sig: bits must be in [1,64], got $bits")
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sig"
  override protected def nullSafeEval(a: Any): Any =
    Kernels.hyperplaneSig(a.asInstanceOf[ArrayData], bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.hyperplaneSig($a, $bits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class SimHash64(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(a: Any): Any =
    Kernels.simhash64(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.simhash64($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Hamming64(left: Expression, right: Expression) extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming64"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.hamming64($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** IVF cell assignment: index of the cosine-nearest centroid in a
  * (small, literal/broadcast) array<array<float>> centroid list. */
case class NearestCentroid(left: Expression, right: Expression) extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] =
    Seq(ArrayType(FloatType), ArrayType(ArrayType(FloatType)))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.nearestCentroid(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.nearestCentroid($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class Shingles64(child: Expression, n: Int) extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"shingles64: n must be >= 1, got $n")
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingles64"
  override protected def nullSafeEval(a: Any): Any =
    Kernels.shingles64(a.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.shingles64($a, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MinHashSig(child: Expression, n: Int, k: Int, seed: Long) extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"minhash_sig: n must be >= 1, got $n")
  require(k >= 1 && k <= 4096, s"minhash_sig: k must be in [1,4096], got $k")
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(a: Any): Any =
    Kernels.minhashSig(a.asInstanceOf[UTF8String], n, k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.minhashSig($a, $n, $k, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-document distinct word n-gram hash set — the decontamination /
  * containment-join key material (see Kernels.wordGrams64). */
case class WordGrams64(child: Expression, n: Int) extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"word_grams64: n must be >= 1, got $n")
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_grams64"
  override protected def nullSafeEval(a: Any): Any =
    Kernels.wordGrams64(a.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.wordGrams64($a, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass per-document gram repetition stats [total, distinct, top]
  * (see Kernels.wordGramStats). */
case class WordGramStats(child: Expression, n: Int) extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"word_gram_stats: n must be >= 1, got $n")
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_gram_stats"
  override protected def nullSafeEval(a: Any): Any =
    Kernels.wordGramStats(a.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.wordGramStats($a, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Fingerprint64(child: Expression, n: Int, w: Int) extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"fingerprint64: n must be >= 1, got $n")
  require(w >= 1, s"fingerprint64: w must be >= 1, got $w")
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fingerprint64"
  override protected def nullSafeEval(a: Any): Any =
    Kernels.fingerprint64(a.asInstanceOf[UTF8String], n, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.fingerprint64($a, $n, $w)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-document codepoint Shannon entropy in nats (see
  * Kernels.charEntropy) — single-scan codegen quality signal. */
case class CharEntropy(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_entropy"
  override protected def nullSafeEval(a: Any): Any =
    Kernels.charEntropy(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.charEntropy($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Jaccard64(left: Expression, right: Expression) extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaccard64"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.jaccard64(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.jaccard64($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** The reference's `/` (expression.rs:142-152), as a TYPE-DISPATCHING
  * expression substituted for Catalyst's `Divide` at PARSE time by
  * GraftSQL: INTEGER / INTEGER is truncating i64 division with
  * divide-by-zero an error; any FLOAT operand makes it double
  * division. Carrying the dispatch in `dataType` (long iff both
  * operands resolve integral) lets the ANALYZER propagate the correct
  * type through CTEs, subqueries and windows — no post-analysis
  * attribute patching. Integral operands implicitly widen to long,
  * fractional/decimal to double (ANSI implicit casts never narrow a
  * double into the LongType branch). */
case class RefDiv(left: Expression, right: Expression) extends BinaryExpression with ImplicitCastInputTypes {
  import RefArith._
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = numericInputs
  private def longMode = integral(left.dataType) && integral(right.dataType)
  override def dataType: DataType = if (longMode) LongType else DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ref_div"
  override def sql: String = s"(${left.sql} / ${right.sql})"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (longMode) Kernels.refDivLong(toL(a), toL(b))
    else toD(a) / toD(b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (longMode)
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.refDivLong((long)($a), (long)($b))")
    else
      defineCodeGen(ctx, ev, (a, b) =>
        s"(${dblCode(a, left.dataType)} / ${dblCode(b, right.dataType)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** The reference's `^` (expression.rs:160-174), substituted for the
  * token-rewrite's `power()` at parse time: INTEGER ^ INTEGER with a
  * non-negative exponent is EXACT i64 (checked_pow — `pow` would
  * round through double past 2^53); a float operand or negative
  * exponent computes in double. The reference types the
  * negative-exponent case PER ROW (rhs < 0 → Float), which a static
  * type cannot mirror — so the i64 branch requires a FOLDABLE
  * exponent, covering the reference-grammar cases that matter
  * (`x ^ 2`); a non-constant integral exponent keeps double. */
object RefArith {
  import org.apache.spark.sql.GraftTypes.AbstractType
  /** Accept any numeric child UNCAST — the long-vs-double dispatch
    * reads the raw child type (an implicit-cast collection would let
    * the coercion rules pick a branch, e.g. decimal 3.0 → long). */
  val numericInputs: Seq[AbstractType] =
    Seq(org.apache.spark.sql.GraftTypes.numeric, org.apache.spark.sql.GraftTypes.numeric)
  def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  def toD(x: Any): Double = x match {
    case d: Decimal => d.toDouble
    case n: java.lang.Number => n.doubleValue
  }
  def toL(x: Any): Long = x.asInstanceOf[java.lang.Number].longValue
  /** Java source converting a child's codegen value to double. */
  def dblCode(code: String, t: DataType): String = t match {
    case _: DecimalType => s"$code.toDouble()"
    case _              => s"(double)($code)"
  }
}
case class RefPow(left: Expression, right: Expression) extends BinaryExpression with ImplicitCastInputTypes {
  import RefArith._
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = numericInputs
  private lazy val longMode =
    integral(left.dataType) && integral(right.dataType) && right.foldable && {
      val v = right.eval(null)
      v != null && v.asInstanceOf[java.lang.Number].longValue >= 0
    }
  override def dataType: DataType = if (longMode) LongType else DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ref_pow"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (longMode) Kernels.intPow(toL(a), toL(b))
    else Math.pow(toD(a), toD(b))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (longMode)
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.intPow((long)($a), (long)($b))")
    else
      defineCodeGen(ctx, ev, (a, b) =>
        s"java.lang.Math.pow(${dblCode(a, left.dataType)}, ${dblCode(b, right.dataType)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Pack an array<int> of PQ codes into one BINARY value (one byte per
  * code — s11's stored physical layout; see [[Kernels.packCodes]]). */
case class PackCodes(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] =
    Seq(ArrayType(IntegerType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pack_codes"
  override protected def nullSafeEval(a: Any): Any =
    Kernels.packCodes(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.packCodes($a)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ADC lookup sum over a packed PQ code column: the flattened
  * (m·k)-double table is an expression parameter shipped as a codegen
  * reference object (Seq equality keeps canonicalization structural). */
case class PqAdc(child: Expression, lut: Seq[Double], k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1 && k <= 256, s"pq_adc: k must be in [1,256], got $k")
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] =
    Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"
  @transient private lazy val lutArr: Array[Double] = lut.toArray
  override protected def nullSafeEval(a: Any): Any =
    Kernels.pqAdc(a.asInstanceOf[Array[Byte]], lutArr, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", lutArr, "double[]")
    defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.pqAdc($a, $ref, $k)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** ONE chunker pass per document: array of (packed, hash) structs —
  * packed = the kernel's (start << 20) | len bound encoding, hash = the
  * chunk's xxhash64 content hash. The d16 query consumes this instead
  * of separate bounds/hashes columns so the boundary scan runs once. */
case class CdcChunks(child: Expression, maskBits: Int, minLen: Int, maxLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  // guard: the kernel packs (start << 20) | len, so
  // an unvalidated maxLen ≥ 2^20 would corrupt the extraction silently
  require(maxLen < (1 << 20) && minLen >= 1 && maskBits >= 1,
    s"cdc_chunks: bad params ($maskBits, $minLen, $maxLen)")
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] =
    Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("packed", LongType, nullable = false),
    StructField("ch", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"
  override protected def nullSafeEval(t: Any): Any =
    Kernels.cdcChunks(t.asInstanceOf[UTF8String], maskBits, minLen, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.Kernels.cdcChunks($t, $maskBits, $minLen, $maxLen)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Bloom-filter membership probe over a LONG (hash) column: the filter
  * — built once driver-side by Spark's own distributed sketch
  * aggregation (`df.stat.bloomFilter`, org.apache.spark.util.sketch) —
  * ships as a codegen reference object, so the per-row cost is k hash
  * probes into a task-local bit array: no join, no shuffle, no
  * broadcast relation. The contract the consumers rely on: NO FALSE
  * NEGATIVES — a miss CERTIFIES non-membership (d15's prune
  * soundness, the s12 certified-bound discipline); hits carry the
  * configured false-positive rate and must go through exact
  * verification. Reference-object equality is identity — each built
  * filter is one plan's literal, like PqAdc's lookup tables. */
case class BloomMightContain(child: Expression,
    filter: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] =
    Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"
  override protected def nullSafeEval(a: Any): Any =
    filter.mightContainLong(a.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, a => s"$ref.mightContainLong($a)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One BPE merge pass over a token-array column — the per-round kernel
  * of distributed BPE tokenizer training (t19): the (left, right) pair
  * is a per-round literal, so codegen inlines a single
  * [[Kernels.bpeMerge]] call per row. */
case class BpeMerge(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] =
    Seq(ArrayType(StringType), StringType, StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_merge"
  override protected def nullSafeEval(s: Any, a: Any, b: Any): Any =
    Kernels.bpeMerge(s.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, a, b) => s"graft.functions.Kernels.bpeMerge($s, $a, $b)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
