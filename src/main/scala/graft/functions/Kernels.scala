package graft.functions

import org.apache.spark.sql.catalyst.expressions.{UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Per-row compute kernels behind the graft custom Catalyst Expressions.
  *
  * Single-pass, allocation-light loops over Tungsten-native data
  * (`UTF8String` bytes, `ArrayData` primitives). Called directly from
  * generated code (Scala object static forwarders), so the expressions
  * stay inside whole-stage codegen — no boxing, no interpreted fallback
  * in the hot path. This is the Spark-native replacement for what the
  * reference would run as a native-code scalar function.
  */
object Kernels {

  /** splitmix64 finalizer — public-domain avalanche mix. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def hashRange(s: UTF8String, start: Int, len: Int, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset + start, len, seed)

  /** Cosine similarity of two float vectors (embedding columns). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** CERTIFIED upper bound on cosine(v, q) through v's own SQ8
    * quantization (s12's lossless range-search prefilter). Pass 1
    * finds the row's affine params (mn, span) and ‖v‖; pass 2
    * accumulates the decoded-code · q dot. Per component the decode
    * is off by at most span/508 (half a quantization step, since
    * |round(t) − t| ≤ 0.5), so
    * `dot(v,q) ≤ coarse + (span/508)·Σ|qᵢ|`; dividing by ‖q‖‖v‖
    * bounds the cosine from above. qNorm/qAbsSum are precomputed
    * driver-side from the same probe array. */
  def sq8CosUb(v: ArrayData, q: Array[Float], qNorm: Double, qAbsSum: Double): Double = {
    val n = math.min(v.numElements(), q.length)
    var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      if (x < mn) mn = x
      if (x > mx) mx = x
      ss += x * x
      i += 1
    }
    val span = math.max(mx - mn, 1e-12)
    var coarse = 0.0
    i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      val dec = mn + Math.round((x - mn) * 254.0 / span) * span / 254.0
      coarse += dec * q(i)
      i += 1
    }
    (coarse + span / 508.0 * qAbsSum) /
      (qNorm * math.max(math.sqrt(ss), 1e-12))
  }

  /** Dot product of two float vectors. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  /** Random-hyperplane LSH signature of a float vector: `bits`
    * sign-bits packed into a Long. Hyperplane j component i is a
    * deterministic pseudo-random gaussian-ish value derived from
    * (seed, j, i) — same family on every row, so equal buckets imply
    * nearby vectors. bits <= 64. */
  def hyperplaneSig(a: ArrayData, bits: Int, seed: Long): Long = {
    val n = a.numElements()
    var sig = 0L
    var j = 0
    while (j < bits) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        // map mix64 output to [-1, 1): cheap symmetric weight
        val w = mix64(seed ^ (j.toLong << 32) ^ i.toLong).toDouble / 9.223372036854776e18
        acc += w * a.getFloat(i).toDouble
        i += 1
      }
      if (acc >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** 64-bit SimHash over whitespace tokens of `text`. Single pass over
    * the UTF-8 bytes; each token hashed with XXH64; bit-wise vote
    * counters folded to the final signature. */
  def simhash64(text: UTF8String): Long = {
    val counts = new Array[Int](64)
    val nb = text.numBytes
    var start = 0
    var i = 0
    while (i <= nb) {
      val isDelim = i == nb || {
        val c = text.getByte(i)
        c == ' ' || c == '\n' || c == '\t' || c == '\r'
      }
      if (isDelim) {
        if (i > start) {
          val h = hashRange(text, start, i - start, 0x5171f057L)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** The reference's INTEGER / INTEGER (expression.rs:142-147):
    * truncating i64 division, divide-by-zero an error regardless of
    * ANSI conf ("Can't divide by zero"). */
  def refDivLong(a: Long, b: Long): Long = {
    if (b == 0L) throw new ArithmeticException("Can't divide by zero")
    // the one i64 division overflow: Java wraps silently, Rust panics
    if (a == Long.MinValue && b == -1L)
      throw new ArithmeticException("Integer overflow")
    a / b
  }

  /** Exact i64 exponentiation by squaring with OVERFLOW CHECKS — the
    * reference's INTEGER ^ INTEGER (expression.rs:161-165: checked_pow
    * → "Integer overflow" error). Spark's pow would detour through
    * double and silently round results past 2^53. Exponent must be
    * >= 0 (the rewrite in GraftSQL only dispatches here for foldable
    * non-negative exponents, mirroring the reference's rhs >= 0 arm). */
  def intPow(base: Long, exp: Long): Long = {
    require(exp >= 0, s"intPow: negative exponent $exp")
    try {
      var result = 1L
      var b = base
      var e = exp
      while (e > 0) {
        if ((e & 1L) == 1L) result = Math.multiplyExact(result, b)
        e >>= 1
        if (e > 0) b = Math.multiplyExact(b, b)
      }
      result
    } catch { // the reference's checked_pow error text, like refDivLong
      case _: ArithmeticException => throw new ArithmeticException("Integer overflow")
    }
  }

  /** Index of the centroid (array<array<float>>) most cosine-similar
    * to `v` — the IVF cell assignment / coarse-quantizer kernel. Ties
    * break to the lowest index; an empty centroid list yields -1.
    * One fused pass per centroid, no per-row allocation. */
  def nearestCentroid(v: ArrayData, cents: ArrayData): Int = {
    val k = cents.numElements()
    var best = -1
    var bestCos = Double.NegativeInfinity
    var i = 0
    while (i < k) {
      val cos = cosine(v, cents.getArray(i))
      if (cos > bestCos) { bestCos = cos; best = i }
      i += 1
    }
    best
  }

  /** Sorted distinct XXH64 hashes of all byte `n`-grams (shingles) of
    * `text`. The per-document set representation used for exact
    * n-gram Jaccard similarity. */
  def shingles64(text: UTF8String, n: Int): UnsafeArrayData = {
    val nb = text.numBytes
    val cnt = math.max(0, nb - n + 1)
    val hs = new Array[Long](cnt)
    var i = 0
    while (i < cnt) { hs(i) = hashRange(text, i, n, 0x9e3779b9L); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(sortedDistinct(hs))
  }

  /** MinHash signature of `text`'s byte `n`-gram shingle set: `k`
    * independent permutations (seed-mixed), each the min over all
    * shingles. O(len * k), no shingle set materialized. */
  def minhashSig(text: UTF8String, n: Int, k: Int, seed: Long): UnsafeArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val nb = text.numBytes
    val cnt = math.max(0, nb - n + 1)
    var i = 0
    while (i < cnt) {
      val h = hashRange(text, i, n, 0x9e3779b9L)
      var j = 0
      while (j < k) {
        val v = mix64(h ^ (seed + 0x9e3779b97f4a7c15L * (j + 1)))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Sorted distinct XXH64 hashes of all word `n`-grams of `text`.
    * Tokens are single-space-split segments (exactly `split(text, ' ')`
    * — empty segments from leading/trailing/double spaces included),
    * and each gram is hashed over the ORIGINAL byte span from its first
    * token's start to its last token's end. Splitting on a single char
    * and rejoining with it is the identity, so that span is
    * byte-identical to joining the n tokens with ' ' — equal gram
    * strings hash equal, which is all a decontamination overlap join
    * needs. One pass, no per-gram string allocation. */
  def wordGrams64(text: UTF8String, n: Int): UnsafeArrayData = {
    val nb = text.numBytes
    var spaces = 0
    var i = 0
    while (i < nb) { if (text.getByte(i) == ' ') spaces += 1; i += 1 }
    val tokens = spaces + 1
    val cnt = tokens - n + 1
    if (cnt <= 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val starts = new Array[Int](tokens)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < nb) { if (text.getByte(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    val hs = new Array[Long](cnt)
    var g = 0
    while (g < cnt) {
      // gram g spans [starts(g), end): end is just before the space
      // separating token g+n-1 from token g+n, or end-of-text
      val end = if (g + n < tokens) starts(g + n) - 1 else nb
      hs(g) = hashRange(text, starts(g), end - starts(g), 0x8f14e45fL)
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sortedDistinct(hs))
  }

  /** Per-document word n-gram repetition statistics in one pass:
    * `[total, distinct, topFrequency]` over the same gram definition as
    * [[wordGrams64]] (single-space token segments, byte-span hashes).
    * The open-addressing count table is transient per row — no explode,
    * no shuffle; the repetition quality filter becomes scan-bound. */
  def wordGramStats(text: UTF8String, n: Int): UnsafeArrayData = {
    val nb = text.numBytes
    var spaces = 0
    var i = 0
    while (i < nb) { if (text.getByte(i) == ' ') spaces += 1; i += 1 }
    val tokens = spaces + 1
    val cnt = tokens - n + 1
    if (cnt <= 0)
      return UnsafeArrayData.fromPrimitiveArray(Array(0L, 0L, 0L))
    // hard bound, checked explicitly: past it the capacity doubling
    // below would overflow Int and the probe loop over an undersized
    // table would spin forever — fail loudly instead (a single
    // half-billion-gram document has no business in a per-row kernel)
    require(cnt <= (1 << 29), s"wordGramStats: document too large ($cnt grams)")
    val starts = new Array[Int](tokens)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < nb) { if (text.getByte(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    // open-addressing hash counts (power-of-two capacity >= 2*cnt)
    var cap = 4
    while (cap < cnt * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val counts = new Array[Int](cap)
    var distinct = 0
    var top = 0
    var g = 0
    while (g < cnt) {
      val end = if (g + n < tokens) starts(g + n) - 1 else nb
      var h = hashRange(text, starts(g), end - starts(g), 0x8f14e45fL)
      if (h == 0L) h = 0x9e3779b97f4a7c15L // 0 is the empty-slot marker
      var slot = (mix64(h) & (cap - 1)).toInt
      while (keys(slot) != 0L && keys(slot) != h) slot = (slot + 1) & (cap - 1)
      if (keys(slot) == 0L) { keys(slot) = h; distinct += 1 }
      counts(slot) += 1
      if (counts(slot) > top) top = counts(slot)
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(cnt.toLong, distinct.toLong, top.toLong))
  }

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken,
    * SIGMOD 2003): hash all byte `n`-grams, slide a window of `w`
    * hashes, keep each window's rightmost minimum → sorted distinct
    * fingerprint set. Guarantees any shared substring of length
    * >= w + n - 1 produces a shared fingerprint. */
  def fingerprint64(text: UTF8String, n: Int, w: Int): UnsafeArrayData = {
    val nb = text.numBytes
    val cnt = math.max(0, nb - n + 1)
    if (cnt == 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val hs = new Array[Long](cnt)
    var i = 0
    while (i < cnt) { hs(i) = hashRange(text, i, n, 0x51a1e5L); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(winnow(hs, w))
  }

  /** Winnowing selection over a hash sequence: each window of `w`
    * hashes contributes its RIGHTMOST minimum; consecutive windows
    * picking the same position collapse → sorted distinct picks.
    * Sliding-window minimum via a monotonic index deque — O(cnt)
    * amortized, not O(cnt*w): each index enters and leaves the deque
    * once (popping on `>=` preserves the rightmost-minimum tie rule of
    * the definition's scan, which the spec cross-checks). */
  private[graft] def winnow(hs: Array[Long], w: Int): Array[Long] = {
    val cnt = hs.length
    if (cnt == 0) return new Array[Long](0)
    val picks = new Array[Long](cnt)
    var np = 0
    var last = -1 // index of previously picked minimum
    val deque = new Array[Int](cnt)
    var head = 0; var tail = 0 // live indices are deque[head until tail]
    var i = 0
    while (i < cnt) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      while (deque(head) < i - w + 1) head += 1 // slide window [i-w+1, i]
      // one window per i >= w-1; a short text (cnt < w) has exactly one
      // truncated window, evaluated at the last position
      if (i >= w - 1 || (cnt < w && i == cnt - 1)) {
        val minIdx = deque(head)
        if (minIdx != last) { picks(np) = hs(minIdx); np += 1; last = minIdx }
      }
      i += 1
    }
    sortedDistinct(java.util.Arrays.copyOf(picks, np))
  }

  /** Jaccard similarity of two sorted-distinct long arrays (as
    * produced by shingles64/fingerprint64). Linear merge. */
  def jaccard64(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  private def sortedDistinct(xs: Array[Long]): Array[Long] = {
    if (xs.length == 0) return xs
    java.util.Arrays.sort(xs)
    var np = 1
    var i = 1
    while (i < xs.length) {
      if (xs(i) != xs(np - 1)) { xs(np) = xs(i); np += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(xs, np)
  }

  /** Per-document Shannon entropy over Unicode CODE POINTS, in nats:
    * H = ln(n) − (Σ c·ln c)/n over per-codepoint counts c — the
    * CCNet-style quality signal (near 0 = one repeated character;
    * unusually high = random bytes). Empty text → 0.0. The ASCII fast
    * path counts into a flat array; the general path decodes code
    * points (a surrogate pair is ONE symbol). The float fold is
    * engine-comparable after upstream rounding: ln agrees across
    * libms to ~1 ulp and the term count is small. */
  def charEntropy(text: UTF8String): Double = {
    val nb = text.numBytes
    var ascii = true
    var i = 0
    while (ascii && i < nb) { if ((text.getByte(i) & 0x80) != 0) ascii = false; i += 1 }
    var n = 0L
    var acc = 0.0
    if (ascii) {
      val counts = new Array[Long](128)
      i = 0
      while (i < nb) { counts(text.getByte(i) & 0x7f) += 1; i += 1 }
      n = nb.toLong
      var c = 0
      while (c < 128) {
        if (counts(c) > 1) acc += counts(c) * Math.log(counts(c).toDouble)
        c += 1
      }
    } else {
      val s = text.toString
      val counts = new java.util.HashMap[Integer, java.lang.Long]()
      i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        val prev = counts.get(cp)
        counts.put(cp, if (prev == null) 1L else prev + 1L)
        n += 1
        i += Character.charCount(cp)
      }
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next().longValue
        if (c > 1) acc += c * Math.log(c.toDouble)
      }
    }
    if (n == 0L) 0.0 else Math.log(n.toDouble) - acc / n
  }

  /** Pack an int code array into ONE binary value, one byte per code —
    * the byte-aligned faiss PQ layout for k ≤ 256. Out-of-byte-range
    * codes throw: silently truncating would corrupt the index. */
  def packCodes(codes: ArrayData): Array[Byte] = {
    val n = codes.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = codes.getInt(i)
      if (v < 0 || v > 255)
        throw new IllegalArgumentException(s"pack_codes: code $v outside byte range")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  /** FastCDC gear table (Xia et al. 2016): 256 seeded splitmix64
    * values — public-domain construction, fixed seed ⇒ deterministic
    * boundaries across sessions and engines. */
  private val Gear: Array[Long] =
    Array.tabulate(256)(i => mix64(0x9E3779B97F4A7C15L * (i + 1)))

  /** Content-defined chunk boundaries over a text's UTF-8 bytes (the
    * gear rolling hash of the FastCDC family): h = (h << 1) +
    * GEAR[byte], boundary where (h & mask) == 0 once the chunk has
    * minLen bytes, forced cut at maxLen. Returns one packed long per
    * chunk: (start << 20) | len (len ≤ maxLen < 2^20).
    *
    * The gear state rolls continuously (never reset at boundaries):
    * h << 1 ages a byte's influence out of bit k after k shifts, so
    * the (h & mask) == 0 predicate depends only on the last maskBits
    * bytes of CONTENT, never on chunk-relative position — after any
    * upstream edit the chunking re-synchronizes at the next content
    * boundary past the edit. Measured on a 150 KB text: 99.9% of
    * chunk hashes survive BOTH a prefix insertion and a mid-document
    * insertion (the lost chunks are exactly the ones containing the
    * edit); d12-style fixed windows lose every window past the edit.
    * minLen/maxLen normalization (FastCDC's) can suppress or force a
    * cut near the edit; the divergence heals at the next surviving
    * content boundary (spec-measured). */
  private def cdcBoundsArr(text: UTF8String,
      maskBits: Int, minLen: Int, maxLen: Int): Array[Long] = {
    val n = text.numBytes()
    val mask = (1L << maskBits) - 1
    val out = new java.util.ArrayList[java.lang.Long](n / (1 << maskBits) + 2)
    var start = 0
    var h = 0L
    var len = 0
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear(text.getByte(i) & 0xff)
      len += 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen || i == n - 1) {
        out.add((start.toLong << 20) | len)
        start = i + 1; len = 0
      }
      i += 1
    }
    val arr = new Array[Long](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    arr
  }

  def cdcBounds(text: UTF8String, maskBits: Int, minLen: Int, maxLen: Int): UnsafeArrayData =
    UnsafeArrayData.fromPrimitiveArray(cdcBoundsArr(text, maskBits, minLen, maxLen))

  /** Per-chunk 64-bit content hashes under the SAME boundaries as
    * [[cdcBounds]] (xxhash64 of each chunk's bytes) — the dedup key. */
  def cdcHashes(text: UTF8String, maskBits: Int, minLen: Int, maxLen: Int): UnsafeArrayData = {
    val bounds = cdcBoundsArr(text, maskBits, minLen, maxLen)
    val out = new Array[Long](bounds.length)
    var j = 0
    while (j < bounds.length) {
      val start = (bounds(j) >>> 20).toInt
      val len = (bounds(j) & 0xFFFFFL).toInt
      out(j) = hashRange(text, start, len, 42L)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ONE chunker pass emitting both views: array of (packed bound,
    * content hash) structs — what the d16 query consumes, so the
    * boundary scan runs once per document instead of once per view. */
  def cdcChunks(text: UTF8String, maskBits: Int, minLen: Int, maxLen: Int): ArrayData = {
    val bounds = cdcBoundsArr(text, maskBits, minLen, maxLen)
    val rows = new Array[Any](bounds.length)
    var j = 0
    while (j < bounds.length) {
      val start = (bounds(j) >>> 20).toInt
      val len = (bounds(j) & 0xFFFFFL).toInt
      rows(j) = org.apache.spark.sql.catalyst.InternalRow(
        bounds(j), hashRange(text, start, len, 42L))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** ADC lookup sum over a PACKED code column: Σ_j lut[j·k + code_j].
    * The flattened (m·k)-double table ships once per executor as a
    * codegen reference object — the coarse PQ scan does m array reads
    * and adds per row, zero float math against any vector. */
  def pqAdc(codes: Array[Byte], lut: Array[Double], k: Int): Double = {
    var acc = 0.0
    var j = 0
    while (j < codes.length) {
      acc += lut(j * k + (codes(j) & 0xFF))
      j += 1
    }
    acc
  }

  /** One BPE merge step (Sennrich et al. 2016): replace each
    * LEFT-TO-RIGHT, NON-OVERLAPPING adjacent occurrence of (a, b) in
    * `seg` with their concatenation — "aaa" under merge (a,a) becomes
    * ["aa","a"], the reference tokenizer semantics. Output strings are
    * copies: the input's UTF8Strings may point into reused buffers. */
  def bpeMerge(seg: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = seg.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    var k = 0
    while (i < n) {
      if (i + 1 < n && seg.getUTF8String(i).equals(a)
          && seg.getUTF8String(i + 1).equals(b)) {
        out(k) = UTF8String.concat(a, b); k += 1; i += 2
      } else {
        out(k) = seg.getUTF8String(i).clone(); k += 1; i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, k))
  }
}
