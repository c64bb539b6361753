package graft

import graft.functions.Kernels
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based kernel invariants over seeded random inputs
  * (raw ScalaCheck generators; deterministic seeds). */
class KernelPropertiesSpec extends AnyFunSuite {

  private def s(t: String) = UTF8String.fromString(t)
  private def fa(xs: Seq[Float]) = UnsafeArrayData.fromPrimitiveArray(xs.toArray)

  private val text: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '))).map(_.mkString)
  private val vec: Gen[Seq[Float]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-10f, 10f)).map(_.take(64))

  /** 100 seeded samples of `g`. */
  private def samples[A](g: Gen[A]): Seq[A] =
    (0 until 100).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** Fragments that compose adversarial SQL-ish input: quotes,
    * comment openers/closers, semicolons, escapes — the shapes the
    * shell's statement splitter must never mis-lex. */
  private val sqlFrag: Gen[String] = Gen.oneOf(
    Gen.const("'a;b'"), Gen.const("\"x--y\""), Gen.const("-- c;\n"),
    Gen.const("/* b ; */"), Gen.const(";"), Gen.const("SELECT 1"),
    Gen.const("'it''s'"), Gen.const("'\\';'"), Gen.const("--\n"),
    Gen.const("/*"), Gen.const("*/"), Gen.const("\n"),
    Gen.alphaNumStr.map(_.take(8)))
  private val sqlish: Gen[String] =
    Gen.listOf(sqlFrag).map(_.mkString(" "))

  test("comment blanking preserves optimizer hints verbatim") {
    val withHint = "SELECT /*+ BROADCAST(t) */ * FROM t -- note\nJOIN u ON a = b"
    val blanked = GraftSQL.blankComments(withHint)
    assert(blanked.contains("/*+ BROADCAST(t) */"),
      "a hint is semantics, not a comment — it must reach the executed text")
    assert(!blanked.contains("note"), "real comments still blank")
    assert(blanked.length == withHint.length)
    // a plain block comment still blanks even when a hint precedes it
    val both = "/*+ MERGE(x) */ SELECT 1 /* gone */"
    val b2 = GraftSQL.blankComments(both)
    assert(b2.contains("/*+ MERGE(x) */") && !b2.contains("gone"))
    // splitter safety: a quote or ';' INSIDE a hint blanks to a space
    // (length-preserving) — otherwise the statement splitter would open
    // a phantom string literal or split the statement mid-hint
    val hostile = "SELECT /*+ it's; a trap */ 1; SELECT 2"
    val b3 = GraftSQL.blankComments(hostile)
    assert(b3.length == hostile.length)
    assert(!b3.contains("'") || b3.indexOf("'") > b3.indexOf("*/"),
      s"quote inside a hint must blank: <$b3>")
    assert(b3.indexOf(';') == hostile.indexOf("1;") + 1,
      s"the only top-level ';' must be the statement terminator: <$b3>")
    // the hint's WORDS still reach the executed text
    assert(b3.contains("a trap") && b3.contains("/*+"))
  }

  test("comment blanking is length-preserving, idempotent, and leaves strings intact") {
    for (t <- samples(sqlish)) {
      val b = GraftSQL.blankComments(t)
      assert(b.length == t.length, s"length changed for <$t>")
      assert(GraftSQL.blankComments(b) == b, s"not idempotent for <$t>")
      // blanking only ever replaces characters with spaces
      assert(b.zip(t).forall { case (nc, oc) => nc == oc || nc == ' ' },
        s"non-space rewrite for <$t>")
      // string masking composes: the masked view is the same length
      // too, so shell split indexes always line up across all views
      assert(GraftSQL.maskStrings(b).length == t.length)
    }
  }

  test("jaccard is symmetric, bounded, and 1 on self") {
    for ((a, b) <- samples(text).zip(samples(text).reverse)) {
      val (sa, sb) = (Kernels.shingles64(s(a), 3), Kernels.shingles64(s(b), 3))
      val j = Kernels.jaccard64(sa, sb)
      assert(j >= 0.0 && j <= 1.0)
      assert(j == Kernels.jaccard64(sb, sa))
      assert(Kernels.jaccard64(sa, sa) == 1.0 || sa.numElements() == 0)
    }
  }

  test("cosine is symmetric and bounded") {
    for ((a, b) <- samples(vec).zip(samples(vec).reverse)) {
      val n = math.min(a.length, b.length)
      val (va, vb) = (fa(a.take(n)), fa(b.take(n)))
      val c = Kernels.cosine(va, vb)
      assert(c >= -1.0000001 && c <= 1.0000001)
      assert(math.abs(c - Kernels.cosine(vb, va)) < 1e-12)
    }
  }

  test("hamming is a metric on signatures: identity, symmetry, triangle") {
    val ts = samples(text)
    for (((a, b), c) <- ts.zip(ts.reverse).zip(ts.drop(1) :+ ts.head)) {
      val (ha, hb, hc) = (Kernels.simhash64(s(a)), Kernels.simhash64(s(b)), Kernels.simhash64(s(c)))
      assert(Kernels.hamming64(ha, ha) == 0)
      assert(Kernels.hamming64(ha, hb) == Kernels.hamming64(hb, ha))
      assert(Kernels.hamming64(ha, hc) <=
        Kernels.hamming64(ha, hb) + Kernels.hamming64(hb, hc))
    }
  }

  test("minhash recomputation is bit-identical and correctly sized") {
    for (t <- samples(text)) {
      val sig = Kernels.minhashSig(s(t), 4, 16, 42L).toLongArray
      assert(sig.length == 16)
      assert(sig.sameElements(Kernels.minhashSig(s(t), 4, 16, 42L).toLongArray))
    }
  }

  test("fingerprint sets are sorted distinct and shrink with window size") {
    val longTexts = samples(text).filter(_.length > 30)
    assert(longTexts.nonEmpty) // guard against a vacuous pass
    for (t <- longTexts) {
      val small = Kernels.fingerprint64(s(t), 5, 4).toLongArray
      val large = Kernels.fingerprint64(s(t), 5, 16).toLongArray
      assert(small.toSeq == small.toSeq.sorted && small.toSeq.distinct == small.toSeq)
      assert(large.length <= small.length) // bigger window → fewer picks
    }
  }

  test("winnow (deque) equals the naive per-window definition") {
    // reference: scan every window, keep its rightmost minimum,
    // collapse consecutive same-position picks, sort distinct
    def naive(hs: Array[Long], w: Int): Seq[Long] = {
      if (hs.isEmpty) return Nil
      val picks = scala.collection.mutable.ArrayBuffer[Long]()
      var last = -1
      for (i <- 0 until math.max(1, hs.length - w + 1)) {
        var minIdx = i
        for (j <- i + 1 until math.min(i + w, hs.length))
          if (hs(j) <= hs(minIdx)) minIdx = j
        if (minIdx != last) { picks += hs(minIdx); last = minIdx }
      }
      picks.distinct.sorted.toSeq
    }
    val rng = new scala.util.Random(7)
    for (len <- Seq(0, 1, 3, 7, 16, 64, 257); w <- Seq(1, 2, 4, 16)) {
      // small value range forces many ties — the rightmost-min rule
      // is exactly what ties exercise
      val hs = Array.fill(len)(rng.nextInt(8).toLong)
      assert(Kernels.winnow(hs, w).toSeq == naive(hs, w),
        s"len=$len w=$w hs=${hs.toSeq}")
    }
  }

  test("narrow hyperplane signature is a prefix of the wide one (d05/s02 sharing)") {
    // hyperplane bit j depends only on (seed, j), so the low `bits`
    // bits of a 64-bit signature ARE the bits-wide signature — the
    // identity that lets d05's buckets reuse s02's stored signatures
    for (v <- samples(vec).filter(_.nonEmpty)) {
      val va = fa(v)
      for (bits <- Seq(8, 12, 24)) {
        assert(Kernels.hyperplaneSig(va, bits, 7L) ==
          (Kernels.hyperplaneSig(va, 64, 7L) & ((1L << bits) - 1)))
      }
    }
  }

  test("wordGrams64 equals the split/sliding reference on random text") {
    def strGrams(t: String, n: Int): Seq[String] = {
      val w = t.split(" ", -1)
      if (w.length < n) Nil else w.sliding(n).map(_.mkString(" ")).toSeq
    }
    for (t <- samples(text); n <- Seq(1, 2, 4)) {
      val k = Kernels.wordGrams64(s(t), n).toLongArray()
      val expect = strGrams(t, n).distinct
      assert(k.length == expect.size, s"'$t' n=$n distinct size")
      assert(k.toSeq == k.toSeq.sorted, "output must be sorted")
      // equal gram strings hash equal: recompute and compare sets
      assert(Kernels.wordGrams64(s(t), n).toLongArray().toSeq == k.toSeq)
    }
  }

  test("wordGramStats agrees with wordGrams64 and the sliding recount") {
    for (t <- samples(text); n <- Seq(1, 2, 4)) {
      val Array(total, distinct, top) = Kernels.wordGramStats(s(t), n).toLongArray()
      val w = t.split(" ", -1)
      val grams = if (w.length < n) Nil else w.sliding(n).map(_.mkString(" ")).toSeq
      assert(total == grams.size, s"'$t' n=$n total")
      assert(distinct == Kernels.wordGrams64(s(t), n).numElements(), s"'$t' n=$n distinct")
      val expTop = if (grams.isEmpty) 0 else grams.groupBy(identity).map(_._2.size).max
      assert(top == expTop, s"'$t' n=$n top")
      assert(distinct <= total && (total == 0 || top >= 1))
    }
  }

  test("AhoCorasick equals per-phrase contains on 200 random (phrases, text) cases") {
    // small alphabet on purpose: maximizes overlapping matches, shared
    // prefixes/suffixes, and fail-link traversal — the paths a subtly
    // wrong automaton gets away with on ordinary text
    val word: Gen[String] =
      Gen.chooseNum(1, 6).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val phraseSet: Gen[Seq[String]] =
      Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word)).map(_.distinct)
    val body: Gen[String] =
      Gen.chooseNum(0, 60).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))
    for (i <- 0 until 200) {
      val phrases = phraseSet(Gen.Parameters.default, Seed(i.toLong)).get.toArray
      val t = body(Gen.Parameters.default, Seed((i + 1000).toLong)).get
      val ac = new graft.functions.AhoCorasick(phrases)
      val got = ac.search(s(t)).toIntArray().toSeq
      val want = phrases.indices.filter(j => t.contains(phrases(j)))
      assert(got == want,
        s"case $i: text='$t' phrases=${phrases.mkString(",")} got=$got want=$want")
    }
  }

  test("BloomMightContain: no false negatives ever; fp rate near spec; eval matches the sketch") {
    import org.apache.spark.util.sketch.BloomFilter
    val member: Gen[Long] = Gen.chooseNum(Long.MinValue, Long.MaxValue)
    for (i <- 0 until 20) {
      val items = samples(member).distinct.take(60)
        .map(v => v + i) // vary per case, deterministic
      val bf = BloomFilter.create(items.size.toLong.max(1), 0.01)
      items.foreach(bf.putLong)
      val expr = graft.functions.BloomMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(0L), bf)
      // the contract d15 relies on: EVERY inserted item hits
      items.foreach { v =>
        assert(bf.mightContainLong(v), s"sketch lost $v")
        assert(expr.copy(child =
          org.apache.spark.sql.catalyst.expressions.Literal(v))
          .eval(null) == true, s"expression lost $v")
      }
      // interpreted eval agrees with the wrapped sketch on non-members
      val probes = (0 until 2000).map(j => 1234567L * (j + 1) + i)
        .filterNot(items.contains)
      val fp = probes.count { v =>
        val got = expr.copy(child =
          org.apache.spark.sql.catalyst.expressions.Literal(v)).eval(null)
        assert(got == bf.mightContainLong(v), s"expr/sketch disagree on $v")
        got == true
      }
      // 1% fpp target with generous slack for tiny filters
      assert(fp.toDouble / probes.size < 0.05,
        s"case $i: fp rate ${fp.toDouble / probes.size}")
    }
  }
}
