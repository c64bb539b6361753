package graft

import graft.functions.Kernels
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pure kernel unit tests — no Spark session needed. */
class KernelsSpec extends AnyFunSuite {

  private def fa(xs: Float*) = UnsafeArrayData.fromPrimitiveArray(xs.toArray)
  private def s(t: String) = UTF8String.fromString(t)

  test("cosine: identical vectors → 1, orthogonal → 0, opposite → -1") {
    assert(math.abs(Kernels.cosine(fa(1f, 2f, 3f), fa(1f, 2f, 3f)) - 1.0) < 1e-12)
    assert(math.abs(Kernels.cosine(fa(1f, 0f), fa(0f, 1f))) < 1e-12)
    assert(math.abs(Kernels.cosine(fa(1f, 1f), fa(-1f, -1f)) + 1.0) < 1e-12)
    assert(Kernels.cosine(fa(0f, 0f), fa(1f, 1f)) == 0.0) // zero vector guard
  }

  test("dot product") {
    assert(Kernels.dot(fa(1f, 2f, 3f), fa(4f, 5f, 6f)) == 32.0)
  }

  test("simhash: equal text → equal sig; near text → small hamming; unrelated → large") {
    val a = "the quick brown fox jumps over the lazy dog and runs far away home"
    val b = "the quick brown fox jumps over the lazy cat and runs far away home"
    val ha = Kernels.simhash64(s(a))
    assert(ha == Kernels.simhash64(s(a)))
    val near = Kernels.hamming64(ha, Kernels.simhash64(s(b)))
    val far = Kernels.hamming64(ha, Kernels.simhash64(
      s("completely different words about spacecraft engines orbit thrust vector control")))
    assert(near < far, s"near=$near far=$far")
    assert(near <= 16)
  }

  test("shingles + jaccard: identity 1.0, disjoint 0.0, near-dup high") {
    val a = Kernels.shingles64(s("abcdefghijklmnop"), 4)
    val b = Kernels.shingles64(s("abcdefghijklmnoq"), 4)
    val c = Kernels.shingles64(s("zzzzyyyyxxxxwwww"), 4)
    assert(Kernels.jaccard64(a, a) == 1.0)
    assert(Kernels.jaccard64(a, c) == 0.0)
    val j = Kernels.jaccard64(a, b)
    assert(j > 0.5 && j < 1.0, s"j=$j")
  }

  test("shingle sets are sorted distinct") {
    val arr = Kernels.shingles64(s("abababababab"), 2).toLongArray
    assert(arr.toSeq == arr.toSeq.sorted)
    assert(arr.toSeq.distinct == arr.toSeq)
    assert(arr.length == 2) // only "ab" and "ba"
  }

  test("minhash estimates jaccard") {
    val t1 = "spark catalyst optimizer pushes filters down to the parquet scan layer"
    val t2 = "spark catalyst optimizer pushes filters down to the parquet scan level"
    val k = 128
    val s1 = Kernels.minhashSig(s(t1), 5, k, 42L).toLongArray
    val s2 = Kernels.minhashSig(s(t2), 5, k, 42L).toLongArray
    val est = s1.zip(s2).count { case (x, y) => x == y }.toDouble / k
    val exact = Kernels.jaccard64(Kernels.shingles64(s(t1), 5), Kernels.shingles64(s(t2), 5))
    assert(math.abs(est - exact) < 0.2, s"est=$est exact=$exact")
  }

  test("winnowing fingerprint: shared long substring → shared fingerprint") {
    val common = "x" * 5 + "the exact shared span of considerable length goes right here" + "y" * 5
    val a = Kernels.fingerprint64(s("prefix one " + common), 8, 16)
    val b = Kernels.fingerprint64(s("another start " + common + " tail"), 8, 16)
    assert(Kernels.jaccard64(a, b) > 0.0)
    // empty text → empty fingerprint
    assert(Kernels.fingerprint64(s(""), 8, 16).numElements() == 0)
  }

  test("hamming64") {
    assert(Kernels.hamming64(0L, 0L) == 0)
    assert(Kernels.hamming64(0L, -1L) == 64)
    assert(Kernels.hamming64(5L, 4L) == 1)
  }

  test("hyperplane sig: deterministic, equal vectors equal sig") {
    val v = fa(0.5f, -1f, 2f, 0.25f)
    assert(Kernels.hyperplaneSig(v, 16, 7L) == Kernels.hyperplaneSig(fa(0.5f, -1f, 2f, 0.25f), 16, 7L))
    // 8-bit sig stays in [0, 256)
    val sig = Kernels.hyperplaneSig(v, 8, 7L)
    assert(sig >= 0 && sig < 256)
  }

  test("wordGrams64 preserves the string-gram equality relation (incl. empty tokens)") {
    // reference implementation: split(' ') / sliding(n) / mkString(" ")
    def strGrams(t: String, n: Int): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < n) Set.empty else w.sliding(n).map(_.mkString(" ")).toSet
    }
    def kGrams(t: String, n: Int): Set[Long] =
      Kernels.wordGrams64(s(t), n).toLongArray().toSet
    val corpus = Seq(
      "a b c d e f g h i j",
      "Z a b c d e f g h",          // shares the 8-gram "a b c d e f g h"
      "a  b c d e f g h",           // double space → empty token
      " a b c d e f g h",           // leading space
      "a b c d e f g h ",           // trailing space
      "short text",                 // fewer tokens than n
      "",                           // empty
      "a b c d e f g h i j")        // duplicate of first
    for (n <- Seq(2, 8); i <- corpus.indices; j <- corpus.indices) {
      val (si, sj) = (strGrams(corpus(i), n), strGrams(corpus(j), n))
      val (ki, kj) = (kGrams(corpus(i), n), kGrams(corpus(j), n))
      assert(ki.size == si.size, s"n=$n set size for '${corpus(i)}'")
      assert((ki & kj).size == (si & sj).size,
        s"n=$n intersection of '${corpus(i)}' and '${corpus(j)}'")
    }
  }

  test("wordGramStats matches a brute per-doc recount") {
    def brute(t: String, n: Int): (Long, Long, Long) = {
      val w = t.split(" ", -1)
      if (w.length < n) (0L, 0L, 0L)
      else {
        val grams = w.sliding(n).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).map(_._2.size)
        (grams.size.toLong, counts.size.toLong, counts.max.toLong)
      }
    }
    val corpus = Seq(
      "a b a b a b a b",               // heavy repetition
      "a a a a a a",                   // one gram repeated
      "x y z w v u t s r q",           // all distinct
      "a  b a  b",                     // empty tokens repeat too
      "solo", "", "two words")
    for (t <- corpus; n <- Seq(1, 2, 3)) {
      val got = Kernels.wordGramStats(s(t), n).toLongArray()
      val (tot, dis, top) = brute(t, n)
      assert(got.toSeq == Seq(tot, dis, top), s"'$t' n=$n")
    }
  }

  test("charEntropy: planted extremes and a brute per-codepoint recount") {
    import org.apache.spark.unsafe.types.UTF8String
    def h(s: String) = Kernels.charEntropy(UTF8String.fromString(s))
    assert(h("") == 0.0)
    assert(h("aaaaaaa") == 0.0) // one symbol: zero entropy
    // n distinct symbols: exactly ln n
    assert(math.abs(h("abcdefgh") - math.log(8.0)) < 1e-12)
    def brute(s: String): Double = {
      val counts = s.codePoints().toArray.groupBy(identity).values.map(_.length.toLong)
      val n = s.codePoints().count()
      if (n == 0) 0.0
      else math.log(n.toDouble) - counts.map(c => c * math.log(c.toDouble)).sum / n
    }
    for (t <- Seq("hello world", "the quick brown fox", "aabbccdd!!??11  ",
        "ü über straße", "日本語テキスト", "mixed ascii と 日本語",
        "😀😀 surrogate pairs 😁")) // pair = ONE symbol
      assert(math.abs(h(t) - brute(t)) < 1e-12, s"'$t': ${h(t)} vs ${brute(t)}")
  }

  test("AhoCorasick: matched set equals per-phrase contains on adversarial patterns") {
    import org.apache.spark.unsafe.types.UTF8String
    // overlapping phrases, prefixes of each other, shared suffixes,
    // single chars, multi-byte UTF-8 — the fail-link/dictionary-suffix
    // paths a half-right automaton silently gets wrong
    val phrases = Array("ab", "abc", "bc", "c", "abcd", "bcd", "aab",
      "ba", "aba", "über", "ber", "日本", "本語", "xyz")
    val ac = new graft.functions.AhoCorasick(phrases)
    val texts = Seq("", "a", "ab", "abc", "abcd", "abcdabcd", "aabab",
      "babab", "cccc", "über alles", "日本語", "aabcdx", "zyxabc",
      "no hits here--", "ababababa", "aabaab")
    for (t <- texts) {
      val got = ac.search(UTF8String.fromString(t)).toIntArray().toSeq
      val want = phrases.indices.filter(i => t.contains(phrases(i)))
      assert(got == want, s"'$t': got ${got.map(phrases)} want ${want.map(phrases)}")
    }
    // pathological: repeated self-overlapping pattern
    val ac2 = new graft.functions.AhoCorasick(Array("aaa", "aa", "a"))
    assert(ac2.search(UTF8String.fromString("aaaa")).toIntArray().toSeq == Seq(0, 1, 2))
    assert(ac2.search(UTF8String.fromString("ab")).toIntArray().toSeq == Seq(2))
  }

  test("multi_contains reachable from SQL with a literal phrase array") {
    val spark = TestSpark.spark
    val r = spark.sql(
      "SELECT multi_contains('ab abc xyz', array('abc', 'zz', 'xyz')) AS m")
      .head().getSeq[Int](0)
    assert(r == Seq(0, 2))
    // non-literal phrase list rejects loudly (the automaton is a
    // plan-time artifact)
    val e = intercept[Exception] {
      spark.sql("SELECT multi_contains('x', array(cast(rand() AS STRING)))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"), e.getMessage)
  }
}
