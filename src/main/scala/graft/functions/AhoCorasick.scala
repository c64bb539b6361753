package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern matcher (Aho/Corasick 1975, "Efficient
  * string matching: an aid to bibliographic search") over UTF-8
  * BYTES — the same alphabet `UTF8String.contains` compares, so the
  * matched set is bit-identical to a per-phrase `contains` probe at
  * any phrase count.
  *
  * One pass over the text visits each byte a constant number of
  * amortized times (goto + fail-link walk), so matching is O(text +
  * matches) REGARDLESS of the phrase count, where the array-literal
  * probe t12 uses is O(phrases · text). The trie is built ONCE on the
  * driver and ships to executors inside the expression (a reference
  * object in codegen) — ~tens of bytes per phrase byte, fine for the
  * 10⁵-phrase production lists this exists for.
  *
  * Transitions live in ONE flat HashMap keyed by (state << 8 | byte) —
  * compact for large sparse tries where per-node 256-entry arrays
  * would be gigabytes. Outputs are precomputed per state through the
  * dictionary-suffix links, so the search loop only flips bits in a
  * found-set. */
final class AhoCorasick(phrases: Array[String]) extends Serializable {
  require(phrases.nonEmpty, "AhoCorasick: empty phrase list")
  require(phrases.forall(_.nonEmpty), "AhoCorasick: empty phrase")

  // --- build: trie ------------------------------------------------------
  // boxed types EXPLICITLY: HashMap[Long, Int] would unbox a miss's
  // null into 0 (the root state) and silently break the whole trie
  private val goto_ = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
  private def key(state: Int, b: Byte): Long = (state.toLong << 8) | (b & 0xffL)
  private var nStates = 1
  locally {
    var i = 0
    while (i < phrases.length) {
      val bytes = phrases(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var st = 0
      var j = 0
      while (j < bytes.length) {
        val k = key(st, bytes(j))
        val nxt = goto_.get(k)
        if (nxt == null) { goto_.put(k, nStates); st = nStates; nStates += 1 }
        else st = nxt.intValue()
        j += 1
      }
      ends(st) ::= i
      i += 1
    }
  }
  // phrase indexes ending exactly at a state (during build)
  private lazy val ends = new scala.collection.mutable.HashMap[Int, List[Int]]()
    .withDefaultValue(Nil)

  // --- build: fail links + merged outputs (BFS) -------------------------
  private val fail = new Array[Int](nStates)
  /** outputs(state): all phrase indexes whose pattern ends at state,
    * INCLUDING through dictionary-suffix links — merged at build so the
    * search loop never walks links. */
  private val outputs = new Array[Array[Int]](nStates)
  locally {
    val queue = new java.util.ArrayDeque[Int]()
    outputs(0) = Array.empty
    // depth-1 states fail to root
    val it0 = goto_.entrySet().iterator()
    val byState = new java.util.HashMap[Int, java.util.ArrayList[(Byte, Int)]]()
    while (it0.hasNext) {
      val e = it0.next()
      val st = (e.getKey >>> 8).toInt
      val b = (e.getKey & 0xff).toByte
      var l = byState.get(st)
      if (l == null) { l = new java.util.ArrayList(); byState.put(st, l) }
      l.add((b, e.getValue))
    }
    val root = byState.get(0)
    if (root != null) { val it = root.iterator(); while (it.hasNext) {
      val (_, s) = it.next(); fail(s) = 0; queue.add(s)
    } }
    while (!queue.isEmpty) {
      val st = queue.poll()
      outputs(st) = (ends(st) ++ outputs(fail(st)).toList).distinct.sorted.toArray
      val kids = byState.get(st)
      if (kids != null) { val it = kids.iterator(); while (it.hasNext) {
        val (b, child) = it.next()
        // child's fail: longest proper suffix reachable in the trie
        var f = fail(st)
        var nxt = goto_.get(key(f, b))
        while (nxt == null && f != 0) { f = fail(f); nxt = goto_.get(key(f, b)) }
        fail(child) = if (nxt != null && nxt.intValue() != child) nxt.intValue() else 0
        queue.add(child)
      } }
    }
  }

  def nPhrases: Int = phrases.length

  /** Per-thread reusable seen-flags — one automaton instance is shared
    * by every task in an executor (it ships as a codegen reference
    * object), so the flag array is thread-local, allocated once per
    * thread, and CLEARED SELECTIVELY after each row via the hit list.
    * The per-row allocation is then sized to the ACTUAL match count
    * (usually zero or a handful), not O(nPhrases): at the 10⁵-phrase
    * production scale the previous per-row boolean array was ~100 KB
    * of churn per document against a few real hits. */
  @transient private lazy val foundTL: ThreadLocal[Array[Boolean]] =
    ThreadLocal.withInitial(() => new Array[Boolean](phrases.length))

  /** Distinct matched phrase indexes, ascending. */
  def search(text: UTF8String): UnsafeArrayData = {
    val bytes = text.getBytes
    val found = foundTL.get()
    var hits: Array[Int] = null // grown on demand; most rows match little
    var nFound = 0
    var st = 0
    var i = 0
    while (i < bytes.length && nFound < phrases.length) {
      val b = bytes(i)
      var nxt = goto_.get(key(st, b))
      while (nxt == null && st != 0) { st = fail(st); nxt = goto_.get(key(st, b)) }
      st = if (nxt == null) 0 else nxt.intValue()
      val out = outputs(st)
      var j = 0
      while (j < out.length) {
        val p = out(j)
        if (!found(p)) {
          found(p) = true
          if (hits == null) hits = new Array[Int](8)
          else if (nFound == hits.length)
            hits = java.util.Arrays.copyOf(hits, hits.length * 2)
          hits(nFound) = p
          nFound += 1
        }
        j += 1
      }
      i += 1
    }
    if (nFound == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyIntArray)
    val res = java.util.Arrays.copyOf(hits, nFound)
    java.util.Arrays.sort(res)
    // reset ONLY the touched flags for the thread's next row
    var k = 0
    while (k < nFound) { found(hits(k)) = false; k += 1 }
    UnsafeArrayData.fromPrimitiveArray(res)
  }
}

/** `multi_contains(text)` — the indexes (into the phrase list) of
  * every phrase occurring in `text`, via one Aho-Corasick pass:
  * t12's documented 10⁵-phrase swap-in, with the same observable
  * contract (which phrases hit) as the array-literal probe. */
case class MultiContains(child: Expression, phrases: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.GraftTypes.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "multi_contains"
  @transient private lazy val ac = new AhoCorasick(phrases.toArray)
  override protected def nullSafeEval(a: Any): Any =
    ac.search(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the automaton is a driver-built reference object shipped with the
    // generated class — built once, not per row/partition
    val acRef = ctx.addReferenceObj("acAutomaton", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, a => s"$acRef.search($a)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
