package graft

import graft.sources.TableCatalog
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test of the SQL front's reference arithmetic — the
  * parse-level rewrite machinery (`^` → RefPow, postfix `!` →
  * factorial, `/` → type-dispatching RefDiv, AVG's integer finalizer)
  * is the subtlest code in the repo and was previously only
  * example-tested. 200+ seeded random expression trees over the
  * reference grammar (expression.rs:142-174 semantics: truncating i64
  * division, exact checked i64 `^`, C-sign `%`) are rendered to SQL,
  * executed through GraftSQL.execute over a catalog table (column
  * leaves keep Catalyst from constant-folding the tree away, so
  * codegen paths run), and compared against an independent
  * interpreter of the same published semantics. Cases whose value
  * the reference itself would reject (zero divisor, i64 overflow,
  * factorial out of range) are discarded by the interpreter and the
  * error paths asserted separately. */
class RefArithPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val g: GraftSQL = {
    val dir = java.nio.file.Files.createTempDirectory("graft-arith").toString
    val s = new GraftSQL(spark, new TableCatalog(spark, dir))
    s.execute("CREATE TABLE pt (a INTEGER, b INTEGER, x FLOAT)")
    s.execute("INSERT INTO pt VALUES (7, -4, 2.5)")
    s
  }

  // ------------------------------------------------------------- AST
  private sealed trait E
  private case class L(v: Long) extends E // non-negative int literal
  private case class D(v: Double) extends E // one-decimal float literal
  private case class C(name: String) extends E // a=7, b=-4, x=2.5
  private case class Bin(op: Char, l: E, r: E) extends E // + - * / %
  private case class Pow(base: E, exp: Int) extends E // literal exponent
  private case class Fact(n: Int, parens: Boolean) extends E
  private case class Neg(e: E) extends E

  private def render(e: E): String = e match {
    case L(v) => v.toString
    case D(v) => "%.1f".formatLocal(java.util.Locale.ROOT, v)
    case C(n) => n
    case Bin(op, l, r) => s"(${render(l)} $op ${render(r)})"
    case Pow(b, k) => s"(${render(b)} ^ $k)"
    case Fact(n, true) => s"($n)!"
    case Fact(n, false) => s"$n!"
    // double-parenthesized operand: the reference's prefix minus binds
    // TIGHTER than postfix `!` (prec 9 vs 8, parser/mod.rs:712-778), so
    // "-(3)!" parses as factorial(-3) — the extra parens pin this AST
    // node's grouping (negate the whole operand) unambiguously
    case Neg(x) => s"(-(${render(x)}))"
  }

  /** Independent evaluation under the reference's published semantics.
    * Left = integer lineage (i64), Right = float lineage (f64) —
    * mirroring RefDiv/RefPow's static type dispatch. None = the case
    * is discarded (the engine would raise or the value leaves the
    * safely-comparable range). */
  private val cap = 4_000_000_000_000_000L // < 2^53: long/double compares stay exact
  private def eval(e: E): Option[Either[Long, Double]] = e match {
    case L(v) => Some(Left(v))
    case D(v) => Some(Right(v))
    case C("a") => Some(Left(7L))
    case C("b") => Some(Left(-4L))
    case C(_)   => Some(Right(2.5))
    case Neg(x) => eval(x).map {
      case Left(l) => Left(-l)
      case Right(d) => Right(-d)
    }
    case Fact(n, _) =>
      if (n >= 0 && n <= 12) Some(Left((1 to n).foldLeft(1L)(_ * _))) else None
    case Pow(b, k) => eval(b).flatMap {
      case Left(l) => // integral base, foldable non-negative exponent: exact i64
        try {
          var r = 1L
          for (_ <- 0 until k) r = Math.multiplyExact(r, l)
          if (math.abs(r) > cap) None else Some(Left(r))
        } catch { case _: ArithmeticException => None }
      case Right(d) => Some(Right(math.pow(d, k.toDouble)))
    }
    case Bin(op, le, re) =>
      for {
        x <- eval(le); y <- eval(re)
        r <- (x, y, op) match {
          case (Left(a), Left(b), '+') => checked(Math.addExact(a, b))
          case (Left(a), Left(b), '-') => checked(Math.subtractExact(a, b))
          case (Left(a), Left(b), '*') => checked(Math.multiplyExact(a, b))
          case (Left(a), Left(b), '/') =>
            if (b == 0L) None else Some(Left(a / b)) // truncation toward zero
          case (Left(a), Left(b), '%') =>
            if (b == 0L) None else Some(Left(a % b)) // sign of dividend
          case (a, b, _) => // float lineage: f64 arithmetic
            val (da, db) = (toD(a), toD(b))
            op match {
              case '+' => Some(Right(da + db))
              case '-' => Some(Right(da - db))
              case '*' => Some(Right(da * db))
              case '/' => if (db == 0.0) None else Some(Right(da / db))
              case '%' => if (db == 0.0) None else Some(Right(da % db))
            }
        }
      } yield r
  }
  private def checked(body: => Long): Option[Either[Long, Double]] =
    try { val v = body; if (math.abs(v) > cap) None else Some(Left(v)) }
    catch { case _: ArithmeticException => None }
  private def toD(v: Either[Long, Double]): Double =
    v.fold(_.toDouble, identity)

  // ------------------------------------------------------- generator
  private val leaf: Gen[E] = Gen.frequency(
    4 -> Gen.choose(0L, 9L).map(L(_)),
    2 -> Gen.choose(1, 19).map(n => D(n / 2.0 + (n % 2) * 0.0)), // 0.5-step decimals
    2 -> Gen.oneOf(C("a"), C("b"), C("x")),
    1 -> Gen.choose(0, 8).flatMap(n => Gen.oneOf(Fact(n, true), Fact(n, false))))
  private def tree(depth: Int): Gen[E] =
    if (depth <= 0) leaf
    else Gen.frequency(
      2 -> leaf,
      5 -> (for {
        op <- Gen.oneOf('+', '-', '*', '/', '%')
        l <- tree(depth - 1); r <- tree(depth - 1)
      } yield Bin(op, l, r)),
      2 -> (for { b <- tree(depth - 1); k <- Gen.choose(0, 4) } yield Pow(b, k)),
      1 -> tree(depth - 1).map(Neg(_)))

  private def samples(n: Int): Seq[(String, Either[Long, Double])] = {
    val out = Seq.newBuilder[(String, Either[Long, Double])]
    var seed = 0L
    var kept = 0
    while (kept < n) {
      tree(3).apply(Gen.Parameters.default, Seed(seed)).foreach { e =>
        eval(e).foreach { v => out += ((render(e), v)); kept += 1 }
      }
      seed += 1
    }
    out.result()
  }

  private def checkBatch(batch: Seq[(String, Either[Long, Double])]): Unit = {
    val sql = batch.zipWithIndex
      .map { case ((txt, _), i) => s"$txt AS v$i" }
      .mkString("SELECT ", ", ", " FROM pt")
    val row = g.execute(sql).collect()(0)
    batch.zipWithIndex.foreach { case ((txt, expected), i) =>
      val got = row.get(i)
      assert(got != null, s"$txt: engine returned NULL, expected $expected")
      val n = got.asInstanceOf[java.lang.Number]
      expected match {
        case Left(l) =>
          assert(n.longValue == l && n.doubleValue == l.toDouble,
            s"$txt: engine=$got expected i64 $l")
        case Right(d) =>
          val gd = n.doubleValue
          assert(gd == d || math.abs(gd - d) <= 1e-9 * math.max(1.0, math.abs(d)),
            s"$txt: engine=$gd expected f64 $d")
      }
    }
  }

  test("200 random reference-grammar expressions match the semantics oracle") {
    samples(200).grouped(10).foreach(checkBatch)
  }

  test("AVG over integers is the integer-division finalizer (aggregation.rs:132-137)") {
    val lists = (0 until 20).flatMap(i =>
      Gen.nonEmptyListOf(Gen.choose(-50L, 50L)).map(_.take(8))
        .apply(Gen.Parameters.default, Seed(1000L + i)))
    for (xs <- lists) {
      val values = xs.map(v => s"($v)").mkString(", ")
      val got = g.execute(s"SELECT avg(v) AS a FROM (VALUES $values) AS t(v)")
        .collect()(0).getLong(0)
      assert(got == xs.sum / xs.length, // refDivLong truncation, not floor
        s"avg($xs): engine=$got expected ${xs.sum / xs.length}")
    }
  }

  test("reference error paths: zero divisor and i64 overflow raise") {
    val e1 = intercept[Exception] { g.execute("SELECT (1 / 0) AS v FROM pt").collect() }
    assert(e1.toString.toLowerCase.contains("divide by zero")
      || Option(e1.getCause).exists(_.toString.toLowerCase.contains("divide by zero")))
    val e2 = intercept[Exception] { g.execute("SELECT (9 ^ 50) AS v FROM pt").collect() }
    assert(e2.toString.toLowerCase.contains("overflow")
      || Option(e2.getCause).exists(_.toString.toLowerCase.contains("overflow")))
  }
}
