package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch aggregator over a term column — the mergeable
  * frequency sketch (Cormode/Muthukrishnan 2005): a Depth×Width
  * counter grid; each term increments one counter per row (chosen by
  * an independent hash), and a term's estimate is the MIN of its
  * counters — always ≥ the true count, and ≤ true + εN with ε = e/Width
  * per hash row.
  *
  * Why this sketch (and not SpaceSaving) for the distributed engine:
  * counter grids merge by ELEMENTWISE ADDITION, a commutative
  * monoid — the merged sketch is bit-identical under ANY partitioning
  * or merge order, so the operator is deterministic on a cluster
  * (SpaceSaving's eviction makes its summary merge-order-dependent).
  * Each partition folds its rows into one fixed-size grid
  * (Depth×Width longs — constant memory however many rows), grids add
  * in the reduce: shuffle bytes per aggregation = one grid, regardless
  * of corpus size. That is the 100 TB shape.
  */
object SketchAgg {

  val Depth = 4
  val Width = 1024

  /** Counter position of `term` in hash row `row` — deterministic
    * (MurmurHash3 x86 over the string with a fixed odd seed per row),
    * shared by the aggregator and the probe-side lookup. */
  def pos(term: String, row: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(term, 0x9E3779B9 * (row + 1))
    java.lang.Math.floorMod(h, Width)
  }

  final case class CmsBuf(var c: Array[Long])

  val cms: Aggregator[String, CmsBuf, Array[Long]] =
    new Aggregator[String, CmsBuf, Array[Long]] {
      def zero: CmsBuf = CmsBuf(new Array[Long](Depth * Width))

      def reduce(b: CmsBuf, term: String): CmsBuf = {
        if (term != null) {
          var r = 0
          while (r < Depth) { b.c(r * Width + pos(term, r)) += 1L; r += 1 }
        }
        b
      }

      def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
        var i = 0
        while (i < a.c.length) { a.c(i) += b.c(i); i += 1 }
        a
      }

      def finish(b: CmsBuf): Array[Long] = b.c

      def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
      def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }

  /** The sketch as an untyped aggregate Column (usable in
    * `df.agg(...)`). */
  def cmsSketch(term: Column): Column = udaf(cms).apply(term)
}
