package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass mean-vector aggregator for embedding columns.
  *
  * A per-group centroid over `Array[Float]` data: each partition folds
  * its rows into a single (sum-vector, count) buffer, buffers merge
  * associatively in the reduce — constant memory per group, no
  * posexplode shuffle of (group, position) pairs (which would multiply
  * shuffle volume by the vector dimension). This is the shape that
  * holds at 100 TB: shuffle bytes per group = one buffer, regardless
  * of row count.
  *
  * Sums accumulate in Double to keep merge-order error at the ulp
  * level before the final divide back to Float.
  *
  * Ragged input (vectors of unequal length, incl. empty) is defined as
  * the ZERO-PADDED mean: the buffer grows to the longest vector seen
  * and every row counts in `n` — a pure function of the group's rows,
  * so the result cannot depend on partition layout (a first-seen-length
  * buffer would truncate or crash depending on which partition merged
  * first).
  */
object VectorAgg {

  case class Buf(var sum: Array[Double], var n: Long)

  val centroid: Aggregator[Array[Float], Buf, Array[Float]] =
    new Aggregator[Array[Float], Buf, Array[Float]] {
      def zero: Buf = Buf(Array.emptyDoubleArray, 0L)

      def reduce(b: Buf, v: Array[Float]): Buf = {
        if (v == null) return b
        if (b.sum.length < v.length) b.sum = java.util.Arrays.copyOf(b.sum, v.length)
        var i = 0
        while (i < v.length) { b.sum(i) += v(i); i += 1 }
        b.n += 1
        b
      }

      def merge(a: Buf, b: Buf): Buf = {
        if (b.sum.length > a.sum.length) return merge(b, a)
        var i = 0
        while (i < b.sum.length) { a.sum(i) += b.sum(i); i += 1 }
        a.n += b.n
        a
      }

      def finish(b: Buf): Array[Float] =
        if (b.n == 0) Array.emptyFloatArray
        else b.sum.map(x => (x / b.n).toFloat)

      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Array[Float]] = ExpressionEncoder[Array[Float]]()
    }

  /** Untyped-`agg` form: `df.groupBy("label").agg(centroid_agg($"embedding"))`. */
  private lazy val centroidUdaf =
    udaf(centroid, ExpressionEncoder[Array[Float]]())

  def centroid_agg(c: Column): Column = centroidUdaf(c)
}
