package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's private[sql] Column ↔ Expression converters, the
  * supported way since Spark 4 moved Column onto ColumnNode. Lives in
  * the org.apache.spark.sql package solely to access them; all graft
  * code goes through [[GraftColumnBridge]]. */
/** Public alias to the private[sql] AbstractDataType, so graft's
  * custom Expressions can declare `inputTypes` (ExpectsInputTypes)
  * from outside the org.apache.spark.sql package. */
object GraftTypes {
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** The NumericType companion as an AbstractDataType (it is
    * private[sql]) — "any numeric child, UNCAST", used by the
    * reference-arithmetic expressions whose long-vs-double dispatch
    * must read the raw child type. */
  val numeric: AbstractType = types.NumericType
}

object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over an already-analyzed logical plan (Dataset.ofRows
    * is private[sql]) — how GraftSQL re-wraps a plan it has rewritten
    * (e.g. the reference's integer-division dispatch, which is
    * type-directed and therefore must run AFTER analysis). */
  def ofRows(s: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    s match {
      case c: classic.SparkSession => classic.Dataset.ofRows(c, plan)
      case other => throw new UnsupportedOperationException(
        s"classic SparkSession required, got ${other.getClass.getName}")
    }

  /** Collision-free session identity (sessionUUID is private[sql]). */
  def sessionUUID(s: SparkSession): Option[String] = s match {
    case c: classic.SparkSession => Some(c.sessionUUID)
    case _ => None
  }

  /** The physical plan of a streaming query's most recent micro-batch
    * (StreamingQueryWrapper / StreamExecution are private[sql]) — how
    * a spec asserts what a STREAMING query actually executed (e.g.
    * that a stream-static join really broadcast the static side). */
  def streamingExecutedPlan(q: streaming.StreamingQuery): Option[String] = q match {
    case w: execution.streaming.runtime.StreamingQueryWrapper =>
      Option(w.streamingQuery.lastExecution).map(_.executedPlan.toString)
    case _ => None
  }

  /** `(column, comparator, literal-as-string, literal-is-string)` for
    * every top-level AND conjunct of an UNANALYZED Column that has the
    * shape `col <op> literal` (either side), with the comparator
    * normalized to the column-on-the-left direction. The is-string
    * flag carries the literal's RUNTIME type to the pruning layer: a
    * numeric literal compared against a string column evaluates
    * NUMERICALLY in Spark (the string side is coerced), so byte-order
    * stats pruning would be unsound for it — the consumer must skip
    * those. A freshly built Column holds sql-api ColumnNodes
    * (operators are UnresolvedFunction nodes), and those node classes
    * are private[sql] — hence this bridge. Used by the catalog's
    * manifest-stats index pruning. */
  def rangeConjuncts(c: Column): Seq[(String, String, String, Boolean)] = {
    import org.apache.spark.sql.internal.{ColumnNode, UnresolvedAttribute, UnresolvedFunction, Literal => LitNode}
    def conjuncts(n: ColumnNode): Seq[ColumnNode] = n match {
      case f: UnresolvedFunction if f.functionName.equalsIgnoreCase("and") =>
        f.arguments.flatMap(conjuncts)
      case other => Seq(other)
    }
    def attr(n: ColumnNode): Option[String] = n match {
      case a: UnresolvedAttribute => Some(a.nameParts.mkString("."))
      case _ => None
    }
    def litStr(n: ColumnNode): Option[(String, Boolean)] = n match {
      case l: LitNode if l.value != null =>
        Some((l.value.toString, l.value.isInstanceOf[String]))
      case _ => None
    }
    def flip(op: String): String = op match {
      case ">" => "<"; case ">=" => "<="; case "<" => ">"; case "<=" => ">="
      case other => other
    }
    conjuncts(c.node).flatMap {
      case f: UnresolvedFunction if f.arguments.length == 2 =>
        val Seq(x, y) = f.arguments
        (attr(x), litStr(y), attr(y), litStr(x)) match {
          case (Some(cn), Some((v, s)), _, _) => Some((cn, f.functionName, v, s))
          case (_, _, Some(cn), Some((v, s))) => Some((cn, flip(f.functionName), v, s))
          case _ => None
        }
      case _ => None
    }
  }
}

/** Bridge to the private[spark] listener bus: EXPLAIN ANALYZE captures
  * executed plans through a QueryExecutionListener, whose callbacks
  * arrive ASYNCHRONOUSLY on the listener bus — metrics may only be
  * rendered after the bus has drained, or a fast statement would race
  * its own report. */
object GraftListenerBridge {
  def flush(s: SparkSession): Unit = s match {
    case c: classic.SparkSession =>
      c.sparkContext.listenerBus.waitUntilEmpty(30000L)
    case _ => ()
  }
}
