package graft.plans

import graft.functions.{CosineSim, Registry}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{
  ArrayExists, EqualTo, If, LambdaFunction, Literal, NamedLambdaVariable, Not}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Extension entry point: `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` wires the graft function
  * library and optimizer rules into any session at construction time —
  * the injection route a deployment uses when it doesn't call
  * [[graft.GraftSession]] (e.g. spark-submit with
  * `spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * The reference runs its own optimizer passes over its plan tree
  * (/root/reference/src/sql/plan/optimizer.rs); on Spark, domain rules
  * join Catalyst's batches through exactly this hook.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FoldSelfCosine)
    // function registration happens per-session via Registry (the
    // injectFunction hook needs ExpressionInfo plumbing; Registry
    // covers both entry paths)
  }
}

/** Domain constant-folding (analog of the reference's ConstantFolder,
  * optimizer.rs:17): cosine similarity of a column with itself is 1.0
  * for any non-zero vector — replace the O(dim) three-accumulator
  * kernel with a short-circuiting any-element-nonzero probe.
  *
  * Semantics preserved exactly: [[graft.functions.Kernels.cosine]]
  * returns 0.0 for an all-zero or empty vector (undefined direction),
  * so the fold must NOT produce a flat 1.0 — it rewrites to
  * `IF(EXISTS(v, x -> x != 0), 1.0, 0.0)`, which agrees with the
  * kernel on every input and costs O(1) on any vector with an early
  * non-zero element. Null semantics preserved: only fires when the
  * child can't be null. */
object FoldSelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSim(a, b) if a.semanticEquals(b) && !a.nullable && a.deterministic =>
        val x = NamedLambdaVariable("x", FloatType, nullable = true)
        val nonZero = LambdaFunction(Not(EqualTo(x, Literal(0.0f, FloatType))), Seq(x))
        If(ArrayExists(a, nonZero),
          Literal(1.0, DoubleType), Literal(0.0, DoubleType))
    }
}
