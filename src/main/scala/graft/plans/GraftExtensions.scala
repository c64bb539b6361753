package graft.plans

import graft.functions.{CosineSim, Registry}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

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
  * for any non-null vector — fold the O(dim) kernel away. Null
  * semantics preserved: only folds when the child can't be null. */
object FoldSelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSim(a, b) if a.semanticEquals(b) && !a.nullable && a.deterministic =>
        Literal(1.0, DoubleType)
    }
}
