package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** TOP-K PER GROUP as a whole-operator plan node — the one shape in
  * this library where Spark's built-ins genuinely can't express the
  * efficient semantics (assignment preference (c): custom LogicalPlan
  * + SparkStrategy + SparkPlan via SparkSessionExtensions).
  *
  * The standard formulation — `row_number() OVER (PARTITION BY g
  * ORDER BY o) <= k` — must SORT every partition completely and
  * shuffle EVERY input row to its group's partition before a single
  * row can be discarded. This operator keeps a bounded heap of k rows
  * per group instead (memory O(groups·k), no sort), and plans TWICE,
  * like partial aggregation: a partial pass per INPUT partition
  * discards losers before the exchange — at most k rows per (group,
  * input-partition) are shuffled — and a final pass per group key
  * finishes after it. On a 100 TB fact table with k=3 the exchange
  * carries ~k·partitions rows per group instead of the group's entire
  * row count; that difference IS the operator.
  *
  * The reference's closest analog is ORDER BY + LIMIT (ast.rs:46-48)
  * executed per group — a shape its iterator executor cannot fuse.
  *
  * Determinism: callers must pass a TOTAL `order` (tie-break on a
  * unique column) — the heap keeps the k FIRST rows under that order,
  * so the kept set is then partition-layout-independent.
  *
  * Memory contract: the PARTIAL pass caps its heap map at
  * `spark.graft.topk.maxGroupsPerTask` distinct groups per task
  * (default 1,048,576); rows of groups beyond the cap PASS THROUGH to
  * the exchange unheaped — correctness is unaffected (the final pass
  * re-selects exactly), only the map-side cut for those groups is
  * lost, and the degradation is observable via the partial's
  * `passThroughRows` SQLMetric. So the partial can never OOM on
  * group cardinality; the final pass holds O(groups-per-task·k) rows,
  * the same contract as Spark's own TakeOrderedAndProject (O(k))
  * scaled by the post-exchange group count — with astronomically many
  * groups, fall back to the window formulation. */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"TopKPerGroup: k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

/** Plans the logical node as partial → (exchange) → final, the
  * partial-aggregate pattern: the final exec's ClusteredDistribution
  * requirement makes EnsureRequirements insert the one hash exchange
  * between them. Injected via [[GraftExtensions]]. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      // group-cardinality ceiling resolved at PLAN time so it is
      // visible in the physical plan and stable for the whole query
      val maxGroups = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.topk.maxGroupsPerTask", "1048576").toInt
      TopKPerGroupExec(g, o, k, partial = false, maxGroups,
        TopKPerGroupExec(g, o, k, partial = true, maxGroups, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    maxGroups: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))
  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  // observable evidence of the map-side cut: the partial's output rows
  // (what the exchange will carry) vs its input; passThroughRows > 0
  // means the group-cardinality ceiling degraded some groups to
  // pass-through (correct, just uncut)
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "output rows"),
    "passThroughRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "pass-through rows (group ceiling hit)"))

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val groupLocal = groupExprs
    val orderLocal = order
    val kLocal = k
    val partialLocal = partial
    val maxGroupsLocal = maxGroups
    val outRows = metrics("numOutputRows") // bind OUTSIDE the closure
    val passRows = metrics("passThroughRows")
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groupLocal, schema)
      val ord = RowOrdering.create(orderLocal, schema)
      // keep the k FIRST rows under `ord` ⇒ evict the LAST: a max-heap
      // under the same order (java PQ is a min-heap, so reverse)
      val cmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]
      import scala.jdk.CollectionConverters._
      // STREAMING pass: heap absorption emits nothing; a row whose
      // group would exceed the ceiling (partial only) is emitted
      // immediately — never buffered — so task memory stays bounded at
      // O(maxGroups·k) rows no matter the input's group cardinality.
      // The final pass has no ceiling: it must select exactly (its
      // per-task group count is already divided by the exchange).
      val absorbed = it.flatMap { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null && partialLocal && heaps.size >= maxGroupsLocal) {
          passRows.add(1); outRows.add(1)
          Iterator.single(row) // degrade: final re-selects, still exact
        } else {
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](kLocal, cmp)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < kLocal) heap.add(row.copy())
          else if (ord.compare(row, heap.peek()) < 0) {
            heap.poll(); heap.add(row.copy()): Unit
          }
          Iterator.empty
        }
      }
      // ++ is by-name: the heap drain runs only after input exhausts
      absorbed ++ heaps.values().iterator().asScala
        .flatMap(_.iterator().asScala).map { r => outRows.add(1); r }
    }
  }
}
