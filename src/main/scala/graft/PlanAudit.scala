package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints a one-line physical-plan summary per query and
  * flags scale smells (cartesian products, nested-loop joins on
  * equi-conditions, un-pruned scans). Run:
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.1"
  */
object PlanAudit {

  /** EXACT-name BroadcastNestedLoopJoin allowlist with the EXPECTED
    * occurrence count per query (as counted by the word-start regex
    * over the formatted plan — the tree and its detail section each
    * list an operator once, so counts are 2× the node count). A query
    * not listed must show ZERO; a listed query must show EXACTLY its
    * justified count, so a second accidental BNLJ inside an allowed
    * query still flags — and a renamed/new query is never silently
    * exempt (the old substring matching would have exempted any future
    * `*_cascade_*` name). Each entry's justification is inline.
    * VALIDATED AT BOTH SCALES the suite runs (r9): a full audit at
    * sf0.01 (the correctness gate's scale) and at sf0.1 (this tool's
    * default) each report 183/183 queries with zero flags — the
    * expected counts are scale-stable because every allowed BNLJ is a
    * 1-row/tiny-probe broadcast whose plan shape does not depend on
    * corpus size. A future scale-dependent entry must key its count by
    * scale instead of weakening the exact-count rule. */
  private[graft] val ExpectedBnlj: Map[String, Int] = Map(
    "d09_containment" -> 2,     // short-doc probe broadcast (K=64 hot fallback)
    "p12_interleave" -> 2,      // 1-row normalizer broadcast
    // p14 lost its entry in r9: the quartile-threshold broadcast moved
    // inside the checkpointed staging build, so the final plan carries
    // zero BNLJ — the unlisted default
    "q10_join_cross" -> 2,      // an intended CROSS JOIN
    "q28_scalar_subquery" -> 2, // 1-row scalar-subquery broadcast
    "s01_ann_brute" -> 2,       // 1-row probe vector × corpus (the exact baseline)
    "s06_ann_batch" -> 2,       // intended 10-probe batch × corpus broadcast
    "s07_ann_filtered" -> 2,    // 1-row probe broadcast after the pushed filter
    "st11_stream_sketch" -> 2,  // 1-row sketch probe read
    "t15_heavy_hitters" -> 2,   // 1-row sketch broadcast
    "t18_dsir_importance" -> 4, // 1-row corpus-totals broadcasts
    "t21_ppl_bucket" -> 6)      // 1-row V + tertile-threshold broadcasts; the
                                // static plan lists the scored subtree twice
                                // (tertile agg + bucket select) but its final
                                // doc_id aggregate exchange is ReuseExchange'd
                                // at runtime — r10 measured the r9 checkpoint
                                // that collapsed this to 2 as a net LOSS
                                // (t21 1.06→0.96 s, e06 3.27→2.73 s without)

  // word-start match: a bare substring count would report a phantom
  // HashAggregate for every ObjectHashAggregate (and an Exchange for
  // every BroadcastExchange)
  private[graft] def countOf(plan: String, op: String): Int =
    ("(?<![A-Za-z])" + op).r.findAllMatchIn(plan).size

  /** The audit flags for one (query name, formatted plan) — split out
    * so the spec can seed a wrong plan and prove it flags. */
  private[graft] def auditFlags(name: String, plan: String): Seq[String] = {
    val bnlj = countOf(plan, "BroadcastNestedLoopJoin")
    val expected = ExpectedBnlj.getOrElse(name, 0)
    Seq(
      if (countOf(plan, "CartesianProduct") > 0 && name != "q10_join_cross")
        "⚠CARTESIAN" else "",
      if (bnlj != expected) s"⚠BNLJ($bnlj≠$expected)" else "")
      .filter(_.nonEmpty)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.create(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")

    val interesting = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct", "HashAggregate", "SortAggregate",
      "ObjectHashAggregate", "Window", "Exchange", "WholeStageCodegen")

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = GraftSession.explainPlan(fn(spark, dir))
        val ops = interesting.flatMap { op =>
          val c = countOf(plan, op)
          if (c > 0) Some(s"$op×$c") else None
        }
        println(f"$name%-24s ${ops.mkString(" ")} ${auditFlags(name, plan).mkString(" ")}")
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          println(f"$name%-24s ERROR ${msg.take(80)}")
      }
    }
    spark.stop()
  }
}
