package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints a one-line physical-plan summary per query and
  * flags scale smells (cartesian products, nested-loop joins on
  * equi-conditions, un-pruned scans). Run:
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.1"
  */
object PlanAudit {
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
          // word-start match: a bare substring count would report a
          // phantom HashAggregate for every ObjectHashAggregate (and
          // an Exchange for every BroadcastExchange)
          val c = ("(?<![A-Za-z])" + op).r.findAllMatchIn(plan).size
          if (c > 0) Some(s"$op×$c") else None
        }
        val flags = Seq(
          if (plan.contains("CartesianProduct") && !name.contains("cross")) "⚠CARTESIAN" else "",
          if (plan.contains("BroadcastNestedLoopJoin") && !name.contains("cross")
            && !name.contains("brute") && !name.contains("lsh")
            && !name.contains("batch") // s06: intended broadcast×corpus
            && !name.contains("filtered") // s07: intended one-row probe broadcast
            && !name.contains("containment") // d09 short-doc probe
            && !name.contains("interleave") // p12: 1-row normalizer broadcast
            && !name.contains("scalar_subquery") // q28: 1-row scalar broadcast
            && !name.contains("knn") // s10: corpus×k-centroid probe ranking
            && !name.contains("stream_sketch") // st11: 1-row sketch probe read
            && !name.contains("curriculum") // p14: 1-row quartile-threshold broadcast
            && !name.contains("dsir") // t18: 1-row totals broadcast
            && !name.contains("select_pack") // e05: t18's 1-row totals via dsirScoreFrame
            && !name.contains("ppl_bucket") // t21: 1-row V + tertile-threshold broadcasts
            && !name.contains("cascade") // e06: t21's 1-row V/threshold broadcasts ride along
            && !name.contains("heavy")) "⚠BNLJ" else "") // t15: 1-row sketch broadcast
          .filter(_.nonEmpty)
        println(f"$name%-24s ${ops.mkString(" ")} ${flags.mkString(" ")}")
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          println(f"$name%-24s ERROR ${msg.take(80)}")
      }
    }
    spark.stop()
  }
}
