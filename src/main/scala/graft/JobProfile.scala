package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-job profile of one declared query (optimization-round dev tool):
  * runs `<query>` once against `<sfDir>` through the bench's noop sink
  * and prints every Spark job's wall time, so fixed per-job overhead is
  * distinguishable from real compute. Args: <sfDir> <name> [runs]. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    sources.Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().collect()

    val starts = mutable.Map.empty[Int, (Long, String)]
    val lines = mutable.ArrayBuffer.empty[String]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // the final stage's name carries the action's call site — the
        // only per-job attribution available without descriptions
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("")
        val desc = Option(j.properties.getProperty("spark.job.description"))
          .filter(_.nonEmpty).getOrElse(site)
        starts(j.jobId) = (System.nanoTime(), desc)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, desc) =>
          lines += f"  job ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc"
        }
    }
    val fn = SparkEntry.queries(name)
    (1 to runs).foreach { r =>
      lines.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      // drain the listener deterministically (listenerBus.waitUntilEmpty
      // is private[spark]): the bus delivers in order, so once every
      // started job has ended in OUR listener, its lines are complete —
      // a fixed sleep silently dropped lines whenever the bus ran behind
      Thread.sleep(50) // let queued start events land first
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (starts.nonEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      spark.sparkContext.removeSparkListener(listener)
      println(f"== $name run $r: $total%.3f s, ${lines.size} jobs")
      lines.foreach(println)
    }
    operators.FrameCache.clear()
    spark.stop()
  }
}
