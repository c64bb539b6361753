package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query seconds.
  * A warmup action first, so measured queries see a live executor
  * pool and compiled codegen rather than JVM startup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)

    // warmup: scan + shuffle + codegen once, outside any measurement
    sources.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").count().collect()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop-format write, not count(): under an aggregate-only action
      // Catalyst's EliminateSorts removes final ORDER BYs, so count()
      // under-measures sort-heavy queries; the noop sink consumes every
      // row of the complete plan
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${Option(e.getMessage).getOrElse(e)}")
          false
        }
      // a failed query reports -1, never a deceptively fast "success"
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    operators.FrameCache.clear() // release shared signature frames
    spark.stop()
  }
}
