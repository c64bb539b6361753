package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The Verify coverage contract: every declared query yields either a
  * dumped parquet dir or an errors.json entry — a crashing query must
  * surface as an error row in the round artifact, never silently
  * vanish (the round-4 st02 incident: its CORRECTNESS row was simply
  * absent and the breakage masqueraded as green). */
class VerifyCoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a deliberately-throwing query appears as err, not absent") {
    val out = Files.createTempDirectory("graft-verify-cov")
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok_query" -> ((s, _) => s.range(3).toDF("id")),
      "boom_query" -> ((_, _) => throw new IllegalStateException("deliberate test failure")))
    val errs = Verify.dumpAll(spark, TestSpark.sf, out.toString, qs)
    assert(errs.keySet == Set("boom_query"))
    assert(errs("boom_query").contains("deliberate test failure"))
    assert(Files.exists(out.resolve("ok_query")))
    assert(!Files.exists(out.resolve("boom_query")))
    val json = Files.readString(out.resolve("errors.json"))
    assert(json.contains("boom_query") && json.contains("deliberate test failure"))
    graft.sources.TableCatalog.deleteRecursively(out)
  }

  test("all-green dump writes an empty errors.json") {
    val out = Files.createTempDirectory("graft-verify-cov2")
    val errs = Verify.dumpAll(spark, TestSpark.sf, out.toString,
      Map("ok_query" -> ((s, _) => s.range(1).toDF("id"))))
    assert(errs.isEmpty)
    assert(Files.readString(out.resolve("errors.json")) == "{}")
    graft.sources.TableCatalog.deleteRecursively(out)
  }
}
