package graft

import graft.sources.IO
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class IOSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-io").toString

  test("csv and jsonl round-trip the nation table exactly") {
    val nation = sources.Tables.nation(spark, sf)
    val csvPath = tmp() + "/nation_csv"
    val jsonPath = tmp() + "/nation_json"
    IO.writeCsv(nation, csvPath)
    IO.writeJsonl(nation, jsonPath)
    val fromCsv = IO.readCsv(spark, csvPath, nation.schema)
    val fromJson = IO.readJsonl(spark, jsonPath, nation.schema)
    val base = nation.orderBy("n_nationkey").collect().toSeq
    assert(fromCsv.orderBy("n_nationkey").collect().toSeq == base)
    assert(fromJson.orderBy("n_nationkey").collect().toSeq == base)
  }

  test("csv round-trips microsecond timestamps (events carry sub-second precision)") {
    // ordered before limit: LIMIT on an unordered frame may select
    // different rows on each execution (write vs reference)
    val events = sources.Tables.events(spark, sf).select("event_id", "ts")
      .orderBy("event_id").limit(200)
    val path = tmp() + "/events_csv"
    IO.writeCsv(events, path)
    val back = IO.readCsv(spark, path, events.schema)
    val a = events.orderBy("event_id").collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    val b = back.orderBy("event_id").collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    assert(a.sameElements(b)) // a second-only format would truncate silently
  }

  test("orc round-trips exactly and pushes filters to the scan") {
    val orders = sources.Tables.orders(spark, sf)
    val path = tmp() + "/orders_orc"
    IO.writeOrc(orders, path)
    val back = IO.readOrc(spark, path, orders.schema)
    assert(back.orderBy("o_orderkey").collect().toSeq
      == orders.orderBy("o_orderkey").collect().toSeq)
    val plan = GraftSession.explainPlan(back.filter(col("o_orderkey") === 1L))
    assert(plan.contains("PushedFilters") && plan.contains("o_orderkey"), plan.take(500))
  }

  test("partitioned parquet write enables partition pruning") {
    val path = tmp() + "/orders_part"
    IO.writeParquetPartitioned(
      sources.Tables.orders(spark, sf), path, "o_orderstatus")
    val scan = IO.readParquet(spark, path).filter(col("o_orderstatus") === "F")
    val plan = GraftSession.explainPlan(scan)
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(o_orderstatus"),
      plan.take(600))
    val expected = sources.Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F").count()
    assert(scan.count() == expected)
  }
}
