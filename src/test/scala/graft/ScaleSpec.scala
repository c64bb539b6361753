package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale utilities actually change the plan the way they claim. */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("salted join returns exactly the plain-join result") {
    val li = sources.Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = sources.Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("l_orderkey").count()
    val salted = Scale.saltedJoin(
        li, o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", 8)
      .groupBy("l_orderkey").count()
    val a = plain.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = salted.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("salted two-phase cap returns exactly the plain window-cap result") {
    val docs = sources.Tables.documents(spark, sf)
    val plain = operators.Sampling.p04CapPerGroup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted
    val salted = Scale.saltedCapPerGroup(docs, "lang", "doc_id", n = 50, salt = 8)
      .select(col("doc_id"), col("lang"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted
    assert(salted.sameElements(plain))
    // degenerate salt=1 collapses to the plain single-window cap
    val unsalted = Scale.saltedCapPerGroup(docs, "lang", "doc_id", n = 50, salt = 1)
      .select(col("doc_id"), col("lang"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted
    assert(unsalted.sameElements(plain))
    // bucket assignment doesn't affect the result: salting by an
    // unrelated ~unique key returns the same rows and ranks
    val altKey = Scale.saltedCapPerGroup(docs, "lang", "doc_id", n = 50, salt = 8,
        saltKey = Some("text"))
      .select(col("doc_id"), col("lang"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted
    assert(altKey.sameElements(plain))
  }

  test("bucketed tables equi-join without a shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = sources.Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      val o = sources.Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "l_orderkey")
      Scale.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
      Scale.writeBucketed(o, "o_bucketed", "l_orderkey", 8)
      val joined = Scale.readBucketed(spark, "li_bucketed")
        .join(Scale.readBucketed(spark, "o_bucketed"), "l_orderkey")
      val plan = GraftSession.explainPlan(joined)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan.take(400))
      assert(!plan.contains("Exchange"), "bucketed join should not shuffle:\n" + plan.take(800))
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
