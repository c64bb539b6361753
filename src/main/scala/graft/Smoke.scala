package graft

import org.apache.spark.sql.SparkSession

/** Runtime smoke probe: drives the SQL front (registered graft
  * functions through spark.sql, exercising the codegen path of the
  * custom Expressions) and the EXPLAIN surface. Run:
  *   sbt "runMain graft.Smoke /root/testdata/sf0.001"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.create(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    sources.Tables.registerAll(spark, dir)

    println("== custom functions through SQL (codegen path) ==")
    spark.sql(
      """SELECT doc_id, simhash64(text) AS sh,
        |       size(minhash_sig(text, 5, 16, 42)) AS mh_k,
        |       size(fingerprint64(text, 8, 16)) AS fp_n
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin).show(false)

    println("== cosine_sim self-join on embeddings (SQL) ==")
    spark.sql(
      """SELECT a.vec_id, b.vec_id AS other, cosine_sim(a.embedding, b.embedding) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |ORDER BY cos DESC LIMIT 5""".stripMargin).show(false)

    println("== edge: empty / null text ==")
    spark.sql(
      """SELECT simhash64('') AS sh_empty,
        |       simhash64(CAST(NULL AS STRING)) AS sh_null,
        |       jaccard64(shingles64('abcdef', 3), shingles64('abcdef', 3)) AS j_same,
        |       jaccard64(shingles64('abcdef', 3), shingles64('uvwxyz', 3)) AS j_diff,
        |       hamming64(simhash64('a b c'), simhash64('a b c')) AS ham0
        |""".stripMargin).show(false)

    println("== EXPLAIN surface: pushdown + broadcast check (q11) ==")
    val plan = GraftSession.explainPlan(operators.Relational.q11JoinMultiway(spark, dir))
    println(plan.linesIterator.filter(l =>
      l.contains("PushedFilters") || l.contains("Join") || l.contains("ReadSchema"))
      .mkString("\n"))

    println("== typed expressions: double arrays cast, not misread ==")
    val cos = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D, 3.0D)) AS c")
      .collect()(0).getDouble(0)
    require(math.abs(cos - 1.0) < 1e-9, s"implicit cast broken: $cos")

    println("== GraftSQL round-2 surface: ^/!, txn, index scan ==")
    val root = java.nio.file.Files.createTempDirectory("graft-smoke").toString
    val g = new GraftSQL(spark, new sources.TableCatalog(spark, root))
    g.execute("CREATE TABLE s (id INTEGER PRIMARY KEY, v DOUBLE INDEX)")
    g.execute("INSERT INTO s VALUES (1, 1.5), (2, 4.0)")
    // INTEGER ^ INTEGER is exact i64 like the reference (expression
    // .rs:161-165), not a double from pow
    require(g.execute("SELECT 2 ^ 3 AS x").collect()(0).get(0) == 8L, "^ must be exponent")
    require(g.execute("SELECT 2.0 ^ 3 AS x").collect()(0).get(0) == 8.0, "float ^ stays float")
    require(g.execute("SELECT 7 / 2 AS x").collect()(0).get(0) == 3L, "int / int truncates")
    require(g.execute("SELECT 5! AS x").collect()(0).get(0) == 120L, "! must be factorial")
    g.execute("BEGIN")
    g.execute("UPDATE s SET v = v * 2 WHERE id = 1")
    require(g.execute("SELECT v FROM s WHERE id = 1").collect()(0).getDouble(0) == 3.0,
      "txn must read its own write")
    g.execute("ROLLBACK")
    require(g.execute("SELECT v FROM s WHERE id = 1").collect()(0).getDouble(0) == 1.5,
      "rollback must revert the staged update")
    require(g.catalog.scan("s", org.apache.spark.sql.functions.col("v") > 2.0).count() == 1,
      "index-pruned scan must filter correctly")
    sources.TableCatalog.deleteRecursively(java.nio.file.Paths.get(root))
    println("GraftSQL OK")

    spark.stop()
  }
}
