package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-step generator: builds an sf1-shaped dataset
  * from the driver's sf0.1 testdata by REPLICATE-WITH-REMAP — the
  * standard way to take a fixed benchmark corpus one scale step up
  * without inventing a new generative process.
  *
  *   sbt "runMain graft.GenData /root/testdata/sf0.1 testdata_sf1 10"
  *
  * Semantics per table (replica r ∈ [0, reps)):
  *  - region/nation: TPC-H dimension constants — copied once, never
  *    scaled (5 regions and 25 nations at any SF, like dbgen).
  *  - customer/supplier/part/orders/lineitem/events: key columns are
  *    offset by r × (base max key + 1), so replica 0 is the base data
  *    VERBATIM (every hardcoded probe id in the suite still exists),
  *    foreign keys stay consistent within a replica, and join
  *    fan-outs scale like real growth (10× customers × 10× orders,
  *    each order still ~4 lineitems). Value/date columns keep their
  *    base distributions — more rows over the same domain, which is
  *    what a 10× bigger business period looks like.
  *  - documents: doc_id offset as above; for r>0 the TEXT is perturbed
  *    at EVERY 5th word position (phase and replacement word keyed by
  *    the replica + position, never the doc) — two near-identical base
  *    docs get IDENTICAL perturbations at aligned positions, so each
  *    replica's internal near-dup structure mirrors the base corpus,
  *    while cross-replica copies of one doc diverge in essentially
  *    every 5-word shingle (each contains ≥1 implant, implants differ
  *    per replica): the duplicate RATE stays ~constant as the corpus
  *    scales instead of every doc becoming a 10-way duplicate. The
  *    implant SPACING (5) matters: a position-independent random flip
  *    can implant runs ≥ the shingle width shared by EVERY doc in a
  *    replica, which hijacks minhash functions corpus-wide and turns
  *    LSH banding quadratic (measured: d02 went 60× super-linear on
  *    exactly that bug before the spacing fix). Spaced implants keep
  *    ≥3 original words in every shingle, so unrelated docs never gain
  *    a shared shingle they didn't already have. n_chars is recomputed
  *    from the perturbed text.
  *  - embeddings: vec_id offset; for r>0 each component gets hash-seeded
  *    uniform noise in ±0.05 — replicas populate the same label
  *    clusters (the IVF/PQ regime) without being exact vector copies.
  *
  * Everything is a pure per-row function of (row, replica) via
  * xxhash64 — no RNG state, so regeneration is bit-identical. The
  * suite's DuckDB oracle gate stays at sf0.01 (quadratic brute-force
  * oracles are priced for small SFs); this dataset feeds the
  * sf0.1→sf1 SCALING bench only.
  */
object GenData {

  private def withReplica(df: DataFrame, reps: Int): DataFrame =
    df.withColumn("__r", explode(array((0 until reps).map(i => lit(i.toLong)): _*)))

  private def offsetKeys(df: DataFrame, strides: Map[String, Long]): DataFrame =
    strides.foldLeft(df) { case (d, (c, stride)) =>
      d.withColumn(c, col(c) + col("__r") * stride)
    }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("testdata_sf1")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.create(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
    import spark.implicits._

    def maxKey(df: DataFrame, c: String): Long =
      df.agg(max(col(c).cast("long"))).head().getLong(0) + 1L

    def write(name: String, df: DataFrame, parts: Int): Unit = {
      df.repartition(parts).write.mode(SaveMode.Overwrite)
        .parquet(s"$out/$name.parquet")
      println(s"[gendata] $name -> $out/$name.parquet")
    }

    val customer = sources.Tables.customer(spark, src)
    val supplier = sources.Tables.supplier(spark, src)
    val part = sources.Tables.part(spark, src)
    val orders = sources.Tables.orders(spark, src)
    val lineitem = sources.Tables.lineitem(spark, src)
    val events = sources.Tables.events(spark, src)
    val documents = sources.Tables.documents(spark, src)
    val embeddings = sources.Tables.embeddings(spark, src)

    val cStride = maxKey(customer, "c_custkey")
    val sStride = maxKey(supplier, "s_suppkey")
    val pStride = maxKey(part, "p_partkey")
    val oStride = maxKey(orders, "o_orderkey")
    val eStride = maxKey(events, "event_id")
    val uStride = maxKey(events, "user_id")
    val dStride = maxKey(documents, "doc_id")
    val vStride = maxKey(embeddings, "vec_id")

    // dimension constants: copied, not scaled
    write("region", sources.Tables.region(spark, src), 1)
    write("nation", sources.Tables.nation(spark, src), 1)

    def scaled(df: DataFrame, strides: Map[String, Long]): DataFrame =
      offsetKeys(withReplica(df, reps), strides).drop("__r")

    write("customer", scaled(customer, Map("c_custkey" -> cStride)), 4)
    write("supplier", scaled(supplier, Map("s_suppkey" -> sStride)), 1)
    write("part", scaled(part, Map("p_partkey" -> pStride)), 4)
    write("orders",
      scaled(orders, Map("o_orderkey" -> oStride, "o_custkey" -> cStride)), 8)
    write("lineitem",
      scaled(lineitem, Map(
        "l_orderkey" -> oStride, "l_partkey" -> pStride, "l_suppkey" -> sStride)), 32)
    write("events",
      scaled(events, Map("event_id" -> eStride, "user_id" -> uStride)), 16)

    // documents: spaced position-keyed word implants for r>0 (see header)
    val vocab = documents.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().as[String].collect().sorted
    val vocabLit = array(vocab.map(lit): _*)
    val implantEvery = 5 // = the suite's shingle width; never implants a run
    val perturbed = withReplica(documents, reps)
      .withColumn("doc_id", col("doc_id") + col("__r") * dStride)
      .withColumn("text",
        when(col("__r") === 0, col("text")).otherwise(
          array_join(
            zip_with(
              split(col("text"), " "),
              sequence(lit(0), size(split(col("text"), " ")) - 1),
              (w, i) =>
                when(pmod(i + pmod(xxhash64(lit("phase"), col("__r")), lit(implantEvery)),
                    lit(implantEvery)) === 0,
                  element_at(vocabLit,
                    (pmod(xxhash64(lit("pick"), col("__r"), i), lit(vocab.length)) + 1)
                      .cast("int")))
                  .otherwise(w)),
            " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__r")
    write("documents", perturbed, 8)

    // embeddings: hash-seeded ±0.05 component noise for r>0
    val emb = withReplica(embeddings, reps)
      .withColumn("vec_id", col("vec_id") + col("__r") * vStride)
      .withColumn("embedding",
        when(col("__r") === 0, col("embedding")).otherwise(
          zip_with(
            col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, i) => (x +
              (pmod(xxhash64(col("vec_id"), col("__r"), i), lit(1001)) - 500)
                .cast("float") / 10000.0f).cast("float"))))
      .drop("__r")
    write("embeddings", emb, 2)

    // row-count audit so a truncated write fails the generation loudly
    for (n <- sources.Tables.names) {
      val base = sources.Tables.load(spark, src, n).count()
      val got = sources.Tables.load(spark, out, n).count()
      val want = if (n == "region" || n == "nation") base else base * reps
      require(got == want, s"$n: wrote $got rows, expected $want")
      println(s"[gendata] $n rows: $base -> $got")
    }
    spark.stop()
  }
}
