package graft

import graft.operators._
import org.apache.spark.sql.functions.{array_max, array_min, col, size, split, sum}
import org.scalatest.funsuite.AnyFunSuite

/** Operator-level behavior at sf0.001 + plan-shape assertions (the
  * optimizer-parity rows of SURVEY.md §2). */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("every registered query runs and the oracle keys are a subset") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 27)
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q10 cross join = |region| x |nation|") {
    assert(Relational.q10JoinCross(spark, sf).count() == 125)
  }

  test("q06 returns exactly limit rows, ordered desc") {
    val rows = Relational.q06OrderLimitOffset(spark, sf).collect()
    assert(rows.length == 50)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("opt_column_prune: q01 scan reads only the three projected columns") {
    val plan = GraftSession.explainPlan(Relational.q01ScanProject(spark, sf))
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("l_orderkey") && read.contains("l_extendedprice"))
    assert(!read.contains("l_shipdate") && !read.contains("l_quantity"))
  }

  test("opt_filter_pushdown: q04 date filter reaches the parquet scan") {
    val plan = GraftSession.explainPlan(Relational.q04AggGroup(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("opt_join_hash: equi-joins never fall back to nested-loop") {
    for (q <- Seq(Relational.q07JoinInner(spark, sf), Relational.q11JoinMultiway(spark, sf))) {
      val plan = GraftSession.explainPlan(q)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(5).mkString("\n"))
    }
  }

  test("opt_constant_fold: literal arithmetic folds before execution") {
    import org.apache.spark.sql.functions.lit
    val df = sources.Tables.region(spark, sf).select((lit(2) * 21).as("y"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("42") && !optimized.contains("(2 * 21)"), optimized)
  }

  test("d01 exact dedup partitions all docs") {
    val out = Dedup.d01Exact(spark, sf).collect()
    val total = out.map(_.getLong(1)).sum
    assert(total == sources.Tables.documents(spark, sf).count())
  }

  test("d04 ngram jaccard: pairs are ordered, above threshold, and verified") {
    val rows = Dedup.d04NgramJaccard(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.8)
    }
  }

  test("d03 simhash pairs respect the hamming <= 3 bound") {
    Dedup.d03Simhash(spark, sf).collect().foreach(r => assert(r.getInt(2) <= 3))
  }

  test("d03 simhash is COMPLETE for hamming <= 3: equals the brute-force pair scan") {
    import graft.functions.Kernels
    import org.apache.spark.unsafe.types.UTF8String
    val sigs = sources.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Kernels.simhash64(UTF8String.fromString(r.getString(1))))
    val expected = (for {
      (ia, ha) <- sigs; (ib, hb) <- sigs
      if ia < ib && Kernels.hamming64(ha, hb) <= 3
    } yield (ia, ib)).toSet
    val got = Dedup.d03Simhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty) // the planted near-dups keep this non-vacuous
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("s03 centroid is ragged-safe and partition-independent (zero-padded mean)") {
    import spark.implicits._
    val rows = Seq(
      ("a", Array(2.0f, 4.0f)),
      ("a", Array(4.0f)),       // shorter vector: missing dims = 0
      ("a", Array.empty[Float]) // empty: still counts in n
    )
    for (parts <- Seq(1, 3)) {
      val got = rows.toDF("label", "embedding").repartition(parts)
        .groupBy("label")
        .agg(graft.functions.VectorAgg.centroid_agg(col("embedding")).as("c"))
        .collect()(0).getSeq[Float](1)
      assert(got == Seq(2.0f, 4.0f / 3), s"parts=$parts got=$got")
    }
  }

  test("s01 brute-force ANN: k results, cosine descending, probe excluded") {
    val rows = Similarity.s01BruteForce(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getLong(0) != 0L))
    val cos = rows.map(_.getDouble(1))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
  }

  test("s02 LSH ANN results are a subset of the corpus with valid cosines") {
    val rows = Similarity.s02LshAnn(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(_.getLong(0) != 0L))
  }

  test("s02 LSH ANN recall >= 0.8 of s01's exact top-10") {
    val exact  = Similarity.s01BruteForce(spark, sf).collect().map(_.getLong(0)).toSet
    val approx = Similarity.s02LshAnn(spark, sf).collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall; exact=$exact approx=$approx")
  }

  test("t01 langid: CJK-free corpus never predicts zh; prediction is the score argmax") {
    val rows = TextAnalysis.t01LangId(spark, sf).collect()
    assert(rows.length == sources.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val pred = r.getString(2)
      assert(pred != "zh")
      val scores = Map("en" -> r.getInt(3), "fr" -> r.getInt(4),
        "de" -> r.getInt(5), "es" -> r.getInt(6))
      val best = scores.values.max
      if (best == 0) assert(pred == "und", r.toString)
      else {
        // prediction carries the max score, respecting the fixed
        // en > fr > de > es tie order
        assert(scores(pred) == best, r.toString)
        val tieOrder = Seq("en", "fr", "de", "es")
        assert(tieOrder.indexOf(pred) ==
          tieOrder.indexWhere(l => scores(l) == best), r.toString)
      }
    }
  }

  test("t02 quality: ratios in [0,1], score in [0,1]") {
    TextAnalysis.t02Quality(spark, sf).collect().foreach { r =>
      val punct = r.getDouble(3); val score = r.getDouble(7)
      assert(punct >= 0 && punct <= 1)
      assert(score >= 0 && score <= 1)
    }
  }

  test("t03 tokens: ws_tokens matches independent count for first doc") {
    val doc0 = sources.Tables.documents(spark, sf)
      .filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    val got = TextAnalysis.t03Tokens(spark, sf)
      .filter(col("doc_id") === 0).collect()(0)
    assert(got.getInt(1) == doc0.split(" ", -1).length)
  }

  test("m01 multimodal: real PPM decode, deterministic across two runs") {
    def run() = Multimodal.m01Multimodal(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("width"), r.getAs[Long]("sum_r")))
    val a = run(); val b = run()
    assert(a.sameElements(b))
    assert(a.nonEmpty && a.exists(_._3 != 0L)) // decoded pixels really summed
  }

  test("PPM codec: payload round-trips through the parser; malformed input raises") {
    val payload = Multimodal.ppmPayload(5L)
    val img = Multimodal.decodePpm(payload)
    assert(img.width == 21 && img.height == 21) // 5%64+16, 5%48+16
    assert(img.pixels.length == 21 * 21 * 3)
    // pixel byte i = (doc_id*31 + 7i) mod 256
    assert((0 until img.pixels.length).forall(i =>
      (img.pixels(i) & 0xff) == ((5L * 31 + 7L * i) % 256)))
    // header variants the format allows: comments + extra whitespace
    val commented = ("P6\n# a comment\n21  21\n255\n".getBytes("US-ASCII")
      ++ img.pixels)
    assert(Multimodal.decodePpm(commented).width == 21)
    // malformed input raises, never decodes garbage
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P5\n2 2\n255\n".getBytes ++ new Array[Byte](12))
    }
    intercept[IllegalArgumentException] { // truncated pixel array
      Multimodal.decodePpm(java.util.Arrays.copyOf(payload, payload.length - 1))
    }
  }

  test("PPM resample: nearest-neighbor on a planted 2x2 image") {
    // 2x2 RGB image with distinct corner colors
    val px = Array[Byte](
      10, 11, 12,  20, 21, 22,
      30, 31, 32,  40, 41, 42)
    val img = Multimodal.Ppm(2, 2, px)
    // upscale to 4x4: each source pixel becomes a 2x2 block (sx = x*2/4)
    val up = Multimodal.resampleNn(img, 4, 4)
    assert(up.length == 4 * 4 * 3)
    def at(x: Int, y: Int) = (up((y * 4 + x) * 3) & 0xff)
    assert(at(0, 0) == 10 && at(1, 1) == 10) // top-left block
    assert(at(2, 0) == 20 && at(3, 1) == 20) // top-right block
    assert(at(0, 2) == 30 && at(3, 3) == 40)
    // downscale to 1x1 keeps the top-left pixel (floor mapping)
    val down = Multimodal.resampleNn(img, 1, 1)
    assert((down(0) & 0xff) == 10 && (down(1) & 0xff) == 11)
  }

  test("q23 approx distinct within 5% of exact") {
    val approx = Relational.q23ApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = sources.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx=$a exact=$e")
    }
  }

  test("q21 semi+anti partition the customer table") {
    val rows = Relational.q21SemiAnti(spark, sf).collect()
    assert(rows.length == sources.Tables.customer(spark, sf).count())
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("q25 as-of join: last_click_ts never exceeds the error ts") {
    val rows = Relational.q25AsofJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(3))
        assert(!r.getTimestamp(3).after(r.getTimestamp(2)))
    }
  }

  test("q26 sessionize: inter-session gaps > 30 min; session COUNT matches raw event gaps") {
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val sessions = Relational.q26Sessionize(spark, sf).collect()
    assert(sessions.nonEmpty)
    // session spans are non-overlapping per user and ordered; the
    // boundary is defined in MICROSECONDS (ms truncation could fail a
    // legitimate split at exactly 30 min + a few µs)
    sessions.groupBy(_.getLong(0)).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(micros(b.getTimestamp(2)) - micros(a.getTimestamp(3)) > 1800000000L)
        case _ =>
      }
    }
    // COMPLETE characterization of session counts: per user, sessions
    // = 1 + number of raw inter-event gaps > 30 min (catches an
    // under-splitting sessionizer that the gap check alone cannot)
    val expectedCounts = sources.Tables.events(spark, sf)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), micros(r.getTimestamp(1))))
      .groupBy(_._1)
      .map { case (u, evs) =>
        val ts = evs.map(_._2).sorted
        u -> (1 + ts.zip(ts.tail).count { case (a, b) => b - a > 1800000000L })
      }
    val gotCounts = sessions.groupBy(_.getLong(0)).map { case (u, ss) => u -> ss.length }
    assert(gotCounts == expectedCounts)
  }

  test("s03 centroid matches a hand-folded mean for one label") {
    val rows = sources.Tables.embeddings(spark, sf)
      .filter(col("label") === 0).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val expected = rows.transpose.map(xs => (xs.map(_.toDouble).sum / rows.length).toFloat)
    val got = Similarity.s03Centroids(spark, sf)
      .filter(col("label") === 0).collect()(0)
    assert(got.getLong(1) == rows.length)
    assert(math.abs(got.getDouble(3) - math.rint(expected(0) * 1e5) / 1e5) < 1e-4)
  }

  test("d06 clusters: rep is the component minimum and closed under the pair graph") {
    val pairs = Dedup.d04NgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = Dedup.d06Clusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty)
    labels.foreach { case (doc, rep) => assert(rep <= doc) }
    // both ends of every verified pair share a representative
    pairs.foreach { case (a, b) => assert(labels(a) == labels(b), s"pair ($a,$b)") }
  }

  test("st01 streaming result equals the batch q19 result") {
    val streamed = streaming.StreamQueries.st01StreamWindow(spark, sf).collect()
    val batch = Relational.q19WindowAgg(spark, sf).collect()
    assert(streamed.length == batch.length)
    assert(streamed.map(_.toString).sorted.sameElements(batch.map(_.toString).sorted))
  }

  test("p01 hash split: deterministic, exhaustive, ~90/5/5") {
    val a = Sampling.p01HashSplit(spark, sf).collect().map(r => (r.getLong(0), r.getString(1)))
    val b = Sampling.p01HashSplit(spark, sf).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sameElements(b))
    assert(a.length == sources.Tables.documents(spark, sf).count())
    val frac = a.count(_._2 == "train").toDouble / a.length
    assert(frac > 0.8 && frac < 0.98, s"train fraction $frac")
  }

  test("p02 stratified sample: seed-deterministic, strata all present") {
    val a = Sampling.p02StratifiedSample(spark, sf).collect().map(_.getLong(0))
    val b = Sampling.p02StratifiedSample(spark, sf).collect().map(_.getLong(0))
    assert(a.sameElements(b))
    assert(a.nonEmpty && a.length < sources.Tables.documents(spark, sf).count())
  }

  test("p02 membership is stable under a different partition layout") {
    // the file-header guarantee: assignment is a function of the row,
    // not of partition index/position (what rand(seed)-based sampleBy
    // cannot promise)
    val a = Sampling.p02StratifiedSample(spark, sf).collect().map(_.getLong(0)).toSeq
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    try {
      val b = Sampling.p02StratifiedSample(spark, sf).collect().map(_.getLong(0)).toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("kernel expressions declare input types: double arrays are cast, not misread") {
    // array<double> literals from SQL would otherwise be reinterpreted
    // at a 4-byte stride as garbage floats
    val r = spark.sql(
      "SELECT cosine_sim(array(0.1D, 0.2D, 0.3D), array(0.1D, 0.2D, 0.3D)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-6, s"got $r")
  }

  test("FoldSelfCosine is INJECTED and folds cosine_sim(x, x), matching the kernel on every input") {
    import graft.functions.{cosine_sim, Kernels}
    import org.apache.spark.sql.functions.{array, lit}
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    // non-foldable elements (column-dependent, value-fixed), so this
    // exercises OUR rule — literal arrays would be constant-folded by
    // Catalyst through the kernel before the rule ever ran
    def elem(v: Float) =
      col("r_regionkey").cast("float") * lit(0.0f) + lit(v)
    val cases = Seq(
      Array(1.0f, 2.0f, 3.0f), Array(0.0f, 0.0f),
      Array(Float.NaN, 1.0f), Array(Float.PositiveInfinity))
    val cols = cases.zipWithIndex.map { case (arr, i) =>
      val v = array(arr.map(elem): _*)
      cosine_sim(v, v).as(s"c$i")
    }
    val df = sources.Tables.region(spark, sf).limit(1).select(cols: _*)
    // session built by GraftSession → extensions injected → the
    // OPTIMIZED plan is already folded, with the exists() probes
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("cosine_sim"), optimized.take(400))
    assert(optimized.contains("exists"), optimized.take(400))
    // executing the FOLDED plan agrees with the raw kernel on every
    // input class: non-zero, all-zero, NaN element, Inf element
    val row = df.collect()(0)
    cases.zipWithIndex.foreach { case (arr, i) =>
      val ad = UnsafeArrayData.fromPrimitiveArray(arr)
      val kernel = Kernels.cosine(ad, ad)
      val folded = row.getDouble(i)
      assert(folded == kernel || (folded.isNaN && kernel.isNaN),
        s"case $i: folded=$folded kernel=$kernel")
    }
  }

  test("custom functions reachable from the SQL front") {
    sources.Tables.registerAll(spark, sf)
    val n = spark.sql(
      "SELECT simhash64(text) AS sh FROM documents WHERE simhash64(text) IS NOT NULL").count()
    assert(n == sources.Tables.documents(spark, sf).count())
  }

  test("d04 is COMPLETE: LSH-blocked pairs equal the brute-force jaccard >= 0.8 scan") {
    import graft.functions.{jaccard64, shingles64}
    // the fact that licenses d04/d06's brute-force DuckDB oracles:
    // deterministic (data, seed) LSH recall is total on this corpus
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), shingles64(col("text"), 5).as("sh")) // ShingleN = 5
    val brute = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        jaccard64(col("a.sh"), col("b.sh")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.d04NgramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == brute, s"missed=${(brute -- lsh).size} spurious=${(lsh -- brute).size}")
  }

  test("s04 IVF: cells partition the corpus; all-cell probe is exact; nprobe recall") {
    import spark.implicits._
    import operators.Similarity.Ivf
    import graft.functions.Kernels
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    // planted clusters — the data regime IVF is FOR (the shared
    // embeddings fixture is near-orthogonal noise, where any
    // cell-pruned method honestly degrades toward nprobe/k sampling)
    val rnd = new scala.util.Random(42)
    val dim = 16; val nClusters = 8; val per = 25
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val vecs = for { c <- 0 until nClusters; j <- 0 until per } yield
      ((c * per + j).toLong,
        centers(c).map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    val emb = vecs.toDF("vec_id", "embedding")
    val cents = Ivf.train(emb, nClusters, iters = 4)
    assert(cents.length == nClusters)
    // assignment partitions the corpus into valid cells
    val assigned = Ivf.assign(emb, cents)
    assert(assigned.count() == vecs.size)
    assert(assigned.filter(col("cell") < 0 || col("cell") >= nClusters).count() == 0)
    // brute-force truth for probe vec 0, same kernel driver-side
    val q = vecs.head._2
    def ua(v: Array[Float]) = UnsafeArrayData.fromPrimitiveArray(v)
    val brute = vecs.tail.map { case (id, v) => (id, Kernels.cosine(ua(q), ua(v))) }
      .sortBy { case (id, cos) => (-cos, id) }.take(10).map(_._1).toSet
    val rest = assigned.filter(col("vec_id") =!= 0L)
    // probing ALL cells is exhaustive — identical to brute force
    val allCells = Ivf.topK(rest, cents, q, nprobe = nClusters, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(allCells == brute, s"all-cell probe diverged: $allCells vs $brute")
    // pruned probe keeps high recall on clustered data
    val pruned = Ivf.topK(rest, cents, q, nprobe = 2, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(pruned.intersect(brute).size >= 9,
      s"recall ${pruned.intersect(brute).size}/10 at nprobe=2")
    // training is deterministic (hash-seeded init, fixed rounds)
    assert(Ivf.train(emb, nClusters, iters = 4).map(_.toSeq).toSeq ==
      cents.map(_.toSeq).toSeq)
  }

  test("FrameCache.clear(session) evicts only that session's frames") {
    import operators.FrameCache
    val s2 = spark.newSession() // distinct sessionUUID, shared context
    assert(FrameCache.sessionKey(s2) != FrameCache.sessionKey(spark))
    // DIFFERENT plans per session: the context-wide cacheManager keys
    // cached data by logical-plan equality, so identical plans in two
    // sessions share one cache entry and could not be evicted
    // independently anyway
    val a = FrameCache.getOrBuild(spark, "test/evict") {
      sources.Tables.region(spark, sf).select("r_regionkey")
    }
    val b = FrameCache.getOrBuild(s2, "test/evict") {
      sources.Tables.nation(s2, sf).select("n_nationkey")
    }
    assert(FrameCache.cachedCount(spark) >= 1 && FrameCache.cachedCount(s2) == 1)
    FrameCache.clear(s2)
    assert(FrameCache.cachedCount(s2) == 0, "s2's entry must be gone")
    assert(b.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "evicted frame must be unpersisted")
    // the other session's identical tag is untouched and still cached
    assert(FrameCache.cachedCount(spark) >= 1)
    assert(a.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    FrameCache.clear(spark)
  }

  test("d07 reads STORED corpus signatures: only the new batch evaluates the kernel") {
    val df = Dedup.d07Incremental(spark, sf)
    val planStr = df.queryExecution.executedPlan.toString
    // corpus side: the verify join reads the STORED signature table's
    // sh column off its parquet scan — never a kernel re-evaluation
    assert(planStr.contains("corpus_signatures"),
      "d07 must read the stored corpus signature table:\n" + planStr.take(1500))
    // the batch signature kernel runs EXACTLY ONCE, at construction,
    // into a batch-sized localCheckpoint (r9 optimization): the final
    // plan therefore contains NO signature kernel at all — the bands,
    // the candidate count and the shingle verify all read the
    // materialized batch frame
    assert(!planStr.contains("minhash_sig") && !planStr.contains("shingles64"),
      "no signature kernel may survive into the executed plan:\n" + planStr.take(1500))
    // and no corpus-side (even-parity) document scan sneaks in: every
    // parity comparison in the plan is an odd (new-batch) filter
    val evenComparisons = "% 2\\) = 0".r.findAllIn(planStr).size
    val oddFilters = "NOT \\(\\(\\w+#\\d+L % 2\\) = 0".r.findAllIn(planStr).size
    assert(evenComparisons == oddFilters,
      s"plan must not scan corpus-side documents " +
        s"($evenComparisons parity comparisons, $oddFilters odd)")
    // incremental contract: pairs are corpus(even) x new-batch(odd)
    Dedup.d07Incremental(spark, sf).collect().foreach { r =>
      assert(r.getLong(0) % 2 == 0 && r.getLong(1) % 2 == 1)
    }
  }

  test("d17 incremental clusters: merged map equals the full d06 recompute; corpus side stored-only") {
    val got = Dedup.queries("d17_incremental_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // EXACTNESS: the incremental merge must equal corpus-wide label
    // propagation over corpus+batch — i.e. d06's full map, row for row
    val want = Dedup.queries("d06_dedup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, {
      val g = got.toSet; val w = want.toSet
      s"merged map diverged from full recompute: extra=${(g -- w).take(5)} missing=${(w -- g).take(5)}"
    })
    // d07's discipline on the delta frames: the new-vs-corpus plan
    // reads the STORED signature table and the STORED cluster map —
    // raw document text is scanned only by new-batch (odd) subtrees
    val (nc, nn) = Dedup.d17DeltaFrames(spark, sf)
    val ncPlan = nc.queryExecution.executedPlan.toString // full file paths
    assert(ncPlan.contains("corpus_signatures"),
      "d17 delta must read the stored corpus signature table")
    assert(ncPlan.contains("corpus_cluster_map"),
      "d17 delta must read the stored cluster map, not rebuild it")
    for ((plan, label) <- Seq((ncPlan, "nc"), (nn.queryExecution.executedPlan.toString, "nn"))) {
      // every document scan is a new-batch subtree: Catalyst renders
      // the odd filter as NOT ((doc_id % 2) = 0), so an even (corpus)
      // filter is a parity comparison NOT preceded by NOT — there must
      // be none (the corpus side is stored-only)
      // odd filters may ride on RENAMED id columns too (doc_a/doc_b —
      // constraint inference pushes them through the candidate union)
      val evenComparisons = "% 2\\) = 0".r.findAllIn(plan).size
      val oddFilters = "NOT \\(\\(\\w+#\\d+L % 2\\) = 0".r.findAllIn(plan).size
      assert(evenComparisons == oddFilters,
        s"$label: plan must not scan corpus-side documents " +
          s"($evenComparisons parity comparisons, $oddFilters odd):\n${plan.take(1500)}")
      val textScans = plan.linesIterator
        .count(l => l.contains("FileScan") && l.contains("text#"))
      assert(textScans == 0 || oddFilters > 0,
        s"$label: text scans must be odd-batch-filtered:\n${plan.take(1500)}")
    }
    // and the published output frame reads the stored map (untouched
    // clusters pass through it, never through a rebuild)
    val outPlan = Dedup.queries("d17_incremental_clusters")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(outPlan.contains("corpus_cluster_map"), outPlan.take(1500))
  }

  test("d17 sequential maintenance: two chained batch merges equal the full recompute") {
    import graft.functions.{minhash_sig, shingles64}
    // the production loop: merge batch 1 into the stored map, append
    // its signatures to the corpus table (the write-back), then merge
    // batch 2 against the UPDATED state — the result must equal one
    // corpus-wide recompute over everything (d06 on the whole table)
    def sig(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      minhash_sig(col("text"), 5, 32, 42L).as("sig"),
      shingles64(col("text"), 5).as("sh"))
    val docs = sources.Tables.documents(spark, sf)
    val evenSig = sig(docs.filter(col("doc_id") % 2 === 0))
    val b1Sig = sig(docs.filter(col("doc_id") % 4 === 1))
    val b2Sig = sig(docs.filter(col("doc_id") % 4 === 3))
    val map0 = Dedup.corpusClusterMap(spark, sf) // stored map over the even half
    val map1 = Dedup.mergeDeltaClusters(spark, map0, evenSig, b1Sig)
    val map2 = Dedup.mergeDeltaClusters(spark, map1,
      evenSig.unionByName(b1Sig), b2Sig)
    val got = map2.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Dedup.queries("d06_dedup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, {
      val g = got.toSet; val w = want.toSet
      s"chained merges diverged from the full recompute: " +
        s"extra=${(g -- w).take(5)} missing=${(w -- g).take(5)}"
    })
    // and the one-step odd-batch merge (the driver query) agrees with
    // the two-step chain — batch decomposition cannot change the map
    val oneStep = Dedup.queries("d17_incremental_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(oneStep == got, "batch decomposition must not change the merged map")
  }

  test("d17 write-back: sequential maintenance txns through the catalog, crash + replay safe") {
    import spark.implicits._
    val docs = sources.Tables.documents(spark, sf)
    val root = graft.sources.TableCatalog.tempRoot("graft-d17m")
    val cat = new graft.sources.TableCatalog(spark, root)
    Dedup.d17InitStore(cat,
      Dedup.signatureOf(docs.filter(col("doc_id") % 2 === 0)))
    // two sequential batches through the CATALOG (not frames)
    Dedup.d17Maintain(spark, cat,
      Dedup.signatureOf(docs.filter(col("doc_id") % 4 === 1)), batchId = 1L)
    Dedup.d17Maintain(spark, cat,
      Dedup.signatureOf(docs.filter(col("doc_id") % 4 === 3)), batchId = 2L)
    // the PUBLISHED map equals one corpus-wide recompute (d06's map)
    val got = cat.scan("corpus_cluster_map").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Dedup.queries("d06_dedup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, {
      val g = got.toSet; val w = want.toSet
      s"published map diverged: extra=${(g -- w).take(5)} missing=${(w -- g).take(5)}"
    })
    // the signature table now carries the whole corpus
    assert(cat.scan("corpus_signatures").count() == docs.count())
    // REPLAY (foreachBatch's at-least-once case): same batch id again
    // is a no-op — no version advances, the map is unchanged
    val vSig = cat.currentVersion("corpus_signatures")
    val vMap = cat.currentVersion("corpus_cluster_map")
    Dedup.d17Maintain(spark, cat,
      Dedup.signatureOf(docs.filter(col("doc_id") % 4 === 3)), batchId = 2L)
    assert(cat.currentVersion("corpus_signatures") == vSig, "replay must not re-append")
    assert(cat.currentVersion("corpus_cluster_map") == vMap, "replay must not re-merge")
    // CRASH between steps is impossible by construction: both writes
    // stage inside one txn — simulate a crash (rollback before commit)
    // and prove nothing published, then the re-delivered batch runs
    // fully because its marker never landed
    val b3 = Seq((90001L, "graft spark crash batch one two three four five six"),
      (90003L, "graft spark crash batch one two three four five six"))
      .toDF("doc_id", "text")
    val t = cat.begin()
    t.insert("maintenance_log", Seq(3L).toDF("batch_id"))
    t.insert("corpus_signatures", Dedup.signatureOf(b3))
    t.rollback() // the crash: staged dirs die, nothing published
    assert(cat.currentVersion("corpus_signatures") == vSig, "crash must publish nothing")
    assert(cat.scan("maintenance_log").filter(col("batch_id") === 3L).isEmpty)
    Dedup.d17Maintain(spark, cat, Dedup.signatureOf(b3), batchId = 3L)
    val after = cat.scan("corpus_cluster_map")
      .filter(col("doc_id") >= 90000L).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(after == Seq((90001L, 90001L), (90003L, 90001L)),
      s"re-delivered batch must merge fully after the crash: $after")
  }

  test("LSH degenerate-band guard: verified pairs and clusters unchanged, flood candidates linear") {
    import spark.implicits._
    import graft.functions.jaccard64
    val conf = "spark.graft.lsh.hotBucketLimit"
    val prev = spark.conf.getOption(conf)
    def candsOf(sig: org.apache.spark.sql.DataFrame) =
      Dedup.minhashCandidates(sig.select("doc_id", "sig"))
    def verifiedOf(sig: org.apache.spark.sql.DataFrame,
        cand: org.apache.spark.sql.DataFrame) = cand
      .join(sig.select(col("doc_id"), col("sh")).as("va"),
        col("doc_a") === col("va.doc_id"))
      .join(sig.select(col("doc_id"), col("sh")).as("vb"),
        col("doc_b") === col("vb.doc_id"))
      .filter(jaccard64(col("va.sh"), col("vb.sh")) >= 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sig = Dedup.signatureOf(sources.Tables.documents(spark, sf))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      spark.conf.unset(conf) // default: silent at this SF
      val baseCand = candsOf(sig).count()
      val baseVerified = verifiedOf(sig, candsOf(sig))
      // force the guard ON THE REAL CORPUS (its degenerate band — the
      // low-entropy byte-shingle bucket — holds ~20% of the docs)
      spark.conf.set(conf, "32")
      val capped = candsOf(sig)
      assert(capped.count() < baseCand,
        s"guard must cut candidate volume (base=$baseCand)")
      // EXACTNESS: every brute-true pair survives via intact original
      // bands or the interleaved rescue bands — the verified pair set
      // (hence d04's output and d06/d17's cluster map) is UNCHANGED
      assert(verifiedOf(sig, capped) == baseVerified,
        "the guard must not change the verified pair set")
      // exact-dup FLOOD: every band (and every rescue band) is one
      // giant identical bucket — candidates degrade to STAR pairs:
      // linear volume, verified connectivity preserved
      val flood = (0 until 300).map(i => (200000L + i, ("flood " * 40).trim))
        .toDF("doc_id", "text")
      val fsig = Dedup.signatureOf(flood)
      val n = candsOf(fsig).count()
      assert(n < 3L * 300, s"flood candidates must stay linear, got $n (all-pairs = ${300 * 299 / 2})")
      // the flood still clusters into ONE component labeled by its min
      // (star pairs verify: the members are identical)
      val stored = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_rep")
      val emptySig = Dedup.signatureOf(
        Seq.empty[(Long, String)].toDF("doc_id", "text"))
      val map = Dedup.mergeDeltaClusters(spark, stored, emptySig, fsig)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(map == (0 until 300).map(i => (200000L + i, 200000L)),
        "flood must cluster to one min-labeled component under the guard")
    } finally {
      sig.unpersist()
      prev match {
        case Some(v) => spark.conf.set(conf, v)
        case None    => spark.conf.unset(conf)
      }
    }
  }

  test("min-label propagation converges on a deep CHAIN (pointer jumping), labels exact") {
    import spark.implicits._
    // a 150-hop path graph: successive near-identical revisions of one
    // document, where only ADJACENT pairs verify — per-edge propagation
    // needs 150 rounds (over the 50 cap); pointer jumping needs ~log₂
    val n = 150
    val chain = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    val labels = Dedup.propagateMinLabels(chain)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(labels.toSeq == (0 until n).map(i => (i.toLong, 0L)),
      "every chain member must label to the component minimum")
  }

  test("degenerate-band guard on the incremental probe: cross verified pairs unchanged, flood bounded") {
    import spark.implicits._
    import graft.functions.jaccard64
    val conf = "spark.graft.lsh.hotBucketLimit"
    val prev = spark.conf.getOption(conf)
    val docs = sources.Tables.documents(spark, sf)
    val corpusSig = Dedup.signatureOf(docs.filter(col("doc_id") % 2 === 0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batchSig = Dedup.signatureOf(docs.filter(col("doc_id") % 2 =!= 0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def verifiedCross(cand: org.apache.spark.sql.DataFrame) = cand
      .join(corpusSig.select(col("doc_id"), col("sh")).as("sa"),
        col("corpus_doc") === col("sa.doc_id"))
      .join(batchSig.select(col("doc_id"), col("sh")).as("sb"),
        col("new_doc") === col("sb.doc_id"))
      .filter(jaccard64(col("sa.sh"), col("sb.sh")) >= 0.8)
      .select("corpus_doc", "new_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      spark.conf.unset(conf)
      val baseCand = Dedup.incCandidates(corpusSig, batchSig).count()
      val baseVerified = verifiedCross(Dedup.incCandidates(corpusSig, batchSig))
      spark.conf.set(conf, "32")
      val capped = Dedup.incCandidates(corpusSig, batchSig)
      assert(capped.count() < baseCand,
        s"guard must cut cross candidate volume (base=$baseCand)")
      assert(verifiedCross(capped) == baseVerified,
        "the guard must not change the cross verified pair set")
      // flood: a 300-copy corpus clique probed by 5 identical batch
      // docs — each batch doc star-pairs with the clique's MIN member
      // (one verified edge suffices for d17's connectivity), instead
      // of 5 × 300 junk probes
      val cf = Dedup.signatureOf((0 until 300)
        .map(i => (300000L + 2 * i, ("flood " * 40).trim)).toDF("doc_id", "text"))
      val bf = Dedup.signatureOf((0 until 5)
        .map(i => (400001L + 2 * i, ("flood " * 40).trim)).toDF("doc_id", "text"))
      val fc = Dedup.incCandidates(cf, bf)
      val n = fc.count()
      assert(n <= 8L * 5, s"flood cross candidates must stay linear in the batch, got $n")
      val fv = verifiedCross2(cf, bf, fc)
      assert((0 until 5).forall(i => fv.contains((300000L, 400001L + 2 * i))),
        s"every batch doc must verify against the flood representative: $fv")
    } finally {
      corpusSig.unpersist(); batchSig.unpersist()
      prev match {
        case Some(v) => spark.conf.set(conf, v)
        case None    => spark.conf.unset(conf)
      }
    }
  }

  private def verifiedCross2(corpusSig: org.apache.spark.sql.DataFrame,
      batchSig: org.apache.spark.sql.DataFrame,
      cand: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import graft.functions.jaccard64
    cand
      .join(corpusSig.select(col("doc_id"), col("sh")).as("fa"),
        col("corpus_doc") === col("fa.doc_id"))
      .join(batchSig.select(col("doc_id"), col("sh")).as("fb"),
        col("new_doc") === col("fb.doc_id"))
      .filter(jaccard64(col("fa.sh"), col("fb.sh")) >= 0.8)
      .select("corpus_doc", "new_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("d17 guard: a template-stuck batch folds O(B) rows to the driver, never B² pairs") {
    import spark.implicits._
    import graft.functions.{minhash_sig, shingles64}
    def sig(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      minhash_sig(col("text"), 5, 32, 42L).as("sig"),
      shingles64(col("text"), 5).as("sh"))
    val template = (1 to 40).map(i => s"tpl$i").mkString(" ")
    // a corpus the batch does not match: nc stays empty, isolating nn
    val corpus = Seq((1L, (1 to 40).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val stored = Seq((1L, 1L)).toDF("doc_id", "cluster_rep")
    def merged(batch: org.apache.spark.sql.DataFrame) =
      Dedup.mergeDeltaClusters(spark, stored, sig(corpus), sig(batch))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // REGIME 1 — quadratic-pair batch UNDER the LSH guard's 256 floor:
    // the pair list really is B(B−1)/2, and the distributive
    // pre-collapse is the only thing bounding the driver fold
    val B1 = 200
    val b1 = (0 until B1).map(i => (100000L + i, template)).toDF("doc_id", "text")
    val (_, nn) = Dedup.deltaFrames(stored, sig(corpus), sig(b1))
    assert(nn.count() == B1.toLong * (B1 - 1) / 2,
      "planted batch should be pair-quadratic")
    val fold1 = Dedup.deltaFoldInputs(stored, sig(corpus), sig(b1))
    assert(fold1.unions.isEmpty, "no new-vs-corpus matches planted")
    assert(fold1.nnComps.length == B1,
      s"driver fold must be O(B)=$B1 rows, got ${fold1.nnComps.length}")
    assert(merged(b1) ==
      ((1L, 1L) +: (0 until B1).map(i => (100000L + i, 100000L))).sortBy(_._1))
    // REGIME 2 — a B≈1k flood: the degenerate-band guard caps the
    // candidate stage FIRST (star pairs, linear), the fold stays O(B),
    // and the merged map is still exact — the two guards compose
    val B2 = 1000
    val b2 = (0 until B2).map(i => (200000L + i, template)).toDF("doc_id", "text")
    val (_, nn2) = Dedup.deltaFrames(stored, sig(corpus), sig(b2))
    assert(nn2.count() < 2L * B2,
      s"the band guard must bound a $B2-doc flood's pairs linearly")
    val fold2 = Dedup.deltaFoldInputs(stored, sig(corpus), sig(b2))
    assert(fold2.unions.isEmpty && fold2.nnComps.length == B2,
      s"driver fold must be O(B)=$B2 rows, got ${fold2.nnComps.length}")
    assert(merged(b2) ==
      ((1L, 1L) +: (0 until B2).map(i => (200000L + i, 200000L))).sortBy(_._1))
  }

  test("d17 guard: an nc flood over foldPairLimit pre-collapses distributively, fold stays O(nodes)") {
    import spark.implicits._
    import graft.functions.{minhash_sig, shingles64}
    def sig(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      minhash_sig(col("text"), 5, 32, 42L).as("sig"),
      shingles64(col("text"), 5).as("sh"))
    val template = (1 to 40).map(i => s"tpl$i").mkString(" ")
    // a 200-doc stored corpus the whole batch matches, mapped with
    // IDENTITY reps (legal input: the fold is pure in its frames) so
    // the distinct (new_doc, rep) edge set is B×C — over any small cap
    val C = 200
    val corpus = (0 until C).map(i => (2L * i, template)).toDF("doc_id", "text")
    val stored = (0 until C).map(i => (2L * i, 2L * i)).toDF("doc_id", "cluster_rep")
    val B = 40
    val batch = (0 until B).map(i => (100001L + 2 * i, template)).toDF("doc_id", "text")
    val prev = spark.conf.getOption("spark.graft.d17.foldPairLimit")
    try {
      spark.conf.set("spark.graft.d17.foldPairLimit", "500")
      val fold = Dedup.deltaFoldInputs(stored, sig(corpus), sig(batch))
      // over the cap: the driver sees one union row per NODE (B new
      // docs + C reps), never the B×C distinct edges (nor the raw
      // match pairs) — plus the bounded rep/new-doc universes
      assert(fold.unions.length == B + C,
        s"nc fold must be O(nodes)=${B + C}, got ${fold.unions.length}")
      assert(fold.repMiss.length == C && fold.newDocs.length == B)
      // EXACTNESS through the collapsed path: everything is one
      // component labeled by the corpus minimum (doc 0)
      val got = Dedup.mergeDeltaClusters(spark, stored, sig(corpus), sig(batch))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = ((0 until C).map(i => (2L * i, 0L)) ++
        (0 until B).map(i => (100001L + 2 * i, 0L))).sortBy(_._1)
      assert(got == want, s"collapsed nc fold must stay exact: ${got.take(5)}")
      // and the under-limit route produces the identical map
      spark.conf.set("spark.graft.d17.foldPairLimit", "100000")
      val got2 = Dedup.mergeDeltaClusters(spark, stored, sig(corpus), sig(batch))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got2 == want, "the two fold routes must agree")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.d17.foldPairLimit", v)
      case None    => spark.conf.unset("spark.graft.d17.foldPairLimit")
    }
  }

  test("t07 normalize: exchange keyed on the 8-byte hash, counts exact per canonical") {
    val df = TextAnalysis.t07Normalize(spark, sf)
    // the wide exchange routes on the derived xxhash64 column, never
    // on the canonical text itself (the 100 TB shuffle-key concern)
    val parts = GraftSession.explainPlan(df).linesIterator
      .filter(_.contains("hashpartitioning")).mkString("\n")
    assert(parts.contains("hashpartitioning(h#"), parts)
    assert(!parts.contains("canonical#"), parts)
    // counts agree with an independent driver-side group on the text
    val rows = df.collect()
    val byCanon = rows.groupBy(_.getString(1)).view.mapValues(_.size).toMap
    rows.foreach(r => assert(r.getLong(2) == byCanon(r.getString(1)).toLong))
  }

  test("t07 normalize: NULL texts count each other, never a spurious collision error") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-t07-null").toString
    Seq((1L, "Hello, World!"), (2L, "hello world"),
        (3L, null.asInstanceOf[String]), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.t07Normalize(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows(1L) == 2 && rows(2L) == 2) // same canonical after normalize
    assert(rows(3L) == 2 && rows(4L) == 2) // the two NULLs count each other
  }

  test("t08 tf-idf: ubiquitous terms score 0, df consistent, tf sums to token count") {
    val rows = TextAnalysis.t08TfIdf(spark, sf).collect()
    val nDocs = sources.Tables.documents(spark, sf).count()
    // a term present in every document carries zero information
    rows.filter(_.getInt(3) == nDocs).foreach(r =>
      assert(r.getDouble(4) == 0.0, s"df==N term ${r.getString(1)} must score 0"))
    // df == number of docs the term appears in (recomputed independently)
    val docsPerTerm = rows.groupBy(_.getString(1)).view.mapValues(_.length)
    rows.foreach(r => assert(r.getInt(3) == docsPerTerm(r.getString(1))))
    // sum(tf) == total token count of the corpus (split-on-space)
    val totalTokens = sources.Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(rows.map(_.getInt(2).toLong).sum == totalTokens)
  }

  test("t08/t09 plans: vocabulary df join broadcasts; corpus stats never sort-merge") {
    val t08Plan = GraftSession.explainPlan(TextAnalysis.t08TfIdf(spark, sf))
    assert(t08Plan.contains("BroadcastHashJoin"), "df join must broadcast")
    assert(!t08Plan.contains("SortMergeJoin") && !t08Plan.contains("BroadcastNestedLoopJoin"),
      "the corpus must never shuffle for the df join")
    val t09Plan = GraftSession.explainPlan(TextAnalysis.t09CorpusStats(spark, sf))
    assert(!t09Plan.contains("Join"), "single-table aggregate, no join")
    assert(t09Plan.contains("HashAggregate") || t09Plan.contains("ObjectHashAggregate") ||
      t09Plan.contains("SortAggregate"), "partial aggregation expected")
  }

  test("p04 cap per group: at most 50 per lang, lowest doc_ids kept, deterministic") {
    val rows = Sampling.p04CapPerGroup(spark, sf).collect()
    val byLang = rows.groupBy(_.getString(1))
    byLang.foreach { case (lang, rs) =>
      assert(rs.length <= 50, s"$lang over cap")
      // the kept rows are exactly the group's smallest doc_ids
      val kept = rs.map(_.getLong(0)).sorted
      val expected = sources.Tables.documents(spark, sf)
        .filter(col("lang") === lang).select("doc_id")
        .collect().map(_.getLong(0)).sorted.take(50)
      assert(kept.sameElements(expected), s"$lang must keep the smallest ids")
    }
    val again = Sampling.p04CapPerGroup(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("s05 quantize: codes in [-127,127], error within the half-step bound") {
    val out = Similarity.s05Quantize(spark, sf).collect()
    val spans = sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        (array_max(col("embedding")).cast("double")
          - array_min(col("embedding")).cast("double")).as("span"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, qMin, qMax, maxErr) =
        (r.getLong(0), r.getInt(2), r.getInt(3), r.getDouble(5))
      assert(qMin >= -127 && qMax <= 127, s"vec $id codes out of int8 range")
      // affine SQ8: |x - dequant(quant(x))| <= step/2, step = span/254
      // (+5e-7: max_err is emitted rounded to 6 decimals, which can
      // round it up past the exact bound)
      val bound = spans(id) / 254.0 / 2.0 + 5e-7
      assert(maxErr >= 0.0 && maxErr <= bound,
        s"vec $id max_err $maxErr exceeds half-step $bound")
    }
  }

  test("d16 CDC chunk dedup: chunks cover each doc; shift-robust; groups partition with argmin reps") {
    import org.apache.spark.unsafe.types.UTF8String
    val rows = Dedup.queries("d16_cdc_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4),
        r.getLong(5), r.getInt(6), r.getLong(7)))
    assert(rows.nonEmpty)
    val texts = sources.Tables.documents(spark, sf)
      .filter("text IS NOT NULL").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def kb(t: String) = graft.functions.Kernels
      .cdcBounds(UTF8String.fromString(t), 6, 16, 256).toLongArray()
    def kh(t: String) = graft.functions.Kernels
      .cdcHashes(UTF8String.fromString(t), 6, 16, 256).toLongArray()
    // per-doc: query rows equal the kernel recompute, and the chunks
    // PARTITION the byte range (start 0, contiguous, total = n_bytes)
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      val wantB = kb(texts(id)); val wantH = kh(texts(id))
      assert(sorted.map(c => ((c._3.toLong << 20) | c._4, c._5)).toSeq ==
        wantB.zip(wantH).toSeq, s"doc $id: chunks must match the kernel")
      assert(sorted.head._3 == 0, s"doc $id: first chunk starts at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3, s"doc $id: gap in chunks")
        case _ =>
      }
      assert(sorted.map(_._4).sum ==
        UTF8String.fromString(texts(id)).numBytes(), s"doc $id: coverage")
    }
    // groups partition; rep is the packed argmin member
    val byHash = rows.groupBy(_._5)
    byHash.foreach { case (_, g) =>
      assert(g.head._8 == g.length.toLong && g.map(_._8).distinct.length == 1)
      val rep = g.map(x => (x._1, x._2)).min
      assert(g.forall(x => (x._6, x._7) == rep), "rep must be the argmin member")
    }
    assert(byHash.exists(_._2.map(_._1).distinct.length >= 2),
      "cross-document duplicate chunks exist on this corpus")
    // THE CDC CLAIM, measured: on a long text, chunk hashes survive a
    // prefix insertion AND a mid-document insertion almost entirely —
    // fixed windows would lose every window past the edit
    val long = texts.toSeq.sortBy(_._1).map(_._2).mkString(" ")
    val h0 = kh(long).toSeq
    val hPre = kh("xq7 padded prefix " + long).toSet
    val mid = long.length / 2
    val hMid = kh(long.take(mid) + " EDITED SPAN " + long.drop(mid)).toSet
    val sPre = h0.count(hPre).toDouble / h0.size
    val sMid = h0.count(hMid).toDouble / h0.size
    info(f"d16 chunk-hash survival: prefix $sPre%.4f, mid-edit $sMid%.4f (${h0.size} chunks)")
    assert(sPre >= 0.95 && sMid >= 0.95,
      s"content-defined chunking must re-sync after edits: $sPre / $sMid")
  }

  test("d15 bloom decontamination: identical to d08; prune sound (no false negatives) and effective") {
    val got = Dedup.queries("d15_bloom_decontaminate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    val want = Dedup.queries("d08_decontaminate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == want, "the bloom gate must be a lossless prune: output == d08")
    assert(got.nonEmpty, "contamination exists on this corpus")
    // prune observability on the flagged gram stream
    val (flagged, _) = Dedup.d15Flagged(spark, sf)
    val agg = flagged.agg(
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(col("mc"), 1L).otherwise(0L))).head()
    val (nTrain, nHits) = (agg.getLong(0), agg.getLong(1))
    // soundness: every truly-shared (doc, gram) row is a filter hit —
    // otherwise d15 would have lost it before exact verification; the
    // equality above already implies it, but assert the count relation
    val nTrue = got.map(_._2.toLong).sum
    assert(nHits >= nTrue, s"false negatives: $nHits hits < $nTrue true shared grams")
    // effectiveness: ≈0.5% true + ≈1% fp on this corpus; generous cap
    assert(nHits < nTrain / 20,
      s"filter passed $nHits of $nTrain grams — prune not effective")
    info(s"d15 prune: $nHits of $nTrain train grams reach the exact join " +
      f"(${100.0 * nHits / nTrain}%.2f%%, $nTrue truly shared)")
  }

  test("d08 decontaminate matches a brute-force 8-gram overlap scan") {
    val texts = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams8(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 8) Set.empty
      else w.sliding(8).map(_.mkString(" ")).toSet
    }
    val evalGrams = texts.collect { case (id, t) if id % 20 == 0 => grams8(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    val expected = texts.collect {
      case (id, t) if id % 20 != 0 =>
        id -> (grams8(t) & evalGrams).size
    }.filter(_._2 > 0)
    val got = Dedup.d08Decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected.toMap, "contaminated doc set must equal brute force")
    assert(got.keys.forall(_ % 20 != 0), "eval docs must never be flagged")
  }

  test("d08 plan: eval grams broadcast; corpus side never shuffles into the join") {
    val plan = GraftSession.explainPlan(Dedup.d08Decontaminate(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), "eval side must broadcast")
    assert(!plan.contains("SortMergeJoin"), "the corpus side must not shuffle to join")
  }

  test("d09 containment equals the brute-force substring scan (winnowing recall is total)") {
    val texts = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = (for {
      (a, ta) <- texts.toSeq; (b, tb) <- texts.toSeq
      if a != b && tb.contains(ta)
    } yield (a, b)).toSet
    val got = Dedup.d09Containment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, "containment pairs must equal brute force")
    assert(got.nonEmpty, "corpus has exact dups, so containment pairs must exist")
  }

  test("t10 repetition stats match a per-doc recount; flags are consistent") {
    val out = TextAnalysis.t10Repetition(spark, sf).collect()
    val texts = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val grams = texts(id).split(" ", -1).sliding(2).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).map(_._2.size)
      assert(r.getInt(1) == grams.size, s"doc $id total")
      assert(r.getInt(2) == counts.size, s"doc $id distinct")
      val dupFrac = (grams.size - counts.size).toDouble / grams.size
      val topFrac = counts.max.toDouble / grams.size
      assert(math.abs(r.getDouble(3) - BigDecimal(dupFrac)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
      assert(math.abs(r.getDouble(4) - BigDecimal(topFrac)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
      assert((r.getInt(5) == 1) == (dupFrac <= 0.2 && topFrac <= 0.1), s"doc $id keep flag")
    }
  }

  test("p05 mixture: exact class quotas, PRF-ranked selection, deterministic") {
    val rows = Sampling.p05Mixture(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val budget = docs.length.toLong * 40 / 100
    val quota = Map("web" -> budget * 25 / 100, "curated" -> budget * 75 / 100)
    val byClass = rows.groupBy(_._3)
    quota.foreach { case (c, q) =>
      assert(byClass.get(c).map(_.length.toLong).getOrElse(0L) == q,
        s"class $c must hit its quota exactly")
    }
    // expected selection: rank by (LCG PRF, doc_id) within class
    def cls(src: String) = if (src.drop(3).toInt < 10) "web" else "curated"
    def prf(id: Long) = (id * 1103515245L + 12345L) % 2147483648L
    val expected = docs.groupBy(d => cls(d._2)).toSeq.flatMap { case (c, ds) =>
      ds.sortBy(d => (prf(d._1), d._1)).take(quota(c).toInt).toSeq
    }.map(_._1).toSet
    assert(rows.map(_._1).toSet == expected, "selected ids must be the PRF-rank winners")
    val again = Sampling.p05Mixture(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.sameElements(again), "must be deterministic")
  }

  test("q46 histogram: buckets partition the table, bounds inside bucket ranges") {
    val rows = Relational.q46Histogram(spark, sf).collect()
    val total = sources.Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "bucket counts must partition all rows")
    rows.foreach { r =>
      val (b, lo, hi) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
      assert(lo >= b * 5000.0 && hi < (b + 1) * 5000.0 && lo <= hi,
        s"bucket $b bounds [$lo,$hi] must lie in its range")
    }
    assert(rows.map(_.getLong(0)).sorted.sameElements(rows.map(_.getLong(0))),
      "buckets ordered")
  }

  test("q47 percentiles: monotone across quantiles, p50 equals q36's median") {
    val rows = Relational.q47Percentiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    rows.foreach { case (f, p25, p50, p75, p90) =>
      assert(p25 <= p50 && p50 <= p75 && p75 <= p90, s"flag $f quantiles must be monotone")
    }
    val medians = Relational.q36Median(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    rows.foreach { case (f, _, p50, _, _) =>
      assert(p50 == medians(f), s"flag $f p50 must equal the q36 exact median")
    }
  }

  test("d10 edit distance runs on exactly d04's verified pairs; ratio bounded") {
    val d10 = Dedup.queries("d10_editdist")(spark, sf).collect()
    val d04 = Dedup.d04NgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d10.map(r => (r.getLong(0), r.getLong(1))).toSet == d04,
      "d10 pairs must be the d04 candidate-verified set — never all pairs")
    d10.foreach { r =>
      val (lev, ratio) = (r.getInt(3), r.getDouble(4))
      assert(lev >= 0 && ratio >= 0.0 && ratio <= 1.0,
        "levenshtein over 120-char heads is bounded by the longer head")
    }
  }

  test("p07 pack sequences: exclusive prefix sum exact; pack arithmetic consistent") {
    val df = Sampling.p07PackSequences(spark, sf)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // recompute the exclusive prefix sum single-threaded in doc_id order
    var run = 0L
    rows.sortBy(_._1).foreach { case (id, n, before, pid, off, pidEnd) =>
      assert(before == run, s"doc $id tokens_before must be the global prefix sum")
      assert(pid == before >> 8 && off == before % 256 && pidEnd == (before + n - 1) >> 8,
        s"doc $id pack arithmetic must be shift/mod of the prefix sum")
      run += n
    }
    // the corpus-sized window is partitioned by bucket, never a global sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(pid"),
      "per-doc prefix window must hash-partition on the bucket id")
  }

  test("t11 chunk: stride/width reconstruction for one doc; coverage exact") {
    val chunks = TextAnalysis.t11Chunk(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1))).toMap
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(chunks.keySet == docs.keySet, "every doc chunks")
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val expected = (0 until toks.length by 24).zipWithIndex.map { case (st, i) =>
        (i, toks.slice(st, st + 32).mkString(" "), math.min(toks.length - st, 32))
      }
      val got = chunks(id).map(r => (r.getInt(1), r.getString(2), r.getInt(3))).toSeq
      assert(got == expected, s"doc $id chunks must be the 32/24 sliding windows")
    }
  }

  test("t12 blocklist: hits equal a plain scala contains scan; keep consistent") {
    val rows = TextAnalysis.t12Blocklist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val phrases = TextAnalysis.blockPhrases
    rows.foreach { case (id, n, matched, keep) =>
      val expected = phrases.filter(docs(id).contains)
      assert(matched == expected.mkString("|") && n == expected.length,
        s"doc $id matched list must equal the direct scan")
      assert(keep == (if (expected.isEmpty) 1 else 0), s"doc $id keep flag")
    }
    assert(rows.exists(_._2 > 0), "corpus must exercise at least one hit")
  }

  test("t12b AC blocklist: equals t12 on the shared list; 10⁴ generated phrases equal the literal probe and scan faster") {
    // identical contract on the production list
    val ac0 = TextAnalysis.queries("t12b_blocklist_ac")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3))).toSeq
    val lit0 = TextAnalysis.t12Blocklist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3))).toSeq
    assert(ac0 == lit0, "AC and literal-probe formulations must answer identically")

    // the scale claim, on a GENERATED 10⁴-phrase list: ~200 phrases
    // are real substrings of corpus documents (guaranteed hits), the
    // rest deterministic gibberish (guaranteed misses)
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val planted = docs.filter(_._2.length > 40).take(200).zipWithIndex.map {
      case ((_, t), i) =>
        val off = (i * 13) % (t.length - 20)
        t.substring(off, off + 12 + (i % 6))
    }
    val noise = (0 until 9800).map { i =>
      val rnd = new scala.util.Random(i * 2654435761L)
      (0 until 10 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString + "qzx" // suffix keeps accidental hits implausible
    }
    val phrases: Seq[String] = (planted ++ noise).distinct.toSeq
    val corpus = sources.Tables.documents(spark, sf).select("doc_id", "text")
    // replicated corpus for the TIMING comparison: per-query fixed cost
    // (plan + codegen, ~0.5 s) would otherwise mask the per-byte
    // asymptotics this spec exists to demonstrate
    val timingCorpus = corpus.crossJoin(
      spark.range(4).select(col("id").as("rep"))).select(col("text"))

    import org.apache.spark.sql.functions.{filter => afilter, typedLit}
    def acCol = graft.functions.multi_contains(col("text"), phrases)
    def litCol = afilter(typedLit(phrases), p => col("text").contains(p))

    // equality of the full matched sets
    val acHits = corpus.select(col("doc_id"), acCol.as("h")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val litHits = corpus.select(col("doc_id"), litCol.as("h")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).map(p => phrases.indexOf(p)).toSeq).toMap
    assert(acHits == litHits, "matched sets must be identical at 10⁴ phrases")
    assert(acHits.values.exists(_.nonEmpty), "planted phrases must hit")

    // the complexity claim: O(text) automaton vs O(phrases·text) probe
    def time(body: => Unit): Double = {
      body // warm
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val tAc = time(timingCorpus.select(sum(size(acCol))).collect(): Unit)
    val tLit = time(timingCorpus.select(sum(size(litCol))).collect(): Unit)
    info(f"10k-phrase scan: AC $tAc%.3f s vs literal probe $tLit%.3f s (${tLit / tAc}%.1f×)")
    assert(tLit / tAc >= 3.0,
      f"AC must scan substantially faster at 10⁴ phrases ($tAc%.3f vs $tLit%.3f)")
  }

  test("s07 filtered ANN: pre-filter exact over the allowed subset, predicate pushed") {
    val df = Similarity.queries("s07_ann_filtered")(spark, sf)
    val rows = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(rows.length == 10 && rows.forall(r => Set(2, 5, 7)(r._2)),
      "k results, all from allowed labels")
    assert(rows.map(_._3).sliding(2).forall(p => p.head >= p.last), "cos descending")
    // equals post-filtering the FULL exact ranking (proves no recall loss)
    val full = sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") =!= 0)
      .crossJoin(org.apache.spark.sql.functions.broadcast(
        sources.Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
          .select(col("embedding").as("qv"))))
      .select(col("vec_id"), col("label"),
        graft.functions.cosine_sim(col("embedding"), col("qv")).as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val expected = full.filter(r => Set(2, 5, 7)(r._2))
      .sortBy(r => (-r._3, r._1)).take(10).map(_._1).toSet
    assert(rows.map(_._1).toSet == expected,
      "pre-filtered top-k must equal the post-filtered exact ranking")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("In(label"),
      "label predicate must reach the parquet scan")
  }

  test("s08 two-stage rerank: high recall vs exact top-k, wide coarse boundary") {
    val got = Similarity.queries("s08_ann_rerank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 10)
    val exact = Similarity.queries("s01_ann_brute")(spark, sf).collect()
      .map(r => r.getLong(0)).toSet
    val recall = got.map(_._1).count(exact) / 10.0
    assert(recall >= 0.9, s"SQ8 coarse pass must retain the exact top-k (recall=$recall)")
    // the candidate-cut robustness claim: the gap between the 50th and
    // 51st coarse scores must dwarf any engine float-fold delta
    val coarse = {
      import org.apache.spark.sql.functions._
      val q = sources.Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      sources.Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("embedding"),
          array_min(col("embedding")).cast("double").as("mn"),
          array_max(col("embedding")).cast("double").as("mx"))
        .withColumn("span", greatest(col("mx") - col("mn"), lit(1e-12)))
        .withColumn("qcode", transform(col("embedding"), x =>
          (round((x.cast("double") - col("mn")) * 254.0 / col("span")) - lit(127)).cast("int")))
        .withColumn("coarse", aggregate(
          zip_with(col("qcode"), typedLit(q), (c, p) =>
            (col("mn") + (c + lit(127)).cast("double") * col("span") / 254.0) * p.cast("double")),
          lit(0.0), (acc, x) => acc + x))
        .select("coarse").collect().map(_.getDouble(0)).sortBy(-_)
    }
    assert(coarse(49) - coarse(50) > 1e-9,
      s"coarse cut boundary too tight: ${coarse(49) - coarse(50)}")
  }

  test("q64 topK per group: custom plan node equals the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val df = Relational.q64TopNPerGroup(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial") && plan.contains("TopKPerGroupFinal"),
      "the custom strategy must plan partial+final exec nodes:\n" + plan.take(600))
    val pIdx = plan.indexOf("TopKPerGroupPartial")
    val fIdx = plan.indexOf("TopKPerGroupFinal")
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    assert(fIdx < exIdx && exIdx < pIdx,
      "exactly one hash exchange BETWEEN final and partial (tree prints parent-first)")
    assert(!plan.contains("Sort ") || plan.indexOf("Sort ") < fIdx,
      "no sort below the operator - the heap replaces it")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expect = sources.Tables.orders(spark, sf)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == expect.length && got.sameElements(expect),
      s"custom top-k (${got.length}) must equal the window formulation (${expect.length})")
    // partition-layout independence: a hostile repartition changes nothing
    val re = Scale.topKPerGroup(
        sources.Tables.orders(spark, sf).repartition(13, col("o_orderkey")),
        Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(re.sameElements(expect), "result must not depend on input partitioning")
    // the map-side cut is real: the partial emits at most groups*k rows
    // per input partition into the exchange (here far fewer than input)
    // AQE hides exec nodes inside query stages: traverse through them
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allNodes(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allNodes(s.plan)
        case _ => Nil
      }
      p +: (p.children.flatMap(allNodes) ++ inner)
    }
    val partialNode = allNodes(df.queryExecution.executedPlan).collectFirst {
      case p: graft.plans.TopKPerGroupExec if p.partial => p
    }.get
    val emitted = partialNode.metrics("numOutputRows").value
    val inputRows = sources.Tables.orders(spark, sf).count()
    assert(emitted > 0 && emitted <= expect.length.toLong *
      spark.sparkContext.defaultParallelism,
      s"partial emitted $emitted rows")
    assert(emitted < inputRows,
      s"partial must discard rows before the shuffle ($emitted vs $inputRows input)")
  }

  test("topK per group: group-cardinality ceiling degrades to pass-through, result unchanged") {
    import org.apache.spark.sql.expressions.Window
    // orders has ~1500 distinct custkeys at sf0.001 — a ceiling of 16
    // forces nearly every group past the partial's heap map
    def run(): Array[(Long, Long, Double)] = Scale.topKPerGroup(
        sources.Tables.orders(spark, sf),
        Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = run() // default ceiling: no degradation
    spark.conf.set("spark.graft.topk.maxGroupsPerTask", "16")
    try {
      // metrics live on the EXECUTED frame's plan — derive the sorted
      // frame first and traverse that same frame after collecting it
      val df = Scale.topKPerGroup(
        sources.Tables.orders(spark, sf),
        Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.sameElements(expect),
        "ceiling degradation must not change the selected rows")
      // the degradation is OBSERVABLE: pass-through rows were emitted
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val inner = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            allNodes(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            allNodes(s.plan)
          case _ => Nil
        }
        p +: (p.children.flatMap(allNodes) ++ inner)
      }
      val partialNode = allNodes(df.queryExecution.executedPlan).collectFirst {
        case p: graft.plans.TopKPerGroupExec if p.partial => p
      }.get
      assert(partialNode.maxGroups == 16)
      assert(partialNode.metrics("passThroughRows").value > 0,
        "ceiling of 16 over ~1500 groups must record pass-through rows")
    } finally spark.conf.unset("spark.graft.topk.maxGroupsPerTask")
    // while a run under the DEFAULT ceiling records none
    val clean = Relational.q64TopNPerGroup(spark, sf)
    clean.collect()
    def allNodes2(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allNodes2(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allNodes2(s.plan)
        case _ => Nil
      }
      p +: (p.children.flatMap(allNodes2) ++ inner)
    }
    val cleanPartial = allNodes2(clean.queryExecution.executedPlan).collectFirst {
      case p: graft.plans.TopKPerGroupExec if p.partial => p
    }.get
    assert(cleanPartial.metrics("passThroughRows").value == 0)
  }

  test("topK per group: ambiguous column names throw instead of binding the first match") {
    val o = sources.Tables.orders(spark, sf).select("o_custkey", "o_orderkey", "o_totalprice")
    // a self-join carries TWO o_totalprice attributes
    val joined = o.join(o.withColumnRenamed("o_orderkey", "rhs_key"), Seq("o_custkey"))
    val e = intercept[IllegalArgumentException] {
      Scale.topKPerGroup(joined, Seq("o_custkey"), Seq(("o_totalprice", false)), 1)
    }
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
  }

  test("q65 MAD: robust deviation matches a direct recompute") {
    val rows = Relational.q65Mad(spark, sf).collect()
    val li = sources.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else {
        // type-7 interpolation at the exact midpoint = plain average
        (s(s.length / 2 - 1) + s(s.length / 2)) / 2
      }
    }
    rows.foreach { r =>
      val g = li.filter(_._1 == r.getString(0)).map(_._2).toSeq
      val med = medianOf(g)
      val mad = medianOf(g.map(x => math.abs(x - med)))
      assert(math.abs(r.getDouble(1) - med) < 1e-3, s"${r.getString(0)} median")
      assert(math.abs(r.getDouble(2) - mad) < 1e-3, s"${r.getString(0)} mad")
    }
  }

  test("q65 sketch-bracketed selection is bit-identical to the percentile aggregate") {
    import org.apache.spark.sql.functions.{abs, broadcast, first, lit, percentile, round}
    // the round-10 rewrite must reproduce the original two-aggregate
    // percentile formulation EXACTLY (the DuckDB oracle pins it):
    // same rows, bitwise-equal doubles, on the real table
    val got = Relational.q65Mad(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val med = sources.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("med"))
    val want = sources.Tables.lineitem(spark, sf)
      .join(broadcast(med), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(round(first(col("med")), 4).as("median_price"),
        round(percentile(abs(col("l_extendedprice") - col("med")), lit(0.5)), 4)
          .as("mad"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == want, s"selection diverged from the aggregate:\n$got\n$want")
    // and Scale.exactPctl agrees with the aggregate at several
    // percentiles, including group sizes where pos is integral
    Seq(0.25, 0.5, 0.75, 0.9).foreach { p =>
      val byAgg = sources.Tables.lineitem(spark, sf).groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"), lit(p))).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val bySel = Scale.exactPctl(spark,
        sources.Tables.lineitem(spark, sf).select(col("l_returnflag"), col("l_quantity")),
        "l_returnflag", col("l_quantity"), p)
      assert(bySel == byAgg, s"p=$p: $bySel vs $byAgg")
    }
  }

  test("q66 funnel: conversion per user matches a direct event walk") {
    val rows = Relational.q66Funnel(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getTimestamp(1), Option(r.getTimestamp(2)),
        r.getBoolean(3))).toMap
    val ev = sources.Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val byUser = ev.groupBy(_._1)
    byUser.foreach { case (u, g) =>
      val clicks = g.filter(_._2 == "click").map(_._3)
      if (clicks.isEmpty) assert(!rows.contains(u), s"user $u: no click, no funnel row")
      else {
        val fc = clicks.min
        val fp = g.filter(x => x._2 == "purchase" && !x._3.before(fc)).map(_._3)
          .sorted.headOption
        val (gfc, gfp, conv) = rows(u)
        assert(gfc == fc && gfp == fp && conv == fp.isDefined,
          s"user $u funnel mismatch")
      }
    }
  }

  test("q67 retention: day-0 actives equal the cohort size") {
    val rows = Relational.q67Retention(spark, sf).collect()
      .map(r => (String.valueOf(r.get(0)), r.getInt(1), r.getLong(2)))
    val cohortSizes = sources.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.date_trunc("day",
        org.apache.spark.sql.functions.min(col("ts"))).as("c"))
      .groupBy("c").count().collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val day0 = rows.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    assert(day0 == cohortSizes, "every cohort member is active on their first day")
    assert(rows.forall(_._2 >= 0), "activity can never precede the cohort day")
  }

  test("q69 skew join: salted plan shuffles on (key, salt); result equals plain join") {
    val df = Relational.q69SkewJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_salt"),
      "the salt column must participate in the join:\n" + plan.take(500))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = Relational.q07JoinInner(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.sameElements(plain), "salting must not change inner-join semantics")
  }

  test("s10 kNN graph: custom top-k node, no self edges, recall vs brute force") {
    val df = Similarity.queries("s10_knn_graph")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial"),
      "per-vector top-k must run through the custom node")
    val edges = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(edges.forall(e => e._1 != e._2), "no self edges")
    edges.groupBy(_._1).foreach { case (srcId, g) =>
      assert(g.length <= 5, s"src $srcId: at most k neighbors")
      assert(g.map(_._2).distinct.length == g.length, s"src $srcId: distinct dsts")
    }
    // recall vs the exact graph (brute force over the collected vectors)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val all = sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val ids = all.map(_._1)
    val vecs = all.toMap
    var hit = 0; var total = 0
    val got = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    ids.foreach { src =>
      val exact = ids.filter(_ != src)
        .map(o => (o, cos(vecs(src), vecs(o))))
        .sortBy { case (o, c) => (-c, o) }.take(5).map(_._1).toSet
      val approx = got.getOrElse(src, Set.empty)
      hit += exact.count(approx); total += exact.size
    }
    val recall = hit.toDouble / total
    // floor 0.85: the IVF seed alone measures ~0.59; the convergence-
    // driven NN-descent (new-edge rate < ε, cap 3) buys the rest
    assert(recall >= 0.85, s"kNN graph recall $recall below floor")
    info(s"s10 kNN graph recall vs brute force: $recall")
    // the round count must have come from the DATA (the convergence
    // rule demanded at least a second round on this corpus) and
    // respected the cap
    val rounds = Similarity.s10RefineRoundsRun
    assert(rounds >= 2 && rounds <= 3, s"refine rounds $rounds not data-driven")
    info(s"s10 NN-descent rounds run: $rounds")
  }

  test("e05 curate+select+pack: survivors = e04 survivors ∩ DSIR keeps; prefix sum exact") {
    val rows = operators.Pipeline.e05CurateSelectPack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val e04Ids = operators.Pipeline.e04CuratePack(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val dsirKeeps = TextAnalysis.queries("t18_dsir_importance")(spark, sf)
      .collect().filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == (e04Ids & dsirKeeps),
      "selection must compose: e04's curated set intersected with DSIR keeps")
    assert(rows.nonEmpty && rows.length < e04Ids.size,
      "the DSIR pass must reject some of e04's survivors")
    // exclusive prefix sum in doc_id order over the selected set
    var acc = 0L
    rows.foreach { case (_, n, before, pack) =>
      assert(before == acc, "exclusive prefix sum")
      assert(pack == before >> 8, "pack id = tokens_before / 256")
      acc += n
    }
  }

  test("e06 quality cascade: equals the intersection of its three stage queries; pack exact") {
    val rows = operators.Pipeline.e06QualityCascadePack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val gopher = TextAnalysis.t23GopherRules(spark, sf)
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val nb = TextAnalysis.t22NbQuality(spark, sf)
      .filter(col("pred_trusted")).select("doc_id").collect().map(_.getLong(0)).toSet
    val ppl = TextAnalysis.t21PerplexityBucket(spark, sf)
      .filter(col("bucket") =!= "tail").select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val passAll = docs.filter(x => gopher(x._1) && nb(x._1) && ppl.contains(x._1))
    val keepers = passAll.groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet
    val expectIds = passAll.map(_._1).filter(keepers).sorted
    assert(rows.map(_._1).toSeq == expectIds.toSeq,
      "cascade survivors must be exactly gopher ∩ NB ∩ non-tail, text-deduped")
    rows.foreach { case (id, b, _, _, _) =>
      assert(ppl(id) == b, s"doc $id: bucket must ride through from t21")
    }
    assert(rows.nonEmpty, "the cascade keeps something")
    assert(rows.length < docs.length, "the cascade rejects something")
    // exclusive prefix sum in doc_id order over the survivor set
    var acc = 0L
    rows.foreach { case (_, _, n, before, pack) =>
      assert(before == acc, "exclusive prefix sum")
      assert(pack == before >> 8, "pack id = tokens_before / 256")
      acc += n
    }
  }

  test("e07 stored-score cascade: row-identical to e06; the plan reads stored columns only") {
    val e7 = operators.Pipeline.e07CascadeStored(spark, sf)
    val plan = GraftSession.explainPlan(e7)
    assert(!plan.contains("Generate"),
      "no feature explode on the stored path:\n" + plan.take(400))
    assert(!plan.toLowerCase.contains("percentile"),
      "no threshold aggregate on the stored path")
    assert(!plan.contains("documents.parquet"),
      "the recurring cascade must not rescan the corpus")
    val a = e7.collect().map(_.toSeq).toSeq
    val b = operators.Pipeline.e06QualityCascadePack(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b, "stored-score cascade must reproduce e06 exactly")
    assert(a.nonEmpty)
  }

  test("e09 mixture manifest: re-derives from e07's survivor set; shares well-formed") {
    val got = operators.Pipeline.queries("e09_mixture_manifest")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // independent derivation: e07's survivor ids + the raw documents
    // table's provenance columns
    val surv = operators.Pipeline.queries("e07_cascade_stored")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))) // (doc_id, n_tokens)
    val prov = sources.Tables.documents(spark, sf)
      .select("doc_id", "lang", "source").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val cells = surv.groupBy(s => prov(s._1))
    val totDocs = surv.length.toLong
    val totToks = surv.map(_._2).sum
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = cells.map { case (k, ds) =>
      val toks = ds.map(_._2).sum
      k -> (ds.length.toLong, toks,
        r6(ds.length.toDouble / totDocs), r6(toks.toDouble / totToks))
    }
    assert(got == expect, "manifest must re-derive from e07 survivors + provenance")
    assert(got.size >= 2, "more than one provenance cell")
    // shares are shares: each in (0,1], rounded sums land within rounding slack
    assert(got.values.forall(v => v._3 > 0 && v._3 <= 1 && v._4 > 0 && v._4 <= 1))
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-3)
    assert(math.abs(got.values.map(_._4).sum - 1.0) < 1e-3)
  }

  test("e10 snapshot diff: statuses re-derive from the version-chain rules; all three present") {
    val got = operators.Pipeline.queries("e10_snapshot_diff")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    // the staged chain's rules, replayed driver-side
    val idText = sources.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    val ids = idText.map(_._1)
    val expect = idText.flatMap { case (id, text) =>
      val inOld = id % 7 != 3
      val inNew = id % 11 != 5
      (inOld, inNew) match {
        case (false, true) => Some(id -> "added")
        case (true, false) => Some(id -> "removed")
        // a null-text doc "edited" stays null: unchanged, absent
        case (true, true) if id % 13 == 6 && text != null => Some(id -> "changed")
        case _ => None // unchanged or added-then-deleted: absent
      }
    }.toMap
    assert(got == expect, "diff must replay the staged version chain exactly")
    assert(Set("added", "removed", "changed").subsetOf(got.values.toSet))
    // a doc both late-added and taken down appears NOWHERE (never in
    // either compared snapshot)
    val ghost = ids.find(id => id % 7 == 3 && id % 11 == 5)
    ghost.foreach(id => assert(!got.contains(id), s"ghost doc $id must be absent"))
    // token deltas: changed docs gained exactly one token ('edited ' prefix)
    val changedRow = operators.Pipeline.queries("e10_snapshot_diff")(spark, sf)
      .filter("status = 'changed' AND n_tokens_old IS NOT NULL").collect()
    assert(changedRow.nonEmpty)
    changedRow.foreach(r =>
      assert(r.getLong(3) == r.getLong(2) + 1, s"edit must add one token: $r"))
  }

  test("t19 BPE training: learned merges equal a reference driver-side implementation") {
    val got = TextAnalysis.queries("t19_bpe_train")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got.length == 10 && got.map(_._1) == (1 to 10))
    // reference BPE (Sennrich et al. 2016) over the same word-frequency
    // table: greedy argmax pair, left-to-right non-overlapping merge
    val words = sources.Tables.documents(spark, sf)
      .select(operators.TextAnalysis.termCol).groupBy("term").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var segs: Seq[(Vector[String], Long)] =
      words.map { case (w, f) => (w.map(_.toString).toVector :+ "</w>", f) }.toSeq
    val expect = (1 to 10).map { rank =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      segs.foreach { case (seg, f) =>
        seg.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) += f
          case _ => ()
        }
      }
      val ((l, r), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      segs = segs.map { case (seg, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < seg.length) {
          if (i + 1 < seg.length && seg(i) == l && seg(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += seg(i); i += 1 }
        }
        (out.result(), f)
      }
      (rank, l, r, n)
    }
    assert(got == expect,
      s"merge sequences differ:\n got=$got\n exp=$expect")
    // the batched trainer paid FEWER Spark rounds than merges while
    // producing the sequential reference's exact table (asserted just
    // above) — the proof the batch-safety rule is both sound and live
    val rounds = operators.TextAnalysis.t19TrainRounds
    assert(rounds >= 1 && rounds < 10,
      s"batching must beat one-round-per-merge on this corpus (rounds=$rounds)")
    info(s"t19 batched training: $rounds Spark rounds for 10 merges")
    // the kernel's non-overlap semantics, directly
    import org.apache.spark.unsafe.types.UTF8String
    val merged = graft.functions.Kernels.bpeMerge(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](UTF8String.fromString("a"), UTF8String.fromString("a"),
          UTF8String.fromString("a"))),
      UTF8String.fromString("a"), UTF8String.fromString("a"))
    assert((0 until merged.numElements())
      .map(merged.getUTF8String(_).toString) == Seq("aa", "a"))
  }

  test("t19 at a deep budget: batched merges equal the sequential reference on a rich vocabulary") {
    // production-shape vocabulary (word BIGRAMS → hundreds of distinct
    // "words", vs the fixture's ~31) and a budget deep enough to pay
    // many batching rounds — the sampled-prefix equality check for the
    // 1,000-merge production run (same bpeTrainOn code path, same
    // acceptance rule; graft.BpeScale measures the full-depth wall time)
    import org.apache.spark.sql.functions.{col, count, explode, length, lit}
    val budget = 60
    val words = sources.Tables.documents(spark, sf).filter(col("text").isNotNull)
      .filter(org.apache.spark.sql.functions.size(split(col("text"), " ")) >= 2)
      .select(explode(org.apache.spark.sql.functions.expr(
        """transform(sequence(1, size(split(text, ' ')) - 1),
          |  i -> concat_ws('_', slice(split(text, ' '), i, 2)))""".stripMargin))
        .as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("freq"))
    val (got, _) = TextAnalysis.bpeTrainOn(spark, words, budget)
    assert(got.length == budget, s"rich vocabulary must sustain $budget merges")
    val rounds = TextAnalysis.t19TrainRounds
    // driver-side sequential reference (Sennrich et al. 2016) over the
    // same word-frequency table — recount between EVERY merge
    val wf = words.collect().map(r => (r.getString(0), r.getLong(1)))
    var segs: Seq[(Vector[String], Long)] =
      wf.map { case (w, f) => (w.map(_.toString).toVector :+ "</w>", f) }.toSeq
    val expect = (1 to budget).map { rank =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      segs.foreach { case (seg, f) =>
        seg.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) += f
          case _ => ()
        }
      }
      val ((l, r), n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      segs = segs.map { case (seg, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < seg.length) {
          if (i + 1 < seg.length && seg(i) == l && seg(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += seg(i); i += 1 }
        }
        (out.result(), f)
      }
      (rank, l, r, n)
    }
    assert(got == expect, {
      val firstDiff = got.zip(expect).indexWhere { case (a, b) => a != b }
      s"deep-budget merge sequences diverge at rank ${firstDiff + 1}: " +
        s"got=${got.lift(firstDiff)} exp=${expect.lift(firstDiff)}"
    })
    assert(rounds < budget, s"batching must beat one round per merge (rounds=$rounds)")
    info(s"t19 deep budget: $rounds Spark rounds for $budget merges " +
      f"(${budget.toDouble / rounds}%.1f merges/round)")
  }

  test("approx percentile mode: the five exact-percentile queries run config-gated within the sketch's rank-error bound") {
    // exact-mode baselines FIRST (the default must stay oracle-exact)
    val exactP09 = Sampling.queries("p09_quality_quantile")(spark, sf).collect()
    val exactP14 = Sampling.queries("p14_curriculum")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap // doc_id -> stage

    /** distance from the type-7 target rank p·(n−1) to the rank band
      * of `v` in ascending `sorted` — 0 when v sits where an exact
      * percentile could */
    def rankErr(sorted: Array[Double], v: Double, p: Double): Double = {
      val n = sorted.length
      val lo = sorted.indexWhere(_ >= v) match { case -1 => n case i => i }
      val hi = sorted.count(_ <= v)
      val target = p * (n - 1)
      if (target < lo) lo - target else if (target > hi) target - hi else 0.0
    }

    val acc = 100
    spark.conf.set("spark.graft.percentile.approx", "true")
    spark.conf.set("spark.graft.percentile.accuracy", acc.toString)
    try {
      val byFlag = sources.Tables.lineitem(spark, sf)
        .select(col("l_returnflag"), col("l_quantity").cast("double").as("q"))
        .collect().map(r => (r.getString(0), r.getDouble(1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted.toArray }

      // q36/q47: every reported quantile's rank error ≤ n/accuracy (+1
      // slack for the interpolation the sketch never does)
      Relational.queries("q36_median")(spark, sf).collect().foreach { r =>
        val vals = byFlag(r.getString(0))
        assert(rankErr(vals, r.getDouble(1), 0.5) <= vals.length.toDouble / acc + 1,
          s"q36 ${r.getString(0)}")
      }
      Relational.queries("q47_percentiles")(spark, sf).collect().foreach { r =>
        val vals = byFlag(r.getString(0))
        for ((p, i) <- Seq(0.25 -> 2, 0.5 -> 3, 0.75 -> 4, 0.9 -> 5))
          assert(rankErr(vals, r.getDouble(i), p) <= vals.length.toDouble / acc + 1,
            s"q47 ${r.getString(0)} p$p")
      }

      // q65: median bound directly; MAD bound over deviations from the
      // APPROX median (the second aggregate's actual input)
      val prices = sources.Tables.lineitem(spark, sf)
        .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("x"))
        .collect().map(r => (r.getString(0), r.getDouble(1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toArray }
      Relational.queries("q65_mad")(spark, sf).collect().foreach { r =>
        val xs = prices(r.getString(0))
        val med = r.getDouble(1)
        assert(rankErr(xs.sorted, med, 0.5) <= xs.length.toDouble / acc + 1,
          s"q65 med ${r.getString(0)}")
        // median_price is ROUNDED to 4 decimals in the output — allow
        // the rounding to have shifted the deviation pivot
        val devs = xs.map(x => math.abs(x - med)).sorted
        assert(rankErr(devs, r.getDouble(2), 0.5) <= xs.length.toDouble / acc + 2,
          s"q65 mad ${r.getString(0)}")
      }

      // p09/p14 select/order rows by the thresholds: the approx run
      // must stay within a few boundary documents of the exact run
      val approxP09 = Sampling.queries("p09_quality_quantile")(spark, sf).collect()
      assert(math.abs(approxP09.length - exactP09.length) <= 10,
        s"p09 kept ${approxP09.length} vs exact ${exactP09.length}")
      val approxP14 = Sampling.queries("p14_curriculum")(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(approxP14.keySet == exactP14.keySet, "p14 must order ALL docs in both modes")
      // each of the 3 thresholds may move by ≤ n/accuracy ranks, and
      // every rank a threshold moves re-stages exactly one doc
      val moved = approxP14.count { case (id, st) => exactP14(id) != st }
      val bound = 3.0 * exactP14.size / acc + 6
      assert(moved <= bound, s"p14: $moved docs changed stage (bound $bound)")
    } finally {
      spark.conf.unset("spark.graft.percentile.approx")
      spark.conf.unset("spark.graft.percentile.accuracy")
    }
  }

  test("t20 tokenization: counts and id prefixes equal a reference driver encoder; re-run bit-stable") {
    val frame = TextAnalysis.queries("t20_tokenize")(spark, sf)
    // token_ids is the CSV STRING projection (scalar-sortable for the
    // driver dump); parse it back to ids for the reference comparison
    def parseIds(s: String): List[Int] =
      if (s.isEmpty) Nil else s.split(",", -1).map(_.toInt).toList
    val got = frame.collect()
      .map(r => (r.getLong(0), r.getLong(1), parseIds(r.getString(2)))).toSeq
    assert(got.nonEmpty && got.forall(_._2 > 0), "every doc tokenizes to > 0 tokens")
    // reference encoder: INDEPENDENT driver-side apply of the learned
    // merge table (greedy rank-order passes, left-to-right
    // non-overlapping) over the same whitespace tokenization
    val (merges, vocab) = operators.TextAnalysis.bpeAssets(spark, sf)
    val table = merges.map(m => (m._2, m._3))
    val ids = scala.collection.mutable.Map[String, Int]()
    vocab.zipWithIndex.foreach { case (t, i) => if (!ids.contains(t)) ids(t) = i }
    def encodeWord(w: String): List[Int] = {
      var seg: Vector[String] = w.map(_.toString).toVector :+ "</w>"
      for ((l, r) <- table) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < seg.length) {
          if (i + 1 < seg.length && seg(i) == l && seg(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += seg(i); i += 1 }
        }
        seg = out.result()
      }
      seg.map(t => ids.getOrElse(t, -1)).toList
    }
    val expect = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split(" ", -1).filter(_.nonEmpty)
          .toList.flatMap(encodeWord)
        (r.getLong(0), toks.length.toLong, toks.take(8))
      }.toSeq.sortBy(_._1)
    assert(got == expect, {
      val diff = got.zip(expect).find { case (g, e) => g != e }
      s"first mismatch: $diff"
    })
    // nothing fell out of the vocabulary (training and apply saw the
    // same corpus, so every produced token must have an id)
    assert(got.forall(!_._3.contains(-1)))
    // re-tokenizing with the same table is bit-stable
    val again = TextAnalysis.queries("t20_tokenize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), parseIds(r.getString(2)))).toSeq
    assert(again == got)
    // the codec's non-overlap semantics, directly: "aaa" + (a,a) → aa|a
    val codec = new graft.functions.BpeCodec(
      Array(("a", "a")), Array("a", "</w>", "aa"), 8)
    assert(codec.encodeWord("aaa").toList == List(2, 0, 1))
  }

  test("d13 SemDeDup: removal set equals a brute-force within-cluster recompute") {
    val frame = Dedup.queries("d13_semantic_dedup")(spark, sf)
    // the query runs from the STORED cluster table: its plan reads
    // stored (cell, cent_sim) columns and evaluates NO quantizer
    val plan = frame.queryExecution.executedPlan.toString
    assert(!plan.contains("nearest_centroid"),
      "d13 must not re-evaluate the quantizer on the corpus side")
    assert(plan.contains("corpus_clusters"),
      s"d13 must scan the stored cluster table:\n${plan.take(2000)}")
    val out = frame.collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(out.nonEmpty, "τ must mark at least one semantic duplicate")
    // brute force over the SAME cluster assignment (read back through
    // the shared IVF frames — the spec checks the rule, not k-means)
    val assigned = Similarity.ivfAssigned(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val cents = Similarity.ivfCells(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val centSim = assigned.map { case (id, e, c) => id -> cos(e, cents(c)) }.toMap
    val removed = scala.collection.mutable.Set[Long]()
    assigned.groupBy(_._3).values.foreach { cell =>
      for (Array(a, b) <- cell.sortBy(_._1).combinations(2).map(_.toArray)) {
        if (cos(a._2, b._2) >= 0.4) {
          val drop =
            if (centSim(a._1) > centSim(b._1)) a._1
            else if (centSim(a._1) < centSim(b._1)) b._1
            else math.max(a._1, b._1)
          removed += drop
        }
      }
    }
    assert(out.keySet == removed.toSet,
      s"removal sets differ: extra=${out.keySet -- removed}, missing=${removed -- out.keySet}")
    // the emitted cent_sim is the real centroid cosine
    out.foreach { case (id, cell) =>
      assert(assigned.find(_._1 == id).get._3 == cell, s"vec $id cell") }
  }

  test("s11 PQ ANN: recall vs exact, sound codes, partitioning-deterministic") {
    val pq = Similarity.queries("s11_ann_pq")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Similarity.queries("s01_ann_brute")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(pq.length == 10 && pq.map(_._1).distinct.length == 10)
    val recall = pq.map(_._1).count(exact) / 10.0
    assert(recall >= 0.8, s"PQ recall $recall below floor")
    info(s"s11 PQ recall@10 vs exact: $recall")
    // emitted cosines are the EXACT rerank values: every returned pair
    // must carry the same cosine s01 would compute for it
    val exactCos = sources.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val q = exactCos(0L)
    def cos(a: Array[Double]) = {
      val dot = a.zip(q).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * q.map(x => x * x).sum)
    }
    pq.foreach { case (id, c) =>
      assert(math.abs(c - cos(exactCos(id))) < 1e-3, s"vec $id cosine") }
    // deterministic: a second run returns identical rows
    val again = Similarity.queries("s11_ann_pq")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(pq.sameElements(again), "PQ result must be run-deterministic")
    // the stored code column is the PACKED physical layout: a BINARY
    // of exactly m=8 bytes per vector (32× under the 256-byte floats),
    // every byte a sound centroid id < k=32
    val codeRows = Similarity.pqCodes(spark, sf)
      .select(col("codes")).collect().map(_.getAs[Array[Byte]](0))
    assert(codeRows.nonEmpty && codeRows.forall(_.length == 8),
      "packed PQ codes must be m=8 bytes per vector")
    assert(codeRows.forall(_.forall(b => (b & 0xFF) < 32)),
      "every packed code must be a valid centroid id")
  }

  test("s15 IVFPQ: recall vs exact, candidates confined to probed cells, plan prunes on cell") {
    val got = Similarity.queries("s15_ann_ivfpq")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Similarity.queries("s01_ann_brute")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got.length == 10 && got.map(_._1).distinct.length == 10)
    val recall = got.map(_._1).count(exact) / 10.0
    assert(recall >= 0.8, s"IVFPQ recall $recall below floor")
    info(s"s15 IVFPQ recall@10 vs exact: $recall")
    // the coarse stage scans ONLY the probed inverted lists: every
    // scored candidate's cell is one of the nprobe probed cells, and
    // the probed fraction is a strict subset of the corpus
    val probed = Similarity.ivfPqProbedCells(spark, sf).toSet
    val coarseCells = Similarity.s15CoarseFrame(spark, sf)
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(coarseCells.subsetOf(probed),
      s"coarse candidates leaked outside probed cells: ${coarseCells -- probed}")
    val allCells = Similarity.ivfPqFrame(spark, sf)
      .select("cell").distinct().count()
    assert(probed.size < allCells,
      "probing must prune cells (nprobe < populated cells)")
    // the executed plan carries the cell-pruning filter (at scale:
    // partition pruning on the cell-partitioned serving table)
    val plan = GraftSession.explainPlan(Similarity.s15CoarseFrame(spark, sf))
    assert(plan.contains("cell#") && (plan.contains(" IN ") || plan.contains("IN (")),
      s"plan must filter on cell membership:\n${plan.take(800)}")
    // emitted cosines are the EXACT rerank values (s01's contract)
    val exactCos = sources.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val q15 = exactCos(0L)
    def cos15(a: Array[Double]) = {
      val dot = a.zip(q15).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * q15.map(x => x * x).sum)
    }
    got.foreach { case (id, c) =>
      assert(math.abs(c - cos15(exactCos(id))) < 1e-3, s"vec $id cosine") }
    // run-deterministic
    val again = Similarity.queries("s15_ann_ivfpq")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.sameElements(again), "IVFPQ result must be run-deterministic")
  }

  test("s16 filtered IVFPQ: recall vs filtered brute, exact-subset candidates, both filters reach the scan") {
    val allowed = Set(2, 5, 7)
    val got = Similarity.queries("s16_ann_filtered_ivfpq")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.length == 10 && got.map(_._1).distinct.length == 10)
    // PRE-filtering: every emitted row satisfies the predicate
    assert(got.forall(r => allowed(r._2)), "rows outside the label filter")
    // recall vs the FILTERED exact brute force on the SAME predicate (s07)
    val exact = Similarity.queries("s07_ann_filtered")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val recall = got.map(_._1).count(exact) / 10.0
    assert(recall >= 0.8, s"filtered IVFPQ recall $recall below floor")
    info(s"s16 filtered-IVFPQ recall@10 vs filtered exact: $recall")
    // candidates confined to the probed cells AND the allowed labels
    val probed = Similarity.ivfPqProbedCells(spark, sf).toSet
    val coarse = Similarity.s16CoarseFrame(spark, sf)
      .select("cell", "label").collect()
    assert(coarse.nonEmpty)
    assert(coarse.forall(r => probed(r.getInt(0))), "candidate outside probed cells")
    assert(coarse.forall(r => allowed(r.getInt(1))), "candidate outside the filter")
    // s07's exact-subset discipline: the filtered candidate set equals
    // the unfiltered candidate set restricted to allowed labels — the
    // predicate changes WHICH rows are scored, never the scoring
    val unfiltered = Similarity.s15CoarseFrame(spark, sf)
      .select("vec_id", "label").collect().map(r => (r.getLong(0), r.getInt(1)))
    val s16Cands = Similarity.s16CoarseFrame(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(unfiltered.filter(r => allowed(r._2)).map(_._1).toSet == s16Cands,
      "filtered candidates must be exactly the allowed subset of the unfiltered candidates")
    // BOTH predicates reach the serving-table SCAN (never applied
    // post-scoring): against storage they show as parquet
    // PushedFilters; against the session-cached serving frame Spark
    // substitutes the InMemoryRelation and both land in the
    // InMemoryTableScan's pushed filter list (same line) — either way
    // the scan, not a later operator, enforces them
    val fresh = Similarity.s15CoarseFrameOf(spark, sf,
      Similarity.ivfPqServing(spark, sf).filter(col("label").isin(2, 5, 7)))
    val plan = GraftSession.explainPlan(fresh)
    val cacheScanPushed = plan.linesIterator.exists(l =>
      l.contains("label#") && l.contains("IN (2,5,7)") && l.contains("cell#"))
    val parquetPushed = plan.contains("PushedFilters") && plan.contains("In(label") &&
      plan.contains("cell#") && (plan.contains(" IN ") || plan.contains("IN ("))
    assert(cacheScanPushed || parquetPushed,
      s"label + cell predicates must reach the serving scan:\n${plan.take(1500)}")
  }

  test("s12 range search: certified bound sound on every row, real pruning, set = brute force") {
    val bounds = Similarity.s12CertifiedBounds(spark, sf).collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / math.sqrt(na * nb)
    }
    // soundness: the SQ8 upper bound dominates the true cosine on EVERY
    // corpus row — this is what makes the prefilter lossless
    val trueCos = bounds.map { r =>
      val c = cos(r.getSeq[Float](1).toArray, r.getSeq[Float](2).toArray)
      assert(r.getDouble(3) >= c - 1e-12,
        s"certified bound violated for vec ${r.getLong(0)}: ${r.getDouble(3)} < $c")
      (r.getLong(0), c)
    }
    // the bound must actually prune: candidates paying the exact kernel
    // are a small fraction of the corpus (the point of the coarse pass)
    val cut = Similarity.RangeTau - 5e-5 - 1e-9
    val survivors = bounds.count(_.getDouble(3) >= cut)
    info(s"s12 certified candidates: $survivors/${bounds.length}")
    assert(survivors < bounds.length / 10,
      s"prefilter kept $survivors of ${bounds.length} — bound too loose")
    // emitted set == brute-force threshold set on the rounded contract
    val got = Similarity.queries("s12_range_search")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val brute = trueCos
      .map { case (id, c) =>
        (id, BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .filter(_._2 >= Similarity.RangeTau)
    assert(got.nonEmpty && got.toSet == brute.toSet,
      s"range result ${got.toSet} != brute force ${brute.toSet}")
  }

  test("t18 DSIR: target-domain documents score higher than the pool") {
    val rows = TextAnalysis.queries("t18_dsir_importance")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val bySource = sources.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tgtScores = bySource.filter(_._2 == "src0").map(t => rows(t._1))
    val rawScores = bySource.filterNot(_._2 == "src0").map(t => rows(t._1))
    assert(tgtScores.nonEmpty && rawScores.nonEmpty)
    // the importance weight must rank the target domain above the pool
    // on average — that is its entire purpose
    assert(tgtScores.sum / tgtScores.length > rawScores.sum / rawScores.length,
      "src0 documents must average higher under the src0-target LLR")
  }

  test("t21 perplexity buckets: tertiles partition the corpus and order by ppl") {
    val rows = TextAnalysis.queries("t21_ppl_bucket")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    // every scored doc lands in exactly one bucket, all three in use
    val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"), byBucket.keySet)
    // the buckets are ppl-ordered: no head doc is more perplexing than
    // any middle doc, none of middle worse than any tail doc — the
    // threshold-comparison assignment's defining property
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
    // tertile thresholds keep the split roughly balanced (ties at a
    // boundary may shift a few docs — allow a wide band, not a wobble)
    val n = rows.length
    byBucket.values.foreach(b =>
      assert(b.length > n / 6 && b.length < n / 2, s"unbalanced: ${byBucket.view.mapValues(_.length).toMap}"))
    // a doc the trusted LM has never seen a single bigram of still
    // scores finite: the add-1 smoothing contract
    assert(rows.forall(r => !r._2.isNaN && !r._2.isInfinite && r._2 > 0))
  }

  test("t22 NB classifier: separates the trusted slice; scores match an independent driver NB") {
    val rows = TextAnalysis.queries("t22_nb_quality")(spark, sf)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    // independent driver-side NB: same featurization, same smoothing,
    // no Spark expressions involved
    def featsOf(text: String): Seq[String] = {
      val toks = text.toLowerCase.split(" ", -1).filter(_.nonEmpty).toSeq
      toks ++ toks.sliding(2).collect { case Seq(a, b) => s"$a $b" }
    }
    val isPos = (l: String, s: String) => l == "en" && (s == "src0" || s == "src1")
    val np = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val nn = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { case (_, l, s, t) =>
      val m = if (isPos(l, s)) np else nn
      featsOf(t).foreach(f => m(f) += 1)
    }
    val v = (np.keySet ++ nn.keySet).size
    val (tp, tn) = (np.values.sum, nn.values.sum)
    val dp = docs.count(d => isPos(d._2, d._3)).toDouble
    val dn = docs.length - dp
    var checked = 0
    docs.foreach { case (id, _, _, t) =>
      val fs = featsOf(t)
      if (fs.nonEmpty) {
        val score = math.log(dp / dn) + fs.map(f =>
          math.log((np(f) + 1.0) / (tp + v)) - math.log((nn(f) + 1.0) / (tn + v))).sum
        val (nf, got, pred) = rows(id)
        assert(nf == fs.length, s"doc $id: n_feats $nf vs ${fs.length}")
        assert(math.abs(got - score) < 1e-3, s"doc $id: $got vs $score")
        assert(pred == (got > 0))
        checked += 1
      }
    }
    assert(checked > docs.length / 2)
    // the classifier's purpose: the trusted slice averages higher
    val (pos, neg) = docs.filter(d => rows.contains(d._1))
      .partition(d => isPos(d._2, d._3))
    assert(pos.nonEmpty && neg.nonEmpty)
    assert(pos.map(d => rows(d._1)._2).sum / pos.length >
      neg.map(d => rows(d._1)._2).sum / neg.length,
      "trusted documents must average a higher NB log-odds")
  }

  test("t23 Gopher rules: every rule column matches a driver recompute; keep is their conjunction") {
    val rows = TextAnalysis.queries("t23_gopher_rules")(spark, sf)
      .collect().map(r => (r.getLong(0),
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getInt(5), r.getBoolean(6)))).toMap
    val stops = Set("the", "be", "to", "of", "and", "that", "have", "with")
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty && docs.length == rows.size)
    docs.foreach { case (id, text) =>
      val l = text.toLowerCase.split(" ", -1).filter(_.nonEmpty).toSeq
      val den = math.max(l.size, 1).toDouble
      // Spark round() = HALF_UP over the double's decimal rendering
      def r4(x: Double) = java.math.BigDecimal.valueOf(x)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue + 0.0
      val mean = r4(l.map(_.length).sum / den)
      val sym = r4((text.count(_ == '#') +
        "\\.\\.\\.".r.findAllIn(text).length) / den)
      val alpha = r4(l.count(_.exists(c => c >= 'a' && c <= 'z')) / den)
      val nStop = l.count(stops)
      val (gn, gm, gs, ga, gst, gk) = rows(id)
      assert(gn == l.size && gm == mean && gs == sym && ga == alpha && gst == nStop,
        s"doc $id: ($gn,$gm,$gs,$ga,$gst) vs (${l.size},$mean,$sym,$alpha,$nStop)")
      assert(gk == (l.size >= 50 && l.size <= 100000 && mean >= 3.0 && mean <= 10.0
        && sym <= 0.1 && alpha >= 0.8 && nStop >= 2), s"doc $id keep")
    }
    // the filter filters: both verdicts occur on the corpus
    assert(rows.values.exists(_._6) && rows.values.exists(!_._6))
  }

  test("q70 TWAP: per-user-day recompute matches; weights cover the observed span") {
    val rows = Relational.queries("q70_time_weighted_avg")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getTimestamp(1)), (r.getInt(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val ev = sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val cal = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
    def dayOf(ts: java.sql.Timestamp): Long = {
      cal.setTimeInMillis(ts.getTime)
      cal.set(java.util.Calendar.HOUR_OF_DAY, 0); cal.set(java.util.Calendar.MINUTE, 0)
      cal.set(java.util.Calendar.SECOND, 0); cal.set(java.util.Calendar.MILLISECOND, 0)
      cal.getTimeInMillis
    }
    val grouped = ev.groupBy(e => (e._1, dayOf(e._2)))
    var checked = 0
    grouped.foreach { case ((u, day), es) if es.length >= 2 =>
      def us(t: java.sql.Timestamp): Long =
        (t.getTime / 1000) * 1000000L + t.getNanos / 1000 // full µs precision
      val sorted = es.sortBy(e => (us(e._2), e._3))
      val weights = sorted.sliding(2).map { case Array(a, b) =>
        (math.round(a._4 * 100), us(b._2) - us(a._2)) }.toSeq
      val twap = weights.map { case (v, w) => v.toDouble / 100 * w }.sum /
        weights.map(_._2).sum
      val key = rows.keys.find(k => k._1 == u && dayOf(k._2) == day)
      assert(key.isDefined, s"missing ($u, $day)")
      val (n, spanUs, t) = rows(key.get)
      assert(n == es.length - 1, s"($u,$day) intervals")
      assert(spanUs == weights.map(_._2).sum, s"($u,$day) observed span")
      assert(math.abs(t - twap) < 1e-3, s"($u,$day) twap $t vs $twap")
      checked += 1
      case _ => ()
    }
    assert(checked > 10, s"only $checked groups checked")
  }

  test("p14 curriculum: positions are a permutation, stages strictly ordered easy-to-hard") {
    val rows = Sampling.queries("p14_curriculum")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val n = rows.length
    assert(rows.map(_._3).sorted.toSeq == (1L to n.toLong).toSeq,
      "positions must be exactly 1..N")
    // all of stage s comes before all of stage s+1
    val maxPos = rows.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    val minPos = rows.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
    val stages = rows.map(_._2).distinct.sorted
    stages.sliding(2).foreach { case Array(a, b) =>
      assert(maxPos(a) < minPos(b), s"stage $a must fully precede $b")
      case _ => ()
    }
    // stage membership follows quality: every stage-0 doc scores >= any
    // stage-1 doc, and so on down
    val quality = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), operators.TextAnalysis.qualityScoreCol.as("q"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    stages.sliding(2).foreach { case Array(a, b) =>
      val aMin = rows.filter(_._2 == a).map(r => quality(r._1)).min
      val bMax = rows.filter(_._2 == b).map(r => quality(r._1)).max
      assert(aMin >= bMax, s"stage $a min quality $aMin < stage $b max $bMax")
      case _ => ()
    }
  }

  test("e04 curate+pack: survivor set equals e01; prefix sum exact over survivors") {
    val rows = operators.Pipeline.e04CuratePack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val e01Ids = operators.Pipeline.e01Curate(spark, sf).collect()
      .map(_.getLong(0)).sorted
    assert(rows.map(_._1).sameElements(e01Ids),
      "packing must run over exactly the curated survivor set")
    // exclusive prefix sum in doc_id order
    var acc = 0L
    rows.foreach { case (id, n, before, pack) =>
      assert(before == acc, s"doc $id: tokens_before must be the exclusive prefix")
      assert(pack == before / 256, s"doc $id: pack id")
      acc += n
    }
  }

  test("q68 approx percentiles: GK sketch within its rank-error bound vs exact") {
    val approx = Relational.q68ApproxPercentiles(spark, sf).collect()
      .map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val li = sources.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val targets = Seq(0.25, 0.5, 0.75, 0.9)
    approx.foreach { case (flag, qs) =>
      val vals = li.filter(_._1 == flag).map(_._2).sorted
      val n = vals.length
      qs.zip(targets).foreach { case (a, p) =>
        // rank of the returned value must be within n/accuracy (+1 slack)
        val rank = vals.count(_ <= a)
        val err = n.toDouble / 10000 + 1
        assert(math.abs(rank - p * n) <= err,
          s"$flag p$p: approx $a has rank $rank of $n (target ${p * n} ± $err)")
      }
    }
  }

  test("t17 novelty: fractions match a direct gram recount; duplicates score low") {
    val rows = TextAnalysis.queries("t17_novelty")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def gramsOf(t: String): Set[String] =
      t.split(" ").sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSet
    val counts = scala.collection.mutable.Map.empty[String, Int]
    docs.foreach(d => gramsOf(d._2).foreach(g => counts(g) = counts.getOrElse(g, 0) + 1))
    val got = rows.map(r => r._1 -> r).toMap
    docs.foreach { case (id, t) =>
      val gs = gramsOf(t)
      if (gs.isEmpty) assert(!got.contains(id), s"doc $id: <8 tokens drops out")
      else {
        val uniq = gs.count(g => counts(g) == 1)
        val r = got(id)
        assert(r._2 == gs.size && r._3 == uniq, s"doc $id gram counts")
        assert(math.abs(r._4 - uniq.toDouble / gs.size) < 1e-3, s"doc $id novelty")
      }
    }
    // the corpus plants shared boilerplate spans: novelty must spread
    assert(rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    assert(rows.exists(_._4 < 1.0), "shared grams exist (d12 finds hot spans)")
    assert(rows.exists(_._4 > 0.0), "not every gram is boilerplate")
  }

  test("t16 keywords: custom top-k node in the plan; <=3 distinct terms per doc") {
    val df = TextAnalysis.queries("t16_keywords")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial") && plan.contains("TopKPerGroupFinal"),
      "t16 must consume the custom operator:\n" + plan.take(500))
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (id, g) =>
      assert(g.length <= 3 && g.map(_._2).distinct.length == g.length,
        s"doc $id: at most 3 distinct keywords")
      // keywords are the doc's maximal rounded scores
      assert(g.map(_._3).min >= g.map(_._3).max - 1e9) // sanity ordering exists
    }
    assert(rows.nonEmpty)
  }

  test("p15 Pareto selection: rule holds row-wise; acceptance is score-monotone in aggregate") {
    val rows = Sampling.queries("p15_pareto_select")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, score, draw, keep) =>
      // the GPT-3 rule verbatim, on the engine's own rounded columns
      assert(keep == (draw > 1.0 - score), s"doc $id")
      assert(draw >= 0.0 && score >= 0.0 && score <= 1.0, s"doc $id")
      // a draw past the whole score range keeps unconditionally
      if (draw > 1.0) assert(keep, s"doc $id: draw $draw must keep")
    }
    // heavy-tailed draws actually occur (P(draw > 0.1) ≈ 0.42/doc)
    assert(rows.map(_._3).max > 0.1)
    // the soft filter is still a filter: high-score docs are accepted
    // at a strictly higher rate than low-score docs
    val (hi, lo) = rows.partition(_._2 >= 0.5)
    if (hi.nonEmpty && lo.nonEmpty) {
      val rate = (g: Array[(Long, Double, Double, Boolean)]) =>
        g.count(_._4).toDouble / g.length
      assert(rate(hi) > rate(lo),
        s"acceptance must favor high scores: ${rate(hi)} vs ${rate(lo)}")
    }
  }

  test("p13 upsample: copy counts deterministic, contiguous, near weight*n per class") {
    val rows = Sampling.queries("p13_upsample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // copies per doc are contiguous 1..n
    rows.groupBy(_._1).foreach { case (id, g) =>
      assert(g.map(_._3).sorted.sameElements(1 to g.length),
        s"doc $id: copies must be 1..n")
    }
    // deterministic under rerun
    val again = Sampling.queries("p13_upsample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows.sorted.sameElements(again.sorted))
    // per-class realized totals ≈ weight * class size (PRF law of large
    // numbers at 500 docs: within 15%)
    val classes = sources.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) ->
        (if (r.getString(1).drop(3).toInt < 10) "web" else "curated")).toMap
    val nWeb = classes.values.count(_ == "web")
    val nCur = classes.size - nWeb
    val gotWeb = rows.count(_._2 == "web")
    val gotCur = rows.length - gotWeb
    assert(math.abs(gotWeb - 0.7 * nWeb) <= 0.15 * nWeb + 3,
      s"web: $gotWeb vs ${0.7 * nWeb}")
    assert(math.abs(gotCur - 2.3 * nCur) <= 0.15 * nCur + 3,
      s"curated: $gotCur vs ${2.3 * nCur}")
    // every curated doc appears at least twice (floor of 2.3)
    val curDocs = rows.filter(_._2 == "curated").groupBy(_._1)
    assert(curDocs.values.forall(g => g.length == 2 || g.length == 3))
  }

  test("s09 MMR: every pick maximizes the objective; diversity not worse than top-k") {
    val got = Similarity.queries("s09_ann_mmr")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.length == 10 && got.map(_._2).distinct.length == 10)
    // independent recompute from the raw embeddings
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val all = sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val q = all(0L)
    val pool = all.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, rel) => (-rel, id) }.take(30)
    // greedy re-derivation, pick by pick
    var sel = Vector.empty[Long]
    got.foreach { case (rank, id, _, _) =>
      val best = pool.filterNot(p => sel.contains(p._1)).map { case (pid, rel) =>
        val red = if (sel.isEmpty) 0.0 else sel.map(s => cos(all(pid), all(s))).max
        (pid, 0.7 * rel - 0.3 * red)
      }.minBy { case (pid, sc) => (-sc, pid) }
      assert(id == best._1, s"rank $rank: MMR must pick the objective maximizer")
      sel = sel :+ id
    }
    // diversity: the MMR set's mean pairwise similarity must not exceed
    // the relevance-only top-k's
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.length)
        yield cos(all(ids(i)), all(ids(j)))
      ps.sum / ps.length
    }
    val topk = pool.take(10).map(_._1)
    assert(meanPairSim(got.map(_._2).toSeq) <= meanPairSim(topk) + 1e-12,
      "MMR must not be less diverse than relevance-only retrieval")
  }

  test("e01 curate equals the composition of t02 + t12 + exact dedup") {
    val out = operators.Pipeline.e01Curate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(4)))
    val quality = TextAnalysis.t02Quality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(7))).toMap
    val keep = TextAnalysis.t12Blocklist(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(3))).toMap
    val texts = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val survivors = texts.filter { case (id, _) =>
      quality(id) >= TextAnalysis.qualityGate && keep(id) == 1
    }
    val expected = survivors.groupBy(_._2).values.map(_.map(_._1).min).toSet
    assert(out.map(_._1).toSet == expected,
      "curated set must be the filter-then-dedup composition of the unit operators")
    out.foreach { case (id, score) =>
      assert(score == quality(id), s"doc $id must carry t02's exact score")
    }
    assert(out.nonEmpty && out.length < texts.length,
      "pipeline must keep some and reject some")
    // the only corpus exchange is keyed on the 8-byte hash, not text
    val plan = operators.Pipeline.e01Curate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(h#"),
      "dedup window must shuffle on the content hash")
    assert(!plan.contains("hashpartitioning(text"),
      "document text must never be a shuffle key")
  }

  test("p08 token budget: greedy best-first selection exact; window bucketed") {
    val df = Sampling.p08TokenBudget(spark, sf)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // recompute the greedy selection single-threaded in rank order
    val ranked = TextAnalysis.t02Quality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(2).toLong, r.getDouble(7)))
      .sortBy { case (id, _, score) => (-score, id) }
    var run = 0L
    val expected = scala.collection.mutable.Map[Long, Long]()
    ranked.foreach { case (id, n, _) =>
      if (run < 12000L) expected(id) = run
      run += n
    }
    assert(rows.map(_._1).toSet == expected.keySet,
      "selection must be the greedy rank-order prefix under the budget")
    rows.foreach { case (id, _, _, before) =>
      assert(before == expected(id), s"doc $id tokens_before must be the rank prefix sum")
    }
    assert(rows.forall(_._4 < 12000L) &&
      rows.map(r => r._4 + r._2).max >= 12000L,
      "budget boundary: all below, crossing doc included")
    // the corpus-sized window is partitioned by score bucket, never a global sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(pid"),
      "per-doc prefix window must hash-partition on the score bucket")
  }

  test("p09 quality quantile: per-lang p75 gate exact; threshold broadcasts") {
    val df = Sampling.p09QualityQuantile(spark, sf)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    val scored = TextAnalysis.t02Quality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(7))).toMap
    val langs = sources.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    // type-7 p75 per lang, recomputed driver-side in the WEIGHTED
    // interpolation form both engines use: lo*(hi-pos) + hi*(pos-lo)
    // (the delta form lo + (hi-lo)*f is an ulp off)
    val p75 = langs.groupBy(_._2).view.mapValues { docs =>
      val xs = docs.map(kv => scored(kv._1)).toArray.sorted
      val pos = (xs.length - 1) * 0.75
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) xs(lo)
      else xs(lo) * (hi - pos) + xs(hi) * (pos - lo)
    }.toMap
    val expected = langs.collect {
      case (id, lang) if scored(id) >= p75(lang) => id
    }.toSet
    assert(rows.map(_._1).toSet == expected,
      "kept set must be exactly the docs at or above their language's p75")
    rows.foreach { case (id, lang, score, thr) =>
      assert(score == scored(id) && thr == p75(lang),
        s"doc $id must carry the exact score and threshold")
    }
    // every language keeps at least a quarter (ties can push above)
    val keptPerLang = rows.groupBy(_._2).view.mapValues(_.length).toMap
    langs.groupBy(_._2).foreach { case (lang, docs) =>
      assert(keptPerLang.getOrElse(lang, 0) >= docs.size / 4,
        s"$lang must keep at least its top quartile")
    }
    // threshold side is a broadcast join, not a shuffle join
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the n_lang-row threshold table must broadcast")
  }

  test("e01 curate: planted duplicate texts collapse to the min-doc_id keeper") {
    // the corpus has zero duplicate texts at unit/oracle SFs, so the
    // dedup stage is only non-vacuous on a corpus with PLANTED clones:
    // every doc cloned under doc_id+1e6 — the curated set must be
    // byte-identical to the unplanted run (keeper = original id; a
    // max-keeper or a dropped dedup stage both fail loudly)
    val dir = java.nio.file.Files.createTempDirectory("graft-e01-dup").toString
    val base = sources.Tables.documents(spark, sf)
    base.unionByName(base.withColumn("doc_id", col("doc_id") + 1000000L))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got  = operators.Pipeline.e01Curate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getDouble(4))).toSeq
    val want = operators.Pipeline.e01Curate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getDouble(4))).toSeq
    assert(got == want,
      "clones must collapse to the original min-doc_id keeper — never the clone, never both")
    assert(got.nonEmpty && got.forall(_._1 < 1000000L), "no clone id may survive")
  }

  test("p10 temperature sample: sqrt-flattened quotas, deterministic, quota-exact") {
    val rows = Sampling.p10TemperatureSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rows2 = Sampling.p10TemperatureSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.sameElements(rows2), "selection must be deterministic")
    // recompute quotas: budget * isqrt(n_l) / sum(isqrt), integer math
    val perLang = sources.Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = perLang.values.sum * 30 / 100
    val isqrt = perLang.view.mapValues(n => math.sqrt(n.toDouble).toLong).toMap
    val sr = isqrt.values.sum
    val quota = isqrt.view.mapValues(r => budget * r / sr).toMap
    val kept = rows.groupBy(_._2).view.mapValues(_.length).toMap
    perLang.keys.foreach { l =>
      assert(kept.getOrElse(l, 0) == math.min(quota(l), perLang(l)).toInt,
        s"$l: kept ${kept.getOrElse(l, 0)} != quota ${quota(l)} (n=${perLang(l)})")
    }
    // the flattening property: sampled share of a high-resource lang is
    // below its corpus share, low-resource above (when quotas differ)
    if (quota.values.toSet.size > 1) {
      val (hiLang, _) = perLang.maxBy(_._2)
      val (loLang, _) = perLang.minBy(_._2)
      val corpusShareHi = perLang(hiLang).toDouble / perLang.values.sum
      val sampleShareHi = kept(hiLang).toDouble / rows.length
      val corpusShareLo = perLang(loLang).toDouble / perLang.values.sum
      val sampleShareLo = kept(loLang).toDouble / rows.length
      assert(sampleShareHi <= corpusShareHi + 1e-9 && sampleShareLo >= corpusShareLo - 1e-9,
        "temperature sampling must flatten the language distribution")
    }
  }

  test("e02 curate-ingest: published as ONE catalog version, scan equals e01, PK enforced") {
    val df = operators.Pipeline.e02CurateIngest(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getInt(3), r.getDouble(4))).toSeq
    val want = operators.Pipeline.e01Curate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getDouble(4))).toSeq
    assert(got == want, "the ingested table must equal the curated set exactly")
    // the ingest is atomic: exactly one version past CREATE, and the
    // catalog enforces the doc_id PRIMARY KEY on later writers
    val root = java.nio.file.Files.createTempDirectory("graft-e02-spec").toString
    val cat = new sources.TableCatalog(spark, root)
    val curated = operators.Pipeline.e01Curate(spark, sf)
    cat.createTable("curated_docs", curated.schema, primaryKey = Some("doc_id"))
    val v0 = cat.currentVersion("curated_docs")
    cat.insert("curated_docs", curated)
    assert(cat.currentVersion("curated_docs") == v0 + 1) // ONE atomic version
    intercept[Exception] { // duplicate PK rejected, version unchanged
      cat.insert("curated_docs", curated.limit(1))
    }
    assert(cat.currentVersion("curated_docs") == v0 + 1)
  }

  test("q49 unpivot: 3 metrics x flags, values equal the wide aggregate, Expand no join") {
    val rows = Relational.q49Unpivot(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val flags = rows.map(_._1).distinct
    assert(rows.length == flags.length * 3, "long form must be flags x 3 metrics")
    // melt must preserve values: sum_qty rows re-aggregate to the wide total
    val wideQty = sources.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").sum("l_quantity").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.filter(_._2 == "sum_qty").foreach { case (f, _, v) =>
      assert(math.abs(v - wideQty(f)) < 1e-6, s"flag $f sum_qty must survive the melt")
    }
    // plan shape: unpivot is an Expand in the project stage — never a join
    val plan = Relational.q49Unpivot(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "unpivot must compile to Expand")
    assert(!plan.contains("Join"), "unpivot must not introduce a join")
  }

  test("q50 json extract: every row parses, k bounded, one agg exchange") {
    val rows = Relational.q50JsonExtract(spark, sf).collect()
    val total = sources.Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total,
      "every props payload must yield a parsed k (COUNT(k) partitions the table)")
    rows.foreach { r =>
      assert(r.getInt(2) >= 0 && r.getInt(3) <= 99, "k is generated in [0,99]")
    }
  }

  test("q51 filtered agg: conditional counts consistent and single-scan") {
    val rows = Relational.q51FilteredAgg(spark, sf).collect()
    rows.foreach { r =>
      val (nAll, nHigh, nBulk) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nHigh <= nAll && nBulk <= nAll,
        "filtered counts can never exceed the unfiltered count")
    }
    // all six aggregates come from ONE scan of lineitem — no self-join
    val plan = Relational.q51FilteredAgg(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "conditional aggregation must not self-join")
    assert(plan.sliding("Scan parquet".length).count(_ == "Scan parquet") <= 1,
      "one scan feeds every conditional aggregate")
  }

  test("d11 keep-best: one keeper per cluster, keeper maximizes quality, corpus partitioned") {
    val kept = Dedup.d11KeepBest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(kept.map(_._1).distinct.length == kept.length, "exactly one keeper per cluster")
    assert(kept.map(_._4.toLong).sum == sources.Tables.documents(spark, sf).count(),
      "cluster sizes must partition the corpus (singletons included)")
    // keeper really is the max-quality member of its d06 cluster
    val clusters = Dedup.d06Clusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val quality = TextAnalysis.t02Quality(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(7)).toMap
    val byRep = clusters.groupBy(_._2)
    val keptByRep = kept.map(k => k._1 -> k).toMap
    byRep.foreach { case (rep, members) =>
      val best = members.map(_._1).maxBy(id => (quality(id), -id))
      val k = keptByRep(rep)
      assert(quality(k._2) == quality(best),
        s"cluster $rep keeper must have the max member quality")
    }
  }

  test("p11 leak-safe split: near-dup clusters co-travel; p01 would split them") {
    val split = Sampling.p11LeakSafeSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(split.length == sources.Tables.documents(spark, sf).count().toInt)
    // THE leak-safety property: every cluster lands in exactly one split
    split.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $rep must not straddle train/val/test")
    }
    val dist = split.groupBy(_._3).view.mapValues(_.length).toMap
    assert(dist.keySet == Set("train", "val", "test") &&
      dist("train") > dist("val") + dist("test"),
      "the 90/5/5 buckets must all be populated, train dominant")
  }

  test("q52 full outer join: both sides fully represented, null-extended correctly") {
    val rows = Relational.q52JoinFull(spark, sf).collect()
    val cust = sources.Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 9000).select("c_custkey").collect()
      .map(_.getLong(0)).toSet
    val ords = sources.Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 400000).select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    val gotCust = rows.filter(!_.isNullAt(0)).map(_.getLong(0)).toSet
    val gotOrds = rows.filter(!_.isNullAt(2)).map(_.getLong(2)).toSet
    assert(gotCust == cust, "every filtered customer must appear (left side preserved)")
    assert(gotOrds == ords, "every filtered order must appear (right side preserved)")
    rows.foreach { r =>
      assert(!(r.isNullAt(0) && r.isNullAt(2)),
        "a row null on BOTH sides is impossible in a full outer join")
    }
  }

  test("t14 bigram LM: logp nonpositive, bigram count = tokens-1, short docs excluded") {
    import org.apache.spark.sql.functions.{filter => afilter, split => asplit, lower, size}
    val rows = TextAnalysis.t14BigramLm(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getDouble(2) <= 0.0, "a bigram's corpus probability can never exceed 1")
      assert(r.getInt(1) >= 1)
    }
    val toks = sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(afilter(asplit(lower(col("text")), " ", -1), t => t =!= "")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(r.getInt(1) == toks(r.getLong(0)) - 1,
        s"doc ${r.getLong(0)}: n_bigrams must be token count - 1")
    }
    assert(rows.map(_.getLong(0)).toSet == toks.filter(_._2 >= 2).keySet,
      "exactly the docs with >= 2 tokens are scored")
  }

  test("p12 interleave: positions unique, round-robin balanced while sources last") {
    val rows = Sampling.p12Interleave(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.map(_._1).distinct.length == rows.length, "positions must be unique")
    assert(rows.map(_._1).sorted.sameElements(rows.map(_._1)), "emitted in pos order")
    // while every source still has rows, each cycle of n_sources
    // positions contains each source at most once
    val nSrc = rows.map(_._3).distinct.length
    val perSrc = rows.groupBy(_._3).view.mapValues(_.length).toMap
    val fullCycles = perSrc.values.min
    rows.filter(_._1 < fullCycles.toLong * nSrc)
      .grouped(nSrc).foreach { cycle =>
        assert(cycle.map(_._3).distinct.length == cycle.length,
          "a cycle must never repeat a source while all sources have rows")
      }
  }

  test("q53 range join: bucketed equi-join plan (no NLJ), matches exactly the in-window events") {
    val df = Relational.q53RangeJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "the interval join must be the bucketed EQUI join, never a theta nested loop")
    val rows = df.collect()
    def millis(v: Any): Long = v match {
      case t: java.sql.Timestamp     => t.getTime
      case t: java.time.LocalDateTime => t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }
    rows.foreach { r =>
      val ts = millis(r.getAs[Any]("ts"))
      val ws = millis(r.getAs[Any]("w_start"))
      assert(ts >= ws && ts < ws + 4L * 3600 * 1000,
        s"event ${r.getLong(0)} must fall inside its 4-hour window")
    }
    // completeness: every band event COVERED BY an existing window is
    // matched exactly once (a pre-2am event on the corpus's first day
    // has no preceding day, hence no window — correctly unmatched)
    import org.apache.spark.sql.functions.{hour, to_date, date_sub}
    val days = sources.Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day")).distinct()
      .collect().map(_.get(0).toString).toSet
    val expected = sources.Tables.events(spark, sf)
      .select(hour(col("ts")).as("h"), to_date(col("ts")).as("day"),
        date_sub(to_date(col("ts")), 1).as("prev"))
      .collect().count { r =>
        r.getInt(0) >= 22 || (r.getInt(0) < 2 && days.contains(r.get(2).toString))
      }
    assert(rows.length == expected, "the range join must be complete, no dupes")
  }

  test("t15 count-min sketch: estimate >= exact always, within eps*N, deterministic") {
    import org.apache.spark.sql.functions.{explode, filter => afilter, split => asplit, lower}
    val est = TextAnalysis.t15HeavyHitters(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = sources.Tables.documents(spark, sf)
      .select(explode(afilter(asplit(lower(col("text")), " ", -1), t => t =!= ""))
        .as("term"))
      .groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalTokens = exact.values.sum
    est.foreach { case (term, e) =>
      val t = exact.getOrElse(term, 0L)
      assert(e >= t, s"'$term': CMS can only overcount (est $e < true $t)")
      // per-row collision mass is bounded by N/Width; the min over
      // Depth independent rows sits far inside 2x that bound
      assert(e <= t + 2L * totalTokens / graft.functions.SketchAgg.Width,
        s"'$term': est $e exceeds true $t + collision bound")
    }
    assert(est("zebra") == exact.getOrElse("zebra", 0L) ||
      est("zebra") <= 2L * totalTokens / graft.functions.SketchAgg.Width,
      "an absent probe reads only collision mass")
    // elementwise-add merges are commutative: re-running under a
    // different partitioning gives the identical sketch
    val again = TextAnalysis.t15HeavyHitters(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == est, "the sketch must be bit-deterministic")
  }

  test("m04 audio: real RIFF/PCM parse, features match a direct sample loop, malformed rejected") {
    // round-trip: synth -> parse recovers rate and count
    val wav = Multimodal.decodeWav(Multimodal.wavPayload(7L))
    assert(wav.sampleRate == 8000 && wav.samples.length == 7 % 2000 + 500)
    // an extra unknown chunk before data must still decode (chunk walk)
    val base = Multimodal.wavPayload(3L)
    val extra = java.nio.ByteBuffer.allocate(base.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(base, 0, 36)                     // RIFF..fmt chunk
    extra.put("LIST".getBytes("US-ASCII")).putInt(4).putInt(0) // junk chunk
    extra.put(base, 36, base.length - 36)      // data chunk
    assert(Multimodal.decodeWav(extra.array()).samples.length == 3 % 2000 + 500)
    // malformed: truncated magic, non-PCM
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("RIFX".getBytes ++ new Array[Byte](40))
    }
    // features equal a direct recompute for a sample of docs
    val rows = Multimodal.m04Audio(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(0L, 11L, 123L)) if (rows.contains(id)) {
      val n = (id % 2000 + 500).toInt
      var sum = 0L; var sumAbs = 0L; var zc = 0; var prev = 0L
      for (i <- 0 until n) {
        val v = ((id * 2654435761L + 1013904223L * i) % 65536) - 32768
        sum += v; sumAbs += math.abs(v)
        if (i > 0 && v * prev < 0) zc += 1
        prev = v
      }
      val r = rows(id)
      assert(r.getInt(1) == n && r.getLong(3) == sum &&
        r.getLong(4) == sumAbs && r.getInt(5) == zc,
        s"doc $id audio features must match the direct loop")
    }
  }

  test("m05 image dedup: planted duplicates group, hash tolerates minor noise") {
    val rows = Multimodal.m05ImageDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // docs whose ids are 97 apart carry the SAME asset -> same hash + rep
    val byId = rows.map(r => r._1 -> r).toMap
    if (byId.contains(0L) && byId.contains(97L)) {
      assert(byId(0L)._2 == byId(97L)._2 && byId(0L)._3 == byId(97L)._3,
        "re-hosted assets (seed collision) must share hash and representative")
      assert(byId(0L)._4 >= 2)
    }
    // group sizes partition the corpus
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.forall(_._4 == g.length), "n_group must equal the group's size")
      assert(g.map(_._3).distinct.length == 1, "one representative per hash")
      assert(g.map(_._3).head == g.map(_._1).min, "rep is the smallest doc_id")
    }
    // perceptual tolerance: nudging one pixel by 1 doesn't change the hash
    val base = Multimodal.ppmPayload(5L)
    val noisy = base.clone()
    noisy(base.length - 1) = ((noisy(base.length - 1) + 1) & 0xff).toByte
    assert(Multimodal.phashBits(base) == Multimodal.phashBits(noisy),
      "aHash must be stable under a one-byte pixel nudge")
    // but a structurally different image hashes differently
    assert(Multimodal.phashBits(base) != Multimodal.phashBits(Multimodal.ppmPayload(6L)))
  }

  test("m06 audio dedup: planted clips group by seed; envelope bits match construction") {
    val rows = Multimodal.m06AudioDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // docs whose ids are 89 apart carry the SAME clip -> same fp + rep
    val byId = rows.map(r => r._1 -> r).toMap
    if (byId.contains(0L) && byId.contains(89L)) {
      assert(byId(0L)._2 == byId(89L)._2 && byId(0L)._3 == byId(89L)._3,
        "re-hosted clips (seed collision) must share fingerprint and representative")
      assert(byId(0L)._4 >= 2)
    }
    // groups partition the corpus with min-id representatives
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.forall(_._4 == g.length), "n_group must equal the group's size")
      assert(g.map(_._3).distinct.length == 1 && g.map(_._3).head == g.map(_._1).min)
    }
    // construction unit: a clip that is silence then full-scale must
    // fingerprint as 32 quiet bits then 32 loud bits
    val n = 640 // w = 10
    val buf = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    for (i <- 0 until n) buf.putShort(if (i < n / 2) 0 else 10000)
    assert(Multimodal.audioFpBits(buf.array()) == "0" * 32 + "1" * 32)
    // envelope robustness: a one-sample nudge doesn't flip any bit
    val base = Multimodal.wavPayload(5L)
    val noisy = base.clone()
    noisy(45) = (noisy(45) + 1).toByte // first data byte, +1 amplitude
    assert(Multimodal.audioFpBits(base) == Multimodal.audioFpBits(noisy),
      "envelope fingerprint must be stable under a one-sample nudge")
    // but a different clip fingerprints differently
    assert(Multimodal.audioFpBits(base) != Multimodal.audioFpBits(Multimodal.wavPayload(6L)))
  }

  test("m07 scene detect: scenes partition the frame range; cuts match a direct diff recompute") {
    val rows = Multimodal.m07SceneDetect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (id, scenes) =>
      val sorted = scenes.sortBy(_._2)
      // driver recompute of the same segmentation from the raw payload
      val img = Multimodal.decodePpm(Multimodal.ppmPayload(id))
      val nFrames = img.pixels.length / 192
      val cuts = (1 until nFrames).filter { f =>
        (0 until 192).map(i => math.abs((img.pixels(f * 192 + i) & 0xff) -
          (img.pixels((f - 1) * 192 + i) & 0xff))).sum > 18500
      }
      val expect = ((0 +: cuts).zip(cuts :+ nFrames)).zipWithIndex
        .map { case ((st, en), idx) => (id, idx, st, en - st) }
      assert(sorted.toSeq == expect, s"doc $id: scene segmentation must match recompute")
      // partition property: contiguous, starts at 0, covers all frames
      assert(sorted.head._3 == 0 && sorted.map(_._4).sum == nFrames)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3, "scenes must be contiguous")
        case _ =>
      }
    }
    assert(byDoc.exists(_._2.length >= 2), "some doc has multiple scenes")
    assert(byDoc.exists(_._2.length == 1), "some doc is a single take")
  }

  test("e08 funnel: stages monotone; final stage equals e07's materialized set") {
    val rows = Pipeline.queries("e08_funnel_report")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2, 3, 4))
    // a gate can only drop: docs and tokens non-increasing down the funnel
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._3 <= a._3 && b._4 <= a._4, s"stage ${b._2} grew vs ${a._2}")
      case _ =>
    }
    assert(rows.head._3 > rows.last._3, "the cascade must actually drop documents")
    // the report's dedup row IS e07's materialization, counted
    val packed = Pipeline.queries("e07_cascade_stored")(spark, sf).collect()
    assert(rows.last._3 == packed.length.toLong,
      s"funnel dedup docs ${rows.last._3} != e07 rows ${packed.length}")
    assert(rows.last._4 == packed.map(_.getLong(2)).sum,
      "funnel dedup tokens != e07 token sum")
  }

  test("t24 fertility: groups re-derive from t20's per-doc encode; fertility >= 1") {
    val got = TextAnalysis.queries("t24_fertility")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
         r.getDouble(6), r.getDouble(7)))).toMap
    // independent derivation: t20's per-doc token counts + the raw
    // documents table, folded driver-side
    val perDoc = TextAnalysis.queries("t20_tokenize")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "lang", "source", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4).toLowerCase.split(" ", -1).count(_.nonEmpty).toLong))
    val expect = docs.groupBy(d => (d._2, d._3)).map { case (k, ds) =>
      val words = ds.map(_._5).sum
      val bpe = ds.map(d => perDoc(d._1)).sum
      val chars = ds.map(_._4).sum
      def r4(x: Double) =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      k -> (ds.length.toLong, words, bpe, chars,
        r4(bpe.toDouble / words), r4(chars.toDouble / bpe))
    }
    assert(got == expect, "fertility rollup must re-derive from t20 + documents")
    // a word encodes to >= 1 BPE token, so fertility >= 1 everywhere
    assert(got.values.forall(_._5 >= 1.0))
  }

  test("m09 keyframe dedup: hashes match a direct recompute; groups partition; planted dups found") {
    val rows = Multimodal.queries("m09_keyframe_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3),
        r.getLong(4), r.getInt(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // driver recompute on a sample of docs: scene starts + frame hash
    rows.filter(_._1 % 37 == 0).groupBy(_._1).foreach { case (id, scenes) =>
      val img = Multimodal.decodePpm(Multimodal.ppmPayload(id % 97))
      val starts = Multimodal.sceneStartsOf(img.pixels)
      val expect = starts.zipWithIndex.map { case (st, idx) =>
        (idx, st, Multimodal.frameHashBits(img.pixels, st * 192))
      }
      assert(scenes.sortBy(_._2).map(s => (s._2, s._3, s._4)).toSeq == expect,
        s"doc $id keyframes must match the direct decode")
    }
    // groups partition the keyframe set and the rep is the argmin member
    val byHash = rows.groupBy(_._4)
    byHash.foreach { case (_, g) =>
      assert(g.map(_._7).distinct.length == 1 && g.head._7 == g.length.toLong)
      val rep = g.map(x => (x._1, x._2)).min
      assert(g.forall(x => (x._5, x._6) == rep), "rep must be the lexicographic argmin")
    }
    // the mod-97 media library plants real cross-video duplicates
    assert(byHash.exists(_._2.map(_._1).distinct.length >= 2),
      "re-used footage must group across videos")
    // m07 agreement where the payloads coincide (doc_id < 97)
    val m07 = Multimodal.queries("m07_scene_detect")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).groupBy(_._1).view.mapValues(_.length)
    rows.filter(_._1 < 97).groupBy(_._1).foreach { case (id, scenes) =>
      assert(scenes.length == m07(id), s"doc $id scene count must agree with m07")
    }
  }

  test("s14 incremental add: merged lists bit-equal a full rebuild; new vectors searchable; recall floor") {
    val cents = Similarity.s14Cents(spark, sf)
    val all = sources.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    // add-then-merge must equal assigning the whole set under the same
    // frozen quantizer — the no-retrain-needed claim, bit-exact
    val merged = Similarity.s14CorpusAssigned(spark, sf)
      .union(Similarity.Ivf.assign(
        all.filter(col("vec_id") % 2 =!= 0), cents))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val rebuilt = Similarity.Ivf.assign(all, cents)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(merged == rebuilt, "incremental add must equal a full rebuild")
    // the served query: deterministic, and the late-added (odd) vectors
    // are first-class results
    val got = Similarity.queries("s14_ann_add")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Similarity.queries("s14_ann_add")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    assert(got.exists(_._1 % 2 != 0), "an added vector must be retrievable")
    // the served answer is EXACTLY what a full rebuild would serve —
    // the operator's actual claim (recall itself is the quantizer's
    // property, owned by s04's planted-cluster floor)
    val q0 = sources.Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val rebuildServed = Similarity.Ivf.topK(
        Similarity.Ivf.assign(all, cents).filter(col("vec_id") =!= 0),
        cents, q0, 4, 10)
      .collect().map(r => (r.getLong(0),
        BigDecimal(r.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(x => (-x._2, x._1)).toSeq
    assert(got == rebuildServed, "add-then-serve must equal rebuild-then-serve")
    // recall vs the exact scan: uniform random vectors are IVF's worst
    // case (no cluster structure — chance is nprobe/k = 0.25); assert
    // above-chance, the planted-cluster recall floor lives in s04's spec
    val exact = Similarity.queries("s01_ann_brute")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val recall = got.map(_._1).count(exact) / 10.0
    info(s"s14 recall@10 vs exact: $recall (chance 0.25 on structureless data)")
    assert(recall >= 0.3, s"recall below chance band: $recall")
  }

  test("s13 hybrid search: rank plumbing sound; RRF recomputes from ranks; deterministic") {
    val rows = Similarity.queries("s13_hybrid_search")(spark, sf).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getDouble(3)))
    assert(rows.length == 20)
    // every rank is a valid 1..50 position; at least one doc is fused
    // from BOTH modalities (the operator's point)
    assert(rows.forall(r => r._2.forall(k => k >= 1 && k <= 50)
      && r._3.forall(k => k >= 1 && k <= 50)))
    assert(rows.exists(r => r._2.isDefined && r._3.isDefined),
      "some doc must be retrieved by both modalities")
    // RRF is a pure function of the emitted ranks — recompute it
    rows.foreach { case (id, kr, vr, rrf) =>
      val want = BigDecimal(kr.map(k => 1.0 / (60 + k)).getOrElse(0.0)
        + vr.map(k => 1.0 / (60 + k)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rrf == want, s"doc $id: rrf $rrf != recompute $want")
    }
    // emitted in fused order, tie-broken by doc_id
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 > b._4 || (a._4 == b._4 && a._1 < b._1))
      case _ =>
    }
    // a rank-1 keyword doc and a rank-1 vector doc both surface
    assert(rows.exists(_._2.contains(1)) && rows.exists(_._3.contains(1)))
    // determinism: a second run (fresh plan) emits the identical list
    val again = Similarity.queries("s13_hybrid_search")(spark, sf).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getDouble(3)))
    assert(rows.sameElements(again))
  }

  test("e11 multimodal curate: one decode feeds gate+dedup; equals composing the stages; single media scan") {
    val frame = Multimodal.queries("e11_multimodal_curate")(spark, sf)
    val rows = frame.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(rows.nonEmpty, "the gate must keep a real fraction")
    // composition equality: gate scores and verdicts from a driver
    // recompute of the same descriptor + stored embedding cosine,
    // dedup groups from the kept set's hashes
    val emb = sources.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val docIds = sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val keptRef = docIds.filter(emb.contains).flatMap { id =>
      val cells = Multimodal.cellGrays(Multimodal.ppmPayload(id % 97))
      val score = r4(cos(cells.map(_.toDouble), emb(id)))
      if (score >= 0.10)
        Some((id, score, Multimodal.phashBitsOfCells(cells)))
      else None
    }
    val grpRef = keptRef.groupBy(_._3).map { case (h, g) =>
      h -> (g.length.toLong, g.map(_._1).min) }
    val expect = keptRef.map { case (id, sc, h) =>
      val (n, rep) = grpRef(h)
      (id, sc, h, rep, n, id == rep)
    }.toSeq.sortBy(_._1)
    assert(rows == expect, {
      val diff = rows.zip(expect).find { case (g, e) => g != e }
      s"sizes ${rows.length}/${expect.length}, first mismatch: $diff"
    })
    // both stages have observable work
    assert(rows.exists(!_._6), "the dedup stage must drop at least one kept asset")
    assert(rows.length < docIds.length, "the gate must drop at least one asset")
    // SINGLE DECODE / SINGLE SCAN: the plan scans documents once (one
    // object stage computes descriptor AND hash), embeddings once.
    // Fresh frame: an EXECUTED AQE plan prints materialized query
    // stages with their subtrees repeated, inflating scan counts.
    val plan = Multimodal.queries("e11_multimodal_curate")(spark, sf)
      .queryExecution.executedPlan.toString
    def scansOf(name: String) =
      plan.linesIterator.count(l => l.contains("FileScan") && l.contains(name))
    assert(scansOf("documents.parquet") == 1,
      s"media must be scanned exactly once:\n${plan.take(1200)}")
    assert(scansOf("embeddings.parquet") == 1,
      s"the text-embedding table must be scanned exactly once")
    assert(plan.linesIterator.count(_.contains("MapPartitions")) == 1,
      "exactly one scan-stage decode pass")
  }

  test("m08 pair filter: scores match a driver recompute; keep rate real; verdict consistent") {
    val rows = Multimodal.queries("m08_pair_filter")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    // pair coverage: one row per doc that has a text embedding
    val tvecs = sources.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val docIds = sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == docIds.intersect(tvecs.keySet))
    // every pair's score = cosine(decoded 8x8 gray descriptor, stored
    // text embedding), recomputed independently from the raw payload
    rows.foreach { case (id, score, kept) =>
      val ivec = Multimodal.cellGrays(Multimodal.ppmPayload(id)).map(_.toDouble)
      val tvec = tvecs(id).map(_.toDouble)
      val dot = ivec.zip(tvec).map { case (a, b) => a * b }.sum
      val c = dot / math.sqrt(ivec.map(x => x * x).sum * tvec.map(x => x * x).sum)
      val expect = BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(score - expect) < 1e-9, s"doc $id: $score != $expect")
      assert(kept == (score >= Multimodal.PairTau), s"doc $id verdict")
    }
    // the gate must actually gate: keeps some, drops some
    val kept = rows.count(_._3)
    assert(kept > 0 && kept < rows.length,
      s"keep rate ${kept}/${rows.length} must be strictly between 0 and 1")
  }

  test("session_window boundary: an event at EXACTLY last+gap merges (inclusive)") {
    // empirically pins the boundary convention the q54/st12 oracle
    // encodes with `diff > gap`: Spark's session_window treats the
    // [ts, ts+gap] boundary INCLUSIVELY, merging an exact-gap event —
    // the same convention as q26's lag formulation, so the two agree
    // on every input, boundary included. If a Spark upgrade ever
    // flips this to end-exclusive, this spec fails before any oracle
    // mismatch can.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, session_window, count, lit}
    val t0 = 1700000000000000L
    val ev = Seq(
      (1L, t0),
      (1L, t0 + 30L * 60 * 1000000), // EXACTLY +30 min -> merges
      (1L, t0 + 30L * 60 * 1000000 + 1), // 1µs past the boundary of the
                                         // EXTENDED window: still merges
      (1L, t0 + 91L * 60 * 1000000)) // far past -> new session
      .toDF("user_id", "us")
      .select(col("user_id"),
        org.apache.spark.sql.functions.timestamp_micros(col("us")).as("ts"))
    val sessions = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n")).collect()
    assert(sessions.length == 2, s"got ${sessions.mkString(";")}")
    assert(sessions.map(_.getLong(2)).sorted.toSeq == Seq(1L, 3L))
  }

  test("q54 native session windows agree with q26's lag+cumsum sessionization") {
    val native = Relational.q54SessionWindow(spark, sf).collect()
      .map(r => (r.getLong(0), String.valueOf(r.get(1)), r.getInt(2).toLong,
        math.round(r.getDouble(3) * 100))).toSet
    val manual = Relational.q26Sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), String.valueOf(r.get(2)), r.getLong(4),
        math.round(r.getDouble(5) * 100))).toSet
    assert(native == manual,
      "two session formulations (built-in merge vs lag+cumsum) must produce identical sessions")
  }

  test("e03 incremental curation: composes gates + in-batch dedup + corpus anti-join") {
    val out = operators.Pipeline.queries("e03_curate_incremental")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(out.forall(_ % 2 != 0), "only new-batch (odd) docs can survive")
    // survivors = (e01's gate+dedup applied to the odd batch) minus d07's matches
    val e01Odd = operators.Pipeline.e01Curate(spark, sf).collect()
      .map(_.getLong(0)).filter(_ % 2 != 0).toSet
    val matched = Dedup.d07Incremental(spark, sf).collect().map(_.getLong(1)).toSet
    // e01 dedups across the WHOLE corpus while e03 dedups within the
    // batch - an odd doc whose duplicate keeper is even survives in
    // e03 but not e01, so e03 ⊇ (e01∩odd)−matched and every extra has
    // an even duplicate keeper
    assert((e01Odd -- matched).subsetOf(out))
    (out -- (e01Odd -- matched)).foreach { id =>
      assert(!matched.contains(id), s"doc $id must not be corpus-matched")
    }
  }

  test("q55 argmax: struct-ordered max is the tie-safe argmax, matches a direct scan") {
    val rows = Relational.q55Argmax(spark, sf).collect()
    val li = sources.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_orderkey", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.foreach { r =>
      val g = li.filter(_._1 == r.getString(0))
      val top = g.maxBy(x => (x._3, x._2))
      val bot = g.minBy(x => (x._3, x._2))
      assert(r.getLong(1) == top._2 && r.getDouble(2) == top._3,
        s"flag ${r.getString(0)}: top must be the (price, key)-max row")
      assert(r.getLong(3) == bot._2 && r.getDouble(4) == bot._3,
        s"flag ${r.getString(0)}: bottom must be the (price, key)-min row")
    }
  }

  test("q56 gap fill: dense hourly spine, zeros where no events, totals preserved") {
    val rows = Relational.q56GapFill(spark, sf).collect()
    val hours = rows.map(r => String.valueOf(r.get(0)))
    assert(hours.distinct.length == hours.length, "spine hours must be unique")
    // dense: n rows == hours between bounds inclusive
    val n = rows.length
    assert(n >= 2)
    // totals preserved: filled counts re-sum to the raw purchase count
    val total = sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(1)).sum == total,
      "gap filling must add only zeros, never lose or duplicate counts")
  }

  test("q57 correlated scalar subquery decorrelates to agg + left outer join") {
    val df = Relational.queries("q57_correlated_scalar")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Join") && plan.contains("Aggregate")
      || plan.contains("HashAggregate"),
      "Catalyst must decorrelate - never a per-row probe")
    val rows = df.collect()
    // NULL where the customer has no orders; value = that customer's max
    val maxByCust = sources.Tables.orders(spark, sf)
      .groupBy("o_custkey").agg(org.apache.spark.sql.functions.max("o_totalprice"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val ck = r.getLong(0)
      maxByCust.get(ck) match {
        case Some(m) => assert(!r.isNullAt(2) && r.getDouble(2) == m)
        case None    => assert(r.isNullAt(2), s"customer $ck has no orders -> NULL")
      }
    }
  }

  test("q58 forward fill: nulls take the key's most recent value; leading nulls stay") {
    val rows = Relational.q58ForwardFill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    // recompute LOCF single-threaded per user in emission (event_id) order
    // grouped by user: event_id order == (ts, event_id) order per user here?
    // not guaranteed - so sort by nothing extra: rebuild from the raw table
    val raw = sources.Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), String.valueOf(r.get(2)), r.getDouble(3)))
    val expect = raw.groupBy(_._2).iterator.flatMap { case (_, g) =>
      var carry: Option[Double] = None
      g.sortBy(x => (x._3, x._1)).map { case (eid, _, _, v) =>
        val m = if (v < 2) None else Some(math.round(v * 100) / 100.0)
        if (m.isDefined) carry = m
        eid -> ((m, carry))
      }.iterator
    }.toMap
    rows.foreach { case (eid, _, m, f) =>
      val (em, ef) = expect(eid)
      assert(m == em && f == ef, s"event $eid: LOCF must match the direct recompute")
    }
    assert(rows.exists(r => r._3.isEmpty && r._4.isDefined), "some null was filled")
  }

  test("q59 stats agg: moment-sum corr/stddev/covar match a direct recompute") {
    val rows = Relational.q59StatsAgg(spark, sf).collect()
    val li = sources.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // decimal-overflow guard: with ANSI off a saturated DECIMAL(38,4)
    // sum would come back as a SILENT NULL aggregate — every published
    // moment must be non-null (headroom math in the q59 Scaladoc)
    rows.foreach { r =>
      (1 until r.length).foreach(i =>
        assert(!r.isNullAt(i), s"${r.getString(0)}: null aggregate at column $i " +
          "(decimal moment sum overflowed?)"))
    }
    rows.foreach { r =>
      val g = li.filter(_._1 == r.getString(0))
      val n = g.length.toDouble
      def r2(v: Double) = math.round(v * 100) / 100.0 // decimal(18,2) quantize
      val sx = g.map(x => r2(x._2)).sum;  val sy = g.map(x => r2(x._3)).sum
      val sxx = g.map(x => r2(x._2) * r2(x._2)).sum
      val syy = g.map(x => r2(x._3) * r2(x._3)).sum
      val sxy = g.map(x => r2(x._2) * r2(x._3)).sum
      val covar = (sxy - sx * sy / n) / n
      val corr = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(math.abs(r.getDouble(1) - covar) < 1e-2,
        s"${r.getString(0)}: covar_pop")
      assert(math.abs(r.getDouble(3) - corr) < 1e-4,
        s"${r.getString(0)}: corr")
    }
  }

  test("q60 mode: deterministic modal value with smallest-value tie break") {
    val rows = Relational.q60Mode(spark, sf).collect()
    val cust = sources.Tables.customer(spark, sf)
      .select("c_nationkey", "c_mktsegment").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    rows.foreach { r =>
      val counts = cust.filter(_._1 == r.getInt(0)).groupBy(_._2)
        .map { case (seg, xs) => (seg, xs.length) }
      val best = counts.minBy { case (seg, c) => (-c, seg) }
      assert(r.getString(1) == best._1 && r.getLong(2) == best._2.toLong,
        s"nation ${r.getInt(0)}: mode must be (count desc, value asc) best")
    }
    assert(rows.length == cust.map(_._1).distinct.length)
  }

  test("q61 window distinct: collect_set size equals a per-key distinct count") {
    val rows = Relational.q61WindowDistinct(spark, sf).collect()
    val orders = sources.Tables.orders(spark, sf)
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = orders.groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).distinct.length }
    rows.foreach(r => assert(r.getInt(2) == expect(r.getLong(1)),
      s"custkey ${r.getLong(1)}: distinct priority count"))
  }

  test("q62 ratio to report: shares sum to 1 and the window runs over the aggregate") {
    val df = Relational.q62RatioToReport(spark, sf)
    val rows = df.collect()
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4,
      "shares must sum to ~1")
    assert(rows.length <= 25, "one row per nation")
    // the global-total window must consume the aggregate, not the scan:
    // the Window's child exchange carries n_nation rows (SinglePartition
    // AFTER a HashAggregate), never the raw lineitem
    val plan = df.queryExecution.executedPlan.toString
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0)
    // tree prints parent-first: the window's CHILD chain must be the
    // single-partition exchange fed by the aggregate (corpus collapsed
    // before anything single-partition)
    assert(plan.indexOf("Exchange SinglePartition", winIdx) >= 0 &&
      plan.indexOf("HashAggregate", winIdx) >
        plan.indexOf("Exchange SinglePartition", winIdx),
      "aggregate must collapse the corpus before the single-partition window:\n" +
        plan.take(800))
  }

  test("d12 span dedup: cleaned docs match a direct recompute; hot set broadcast") {
    val df = Dedup.d12SpanDedup(spark, sf)
    val plan = GraftSession.explainPlan(df)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("Broadcast"),
      "hot-span set must broadcast, never shuffle the corpus:\n" + plan.take(600))
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    // direct single-threaded recompute of the same semantics
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def segsOf(t: String): Seq[String] =
      t.split(" ", -1).grouped(8).map(_.mkString(" ")).toSeq
    val counts = scala.collection.mutable.Map.empty[String, Int]
    docs.foreach(d => segsOf(d._2).foreach(sg => counts(sg) = counts.getOrElse(sg, 0) + 1))
    val expect = docs.map { case (id, t) =>
      val segs = segsOf(t)
      val (hot, kept) = segs.partition(sg => counts(sg) >= 2)
      (id, kept.mkString(" "), hot.length.toLong)
    }
    assert(rows.length == expect.length)
    rows.zip(expect).foreach { case (g, e) =>
      assert(g == e, s"doc ${e._1}: span-dedup must match the recompute")
    }
    assert(rows.exists(_._3 > 0), "the corpus plants duplicated spans")
    assert(rows.exists(_._3 == 0), "not every doc is boilerplate")
  }

  test("d14 substring dedup: stride-1 recompute matches; catches at least d12's aligned hot mass") {
    val df = Dedup.d14SubstringDedup(spark, sf)
    val plan = GraftSession.explainPlan(df)
    assert(plan.contains("Broadcast"),
      "hot-shingle set must broadcast, never shuffle the corpus:\n" + plan.take(600))
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val docs = sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // direct single-threaded recompute: stride-1 width-8 shingles,
    // corpus-hot anchors, per-doc covered-island removal
    def shingles(t: String): Seq[(Int, String)] = {
      val ws = t.split(" ", -1)
      if (ws.length < 8) Seq.empty
      else (1 to ws.length - 7).map(p => (p, ws.slice(p - 1, p + 7).mkString(" ")))
    }
    val counts = scala.collection.mutable.Map.empty[String, Int]
    docs.foreach(d => shingles(d._2).foreach { case (_, sg) =>
      counts(sg) = counts.getOrElse(sg, 0) + 1
    })
    val expect = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      val cov = shingles(t).filter(x => counts(x._2) >= 2)
        .flatMap(x => x._1 until (x._1 + 8)).toSet
      val kept = ws.zipWithIndex.collect { case (w0, i) if !cov.contains(i + 1) => w0 }
      (id, kept.mkString(" "), cov.size.toLong)
    }
    assert(rows.length == expect.length)
    rows.zip(expect).foreach { case (g, e) =>
      assert(g == e, s"doc ${e._1}: substring-dedup must match the recompute")
    }
    assert(rows.exists(_._3 > 0), "the corpus plants duplicated spans")
    assert(rows.exists(_._3 == 0), "not every doc is boilerplate")
    // any FULL-width segment d12 removes is a repeated stride-1 shingle
    // too, so d14's covered word mass is >= d12's full-width segment
    // mass; at most ONE removed segment per doc (the tail) is
    // sub-width, hence the (r - 1) * 8 floor
    val d12 = Dedup.d12SpanDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    rows.foreach { case (id, _, n14) =>
      val floor = math.max(0L, (d12(id) - 1) * 8)
      assert(n14 >= floor,
        s"doc $id: d14 covered $n14 words but d12 removed ${d12(id)} aligned segments")
    }
  }

  test("PlanAudit flags: exact-name BNLJ allowlist, count-exact, seeded wrong plans flag") {
    def bnljPlan(n: Int) =
      (1 to n).map(_ => "BroadcastNestedLoopJoin BuildRight").mkString("\n")
    // an allowed query at its justified count: clean
    assert(PlanAudit.auditFlags("s01_ann_brute", bnljPlan(2)).isEmpty)
    // a SECOND accidental BNLJ inside an allowed query still flags
    assert(PlanAudit.auditFlags("s01_ann_brute", bnljPlan(4)).exists(_.contains("BNLJ")))
    // an unlisted query with any BNLJ flags — including names the old
    // substring allowlist would have silently exempted
    assert(PlanAudit.auditFlags("d99_new_query", bnljPlan(2)).nonEmpty)
    assert(PlanAudit.auditFlags("d17_cascade_x", bnljPlan(2)).nonEmpty)
    assert(PlanAudit.auditFlags("x_dsir_like", bnljPlan(2)).nonEmpty)
    // an allowed query that LOSES its justified broadcast also flags
    // (a silent plan regression to SMJ would change the count to 0)
    assert(PlanAudit.auditFlags("t21_ppl_bucket", bnljPlan(0)).nonEmpty)
    // cartesian: only the intended cross join is exempt (seeded plan
    // keeps q10's pinned BNLJ count so only the cartesian rule decides)
    assert(PlanAudit.auditFlags("q10_join_cross",
      bnljPlan(2) + "\nCartesianProduct").isEmpty)
    assert(PlanAudit.auditFlags("q11_join_multiway", "CartesianProduct")
      .contains("⚠CARTESIAN"))
    // word-start counting: ObjectHashAggregate is not a HashAggregate
    assert(PlanAudit.countOf("ObjectHashAggregate", "HashAggregate") == 0)
    assert(PlanAudit.countOf("HashAggregate ObjectHashAggregate", "HashAggregate") == 1)
  }

  test("t25 line dedup: driver recompute matches; intra-doc dups removed; drop gate fires correctly") {
    import spark.implicits._
    val rows = TextAnalysis.queries("t25_line_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4), r.getString(5))).toSeq
    // single-threaded recompute of the 12-word reflow + hot-line rule
    val docs = sources.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def reflow(t: String): Seq[String] = {
      val ws = t.split(" ", -1)
      (0 until math.ceil(ws.length / 12.0).toInt)
        .map(i => ws.slice(i * 12, i * 12 + 12).mkString(" "))
    }
    val counts = scala.collection.mutable.Map.empty[String, Int]
    docs.foreach(d => reflow(d._2).foreach(l => counts(l) = counts.getOrElse(l, 0) + 1))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = docs.map { case (id, t) =>
      val lines = reflow(t)
      val kept = lines.filter(counts(_) < 2)
      val nRem = lines.length - kept.length
      val frac = nRem.toDouble / lines.length
      (id, lines.length.toLong, nRem.toLong, r4(frac), frac < 0.3, kept.mkString(" "))
    }.sortBy(_._1).toSeq
    assert(rows == expect, {
      val diff = rows.zip(expect).find { case (g, e) => g != e }
      s"first mismatch: $diff"
    })
    assert(rows.exists(_._3 > 0), "the corpus must surface duplicated lines")
    // the BOTH-copies rule and the drop gate, on a planted corpus:
    // doc 100 repeats one line intra-doc; docs 200/201 share a line
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ")
    def uniq(tag: String) = (1 to 12).map(i => s"$tag$i").mkString(" ")
    val planted = Seq(
      (100L, Seq(boiler, boiler, uniq("x")).mkString(" ")), // 2/3 removed -> drop
      (200L, Seq(boiler, uniq("y"), uniq("z"), uniq("w")).mkString(" ")), // 1/4 -> keep
      (201L, Seq(uniq("q"), boiler, uniq("r"), uniq("t")).mkString(" "))) // 1/4 -> keep
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.expr(
          """transform(sequence(0, cast(ceil(size(split(text, ' ')) / 12.0)
            |  as int) - 1),
            |  i -> array_join(slice(split(text, ' '), i * 12 + 1, 12), ' '))"""
            .stripMargin).as("lines"))
    val p = TextAnalysis.t25Pipeline(spark, planted).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4), r.getString(5))).toMap
    assert(p(100L) == ((2L, false, uniq("x"))),
      s"intra-doc copies must BOTH go and the doc must drop: ${p(100L)}")
    assert(p(200L)._1 == 1L && p(200L)._2, s"doc 200: ${p(200L)}")
    assert(p(201L)._1 == 1L && p(201L)._2, s"doc 201: ${p(201L)}")
    // the SHARED hostile-corpus guard applies here too: below the
    // limit the hot probe degrades to a shuffle join, answers unchanged
    val conf = "spark.graft.hotBroadcastLimit"
    val prev = spark.conf.getOption(conf)
    try {
      spark.conf.set(conf, "0")
      val guarded = TextAnalysis.t25Pipeline(spark, planted)
      val plan = GraftSession.explainPlan(guarded)
      assert(!plan.contains("BroadcastHashJoin LeftOuter"),
        s"above the limit the hot probe must not broadcast:\n${plan.take(900)}")
      val g = guarded.collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4), r.getString(5))).toMap
      assert(g == p, "the guard must not change answers")
    } finally prev match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  test("d14 hostile-corpus guard: oversized hot set degrades broadcast to shuffle, answers unchanged") {
    import spark.implicits._
    // planted boilerplate-heavy corpus: a site-wide template shared by
    // many docs makes the hot set large relative to the corpus
    val template = (1 to 30).map(i => s"boiler$i").mkString(" ")
    val docs = (0L until 40L).map { i =>
      val unique = (1 to 10).map(j => s"u${i}w$j").mkString(" ")
      (i, s"$template $unique")
    }.toDF("doc_id", "text")
    val conf = "spark.graft.hotBroadcastLimit"
    val prev = spark.conf.getOption(conf)
    try {
      // default path (limit far above the hot count): broadcast probe
      spark.conf.unset(conf)
      val base = Dedup.d14Pipeline(spark, docs)
      // the INNER join is the hot-segment probe (the LeftOuter hits
      // join is doc-keyed and rightly broadcasts in both paths)
      assert(GraftSession.explainPlan(base).contains("BroadcastHashJoin Inner"),
        "under the limit the hot probe must broadcast")
      val want = base.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      // hostile path: limit below the planted hot-set size — the probe
      // must leave the broadcast for a shuffle join
      spark.conf.set(conf, "4")
      val guarded = Dedup.d14Pipeline(spark, docs)
      val plan = GraftSession.explainPlan(guarded)
      assert(!plan.contains("BroadcastHashJoin Inner"),
        s"above the limit the hot probe must not broadcast:\n${plan.take(1200)}")
      assert(plan.contains("ShuffledHashJoin Inner") || plan.contains("SortMergeJoin Inner"),
        s"the guard must engage a shuffle join:\n${plan.take(1200)}")
      val got = guarded.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(got == want, "the guard must not change answers")
      assert(want.forall(_._3 >= 30), "every doc's template must be removed")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(conf, v)
        case None => spark.conf.unset(conf)
      }
    }
  }

  test("long-cents money sums are bit-identical to the decimal plan on every consumer") {
    // PREMISE: every money double is the nearest representation of an
    // exactly-2-decimal value, so round(c·100) recovers exact cents
    // with error far below 0.5 (the proof's only data assumption)
    val money = Seq(
      sources.Tables.lineitem(spark, sf).select(col("l_extendedprice").as("c")),
      sources.Tables.lineitem(spark, sf).select(col("l_discount").as("c")),
      sources.Tables.lineitem(spark, sf).select(col("l_quantity").as("c")),
      sources.Tables.orders(spark, sf).select(col("o_totalprice").as("c")),
      sources.Tables.part(spark, sf).select(col("p_retailprice").as("c")))
    money.foreach { df =>
      val dev = df.agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.abs(col("c") * 100 -
            org.apache.spark.sql.functions.round(col("c") * 100))))
        .head().getDouble(0)
      assert(dev < 1e-6, s"money column deviates from 2 decimals by $dev")
    }
    // PATH EQUIVALENCE: every query on the cents fast path must
    // produce the decimal plan's rows BIT FOR BIT (the DuckDB oracle
    // pins the decimal semantics; == on boxed doubles is bitwise
    // modulo NaN, and these columns are never NaN)
    val affected = Seq("q04_agg_group", "q05_having", "q07_join_inner",
      "q08_join_left", "q11_join_multiway", "q17_agg_global",
      "q18_window_funcs", "q24_rollup", "q28_scalar_subquery",
      "q34_moving_avg", "q35_cube", "q46_histogram", "q49_unpivot",
      "q51_filtered_agg", "q54_session_window", "q62_ratio_to_report",
      "q69_skew_join")
    val key = "spark.graft.moneySum.decimal"
    val prev = spark.conf.getOption(key)
    try {
      affected.foreach { name =>
        spark.conf.unset(key) // default: the cents fast path
        val fast = Relational.queries(name)(spark, sf).collect().toSeq
        spark.conf.set(key, "true")
        val slow = Relational.queries(name)(spark, sf).collect().toSeq
        assert(fast == slow,
          s"$name: cents path diverged from the decimal plan: " +
            s"${fast.zip(slow).find { case (a, b) => a != b }}")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
