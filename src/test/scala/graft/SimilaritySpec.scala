package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Embedding similarity: exact cosine math, brute-force top-k, and
  * LSH recall against the exact baseline. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine matches hand-computed values") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    got(0) shouldBe 0.0 +- 1e-12
    got(1) shouldBe 1.0 +- 1e-12
    got(2) shouldBe (1.0 / math.sqrt(2)) +- 1e-12
  }

  // deterministic synthetic corpus: clusters around 4 axis directions
  private def corpus(dim: Int = 64, n: Int = 200) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val base = Array.tabulate(dim)(d =>
        if (d % 4 == i % 4) 1.0f else 0.0f)
      val noisy = base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      (i.toLong, noisy)
    }.toDF("vec_id", "embedding")
  }

  test("bruteForceTopK returns k ranked neighbors per query") {
    val c = corpus()
    val q = c.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val got = Similarity.bruteForceTopK(c, q, "vec_id", "embedding", k = 5)
    got.groupBy("q_id").count().collect().foreach(_.getLong(1) shouldBe 5L)
    // ranks are 1..5 and cosine non-increasing within each query
    val perQ = got.collect().groupBy(_.getLong(0))
    perQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(3))
      sorted.map(_.getLong(3)).toSeq shouldBe (1L to 5L)
      sorted.map(_.getDouble(2)).toSeq.sliding(2).foreach {
        case Seq(a, b) => a should be >= b
        case _ =>
      }
    }
    // neighbors of query i share its cluster (i % 4)
    perQ.foreach { case (qid, rs) =>
      rs.foreach(r => (r.getLong(1) % 4) shouldBe (qid % 4))
    }
  }

  test("lshTopK recall >= 0.8 against brute force on clustered corpus") {
    val c = corpus()
    val q = c.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(c, q, "vec_id", "embedding", k = 5)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(c, q, "vec_id", "embedding", k = 5)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    recall should be >= 0.8
  }

  test("multi-probe LSH recall >= single-probe recall") {
    val c = corpus()
    val q = c.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(c, q, "vec_id", "embedding", k = 5)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(probes: Int) = {
      val got = Similarity.lshTopK(c, q, "vec_id", "embedding", k = 5,
        multiProbe = probes)
        .select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val single = recallOf(0)
    val multi = recallOf(4)
    multi should be >= single
    multi should be >= 0.85
  }

  test("ivfTopK recall >= 0.8 against brute force on clustered corpus") {
    val c = corpus()
    val q = c.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(c, q, "vec_id", "embedding", k = 5)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(c, q, "vec_id", "embedding", k = 5,
      nCentroids = 8, nProbe = 3)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    recall should be >= 0.8
  }

  test("IVF over whitened-PCA-reduced vectors: recall >= 0.8 vs exact " +
      "brute force on the ORIGINAL space (the embedding_ivf_whitened " +
      "gate contract)") {
    import graft.operators.Whitening
    val c = corpus()
    val exact = Similarity.bruteForceTopK(c,
        c.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
        "vec_id", "embedding", k = 5)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val model = Whitening.fit(c, "embedding", dim = 64)
    // unscaled projection, like the gate query: variance-scaling the
    // components would amplify the noise directions and wreck cosine.
    // k = 48 of 64 — this fixture's noise is ISOTROPIC (flat
    // spectrum), so every dropped dim genuinely moves the
    // noise-determined neighbor ranking; real embedding spectra decay
    // and tolerate deeper cuts
    val red = Whitening.pcaProject(c, "embedding", model, k = 48,
        whitened = false)
      .withColumn("embedding", col("embedding").cast(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    val q = red.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val approx = Similarity.ivfTopK(red, q, "vec_id", "embedding", k = 5,
        nCentroids = 8, nProbe = 4)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    recall should be >= 0.8
  }

  test("PQ: ADC score equals cosine against the reconstruction, bit-for-bit-ish") {
    val c = corpus(n = 120)
    val books = Similarity.trainPqCodebooks(c, "vec_id", "embedding",
      m = 8, kCodes = 8, iters = 1)
    books.length shouldBe 8
    books.foreach(_.length shouldBe 8)
    // reconstruct every vector from its codes at the driver and check
    // cos(q, x_hat) == the operator's ADC score
    val sub = books(0)(0).length
    val rows0 = c.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
    def encode(v: Array[Double]): Array[Int] =
      Array.tabulate(8) { s =>
        (0 until 8).minBy { j =>
          (0 until sub).map(i =>
            math.pow(v(s * sub + i) - books(s)(j)(i), 2)).sum
        }
      }
    def reconstruct(codes: Array[Int]): Array[Double] =
      codes.zipWithIndex.flatMap { case (j, s) => books(s)(j) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val q = c.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val qv = rows0.find(_._1 == 0L).get._2
    val got = Similarity.pqTopK(c, q, "vec_id", "embedding", k = 119,
        m = 8, kCodes = 8, iters = 1, refine = 0)
      .select("neighbor_id", "cos").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows0.filter(_._1 != 0L).foreach { case (id, v) =>
      val want = cos(qv, reconstruct(encode(v)))
      got(id) shouldBe want +- 1e-9
    }
  }

  test("pqTopK recall >= 0.8 against brute force on clustered corpus") {
    val c = corpus()
    val q = c.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(c, q, "vec_id", "embedding", k = 5)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.pqTopK(c, q, "vec_id", "embedding", k = 5)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    recall should be >= 0.8
    // query-cap guard fails loud rather than collecting unbounded
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(c, c.select(col("vec_id").as("q_id"),
        col("embedding").as("q_vec")), "vec_id", "embedding", k = 2,
        maxQueries = 10)
    }
  }

  test("pqTopK: empty query frame returns an empty result, like the family") {
    val c = corpus(n = 40)
    val q = c.filter(col("vec_id") < 0L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val got = Similarity.pqTopK(c, q, "vec_id", "embedding", k = 3,
      m = 8, kCodes = 4, iters = 0)
    got.count() shouldBe 0L
    got.columns.toSeq shouldBe Seq("q_id", "neighbor_id", "cos", "rnk")
  }

  test("PQ codebooks: save/load round-trip; injected books match retrained") {
    val c = corpus(n = 120)
    val books = Similarity.trainPqCodebooks(c, "vec_id", "embedding",
      m = 8, kCodes = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    Similarity.savePqCodebooks(spark, books, s"$dir/books")
    val loaded = Similarity.loadPqCodebooks(spark, s"$dir/books")
    loaded.length shouldBe books.length
    loaded.zip(books).foreach { case (l, b) =>
      l.zip(b).foreach { case (lc, bc) => lc.toSeq shouldBe bc.toSeq }
    }
    // scoring with injected persisted books == scoring with fresh
    // training (same deterministic k-means → same books)
    val q = c.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val a = rows(Similarity.pqTopK(c, q, "vec_id", "embedding", k = 10,
      m = 8, kCodes = 8, iters = 1).orderBy("rnk"))
    val b = rows(Similarity.pqTopK(c, q, "vec_id", "embedding", k = 10,
      m = 8, kCodes = 8, codebooks = Some(loaded)).orderBy("rnk"))
    b shouldBe a
  }

  test("ivfPqTopK: doubly-approximate candidates still clear the recall floor") {
    val c = corpus()
    val q = c.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(c, q, "vec_id", "embedding", k = 5)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfPqTopK(c, q, "vec_id", "embedding", k = 5,
      nCentroids = 8, nProbe = 3)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    recall should be >= 0.8
    // the refine stage reports TRUE cosines: every surviving score must
    // equal the exact pair cosine computed independently
    val scores = Similarity.ivfPqTopK(c, q, "vec_id", "embedding", k = 5,
        nCentroids = 8, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exactScores = Similarity.bruteForceTopK(c, q, "vec_id",
        "embedding", k = 199).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    scores.foreach { case (pair, s) =>
      s shouldBe exactScores(pair) +- 1e-12
    }
  }

  test("kmeans-trained IVF: centroids converge to the 4 planted clusters; recall >= untrained") {
    val c = corpus()
    // VectorAvg correctness: mean of a known group, element-wise
    val tiny = Seq((0, Array(1.0, 3.0)), (0, Array(3.0, 5.0)),
      (1, Array(10.0, 10.0))).toDF("g", "v")
    val means = tiny.groupBy("g")
      .agg(graft.functions.VectorFunctions.vectorAvg(col("v"), 2).as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    means(0) shouldBe Seq(2.0, 4.0)
    means(1) shouldBe Seq(10.0, 10.0)

    // Lloyd refinement with k=8 (the k=4 systematic seed lands only on
    // two of the interleaved patterns — a textbook bad init): every
    // planted cluster direction ends up covered by a trained centroid
    val trained = Similarity.kmeansCentroids(c, "vec_id", "embedding",
      nCentroids = 8, iters = 5)
    trained.length shouldBe 8
    val ideals = (0 until 4).map(m =>
      Array.tabulate(64)(d => if (d % 4 == m) 1.0 else 0.0))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    ideals.foreach { ideal =>
      trained.map(cos(_, ideal)).max should be > 0.95
    }

    // trained IVF recall is at least the untrained systematic recall
    val q = c.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteForceTopK(c, q, "vec_id", "embedding", k = 5)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(iters: Int): Double = {
      val approx = Similarity.ivfTopK(c, q, "vec_id", "embedding", k = 5,
        nCentroids = 8, nProbe = 3, trainIters = iters)
        .select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & approx).size.toDouble / exact.size
    }
    recallOf(3) should be >= recallOf(0)
    recallOf(3) should be >= 0.8
  }

  test("persisted IVF index: probe matches the in-memory build, prunes lists") {
    val c = corpus()
    val q = c.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.saveIvfIndex(c, "vec_id", "embedding", path, nCentroids = 16)
    val persisted = Similarity.ivfTopKPersisted(spark, path, q,
      "vec_id", "embedding", k = 5)
    // identical results to building the same (untrained) index in-plan
    val inMemory = Similarity.ivfTopK(c, q, "vec_id", "embedding", k = 5)
    rows(persisted.orderBy("q_id", "rnk")) shouldBe
      rows(inMemory.orderBy("q_id", "rnk"))
    // the probed-lists filter reaches the scan as a NON-EMPTY partition
    // filter on centroid (the scan always prints "PartitionFilters: []",
    // so asserting mere presence would be vacuous)
    val plan = persisted.queryExecution.executedPlan.toString
    plan should include regex "PartitionFilters: \\[[^\\]]*centroid"
  }

  test("appendToIvfIndex: batch-only scan, centroids fixed, fingerprint rolls, appended rows searchable") {
    val c = corpus(n = 150)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    // batch = near-copies of vectors 0..4 under fresh ids, staged on
    // parquet so the batch-only-scan assertion sees real file sources
    val batchDir = java.nio.file.Files.createTempDirectory("graft-ivf-batch").toString
    c.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(1e-4f)).as("embedding"))
      .write.mode("overwrite").parquet(batchDir)
    val batch = spark.read.parquet(batchDir)

    Similarity.saveIvfIndex(c, "vec_id", "embedding", path, nCentroids = 8)
    val centroidsBefore = Similarity.loadIvfCentroids(spark, path).map(_.toSeq).toSeq

    val assigned = Similarity.appendToIvfIndex(batch, "vec_id", "embedding", path)

    // the append job scans ONLY the batch — never the indexed corpus
    val scanned = assigned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    scanned should not be empty
    scanned.foreach(_ should include(batchDir))
    scanned.foreach(_ should not include path)

    // centroids untouched; assignments grew by exactly the batch
    Similarity.loadIvfCentroids(spark, path).map(_.toSeq).toSeq shouldBe centroidsBefore
    spark.read.parquet(s"$path/assignments").count() shouldBe 155L

    // fingerprint rolled forward to fp(corpus ∪ batch) — composability
    Similarity.readIndexFingerprint(spark, path) shouldBe
      Some(Similarity.corpusFingerprint(c.unionByName(batch), "vec_id",
        "embedding"))

    // appended vectors are searchable: querying with original vector i
    // finds its appended near-copy 1000+i at rank 1
    val q = c.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val top1 = Similarity.ivfTopKPersisted(spark, path, q,
      "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 3L).foreach { i => top1(i) shouldBe (i + 1000L) }
  }

  test("ivfTopKPersisted past the collect cap routes to the join path, same results") {
    val c = corpus(n = 60)
    val q = c.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-cap").toString
    Similarity.saveIvfIndex(c, "vec_id", "embedding", path, nCentroids = 8)
    val collected = Similarity.ivfTopKPersisted(spark, path, q,
      "vec_id", "embedding", k = 3)
    // cap below |Q|: the bulk route must kick in (no driver collect of
    // the query side, no static partition pruning) and return the SAME
    // ranked neighbors
    val bulk = Similarity.ivfTopKPersisted(spark, path, q,
      "vec_id", "embedding", k = 3, maxCollectQueries = 4)
    rows(bulk.orderBy("q_id", "rnk")) shouldBe
      rows(collected.orderBy("q_id", "rnk"))
    // and it really is the join plan: the localized-queries broadcast
    // of the collect path never appears (its probe frame is a
    // LocalTableScan; the bulk path scans only files)
    val leaves = bulk.queryExecution.executedPlan.collectLeaves().map(_.nodeName)
    leaves.exists(_.contains("LocalTableScan")) shouldBe false
  }

  test("appendToIvfIndex on a legacy/corrupt fingerprint fails closed: marker deleted, reuse rebuilds") {
    val c = corpus(n = 50)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-leg").toString
    Similarity.saveIvfIndex(c, "vec_id", "embedding", path, nCentroids = 8)
    // simulate a pre-upgrade marker (2-part format): rolling a batch
    // into it cannot produce a truthful combined fingerprint
    val p = new org.apache.hadoop.fs.Path(s"$path/_FINGERPRINT")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    out.write("50:49".getBytes("UTF-8")); out.close()
    val batch = c.filter(col("vec_id") < 2)
      .select((col("vec_id") + 500L).as("vec_id"), col("embedding"))
    Similarity.appendToIvfIndex(batch, "vec_id", "embedding", path)
    // the marker is GONE (not a zero-folded lie describing one batch):
    // the next reuse check mismatches and rebuilds
    Similarity.readIndexFingerprint(spark, path) shouldBe None
  }

  test("ingestEmbeddingBatch: continuous dedup across batches, index grows with survivors") {
    val c = corpus(n = 100)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-ing").toString
    Similarity.saveIvfIndex(c, "vec_id", "embedding", path, nCentroids = 8)

    def nearCopy(of: Long, as: Long) = c.filter(col("vec_id") === of)
      .select(lit(as).as("vec_id"),
        transform(col("embedding"), x => x + lit(1e-4f)).as("embedding"))
    // a vector near nothing indexed: one 8-dim block spikes at 5.0 —
    // different blocks are near-orthogonal to each other and to the 4
    // every-4th-dim cluster directions
    def novelVec(as: Long, block: Int) = {
      import spark.implicits._
      val rnd = new scala.util.Random(block)
      Seq((as, Array.tabulate(64)(d =>
        (if (d >= 8 * block && d < 8 * block + 8) 5.0f else 0.0f) +
          rnd.nextFloat() * 0.01f)))
        .toDF("vec_id", "embedding")
    }

    // batch 1: corpus dup + internal dup pair + novel
    val b1 = nearCopy(7L, 1000L)
      .unionByName(novelVec(1001L, 1))
      .unionByName(novelVec(1002L, 1)) // same block → near-dup of 1001
    val a1 = Similarity.ingestEmbeddingBatch(spark, path, b1,
      "vec_id", "embedding", threshold = 0.99)
    a1.collect().map(_.getLong(0)).toSet shouldBe Set(1001L)
    a1.unpersist()

    // batch 2: a dup of batch 1's SURVIVOR must now be caught — its
    // vector comes from the index itself (c never contained 1001)
    val b2 = spark.read.parquet(s"$path/assignments")
      .filter(col("vec_id") === 1001L)
      .select(lit(2000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(1e-4f)).as("embedding"))
      .unionByName(novelVec(2001L, 3)) // block 3 ⊥ block 1
    val a2 = Similarity.ingestEmbeddingBatch(spark, path, b2,
      "vec_id", "embedding", threshold = 0.99)
    a2.collect().map(_.getLong(0)).toSet shouldBe Set(2001L)
    a2.unpersist()

    // index = corpus + the two accepted vectors, fingerprint rolled
    spark.read.parquet(s"$path/assignments").count() shouldBe 102L
    val fp = Similarity.readIndexFingerprint(spark, path)
    fp.map(_.split(":").take(2).toSeq) shouldBe Some(Seq("102", "2001"))
  }

  test("screenEmbeddingBatch is pure: same accepts as ingest, index untouched") {
    val c = corpus(n = 100)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-scr").toString
    Similarity.saveIvfIndex(c, "vec_id", "embedding", path, nCentroids = 8)
    val fpBefore = Similarity.readIndexFingerprint(spark, path)
    val batch = c.filter(col("vec_id") === 7)
      .select(lit(1000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(1e-4f)).as("embedding"))
      .unionByName(c.filter(col("vec_id") === 3)
        .select(lit(1001L).as("vec_id"),
          transform(col("embedding"), x => x * lit(-1.0f)).as("embedding")))
    val accepted = Similarity.screenEmbeddingBatch(spark, path, batch,
      "vec_id", "embedding", threshold = 0.99)
    // the near-copy of 7 is rejected; the negated vector is novel
    accepted.collect().map(_.getLong(0)).toSet shouldBe Set(1001L)
    // index is byte-identical: same row count, same fingerprint — a
    // second screen of the SAME batch repeats the SAME answer (the
    // ingest variant would have admitted 1001 and then rejected its
    // replay)
    spark.read.parquet(s"$path/assignments").count() shouldBe 100L
    Similarity.readIndexFingerprint(spark, path) shouldBe fpBefore
    Similarity.screenEmbeddingBatch(spark, path, batch,
      "vec_id", "embedding", threshold = 0.99)
      .collect().map(_.getLong(0)).toSet shouldBe Set(1001L)
  }

  test("persisted IVF reuse is content-validated: a regenerated corpus triggers rebuild") {
    val corpusDir = java.nio.file.Files.createTempDirectory("graft-ivf-corpus").toString
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-cache").toString
    corpus(n = 100).write.mode("overwrite").parquet(corpusDir)
    // the exact reuse guard the embedding_ivf_persisted query runs
    def buildIfStale(): Boolean = {
      val emb = spark.read.parquet(corpusDir)
      val stale = !Similarity.readIndexFingerprint(spark, path)
        .contains(Similarity.corpusFingerprint(emb, "vec_id", "embedding"))
      if (stale)
        Similarity.saveIvfIndex(emb, "vec_id", "embedding", path, nCentroids = 8)
      stale
    }
    buildIfStale() shouldBe true   // cold: no marker → build
    buildIfStale() shouldBe false  // warm: fingerprint matches → reuse
    // RE-EMBEDDED corpus: same ids, same row count, different vectors
    // (a new embedding model) — count+max-id alone cannot see this;
    // the content-hash term must force the rebuild
    corpus(n = 100)
      .withColumn("embedding",
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x + org.apache.spark.sql.functions.lit(1.0f)))
      .write.mode("overwrite").parquet(corpusDir)
    buildIfStale() shouldBe true
    buildIfStale() shouldBe false
    // the corpus is regenerated in place (more rows, same path): the
    // path-keyed marker alone would serve stale lists — the content
    // fingerprint must force a rebuild
    corpus(n = 120).write.mode("overwrite").parquet(corpusDir)
    buildIfStale() shouldBe true
    spark.read.parquet(s"$path/assignments").count() shouldBe 120L
  }

  test("cosineNearDupPairs finds planted duplicates") {
    val c = corpus(n = 100)
    val shifted = c.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val got = Similarity.cosineNearDupPairs(c.unionByName(shifted),
      "vec_id", "embedding", threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // each planted copy pairs with its source
    (0L until 5L).foreach { i => got should contain((i, i + 1000L)) }
  }

  test("hyperplanes are deterministic under a fixed seed") {
    Similarity.hyperplanes(4, 8).flatten.toSeq shouldBe
      Similarity.hyperplanes(4, 8).flatten.toSeq
  }

  test("semanticNearDupPairs finds planted duplicates via learned clusters") {
    val c = corpus(n = 100)
    val shifted = c.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val got = Similarity.semanticNearDupPairs(c.unionByName(shifted),
      "vec_id", "embedding", threshold = 0.9999,
      nCentroids = 8, trainIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // an exact copy lands in its source's Voronoi cell by construction
    (0L until 5L).foreach { i => got should contain((i, i + 1000L)) }
  }

  test("semanticDedup drops planted copies, keeps originals and distant vectors") {
    val c = corpus(n = 100)
    val shifted = c.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val survivors = Similarity.semanticDedup(c.unionByName(shifted),
      "vec_id", "embedding", threshold = 0.9999,
      nCentroids = 8, trainIters = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // copies (larger ids) dropped, their sources kept
    (0L until 5L).foreach { i =>
      survivors should contain(i)
      survivors should not contain (i + 1000L)
    }
    // the 0.999 threshold separates cluster-mates (cos ≈ 0.97 under
    // the ±0.05 noise) from copies — nothing else is dropped
    survivors should have size 100
  }

  test("semanticNearDupPairs recall vs brute-force all-pairs on clustered corpus") {
    // near-dup population: small-shift copies (cos ≈ 0.99995 — well
    // above any same-cluster background pair at ≈0.997, so the exact
    // set at this threshold is the planted population; a looser
    // threshold would legitimately include cluster-mate pairs that
    // k-means cells split, which is the documented blocking trade-off,
    // not a recall bug)
    val c = corpus(n = 100)
    val near = c.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.005f)).as("embedding"))
    val all = c.unionByName(near)
    val thr = 0.9999
    // brute force: every pair, no blocking
    val a = all.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = all.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= thr)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.semanticNearDupPairs(all, "vec_id", "embedding",
      threshold = thr, nCentroids = 8, trainIters = 2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // blocking can only LOSE pairs (cell boundaries), never invent them
    got.subsetOf(exact) shouldBe true
    exact should not be empty
    val recall = (exact & got).size.toDouble / exact.size
    recall should be >= 0.9
  }

  test("semanticNearDupPairs maxCluster guard passes oversized clusters through uncompared") {
    val c = corpus(n = 100)
    val shifted = c.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val got = Similarity.semanticNearDupPairs(c.unionByName(shifted),
      "vec_id", "embedding", threshold = 0.9999,
      nCentroids = 8, trainIters = 2, maxCluster = 3)
    got.count() shouldBe 0L // every cluster holds >3 of the 105 vectors
  }

  test("int8 quantization: codes in [0,255], error <= scale/2, cosine preserved") {
    import spark.implicits._
    val c = corpus(n = 50)
    val qs = c.select(col("vec_id"), col("embedding"),
      Similarity.quantizeVector(col("embedding")).as("qs"))
    // every code in the byte range; reconstruction within scale/2 + eps
    val checked = qs.select(
      array_min(col("qs.q")).as("lo"), array_max(col("qs.q")).as("hi"),
      (array_max(zip_with(
        col("embedding").cast("array<double>"),
        Similarity.dequantizeVector(col("qs")),
        (a, b) => abs(a - b))) <= col("qs.scale") / 2 + lit(1e-12))
        .as("ok"))
      .collect()
    checked.foreach { r =>
      r.getLong(0) should be >= 0L
      r.getLong(1) should be <= 255L
      r.getBoolean(2) shouldBe true
    }
    // cosine between original and reconstruction stays ~1 (the ANN
    // usefulness criterion for SQ8)
    val cosines = qs.select(Similarity.cosine(col("embedding"),
      Similarity.dequantizeVector(col("qs"))).as("c"))
      .as[Double].collect()
    all(cosines) should be > 0.999
  }

  test("IVF over SQ8-quantized vectors recalls the float index's neighbors") {
    val c = corpus(n = 200)
    val qc = c.select(col("vec_id"),
      Similarity.dequantizeVector(
          Similarity.quantizeVector(col("embedding")))
        .cast("array<float>").as("embedding"))
    val queries = c.filter(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def topk(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", k = 5)
        .select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val float = topk(c)
    val quant = topk(qc)
    val recall = (float & quant).size.toDouble / float.size
    recall should be >= 0.9
  }

  test("native sq8Reconstruct equals dequantize(quantize(v)) bit for bit") {
    val c = corpus(n = 40)
    val both = c.select(
      Similarity.sq8Reconstruct(col("embedding")).as("native"),
      Similarity.dequantizeVector(
        Similarity.quantizeVector(col("embedding"))).as("hof"))
    both.collect().foreach { r =>
      r.getSeq[Double](0) shouldBe r.getSeq[Double](1)
    }
    // empty and constant vectors agree too
    import spark.implicits._
    val edge = Seq((1L, Array.empty[Float]), (2L, Array.fill(4)(0.5f)))
      .toDF("vec_id", "embedding")
    edge.select(
        Similarity.sq8Reconstruct(col("embedding")).as("native"),
        Similarity.dequantizeVector(
          Similarity.quantizeVector(col("embedding"))).as("hof"))
      .collect().foreach { r =>
        r.getSeq[Double](0) shouldBe r.getSeq[Double](1)
      }
  }

  test("int8 quantization: constant vector round-trips exactly") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(8)(0.25f))).toDF("vec_id", "embedding")
    val r = df.select(
      Similarity.quantizeVector(col("embedding")).as("qs"))
      .select(col("qs.scale"), col("qs.zero"),
        Similarity.dequantizeVector(col("qs")).as("back"))
      .head
    r.getDouble(0) shouldBe 1.0
    r.getSeq[Double](2).foreach(_ shouldBe 0.25.toFloat.toDouble)
  }

  test("hardNegatives: band excludes near-dups and easy negatives, ranks the rest") {
    // planted geometry in 4 dims: anchor e1; a near-duplicate
    // (cos ~0.9999), three mid-band vectors at distinct similarities,
    // and an orthogonal easy negative
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val c = Seq(
      (0L, v(1, 0, 0, 0)), // the anchor itself (self-filtered)
      (1L, v(1, 0.01, 0, 0)), // near-dup: cos > 0.99 -> excluded
      (2L, v(1, 1, 0, 0)), // cos ~0.707 -> in band
      (3L, v(1, 2, 0, 0)), // cos ~0.447 -> in band
      (4L, v(1, 4, 0, 0)), // cos ~0.243 -> in band
      (5L, v(0, 0, 1, 0)), // orthogonal: cos 0 -> excluded
      (6L, v(1, 8, 0, 0)) // cos ~0.124 -> below the band
    ).toDF("vec_id", "embedding")
    val q = Seq((0L, v(1, 0, 0, 0))).toDF("q_id", "q_vec")
    val got = rows(Similarity.hardNegatives(c, q, "vec_id", "embedding",
      k = 10, loCos = 0.2, hiCos = 0.95)
      .select("q_id", "neighbor_id", "rnk"))
    got shouldBe Seq(Seq(0L, 2L, 1L), Seq(0L, 3L, 2L), Seq(0L, 4L, 3L))
    // k caps the band: k = 2 keeps the two hardest (highest-cos)
    rows(Similarity.hardNegatives(c, q, "vec_id", "embedding",
      k = 2, loCos = 0.2, hiCos = 0.95)
      .select("neighbor_id")) shouldBe Seq(Seq(2L), Seq(3L))
    // degenerate band refused
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(c, q, "vec_id", "embedding", 5, 0.9, 0.5)
    }
  }

  test("hardNegativesIvf: probing every cell equals the exact band mine") {
    val c = corpus()
    val q = c.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = rows(Similarity.hardNegatives(c, q, "vec_id", "embedding",
      k = 8, loCos = 0.1, hiCos = 0.9).orderBy("q_id", "rnk"))
    val allProbed = rows(Similarity.hardNegativesIvf(c, q, "vec_id",
      "embedding", k = 8, loCos = 0.1, hiCos = 0.9,
      nCentroids = 8, nProbe = 8).orderBy("q_id", "rnk"))
    allProbed shouldBe exact
    // pruned probes stay inside the band and recall most of the exact set
    val pruned = Similarity.hardNegativesIvf(c, q, "vec_id", "embedding",
      k = 8, loCos = 0.1, hiCos = 0.9, nCentroids = 8, nProbe = 3)
      .collect()
    pruned.foreach { r =>
      val cos = r.getDouble(2)
      cos should be > 0.1
      cos should be <= 0.9
    }
    val exactPairs: Set[(Long, Long)] =
      exact.map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long])).toSet
    val prunedPairs = pruned.map(r => (r.getLong(0), r.getLong(1))).toSet
    (prunedPairs.intersect(exactPairs).size.toDouble /
      exactPairs.size) should be >= 0.5
  }
}
