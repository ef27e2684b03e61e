package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic hash-based splitting/sampling: stable membership,
  * approximately-right fractions, leakage-free disjointness. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (0L until 10000L).toDF("id")

  test("splitLabel fractions approximate 80/10/10 and are disjoint + exhaustive") {
    val got = ids.select(col("id"), Sampling.splitLabel(col("id"), 80, 10).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.values.sum shouldBe 10000L
    got("train").toDouble shouldBe 8000.0 +- 300.0
    got("val").toDouble shouldBe 1000.0 +- 150.0
    got("test").toDouble shouldBe 1000.0 +- 150.0
  }

  test("assignment is a pure function of the id: stable across runs and partitionings") {
    val a = ids.select(col("id"), Sampling.splitLabel(col("id"), 80, 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = ids.repartition(13).select(col("id"),
        Sampling.splitLabel(col("id"), 80, 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    a shouldBe b
    // appending new rows never moves existing ones (no train/test leakage)
    val extended = (0L until 20000L).toDF("id")
      .select(col("id"), Sampling.splitLabel(col("id"), 80, 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ids.collect().map(_.getLong(0)).foreach { i =>
      extended(i) shouldBe a(i)
    }
  }

  test("packBins: every doc in exactly one bin; bins start under target; deterministic") {
    val docs = (0L until 2000L).map(i => (i, (i % 300) + 1)).toDF("id", "nt")
    val packed = Sampling.packBins(docs, "id", "nt", targetTokens = 512L,
      nBuckets = 8)
    packed.count() shouldBe 2000L // narrow map: no row lost or duplicated
    // cumulative-sum packing invariant: a bin's preceding load is under
    // the target when each doc is placed (bin_id = floor(prefix/target))
    val maxBin = packed.groupBy("pack_bucket")
      .agg(org.apache.spark.sql.functions.max("bin_id").as("mb"),
        org.apache.spark.sql.functions.sum("nt").as("tot"))
      .collect()
    maxBin.foreach { r =>
      val bins = r.getLong(0 + 1) + 1 // mb is col 1
      val tot = r.getLong(2)
      // #bins can't exceed what the token mass demands by much: each
      // bin except possibly the last holds >= target - max_doc tokens
      bins should be <= (tot / (512 - 300) + 1)
    }
    // deterministic across partitionings
    val again = Sampling.packBins(docs.repartition(7), "id", "nt", 512L, 8)
      .select("id", "pack_bucket", "bin_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    packed.select("id", "pack_bucket", "bin_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1) shouldBe again
  }

  test("stratifiedSample applies per-stratum quotas; default covers the rest") {
    val docs = (0L until 9000L).map(i =>
      (i, Seq("en", "de", "fr")(i.toInt % 3))).toDF("id", "lang")
    val kept = Sampling.stratifiedSample(docs, "id", "lang",
      fractions = Map("en" -> 0.5, "de" -> 0.1), default = 0.0)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.getOrElse("fr", 0L) shouldBe 0L            // default 0 drops
    byLang("en").toDouble shouldBe 1500.0 +- 200.0     // 0.5 × 3000
    byLang("de").toDouble shouldBe 300.0 +- 100.0      // 0.1 × 3000
    // membership is stratum-independent: the en rows kept here are
    // exactly the rows a plain 0.5 sample of the en slice keeps
    val enOnly = Sampling.deterministicSample(
      docs.filter(col("lang") === "en"), "id", 0.5)
      .collect().map(_.getLong(0)).toSet
    kept.filter(col("lang") === "en").collect().map(_.getLong(0)).toSet shouldBe enOnly
  }

  test("weightedMix keeps ~weight of each source, tagged and deterministic") {
    val a = (0L until 5000L).toDF("id")
    val b = (100000L until 105000L).toDF("id")
    val mixed = Sampling.weightedMix(Seq(a -> 0.5, b -> 0.1), "id")
    val bySource = mixed.groupBy("source_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    bySource(0).toDouble shouldBe 2500.0 +- 250.0
    bySource(1).toDouble shouldBe 500.0 +- 120.0
    // reproducible
    Sampling.weightedMix(Seq(a -> 0.5, b -> 0.1), "id").count() shouldBe
      mixed.count()
  }

  test("groupSample: exactly k per group, reservoir-stable under appends") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val s1 = Sampling.groupSample(docs, "grp", "id", k = 10)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    s1.groupBy(_._1).view.mapValues(_.length).toMap shouldBe
      Map("g0" -> 10, "g1" -> 10, "g2" -> 10)
    // deterministic across runs
    Sampling.groupSample(docs, "grp", "id", k = 10)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet shouldBe s1.toSet
    // reservoir property: appending one row displaces AT MOST one
    // prior member of its group (membership is hash-rank, not order)
    val appended = docs.unionByName(Seq((999L, "g0")).toDF("id", "grp"))
    val s2 = Sampling.groupSample(appended, "grp", "id", k = 10)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    (s1.toSet -- s2).size should be <= 1
    s2.filter(_._1 != "g0") shouldBe s1.toSet.filter(_._1 != "g0")
  }

  test("deterministicSample keeps ~fraction of rows, and a sub-fraction nests") {
    val s10 = Sampling.deterministicSample(ids, "id", 0.1)
      .collect().map(_.getLong(0)).toSet
    s10.size.toDouble shouldBe 1000.0 +- 150.0
    // a smaller cut of the same bucket space is a subset: shrinking the
    // sample never introduces rows the larger sample didn't have
    val s5 = Sampling.deterministicSample(ids, "id", 0.05)
      .collect().map(_.getLong(0)).toSet
    s5.subsetOf(s10) shouldBe true
  }

  /** JVM reference of weightedSample's quantized A-ES key. */
  private def refKeyQ(id: Long, w: Double): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 4294967296.0
    math.floor(1e9 * math.log(u) / w).toLong
  }

  test("weightedSample matches the JVM A-ES reference; bad weights excluded") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10.0)), (2L, Some(100.0)), (3L, Some(1.0)),
      (4L, Option.empty[Double]), (5L, Some(0.0)), (6L, Some(-3.0)),
      (7L, Some(50.0)), (8L, Some(5.0)))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", n = 3)
      .select("id", "key_q").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = Seq(1L -> 10.0, 2L -> 100.0, 3L -> 1.0, 7L -> 50.0, 8L -> 5.0)
      .map { case (id, w) => (id, refKeyQ(id, w)) }
      .sortBy { case (id, k) => (-k, id) }.take(3)
    got.toSeq shouldBe want
  }

  test("weightedSample selection tracks weight; membership is partition-stable") {
    import spark.implicits._
    // 5000 light rows (w=1) vs 500 heavy rows (w=20): heavy mass is
    // 10000/15000 → expect heavy to dominate a 500-row sample far
    // beyond its 9% population share
    val df = ((1L to 5000L).map(i => (i, 1.0)) ++
      (10001L to 10500L).map(i => (i, 20.0))).toDF("id", "w")
    val sample = Sampling.weightedSample(df, "id", "w", n = 500)
      .select("id").collect().map(_.getLong(0)).toSet
    val heavy = sample.count(_ > 10000L)
    heavy.toDouble should be > 200.0 // ~9% share would be ~45
    // identical membership regardless of physical partitioning
    val sample2 = Sampling.weightedSample(df.repartition(13), "id", "w", n = 500)
      .select("id").collect().map(_.getLong(0)).toSet
    sample2 shouldBe sample
  }

  test("weightedSamplePerGroup: n per group, keys match the global sampler's") {
    import spark.implicits._
    val df = ((1L to 100L).map(i => (i, "a", i.toDouble)) ++
      (201L to 205L).map(i => (i, "b", 1.0))).toDF("id", "grp", "w")
    val got = Sampling.weightedSamplePerGroup(df, "id", "w", "grp", n = 10)
      .select("id", "grp", "key_q", "rnk").collect()
    got.count(_.getString(1) == "a") shouldBe 10
    got.count(_.getString(1) == "b") shouldBe 5 // under-full group kept whole
    // per-row keys identical to the global sampler's quantized A-ES key
    got.foreach { r =>
      r.getLong(2) shouldBe refKeyQ(r.getLong(0),
        if (r.getString(1) == "a") r.getLong(0).toDouble else 1.0)
    }
    // ranks are dense 1..n within each group
    got.filter(_.getString(1) == "a").map(_.getLong(3)).sorted shouldBe
      (1L to 10L).toArray
  }

  test("weightedSample plan is a TakeOrderedAndProject, not a global sort") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, 2.0)).toDF("id", "w")
    val plan = Sampling.weightedSample(df, "id", "w", n = 10)
      .queryExecution.executedPlan.toString()
    plan should include("TakeOrderedAndProject")
  }

  test("leakageSafeSplit: near-dup families share one split; singletons match splitLabel") {
    import spark.implicits._
    val docs = (1L to 200L).toDF("id")
    // chained family {3,7,11} (3-7, 7-11: transitive), pair {20,21},
    // everything else unclustered
    val pairs = Seq((3L, 7L), (7L, 11L), (20L, 21L)).toDF("id_a", "id_b")
    val got = Sampling.leakageSafeSplit(docs, pairs, "id",
      trainPct = 60, valPct = 20).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // whole families inherit the min-id representative's split
    got(3L)._1 shouldBe 3L
    got(7L) shouldBe got(3L)
    got(11L) shouldBe got(3L)
    got(21L) shouldBe got(20L)
    // singletons split exactly as the plain per-id label would
    val plain = docs.select(col("id"),
      Sampling.splitLabel(col("id"), 60, 20).as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (1L to 200L).filterNot(Set(7L, 11L, 21L)).foreach { i =>
      got(i)._2 shouldBe plain(i)
    }
    // the guarantee itself: no pair straddles two splits
    Seq((3L, 7L), (7L, 11L), (3L, 11L), (20L, 21L)).foreach {
      case (a, b) => got(a)._2 shouldBe got(b)._2
    }
  }

  test("clusterBalancedCap equalizes a dominant embedding mode; deterministic") {
    import spark.implicits._
    // two tight planted clusters, wildly imbalanced: 300 boilerplate
    // copies near e1, 12 diverse docs near e2
    val rnd = new scala.util.Random(11)
    def near(base: Array[Float], i: Long) =
      (i, base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f))
    val dominant = (1L to 300L).map(i => near(Array(1f, 0f, 0f, 0f), i))
    val minority = (1001L to 1012L).map(i => near(Array(0f, 0f, 1f, 0f), i))
    val df = (dominant ++ minority).toDF("vec_id", "embedding")
    val got = Sampling.clusterBalancedCap(df, "vec_id", "embedding",
      perCluster = 10, nCells = 4, trainIters = 3)
    val byCell = got.groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // no cell exceeds the cap, and the dominant mode is cut to it
    byCell.values.foreach(_ should be <= 10L)
    got.count() should be <= (10L * 4)
    // the minority cluster survives (>= 10 of its 12 members kept —
    // they may straddle two adjacent cells but cannot be crowded out
    // by the dominant mode)
    got.filter($"vec_id" >= 1000L).count() should be >= 10L
    // cap keeps the SMALLEST ids per cell (deterministic selection)
    val keptDominant = got.filter($"vec_id" < 1000L)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    if (keptDominant.nonEmpty)
      keptDominant.head shouldBe 1L
    // repartition invariance
    val again = Sampling.clusterBalancedCap(df.repartition(13), "vec_id",
      "embedding", perCluster = 10, nCells = 4, trainIters = 3)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    again shouldBe got.select("vec_id").collect().map(_.getLong(0)).sorted
  }

  test("capPerSourceWeighted: quota scales with authority, floor 1, " +
      "integer-exact caps") {
    // sources A (w=1000), B (w=500), C (w=124), D absent from the
    // prior; 8 docs each, quality = -doc_id so SMALLEST ids win
    val docs = (for (s <- Seq("A", "B", "C", "D"); i <- 0 until 8)
      yield (s, (Seq("A", "B", "C", "D").indexOf(s) * 8 + i).toLong))
      .toDF("src", "doc_id")
      .withColumn("q", -col("doc_id").cast("double"))
    val prior = Seq(("A", 1000L), ("B", 500L), ("C", 124L)).toDF("s", "w")
    val got = Sampling.capPerSourceWeighted(docs, "src", "doc_id",
      Seq(col("q").desc), maxPerSource = 8, prior, "s", "w")
    val bySrc = got.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // caps: A 8·1000 div 1000 = 8, B 8·500 div 1000 = 4,
    // C 8·124 div 1000 = 0 → floor 1, D missing → floor 1
    bySrc shouldBe Map("A" -> 8L, "B" -> 4L, "C" -> 1L, "D" -> 1L)
    // best-first within a source: B keeps its 4 smallest ids (q desc)
    got.filter(col("src") === "B").select("doc_id").collect()
      .map(_.getLong(0)).sorted shouldBe Array(8L, 9L, 10L, 11L)
    // cap_q surfaced for observability
    got.filter(col("src") === "B").select("cap_q").head.getLong(0) shouldBe 4L
    // all-zero prior refuses loud instead of silently capping to 1
    val err = intercept[IllegalArgumentException] {
      Sampling.capPerSourceWeighted(docs, "src", "doc_id",
        Seq(col("q").desc), 8, Seq(("A", 0L)).toDF("s", "w"), "s", "w")
    }
    err.getMessage should include("positive weights")
    // duplicate prior keys must NOT multiply corpus rows through the
    // join (r11 ADVICE): the conflicted key collapses to max(w), the
    // output stays duplicate-free and quota-exact
    val dupPrior = Seq(("A", 1000L), ("B", 500L), ("B", 100L), ("C", 124L))
      .toDF("s", "w")
    val got2 = Sampling.capPerSourceWeighted(docs, "src", "doc_id",
      Seq(col("q").desc), maxPerSource = 8, dupPrior, "s", "w")
    got2.groupBy("doc_id").count().filter(col("count") > 1L)
      .count() shouldBe 0L
    got2.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("A" -> 8L, "B" -> 4L, "C" -> 1L, "D" -> 1L)
  }
}
