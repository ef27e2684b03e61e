package graft

import graft.operators.SkewJoin
import graft.sources.PartitionedStore
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => sqlfn}

/** Scale-posture specs: salted joins/aggs equal their plain
  * counterparts, and date-partitioned layouts actually prune. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share key 1 — the classic hot-key shape
  private def skewed = (1 to 2000).map { i =>
    (if (i % 10 == 0) i % 5 + 2 else 1, s"payload$i")
  }.toDF("k", "v")

  private def dim = Seq((1, "hot"), (2, "a"), (3, "b"), (4, "c"), (5, "d"), (6, "e"))
    .toDF("k", "label")

  test("saltedJoin equals the plain join on skewed data") {
    val plain = skewed.join(dim, Seq("k")).orderBy("k", "v")
    val salted = SkewJoin.saltedJoin(skewed, dim, Seq("k")).orderBy("k", "v")
    rows(salted) shouldBe rows(plain)
  }

  test("saltedJoin spreads the hot key over saltFactor partitions") {
    val salted = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.map(col).toSeq: _*), lit(8)))
    val spread = salted.filter(col("k") === 1)
      .select("__salt").distinct().count()
    spread should be >= 6L // hot key occupies most of the 8 salt slots
  }

  test("saltedAgg equals the plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(sqlfn.length(col("v"))).as("chars"))
      .orderBy("k")
    val salted = SkewJoin.saltedAgg(skewed, Seq("k"), saltFactor = 8)(
      partial = Seq(count(lit(1)) -> "pn", sum(sqlfn.length(col("v"))) -> "pchars"),
      merge = Seq(sum(col("pn")) -> "n", sum(col("pchars")) -> "chars"))
      .orderBy("k")
    rows(salted) shouldBe rows(plain)
  }

  test("date-partitioned store prunes partitions under a date predicate") {
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    val events = (0 until 100).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 3600L * 1000L), i * 1.5)
    }.toDF("event_id", "ts", "value")
    PartitionedStore.writeByDay(events, "ts", dir)

    // layout: one directory per day
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("p_date=")).sorted
    dirs.length should be >= 4

    val firstDay = dirs.head.stripPrefix("p_date=")
    val pruned = PartitionedStore.read(spark, dir)
      .filter(col("p_date") === lit(firstDay))
    // physical plan prunes to 1 partition directory before any I/O
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    scan.toString should include("PartitionFilters")
    pruned.count() shouldBe events
      .filter(to_date(col("ts")) === lit(firstDay)).count()

    val partsRead = scan.asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
      .selectedPartitions.partitionCount
    partsRead shouldBe 1
  }

  test("bucketed merge: the bucketed target side joins without a shuffle") {
    import graft.sources.BucketedStore
    val target = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    BucketedStore.writeBucketed(target, "graft_bucket_target", Seq("id"), 4)
    try {
      val bucketed = BucketedStore.read(spark, "graft_bucket_target")
      val stage = (500 to 520).map(i => (i.toLong, s"new$i")).toDF("id", "v")
      val merged = graft.operators.Load.upsert(bucketed, stage, Seq("id"))
      merged.count() shouldBe 1000 + 21 - 21

      // force a shuffle-requiring join (disable broadcast) and check the
      // bucketed side still has no exchange above its scan
      val noBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val anti = bucketed.join(stage, Seq("id"), "left_anti")
        val explained = anti.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // exactly ONE exchange: the stage side; bucketed target reads
        // its 4 buckets pre-partitioned
        explained.split("\n").count(_.matches("\\(\\d+\\) Exchange.*")) shouldBe 1
        anti.count() shouldBe 1000 - 21
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", noBroadcast)
    } finally spark.sql("DROP TABLE IF EXISTS graft_bucket_target")
  }

  test("persisted minhash bands: probes join the index side without reshuffling it") {
    val docs = (0L until 200L).map(i =>
      (i, s"spec doc $i alpha beta gamma delta epsilon zeta $i"))
      .toDF("doc_id", "text")
    val name = "graft_mh_scale"
    try {
      graft.operators.Dedup.saveMinhashIndex(
        docs.filter($"doc_id" % 2 === 0), "doc_id", "text", name)
      graft.operators.Dedup.appendToMinhashIndex(
        docs.filter($"doc_id" % 2 =!= 0), "doc_id", "text", name)
      // probe keys of a small batch (no distinct — keep the probe side
      // a single narrow stage so the exchange count is deterministic)
      val probe = graft.operators.Dedup.minhashBandKeys(
        docs.filter($"doc_id" < 5), "doc_id", "text")
        .select($"band_idx", $"band_key")
      val noBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        def probePlan() = {
          val joined = spark.table(s"${name}_bands")
            .join(probe, Seq("band_idx", "band_key"))
          (joined.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode), joined.count())
        }
        // exactly ONE exchange — the probe side. The index side's
        // buckets hash-partition on the full probe join key
        // (band_idx, band_key), and appended files land in their key's
        // bucket, so the accumulated 100 TB side never rebuckets per
        // probe.
        val (explained, hits) = probePlan()
        explained.split("\n").count(_.matches("\\(\\d+\\) Exchange.*")) shouldBe 1
        hits should be > 0L
        // …and the contract SURVIVES compaction: the bucket spec is
        // rewritten verbatim, so the post-compaction probe keeps the
        // single probe-side exchange and identical hits
        graft.operators.Maintenance.compactMinhashIndex(spark, name)
        val (explained2, hits2) = probePlan()
        explained2.split("\n").count(_.matches("\\(\\d+\\) Exchange.*")) shouldBe 1
        hits2 shouldBe hits
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", noBroadcast)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_bands")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_shingles")
    }
  }

  test("dynamic partition pruning: a selective dim filter prunes the fact scan at runtime") {
    val dir = Files.createTempDirectory("graft-dpp").toString + "/events"
    val events = (0 until 200).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 3600L * 1000L), i * 1.5)
    }.toDF("event_id", "ts", "value")
    PartitionedStore.writeByDay(events, "ts", dir)
    val fact = PartitionedStore.read(spark, dir)
    val days = fact.select(col("p_date").cast("string")).distinct()
      .orderBy("p_date").collect().map(_.getString(0))
    days.length should be >= 4

    // dim carries the filter; the fact's partition scan must receive a
    // runtime (dynamicpruning) filter derived from the dim broadcast.
    // The dim must be a file source: a LocalRelation constant-folds its
    // filter away and DPP's selectivity heuristic sees nothing to push.
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString + "/dim"
    days.zipWithIndex.map { case (d, i) => (d, i) }.toSeq
      .toDF("p_date", "tag")
      .select(col("p_date").cast("date").as("p_date"), col("tag"))
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.filter(col("tag") === 0), Seq("p_date"))
    joined.queryExecution.executedPlan.toString should include("dynamicpruning")
    joined.count() shouldBe fact.filter(col("p_date") === days.head).count()
  }

  test("plan shape: q1_agg pushes its filter and prunes columns at the scan") {
    val plan = SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    val scans = plan.collectLeaves().map(_.toString)
    scans.exists(s => s.contains("PushedFilters: [IsNotNull(l_shipdate)")) shouldBe true
    // projection pruning: the 16-column lineitem scan reads only 6
    scans.exists(_.contains("l_comment")) shouldBe false
  }

  test("plan shape: q3 broadcasts the dimension side (stats-driven, not pinned)") {
    // with no hint in the plan, Catalyst's size estimates still pick a
    // broadcast at small SF — the strategy is the optimizer's call and
    // flips to sort-merge when the filtered customer side outgrows the
    // threshold (the no-pinned-hints test below pins the absence of the
    // hint itself)
    val plan = SparkEntry.queries("q3_join_topk")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("plan shape: IVF centroid sampling never sorts the corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cand = graft.operators.Similarity.centroidCandidates(
      emb, "vec_id", "embedding", step = 10L, nCentroids = 16)
    val explained = cand.queryExecution.executedPlan.toString
    // the ordering collapses to per-partition top-k + driver merge:
    // no global Sort, no range-partitioning Exchange above the scan
    explained should include("TakeOrderedAndProject")
    explained should not include "rangepartitioning"
    explained.linesIterator.exists(_.trim.startsWith("+- Sort")) shouldBe false
    // and the modulo filter sits below the ordering (filters candidates
    // BEFORE the top-k, so the ordered set is ≈nCentroids, not |corpus|)
    explained should include("Filter")
  }

  test("plan shape: packBins windows per hash bucket, never a global order") {
    val docs = (0L until 1000L).map(i => (i, i % 50 + 1)).toDF("id", "nt")
    val packed = graft.operators.Sampling.packBins(docs, "id", "nt", 512L, 16)
    val explained = packed.queryExecution.executedPlan.toString
    // the window's exchange hashes on pack_bucket (16-way parallel)…
    explained should include("hashpartitioning(pack_bucket")
    // …and nothing range-partitions (a global sort would serialize the
    // cumulative sum through one ordering)
    explained should not include "rangepartitioning"
  }

  test("plan shape: fuzzy-join candidate shuffles carry hashed longs, not strings") {
    val df = SparkEntry.queries("fuzzy_selfjoin_names")(spark, "/root/testdata/sf0.001")
    df.collect() // materialize so AQE finalizes its stages
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the candidate-generation exchanges partition on the variant hash
    // (__k); their inputs must carry only (__k, id) — never a name or
    // exploded variant string
    val blocks = explained.split("\n\n").filter(b =>
      b.contains("Exchange") && b.contains("hashpartitioning") &&
        b.contains("__k"))
    blocks should not be empty
    blocks.foreach { b =>
      val inputLine = b.linesIterator.find(_.startsWith("Input")).getOrElse("")
      inputLine should not include "__var"
      inputLine should not include "c_name"
      inputLine should not include "__s"
    }
  }

  test("plan shape: LSH candidate shuffles carry no shingle arrays") {
    val df = SparkEntry.queries("dedup_minhash_lsh")(spark, "/root/testdata/sf0.001")
    df.collect() // materialize so AQE finalizes its stages (and exchanges)
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // formatted mode details: every node is a "(N) Name\nInput…" block;
    // find Exchange blocks partitioned by band keys and check their
    // input column lists stay free of the shingle array
    val blocks = explained.split("\n\n").filter(b =>
      b.contains("Exchange") && b.contains("hashpartitioning") &&
        b.contains("band_key"))
    blocks should not be empty
    blocks.foreach { b =>
      val inputLine = b.linesIterator.find(_.startsWith("Input")).getOrElse("")
      inputLine should not include "sh#"
    }
  }

  test("plan shape: q6 pushes every predicate to the parquet scan") {
    val df = SparkEntry.queries("q6_forecast_revenue")(spark, "/root/testdata/sf0.001")
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the canonical scan-bound query: date, discount, and quantity
    // bounds must ALL reach PushedFilters (row-group min/max skipping
    // is the whole cost model at 100 TB), and the plan holds exactly
    // one scan and no join
    val pushed = explained.linesIterator
      .filter(_.trim.startsWith("PushedFilters:")).mkString
    pushed should include("l_shipdate")
    pushed should include("l_discount")
    pushed should include("LessThan(l_quantity,24.0)")
    explained.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) shouldBe 1
    explained should not include "Join"
  }

  test("plan shape: windowDupStats is join-free — one scan, bounded window state") {
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
    val df = graft.operators.Dedup.windowDupStats(docs, "doc_id", "text")
    val optimized = df.queryExecution.optimizedPlan.toString
    // the shared-window count is a COUNT window over the window key,
    // never a self-join back to the exploded windows (which would scan
    // and shuffle the corpus-scale window strings twice)
    optimized should not include "Join"
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    explained.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) shouldBe 1
  }

  test("plan shape: removeDuplicatedSpans is join-free — one corpus scan") {
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
    val df = graft.operators.Dedup.removeDuplicatedSpans(docs, "doc_id", "text")
    // min-doc-per-window is a window over the whash partition and the
    // tail rows ride the SAME lineage under singleton keys — a
    // branch-and-union (or a join-back) would scan and explode the
    // corpus twice, since exchange reuse does not fire across branches
    df.queryExecution.optimizedPlan.toString should not include "Join"
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    explained.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) shouldBe 1
  }

  test("plan shape: no pinned broadcast hints on SF-scaling tables") {
    // nation/region are constant-size at any scale factor → an explicit
    // broadcast() hint is safe. customer/supplier grow linearly with SF
    // (multi-TB at the 100 TB posture) → their join strategy must be
    // AQE's call, not a hard-coded hint that becomes an OOM at scale.
    // This pins the r4 delegation: hints in these plans may reference
    // only the constant-size dims.
    for (name <- Seq("q3_join_topk", "q5_region_revenue", "q18_large_orders",
                     "star_join_agg", "q9_product_profit",
                     "q20_promo_suppliers")) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val hinted = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint =>
          h.child.output.map(_.name)
      }.flatten
      withClue(s"$name hinted columns: $hinted") {
        hinted.filter(c => c.startsWith("c_") || c.startsWith("s_")) shouldBe empty
      }
    }
  }

  test("plan shape: tfidf reads the corpus text once — df via window, not a join-back") {
    val df = SparkEntry.queries("tfidf_keywords")(spark, "/root/testdata/sf0.001")
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // one token explode: a df join-back would re-derive tf (and its
    // Generate) from a second corpus-text scan — exchange reuse does
    // not fire across those branches, so at 100 TB that shape reads
    // the corpus twice
    explained.linesIterator.count(
      _.matches("""\(\d+\) Generate\s*""")) shouldBe 1
    // two scans total: the token explode + the zero-column N count
    explained.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) shouldBe 2
  }

  test("plan shape: q21 scans the fact table once — the EXISTS pair never self-joins") {
    val df = SparkEntry.queries("q21_waiting_suppliers")(spark, "/root/testdata/sf0.001")
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the textbook Q21 plan joins lineitem against itself twice (EXISTS
    // + NOT EXISTS); the window decorrelation must keep exactly one
    // lineitem scan
    explained.linesIterator.count(l =>
      l.trim.startsWith("Location:") && l.contains("lineitem")) shouldBe 1
  }

  test("plan shape: decontamination broadcasts the eval shingles") {
    val df = SparkEntry.queries("decontaminate")(spark, "/root/testdata/sf0.001")
    df.collect() // materialize so AQE finalizes its stages
    val plan = df.queryExecution.executedPlan.toString
    // benchmark side broadcasts → the corpus-side scan joins map-side;
    // a SortMergeJoin here would shuffle every corpus shingle string
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("plan shape: KMV sketch aggregates partially map-side — only states cross the shuffle") {
    import graft.functions.KmvFunctions._
    import spark.implicits._
    val df = (1 to 1000).map(i => s"v$i").toDF("v").repartition(8)
    val plan = df.agg(kmvState($"v", 64).as("sk"))
      .queryExecution.executedPlan.toString
    // partial + final ObjectHashAggregate pair = map-side combine: the
    // raw values never cross the exchange, only <= k*8-byte states
    "(?i)objecthashaggregate".r.findAllIn(plan).size should be >= 2
    plan should include("partial_kmv_sketch_state")
  }

  test("plan shape: fuzzy decontamination broadcasts the eval side twice (bands + shingles)") {
    val df = SparkEntry.queries("decontaminate_fuzzy")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // both eval-side joins (band-key restriction, shingle verify) ride
    // broadcasts; a SortMergeJoin would shuffle corpus shingle arrays
    "(?i)broadcasthashjoin".r.findAllIn(plan).size should be >= 2
  }

  /** The AQE plan string renders the Final AND Initial plans — slice
    * to the final section so exchange counts aren't double-counted. */
  private def finalPlanOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("Initial Plan")
    if (cut >= 0) s.substring(0, cut) else s
  }

  test("plan shape: funnel chains its three window minima over ONE user shuffle") {
    val plan = finalPlanOf(SparkEntry.queries("funnel_stages")(
      spark, "/root/testdata/sf0.001")).toLowerCase
    // all three stage minima partition by user_id: the three Window
    // operators and the per-user aggregate reuse one hash exchange of
    // the event stream (plus the 1-row final agg exchange) — a
    // per-stage re-shuffle would read 3× at any scale
    "exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).size shouldBe 1
    "windowspecdefinition\\(user_id".r.findAllIn(plan).size should be >= 3
  }

  test("plan shape: grouped weighted sample is one window over the group key, no sort of the corpus") {
    val plan = finalPlanOf(SparkEntry.queries("weighted_sample_grouped")(
      spark, "/root/testdata/sf0.001")).toLowerCase
    "exchange hashpartitioning\\(lang".r.findAllIn(plan).size shouldBe 1
    plan should not include "cartesian"
    // bonus optimizer behavior worth pinning: the rank-limit window
    // runs with a PARTIAL WindowGroupLimit below the exchange, so each
    // map task pre-trims to the top-n before shuffling
    plan should include("windowgrouplimit")
  }

  test("plan shape: blocklist filter broadcasts the blocklist — the " +
      "corpus is never shuffled") {
    val df = SparkEntry.queries("blocklist_filter")(spark,
      "/root/testdata/sf0.001")
    df.collect() // materialize so AQE finalizes its stages
    val plan = df.queryExecution.executedPlan.toString
    // dimension-sized blocklist broadcasts; the 100 TB corpus side
    // anti-joins map-side — a SortMergeJoin here would shuffle every
    // corpus row on the blocklisted column
    plan should include("BroadcastHashJoin")
    plan should include("LeftAnti")
    plan should not include "SortMergeJoin"
  }
}
