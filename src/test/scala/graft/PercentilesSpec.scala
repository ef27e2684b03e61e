package graft

import graft.operators.Percentiles
import org.apache.spark.sql.functions._

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  private val targets = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)

  /** Reference: Spark's own exact percentile() (buffers the group). */
  private def exact(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(
      expr("percentile(v, 0.25)").as("p25"),
      expr("percentile(v, 0.5)").as("p50"),
      expr("percentile(v, 0.75)").as("p75"))

  private def check(df: org.apache.spark.sql.DataFrame,
                    accuracy: Int = 10000,
                    bandDelta: Option[Double] = None,
                    threshold: Long = 1L << 20,
                    maxRouted: Int = 65536): Unit = {
    val got = rows(Percentiles.exactGroupedPercentiles(
      df, Seq("g"), "v", targets, accuracy, bandDelta, threshold,
      maxRouted)
      .orderBy("g"))
    val want = rows(exact(df).orderBy("g"))
    got shouldBe want
  }

  private def shapes = {
    // deterministic pseudo-random values; groups of very different
    // sizes, heavy duplicates in one, singleton in another
    val big = (0 until 9001).map(i =>
      ("a", ((i * 2654435761L) % 100000).toDouble / 7.0))
    val dup = (0 until 500).map(i => ("b", (i % 7).toDouble))
    val one = Seq(("c", 42.0))
    // the coverage-bound boundary zone: (δ−ε)·n ≈ 1 at n ≈ 2500 with
    // default accuracy — the regime where the GK sketch stops being
    // rank-exact but the widened band must still cover
    val boundary = (0 until 2600).map(i =>
      ("d", ((i * 48271L) % 31337).toDouble / 3.0))
    (big ++ dup ++ one ++ boundary).toDF("g", "v")
  }

  test("fast path matches percentile() bit-for-bit across group shapes") {
    check(shapes) // default threshold: every group routes to percentile()
  }

  test("sketch path matches percentile() bit-for-bit across group shapes") {
    check(shapes, threshold = 0) // force every group through the bands
  }

  test("mixed routing: small and large groups split across both paths") {
    // threshold 1000: groups a (9001) and d (2600) take the sketch
    // path, b (500) and c (1) the classic path — the union must still
    // be bit-identical and carry every group exactly once
    check(shapes, threshold = 1000)
  }

  test("heavy-duplicate group short-circuits without losing exactness") {
    // 90 % of the group is one value: the p25/p50 bands collapse to
    // lo == hi == 5.0 and the dominant run would be the whole window.
    // The offsets-only short-circuit must produce the exact result.
    val heavy = (0 until 9000).map(_ => ("h", 5.0)) ++
      (0 until 1000).map(i => ("h", 10.0 + i))
    check(heavy.toDF("g", "v"), threshold = 0)
  }

  test("integral rank positions interpolate to the exact data value") {
    // 5 values → p50 rank = 2.0 exactly: result must be v[2] itself
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0))
      .toDF("g", "v")
    for (th <- Seq(1L << 20, 0L)) {
      val got = rows(Percentiles.exactGroupedPercentiles(
        df, Seq("g"), "v", Seq("p50" -> 0.5),
        smallGroupThreshold = th))
      got shouldBe Seq(Seq("a", 3.0))
    }
  }

  test("all-NULL group yields NULL percentiles, like percentile()") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("n", None))
      .toDF("g", "v")
    check(df)
    check(df, threshold = 0)
  }

  test("NULL group keys form their own group, like percentile()") {
    // percentile() under groupBy returns a row for the NULL-key group;
    // a bare equi-join on the key would silently drop it (regression
    // for the struct-packed join key)
    val df = Seq((Some("a"), 1.0), (Some("a"), 2.0),
      (None, 10.0), (None, 20.0), (None, 30.0)).toDF("g", "v")
    check(df)
    check(df, threshold = 0)
    // and with a composite key where only one component is null
    val df2 = Seq((Some("a"), 1, 1.0), (None, 1, 5.0), (None, 1, 7.0))
      .toDF("g", "g2", "v")
    for (th <- Seq(1L << 20, 0L)) {
      val got = rows(Percentiles.exactGroupedPercentiles(
        df2, Seq("g", "g2"), "v", Seq("p50" -> 0.5),
        smallGroupThreshold = th).orderBy("g", "g2"))
      val want = rows(df2.groupBy("g", "g2")
        .agg(expr("percentile(v, 0.5)").as("p50")).orderBy("g", "g2"))
      got shouldBe want
    }
  }

  test("collapsed bands force the exact-verify fallback; result still exact") {
    // bandDelta = 0 shrinks every band to the sketch's point estimate;
    // with coarse accuracy the band misses true order statistics and
    // the AQE-gated percentile() fallback must produce them. (With a
    // point band lo == hi, this also exercises the short-circuit's
    // covered check rejecting un-covered runs → fallback.)
    val vals = (0 until 4096).map(i =>
      ("a", ((i * 40503L) % 4096).toDouble)) ++
      (0 until 1000).map(i => ("b", math.sin(i).abs * 100))
    check(vals.toDF("g", "v"), accuracy = 50, bandDelta = Some(0.0),
      threshold = 0)
  }

  test("sketch-path plan has no full-table exact percentile aggregate") {
    // The unguarded buffer-everything aggregate must appear ONLY behind
    // the fallback join (AQE-eliminated when unneeded) when groups are
    // routed to the sketch path; the nominate pass uses the bounded GK
    // sketch.
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("g", "v")
    val plan = Percentiles.exactGroupedPercentiles(
      df, Seq("g"), "v", Seq("p50" -> 0.5), smallGroupThreshold = 0)
      .queryExecution.optimizedPlan.toString
    // every exact percentile() node sits under a join with the
    // missed-groups side — crude but effective pin: the fallback's
    // aliases are the only exact-percentile outputs
    plan.linesIterator.filter(_.contains("percentile(__v"))
      .foreach(l => l should include("__exact_"))
  }

  test("small-group fast path is the plain one-aggregation plan") {
    // Driver-verified small groups must NOT pay the sketch machinery:
    // no percentile_approx, no window, no join in the optimized plan.
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("g", "v")
    val plan = Percentiles.exactGroupedPercentiles(
      df, Seq("g"), "v", Seq("p50" -> 0.5))
      .queryExecution.optimizedPlan.toString
    plan should not include "percentile_approx"
    plan.toLowerCase should not include "join"
  }

  test("fused mad-style composition stays within a bounded job count") {
    // The round-6 mad_outliers plan ran ~35 stages from two composed
    // percentile calls; the routed design collapses each small-data
    // call to one collect job + one aggregation. Pin the job count of
    // the full median→deviation→MAD→outlier composition.
    val ord = shapes.withColumnRenamed("v", "price")
    val sc = spark.sparkContext
    sc.setJobGroup("mad-jobcount", "PercentilesSpec", false)
    try {
      val med = Percentiles.exactGroupedPercentiles(
        ord, Seq("g"), "price", Seq("med" -> 0.5))
      val dev = ord.join(broadcast(med), Seq("g"))
        .withColumn("dev", abs(col("price") - col("med")))
      val mad = Percentiles.exactGroupedPercentiles(
        dev, Seq("g"), "dev", Seq("mad" -> 0.5))
      val out = dev.join(broadcast(mad), Seq("g"))
        .groupBy("g")
        .agg(first("med").as("med"), first("mad").as("mad"),
          sum(when(col("dev") > col("mad") * 3.0 * 1.4826, 1L)
            .otherwise(0L)).as("n_outliers"))
      out.collect()
      val jobs = sc.statusTracker.getJobIdsForGroup("mad-jobcount").length
      // 2 routing collects + the final action + AQE's per-exchange
      // materialization jobs (measured: 12) — anything near the old
      // ~35-stage plan is a regression
      assert(jobs <= 14, s"mad composition ran $jobs jobs")
    } finally sc.clearJobGroup()
  }

  test("routing-cap overflow reroutes to the distributed plan; bit-parity holds") {
    // maxRoutedGroups = 1 with 4 groups: the limit(2) probe overflows,
    // nothing per-group is collected, and the distributed twin must
    // produce percentile()-identical results across all group shapes
    // and both small/large sub-paths.
    check(shapes, maxRouted = 1)                       // all-small split
    check(shapes, threshold = 0, maxRouted = 1)        // all-sketch
    check(shapes, threshold = 1000, maxRouted = 1)     // mixed routing
  }

  test("distributed plan: NULL keys, all-NULL groups, duplicates, fallback") {
    val mixed = Seq((Some("a"), Some(1.0)), (Some("a"), Some(2.0)),
      (Some("a"), Some(3.0)), (None, Some(10.0)), (None, Some(20.0)),
      (Some("n"), Option.empty[Double]), (Some("n"), None))
      .toDF("g", "v")
    for (th <- Seq(1L << 20, 0L)) {
      val got = rows(Percentiles.distributedGroupedPercentiles(
        mixed, Seq("g"), "v", targets, smallGroupThreshold = th)
        .orderBy("g"))
      got shouldBe rows(exact(mixed).orderBy("g"))
    }
    // heavy duplicates through the degenerate-band short-circuit
    val heavy = ((0 until 9000).map(_ => ("h", 5.0)) ++
      (0 until 1000).map(i => ("h", 10.0 + i))).toDF("g", "v")
    rows(Percentiles.distributedGroupedPercentiles(
      heavy, Seq("g"), "v", targets, smallGroupThreshold = 0)) shouldBe
      rows(exact(heavy))
    // collapsed bands force the exact-verify fallback — still exact
    val vals = ((0 until 4096).map(i =>
      ("a", ((i * 40503L) % 4096).toDouble)) ++
      (0 until 1000).map(i => ("b", math.sin(i).abs * 100)))
      .toDF("g", "v")
    rows(Percentiles.distributedGroupedPercentiles(
      vals, Seq("g"), "v", targets, accuracy = 50,
      bandDelta = Some(0.0), smallGroupThreshold = 0)
      .orderBy("g")) shouldBe rows(exact(vals).orderBy("g"))
  }

  test("distributed plan pins no broadcast on any SF-scaling relation") {
    // The band/offset/routing tables all scale with #groups when the
    // key is wide — the distributed twin must leave join strategy to
    // size-based planning (no explicit broadcast() hints anywhere in
    // its logical plan), unlike the routed plan whose hints are licensed
    // by the driver-verified cardinality cap.
    val df = shapes
    val analyzed = Percentiles.distributedGroupedPercentiles(
      df, Seq("g"), "v", targets, smallGroupThreshold = 0)
      .queryExecution.analyzed.toString
    analyzed should not include "ResolvedHint"
    analyzed should not include "UnresolvedHint"
  }

  test("winsorize clamps into the exact percentile band; NULL semantics hold") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", Some(4.0)), ("a", Some(100.0)),
      ("b", Some(10.0)), ("b", None),
      ("c", Option.empty[Double]), ("c", None))
      .toDF("g", "v")
    val w = Percentiles.winsorize(df, Seq("g"), "v", 0.25, 0.75)
    // group a band = percentile(v, .25/.75) over [1,2,3,4,100] = [2,4]
    val bands = df.groupBy("g").agg(
      expr("percentile(v, 0.25)").as("lo"),
      expr("percentile(v, 0.75)").as("hi"))
    val wantA = rows(df.join(bands, Seq("g"))
      .withColumn("v", when(col("v").isNull || col("lo").isNull, col("v"))
        .otherwise(least(greatest(col("v"), col("lo")), col("hi"))))
      .select("g", "v").orderBy("g", "v"))
    rows(w.select("g", "v").orderBy("g", "v")) shouldBe wantA
    // explicit expectations: clamp hit both tails of a; b's single
    // value self-bands; c (all NULL) passes through unclamped
    w.filter(col("g") === "a").select("v").collect()
      .map(_.getDouble(0)).sorted shouldBe Array(2.0, 2.0, 3.0, 4.0, 4.0)
    w.filter(col("g") === "b").select("v").collect()
      .map(r => Option(r.get(0))).toSet shouldBe Set(Some(10.0), None)
    w.filter(col("g") === "c").select("v").collect()
      .foreach(r => r.isNullAt(0) shouldBe true)
    // schema/order preserved when rewriting in place
    w.columns.toSeq shouldBe df.columns.toSeq

    // NULL group keys keep their rows (struct-keyed join)
    val dfn = Seq((Some("a"), Some(1.0)), (None, Some(5.0)),
      (None, Some(6.0))).toDF("g", "v")
    Percentiles.winsorize(dfn, Seq("g"), "v", 0.0, 1.0).count() shouldBe 3L

    // `as` appends a new column, original untouched
    val w2 = Percentiles.winsorize(df, Seq("g"), "v", 0.25, 0.75, as = "vw")
    w2.columns.toSeq shouldBe Seq("g", "v", "vw")
    w2.filter(col("g") === "a" && col("v") === 100.0)
      .select("vw").collect().head.getDouble(0) shouldBe 4.0

    // config refusal
    intercept[IllegalArgumentException] {
      Percentiles.winsorize(df, Seq("g"), "v", 0.9, 0.1)
    }
    intercept[IllegalArgumentException] {
      Percentiles.winsorize(df, Nil, "v")
    }
  }
}
