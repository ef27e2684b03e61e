package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift profiling between two snapshots of a dataset —
  * the standing question of a training-data pipeline ("did this
  * month's crawl shift against the corpus we trained on?") answered
  * at corpus scale: the returned plan reads each snapshot ONCE (plus
  * one eager pass that fixes totals/edges at the driver — the
  * [[Percentiles]] routing posture), and everything after the two
  * bucket-count aggregations is arithmetic over a bucket- or
  * category-cardinality frame.
  *
  * Both profiles report the Population Stability Index decomposed per
  * bucket (`psi_term`; Σ terms = the PSI, with the usual reading:
  * <0.1 stable, 0.1–0.25 shifted, >0.25 major drift). Zero-count
  * buckets take the standard ε-smoothing on the RATE (rate ↦ max(rate,
  * ε)) so a category that vanished — or appeared — contributes a
  * large-but-finite term instead of ±∞.
  *
  * Scale posture: numeric bucket edges come from the baseline's EXACT
  * percentiles via [[Percentiles.exactGroupedPercentiles]] (bounded
  * memory at any size — never a full sort) and are collected as ≤
  * `buckets` doubles; bucket assignment is one codegen'd CASE chain
  * inside each snapshot's scan stage. The categorical profile
  * shuffles only (category, count) pairs. Neither path ever joins the
  * two snapshots row-to-row.
  */
object Drift {

  /** Per-bucket numeric drift profile of `valueCol` between `base`
    * and `cur`. Buckets are `base`'s exact `buckets`-quantile bands
    * (edges at k/buckets for k = 1..buckets-1), unbounded at both
    * ends, so the baseline lands ~1/buckets of its rows in each.
    * Output: (bucket, lo, hi, base_n, cur_n, base_rate, cur_rate,
    * psi_term) — one row per bucket, in bucket order. NULL values are
    * excluded from both sides (a rate over NULLs is not a
    * distribution statement).
    *
    * @param eps smoothing floor for zero rates (standard PSI
    *            practice; documented in the term it produces). */
  /** Exact equi-depth band edges of `valueCol` from a reference frame
    * — the ONE edge-derivation both the batch profile and the
    * streaming monitor use ([[bandBucket]] is its CASE-chain
    * companion); fails loud on an all-NULL reference. */
  private[graft] def referenceBandEdges(reference: DataFrame,
                                        valueCol: String,
                                        buckets: Int): Seq[Double] = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val fracs = (1 until buckets).map(k => s"e$k" -> k.toDouble / buckets)
    val edgeRows = Percentiles.exactGroupedPercentiles(
      reference.withColumn("__g", lit(0)), Seq("__g"), valueCol, fracs)
      .collect()
    require(edgeRows.nonEmpty && !edgeRows(0).isNullAt(
        edgeRows(0).fieldIndex("e1")),
      s"drift banding: reference has no non-NULL '$valueCol' values — " +
        "no distribution to drift against")
    fracs.map { case (name, _) => edgeRows(0).getAs[Double](name) }
  }

  /** CASE chain over [[referenceBandEdges]]: bucket k holds
    * (edge_{k-1}, edge_k]; bucket 0 is (-inf, edge_1]; the last is
    * (edge_{buckets-1}, +inf). `<=` on the right edge matches the SQL
    * oracle's chain exactly. */
  private[graft] def bandBucket(v: Column, edges: Seq[Double],
                                buckets: Int): Column =
    edges.zipWithIndex.foldRight(lit(buckets - 1): Column) {
      case ((e, i), rest) => when(v <= lit(e), lit(i)).otherwise(rest)
    }

  def numericPsi(base: DataFrame, cur: DataFrame, valueCol: String,
                 buckets: Int = 10, eps: Double = 1e-6): DataFrame = {
    val edges = referenceBandEdges(base, valueCol, buckets)
    val v = col(valueCol).cast("double")
    val bucketOf: Column = bandBucket(v, edges, buckets)
    def counts(df: DataFrame, as: String): DataFrame =
      df.filter(v.isNotNull).groupBy(bucketOf.as("bucket"))
        .agg(count(lit(1)).as(as))
    val spark = base.sparkSession
    import spark.implicits._
    val all = (0 until buckets).toDF("bucket")
    val joined = all
      .join(counts(base, "base_n"), Seq("bucket"), "left")
      .join(counts(cur, "cur_n"), Seq("bucket"), "left")
      .na.fill(0L, Seq("base_n", "cur_n"))
    val lo = edges.zipWithIndex.foldRight(lit(Double.NegativeInfinity): Column) {
      case ((e, i), rest) => when(col("bucket") === i + 1, lit(e)).otherwise(rest)
    }
    val hi = edges.zipWithIndex.foldRight(lit(Double.PositiveInfinity): Column) {
      case ((e, i), rest) => when(col("bucket") === i, lit(e)).otherwise(rest)
    }
    withPsi(joined, eps)
      .withColumn("lo", lo).withColumn("hi", hi)
      .select(col("bucket").cast("bigint").as("bucket"), col("lo"),
        col("hi"), col("base_n"), col("cur_n"), col("base_rate"),
        col("cur_rate"), col("psi_term"))
      .orderBy("bucket")
  }

  /** Distribution drift of an EMBEDDING column: quantize both
    * snapshots into the same k-means cells (trained on the BASE —
    * the reference distribution owns the geometry, so a drifted
    * current snapshot can't move the yardstick) and run categorical
    * PSI over cell occupancies. The embedding twin of
    * [[numericPsi]]'s decile bands: per snapshot one narrow
    * assignment scan + one cell-count aggregate; snapshots never
    * join row-to-row. Rows-only at the gate (k-means centroids carry
    * double-sum rounding); shift-detection behavior is spec-pinned. */
  def embeddingPsi(base: DataFrame, cur: DataFrame, vecCol: String,
                   idCol: String, nCells: Int = 16, trainIters: Int = 2,
                   eps: Double = 1e-6): DataFrame = {
    import graft.functions.HashFunctions.nearestCentroids
    val centroids = Similarity.kmeansCentroids(base, idCol, vecCol,
      nCells, trainIters)
    def cells(df: DataFrame) = df.select(
      element_at(nearestCentroids(df(vecCol)
        .cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)), centroids, 1), 1)
        .as("cell"))
    categoricalPsi(cells(base), cells(cur), "cell", eps)
      .withColumnRenamed("category", "cell")
  }

  /** Per-category drift profile of `catCol` between `base` and `cur`:
    * (category, base_n, cur_n, base_rate, cur_rate, psi_term), one
    * row per category seen in EITHER snapshot (a vanished or novel
    * category is exactly the drift worth flagging — it shows with a
    * zero count and an ε-smoothed term). NULL categories count as a
    * category (a rising NULL rate is drift too). */
  def categoricalPsi(base: DataFrame, cur: DataFrame, catCol: String,
                     eps: Double = 1e-6): DataFrame = {
    def counts(df: DataFrame, as: String): DataFrame =
      df.groupBy(col(catCol).as("category")).agg(count(lit(1)).as(as))
    // full outer on the category: both sides are
    // category-cardinality-sized aggregates, tiny next to the scans.
    // NULL-SAFE (<=>) because NULL is a category here — a bare
    // equi-join would emit the base-NULL and cur-NULL counts as two
    // unmatched rows instead of one drifting category.
    val b = counts(base, "base_n")
    val c = counts(cur, "cur_n")
    val joined = b.join(c, b("category") <=> c("category"), "full_outer")
      .select(coalesce(b("category"), c("category")).as("category"),
        coalesce(b("base_n"), lit(0L)).as("base_n"),
        coalesce(c("cur_n"), lit(0L)).as("cur_n"))
    withPsi(joined, eps)
      .select("category", "base_n", "cur_n",
        "base_rate", "cur_rate", "psi_term")
      .orderBy(col("category").asc_nulls_first)
  }

  /** Jensen–Shannon drift profile of `catCol` between `base` and
    * `cur` — the BOUNDED complement of [[categoricalPsi]]: with
    * M = (P+Q)/2, JSD = ½KL(P‖M) + ½KL(Q‖M) ∈ [0, ln 2], so a
    * category present in only one snapshot contributes a FINITE term
    * (PSI needs ε-smoothing there and its reading then depends on ε;
    * JSD needs no smoothing at all — the 0·ln 0 = 0 convention is
    * exact, and p/m ≤ 2 is always finite when p > 0).
    *
    * Same shape as categoricalPsi: two category-sized count
    * aggregates, one NULL-safe full outer join, driver-literal
    * totals. Output (category, base_n, cur_n, base_rate, cur_rate,
    * jsd_term), Σ jsd_term = the divergence; each term rounds to 9
    * decimals (the psi_term libm-ulp discipline). */
  def jensenShannon(base: DataFrame, cur: DataFrame,
                    catCol: String): DataFrame = {
    def counts(df: DataFrame, as: String): DataFrame =
      df.groupBy(col(catCol).as("category")).agg(count(lit(1)).as(as))
    val b = counts(base, "base_n")
    val c = counts(cur, "cur_n")
    val joined = b.join(c, b("category") <=> c("category"), "full_outer")
      .select(coalesce(b("category"), c("category")).as("category"),
        coalesce(b("base_n"), lit(0L)).as("base_n"),
        coalesce(c("cur_n"), lit(0L)).as("cur_n"))
    val t0 = joined.agg(sum("base_n"), sum("cur_n")).collect()(0)
    val (bt, ct) = (if (t0.isNullAt(0)) 0L else t0.getLong(0),
      if (t0.isNullAt(1)) 0L else t0.getLong(1))
    require(bt > 0 && ct > 0,
      s"drift profile needs non-empty snapshots on both sides " +
        s"(baseline n=$bt, current n=$ct)")
    val p = col("base_n").cast("double") / lit(bt.toDouble)
    val q = col("cur_n").cast("double") / lit(ct.toDouble)
    val m = (p + q) / lit(2.0)
    joined
      .withColumn("base_rate", p).withColumn("cur_rate", q)
      .withColumn("jsd_term", round(
        when(col("base_n") > 0, lit(0.5) * p * log(p / m))
          .otherwise(lit(0.0)) +
          when(col("cur_n") > 0, lit(0.5) * q * log(q / m))
            .otherwise(lit(0.0)), 9))
      .select("category", "base_n", "cur_n",
        "base_rate", "cur_rate", "jsd_term")
      .orderBy(col("category").asc_nulls_first)
  }

  /** Rates + the smoothed PSI term over a (…, base_n, cur_n) frame.
    * The operator is EAGER like [[Percentiles]]: one tiny job fixes
    * the two totals at the driver and injects them as LITERALS — a
    * totals-subquery cross join would duplicate the whole
    * count-aggregation subtree in the plan (both snapshots scanned
    * twice inside ONE evaluation) and ride on exchange reuse to stay
    * consistent. It also makes empty snapshots fail loud here (a rate
    * over zero rows is not a distribution; ANSI division would throw
    * an opaque DIVIDE_BY_ZERO mid-plan instead).
    * psi_term rounds to 9 decimals: the term is ln-based and two
    * engines' libm may differ in the last ulp — 9 decimals is far
    * below any drift-reading threshold and above ulp noise. */
  private def withPsi(joined: DataFrame, eps: Double): DataFrame = {
    val t0 = joined.agg(sum("base_n"), sum("cur_n")).collect()(0)
    val (bt, ct) = (if (t0.isNullAt(0)) 0L else t0.getLong(0),
      if (t0.isNullAt(1)) 0L else t0.getLong(1))
    require(bt > 0 && ct > 0,
      s"drift profile needs non-empty snapshots on both sides " +
        s"(baseline n=$bt, current n=$ct)")
    def rate(n: String, t: Long) = col(n).cast("double") / lit(t.toDouble)
    def sm(c: Column) = greatest(c, lit(eps))
    joined.withColumn("base_rate", rate("base_n", bt))
      .withColumn("cur_rate", rate("cur_n", ct))
      .withColumn("psi_term", round(
        (sm(col("cur_rate")) - sm(col("base_rate"))) *
          log(sm(col("cur_rate")) / sm(col("base_rate"))), 9))
  }

  /** EXACT two-sample Kolmogorov–Smirnov statistic between `base` and
    * `cur` on NUMERIC `valueCol`: D = max over observed values x of
    * |F_base(x) − F_cur(x)|. Complements the PSI family — PSI needs
    * bands chosen up front and saturates on tail shifts; KS is
    * band-free and sensitive to ANY CDF displacement.
    *
    * All arithmetic stays in INTEGERS until the one final division:
    * per distinct value the two counts accumulate through one window
    * cumsum, and |cumB·N_cur − cumC·N_base| compares as exact longs —
    * the statistic is bit-stable under any partitioning and engine.
    *
    * Shape: one groupBy on the value (partial-aggregated), one
    * single-partition window over the DISTINCT values only (bounded
    * by value cardinality, not row count — quantize a genuinely
    * continuous 100 TB column upstream to bound it), one aggregate.
    * Returns one row: (n_base, n_cur, ks_d, ks_at) with `ks_at` the
    * SMALLEST value attaining the max (deterministic tie policy via
    * lexicographic (diff, −v) struct max). Overflow guard: cumsums
    * are ≤ N_base/N_cur and the cross products ≤ N_base·N_cur — exact
    * in a long up to ~3·10⁹ rows per side; beyond that pre-aggregate.
    *
    * EAGER at construction: the grid-cardinality guard runs a
    * limit-bounded Spark job (and persists the grid) when this method
    * is CALLED, not when the result is acted on. */
  def ksStatistic(base: DataFrame, cur: DataFrame, valueCol: String,
                  maxGrid: Int = ValueGrid.DefaultMaxGrid): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def side(df: DataFrame, as: String) =
      df.select(col(valueCol).cast("double").as("v"))
        .filter(col("v").isNotNull)
        .groupBy("v").agg(count(lit(1)).as(as))
    // EAGER like withPsi: a sup-distance over an empty side is not a
    // statistic — without this, tc=0 makes ks_d a silent NaN and a
    // monitor reading `ks_d > threshold` passes forever. The probe is
    // a limit(1) existence take per side, not an aggregation.
    def empty(df: DataFrame) = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull).isEmpty
    require(!empty(base),
      "ksStatistic needs a non-empty base side (after NULL removal)")
    require(!empty(cur),
      "ksStatistic needs a non-empty current side (after NULL removal)")
    val counts = side(base, "nb")
      .join(side(cur, "nc"), Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("nb"), lit(0L)).as("nb"),
        coalesce(col("nc"), lit(0L)).as("nc"))
    // LOUD grid guard (enforced, not documented — r9 verdict): the
    // cumsum window below is single-partition over the distinct-value
    // grid; an unbounded continuous axis would wedge that one task.
    // boundedGrid returns the grid PERSISTED so the probe job's
    // aggregation is not recomputed by the window below.
    val counts2 = ValueGrid.boundedGrid(counts, "ksStatistic", maxGrid)
    val cum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    counts2
      .withColumn("cb", sum("nb").over(cum))
      .withColumn("cc", sum("nc").over(cum))
      .withColumn("tb", sum("nb").over(all))
      .withColumn("tc", sum("nc").over(all))
      // |F_b − F_c| scaled to exact integers: |cb·tc − cc·tb|
      .withColumn("diff", abs(col("cb") * col("tc") - col("cc") * col("tb")))
      .agg(max(col("tb")).as("n_base"), max(col("tc")).as("n_cur"),
        (max(col("diff")).cast("double") /
          (max(col("tb")) * max(col("tc"))).cast("double")).as("ks_d"),
        (-max(struct(col("diff"), (-col("v")).as("nv"))).getField("nv"))
          .as("ks_at"))
  }
}
