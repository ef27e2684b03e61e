package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Exact grouped percentiles with BOUNDED executor memory — the 100 TB
  * form of `percentile()`.
  *
  * Spark's exact `percentile(v, p)` buffers EVERY value of the group in
  * one aggregation buffer; over a low-cardinality group key that is the
  * whole table in ~3 buffers — an executor OOM at scale, not a slow
  * query. The approx sketch bounds memory but surrenders exactness.
  * This operator keeps both properties:
  *
  *  1. COUNT ROUTES: one cheap scan collects per-group non-NULL counts
  *     to the driver (group cardinality is small by contract — the same
  *     broadcastability constraint as before). Groups whose count fits
  *     the classic buffer bound (`smallGroupThreshold`) take plain
  *     `percentile()` — for them buffering IS the bounded plan, and the
  *     sketch machinery would only add stages. Only oversized groups
  *     enter the nominate/locate/verify path.
  *  2. SKETCH NOMINATES: a second scan (large groups only) computes a
  *     Greenwald–Khanna band `[lo_p, hi_p]` around each target rank
  *     (`percentile_approx` at `p ± δ`, δ = 5/accuracy — wider than the
  *     sketch's own rank-error bound ε = 1/accuracy, so the true order
  *     statistics provably fall inside the band for any n with
  *     (δ−ε)·n ≥ 1; large groups are far past that size). The bands are
  *     ALSO collected: every downstream pass sees one literal,
  *     byte-identical band table — GK merge results can vary with
  *     partial-aggregate arrival order, so a lazily re-evaluated band
  *     subtree could diverge between passes if exchange reuse ever
  *     stopped deduping it. A literal cannot.
  *  3. EXACT LOCATES: one pass counts, per (group, target), the values
  *     strictly below the band (`rank offset`) and the values inside it.
  *     Degenerate `lo == hi` bands — the heavy-duplicate case, e.g. a
  *     column that is 90 % one value — short-circuit WITHOUT a window:
  *     the run's offset+size prove the target ranks sit inside it, and
  *     both order statistics equal the band value (interpolated with
  *     `percentile()`'s own formula for bit-parity). Real `lo < hi`
  *     bands are ranked by a window over ONLY in-band rows —
  *     O((δ+ε)·n) per group, a 0.06 % slice at the default accuracy. A
  *     band whose in-band count blew past that budget (duplicate-heavy
  *     distributions can concentrate mass between two close distinct
  *     values) is excluded from the window and routed to the fallback
  *     instead — the window never ranks an unbounded run.
  *  4. EXACT VERIFIES: any (group, p) not produced above — band missed
  *     its order statistics, or was oversize-routed — falls back to
  *     classic `percentile()` restricted to JUST those groups via an
  *     inner join that AQE eliminates when the miss-set is empty — the
  *     fallback scan costs nothing unless it is needed. (The fallback
  *     buffers those groups like `percentile()` would — it is the
  *     escape hatch, not the plan.)
  *
  * Interpolation everywhere uses `percentile()`'s OWN two-sided form,
  * (k1 − pos)·v0 + (pos − k0)·v1 — the algebraically equal
  * v0 + f·(v1−v0) differs in the last ULP and fails a hash gate.
  *
  * Same nominate-then-verify posture as `heavy_hitter_tokens`
  * (TextQueries): sketches pick candidates, exact passes decide.
  *
  * Contract: group cardinality must be small enough to broadcast (the
  * per-group count/band tables are collected and ride broadcast joins —
  * the same constraint any pivoted/wide result already implies). The
  * operator is EAGER: it runs one or two small collect jobs at
  * composition time to route the plan. NULL values are ignored per
  * aggregate semantics; a group with only NULLs yields NULL
  * percentiles, like `percentile()`; NULL GROUP KEYS form their own
  * group, also like `percentile()` (the internal joins carry the key
  * as a struct for exactly this reason).
  */
object Percentiles {

  /** @param targets  output-column-name → fraction in [0,1]
    * @param accuracy GK sketch accuracy (rank error ≤ n/accuracy)
    * @param bandDelta TEST SEAM: override the δ half-width; narrow
    *                  deltas force the exact-verify fallback path.
    * @param smallGroupThreshold groups with ≤ this many non-NULL values
    *                  take plain `percentile()` (its buffer holds one
    *                  entry per DISTINCT value, so this bounds the
    *                  buffer at ~threshold entries worst-case); 0 forces
    *                  every non-empty group through the sketch path.
    * @param maxRoutedGroups cardinality guard on the driver-side
    *                  routing table: the count pass is probed with
    *                  `limit(cap+1)` — if MORE groups exist, nothing
    *                  further is collected and the whole computation
    *                  takes [[distributedGroupedPercentiles]] (same
    *                  algorithm, bands materialized on executors
    *                  instead of as driver literals). Keeps a
    *                  high-cardinality key (user_id, domain) from
    *                  building an O(#groups) driver table. */
  def exactGroupedPercentiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, targets: Seq[(String, Double)],
      accuracy: Int = 10000,
      bandDelta: Option[Double] = None,
      smallGroupThreshold: Long = 1L << 20,
      maxRoutedGroups: Int = 65536): DataFrame = {
    require(targets.nonEmpty, "need at least one percentile target")
    targets.foreach { case (n, p) => require(p >= 0 && p <= 1,
      s"fraction for '$n' out of [0,1]: $p") }
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val P = targets.size
    val eps = 1.0 / accuracy
    val delta = bandDelta.getOrElse(5.0 / accuracy)
    val fracs = targets.map(_._2)
    val loFracs = fracs.map(p => math.max(0.0, p - delta))
    val hiFracs = fracs.map(p => math.min(1.0, p + delta))

    // The group key rides every internal join/groupBy PACKED AS A
    // STRUCT: struct equality treats NULL fields as equal (ordering
    // semantics), where a bare multi-column equi-join silently drops
    // NULL-keyed groups — and `percentile()` does return a row for a
    // NULL group, so the parity contract requires carrying it.
    val g = Seq(col("__g"))
    val dfv = df.select(struct(groupCols.map(col): _*).as("__g"),
      col(valueCol).cast("double").as("__v"))
    val keyType = dfv.schema("__g").dataType

    def unpack(wide: DataFrame): DataFrame =
      wide.select(groupCols.map(c => col(s"__g.`$c`").as(c)) ++
        targets.map { case (name, _) => col(name) }: _*)
    def wideExact(src: DataFrame): DataFrame = {
      val aggs = targets.map { case (name, p) =>
        expr(s"percentile(__v, $p)").as(name) }
      src.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
    }

    // Pass 1a — route (eager): per-group non-NULL counts at the
    // driver, CARDINALITY-GUARDED: the probe collects at most cap+1
    // rows (the aggregation itself is distributed either way; only
    // the collect is bounded). cap+1 rows back means the group key is
    // too wide for driver routing — take the fully-distributed plan,
    // which never materializes a per-group table anywhere.
    val countRows = dfv.groupBy(g: _*)
      .agg(count(col("__v")).as("__n"))
      .limit(maxRoutedGroups + 1).collect()
    if (countRows.length > maxRoutedGroups)
      return distributedGroupedPercentiles(df, groupCols, valueCol,
        targets, accuracy, bandDelta, smallGroupThreshold)
    val largeRows = countRows.filter(_.getLong(1) > smallGroupThreshold)

    if (largeRows.isEmpty)
      // Every group fits the classic buffer bound — buffering is
      // bounded here BY CONSTRUCTION (driver-verified counts), and the
      // plain one-aggregation plan is the cheapest correct plan.
      return unpack(wideExact(dfv))

    def keyFrame(rs: Seq[Row]): DataFrame = spark.createDataFrame(
      rs.map(r => Row(r.get(0))).asJava,
      StructType(Seq(StructField("__g", keyType, nullable = true))))
    val largeKeys = keyFrame(largeRows.toSeq)

    // Pass 1b — nominate (eager): GK bands for large groups only,
    // collected → LITERAL brackets. One evaluation, by construction
    // (GK merges are arrival-order sensitive; a re-evaluated subtree
    // could band differently than the offsets pass counted).
    val bandExpr = s"percentile_approx(__v, array(${(loFracs ++ hiFracs)
      .mkString(",")}), $accuracy)"
    val bracketRows = dfv.join(broadcast(largeKeys), Seq("__g"))
      .groupBy(g: _*)
      .agg(count(col("__v")).as("__n"), expr(bandExpr).as("__band"))
      .collect()
    val bracketsSchema = StructType(Seq(
      StructField("__g", keyType, nullable = true),
      StructField("__n", LongType, nullable = false),
      StructField("__band", ArrayType(DoubleType), nullable = true)))
    val brackets = spark.createDataFrame(
      bracketRows.toSeq.asJava, bracketsSchema)

    // Driver-side per-(group, target) routing table. pos/k0/k1 use
    // percentile()'s own arithmetic (pos = p·(n−1) in doubles).
    final case class Pair(key: Any, i: Int, lo: Double, hi: Double,
        n: Long, pos: Double, k0: Long, k1: Long)
    val pairs = bracketRows.toSeq.flatMap { r =>
      val band = r.getSeq[Double](2)
      (0 until P).map { i =>
        val pos = fracs(i) * (r.getLong(1) - 1)
        Pair(r.get(0), i, band(i), band(P + i), r.getLong(1), pos,
          math.floor(pos).toLong, math.ceil(pos).toLong)
      }
    }
    val (scPairs, winPairs) = pairs.partition(p => p.lo == p.hi)

    // Pass 2 — rank offsets + in-band sizes: #values strictly below
    // each band's lo, and #values inside [lo, hi]. In-band values are
    // >= lo, so offset + in-band rank is the exact global rank.
    // Conditional integer sums — deterministic under any evaluation
    // order, map-side combined, slim rows.
    val withBand = dfv.join(broadcast(brackets), Seq("__g"))
    val belowAggs = (0 until P).map(i =>
      sum(when(col("__v") < element_at(col("__band"), i + 1), 1L)
        .otherwise(0L)).as(s"__below_$i"))
    val inAggs = (0 until P).map(i =>
      sum(when(col("__v") >= element_at(col("__band"), i + 1) &&
          col("__v") <= element_at(col("__band"), P + i + 1), 1L)
        .otherwise(0L)).as(s"__in_$i"))
    val offsets = withBand.filter(col("__v").isNotNull)
      .groupBy(g: _*).agg((belowAggs ++ inAggs).head,
        (belowAggs ++ inAggs).tail: _*)
      .select(g ++ Seq(
        array((0 until P).map(i => col(s"__below_$i")): _*).as("__belows"),
        array((0 until P).map(i => col(s"__in_$i")): _*).as("__ins")): _*)

    // Degenerate-band short-circuit: lo == hi means every in-band row
    // IS the band value; if the run [below, below+in) covers both
    // target ranks, the result is fully determined by the offsets —
    // no window touches the (possibly table-sized) duplicate run. The
    // value is interpolated at the driver with percentile()'s formula
    // (k0 != k1 still takes the weighted sum of the equal endpoints —
    // bit-parity, not algebraic shortcut).
    val scSchema = StructType(Seq(
      StructField("__g", keyType, nullable = true),
      StructField("__i", IntegerType, nullable = false),
      StructField("__k0", LongType, nullable = false),
      StructField("__k1", LongType, nullable = false),
      StructField("__value", DoubleType, nullable = true)))
    val scFrame = spark.createDataFrame(scPairs.map { p =>
      val v = if (p.k0 == p.k1) p.lo
        else (p.k1 - p.pos) * p.lo + (p.pos - p.k0) * p.lo
      Row(p.key, p.i, p.k0, p.k1, v)
    }.asJava, scSchema)
    val scCovered = scFrame.join(broadcast(offsets), Seq("__g"))
      .filter(col("__k0") >= element_at(col("__belows"), col("__i") + 1) &&
        col("__k1") <= element_at(col("__belows"), col("__i") + 1) +
          element_at(col("__ins"), col("__i") + 1) - 1)
      .select(g ++ Seq(col("__i"), col("__value")): _*)

    // Pass 3 — locate real bands: only in-band rows survive the range
    // join; the window ranks O((δ+ε)n) rows per (group, target), never
    // the table. A band whose in-band count exceeded its O((δ+ε)n)
    // budget (32× headroom, 4096 floor) is excluded here → it surfaces
    // in `missed` and the exact fallback takes it instead of a
    // run-length window.
    val winSchema = StructType(Seq(
      StructField("__g", keyType, nullable = true),
      StructField("__i", IntegerType, nullable = false),
      StructField("__lo", DoubleType, nullable = true),
      StructField("__hi", DoubleType, nullable = true),
      StructField("__n", LongType, nullable = false),
      StructField("__pos", DoubleType, nullable = false),
      StructField("__k0", LongType, nullable = false),
      StructField("__k1", LongType, nullable = false)))
    val winFrame = spark.createDataFrame(winPairs.map(p =>
      Row(p.key, p.i, p.lo, p.hi, p.n, p.pos, p.k0, p.k1)).asJava,
      winSchema)
    val bandBudget = greatest(lit(4096L),
      lit(32.0 * (delta + eps)) * col("__n")).cast("long")
    val banded = dfv.filter(col("__v").isNotNull)
      .join(broadcast(winFrame), Seq("__g"))
      .filter(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
      .join(broadcast(offsets), Seq("__g"))
      .filter(element_at(col("__ins"), col("__i") + 1) <= bandBudget)
    val rn = row_number().over(
      Window.partitionBy(g :+ col("__i"): _*).orderBy(col("__v")))
    val located = banded.withColumn("__rn", rn)
      .withColumn("__rank",
        element_at(col("__belows"), col("__i") + 1) + col("__rn") - 1)
      .filter(col("__rank") === col("__k0") || col("__rank") === col("__k1"))
      .groupBy(g ++ Seq(col("__i"), col("__pos"), col("__k0"),
        col("__k1")): _*)
      .agg(
        min(when(col("__rank") === col("__k0"), col("__v"))).as("__v0"),
        min(when(col("__rank") === col("__k1"), col("__v"))).as("__v1"))
    // Interpolation uses percentile()'s OWN formula — the two-sided
    // weighted sum, NOT v0 + f·(v1−v0): the forms differ in the last
    // ULP and the gate hashes doubles bit-for-bit.
    val winCovered = located
      .filter(col("__v0").isNotNull && col("__v1").isNotNull)
      .withColumn("__value",
        when(col("__k0") === col("__k1"), col("__v0"))
          .otherwise(
            (col("__k1").cast("double") - col("__pos")) * col("__v0") +
            (col("__pos") - col("__k0").cast("double")) * col("__v1")))
      .select(g ++ Seq(col("__i"), col("__value")): _*)
    val covered = scCovered.unionByName(winCovered)

    // Exact-verify fallback: (group, target) pairs the band missed or
    // the budget rerouted. The inner join below is AQE-eliminated when
    // `missedGroups` is empty, so the extra scan exists only when
    // actually needed.
    val expSchema = StructType(Seq(
      StructField("__g", keyType, nullable = true),
      StructField("__i", IntegerType, nullable = false)))
    val expected = spark.createDataFrame(
      pairs.map(p => Row(p.key, p.i)).asJava, expSchema)
    val missed = expected.join(covered, Seq("__g", "__i"), "left_anti")
    val missedGroups = missed.select(g: _*).distinct()
    val exactAggs = targets.zipWithIndex.map { case ((_, p), i) =>
      expr(s"percentile(__v, $p)").as(s"__exact_$i") }
    val fallbackWide = dfv.join(broadcast(missedGroups), Seq("__g"))
      .groupBy(g: _*).agg(exactAggs.head, exactAggs.tail: _*)
    val fallbackLong = fallbackWide
      .select(g :+ explode(array((0 until P).map(i => struct(
        lit(i).as("__i"), col(s"__exact_$i").as("__value"))): _*))
        .as("__e"): _*)
      .select(g ++ Seq(col("__e.__i").as("__i"), col("__e.__value")
        .as("__value")): _*)
      .join(missed.select((g :+ col("__i")): _*), Seq("__g", "__i"),
        "left_semi")

    // Wide sketch-path result: one row per large group, one column per
    // target.
    val long = covered.unionByName(fallbackLong)
    val wideAggs = targets.zipWithIndex.map { case ((name, _), i) =>
      max(when(col("__i") === i, col("__value"))).as(name) }
    val wideSketch = long.groupBy(g: _*).agg(wideAggs.head,
      wideAggs.tail: _*)

    // Small/empty groups (count ≤ threshold, driver-verified — incl.
    // all-NULL groups, whose percentile() is NULL) take the classic
    // plan restricted to just those groups.
    val smallRows = countRows.filter(_.getLong(1) <= smallGroupThreshold)
    val union =
      if (smallRows.isEmpty) wideSketch
      else wideExact(dfv.join(broadcast(keyFrame(smallRows.toSeq)),
        Seq("__g"), "left_semi")).unionByName(wideSketch)

    // Safety net: every observed group appears exactly once, NULL
    // percentiles for any group both paths dropped.
    val allKeys = keyFrame(countRows.toSeq)
    unpack(allKeys.join(union, Seq("__g"), "left"))
  }

  /** The high-cardinality twin of [[exactGroupedPercentiles]]: same
    * nominate/locate/verify algorithm, ZERO driver-side per-group
    * state. Every table the routed plan collected (counts, GK bands,
    * the (group, target) routing rows) stays a DataFrame keyed by the
    * group struct; every broadcast join becomes a shuffle join on
    * `__g`. Entered automatically when the routing probe overflows
    * `maxRoutedGroups`, or callable directly when the caller knows the
    * key is wide.
    *
    * The one materialization: the count+band aggregation is
    * `localCheckpoint()`ed (eager). GK merge results vary with
    * partial-aggregate arrival order, so the band subtree must be
    * evaluated EXACTLY ONCE — the routed plan got that by collecting
    * bands to literals; here lineage truncation gives the same
    * guarantee with the blocks living on executors (lost-executor
    * recomputation is impossible by construction — the job fails over
    * to a retry rather than silently re-banding). Size is
    * O(#groups × 2P doubles), spread across the cluster.
    *
    * Bit-parity with `percentile()` holds by the same argument as the
    * routed plan: identical band widths, identical conditional-sum
    * offsets, identical window ranking, identical two-sided
    * interpolation arithmetic.
    *
    * MAINTENANCE CONTRACT: this is deliberately a structural twin of
    * the routed plan (the join strategies differ too much to share a
    * parameterized core without obscuring both); the drift guard is
    * that BOTH twins are pinned bit-for-bit against the same external
    * reference — Spark's own `percentile()` — across every group
    * shape in PercentilesSpec. Any fix to band arithmetic,
    * interpolation, or NULL handling must land in both twins, and an
    * unmirrored change fails the spec rather than diverging silently. */
  def distributedGroupedPercentiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, targets: Seq[(String, Double)],
      accuracy: Int = 10000,
      bandDelta: Option[Double] = None,
      smallGroupThreshold: Long = 1L << 20): DataFrame = {
    require(targets.nonEmpty, "need at least one percentile target")
    targets.foreach { case (n, p) => require(p >= 0 && p <= 1,
      s"fraction for '$n' out of [0,1]: $p") }
    val P = targets.size
    val eps = 1.0 / accuracy
    val delta = bandDelta.getOrElse(5.0 / accuracy)
    val fracs = targets.map(_._2)
    val loFracs = fracs.map(p => math.max(0.0, p - delta))
    val hiFracs = fracs.map(p => math.min(1.0, p + delta))

    val g = Seq(col("__g"))
    val dfv = df.select(struct(groupCols.map(col): _*).as("__g"),
      col(valueCol).cast("double").as("__v"))

    def unpack(wide: DataFrame): DataFrame =
      wide.select(groupCols.map(c => col(s"__g.`$c`").as(c)) ++
        targets.map { case (name, _) => col(name) }: _*)
    def wideExact(src: DataFrame): DataFrame = {
      val aggs = targets.map { case (name, p) =>
        expr(s"percentile(__v, $p)").as(name) }
      src.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
    }

    // Pass 1 — count + nominate in ONE aggregation, materialized
    // eagerly exactly once (see scaladoc: GK is arrival-order
    // sensitive; downstream passes must all see the same bands).
    val bandExpr = s"percentile_approx(__v, array(${(loFracs ++ hiFracs)
      .mkString(",")}), $accuracy)"
    val stats = dfv.groupBy(g: _*)
      .agg(count(col("__v")).as("__n"), expr(bandExpr).as("__band"))
      .localCheckpoint()

    val smallKeys = stats.filter(col("__n") <= smallGroupThreshold)
      .select(g: _*)
    val largeStats = stats.filter(col("__n") > smallGroupThreshold)

    // Long-form routing table AS A DATAFRAME: one row per
    // (group, target i) with band, pos/k0/k1 — percentile()'s own
    // arithmetic (pos = p·(n−1) in doubles), matching the routed
    // plan's driver-side Pair exactly.
    val fracArr = array(fracs.map(lit): _*)
    val pairsLong = largeStats
      .select(col("__g"), col("__n"),
        posexplode(array((0 until P).map(i => struct(
          element_at(col("__band"), i + 1).as("lo"),
          element_at(col("__band"), P + i + 1).as("hi"))): _*)))
      .select(col("__g"), col("__n"), col("pos").as("__i"),
        col("col.lo").as("__lo"), col("col.hi").as("__hi"))
      .withColumn("__pos",
        element_at(fracArr, col("__i") + 1) * (col("__n") - 1))
      .withColumn("__k0", floor(col("__pos")).cast("long"))
      .withColumn("__k1", ceil(col("__pos")).cast("long"))

    // Pass 2 — rank offsets + in-band sizes (large groups only):
    // identical conditional sums, shuffle join instead of broadcast.
    val withBand = dfv
      .join(largeStats.select(col("__g"), col("__band")), Seq("__g"))
    val belowAggs = (0 until P).map(i =>
      sum(when(col("__v") < element_at(col("__band"), i + 1), 1L)
        .otherwise(0L)).as(s"__below_$i"))
    val inAggs = (0 until P).map(i =>
      sum(when(col("__v") >= element_at(col("__band"), i + 1) &&
          col("__v") <= element_at(col("__band"), P + i + 1), 1L)
        .otherwise(0L)).as(s"__in_$i"))
    val offsets = withBand.filter(col("__v").isNotNull)
      .groupBy(g: _*).agg((belowAggs ++ inAggs).head,
        (belowAggs ++ inAggs).tail: _*)
      .select(g ++ Seq(
        array((0 until P).map(i => col(s"__below_$i")): _*).as("__belows"),
        array((0 until P).map(i => col(s"__in_$i")): _*).as("__ins")): _*)

    val pw = pairsLong.join(offsets, Seq("__g"))
    val belowI = element_at(col("__belows"), col("__i") + 1)
    val inI = element_at(col("__ins"), col("__i") + 1)

    // Degenerate-band short-circuit — same covered check and same
    // bit-parity interpolation of the equal endpoints.
    val scCovered = pw
      .filter(col("__lo") === col("__hi") &&
        col("__k0") >= belowI && col("__k1") <= belowI + inI - 1)
      .withColumn("__value",
        when(col("__k0") === col("__k1"), col("__lo"))
          .otherwise(
            (col("__k1").cast("double") - col("__pos")) * col("__lo") +
            (col("__pos") - col("__k0").cast("double")) * col("__lo")))
      .select(g ++ Seq(col("__i"), col("__value")): _*)

    // Pass 3 — locate real bands under the same in-band budget; a
    // blown budget routes the pair to the fallback, never the window.
    val bandBudget = greatest(lit(4096L),
      lit(32.0 * (delta + eps)) * col("__n")).cast("long")
    val winPairs = pw
      .filter(col("__lo") < col("__hi") && inI <= bandBudget)
      .select(g ++ Seq(col("__i"), col("__lo"), col("__hi"),
        col("__pos"), col("__k0"), col("__k1"),
        belowI.as("__below")): _*)
    val banded = dfv.filter(col("__v").isNotNull)
      .join(winPairs, Seq("__g"))
      .filter(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
    val rn = row_number().over(
      Window.partitionBy(g :+ col("__i"): _*).orderBy(col("__v")))
    val located = banded.withColumn("__rn", rn)
      .withColumn("__rank", col("__below") + col("__rn") - 1)
      .filter(col("__rank") === col("__k0") || col("__rank") === col("__k1"))
      .groupBy(g ++ Seq(col("__i"), col("__pos"), col("__k0"),
        col("__k1")): _*)
      .agg(
        min(when(col("__rank") === col("__k0"), col("__v"))).as("__v0"),
        min(when(col("__rank") === col("__k1"), col("__v"))).as("__v1"))
    val winCovered = located
      .filter(col("__v0").isNotNull && col("__v1").isNotNull)
      .withColumn("__value",
        when(col("__k0") === col("__k1"), col("__v0"))
          .otherwise(
            (col("__k1").cast("double") - col("__pos")) * col("__v0") +
            (col("__pos") - col("__k0").cast("double")) * col("__v1")))
      .select(g ++ Seq(col("__i"), col("__value")): _*)
    val covered = scCovered.unionByName(winCovered)

    // Exact-verify fallback for missed/rerouted pairs — semi joins on
    // the key, no broadcast pin (the missed set is usually empty and
    // AQE collapses the scan).
    val expected = pairsLong.select(g :+ col("__i"): _*)
    val missed = expected.join(covered, Seq("__g", "__i"), "left_anti")
    val missedGroups = missed.select(g: _*).distinct()
    val exactAggs = targets.zipWithIndex.map { case ((_, p), i) =>
      expr(s"percentile(__v, $p)").as(s"__exact_$i") }
    val fallbackWide = dfv.join(missedGroups, Seq("__g"), "left_semi")
      .groupBy(g: _*).agg(exactAggs.head, exactAggs.tail: _*)
    val fallbackLong = fallbackWide
      .select(g :+ explode(array((0 until P).map(i => struct(
        lit(i).as("__i"), col(s"__exact_$i").as("__value"))): _*))
        .as("__e"): _*)
      .select(g ++ Seq(col("__e.__i").as("__i"), col("__e.__value")
        .as("__value")): _*)
      .join(missed.select((g :+ col("__i")): _*), Seq("__g", "__i"),
        "left_semi")

    val long = covered.unionByName(fallbackLong)
    val wideAggs = targets.zipWithIndex.map { case ((name, _), i) =>
      max(when(col("__i") === i, col("__value"))).as(name) }
    val wideSketch = long.groupBy(g: _*).agg(wideAggs.head,
      wideAggs.tail: _*)

    // Small groups (incl. all-NULL) take the classic plan, restricted
    // by semi join.
    val smallWide = wideExact(
      dfv.join(smallKeys, Seq("__g"), "left_semi"))
    val union = smallWide.unionByName(wideSketch)

    // Safety net: every observed group exactly once.
    val allKeys = stats.select(g: _*)
    unpack(allKeys.join(union, Seq("__g"), "left"))
  }

  /** Winsorization: clamp `valueCol` into its per-group exact
    * [`lo`, `hi`]-percentile band — the CLAMP twin of the pipeline's
    * MAD outlier DROP (cap the heavy tail instead of discarding the
    * document). The band comes from [[exactGroupedPercentiles]], so
    * the operator stays bounded-memory at any group size; the clamp
    * itself is one broadcast join + `greatest`/`least` inside the
    * scan stage. NULL values stay NULL; an all-NULL group (NULL band)
    * passes its rows through unclamped — there is no distribution to
    * clamp against. Joined on a STRUCT of the group keys so
    * NULL-keyed groups keep their rows.
    *
    * @param as output column (defaults to rewriting `valueCol`;
    *           original column order is preserved when rewriting). */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                lo: Double = 0.01, hi: Double = 0.99,
                as: String = ""): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi,
      s"winsorize needs 0 <= lo <= hi <= 1, got [$lo, $hi]")
    require(groupCols.nonEmpty,
      "winsorize needs group columns; for a global clamp add a " +
        "constant column (the pipeline step does exactly that)")
    val outCol = if (as.isEmpty) valueCol else as
    val bands = exactGroupedPercentiles(df, groupCols, valueCol,
      Seq("__wlo" -> lo, "__whi" -> hi))
    def gk(d: DataFrame) = struct(groupCols.map(d(_)): _*)
    val v = col(valueCol).cast("double")
    val clamped = when(v.isNull || col("__wlo").isNull, v)
      .otherwise(least(greatest(v, col("__wlo")), col("__whi")))
    val joined = df.join(
      broadcast(bands.select(gk(bands).as("__gk"),
        col("__wlo"), col("__whi"))),
      gk(df) === col("__gk"), "left")
    val projected = joined.withColumn(outCol, clamped)
      .drop("__gk", "__wlo", "__whi")
    // rewriting in place: withColumn keeps the original position, so
    // column order already matches df (+ appended when `as` is new)
    projected
  }
}
