package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped percentiles with BOUNDED executor memory — the 100 TB
  * form of `percentile()`.
  *
  * Spark's exact `percentile(v, p)` buffers EVERY value of the group in
  * one aggregation buffer; over a low-cardinality group key that is the
  * whole table in ~3 buffers — an executor OOM at scale, not a slow
  * query. The approx sketch bounds memory but surrenders exactness.
  * This operator keeps both properties:
  *
  *  1. SKETCH NOMINATES: one scan computes per-group counts and a
  *     Greenwald–Khanna band `[lo_p, hi_p]` around each target rank
  *     (`percentile_approx` at `p ± δ`, δ = 5/accuracy — wider than the
  *     sketch's own rank-error bound ε = 1/accuracy, so the true order
  *     statistics provably fall inside the band for any n with
  *     (δ−ε)·n ≥ 1, and the sketch is rank-exact below that size).
  *  2. EXACT LOCATES: a second scan counts values strictly below each
  *     band (the rank offset); a third scans ONLY in-band rows —
  *     O((δ+ε)·n) per group, a 0.06 % slice at the default accuracy —
  *     ranks them with one small window, and picks the two order
  *     statistics `floor/ceil(p·(n−1))` exactly. Interpolation then
  *     reproduces `percentile()` bit-for-bit (its own two-sided form,
  *     (k1 − pos)·v0 + (pos − k0)·v1 — the algebraically equal
  *     v0 + f·(v1−v0) differs in the last ULP and fails a hash gate).
  *  3. EXACT VERIFIES: any (group, p) whose band missed its order
  *     statistics (possible only in degenerate sketch states — the
  *     bound above covers normal operation) falls back to classic
  *     `percentile()` restricted to JUST those groups via an inner join
  *     that AQE eliminates when the miss-set is empty — the fallback
  *     scan costs nothing unless it is needed.
  *
  * Same nominate-then-verify posture as `heavy_hitter_tokens`
  * (TextQueries): sketches pick candidates, exact passes decide.
  *
  * Contract: group cardinality must be small enough to broadcast (the
  * per-group band/offset tables ride broadcast joins — the same
  * constraint any pivoted/wide result already implies). NULL values are
  * ignored per aggregate semantics; a group with only NULLs yields NULL
  * percentiles, like `percentile()`; NULL GROUP KEYS form their own
  * group, also like `percentile()` (the internal joins carry the key
  * as a struct for exactly this reason).
  */
object Percentiles {

  /** @param targets  output-column-name → fraction in [0,1]
    * @param accuracy GK sketch accuracy (rank error ≤ n/accuracy)
    * @param bandDelta TEST SEAM: override the δ half-width; narrow
    *                  deltas force the exact-verify fallback path. */
  def exactGroupedPercentiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, targets: Seq[(String, Double)],
      accuracy: Int = 10000,
      bandDelta: Option[Double] = None): DataFrame = {
    require(targets.nonEmpty, "need at least one percentile target")
    targets.foreach { case (n, p) => require(p >= 0 && p <= 1,
      s"fraction for '$n' out of [0,1]: $p") }
    val P = targets.size
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

    // Pass 1 — nominate: per-group count + one sketch evaluated at all
    // 2P band fractions (one buffer per group, bounded by accuracy).
    val bandExpr = s"percentile_approx(__v, array(${(loFracs ++ hiFracs)
      .mkString(",")}), $accuracy)"
    val brackets = dfv.groupBy(g: _*)
      .agg(count(col("__v")).as("__n"), expr(bandExpr).as("__band"))

    // Pass 2 — rank offsets: #values strictly below each band's lo.
    // In-band values are >= lo, so offset + in-band rank is the exact
    // global rank. Conditional sums, map-side combined — slim rows.
    val withBand = dfv.join(broadcast(brackets.filter(col("__n") > 0)),
      Seq("__g"))
    val belowAggs = (0 until P).map(i =>
      sum(when(col("__v") < element_at(col("__band"), i + 1), 1L)
        .otherwise(0L)).as(s"__below_$i"))
    val offsets = withBand.filter(col("__v").isNotNull)
      .groupBy(g: _*).agg(belowAggs.head, belowAggs.tail: _*)
      .select(g :+ array((0 until P).map(i => col(s"__below_$i")): _*)
        .as("__belows"): _*)

    // Pass 3 — locate: only in-band rows survive the filter; the window
    // ranks O((δ+ε)n) rows per (group, target), never the table.
    val bandStructs = array((0 until P).map(i => struct(
      lit(i).as("__i"),
      element_at(col("__band"), i + 1).as("__lo"),
      element_at(col("__band"), P + i + 1).as("__hi"))): _*)
    val banded = withBand.filter(col("__v").isNotNull)
      .select(g ++ Seq(col("__v"), col("__n"), explode(bandStructs).as("__b")): _*)
      .filter(col("__v") >= col("__b.__lo") && col("__v") <= col("__b.__hi"))
      .select(g ++ Seq(col("__b.__i").as("__i"), col("__v"), col("__n")): _*)
    val rn = row_number().over(
      Window.partitionBy(g :+ col("__i"): _*).orderBy(col("__v")))
    val fracOf = element_at(
      array(fracs.map(lit): _*), col("__i") + 1)
    val pos = fracOf * (col("__n") - 1).cast("double")
    val k0 = floor(pos)
    val k1 = ceil(pos)
    val ranked = banded.withColumn("__rn", rn)
      .join(broadcast(offsets), Seq("__g"))
      .withColumn("__rank",
        element_at(col("__belows"), col("__i") + 1) + col("__rn") - 1)
    val located = ranked
      .filter(col("__rank") === k0 || col("__rank") === k1)
      .groupBy(g :+ col("__i"): _*)
      .agg(
        min(when(col("__rank") === k0, col("__v"))).as("__v0"),
        min(when(col("__rank") === k1, col("__v"))).as("__v1"),
        first(col("__n")).as("__n"))
    // Interpolation uses percentile()'s OWN formula — the two-sided
    // weighted sum, NOT v0 + f·(v1−v0): the forms differ in the last
    // ULP and the gate hashes doubles bit-for-bit.
    val covered = located
      .filter(col("__v0").isNotNull && col("__v1").isNotNull)
      .withColumn("__value",
        when(k0 === k1, col("__v0"))
          .otherwise((k1 - pos) * col("__v0") + (pos - k0) * col("__v1")))
      .select(g ++ Seq(col("__i"), col("__value")): _*)

    // Exact-verify fallback: (group, target) pairs the band missed.
    // The inner join below is AQE-eliminated when `missedGroups` is
    // empty, so the extra scan exists only when actually needed.
    val expected = brackets.filter(col("__n") > 0)
      .select(g :+ explode(array((0 until P).map(lit): _*)).as("__i"): _*)
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

    // Wide result: one row per group, one column per target; groups
    // with zero non-NULL values (dropped by every pass above) rejoin
    // with NULL percentiles, matching `percentile()`.
    val long = covered.unionByName(fallbackLong)
    val wideAggs = targets.zipWithIndex.map { case ((name, _), i) =>
      max(when(col("__i") === i, col("__value"))).as(name) }
    val wide = long.groupBy(g: _*).agg(wideAggs.head, wideAggs.tail: _*)
    brackets.select(g: _*).join(wide, Seq("__g"), "left")
      .select(groupCols.map(c => col(s"__g.`$c`").as(c)) ++
        targets.map { case (name, _) => col(name) }: _*)
  }
}
