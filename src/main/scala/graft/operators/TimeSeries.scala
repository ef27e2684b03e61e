package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair operators — the gap-handling family that sits
  * beside resampling ([[AsOfJoin]]-based grid fill) and forward fill:
  * sensor/metric feeds at 100 TB arrive with NULL holes, and models
  * want dense series.
  *
  * Scale shape: everything here is window arithmetic over ONE
  * key-partitioned sort — the four helper frames (previous/next
  * non-NULL value and its timestamp) share the same partitioning and
  * ordering, so Catalyst plans a single exchange + sort with multiple
  * frame passes, never a join or a second shuffle.
  */
object TimeSeries {

  /** Fill NULL `valueCol` gaps by LINEAR INTERPOLATION between the
    * nearest non-NULL observations on the series' own time axis:
    *
    *   filled = prev + (next − prev) · (t − t_prev) / (t_next − t_prev)
    *
    * Boundary semantics (the pandas `interpolate(limit_direction=
    * "both")` convention): leading NULLs take the first observation,
    * trailing NULLs the last, an all-NULL series stays NULL. Non-NULL
    * rows pass through unchanged (cast to double — the interpolated
    * column has one type).
    *
    * `tsCol` must be NUMERIC (epoch seconds/micros, a grid index …) —
    * interpolation is arithmetic on the axis; convert timestamps
    * first (`unix_micros`). The arithmetic is plain IEEE double in
    * exactly the order written above, so an oracle that mirrors the
    * expression reproduces it bit-for-bit.
    *
    * @param orderCols extra tie-break columns after `tsCol` so rows at
    *        the same instant order deterministically
    * @param as output column name */
  def interpolateLinear(df: DataFrame, keyCols: Seq[String], tsCol: String,
                        valueCol: String, orderCols: Seq[String] = Nil,
                        as: String = "value_filled"): DataFrame = {
    require(keyCols.nonEmpty, "interpolateLinear needs partition keys")
    val ord = (col(tsCol) +: orderCols.map(col)).map(_.asc)
    val back = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol).cast("double")
    val t = col(tsCol).cast("double")
    val prevV = last(v, ignoreNulls = true).over(back)
    val prevT = last(when(v.isNotNull, t), ignoreNulls = true).over(back)
    val nextV = first(v, ignoreNulls = true).over(fwd)
    val nextT = first(when(v.isNotNull, t), ignoreNulls = true).over(fwd)
    df.withColumn(as,
      when(v.isNotNull, v)
        .when(prevV.isNull, nextV) // leading gap → first observation
        .when(nextV.isNull, prevV) // trailing gap → last observation
        // zero-width interval (observations at the SAME instant
        // bracket the gap): the axis carries no information — take the
        // earlier observation rather than divide by zero (ANSI-loud)
        .when(nextT === prevT, prevV)
        .otherwise(prevV + (nextV - prevV) * (t - prevT) / (nextT - prevT)))
  }

  /** Seasonal COUNT anomaly detection: bucket rows into
    * (series, season, instance) event counts — e.g. series =
    * event_type, season = hour-of-day, instance = calendar date — then
    * flag instances whose count deviates from that (series, season)
    * cell's cross-instance distribution by ≥ `minSigma` standard
    * deviations. The seasonal-profile residual test: "checkout events
    * at 3 am on May 9 ran 4σ over the usual 3-am rate" — traffic
    * spikes, outages and bot bursts against a daily/weekly rhythm that
    * a global threshold would drown in.
    *
    * Determinism: counts are INTEGERS, so Σc and Σc² are exact in any
    * summation order (the float-sum ULP flap that forces the decimal
    * machinery in the price queries cannot occur); mean/σ/z derive
    * from the exact sums in double arithmetic an oracle mirrors
    * bit-for-bit. Zero-variance cells are excluded by the EXACT
    * integer identity n·Σc² = (Σc)² (a float `σ > 0` test would flap).
    *
    * Only OBSERVED instances participate: an (instance, series,
    * season) bucket with zero rows does not appear — the baseline is
    * over instances that produced data (absence detection is the gap
    * family's job, not this one's).
    *
    * Scale shape: one count aggregation over one scan (shuffle keyed
    * by the full bucket), one re-aggregation to per-cell moments
    * (strictly smaller), one broadcast-friendly join back — counts and
    * moments are |cells|-sized, never row-sized.
    *
    * @return (seriesCols…, season, instance, cnt, z) for |z| ≥
    *         minSigma, z signed (spikes positive, droughts negative) */
  def seasonalCountAnomalies(df: DataFrame, seriesCols: Seq[String],
                             seasonCol: Column, instanceCol: Column,
                             minSigma: Double = 3.0): DataFrame = {
    require(seriesCols.nonEmpty, "need at least one series column")
    val sc = seriesCols.map(col)
    val buckets = df
      .groupBy(sc :+ seasonCol.as("season") :+ instanceCol.as("instance"): _*)
      .agg(count(lit(1)).as("cnt"))
    val cells = buckets
      .groupBy(sc :+ col("season"): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("cnt")).as("sx"),
        sum(col("cnt") * col("cnt")).as("sxx"))
      // n >= 2 (one instance has no distribution) and variance > 0 by
      // the exact integer identity — NaN/Inf z can never reach the gate
      .filter(col("n") >= 2 && col("n") * col("sxx") =!= col("sx") * col("sx"))
    buckets.join(cells, seriesCols :+ "season")
      .withColumn("z",
        (col("cnt") - col("sx").cast("double") / col("n")) /
          sqrt((col("sxx") - col("sx").cast("double") * col("sx") / col("n")) /
            (col("n") - 1)))
      .filter(abs(col("z")) >= minSigma)
      .select(sc ++ Seq(col("season"), col("instance"), col("cnt"),
        col("z")): _*)
  }

  /** CUSUM change-point scan: S_t = Σ_{i≤t} (x_i − μ) against the
    * whole-series mean μ — the classic cumulative-sum drift detector.
    * A level shift makes |S| grow linearly from the shift onward, so
    * argmax|S| locates the change; a stable series random-walks near
    * zero. Per (series) one ordered window cumsum — the running sum
    * evaluates in frame order, so the float accumulation is the SAME
    * operation sequence on any engine and the statistic is
    * bit-stable. μ is injected per series via one broadcast-joined
    * aggregate (exact integer sum / count, one IEEE division).
    *
    * Returns the input keyed rows + (mu, s, abs_s); downstream picks
    * argmax (deterministic: break ties on the order column).
    */
  def cusum(df: DataFrame, seriesCols: Seq[String], orderCol: String,
            valueCol: String): DataFrame = {
    require(seriesCols.nonEmpty,
      "at least one series column required (use a literal for a single series)")
    val sc = seriesCols.map(col)
    val mu = df.groupBy(sc: _*)
      .agg((sum(col(valueCol)).cast("double") /
        count(lit(1)).cast("double")).as("mu"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sc: _*).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    df.join(broadcast(mu), seriesCols)
      .withColumn("s", sum(col(valueCol).cast("double") - col("mu")).over(w))
      .withColumn("abs_s", abs(col("s")))
  }

  /** Kaplan–Meier survival estimator over right-censored durations —
    * the retention-curve machinery of churn/lifetime analysis. One
    * row per subject: `durationCol` (non-negative integral time to
    * event or censoring) and `eventCol` (1 = event observed,
    * 0 = censored). NULL durations/events are excluded (no observed
    * time); subjects censored at t leave the risk set after t.
    *
    * Per distinct time t: n_risk = |{duration ≥ t}|, n_events =
    * events AT t, hazard = n_events/n_risk, and S(t) = Π_{u≤t}
    * (1 − hazard_u). Determinism: counts are exact integers; the
    * product is kept in LOG space — each factor's ln rounds to 9
    * decimals (the psi_term libm-ulp discipline) and accumulates
    * through an exact DECIMAL window cumsum, so `log_surv` is
    * bit-stable under any partitioning and engine; `surv` re-rounds
    * exp to 9 decimals. Once hazard hits 1 (everyone at risk events),
    * S is exactly 0 from that time on: those rows carry surv = 0.0
    * and NULL log_surv (−∞ has no stable float encoding).
    *
    * Shape: one partial-aggregated groupBy on duration, then one
    * single-partition window over the DISTINCT durations only
    * (bounded by time-grid cardinality, not subjects — quantize a
    * continuous duration upstream at 100 TB; the [[Drift.ksStatistic]]
    * posture).
    *
    * EAGER at construction: the grid-cardinality guard runs a
    * limit-bounded Spark job (and persists the grid) when this method
    * is CALLED, not when the result is acted on.
    *
    * @return (duration, n_risk, n_events, n_censored, hazard,
    *         log_surv, surv) ordered by duration */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String,
                  maxGrid: Int = ValueGrid.DefaultMaxGrid): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(col(durationCol).cast("long").as("duration"))
      .agg(count(lit(1)).as("n_at"),
        sum(col(eventCol).cast("long")).as("n_events"))
    // LOUD grid guard (enforced, not documented — r9 verdict): both
    // windows below are single-partition over the distinct-duration
    // grid; quantize a continuous duration upstream. boundedGrid
    // returns the grid PERSISTED so the probe's aggregation is not
    // recomputed by the windows below.
    val g2 = ValueGrid.boundedGrid(g, "kaplanMeier", maxGrid)
    val wDesc = Window.orderBy(col("duration").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAsc = Window.orderBy(col("duration"))
      .rowsBetween(Window.unboundedPreceding, 0)
    g2.withColumn("n_risk", sum(col("n_at")).over(wDesc))
      .withColumn("hazard",
        col("n_events").cast("double") / col("n_risk").cast("double"))
      // ln(1 − d/n) rounded to 9, summed EXACTLY in decimal frame
      // order; the all-events time poisons every later S to exact 0
      .withColumn("dead",
        max(when(col("n_events") === col("n_risk"), 1).otherwise(0))
          .over(wAsc))
      .withColumn("log_surv",
        when(col("dead") === 0,
          sum(when(col("n_events") < col("n_risk"),
            round(log(lit(1.0) - col("hazard")), 9))
            .otherwise(lit(0.0)).cast("decimal(28,12)")).over(wAsc)
            .cast("double")))
      .withColumn("surv",
        when(col("dead") === 1, lit(0.0))
          .otherwise(round(exp(col("log_surv")), 9)))
      .select(col("duration"), col("n_risk"), col("n_events"),
        (col("n_at") - col("n_events")).as("n_censored"),
        col("hazard"), col("log_surv"), col("surv"))
      .orderBy("duration")
  }
}
