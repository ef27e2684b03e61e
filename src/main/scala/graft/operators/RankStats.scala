package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank statistics computed from GROUPED value counts — never from a
  * per-row global sort.
  *
  * The classical presentations of Spearman's rho and the
  * Mann-Whitney U rank rows one by one, which on a cluster means a
  * total sort of the fact table into ONE task. Every statistic here
  * is instead derived from the value-level contingency table: one
  * hash aggregation compresses N rows to the (few thousand) distinct
  * observed values, and the tie-averaged ranks fall out of a window
  * over THAT compressed table. The expensive scan is a plain grouped
  * count (map-side partials, no skew), and the only ordered pass
  * touches #distinct-values rows — the same trick a histogram-based
  * quantile uses, applied to rank tests.
  *
  * Determinism: ranks and counts stay integral (doubled ranks — the
  * tie-average `k + (t-1)/2` doubles to the integer `2k + t - 1`),
  * sums accumulate in DECIMAL(38,0) (exact, order-free), and doubles
  * appear only in the final closed-form statistic — so the result is
  * bit-stable across engines and partitionings.
  */
object RankStats {

  /** Doubled tie-averaged ranks for the distinct values of `valueCol`
    * within each `partCols` group, from a pre-grouped count table
    * `cells(partCols*, valueCol, cntCol)`. Emits `r2` = twice the
    * average rank of the tied block (an exact BIGINT: 2·prev + t + 1)
    * so callers never touch fractional ranks. The window runs over
    * the distinct-value table only.
    */
  def doubledRanks(cells: DataFrame, partCols: Seq[String],
      valueCol: String, cntCol: String): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    cells.withColumn("prev_cnt",
        coalesce(sum(col(cntCol)).over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("prev_cnt") + col(cntCol) + lit(1L))
      .drop("prev_cnt")
  }

  private def dsum(c: Column): Column = sum(c.cast("decimal(38,0)"))

  /** Exact product of integral columns: each factor is widened to
    * DECIMAL before the multiply so the product can never overflow
    * LONG silently (counts × doubled-ranks exceed 2^63 well before
    * 100 TB). Spark clamps the result precision at 38 — ample for
    * count·rank·rank magnitudes. */
  private def dprod(cs: Column*): Column =
    cs.map(_.cast("decimal(19,0)")).reduce(_ * _)

  /** Spearman's rho between two low-cardinality columns, per group —
    * from ONE grouped count of (group, x, y) cells. Marginal doubled
    * ranks are computed per axis over the cell table, joined back, and
    * rho is Pearson over the (affine-invariant) doubled ranks with all
    * five moment sums exact in DECIMAL(38,0).
    *
    * Output: groupCols*, n, rho (rounded to `scale` decimals).
    */
  def spearmanFromCells(cells: DataFrame, groupCols: Seq[String],
      xCol: String, yCol: String, cntCol: String,
      scale: Int = 9): DataFrame = {
    val gx = cells.groupBy((groupCols :+ xCol).map(col): _*)
      .agg(sum(col(cntCol)).as("tx"))
    val gy = cells.groupBy((groupCols :+ yCol).map(col): _*)
      .agg(sum(col(cntCol)).as("ty"))
    val rx = doubledRanks(gx, groupCols, xCol, "tx")
      .select((groupCols.map(col) :+ col(xCol) :+ col("r2").as("r2x")): _*)
    val ry = doubledRanks(gy, groupCols, yCol, "ty")
      .select((groupCols.map(col) :+ col(yCol) :+ col("r2").as("r2y")): _*)
    val joined = cells
      .join(rx, groupCols :+ xCol)
      .join(ry, groupCols :+ yCol)
    val agg = joined.groupBy(groupCols.map(col): _*).agg(
      dsum(col(cntCol)).as("s1"),
      sum(dprod(col(cntCol), col("r2x"))).as("sx"),
      sum(dprod(col(cntCol), col("r2y"))).as("sy"),
      sum(dprod(col(cntCol), col("r2x"), col("r2y"))).as("sxy"),
      sum(dprod(col(cntCol), col("r2x"), col("r2x"))).as("sxx"),
      sum(dprod(col(cntCol), col("r2y"), col("r2y"))).as("syy"))
    val d = (c: String) => col(c).cast("double")
    agg.select((groupCols.map(col) :+
      col("s1").cast("long").as("n") :+
      round((d("s1") * d("sxy") - d("sx") * d("sy")) /
        sqrt((d("s1") * d("sxx") - d("sx") * d("sx")) *
             (d("s1") * d("syy") - d("sy") * d("sy"))), scale)
        .as("rho")): _*)
  }

  /** Mann-Whitney U (two-sided z, tie-corrected) between the rows
    * flagged `isA` and the rest, over `valueCol` — from the grouped
    * distinct-value table. One hash aggregation compresses the input;
    * the ordered pass and the rank-sum run over distinct values only.
    *
    * NULL values are EXCLUDED before ranking (r9 ADVICE): a NULL has
    * no rank position — and engines disagree on where it would sort
    * (Spark windows put NULLS FIRST, ANSI ORDER BY defaults LAST), so
    * ranking it would silently shift every statistic. Rows where
    * `isA` is NULL count as group B (not-A), matching SQL boolean
    * semantics of `CASE WHEN isA THEN … ELSE …`.
    *
    * Output one row: n1, n2, u1, r1_mean, z — doubled-rank integer
    * arithmetic until the closed-form z (rounded to `scale`).
    */
  def mannWhitney(df: DataFrame, isA: Column, valueCol: String,
      scale: Int = 9): DataFrame = {
    val cells = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("na"),
        sum(when(isA, 0L).otherwise(1L)).as("nb"))
    val ranked = doubledRanks(
      cells.withColumn("t", col("na") + col("nb")), Nil, "v", "t")
    val agg = ranked.agg(
      dsum(col("na")).as("n1"),
      dsum(col("nb")).as("n2"),
      sum(dprod(col("na"), col("r2"))).as("r1_2"),
      sum(dprod(col("t"), col("t"), col("t"))).as("t3"),
      dsum(col("t")).as("t1"))
    val d = (c: String) => col(c).cast("double")
    agg.select(
        col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
        ((d("r1_2") - d("n1") * (d("n1") + lit(1.0))) / lit(2.0)).as("u1"),
        round(d("r1_2") / (lit(2.0) * d("n1")), scale).as("r1_mean"),
        (d("t3") - d("t1")).as("tie_term"))
      .withColumn("nn", d("n1") + d("n2"))
      .withColumn("z", round(
        (col("u1") - d("n1") * d("n2") / lit(2.0)) /
          sqrt(d("n1") * d("n2") / lit(12.0) *
            ((col("nn") + lit(1.0)) -
              col("tie_term") / (col("nn") * (col("nn") - lit(1.0))))),
        scale))
      .select(col("n1"), col("n2"), col("u1"), col("r1_mean"), col("z"))
  }

  /** Shannon entropy (nats) of the `catCol` distribution within each
    * `groupCols` group, from exact cell counts: entropy terms
    * p·ln(p) are rounded per cell and summed as DECIMAL — the exact,
    * order-free accumulation the chi-square query established. Also
    * emits the entropy normalized by ln(#categories observed).
    *
    * Output: groupCols*, n, k, entropy, norm_entropy.
    */
  def entropyProfile(df: DataFrame, groupCols: Seq[String],
      catCol: String, scale: Int = 9): DataFrame = {
    val cells = df.groupBy((groupCols :+ catCol).map(col): _*)
      .agg(count(lit(1)).as("cn"))
    val w = Window.partitionBy(groupCols.map(col): _*)
    val terms = cells
      .withColumn("n", sum(col("cn")).over(w))
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("p", col("cn").cast("double") / col("n").cast("double"))
      .withColumn("term",
        round(col("p") * log(col("p")), scale).cast("decimal(28,12)"))
    terms.groupBy((groupCols.map(col) :+ col("n") :+ col("k")): _*)
      .agg((-sum(col("term"))).cast("double").as("entropy"))
      .withColumn("norm_entropy", round(
        when(col("k") > 1,
          col("entropy") / log(col("k").cast("double"))).otherwise(0.0),
        scale))
      .withColumn("entropy", round(col("entropy"), scale))
  }
}
