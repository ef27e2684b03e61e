package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) extraction — the multi-objective shortlist
  * query of procurement/ranking analytics ("no other row is at least
  * as good on BOTH axes and strictly better on one").
  *
  * Both objectives MINIMIZE by convention; negate a column upstream to
  * maximize. Strict-dominance semantics: ties on both axes dominate
  * neither way, so duplicate frontier points all survive.
  */
object Skyline {

  /** 2D skyline via the sort–prefix-min identity instead of the naive
    * quadratic dominance anti-join: a row (x, y) is on the frontier
    * iff y equals the best y AT its x AND that best beats the best y
    * over all STRICTLY smaller x. Shape: one partial-aggregated
    * groupBy on x, one window over the DISTINCT x values only
    * (value-grid cardinality, not rows — the ksStatistic posture),
    * one equi-join back to the input on x. An all-pairs NOT EXISTS
    * oracle would be O(n²); this is O(n) past the sort, and the
    * window runs over the x GRID, so it survives a 100× scale-up
    * wherever the grid does. NULL objectives are excluded (they
    * compare with nothing).
    *
    * EAGER at construction: the grid-cardinality guard runs a
    * limit-bounded Spark job (and persists the per-x minima grid)
    * when this method is CALLED, not when the result is acted on.
    *
    * @return the input rows on the frontier, all columns preserved */
  def frontier2d(df: DataFrame, xCol: String, yCol: String,
                 maxGrid: Int = ValueGrid.DefaultMaxGrid): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clean = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val bestAtX = clean.groupBy(col(xCol).as("__x"))
      .agg(min(col(yCol)).as("__best"))
    // LOUD grid guard (enforced, not documented — r9 verdict): the
    // prefix-min window below is single-partition over the distinct-x
    // grid; quantize a continuous x upstream. boundedGrid returns the
    // grid PERSISTED so the probe's aggregation is not recomputed.
    val bounded = ValueGrid.boundedGrid(bestAtX, "frontier2d", maxGrid)
    val wPrev = Window.orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierX = bounded
      .withColumn("__prev", min(col("__best")).over(wPrev))
      // strictly better than every smaller-x best: an equal prefix
      // best at smaller x dominates via the strict x edge
      .filter(col("__prev").isNull || col("__best") < col("__prev"))
      .select(col("__x"), col("__best"))
    clean.join(frontierX,
        clean(xCol) === col("__x") && clean(yCol) === col("__best"))
      .drop("__x", "__best")
  }
}
