package graft.operators

import org.apache.spark.sql.DataFrame
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
}
