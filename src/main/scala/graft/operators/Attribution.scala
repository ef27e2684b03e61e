package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution over an event stream.
  *
  * For every conversion event, the touches (impression/click-class
  * events) by the SAME user inside a lookback window before the
  * conversion share the conversion's value. Two credit models:
  *
  *  - linear: each of the n touches gets value/n;
  *  - position (U-shaped): first touch 0.4·value, last touch
  *    0.4·value, the n−2 middles split 0.2·value evenly (n=1 → 1.0,
  *    n=2 → 0.5/0.5 — the standard degenerate cases).
  *
  * Scale shape: the touch side (the firehose) is the fact side — it
  * maps to ONE time bucket per row and never explodes. Conversions
  * (orders of magnitude fewer) explode to at most TWO buckets (bucket
  * width = the lookback), and the two sides meet on a
  * (user, bucket) equi-join — never a per-user cross product, never a
  * theta join the planner would nested-loop. A residual range filter
  * re-checks the exact window. Per-conversion ranking then runs in one
  * window over the (small) matched-pair set.
  *
  * All window arithmetic is in microsecond epoch longs (integer
  * compares — no timezone or interval semantics in the hot path);
  * ordering ties break on event id, so credits are deterministic under
  * any partitioning.
  */
object Attribution {

  /** Matched (conversion, touch) pairs with per-conversion touch count
    * and rank. Columns: user_id, conv_id, conv_us, value, touch_id,
    * touch_us, touch_type, n_touches, touch_rank. */
  def touchPairs(events: DataFrame, touchTypes: Seq[String],
                 convType: String, lookbackUs: Long): DataFrame = {
    require(lookbackUs > 0, s"lookbackUs must be positive, got $lookbackUs")
    // exact integer micros for LTZ *and* NTZ timestamps (the DST-safe
    // linearization the as-of family uses); restricted to timestamps —
    // timeAsNum yields DAY numbers for dates, which would silently
    // mis-scale a microsecond lookback
    val tsType = events.schema("ts").dataType
    require(tsType == org.apache.spark.sql.types.TimestampType ||
      tsType == org.apache.spark.sql.types.TimestampNTZType,
      s"ts must be a timestamp column, got $tsType")
    val tsUs = AsOfJoin.timeAsNum(col("ts"), tsType)
    val conv = events.filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        tsUs.as("conv_us"), col("value"))
    val touch = events.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id").as("t_user_id"),
        col("event_id").as("touch_id"),
        tsUs.as("touch_us"),
        col("event_type").as("touch_type"))
    // window (conv_us - L, conv_us) spans ≤ 2 buckets of width L; the
    // touch side maps to exactly one bucket — fact side never explodes
    val convB = conv.withColumn("__bucket",
      explode(sequence(
        floor((col("conv_us") - lookbackUs) / lookbackUs).cast("long"),
        floor(col("conv_us") / lookbackUs).cast("long"))))
    val touchB = touch.withColumn("__bucket",
      floor(col("touch_us") / lookbackUs).cast("long"))
    val pairs = convB.join(touchB,
        convB("__bucket") === touchB("__bucket") &&
          col("user_id") === col("t_user_id"))
      .filter(col("touch_us") >= col("conv_us") - lookbackUs &&
        col("touch_us") < col("conv_us"))
      .drop("__bucket", "t_user_id")
    val perConv = Window.partitionBy(col("conv_id"))
    pairs
      .withColumn("n_touches", count(lit(1)).over(perConv))
      .withColumn("touch_rank", row_number().over(
        perConv.orderBy(col("touch_us"), col("touch_id"))))
  }

  /** Linear credit per matched touch: value / n_touches. */
  def linearCredit(events: DataFrame, touchTypes: Seq[String],
                   convType: String, lookbackUs: Long): DataFrame =
    touchPairs(events, touchTypes, convType, lookbackUs)
      .withColumn("credit", col("value") / col("n_touches"))

  /** U-shaped credit: 0.4 first / 0.4 last / 0.2 split over middles.
    * The weights are exact binary fractions of small integers scaled by
    * value with ONE multiply and ONE divide — the same IEEE expression
    * any engine evaluates identically. */
  def positionCredit(events: DataFrame, touchTypes: Seq[String],
                     convType: String, lookbackUs: Long): DataFrame =
    touchPairs(events, touchTypes, convType, lookbackUs)
      .withColumn("credit",
        when(col("n_touches") === 1, col("value"))
          .when(col("n_touches") === 2, col("value") * 0.5)
          .when(col("touch_rank") === 1 ||
            col("touch_rank") === col("n_touches"), col("value") * 0.4)
          .otherwise(col("value") * 0.2 / (col("n_touches") - 2)))
}
