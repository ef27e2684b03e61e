package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType, TimestampNTZType, TimestampType}

/** As-of (point-in-time) join: for each left row, the single right row
  * nearest in time within the same key — the lookup shape of feature
  * stores and slowly-changing joins. Spark has no native operator for
  * it; the naive formulation (range join + per-row max) explodes to
  * O(|L|·|R|) per key.
  *
  * This is the union trick: tag both sides, union, sort per key by
  * (time, side) with right rows first at equal times, and carry the
  * latest right payload forward with `last_value(ignoreNulls)`. ONE
  * shuffle on the key, no range explosion, window stays in codegen —
  * the formulation that survives 100 TB.
  *
  * Directions:
  *  - `backward` (default): greatest right-time ≤ left-time;
  *  - `forward`: smallest right-time ≥ left-time (the same carry over
  *    the REVERSED time ordering — still one shuffle);
  *  - `nearest`: whichever of the two is closer, ties to backward.
  *    Both carries share the key partitioning, so Spark reuses one
  *    exchange with two in-partition sorts. Timestamp distances
  *    compare in EXACT integer microseconds (`unix_micros`), never
  *    floating seconds — cross-engine tie behavior stays bit-stable.
  */
object AsOfJoin {

  /** Numeric form of a time value for distance arithmetic — EXACT for
    * every discrete type (integer micros for timestamps, day numbers
    * for dates, the value itself for integrals — a cast to double
    * would silently round nano-epoch longs beyond 2^53 and reject
    * DATE outright); only genuinely fractional types go through
    * double. */
  private[graft] def timeAsNum(c: Column, dt: DataType): Column = dt match {
    case TimestampType                         => unix_micros(c)
    // unix_micros only accepts LTZ, and an NTZ→LTZ cast interprets the
    // wall clock through the session zone — whose OFFSET IS NOT
    // CONSTANT across a DST transition, so cast-then-unix_micros would
    // distort distances near a spring-forward/fall-back boundary under
    // any non-fixed-offset session zone. Linearize the wall clock
    // directly instead: days×86 400e6 + in-day fields, all exact
    // integer arithmetic (SECOND extracts as decimal(8,6) — ×1e6 is
    // exact micros), identical to unix_micros under UTC and
    // zone-independent everywhere.
    case TimestampNTZType                      =>
      datediff(c.cast("date"), lit("1970-01-01")).cast("long") *
        lit(86400000000L) +
        hour(c).cast("long") * lit(3600000000L) +
        minute(c).cast("long") * lit(60000000L) +
        (date_part(lit("SECOND"), c) * lit(1000000)).cast("long")
    case org.apache.spark.sql.types.DateType   => datediff(c, lit("1970-01-01"))
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType   => c
    case _                                     => c.cast("double")
  }

  /** @param left      probe side
    * @param right     reference side (its `payload` columns are taken)
    * @param keys      equi-key columns present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param payload   right columns to attach (must not clash with left)
    * @param direction "backward" | "forward" | "nearest"
    * @param tolerance max |left-right| distance for a match to count,
    *                  in the time column's own discrete units (micros
    *                  for timestamps, days for dates, the value's own
    *                  units for integrals — [[timeAsNum]]'s scale). A
    *                  carried match farther than this yields NULL
    *                  payload, same as no match (pandas merge_asof
    *                  semantics); the left row itself is always kept.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           payload: Seq[String],
           direction: String = "backward",
           tolerance: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction '$direction'")
    tolerance.foreach(tol => require(tol >= 0,
      s"tolerance must be non-negative, got $tol"))
    val leftCols = left.columns.toSeq
    val timeType = right.schema(rightTime).dataType
    // one unified schema: left columns + packed right payload + tags.
    // Only `nearest` and tolerance checks compare the matched right
    // time, so only they pay for carrying `__rt` through the shuffle.
    val needRt = direction == "nearest" || tolerance.isDefined
    val rtField =
      if (needRt) Seq(StructField("__rt", timeType, nullable = true))
      else Nil
    val rtCol =
      if (needRt) Seq(col(rightTime).as("__rt")) else Nil
    val payloadType = StructType(
      payload.map(c => StructField(c, right.schema(c).dataType,
        nullable = true)) ++ rtField)
    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))
    val taggedRight = right
      .select((keys.map(col) :+ col(rightTime).as("__t")) :+
        struct(payload.map(col) ++ rtCol: _*).as("__payload"): _*)
      .withColumn("__is_left", lit(0))
    val unioned = taggedLeft.select(
      (keys.map(col) :+ col("__t") :+ col("__is_left") :+ col("__payload")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
      .unionByName(taggedRight, allowMissingColumns = true)

    // right rows sort before left rows at equal time (either
    // direction) → the boundary match is inclusive
    def carry(timeOrd: Column): Column =
      last(col("__payload"), ignoreNulls = true).over(
        Window.partitionBy(keys.map(col): _*)
          .orderBy(timeOrd, col("__is_left"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val backward = carry(col("__t").asc)
    val forward = carry(col("__t").desc)

    val matched = direction match {
      case "backward" => unioned.withColumn("__match", backward)
      case "forward"  => unioned.withColumn("__match", forward)
      case "nearest" =>
        val t = timeAsNum(col("__t"), timeType)
        def rt(m: String) = timeAsNum(col(s"$m.__rt"), timeType)
        unioned
          .withColumn("__b", backward)
          .withColumn("__f", forward)
          .withColumn("__match",
            when(col("__f").isNull, col("__b"))
              .when(col("__b").isNull, col("__f"))
              .when(t - rt("__b") <= rt("__f") - t, col("__b"))
              .otherwise(col("__f")))
    }

    // tolerance nulls the payload instead of re-matching: the carried
    // row IS the nearest candidate in `direction`, so if it's out of
    // range nothing else can be in range
    val takePayload: String => Column = tolerance match {
      case None => c => col(s"__match.$c").as(c)
      case Some(tol) =>
        val dist = abs(timeAsNum(col("__t"), timeType) -
          timeAsNum(col("__match.__rt"), timeType))
        c => when(dist <= tol, col(s"__match.$c")).as(c)
    }
    matched.filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++ payload.map(takePayload): _*)
  }
}
