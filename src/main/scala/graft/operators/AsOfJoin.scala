package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single right row
  * with the greatest right-time ≤ left-time within the same key — the
  * lookup shape of feature stores and slowly-changing joins. Spark has
  * no native operator for it; the naive formulation (range join +
  * per-row max) explodes to O(|L|·|R|) per key.
  *
  * This is the union trick: tag both sides, union, sort per key by
  * (time, side) with right rows first at equal times, and carry the
  * latest right payload forward with `last_value(ignoreNulls)`. ONE
  * shuffle on the key, no range explosion, window stays in codegen —
  * the formulation that survives 100 TB.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its `payload` columns are taken)
    * @param keys      equi-key columns present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param payload   right columns to attach (must not clash with left)
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // one unified schema: left columns + packed right payload + tags
    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .withColumn("__payload",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          payload.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType, nullable = true)))))
    val taggedRight = right
      .select((keys.map(col) :+ col(rightTime).as("__t")) :+
        struct(payload.map(col): _*).as("__payload"): _*)
      .withColumn("__is_left", lit(0))
    val unioned = taggedLeft.select(
      (keys.map(col) :+ col("__t") :+ col("__is_left") :+ col("__payload")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
      .unionByName(taggedRight, allowMissingColumns = true)

    // right rows sort before left rows at equal time → rt <= lt matches
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned.withColumn("__match",
      last(col("__payload"), ignoreNulls = true).over(w))

    matched.filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__match.$c").as(c)): _*)
  }
}
