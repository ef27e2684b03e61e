package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization, batch form: a new session starts when the
  * gap to the previous event of the same user exceeds `gapMinutes`.
  *
  * Plan shape: one shuffle on the user key, then two window passes
  * (lag → flag, running sum → session id) and a final partial-agg
  * groupBy — all inside whole-stage codegen. The streaming twin with
  * identical session semantics is
  * [[graft.streaming.EventStreams.sessionize]].
  */
object Sessionize {

  def sessions(events: DataFrame, userCol: String, tsCol: String,
               tieBreakCol: String, valueCol: String,
               gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieBreakCol))
    val gap: Column = expr(s"INTERVAL '$gapMinutes' MINUTE")
    val prev = lag(col(tsCol), 1).over(w)
    val newSess = when(prev.isNull || col(tsCol) - prev > gap, 1).otherwise(0)
    events
      .withColumn("__new", newSess)
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("long"))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("total_value"))
  }
}
