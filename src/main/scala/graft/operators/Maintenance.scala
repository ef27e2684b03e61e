package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators for long-lived parquet layouts. */
object Maintenance {

  /** Compact a parquet directory's small files to ~`targetFileBytes`
    * outputs (the small-files problem: a 100 TB table accreted by
    * thousands of incremental loads scans orders of magnitude slower
    * than the same bytes in right-sized files). Uses the current
    * on-disk byte size to pick the output file count; writes via
    * staging + swap like the sink overwrite.
    */
  def compactParquet(spark: SparkSession, path: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    // scheme-agnostic (file://, s3a://, hdfs://): all metadata and the
    // swap go through the Hadoop filesystem, same as the sinks
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.getContentSummary(target).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(path)
    val stage = new org.apache.hadoop.fs.Path(
      s"${path}__compact_${java.util.UUID.randomUUID().toString.take(8)}")
    // repartition (not coalesce): coalesce would fuse upstream
    // parallelism into the reduced slot count; a compaction job wants
    // full read parallelism and only narrow output width
    df.repartition(nFiles).write.mode("overwrite").parquet(stage.toString)
    fs.delete(target, true)
    if (!fs.rename(stage, target))
      throw new java.io.IOException(s"compaction swap failed for '$path'")
    nFiles
  }

  /** Single-pass column profile: one output row per column with null
    * count, distinct count, and min/max rendered as strings.
    * All columns' aggregates evaluate in ONE aggregation over the data
    * (no per-column scans); the per-column rows come from exploding
    * the aggregated struct, not re-reading.
    *
    * `approxDistinct=true` is the 100 TB default: exact
    * `count_distinct` over N columns makes Spark Expand-multiply the
    * scan N-fold (one duplicated stream per distinct aggregate); the
    * [[graft.functions.LinearCountSketch]] keeps the plan Expand-free —
    * a fixed 2^bits bitmap per column crosses the shuffle instead of
    * the values. Exact stays available as the verification companion.
    */
  def profile(df: DataFrame, approxDistinct: Boolean = false,
              sketchBits: Int = 16): DataFrame = {
    val total = count(lit(1)).as("__total")
    val perCol = df.columns.flatMap { c =>
      val nd =
        if (approxDistinct)
          graft.functions.SketchFunctions.approxDistinct(col(c), sketchBits)
        else count_distinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        nd.as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val agged = df.agg(total, perCol.toSeq: _*)
    val rows = df.columns.map { c =>
      struct(lit(c).as("column"), col("__total").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    agged.select(explode(array(rows.toSeq: _*)).as("p")).select("p.*")
  }
}
