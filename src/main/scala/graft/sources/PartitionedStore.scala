package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet layout for the event/document fact tables —
  * the physical design that makes 100 TB scans affordable: a
  * time-range predicate prunes whole partition directories before any
  * I/O (visible as `PartitionFilters` in the scan node), and each
  * partition's files parallelize independently.
  */
object PartitionedStore {

  /** Write `df` partitioned by the DATE of `tsCol` (directory column
    * `p_date`). `targetFileRows` caps rows per output file via
    * `maxRecordsPerFile` so a hot day splits into parallel files
    * instead of one giant one. */
  def writeByDay(df: DataFrame, tsCol: String, path: String,
                 targetFileRows: Long = 5000000L): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetFileRows)
      .partitionBy("p_date")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
