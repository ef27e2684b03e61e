package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet tables.
  *
  * `events.parquet` carries TIMESTAMP(NANOS), which Spark 4 only reads
  * as a raw long (`spark.sql.legacy.parquet.nanosAsLong=true`, set in
  * every session this engine builds — see [[graft.Sessions]]). The
  * loader normalizes it back to a microsecond TimestampType so query
  * code stays timestamp-typed; DuckDB reads the same column natively.
  */
object Tables {

  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral div: `/` would go through DOUBLE and lose precision
        // on nano-epoch longs (> 2^53), shifting some stamps by 1 µs
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
}
