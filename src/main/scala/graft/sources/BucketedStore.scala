package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed catalog tables: pre-partition fact tables by their join/
  * merge key so repeated equi-joins (the nightly incremental merge, a
  * fact⋈fact join) read co-located buckets and skip the shuffle
  * entirely.
  *
  * At 100 TB the incremental-merge target is the table you least want
  * to reshuffle every run: bucketing it by PK makes `target ▷ stage`
  * shuffle only the (small) stage side — the plan spec asserts the
  * target side joins with zero exchanges.
  */
object BucketedStore {

  /** Write `df` as a bucketed+sorted catalog table (sorted buckets also
    * enable shuffle-AND-sort-free sort-merge joins). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Append a batch into an existing bucketed table under the SAME
    * bucket spec — the incremental-index ingest path: new rows land in
    * their key's bucket, so probes stay shuffle-free after every
    * append (no rebucketing of the accumulated table). Spark validates
    * the spec against the catalog; a drifted spec fails loudly. */
  def appendBucketed(df: DataFrame, table: String, keys: Seq[String],
                     buckets: Int): Unit =
    df.write.mode(SaveMode.Append)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
