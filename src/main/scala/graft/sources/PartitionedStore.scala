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

  /** Partition-scoped stage-wins PK merge: upsert `batch` into the
    * day-partitioned table at `path`, REWRITING ONLY the `p_date`
    * partitions the batch touches. The scale-safe shape for continuous
    * ingest — a micro-batch against a 100 TB table costs
    * O(touched partitions), not O(|target|): the target slice read is
    * partition-pruned to the batch's dates, the merge writes to a
    * staging dir, and only the touched partition DIRECTORIES swap in.
    * Untouched partitions' files are never read, written, or moved.
    *
    * CONTRACT: a PK's `tsCol` date must be stable across arrivals
    * (event-time immutability — re-deliveries of event X carry X's
    * original timestamp). A PK that "moved" dates would leave its old
    * copy in the unread partition, the same constraint every
    * partition-path-keyed merge (e.g. Hudi/Delta with a date partition
    * key and merge predicates) operates under.
    *
    * Crash recovery: per-partition swaps are idempotent under the
    * in-process retry, and a driver death between a partition's delete
    * and its rename leaves the staged copy as the only one — which is
    * why [[graft.operators.Maintenance.cleanOrphanStages]] refuses to
    * delete a stage holding partitions the target lacks and
    * `recoverableStages` reports it for rename-in. Replaying the
    * micro-batch (streaming checkpoint) AFTER renaming the staged
    * partition in restores the exact merge result.
    *
    * Returns the touched partition dates (micro-batch-sized driver
    * list — partition NAMES, never data). Duplicate PKs within the
    * batch resolve last-wins by `orderCols` when provided, like
    * [[graft.operators.Load.dedupLastWins]].
    */
  def mergeByDay(batch: DataFrame, path: String, tsCol: String,
                 pk: Seq[String], orderCols: Seq[String] = Nil,
                 targetFileRows: Long = 5000000L,
                 batchId: Option[Long] = None): Seq[String] = {
    import graft.operators.Load
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    val deduped =
      if (pk.nonEmpty && orderCols.nonEmpty)
        Load.dedupLastWins(batch, pk, orderCols)
      else batch
    val withDate = deduped.withColumn("p_date", to_date(col(tsCol)))
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    // the batch's distinct dates: partition names only, bounded by the
    // batch's span — safe to collect. Rendered with date_format (the
    // exact partition-directory spelling); java.sql.Date#toString would
    // re-interpret through the JVM-local timezone and can shift a day.
    val dateRows = withDate
      .select(date_format(col("p_date"), "yyyy-MM-dd").as("d"))
      .distinct().collect().map(r => Option(r.getString(0))).toSeq
    if (dateRows.contains(None))
      throw new IllegalArgumentException(
        s"mergeByDay: '$tsCol' contains NULLs — null-dated rows would " +
          "land in the default partition and never swap in")
    val dates = dateRows.flatten.sorted
    if (dates.isEmpty) return Nil
    // Stranded-stage audit (same class as the rollup's guard): a crash
    // between a partition's delete and rename leaves the staged copy
    // as the ONLY copy of that partition — re-merging as if the
    // partition never existed would silently replace its history with
    // this batch. Discriminator: stages mark partitions that did NOT
    // exist in the target when the stage was built (`_FRESH_<d>`) —
    // a stranded FRESH partition is a crashed first write whose replay
    // recomputes it (self-healing, cleanOrphanStages reaps the stage
    // once the target partition lands); an UNMARKED stranded partition
    // held merged history and must be renamed in by the operator (see
    // Maintenance.recoverableStages). Exact `__stage_[0-9a-f]{8}`
    // shape, like Maintenance: a user's `t__stage_backup` dir must not
    // trip the audit. Single writer per path (the streaming
    // checkpoint's contract), so any stage found at ENTRY is from a
    // crashed run, not a concurrent one.
    locally {
      val parent = target.getParent
      val shape = (java.util.regex.Pattern.quote(target.getName) +
        "__stage_[0-9a-f]{8}").r
      val stranded =
        if (parent == null || !fs.exists(parent)) Nil
        else fs.listStatus(parent).toSeq
          .filter(st => st.isDirectory &&
            shape.matches(st.getPath.getName))
          .map(_.getPath)
      val lost = dates.filter { d =>
        !fs.exists(new Path(target, s"p_date=$d")) &&
          stranded.exists(sp => fs.exists(new Path(sp, s"p_date=$d")) &&
            !fs.exists(new Path(sp, s"_FRESH_$d")))
      }.filterNot { d =>
        // a stage carrying THIS batch's completion marker is the
        // replaying batch's own finished merge whose swap crashed:
        // rename the partition in (the subsequent upsert is
        // idempotent, so re-merging over the recovered copy is safe)
        batchId.exists(id =>
          graft.app.SwapGuard.recoverChild(fs, stranded, s"p_date=$d",
            sp => new Path(sp, s"_APPLIED_$id"), target))
      }
      if (lost.nonEmpty)
        throw new graft.model.UserException(
          s"partitions [${lost.mkString(",")}] of '$path' exist only " +
            s"in stranded stage dirs (${stranded.mkString(", ")}) — a " +
            "crashed swap. Rename the staged partitions in (see " +
            "Maintenance.recoverableStages) before merging; merging " +
            "now would silently replace their history with this batch")
    }
    // a target dir with no DATA entries reads as absent: a crash
    // between mkdirs and the first partition rename — or a bootstrap
    // write of zero rows (_SUCCESS only) — would otherwise wedge every
    // later merge on "unable to infer parquet schema". Short-circuits
    // on the first data entry; marker files (_SUCCESS, .crc,
    // _temporary) don't count.
    val exists = fs.exists(target) && {
      val it = fs.listStatusIterator(target)
      var found = false
      while (!found && it.hasNext) {
        val n = it.next().getPath.getName
        found = !n.startsWith("_") && !n.startsWith(".")
      }
      found
    }
    val merged =
      if (exists) {
        // partition-pruned target slice: only the touched dates scan
        val slice = spark.read.parquet(path)
          .filter(col("p_date").isin(dates.map(lit(_).cast("date")): _*))
        Load.upsert(slice, withDate, pk)
      } else withDate
    val stage = new Path(
      s"${path}__stage_${java.util.UUID.randomUUID().toString.take(8)}")
    // _FRESH markers go in BEFORE the (long) data write: they state a
    // fact about the TARGET ("this partition never existed"), so a
    // crash mid-write leaves a marked stage the replay recomputes
    // instead of an unmarked one that wedges the audit. The data write
    // appends into the pre-marked dir (unique name — append ≡ fresh).
    fs.mkdirs(stage)
    dates.filterNot(d => fs.exists(new Path(target, s"p_date=$d")))
      .foreach(d => fs.create(new Path(stage, s"_FRESH_$d"), true).close())
    merged.write.mode("append")
      .option("maxRecordsPerFile", targetFileRows)
      .partitionBy("p_date").parquet(stage.toString)
    // the completion marker goes in AFTER the data write (it licenses
    // the replay's rename-in recovery, so it must assert a COMPLETE
    // stage)
    batchId.foreach(id =>
      fs.create(new Path(stage, s"_APPLIED_$id"), true).close())
    // swap ONLY the touched partition directories; idempotent per
    // partition across ambiguous failures (shared SwapGuard rules:
    // a prior attempt's landed rename reads as success)
    graft.app.SwapGuard(s"partition swap failed for '$path' after " +
        s"retries (staged partitions preserved at $stage)") {
      graft.app.SwapGuard.swapChildren(fs, stage, target,
        dates.map(d => s"p_date=$d"))
    }
    dates
  }
}
