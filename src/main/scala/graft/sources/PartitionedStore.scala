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
    val exists = hasDataEntries(fs, target)
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

  /** A target dir with no DATA entries reads as absent: a crash
    * between mkdirs and the first partition rename — or a bootstrap
    * write of zero rows (_SUCCESS only) — would otherwise wedge every
    * later merge on "unable to infer parquet schema". Short-circuits
    * on the first data entry; marker files (_SUCCESS, .crc,
    * _temporary) don't count. */
  private def hasDataEntries(fs: org.apache.hadoop.fs.FileSystem,
                             target: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(target) && {
      val it = fs.listStatusIterator(target)
      var found = false
      while (!found && it.hasNext) {
        val n = it.next().getPath.getName
        found = !n.startsWith("_") && !n.startsWith(".")
      }
      found
    }

  /** Partition-scoped TYPE-2 SCD merge — [[graft.operators.Load.scd2Merge]]
    * at the 100 TB dimension scale: the table lives hash-bucketed on
    * the business key (`p_bucket = pmod(xxhash64(pk), nBuckets)`
    * directory partitions) and each batch REWRITES ONLY the buckets
    * its keys hash into — O(touched buckets) per batch, never
    * O(|target|). The target slice read is partition-pruned to the
    * touched buckets; a key's entire version history co-locates in
    * one bucket (the hash depends only on the key), so the pruned
    * slice always holds every row the merge may close or pass through.
    *
    * The bucket function is PINNED at bootstrap (`_CONFIG`:
    * nBuckets + key columns, like the bucketed rollup's layout pin):
    * a later call with different parameters would scatter keys across
    * buckets and silently split their histories — it fails loud
    * instead. Re-shard by merging into a new path.
    *
    * Batch semantics match [[graft.streaming.EventStreams.streamingScd2]]
    * exactly (it is the intended `foreachBatch` body at scale): one
    * effective date per batch = MAX(`effCol`) over the raw batch
    * (dropped from tracked attributes), intra-batch duplicate keys
    * last-wins by `orderCols` (default `effCol`) with a full-row-hash
    * tiebreaker so checkpoint replays keep the same row, late batches
    * (effective date behind the touched slice's newest `validFrom`)
    * refused loudly, empty/all-NULL batches a no-op. Replay safety is
    * the same two-layer story as [[mergeByDay]]: the `_APPLIED`
    * marker licenses crashed-swap recovery, and scd2Merge's
    * idempotence makes re-merging over a recovered copy safe.
    *
    * Returns the touched bucket ids (≤ nBuckets, driver-safe). */
  def scd2MergeBucketed(batch: DataFrame, path: String, pk: Seq[String],
                        effCol: String, nBuckets: Int,
                        orderCols: Seq[String] = Nil,
                        targetFileRows: Long = 5000000L,
                        batchId: Option[Long] = None,
                        validFrom: String = "valid_from",
                        validTo: String = "valid_to",
                        isCurrent: String = "is_current"): Seq[Int] = {
    import graft.operators.Load
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    require(pk.nonEmpty, "bucketed SCD2 merge needs a business key")
    require(nBuckets >= 1, s"nBuckets must be positive: $nBuckets")
    // same wiring contract as streamingScd2 (lowercase, like Spark's
    // resolution), plus the layout column
    val batchLc = batch.columns.map(_.toLowerCase).toSet
    val reserved = Set(validFrom, validTo, isCurrent).map(_.toLowerCase) ++
      Set("p_bucket", "__c_ex", "__s_ex", "__scd2_tb")
    require(!batchLc.exists(reserved),
      "batch columns collide with SCD/layout/reserved names: " +
        (batchLc & reserved).mkString(", "))
    require(batchLc(effCol.toLowerCase),
      s"effective-date column '$effCol' missing from the batch")
    require(pk.forall(k => batchLc(k.toLowerCase)),
      s"business-key column(s) missing from the batch: " +
        pk.filterNot(k => batchLc(k.toLowerCase)).mkString(", "))
    require(!pk.exists(_.equalsIgnoreCase(effCol)),
      s"'$effCol' is a business-key column — the effective date is " +
        "dropped from the merged attributes and cannot double as a key")

    val target = new Path(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())

    // layout pin: nBuckets + key columns (URL-encoded components, same
    // rationale as the bucketed rollup's _CONFIG)
    locally {
      val configFile = new Path(target, "_CONFIG")
      def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
      val config = s"scd2|$nBuckets|${pk.map(enc).mkString(",")}"
      if (fs.exists(configFile)) {
        val in = fs.open(configFile)
        val stored =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        if (stored != config)
          throw new graft.model.UserException(
            s"SCD2 table at $path was bucketed with layout [$stored] " +
              s"but this merge uses [$config] — a partial rewrite under " +
              "a different bucket function would split key histories " +
              "across buckets. Merge into a new path to re-shard")
      } else {
        fs.mkdirs(target)
        val out = fs.create(configFile, true)
        try out.write(config.getBytes("UTF-8")) finally out.close()
      }
    }

    val b = batch
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val aggFrame = b.agg(max(col(effCol)))
      val effRow = aggFrame.head()
      if (effRow.isNullAt(0)) return Nil // empty/all-null batch
      val effType = aggFrame.schema.head.dataType
      val eff = lit(effRow.get(0)).cast(effType)
      val ord = if (orderCols.nonEmpty) orderCols else Seq(effCol)
      val deduped = Load.dedupLastWins(
          b.withColumn("__scd2_tb", xxhash64(b.columns.map(col): _*)),
          pk, ord :+ "__scd2_tb")
        .drop("__scd2_tb")
      val staged = deduped.drop(effCol)
        .withColumn("p_bucket",
          pmod(xxhash64(pk.map(col): _*), lit(nBuckets.toLong)).cast("int"))
      val buckets = staged.select("p_bucket").distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      if (buckets.isEmpty) return Nil

      // stranded-stage audit, same discriminators as mergeByDay:
      // _FRESH = crashed first write (replay recomputes), _APPLIED =
      // this batch's own crashed swap (rename in, idempotent re-merge),
      // unmarked = merged history only the operator may rename in
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
        val lost = buckets.filter { k =>
          !fs.exists(new Path(target, s"p_bucket=$k")) &&
            stranded.exists(sp => fs.exists(new Path(sp, s"p_bucket=$k")) &&
              !fs.exists(new Path(sp, s"_FRESH_$k")))
        }.filterNot { k =>
          batchId.exists(id =>
            graft.app.SwapGuard.recoverChild(fs, stranded, s"p_bucket=$k",
              sp => new Path(sp, s"_APPLIED_$id"), target))
        }
        if (lost.nonEmpty)
          throw new graft.model.UserException(
            s"buckets [${lost.mkString(",")}] of '$path' exist only in " +
              s"stranded stage dirs (${stranded.mkString(", ")}) — a " +
              "crashed swap. Rename the staged buckets in (see " +
              "Maintenance.recoverableStages) before merging; merging " +
              "now would silently replace their history with this batch")
      }

      val merged =
        if (hasDataEntries(fs, target)) {
          // partition-pruned slice: only the touched buckets scan.
          // p_bucket rides both sides of the merge as a (constant-per-
          // key) tracked attribute — it can never read as a change.
          val slice = spark.read.parquet(path)
            .filter(col("p_bucket").isin(buckets.map(k => lit(k)): _*))
          val maxVf = slice.filter(col(isCurrent))
            .agg(max(col(validFrom))).head()
          if (!maxVf.isNullAt(0) &&
              effRow.get(0).asInstanceOf[Comparable[Any]]
                .compareTo(maxVf.get(0)) < 0)
            throw new graft.model.UserException(
              s"late batch: effective date ${effRow.get(0)} precedes the " +
                s"touched slice's newest $validFrom ${maxVf.get(0)} — " +
                "merging would create negative validity intervals " +
                "(silent history corruption). Rebuild the affected " +
                "range instead")
          Load.scd2Merge(slice, staged, pk, eff,
            validFrom, validTo, isCurrent)
        } else staged
          .withColumn(validFrom, eff)
          .withColumn(validTo, lit(null).cast(effType))
          .withColumn(isCurrent, lit(true))

      val stage = new Path(
        s"${path}__stage_${java.util.UUID.randomUUID().toString.take(8)}")
      fs.mkdirs(stage)
      buckets.filterNot(k => fs.exists(new Path(target, s"p_bucket=$k")))
        .foreach(k => fs.create(new Path(stage, s"_FRESH_$k"), true).close())
      merged.write.mode("append")
        .option("maxRecordsPerFile", targetFileRows)
        .partitionBy("p_bucket").parquet(stage.toString)
      batchId.foreach(id =>
        fs.create(new Path(stage, s"_APPLIED_$id"), true).close())
      graft.app.SwapGuard(s"bucket swap failed for '$path' after " +
          s"retries (staged buckets preserved at $stage)") {
        graft.app.SwapGuard.swapChildren(fs, stage, target,
          buckets.map(k => s"p_bucket=$k"))
      }
      buckets
    } finally b.unpersist()
  }
}
