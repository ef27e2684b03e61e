package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental GROUP-BY view over a CDC feed with CROSS-BATCH updates
  * and deletes — the retraction-capable sibling of [[IncrementalAgg]]'s
  * insert-only rollup and the missing corner of the view-maintenance
  * family: the insert-only kinds net a CDC log WITHIN a batch
  * ([[Load.cdcNetEffect]]) but a later batch that updates or deletes a
  * row folded earlier cannot be expressed there at all.
  *
  * Two persisted layers under one root, committed by ONE batch marker:
  *
  *  - `base/` — the SCD1 current-image table keyed by `pkCols`,
  *    hash-bucketed on the PK. Per fold, only the delta's TOUCHED
  *    buckets are read (they hold the old images retraction needs —
  *    no extra lookup pass) and rewritten.
  *  - `agg/` — per-group `(n, total)` state, hash-bucketed on the
  *    group key. count/sum are INVERTIBLE, so retraction is exact
  *    arithmetic: an update contributes (−1, −old) at the old group
  *    and (+1, +new) at the new group (group-moving updates included),
  *    a delete just the minus. min/max are deliberately NOT here —
  *    they are not invertible (retracting the current min forces a
  *    group re-scan); use the insert-only rollup for monotone feeds.
  *    `total` accumulates as decimal(38,6): exact, order-independent,
  *    and invertible — a double sum under retraction drifts
  *    ((a+b)−b ≠ a in floating point).
  *
  * Exactly-once via COPY-ON-WRITE versioned buckets: a fold never
  * mutates a committed file — it writes `bucket=<k>/v<batchId>` dirs
  * (staged hidden, renamed in), then creates `_APPLIED_<batchId>`
  * LAST. Readers resolve each bucket to its highest COMMITTED version,
  * so a crash at any point leaves only invisible garbage that the
  * batch's replay reaps; an in-place merge would re-apply the delta on
  * replay (merge is not idempotent) — versioning is what makes
  * at-least-once invocation exactly-once here. Superseded versions are
  * reaped best-effort after the marker commits (and again by the next
  * fold that touches the bucket), so steady state holds ~1 version per
  * bucket.
  *
  * 100 TB shape: per fold — one window over the delta (netting), two
  * bucket-pruned scans (old images, old agg rows of touched buckets),
  * one delta-sized aggregation (contributions), and bucket-sized
  * rewrites of ONLY the touched buckets. History outside the touched
  * buckets is never read. The two `collect`s are ≤ nBuckets-row bucket
  * probes (the established scalar pattern). Layout + schema + types
  * ride the `_CONFIG` pin (xxhash64 bucketing is type-sensitive — a
  * drifted feed refuses instead of mis-bucketing, the join-view
  * discipline).
  *
  * Contracts: single-writer per root; deltas are I/U/D logs with a
  * total per-key `seqCol` order; a D (or U) for a key with no current
  * image contributes nothing (out-of-order feeds degrade to upsert
  * semantics, documented not hidden); `n` can therefore never go
  * negative and a group at n = 0 drops out of the view.
  */
object CdcRollup {

  private val AggCols = Seq("n", "total")

  /** Fold one CDC batch. Returns false (no-op) when `batchId` is
    * already committed. */
  def foldBatch(root: String, batchId: Long, delta: DataFrame,
                pkCols: Seq[String], seqCol: String, opCol: String,
                groupCols: Seq[String], valueCol: String,
                nBaseBuckets: Int = 64, nAggBuckets: Int = 16): Boolean = {
    import org.apache.hadoop.fs.Path
    require(pkCols.nonEmpty, "cdcRollup needs pk columns")
    require(groupCols.nonEmpty, "cdcRollup needs group columns")
    require(nBaseBuckets >= 1 && nAggBuckets >= 1,
      s"bucket counts must be >= 1, got $nBaseBuckets/$nAggBuckets")
    (pkCols ++ groupCols ++ Seq(valueCol, seqCol, opCol)).foreach { c =>
      require(delta.columns.contains(c),
        s"cdcRollup: delta lacks declared column '$c'")
    }
    require(!(groupCols :+ valueCol).exists(c => c == seqCol || c == opCol),
      "cdcRollup: seq/op columns cannot double as group/value columns")
    val reserved = Set("n", "total", "__bucket", "__dn", "__dt",
      "__cdc_delete", "__b")
    val clash = delta.columns.filterNot(c => c == seqCol || c == opCol)
      .filter(reserved)
    require(clash.isEmpty,
      s"cdcRollup: payload columns ${clash.mkString(", ")} collide with " +
        "the state/staging columns (n, total, __bucket, __dn, __dt, " +
        "__cdc_delete) — rename upstream")
    val spark = delta.sparkSession
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new Path(rootPath, s"_APPLIED_$batchId")))
      return false // exactly-once replay no-op
    // payload = the persisted base image (everything but seq/op)
    val payloadCols = delta.columns.filterNot(c => c == seqCol || c == opCol)
    // typed layout pin (see JoinView: xxhash64 is type-sensitive)
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val typed = delta.schema.filter(f => payloadCols.contains(f.name))
      .sortBy(_.name)
      .map(f => enc(f.name) + ":" + enc(f.dataType.catalogString))
      .mkString(",")
    graft.sources.PartitionedStore.pinLayout(fs, rootPath, root,
      s"cdcRollup|$typed|${pkCols.map(enc).mkString(",")}|" +
        s"${groupCols.map(enc).mkString(",")}|${enc(valueCol)}|" +
        s"$nBaseBuckets|$nAggBuckets")
    // reap THIS batch's crash garbage (staged dirs + unmarked versions)
    for (layer <- Seq("base", "agg")) {
      fs.delete(new Path(rootPath, s"$layer/.staging$batchId"), true)
      val layerDir = new Path(rootPath, layer)
      if (fs.exists(layerDir))
        fs.listStatus(layerDir).toSeq.map(_.getPath)
          .filter(_.getName.startsWith("bucket="))
          .foreach(b => fs.delete(new Path(b, s"v$batchId"), true))
    }
    val baseBucket = pmod(xxhash64(pkCols.map(col): _*), lit(nBaseBuckets))
      .cast("int")
    val aggBucket = pmod(xxhash64(groupCols.map(col): _*), lit(nAggBuckets))
      .cast("int")
    val dec = "decimal(38,6)"
    // net the batch to one final event per key, deletes kept
    val net = Load.cdcNetOps(delta, pkCols, seqCol, opCol)
      .select((payloadCols.map(col) :+ col("__cdc_delete")): _*)
      .persist()
    try {
      if (net.isEmpty) { // empty delta: commit the marker, change nothing
        fs.create(new Path(rootPath, s"_APPLIED_$batchId"), true).close()
        return true
      }
      // NULL pk components refuse LOUD: the pk joins below (semi/anti)
      // never match NULL, so a NULL-keyed image could neither be
      // updated nor deleted — every later upsert would append another
      // copy the state can never reconcile. Delta-sized probe.
      require(net.filter(pkCols.map(col(_).isNull).reduce(_ || _)).isEmpty,
        s"cdcRollup batch $batchId: NULL in a pk column — a NULL key " +
          "can never be matched for update/delete; repair the feed")
      val touchedBase = net.select(baseBucket.as("__b")).distinct()
        .collect().map(_.getInt(0)).toSet
      val upserts = net.filter(!col("__cdc_delete")).drop("__cdc_delete")
      val keys = net.select(pkCols.map(col): _*).distinct()
      // old images live ONLY in the delta's touched base buckets
      val prunedBase = readLatest(spark, fs, rootPath, "base",
        Some(touchedBase)).getOrElse(upserts.limit(0))
      val old = prunedBase.join(keys, pkCols, "left_semi").persist()
      try {
        // signed contributions: retraction at the OLD group, insertion
        // at the NEW — group-moving updates come out exactly
        val minus = old.select((groupCols.map(col) :+
          lit(-1L).as("__dn") :+
          (-col(valueCol).cast(dec)).as("__dt")): _*)
        val plus = upserts.select((groupCols.map(col) :+
          lit(1L).as("__dn") :+
          col(valueCol).cast(dec).as("__dt")): _*)
        val contrib = minus.unionByName(plus)
          .groupBy(groupCols.map(col): _*)
          .agg(sum(col("__dn")).as("__dn"),
            sum(col("__dt")).cast(dec).as("__dt"))
          .persist()
        try {
          val touchedAgg = contrib.select(aggBucket.as("__b")).distinct()
            .collect().map(_.getInt(0)).toSet
          // new base content for the touched buckets: pass-through
          // minus touched keys, plus the upsert images
          val newBase = prunedBase.join(keys, pkCols, "left_anti")
            .unionByName(upserts.select(prunedBase.columns.map(col): _*))
          // independent lineage (createDataFrame, not a slice of
          // contrib): the null-safe merge below uses dataset-qualified
          // refs, and a shared-lineage empty frame would make that a
          // self-join ambiguity
          val emptyAgg = spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            org.apache.spark.sql.types.StructType(
              groupCols.map(c => delta.schema(c)) ++ Seq(
                org.apache.spark.sql.types.StructField("n",
                  org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("total",
                  org.apache.spark.sql.types.DecimalType(38, 6)))))
          val oldAgg = readLatest(spark, fs, rootPath, "agg",
            Some(touchedAgg)).getOrElse(emptyAgg)
          // NULL-SAFE group merge: a using-columns join would never
          // match NULL group values (null != null), splitting a NULL
          // group's state row from its contribution forever — <=> is
          // the join a grouping semantics needs (GROUP BY treats NULLs
          // as one group; so must the merge)
          val mergeCond = groupCols
            .map(c => oldAgg(c) <=> contrib(c)).reduce(_ && _)
          val merged = oldAgg.join(contrib, mergeCond, "full_outer")
            .select((groupCols.map(c =>
              coalesce(oldAgg(c), contrib(c)).as(c)) :+
              (coalesce(oldAgg("n"), lit(0L)) +
                coalesce(contrib("__dn"), lit(0L))).as("n") :+
              (coalesce(oldAgg("total"), lit(0).cast(dec)) +
                coalesce(contrib("__dt"), lit(0).cast(dec))).cast(dec)
                .as("total")): _*)
            .filter(col("n") > 0) // a fully-retracted group drops out
          stageAndCommit(fs, rootPath, batchId,
            Seq(("base", newBase, baseBucket, touchedBase),
              ("agg", merged, aggBucket, touchedAgg)))
        } finally { contrib.unpersist(); () }
      } finally { old.unpersist(); () }
    } finally { net.unpersist(); () }
    true
  }

  /** The maintained view: per-group (n, total) over the CURRENT
    * images — committed state only; None before the first commit. */
  def readView(spark: SparkSession, root: String): Option[DataFrame] = {
    import org.apache.hadoop.fs.Path
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    readLatest(spark, fs, rootPath, "agg", None)
  }

  /** The maintained SCD1 base (current images) — the view's witness
    * table, useful on its own as a keyed snapshot of the CDC feed. */
  def readBase(spark: SparkSession, root: String): Option[DataFrame] = {
    import org.apache.hadoop.fs.Path
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    readLatest(spark, fs, rootPath, "base", None)
  }

  /** Compact a long-lived state into a FRESH root: the latest
    * committed version of every bucket becomes `v0` of the fresh root
    * (one scan + one write per layer, no re-aggregation) and the
    * accumulated `_APPLIED_<id>` markers collapse to `_APPLIED_0`.
    * Also the re-shard path (new bucket counts). Same contract as the
    * join/rollup siblings: fresh root empty, swap between folds,
    * continue with fresh batch ids. @return view rows carried over */
  def compactStateTo(spark: SparkSession, root: String, freshRoot: String,
                     nBaseBuckets: Int = 64, nAggBuckets: Int = 16): Long = {
    import org.apache.hadoop.fs.Path
    require(nBaseBuckets >= 1 && nAggBuckets >= 1,
      s"bucket counts must be >= 1, got $nBaseBuckets/$nAggBuckets")
    val rootPath = new Path(root)
    val freshPath = new Path(freshRoot)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val pin = graft.sources.PartitionedStore.readPin(fs, rootPath)
      .getOrElse(throw new IllegalStateException(
        s"compactStateTo: no layout pin under $root — not a cdcRollup state"))
    val parts = pin.split('|')
    require(parts.length == 7 && parts(0) == "cdcRollup",
      s"compactStateTo: unrecognized layout pin '$pin' under $root")
    require(!fs.exists(new Path(freshPath, "_CONFIG")) &&
      !fs.exists(new Path(freshPath, "_APPLIED_0")),
      s"compactStateTo: $freshRoot already holds a state — refusing " +
        "to merge into it (compact to an empty root, then swap)")
    def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
    val pkCols = parts(2).split(',').toSeq.map(dec)
    val groupCols = parts(3).split(',').toSeq.map(dec)
    graft.sources.PartitionedStore.pinLayout(fs, freshPath, freshRoot,
      s"cdcRollup|${parts(1)}|${parts(2)}|${parts(3)}|${parts(4)}|" +
        s"$nBaseBuckets|$nAggBuckets")
    val baseBucket = pmod(xxhash64(pkCols.map(col): _*), lit(nBaseBuckets))
      .cast("int")
    val aggBucket = pmod(xxhash64(groupCols.map(col): _*), lit(nAggBuckets))
      .cast("int")
    for ((layer, bucketOf) <- Seq("base" -> baseBucket, "agg" -> aggBucket))
      readLatest(spark, fs, rootPath, layer, None).foreach { df =>
        df.withColumn("__bucket", bucketOf)
          .write.mode("overwrite").partitionBy("__bucket")
          .parquet(new Path(freshPath, s"$layer/.staging0").toString)
        promoteStaged(fs, freshPath, layer, 0L)
      }
    fs.create(new Path(freshPath, "_APPLIED_0"), true).close()
    readView(spark, freshRoot).map(_.count()).getOrElse(0L)
  }

  // ---- layout plumbing ------------------------------------------------

  /** Latest COMMITTED version dir of each bucket of `layer`,
    * restricted to `buckets` when given; empty version dirs (a
    * touched bucket whose rows were all retracted) contribute
    * nothing. None when nothing committed holds data. */
  private def readLatest(spark: SparkSession,
                         fs: org.apache.hadoop.fs.FileSystem,
                         root: org.apache.hadoop.fs.Path, layer: String,
                         buckets: Option[Set[Int]]): Option[DataFrame] = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(root, layer)
    if (!fs.exists(dir)) return None
    val dirs = fs.listStatus(dir).toSeq.map(_.getPath)
      .filter { b =>
        b.getName.startsWith("bucket=") &&
          buckets.forall(bs => b.getName.stripPrefix("bucket=")
            .toIntOption.exists(bs.contains))
      }
      .flatMap { b =>
        fs.listStatus(b).toSeq.map(_.getPath)
          .filter(v => v.getName.startsWith("v") &&
            v.getName.drop(1).forall(_.isDigit) && v.getName.length > 1 &&
            fs.exists(new Path(root, s"_APPLIED_${v.getName.drop(1)}")))
          .sortBy(_.getName.drop(1).toLong).lastOption
      }
      .filter(v => graft.sources.PartitionedStore.hasDataEntries(fs, v))
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.map(_.toString): _*))
  }

  /** Stage each layer's new touched-bucket content (hidden dir,
    * partitioned by bucket), promote the children to
    * `bucket=<k>/v<batchId>`, cover retracted-to-empty buckets with an
    * empty version (the old version must stop being latest), commit
    * the marker LAST, then best-effort reap superseded versions. */
  private def stageAndCommit(fs: org.apache.hadoop.fs.FileSystem,
                             root: org.apache.hadoop.fs.Path, batchId: Long,
                             layers: Seq[(String, DataFrame,
                               org.apache.spark.sql.Column, Set[Int])])
      : Unit = {
    import org.apache.hadoop.fs.Path
    for ((layer, df, bucketOf, touched) <- layers) {
      df.withColumn("__bucket", bucketOf)
        .write.mode("overwrite").partitionBy("__bucket")
        .parquet(new Path(root, s"$layer/.staging$batchId").toString)
      val written = promoteStaged(fs, root, layer, batchId)
      // a touched bucket with no surviving rows still needs a NEW
      // latest version, else its old content would resurface
      (touched -- written).foreach { b =>
        fs.mkdirs(new Path(root, s"$layer/bucket=$b/v$batchId")); ()
      }
    }
    fs.create(new Path(root, s"_APPLIED_$batchId"), true).close()
    // GC: every older version of a bucket this batch rewrote is
    // superseded. Best-effort — a crash here leaves extra committed
    // versions that stay invisible to readers (latest wins) and get
    // reaped by the next fold touching the bucket.
    for ((layer, _, _, touched) <- layers; b <- touched) {
      val bDir = new Path(root, s"$layer/bucket=$b")
      if (fs.exists(bDir))
        fs.listStatus(bDir).toSeq.map(_.getPath)
          .filter(v => v.getName.startsWith("v") &&
            v.getName.drop(1).forall(_.isDigit) &&
            v.getName.drop(1).toLongOption.exists(_ < batchId))
          .foreach(v => fs.delete(v, true))
    }
  }

  /** Rename `.staging<id>/__bucket=<k>` children into their
    * `bucket=<k>/v<id>` homes; returns the bucket ids promoted. */
  private def promoteStaged(fs: org.apache.hadoop.fs.FileSystem,
                            root: org.apache.hadoop.fs.Path, layer: String,
                            batchId: Long): Set[Int] = {
    import org.apache.hadoop.fs.Path
    val staging = new Path(root, s"$layer/.staging$batchId")
    if (!fs.exists(staging)) return Set.empty
    val promoted = fs.listStatus(staging).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("__bucket="))
      .map { child =>
        val b = child.getName.stripPrefix("__bucket=").toInt
        val home = new Path(root, s"$layer/bucket=$b")
        fs.mkdirs(home)
        val to = new Path(home, s"v$batchId")
        if (!fs.rename(child, to))
          throw new java.io.IOException(s"cdcRollup: rename failed: $to")
        b
      }.toSet
    fs.delete(staging, true) // empty shell (or non-bucket leftovers)
    promoted
  }
}
