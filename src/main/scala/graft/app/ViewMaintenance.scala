package graft.app

import graft.model._
import graft.operators.{JoinView, Load}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Runner for the `maintainView` action — the CLI face of the
  * incremental view-maintenance library ([[graft.operators.JoinView]],
  * [[graft.operators.IncrementalAgg]]), the reference's
  * config-in/JSON-status-out idiom (RedshiftApplication.php:47-55)
  * applied to materialized-view upkeep.
  *
  * One invocation = one delta batch folded into persisted state.
  * Exactly-once per `batchId` under at-least-once invocation:
  *
  *  - rollup: delegates to the streaming sink's own bucketed fold
  *    ([[graft.streaming.EventStreams.applyRollupBatchBucketed]]) —
  *    per-bucket staging + `_APPLIED_<batchId>` markers + swap, the
  *    crash-replay machinery its spec pins, O(touched buckets) work.
  *  - join: delegates to [[JoinView.foldBatchDirs]] — the
  *    batch-granular staging + marker protocol around the JoinView
  *    delta algebra (layout documented there; shared with the
  *    `streamingJoinView` sink).
  *
  * Config-level resolution (paths relative to the job data dir,
  * CSV/parquet dispatch, optional per-side CDC netting) lives here;
  * the fold protocols live with their operators.
  */
object ViewMaintenance {

  final case class Report(kind: String, applied: Boolean,
                          /** join/rollup: the folded batch id. */
                          batchId: Option[Long] = None,
                          /** rollup: buckets swapped this call. */
                          buckets: Option[Int] = None,
                          /** compact/export: rows carried/written. */
                          rows: Option[Long] = None,
                          /** export: the dataset written. */
                          output: Option[String] = None)

  def run(spark: SparkSession, cfg: ViewConfig, dataDir: String): Report =
    cfg match {
      case r: RollupViewConfig =>
        val delta = readDelta(spark, r.delta, dataDir)
        val swapped = graft.streaming.EventStreams.applyRollupBatchBucketed(
          delta, resolve(r.statePath, dataDir), r.batchId, r.keys,
          r.valueColumn, r.nBuckets)
        Report(r.kind, applied = swapped.nonEmpty, Some(r.batchId),
          buckets = Some(swapped.size))
      case j: JoinViewConfig =>
        val applied = JoinView.foldBatchDirs(
          resolve(j.statePath, dataDir), j.batchId, j.key,
          readDelta(spark, j.deltaA, dataDir),
          readDelta(spark, j.deltaB, dataDir), j.nBuckets)
        Report(j.kind, applied, Some(j.batchId))
      case cr: CdcRollupViewConfig =>
        val applied = graft.operators.CdcRollup.foldBatch(
          resolve(cr.statePath, dataDir), cr.batchId,
          readDelta(spark, cr.delta, dataDir), cr.keyColumns,
          cr.seqColumn, cr.opColumn, cr.keys, cr.valueColumn,
          cr.nBaseBuckets, cr.nAggBuckets)
        Report(cr.kind, applied, Some(cr.batchId))
      case e: ExportViewConfig =>
        val root = resolve(e.statePath, dataDir)
        val out = resolve(e.output, dataDir)
        val rootPath = new org.apache.hadoop.fs.Path(root)
        val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
        val pin = graft.sources.PartitionedStore.readPin(fs, rootPath)
          .getOrElse(throw new UserException(
            s"maintainView export: no layout pin under $root — not a " +
              "view state"))
        val df =
          if (pin.startsWith("join|"))
            JoinView.readCommittedView(spark, root)
              .getOrElse(throw new UserException(
                s"maintainView export: no committed state under $root"))
          else if (pin.startsWith("cdcRollup|")) {
            val read = if (e.layer == "base") graft.operators.CdcRollup
              .readBase(spark, root)
            else graft.operators.CdcRollup.readView(spark, root)
            read.getOrElse(throw new UserException(
              s"maintainView export: no committed state under $root"))
          } else {
            // rollup pin: nBuckets|keys|valueCol — export the
            // FINALIZED aggregates, the monoid state is an
            // implementation detail
            val parts = pin.split('|')
            if (parts.length != 3) throw new UserException(
              s"maintainView export: unrecognized layout pin '$pin'")
            val keys = parts(1).split(',').toSeq
              .map(java.net.URLDecoder.decode(_, "UTF-8"))
            val statePq = new org.apache.hadoop.fs.Path(root, "state")
            if (!fs.exists(statePq)) throw new UserException(
              s"maintainView export: no committed state under $root")
            graft.operators.IncrementalAgg.finalizeState(
              spark.read.parquet(statePq.toString).drop("bucket"), keys)
          }
        df.write.mode("overwrite").parquet(out)
        val n = spark.read.schema(df.schema).parquet(out).count()
        Report(e.kind, applied = true, rows = Some(n), output = Some(out))
      case c: CompactViewConfig =>
        // kind auto-detected from the state's own layout pin — one
        // config shape for both view families; a path that is not a
        // pinned view state refuses loud (no pin, no guess)
        val root = resolve(c.statePath, dataDir)
        val fresh = resolve(c.freshPath, dataDir)
        val rootPath = new org.apache.hadoop.fs.Path(root)
        val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
        val pin = graft.sources.PartitionedStore.readPin(fs, rootPath)
          .getOrElse(throw new UserException(
            s"maintainView compact: no layout pin under $root — not a " +
              "view state"))
        val rows =
          if (pin.startsWith("join|"))
            JoinView.compactStateTo(spark, root, fresh,
              c.nBuckets.getOrElse(pin.split('|').last.toIntOption
                .getOrElse(64)))
          else if (pin.startsWith("cdcRollup|")) {
            // nBuckets (when given) re-shards BOTH layers; absent, the
            // source counts carry over
            val parts = pin.split('|')
            graft.operators.CdcRollup.compactStateTo(spark, root, fresh,
              c.nBuckets.orElse(parts(5).toIntOption).getOrElse(64),
              c.nBuckets.orElse(parts(6).toIntOption).getOrElse(16))
          } else
            graft.streaming.EventStreams.compactRollupStateTo(
              spark, root, fresh, c.nBuckets)
        Report(c.kind, applied = true, rows = Some(rows))
    }

  /** The maintained join view as a DataFrame — committed batches only
    * ([[JoinView.readCommittedView]]); an empty state is a user-facing
    * error here (exit 1), not a silent empty frame. */
  def readJoinView(spark: SparkSession, statePath: String,
                   dataDir: String): DataFrame = {
    val root = resolve(statePath, dataDir)
    JoinView.readCommittedView(spark, root).getOrElse(
      throw new UserException(s"maintainView: no committed state under $root"))
  }

  private def readDelta(spark: SparkSession, d: DeltaInput,
                        dataDir: String): DataFrame = {
    val path = resolve(d.input, dataDir)
    val raw = d.format match {
      case "csv" =>
        // CSV deltas fold with DECLARED types, never inferred or
        // all-string (SURVEY §1): an untyped delta would feed
        // lexicographic min/max into the rollup monoid and
        // type-drifted xxhash64 keys into the join-view bucket
        // layout. The parser enforces items[] for csv; this guard
        // covers programmatic construction too.
        if (d.items.isEmpty) throw new UserException(
          s"View delta '${d.input}': format 'csv' requires declared " +
            "items[] — CSV is untyped and the engine never infers")
        val tc = TableConfig(tableId = d.input, dbName = d.input,
          items = d.items)
        // strict ingest: a value that fails its declared cast aborts
        // the fold with "Column 'x', line N: …" — a maintained view
        // has no quarantine sink, so bad data must never fold silently
        graft.sources.CsvIngest.castAndProjectStrict(
          graft.sources.CsvIngest.read(spark, path, tc), tc)
      case _ => spark.read.parquet(path)
    }
    d.cdc match {
      case Some(c) =>
        c.keyColumns.foreach { k =>
          if (!raw.columns.contains(k)) throw new UserException(
            s"cdc.keyColumns: '$k' not in ${d.input}")
        }
        Load.cdcNetEffect(raw, c.keyColumns, c.seqColumn, c.opColumn)
      case None => raw
    }
  }

  private def resolve(path: String, dataDir: String): String =
    if (path.startsWith("/") || path.contains("://")) path
    else s"$dataDir/$path"
}
