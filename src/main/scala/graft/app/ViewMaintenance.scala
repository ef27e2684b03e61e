package graft.app

import graft.model._
import graft.operators.{JoinView, Load}
import org.apache.hadoop.fs.Path
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
  *  - join: batch-granular staging + marker protocol (below) around
  *    the [[JoinView]] delta algebra — each fold joins delta-sized
  *    frames against the retained snapshots and APPENDS; history is
  *    read per fold but never re-joined against itself.
  *
  * Join-state layout under `statePath`:
  * {{{
  *   _CONFIG              layout pin: kind|key|colsA|colsB — a config
  *                        or schema change fails LOUD, never silently
  *                        corrupts a half-written state
  *   _APPLIED_<id>        batch <id> fully committed (created LAST)
  *   a/d<id>/  b/d<id>/  view/d<id>/   per-batch parquet appends
  * }}}
  *
  * Crash protocol: deltas stage as `a/.staging<id>` etc. — the dot
  * prefix keeps Spark's listing from ever reading them — then rename
  * to `d<id>`, and the `_APPLIED_<id>` marker commits the batch as
  * its LAST step. A replay that finds no marker deletes every
  * `d<id>`/staging dir of ITS batch id (rename-window garbage) and
  * redoes the fold; a replay that finds the marker is a no-op. So the
  * visible state is always a prefix of committed batches plus,
  * transiently, rename-window dirs owned by exactly one in-flight
  * batch id — single-writer per view, the same discipline as the
  * rollup sink.
  *
  * 100 TB shape: per fold, the snapshot sides are scanned once
  * (predicate/column pruning applies — they are plain parquet) and
  * shuffled once each into the join; the delta sides are delta-sized.
  * Nothing rewrites history: per-batch dirs make appends O(delta) and
  * let a retention job drop whole batch dirs.
  */
object ViewMaintenance {

  final case class Report(kind: String, batchId: Long, applied: Boolean,
                          /** rollup: buckets swapped this call. */
                          buckets: Option[Int])

  def run(spark: SparkSession, cfg: ViewConfig, dataDir: String): Report =
    cfg match {
      case r: RollupViewConfig =>
        val delta = readDelta(spark, r.delta, dataDir)
        val swapped = graft.streaming.EventStreams.applyRollupBatchBucketed(
          delta, resolve(r.statePath, dataDir), r.batchId, r.keys,
          r.valueColumn, r.nBuckets)
        Report(r.kind, r.batchId, applied = swapped.nonEmpty,
          buckets = Some(swapped.size))
      case j: JoinViewConfig =>
        val applied = foldJoinBatch(spark, resolve(j.statePath, dataDir),
          j.batchId, j.key,
          readDelta(spark, j.deltaA, dataDir),
          readDelta(spark, j.deltaB, dataDir))
        Report(j.kind, j.batchId, applied, buckets = None)
    }

  /** The maintained join view as a DataFrame — committed batches only
    * (an in-flight writer's rename-window dirs are excluded because
    * reads list `d<id>` dirs against the `_APPLIED_<id>` markers). */
  def readJoinView(spark: SparkSession, statePath: String,
                   dataDir: String): DataFrame = {
    val root = resolve(statePath, dataDir)
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    committedDirs(fs, new Path(root), "view") match {
      case Seq() => throw new UserException(
        s"maintainView: no committed state under $root")
      case dirs => spark.read.parquet(dirs.map(_.toString): _*)
    }
  }

  // ---- join fold ----------------------------------------------------

  private def foldJoinBatch(spark: SparkSession, root: String,
                            batchId: Long, key: String,
                            deltaA: DataFrame, deltaB: DataFrame): Boolean = {
    JoinView.checkKeys(deltaA, deltaB, key)
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new Path(rootPath, s"_APPLIED_$batchId")))
      return false // replay of a committed batch: exactly-once no-op
    // layout + schema pin: key and both column sets ride the pin, so a
    // renamed column or re-keyed config refuses instead of writing a
    // state no later read can reconcile
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    def cols(df: DataFrame) = df.columns.sorted.map(enc).mkString(",")
    graft.sources.PartitionedStore.pinLayout(fs, rootPath, root,
      s"join|${enc(key)}|${cols(deltaA)}|${cols(deltaB)}")
    // reap THIS batch's rename-window garbage from a prior crash —
    // no marker means none of its dirs are part of the state yet
    for (side <- Seq("a", "b", "view"); name <- Seq(s"d$batchId", s".staging$batchId"))
      fs.delete(new Path(rootPath, s"$side/$name"), true)
    def snapshot(side: String, like: DataFrame): DataFrame =
      committedDirs(fs, rootPath, side) match {
        case Seq() => like.limit(0)
        case dirs  => spark.read.parquet(dirs.map(_.toString): _*)
      }
    val a = snapshot("a", deltaA)
    val b = snapshot("b", deltaB)
    // each delta feeds a join AND its own append (and may carry a CDC
    // netting window) — cache the small side, never the history
    val da = deltaA.persist(); val db = deltaB.persist()
    try {
      // ΔV = ΔA ⋈ (B ∪ ΔB)  ∪  A ⋈ ΔB  (Griffin–Libkin insert algebra,
      // same coverage argument as JoinView.applyDelta)
      val dv = da.join(b.unionByName(db), key)
        .unionByName(a.join(db, key))
      // stage (hidden), rename, then commit with the marker LAST
      def stage(side: String, df: DataFrame): Unit =
        df.write.mode("overwrite")
          .parquet(new Path(rootPath, s"$side/.staging$batchId").toString)
      stage("view", dv); stage("a", da); stage("b", db)
    } finally { da.unpersist(); db.unpersist() }
    for (side <- Seq("view", "a", "b")) {
      val from = new Path(rootPath, s"$side/.staging$batchId")
      val to = new Path(rootPath, s"$side/d$batchId")
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"maintainView: rename failed: $to")
    }
    fs.create(new Path(rootPath, s"_APPLIED_$batchId"), true).close()
    true
  }

  /** `d<id>` dirs of `side` whose batch marker exists — the committed
    * prefix of the state, immune to rename-window garbage. */
  private def committedDirs(fs: org.apache.hadoop.fs.FileSystem,
                            root: Path, side: String): Seq[Path] = {
    val dir = new Path(root, side)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("d") &&
          p.getName.drop(1).forall(_.isDigit) && p.getName.length > 1 &&
          fs.exists(new Path(root, s"_APPLIED_${p.getName.drop(1)}"))
      }
      .sortBy(_.getName)
  }

  // ---- shared -------------------------------------------------------

  private def readDelta(spark: SparkSession, d: DeltaInput,
                        dataDir: String): DataFrame = {
    val path = resolve(d.input, dataDir)
    val raw = d.format match {
      case "csv" => spark.read.option("header", "true").csv(path)
      case _     => spark.read.parquet(path)
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
