package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Batch-marker bookkeeping shared by the directory-persisted view
  * states ([[JoinView]], [[CdcRollup]]): one `_APPLIED_<id>` file per
  * committed batch, plus an optional `_APPLIED_UPTO_<w>` WATERMARK
  * that subsumes every id <= w.
  *
  * Why the watermark exists: per-batch markers accrete one (empty)
  * file per fold forever — a view folded every 5 minutes for a year is
  * ~100k marker files whose listing cost creeps into every fold and
  * read. Compaction collapses them but costs a full state rewrite;
  * folding the committed prefix into a single watermark file is the
  * cheap path (pure marker I/O, no data moves).
  *
  * Soundness contract — the watermark turns "id <= w" into
  * "committed", so before it is written every UNCOMMITTED artifact
  * with id <= w must be swept (else the fold would legitimize crash
  * garbage) and no id <= w may ever commit afterwards (else its fold
  * would silently no-op). Each family's `foldMarkers` owns that sweep
  * and states its monotonicity requirement; this object only owns the
  * marker files themselves.
  *
  * Crash windows: the new watermark is written BEFORE subsumed
  * markers are deleted, so readers that OR the two sources resolve
  * identically at every intermediate state.
  */
private[graft] object BatchMarkers {

  private val Upto = "_APPLIED_UPTO_"
  private val Marker = "_APPLIED_"

  /** One listing's worth of marker state. `mtimes` carries the
    * per-id marker-file modification time for age-gated folds. */
  final case class Markers(watermark: Option[Long], ids: Set[Long],
                           mtimes: Map[Long, Long]) {
    def committed(id: Long): Boolean = watermark.exists(id <= _) || ids(id)
    def maxCommitted: Option[Long] = (watermark.toSeq ++ ids).maxOption
    def count: Int = ids.size
  }

  /** ONE `listStatus` of the root — O(entries) instead of the
    * O(versions x exists-call) probing a per-file check costs. */
  def read(fs: FileSystem, root: Path): Markers = {
    if (!fs.exists(root)) return Markers(None, Set.empty, Map.empty)
    var wm = Option.empty[Long]
    val ids = Set.newBuilder[Long]
    val mtimes = Map.newBuilder[Long, Long]
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(Upto))
        n.stripPrefix(Upto).toLongOption.foreach { w =>
          if (wm.forall(_ < w)) wm = Some(w)
        }
      else if (n.startsWith(Marker))
        n.stripPrefix(Marker).toLongOption.foreach { id =>
          ids += id; mtimes += id -> st.getModificationTime
        }
    }
    Markers(wm, ids.result(), mtimes.result())
  }

  /** Commit `_APPLIED_<id>` — the per-batch marker, created LAST by
    * every fold protocol. */
  def commit(fs: FileSystem, root: Path, id: Long): Unit =
    fs.create(new Path(root, s"$Marker$id"), true).close()

  // ---- as-of floor files --------------------------------------------
  // `_ASOF_FLOOR_<f>` = the lowest batch id whose SNAPSHOT is still
  // fully servable from this root. Families differ in who writes it
  // (CdcRollup: retention mode + reap; JoinView: compaction, whose
  // collapsed d0 would otherwise serve the frontier state as ANY
  // earlier snapshot) but share the protocol: readers take the max,
  // writers create the new floor BEFORE removing the old one, so
  // every crash window errs conservative (refusing a servable
  // snapshot, never serving a broken one).

  private val Floor = "_ASOF_FLOOR_"

  /** The floor in force — None when no floor file exists. */
  def readFloor(fs: FileSystem, root: Path): Option[Long] =
    readFloorAll(fs, root).maxOption

  /** Every floor file present (crash remnants included). */
  def readFloorAll(fs: FileSystem, root: Path): Seq[Long] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(Floor))
      .flatMap(_.stripPrefix(Floor).toLongOption)

  /** Write `f` as the floor (new first), then clear lower floors. */
  def writeFloor(fs: FileSystem, root: Path, f: Long): Unit = {
    fs.create(new Path(root, s"$Floor$f"), true).close()
    readFloorAll(fs, root).filter(_ < f)
      .foreach(old => fs.delete(new Path(root, s"$Floor$old"), false))
  }

  /** Remove every floor file — the compact crash-reset path. */
  def clearFloors(fs: FileSystem, root: Path): Unit =
    readFloorAll(fs, root)
      .foreach(f => fs.delete(new Path(root, s"$Floor$f"), false))

  // The retention SEED — the floor in force when retention was
  // ENABLED, never advanced afterwards: history below it was reaped
  // eagerly by pre-retention folds for EVERY bucket, so it is the
  // hard lower bound under any floor granularity. Written once by
  // enableRetention/compact; bucket-pruned readers combine it with
  // per-bucket floors (floor files inside bucket dirs, same
  // _ASOF_FLOOR_ protocol) to serve deeper history than the global
  // (max-advanced) floor allows.

  private val Seed = "_ASOF_SEED_"

  /** The retention seed — None on states retained before seeds
    * existed (readers then fall back to the global floor). */
  def readSeed(fs: FileSystem, root: Path): Option[Long] =
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(Seed))
      .flatMap(_.stripPrefix(Seed).toLongOption).maxOption

  /** Write the seed once; an existing seed wins (it is a historical
    * fact, not a level to advance). */
  def writeSeed(fs: FileSystem, root: Path, f: Long): Unit =
    if (readSeed(fs, root).isEmpty) {
      fs.create(new Path(root, s"$Seed$f"), true).close(); ()
    }

  /** Remove every seed file — the compact crash-reset path. */
  def clearSeeds(fs: FileSystem, root: Path): Unit =
    if (fs.exists(root))
      fs.listStatus(root).toSeq.map(_.getPath.getName)
        .filter(_.startsWith(Seed))
        .foreach(n => fs.delete(new Path(root, n), false))

  // ---- change-log floor files ---------------------------------------
  // `_LOG_FROM_<f>` = change-log mode marker AND its honesty bound:
  // the fold-time CDC change log ([[CdcRollup.enableChangeLog]]) only
  // covers folds AFTER `f` (the committed frontier at enable time, or
  // the max id a log reap deleted). Same crash discipline as the
  // as-of floor: readers take the max, writers create the new bound
  // BEFORE removing the old one — every crash window errs
  // conservative (refusing a servable pull, never serving a gapped
  // one).

  private val LogFrom = "_LOG_FROM_"

  /** The change-log coverage bound — None when the state is not in
    * change-log mode. */
  def readLogFrom(fs: FileSystem, root: Path): Option[Long] =
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(LogFrom))
      .flatMap(_.stripPrefix(LogFrom).toLongOption).maxOption

  /** Write `f` as the log bound (new first), then clear lower ones. */
  def writeLogFrom(fs: FileSystem, root: Path, f: Long): Unit = {
    fs.create(new Path(root, s"$LogFrom$f"), true).close()
    if (fs.exists(root))
      fs.listStatus(root).toSeq.map(_.getPath.getName)
        .filter(_.startsWith(LogFrom))
        .flatMap(_.stripPrefix(LogFrom).toLongOption).filter(_ < f)
        .foreach(old => fs.delete(new Path(root, s"$LogFrom$old"), false))
  }

  /** Every log-bound file present (crash remnants included). */
  def readLogFromAll(fs: FileSystem, root: Path): Seq[Long] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(LogFrom))
      .flatMap(_.stripPrefix(LogFrom).toLongOption)

  /** Remove every log-bound file — the compact crash-reset path. */
  def clearLogFrom(fs: FileSystem, root: Path): Unit =
    readLogFromAll(fs, root)
      .foreach(f => fs.delete(new Path(root, s"$LogFrom$f"), false))

  /** Collapse the committed prefix <= `w` into `_APPLIED_UPTO_<w>`:
    * watermark first (readers OR the sources, so every intermediate
    * state resolves identically), then the subsumed per-id markers and
    * any older watermark go. Caller must have swept uncommitted
    * artifacts with id <= w BEFORE calling. */
  def foldInto(fs: FileSystem, root: Path, markers: Markers,
               w: Long): Unit = {
    fs.create(new Path(root, s"$Upto$w"), true).close()
    markers.ids.iterator.filter(_ <= w)
      .foreach(id => fs.delete(new Path(root, s"$Marker$id"), false))
    markers.watermark.filter(_ < w)
      .foreach(old => fs.delete(new Path(root, s"$Upto$old"), false))
  }
}
