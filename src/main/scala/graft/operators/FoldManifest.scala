package graft.operators

import org.apache.spark.sql.SparkSession

/** Cross-root FOLD MANIFEST — the group-commit witness for one delta
  * bus feeding N view roots (a join view + a cdcRollup + rollups over
  * the same feed). Each root's fold protocol is exactly-once on its
  * own, but the GROUP is not atomic: a crash between roots leaves
  * them at different frontiers with no witness, and a consumer
  * joining two views pulled at different frontiers reads a mixed
  * snapshot without knowing it.
  *
  * The manifest closes the OBSERVABILITY gap without distributed
  * transactions: after folding batch `id` into every root, the
  * orchestrator calls [[commit]], which VERIFIES each root actually
  * committed `id` (per its own family's evidence — refusing loud
  * otherwise, because a manifest that overstates is worse than none)
  * and only then writes the group's `_APPLIED_<id>` marker. Consumers
  * gate their pulls on [[frontier]] (the CLI export's `manifest` key
  * caps `sinceBatch` pulls there): every view they read reflects
  * exactly the batches the GROUP completed, even while a lagging root
  * is mid-recovery.
  *
  * Crash windows: a crash AFTER the roots commit but BEFORE the
  * manifest marker leaves the group frontier one behind — consumers
  * see slightly stale (consistent) data until the orchestrator's
  * replay re-runs the folds (each a per-root no-op) and the manifest
  * commit completes. Never a mixed read. The roots are pinned at
  * first commit (`_CONFIG`: `foldManifest|<roots>`) — a changed root
  * set refuses, because the old markers witnessed a different group.
  *
  * Batch ids are MONOTONE (the fold contract); a replay of a
  * committed id is a quiet no-op. Markers fold into the usual
  * `_APPLIED_UPTO_` watermark via [[foldMarkers]] on the gc cadence.
  */
object FoldManifest {

  private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")

  /** The pinned root set, in declaration order. */
  def roots(spark: SparkSession, manifestPath: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(manifestPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    graft.sources.PartitionedStore.readPin(fs, p) match {
      case Some(pin) if pin.startsWith("foldManifest|") =>
        pin.stripPrefix("foldManifest|").split(',').toSeq.map(dec)
      case Some(pin) => throw new IllegalStateException(
        s"foldManifest: $manifestPath carries a non-manifest pin " +
          s"'${pin.takeWhile(_ != '|')}'")
      case None => Nil
    }
  }

  /** Commit the GROUP marker for `batchId` — after verifying every
    * root's own evidence says the batch committed there (join/cdc:
    * the batch markers; rollup: the `_LAST_BATCH` frontier). Returns
    * false when the id is already group-committed (replay no-op);
    * refuses loud when a root lags (the crash-between-roots shape —
    * re-run the folds, each a no-op where already applied, then
    * retry) or when the root set drifts from the pin. */
  def commit(spark: SparkSession, manifestPath: String, batchId: Long,
             rootPaths: Seq[String]): Boolean = {
    import org.apache.hadoop.fs.Path
    require(rootPaths.nonEmpty, "foldManifest needs at least one root")
    require(rootPaths.distinct == rootPaths,
      "foldManifest: a root is listed twice")
    val p = new Path(manifestPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    graft.sources.PartitionedStore.pinLayout(fs, p, manifestPath,
      "foldManifest|" + rootPaths.map(enc).mkString(","))
    val markers = BatchMarkers.read(fs, p)
    if (markers.committed(batchId)) return false
    markers.maxCommitted.filter(batchId < _).foreach { frontier =>
      throw new IllegalArgumentException(
        s"foldManifest batch $batchId: out of order — the group " +
          s"already committed $frontier and consumers treat the " +
          "manifest frontier as monotone; feed batch ids in " +
          "increasing order")
    }
    // verify every root's OWN evidence before witnessing the group —
    // an overstating manifest would bless exactly the mixed read it
    // exists to prevent
    rootPaths.foreach { root =>
      val rp = new Path(root)
      val rfs = rp.getFileSystem(spark.sessionState.newHadoopConf())
      val pin = graft.sources.PartitionedStore.readPin(rfs, rp)
        .getOrElse(throw new IllegalStateException(
          s"foldManifest: no layout pin under root $root — fold the " +
            "batch there first"))
      val ok =
        if (pin.startsWith("join|") || pin.startsWith("cdcRollup|"))
          BatchMarkers.read(rfs, rp).committed(batchId)
        else
          // rollup family: POST-SWAP evidence, not bare _LAST_BATCH —
          // the fold advances the frontier BEFORE the bucket swap, so
          // a crash in that gap leaves the frontier at batchId with
          // the buckets still staged; witnessing on the frontier
          // alone would bless exactly the mixed read the manifest
          // exists to prevent (rollupBatchApplied checks for a
          // stranded stage still holding this id's markers)
          graft.streaming.EventStreams.rollupBatchApplied(rfs, rp, batchId)
      if (!ok) throw new IllegalStateException(
        s"foldManifest batch $batchId: root $root has NOT committed " +
          "it — the crash-between-roots shape (or, for a rollup " +
          "root, a fold that crashed between its _LAST_BATCH advance " +
          "and its bucket swap); re-run the group's folds (each a " +
          "quiet no-op where already applied — the rollup replay " +
          "recovers its staged buckets marker-first), then retry " +
          "the manifest commit. Witnessing an uncommitted root " +
          "would bless a mixed read")
    }
    BatchMarkers.commit(fs, p, batchId)
    true
  }

  /** The GROUP frontier — the highest batch id every root is known to
    * have committed; the value consumers cap their pulls at. None
    * before the first group commit. */
  def frontier(spark: SparkSession, manifestPath: String): Option[Long] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(manifestPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    BatchMarkers.read(fs, p).maxCommitted
  }

  /** Collapse aged group markers into the watermark — the
    * [[CdcRollup.foldMarkers]] discipline (age-gated so a replayed
    * frontier commit still resolves its own marker). */
  def foldMarkers(spark: SparkSession, manifestPath: String,
                  olderThanMs: Long = 24L * 3600 * 1000): Option[Long] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(manifestPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    val markers = BatchMarkers.read(fs, p)
    val cutoff = System.currentTimeMillis() - olderThanMs
    val aged = markers.ids.filter(id => markers.mtimes(id) <= cutoff)
    val w = (markers.watermark.toSeq ++ aged).maxOption
    w.filter(v => markers.watermark.forall(_ < v) ||
        markers.ids.exists(_ <= v)).map { frontier =>
      BatchMarkers.foldInto(fs, p, markers, frontier)
      frontier
    }
  }
}
