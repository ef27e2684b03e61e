package graft.app

import graft.model.UserException
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The `repair` maintainView kind — the EXECUTING face of fsck's
  * runbook hints, restricted to the provably-safe subset:
  *
  *  - **rebuild a missing derived layer** (cdcRollup `grp` /
  *    `aux_<n>` / `grp_aux_<n>`): every derived layer is an exact
  *    function of the SCD1 base images
  *    ([[graft.operators.CdcRollup.rebuildDerivedLayer]]), so the
  *    reconstruction cannot invent data — and on retained states it
  *    floors the rebuilt chain at the frontier so the lost history
  *    refuses instead of serving empty.
  *  - **re-seed a rollup `_LAST_BATCH` frontier from the per-bucket
  *    marker evidence** (missing, unparseable, or older than the
  *    evidence): the fsck hint's own rule — the max `_APPLIED_<id>`
  *    across buckets; overstating is safe (skips replays),
  *    understating re-admits folded ids, so the evidence max is the
  *    only sound value.
  *  - **sweep abandoned rename-window garbage** — exactly what `gc`
  *    sweeps (staging shells, unmarked versions), at the default 24 h
  *    gate; included here so one `repair --apply` leaves a state
  *    fsck-clean.
  *
  * Everything else — pin drift, bucket dirs outside the pinned count,
  * foreign floor/seed/bound files, change-log coverage gaps — is the
  * UNSAFE class: repair never touches it (a malformed pin refuses the
  * whole run loudly — nothing can be decided without the layout), and
  * the post-repair fsck embedded in the report names what remains
  * manual.
  *
  * DRY-RUN by default: without `apply` the report lists what WOULD
  * run and mutates nothing. */
object ViewRepair {

  def repairJson(spark: SparkSession, root: String,
                 apply: Boolean): String = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val pin = graft.sources.PartitionedStore.readPin(fs, rootPath)
      .getOrElse(throw new UserException(
        s"maintainView repair: no layout pin under $root — not a " +
          "view state"))
    // (what, result) — result None on dry-run
    val repairs = Seq.newBuilder[(String, Option[String])]
    def plan(what: String)(exec: => String): Unit =
      repairs += ((what, if (apply) Some(exec) else None))

    val family =
      if (pin.startsWith("join|")) {
        plan("sweep abandoned batch dirs (24h gate)") {
          s"deleted=${graft.operators.JoinView
            .cleanOrphanBatchDirs(spark, root).size}"
        }
        "join"
      } else if (pin.startsWith("cdcRollup|")) {
        // the unsafe class refuses the whole run: without a sane pin
        // no rebuild target can be trusted
        val layout =
          try graft.operators.CdcRollup.parseLayout(pin, root)
          catch {
            case _: IllegalArgumentException =>
              throw new UserException(
                s"maintainView repair: malformed layout pin '$pin' " +
                  s"under $root — the UNSAFE class: repair cannot " +
                  "derive anything from a drifted pin; restore " +
                  "_CONFIG from the writer's declared layout first " +
                  "(the fsck runbook hint)")
          }
        val markers = graft.operators.BatchMarkers.read(fs, rootPath)
        if (markers.maxCommitted.isDefined) {
          val declared =
            (if (layout.minMaxCols.nonEmpty) Seq("grp") else Nil) ++
              layout.auxViews.map("aux_" + _._1) ++
              layout.auxMinMax.keys.toSeq.sorted.map("grp_aux_" + _)
          declared.filterNot(l => fs.exists(new Path(rootPath, l)))
            .foreach { l =>
              plan(s"rebuild missing layer '$l' from the base images" +
                " (floors the rebuilt chain at the frontier on " +
                "retained states)") {
                s"rows=${graft.operators.CdcRollup
                  .rebuildDerivedLayer(spark, root, l)}"
              }
            }
        }
        plan("sweep abandoned batch garbage (24h gate)") {
          s"deleted=${graft.operators.CdcRollup
            .cleanOrphanBatchDirs(spark, root).size}"
        }
        "cdcRollup"
      } else if (pin.startsWith("foldManifest|")) {
        // a manifest holds only marker files — nothing in the
        // safe-repair class lives here (gc foldMarkers owns the
        // hygiene); the embedded fsck below still names anything
        // manual (overstating witnesses, vanished roots)
        "foldManifest"
      } else {
        // rollup pin: nBuckets|keys|valueCol — the frontier witness
        val statePq = new Path(rootPath, "state")
        val evidence =
          if (!fs.exists(statePq)) Nil
          else fs.listStatus(statePq).toSeq.map(_.getPath)
            .filter(_.getName.startsWith("bucket="))
            .flatMap(b => fs.listStatus(b).toSeq
              .map(_.getPath.getName)
              .filter(_.startsWith("_APPLIED_"))
              .flatMap(_.stripPrefix("_APPLIED_").toLongOption))
        val last = graft.streaming.EventStreams
          .readLastBatch(fs, rootPath)
        evidence.maxOption
          .filter(ev => last.forall(_ < ev))
          .foreach { ev =>
            plan(s"restore _LAST_BATCH to $ev (the max _APPLIED " +
              "evidence across buckets — overstating skips replays, " +
              "understating would re-admit folded ids)") {
              // the fold's own temp+rename discipline
              fs.listStatus(rootPath).toSeq
                .filter(_.getPath.getName.startsWith("_LAST_BATCH_tmp_"))
                .foreach(st => fs.delete(st.getPath, false))
              val tmp = new Path(rootPath, "_LAST_BATCH_tmp_repair")
              val out = fs.create(tmp, true)
              try out.write(ev.toString.getBytes("UTF-8"))
              finally out.close()
              val dst = new Path(rootPath, "_LAST_BATCH")
              if (fs.exists(dst)) fs.delete(dst, false)
              if (!fs.rename(tmp, dst))
                throw new java.io.IOException(
                  s"repair: could not restore _LAST_BATCH at $root")
              s"restored=$ev"
            }
          }
        plan("sweep stranded staging shells and abandoned history " +
          "garbage (24h gate)") {
          val a = graft.operators.Maintenance
            .cleanTableOrphanStages(spark, s"$root/state")
          val b = graft.streaming.EventStreams
            .cleanRollupHistoryOrphans(spark, root)
          s"deleted=${a.size + b.size}"
        }
        "rollup"
      }
    val done = repairs.result()
    val repairsJson = done.map { case (what, result) =>
      s"""{"what":${graft.JsonUtil.str(what)},"result":""" +
        result.map(graft.JsonUtil.str).getOrElse("null") + "}"
    }.mkString("[", ",", "]")
    // the post-repair audit names what stays manual — embedded whole,
    // so one repair report is a complete runbook state
    val fsck = ViewFsck.fsckJson(spark, root)
    s"""{"family":"$family","apply":$apply,""" +
      s""""repairs":$repairsJson,"fsck":$fsck}"""
  }
}
