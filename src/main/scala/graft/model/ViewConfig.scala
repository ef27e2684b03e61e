package graft.model

/** Config surface for the `maintainView` action — incremental
  * materialized-view maintenance ([[graft.operators.JoinView]] /
  * [[graft.operators.IncrementalAgg]]) exposed through the
  * reference's entry-point idiom: config-in, JSON-status-out
  * (reference: run.php:18-56, RedshiftApplication.php:47-55 — the
  * reference only speaks writer configs; this is the engine-grade
  * extension of the same protocol, like the `pipeline` action).
  *
  * One invocation folds ONE delta batch (`batchId`) into persisted
  * state under `statePath`. Re-running the same batchId is a no-op
  * (`applied: false` in the status JSON) — the scheduler idiom:
  * at-least-once invocation, exactly-once effect, the same contract
  * the streaming sinks pin ([[graft.streaming.EventStreams]]).
  */
sealed trait ViewConfig {
  def kind: String
  def statePath: String
}

/** One delta feed: a parquet/csv dataset, optionally a CDC log that
  * is netted down to final-image inserts before folding
  * ([[graft.operators.Load.cdcNetEffect]] — highest `seqColumn` wins
  * per key, net deletes drop out). The view algebras consume INSERT
  * deltas; netting is how a CDC feed meets that contract within a
  * batch (cross-batch updates/deletes stay out of scope, as the
  * library docs pin).
  *
  * `items` is the DECLARED column schema, REQUIRED for `format: "csv"`
  * (parser-enforced) and ignored for parquet (which carries types).
  * CSV arrives untyped; without a declaration every column would fold
  * as STRING — lexicographic min/max in a rollup ("9" > "10"),
  * type-drifted `xxhash64` bucket keys in a join view — so the engine
  * refuses rather than infers, the same never-infer rule as the
  * ingest path (SURVEY §1). The declared types run through the STRICT
  * ingest cast ([[graft.sources.CsvIngest.castAndProjectStrict]]):
  * a value that fails its declared cast aborts the fold with the
  * per-column per-line load error, never a silent NULL. */
final case class DeltaInput(input: String, format: String = "parquet",
                            cdc: Option[CdcSpec] = None,
                            items: Seq[ColumnSpec] = Nil)

final case class CdcSpec(keyColumns: Seq[String], seqColumn: String,
                         opColumn: String)

/** Maintained inner-equi-join view `V = A ⋈ B` (delta algebra
  * ΔV = ΔA⋈(B∪ΔB) ∪ A⋈ΔB — [[graft.operators.JoinView]]): each fold
  * joins only delta-sized frames against the retained snapshots;
  * history is never re-joined against itself, and the key-hash
  * bucket layout (`nBuckets`, pinned at first fold) prunes each
  * fold's snapshot reads to the delta's touched buckets. */
final case class JoinViewConfig(statePath: String, batchId: Long,
                                key: String, deltaA: DeltaInput,
                                deltaB: DeltaInput,
                                nBuckets: Int = 64) extends ViewConfig {
  val kind = "join"
}

/** Maintained grouped rollup (count/sum/min/max monoid state —
  * [[graft.operators.IncrementalAgg]]), persisted in the bucketed
  * exactly-once layout of
  * [[graft.streaming.EventStreams.applyRollupBatchBucketed]]:
  * per-bucket `_APPLIED` markers + staging/swap, O(touched buckets)
  * per fold. */
final case class RollupViewConfig(statePath: String, batchId: Long,
                                  keys: Seq[String], valueColumn: String,
                                  delta: DeltaInput,
                                  nBuckets: Int = 16) extends ViewConfig {
  val kind = "rollup"
}

/** Retraction-capable rollup over a CDC feed
  * ([[graft.operators.CdcRollup]]): CROSS-BATCH updates and deletes
  * fold exactly into per-group (n, total...) state — the corner the
  * insert-only `rollup` kind excludes by contract. `valueColumns`
  * declares EVERY measure the view carries (config key
  * `valueColumns`, or the legacy single-measure `valueColumn`): one
  * CDC delta folds all of them in one pass — a state row is
  * `(n, total_1 .. total_k)`, spelled `(n, total)` when k = 1 so
  * pre-multi-measure states keep reading and folding unchanged. The
  * delta IS the CDC log (`seqColumn`/`opColumn` name its ordering and
  * I/U/D ops), so a `cdc` netting block is refused here — the fold
  * nets internally and must SEE the deletes the netting would drop.
  * `minMaxColumns` adds exact per-group MIN/MAX of the named columns:
  * not invertible under retraction, so the fold recomputes them for
  * the delta's touched groups from a group-bucketed image layer the
  * state maintains alongside (bucket-pruned, touched-group-sized —
  * [[graft.operators.CdcRollup]] object doc). The set is pinned at
  * first fold; adding min/max to an existing sums-only state refuses
  * (its image layer was never maintained — compact into a fresh
  * min/max state instead). Batch ids are MONOTONE (the fold refuses
  * an id below the committed frontier — a lower id would write
  * bucket versions no reader ever resolves). */
final case class CdcRollupViewConfig(statePath: String, batchId: Long,
                                     keyColumns: Seq[String],
                                     seqColumn: String, opColumn: String,
                                     keys: Seq[String],
                                     valueColumns: Seq[String],
                                     delta: DeltaInput,
                                     nBaseBuckets: Int = 64,
                                     nAggBuckets: Int = 16,
                                     minMaxColumns: Seq[String] = Nil,
                                     /** Extra rollup views over the
                                       * SAME base, each with its own
                                       * group columns (config:
                                       * `auxViews: {name: [cols]}`) —
                                       * N dashboards over one feed pay
                                       * ONE netting pass, ONE base
                                       * rewrite and ONE atomic marker
                                       * instead of N separate states.
                                       * Sums-only; read via export
                                       * `layer: "aux:<name>"`. Pinned
                                       * at first fold like every
                                       * layout choice. */
                                     auxViews: Seq[(String, Seq[String])]
                                       = Nil,
                                     /** Per-aux exact MIN/MAX columns
                                       * (config: `auxMinMaxColumns:
                                       * {name: [cols]}`) — names must
                                       * be declared in `auxViews`;
                                       * that view gains min/max
                                       * served from its own slim
                                       * image layer. */
                                     auxMinMaxColumns:
                                       Map[String, Seq[String]]
                                       = Map.empty)
    extends ViewConfig {
  val kind = "cdcRollup"
}

/** Export the maintained view to a consumable parquet dataset — the
  * read face that completes the CLI lifecycle (fold → compact →
  * export): without it the state is reachable only through library
  * code. Pin-dispatched like `compact`: join states export the
  * committed view, rollup states the FINALIZED aggregates
  * ([[graft.operators.IncrementalAgg.finalizeState]] — the monoid
  * state itself is an implementation detail), cdcRollup states the
  * (group, n, total...) view or — `layer: "base"` — the SCD1 current
  * images. `layer` is REFUSED on non-cdcRollup states (a silently
  * ignored layer would let the user believe they exported SCD1
  * images when they got the view). A plain overwrite parquet copy:
  * idempotent, no markers needed. */
final case class ExportViewConfig(statePath: String, output: String,
                                  /** cdcRollup only: "view" (default),
                                    * "base" (SCD1 images),
                                    * "aux:<name>" (an aux view), or
                                    * "log" (the explicit base
                                    * change-log pull — requires
                                    * sinceBatch). */
                                  layer: String = "view",
                                  /** Export the state AS OF this batch
                                    * id — the reproducibility face.
                                    * join states serve any committed
                                    * prefix (append-only dirs; only a
                                    * compaction floor gates);
                                    * cdcRollup AND rollup states need
                                    * retention mode and an id at or
                                    * above their reap floor (each
                                    * family's own COW chain). */
                                  asOf: Option[Long] = None,
                                  /** The incremental consumer pull:
                                    * join states export the view rows
                                    * APPENDED after this id
                                    * ([[graft.operators.JoinView
                                    * .readViewDelta]]); cdcRollup
                                    * states export the CHANGE SET
                                    * since it — snapshot-diff in
                                    * retention mode, the fold-time
                                    * logs in change-log mode, at the
                                    * view/aux/base grain the layer
                                    * key names; rollup states export
                                    * the finalized-view change set
                                    * from their retained COW chain
                                    * ([[graft.streaming.EventStreams
                                    * .readRollupViewSincePinned]] —
                                    * retention mode required). Record
                                    * the reported batch_id (the
                                    * frontier pulled to), pass it
                                    * back next time. Mutually
                                    * exclusive with `asOf`. */
                                  sinceBatch: Option[Long] = None,
                                  /** Cap a `sinceBatch` pull at a
                                    * cross-root manifest's GROUP
                                    * frontier ([[graft.operators
                                    * .FoldManifest]]): every view of
                                    * the group pulled with the same
                                    * manifest reads one consistent
                                    * snapshot even while a lagging
                                    * root recovers. The state must be
                                    * a pinned member of the manifest;
                                    * requires `sinceBatch`. */
                                  manifest: Option[String] = None)
    extends ViewConfig {
  val kind = "export"
}

/** Switch a cdcRollup state into AS-OF RETENTION mode
  * ([[graft.operators.CdcRollup.enableRetention]]): folds keep
  * superseded copy-on-write bucket versions as snapshot history, so
  * `lookup`/`export` with `asOf` can re-serve the exact view any
  * earlier batch saw — record the batch id a training run consumed,
  * re-read as-of it while the retention window holds. The floor
  * reported is the lowest servable batch id (the frontier at enable
  * time — history before it was reaped eagerly). Idempotent; refused
  * on the other families (their states hold no version history).
  * Pair with `gc` + `retainHours` to bound the accreted history. */
final case class RetainViewConfig(statePath: String) extends ViewConfig {
  val kind = "retain"
}

/** Introspect a persisted view state WITHOUT folding anything — the
  * ops face of the lifecycle ([[graft.operators.JoinView]] /
  * [[graft.streaming.EventStreams]] rollup / [[graft.operators
  * .CdcRollup]]), the reference's `getTablesInfo` idiom
  * (RedshiftApplication.php:199-212) applied to view states: report
  * the layout pin, committed batch ids (count/max + watermark),
  * per-layer dir counts, orphan-candidate garbage, and the view row
  * count. Pure listings plus ONE count — safe to run beside a live
  * writer (committed state only). `countRows: false` drops that one
  * count too: on a huge view the count is a full state scan, and an
  * ops probe that only wants marker/orphan health shouldn't pay it
  * (`view_rows` reports null). */
final case class StatusViewConfig(statePath: String,
                                  countRows: Boolean = true)
    extends ViewConfig {
  val kind = "status"
}

/** Bucket-pruned POINT LOOKUP into a persisted view state — the CLI
  * face of the serving paths ([[graft.operators.JoinView.lookupView]],
  * [[graft.operators.CdcRollup.lookupBase]]/`lookupView`, and the
  * rollup state's partition-pruned probe): keys in as config
  * literals, matching rows out as JSON in the status payload. Without
  * it the serving path exists only for library callers — the
  * reference's action protocol (run.php:29-32) has no library-only
  * surface. Pin-dispatched: join states probe the view by join key;
  * cdcRollup states probe the SCD1 base by pk (`layer: "base"`, the
  * default) or the agg view by group key (`layer: "view"`); rollup
  * states probe the finalized aggregates by group key. Key literals
  * are CAST to the state's pinned/stored types before hashing
  * (xxhash64 bucketing is type-sensitive — an uncast literal would
  * probe the wrong buckets). Reads are O(touched buckets), never a
  * state scan. `maxRows` (default 1000) REFUSES oversized results —
  * a lookup is the point-read face; `export` is the bulk face. */
final case class LookupViewConfig(statePath: String,
                                  keys: Seq[Map[String, String]],
                                  layer: Option[String] = None,
                                  maxRows: Int = 1000,
                                  /** Serve the state AS OF this batch
                                    * id (still bucket-pruned). join:
                                    * any committed prefix, gated only
                                    * by a compaction floor; cdcRollup:
                                    * retention mode + at/above the
                                    * reap floor; refused on rollup
                                    * states (no history). */
                                  asOf: Option[Long] = None)
    extends ViewConfig {
  val kind = "lookup"
}

/** CHANGE-SET export between two retained snapshots of a cdcRollup
  * state ([[graft.operators.CdcRollup.diffView]]) or a plain rollup
  * state ([[graft.streaming.EventStreams.diffRollupView]] — finalized
  * view grain, `layer` must stay "view"): per-group state at
  * `fromBatch` vs `toBatch`, groups that differ only, labeled
  * added/removed/changed, written as parquet to `output`. Each
  * family's version chain prunes BOTH snapshot reads to exactly the
  * buckets that changed in `(from, to]` — O(changed buckets), never
  * two state scans. Requires retention mode with `fromBatch` at or
  * above the floor; refused on join states (no group state to
  * diff). */
final case class DiffViewConfig(statePath: String, output: String,
                                fromBatch: Long, toBatch: Long,
                                /** "view" (default) diffs the main
                                  * view; "aux:<name>" diffs that aux
                                  * view on its own group key. */
                                layer: String = "view")
    extends ViewConfig {
  val kind = "diff"
}

/** DEEP state-integrity audit ([[graft.app.ViewFsck]]) — the
  * diagnosis face of the lifecycle: pure listings, zero Spark jobs,
  * never mutates. Reports `ok: false` with named ERRORS when the
  * state could serve wrong data (bucket dirs outside the pinned
  * count, a grp layer contradicting the pin, a retention floor above
  * the frontier, rollup evidence newer than `_LAST_BATCH`), and
  * WARNINGS for the harmless crash remnants `gc` sweeps (stranded
  * staging, uncommitted versions below the frontier, duplicate
  * watermark/floor files, subsumed markers). `status` is the health
  * summary; `fsck` is the audit you run when something looks off —
  * or on a cadence, because every finding names its remediation. */
final case class FsckViewConfig(statePath: String) extends ViewConfig {
  val kind = "fsck"
}

/** Sweep a view state's ABANDONED-batch garbage through the CLI — the
  * write face of `status`'s orphan-candidates report and the same
  * sweep the streaming sinks run on their GC cadence, reachable for
  * CLI-driven views (whose schedulers are exactly where abandoned
  * batch ids come from). Pin-dispatched: join →
  * [[graft.operators.JoinView.cleanOrphanBatchDirs]], cdcRollup →
  * [[graft.operators.CdcRollup.cleanOrphanBatchDirs]], rollup →
  * [[graft.operators.Maintenance.cleanTableOrphanStages]] over the
  * state table. `olderThanHours` tightens/loosens the age gate
  * (default 24 h — an in-flight writer's fresh staging survives).
  *
  * `foldMarkers: true` additionally collapses AGED committed
  * per-batch markers into the `_APPLIED_UPTO_` watermark
  * (join/cdcRollup only — rollup's per-bucket markers are part of the
  * swap protocol and never accrete). Both families age-gate the fold
  * by `olderThanHours`: an id inside its replay window keeps its
  * per-id marker, so a replay there stays a quiet no-op and a
  * never-delivered out-of-order id still refuses loud (cdcRollup's
  * monotone guard; join's watermark refusal) instead of vanishing
  * under the watermark. Opt-in; a join-state CLI user folding ids
  * out of order must leave it off. */
final case class GcViewConfig(statePath: String,
                              olderThanHours: Option[Int] = None,
                              foldMarkers: Boolean = false,
                              /** cdcRollup retention mode only: also
                                    * reap snapshot history whose whole
                                    * servable range predates this
                                    * window, ADVANCING the as-of floor
                                    * past it ([[graft.operators
                                    * .CdcRollup.reapRetainedVersions]]);
                                    * refused when the state is not in
                                    * retention mode (nothing accretes). */
                              retainHours: Option[Int] = None,
                              /** cdcRollup change-log mode only: reap
                                    * log dirs older than this window,
                                    * ADVANCING the `_LOG_FROM_` bound
                                    * past them ([[graft.operators
                                    * .CdcRollup.reapChangeLog]]);
                                    * refused when the state is not in
                                    * change-log mode. */
                              logRetainHours: Option[Int] = None)
    extends ViewConfig {
  val kind = "gc"
}

/** Switch a cdcRollup state into fold-time CHANGE-LOG mode
  * ([[graft.operators.CdcRollup.enableChangeLog]]): every later fold
  * also emits its net per-key image changes into an append-only
  * `log/b<batchId>` dir, so a FORWARD-ONLY mirror pulls its backlog
  * via `export` with `layer: "log"` + `sinceBatch` — no retention
  * mode, no COW history, no floor to out-run. The `log_from` reported
  * is the coverage bound (the committed frontier at enable time):
  * pulls below it refuse. Idempotent; refused on the other families.
  * Pair with `gc` + `logRetainHours` to bound the accreted log. */
final case class ChangeLogViewConfig(statePath: String)
    extends ViewConfig {
  val kind = "changelog"
}

/** Execute the SAFE subset of fsck's runbook hints
  * ([[graft.app.ViewRepair]]): rebuild a missing derived cdcRollup
  * layer from the base images, restore a rollup `_LAST_BATCH`
  * frontier from its per-bucket marker evidence, sweep abandoned
  * rename-window garbage. DRY-RUN by default — `apply: true` is the
  * mutating face; the unsafe class (pin drift, foreign marker files,
  * log coverage gaps) is never touched and the post-repair fsck rides
  * the report naming what remains manual. */
final case class RepairViewConfig(statePath: String,
                                  apply: Boolean = false)
    extends ViewConfig {
  val kind = "repair"
}

/** Group-commit WITNESS for one delta bus feeding N view roots
  * ([[graft.operators.FoldManifest]]): after folding `batchId` into
  * every root in `roots`, this kind verifies each root's own
  * committed evidence and writes the group marker. Consumers cap
  * their `sinceBatch` pulls at the group frontier (export's
  * `manifest` key), so a crash between roots can only make reads
  * slightly stale — never mixed across views. The root set is pinned
  * at first commit; a drifted set refuses. Replaying a committed id
  * reports `applied: false`. */
final case class ManifestViewConfig(statePath: String, batchId: Long,
                                    roots: Seq[String])
    extends ViewConfig {
  val kind = "manifest"
}

/** Out-of-band state compaction — the maintenance both fold protocols
  * prescribe in their ops notes, reachable through the same CLI
  * action. The view KIND is auto-detected from the state's own layout
  * pin (`join|…` → [[graft.operators.JoinView.compactStateTo]];
  * `nBuckets|keys|valueCol` → the rollup sibling): one config shape
  * for both, and a path that is not a pinned view state refuses loud.
  *
  * `nBuckets = None` keeps the source layout's bucket count; a value
  * re-shards — the in-place change the fold pins refuse is exactly
  * what compaction is for. On cdcRollup states `nBuckets` re-shards
  * BOTH layers; `nAggBuckets` overrides the agg/grp layers alone,
  * preserving the deliberate base/agg asymmetry (keys ≫ groups) under
  * a re-shard — it is refused on the other families, which have one
  * layout. The fresh root must be empty; swap roots between folds
  * (single-writer protocol, no concurrent-fold window) and continue
  * with batch ids fresher than anything compacted — the fresh root
  * seeds the SOURCE's committed frontier (watermark or `_LAST_BATCH`
  * + per-bucket marker), so pre-compaction ids stay refused/no-op'd
  * exactly as at the old root. */
final case class CompactViewConfig(statePath: String, freshPath: String,
                                   nBuckets: Option[Int] = None,
                                   nAggBuckets: Option[Int] = None,
                                   /** SCHEMA EVOLUTION at compact
                                     * time (config: `addColumns:
                                     * {name: type}`): nullable
                                     * payload columns added to the
                                     * migrated pin, NULL-filled in
                                     * the existing images. cdcRollup
                                     * states take bare names
                                     * ([[graft.operators.CdcRollup
                                     * .compactStateTo]]); join states
                                     * take side-qualified names —
                                     * `a.<col>` / `b.<col>`
                                     * ([[graft.operators.JoinView
                                     * .compactStateTo]]). Retypes /
                                     * role columns / cross-side
                                     * collisions keep refusing. */
                                   addColumns: Seq[(String, String)]
                                     = Nil)
    extends ViewConfig {
  val kind = "compact"
}
