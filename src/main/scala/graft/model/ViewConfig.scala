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
  def batchId: Long
}

/** One delta feed: a parquet/csv dataset, optionally a CDC log that
  * is netted down to final-image inserts before folding
  * ([[graft.operators.Load.cdcNetEffect]] — highest `seqColumn` wins
  * per key, net deletes drop out). The view algebras consume INSERT
  * deltas; netting is how a CDC feed meets that contract within a
  * batch (cross-batch updates/deletes stay out of scope, as the
  * library docs pin). */
final case class DeltaInput(input: String, format: String = "parquet",
                            cdc: Option[CdcSpec] = None)

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
