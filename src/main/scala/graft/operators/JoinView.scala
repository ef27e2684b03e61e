package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized JOIN view — the join
  * sibling of [[IncrementalAgg]]'s rollup maintenance.
  *
  * A denormalized view `V = A ⋈ B` (inner equi-join) over two
  * append-only feeds recomputed per ingest costs a full two-sided
  * shuffle of ALL history every batch — the wall the delta formula
  * removes. For append-only deltas the view's increment is exactly
  *
  *   ΔV = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *      = (ΔA ⋈ B∪ΔB) ∪ (A ⋈ ΔB)
  *
  * (Griffin–Libkin counting algebra restricted to inserts), so each
  * fold joins only delta-sized frames against the retained snapshots
  * and APPENDS — history rows are read but never re-joined against
  * each other.
  *
  * Scale shape: the retained snapshots are the big thing. The
  * persisted path stores both snapshots BUCKETED on the join key
  * ([[graft.sources.BucketedStore]]), so each delta fold shuffles ONLY
  * the delta into the bucket layout — the snapshot side of every
  * delta join is a zero-exchange bucketed scan, and appended deltas
  * land in the same layout (one slim write per fold). The in-memory
  * form below carries the same algebra for composition inside one
  * plan (and for the driver gate, which needs a deterministic fresh
  * fold).
  *
  * Contract mirrors IncrementalAgg: batches are EXACTLY-ONCE (replay
  * duplicates view rows — pair with an idempotent landing zone or the
  * streaming sinks' per-batch_id partitions); deltas are INSERTS
  * (updates/deletes need the counting form with multiplicities —
  * compose with [[Load.cdcNetEffect]] upstream to net a CDC feed down
  * to inserts of final images first).
  */
object JoinView {

  /** In-memory state of the maintained view. */
  final case class State(a: DataFrame, b: DataFrame, view: DataFrame)

  private[graft] def checkKeys(a: DataFrame, b: DataFrame, key: String): Unit = {
    require(a.columns.contains(key), s"left side lacks join key '$key'")
    require(b.columns.contains(key), s"right side lacks join key '$key'")
    val overlap = (a.columns.toSet & b.columns.toSet) - key
    require(overlap.isEmpty,
      s"non-key columns collide across sides: ${overlap.mkString(", ")} — " +
        "rename before maintenance (the view keeps both sides' columns)")
  }

  /** Initialize from first snapshots (either may be empty). */
  def init(a: DataFrame, b: DataFrame, key: String): State = {
    checkKeys(a, b, key)
    State(a, b, a.join(b, key))
  }

  /** Fold one batch of inserts into the state. Either delta may be
    * empty (pass a filtered-to-nothing frame). The returned view is
    * `old view ∪ ΔV` — unsorted, append-only. */
  def applyDelta(st: State, deltaA: DataFrame, deltaB: DataFrame,
                 key: String): State = {
    checkKeys(deltaA, deltaB, key)
    // ΔA sees B∪ΔB; A (pre-delta) sees ΔB — together they cover
    // old×new, new×old and new×new exactly once
    val dv = deltaA.join(st.b.unionByName(deltaB), key)
      .unionByName(st.a.join(deltaB, key))
    State(st.a.unionByName(deltaA), st.b.unionByName(deltaB),
      st.view.unionByName(dv))
  }

  // ---- persisted, bucketed form -------------------------------------

  /** Table names for one persisted view. Bucketing lives in the
    * metastore, so these are TABLE identifiers, not paths. */
  final case class Tables(a: String, b: String, view: String)

  /** Create the three bucketed tables from initial snapshots. All
    * three share the key's bucket layout: every later delta fold
    * scans the snapshots with ZERO exchange on their side. */
  def initBucketed(a: DataFrame, b: DataFrame, key: String,
                   tables: Tables, nBuckets: Int): Unit = {
    checkKeys(a, b, key)
    graft.sources.BucketedStore.writeBucketed(a, tables.a, Seq(key), nBuckets)
    graft.sources.BucketedStore.writeBucketed(b, tables.b, Seq(key), nBuckets)
    val spark = a.sparkSession
    graft.sources.BucketedStore.writeBucketed(
      graft.sources.BucketedStore.read(spark, tables.a)
        .join(graft.sources.BucketedStore.read(spark, tables.b), key),
      tables.view, Seq(key), nBuckets)
  }

  /** Fold one insert batch into the persisted view: two delta-sized
    * joins against bucketed snapshots (snapshot side exchange-free),
    * then three slim APPENDS in the same bucket layout. History is
    * scanned once per fold and never re-joined against itself. */
  def applyDeltaBucketed(spark: SparkSession, deltaA: DataFrame,
                         deltaB: DataFrame, key: String, tables: Tables,
                         nBuckets: Int): Unit = {
    checkKeys(deltaA, deltaB, key)
    val bs = graft.sources.BucketedStore
    // the deltas feed two joins and an append each — cache the (small)
    // delta, not the history
    val da = deltaA.persist(); val db = deltaB.persist()
    try {
      val dv = da.join(bs.read(spark, tables.b).unionByName(db), key)
        .unionByName(bs.read(spark, tables.a).join(db, key))
      bs.appendBucketed(dv, tables.view, Seq(key), nBuckets)
      bs.appendBucketed(da, tables.a, Seq(key), nBuckets)
      bs.appendBucketed(db, tables.b, Seq(key), nBuckets)
    } finally { da.unpersist(); db.unpersist() }
  }
}
