package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-rollup
  * pattern: keep a per-key aggregate STATE current as batches arrive,
  * without ever rescanning history. The reference's incremental load
  * (SURVEY §2.3) maintains raw rows; at 100 TB the ROLLUPS over those
  * rows are what dashboards/joins actually read, and recomputing a
  * grouped aggregate over the full fact table per ingest is the same
  * wall the partition-scoped merge removed for data.
  *
  * Mechanics: every maintained aggregate is expressed through its
  * commutative-monoid partial form (count, sum, min, max — avg derives
  * as sum/count at read time), so merging a batch is
  * `state ∪ partial(batch) → one groupBy on the key`. Per ingest that
  * shuffles |keys| + |batch-keys| SLIM rows — never the history. The
  * state schema is normalized (long / decimal(38,6) / value type) so
  * folds compose indefinitely without precision creep.
  *
  * Contract: batches are EXACTLY-ONCE — replaying a batch double
  * counts (pair with an idempotent landing zone like
  * [[graft.sources.PartitionedStore.mergeByDay]], or the streaming
  * sinks' per-batch_id overwrite partitions, to get that). Persist the
  * state via [[graft.sources.BucketedStore]] bucketed on the key and
  * the merge's groupBy runs shuffle-free on the state side.
  */
object IncrementalAgg {

  /** Fixed sketch width for the distinct state — part of the persisted
    * layout like the bucketed rollup's `_CONFIG` pin: states only
    * OR-merge at the width they were built with (the combine aggregate
    * enforces it loudly on byte-length mismatch). */
  val DistinctSketchBits = 14

  /** Fixed relative accuracy for the quantile state — pinned for the
    * same reason as [[DistinctSketchBits]]: bucket boundaries are a
    * function of alpha, so states only compose at the alpha they were
    * built with (the sketch header enforces it loudly). */
  val QuantileAlpha = 0.01

  /** The partial (mergeable) state of one batch: per-key count / sum /
    * min / max over `valueCol`, plus — when `distinctCol` is set — a
    * linear-counting bitmap of that column's distinct values
    * ([[graft.functions.LinearCountSketchState]]). The bitmap is the
    * ONLY way distinct-count fits this monoid: exact distinct is not
    * mergeable without keeping every value, while the fixed 2 KiB
    * state ORs associatively/commutatively like the algebraic columns.
    *
    * PRECISION CONTRACT: values quantize to the state's
    * decimal(38,6) on entry — exact, order-independent addition is
    * what makes the fold a monoid (double sums are not associative,
    * so a double state would drift with batch order). Values smaller
    * than 1e-6 round to zero in the SUM (min/max keep the native
    * type); a domain needing finer scale pre-scales the column. */
  def partialState(batch: DataFrame, keys: Seq[String], valueCol: String,
                   distinctCol: Option[String] = None,
                   /** Also maintain a relative-error quantile sketch of
                     * `valueCol` per key (bounded count-additive bucket
                     * state — [[graft.functions.QuantileSketchState]]);
                     * exact quantiles are not expressible as bounded
                     * fold state any more than exact distinct is. */
                   trackQuantiles: Boolean = false): DataFrame = {
    val base = Seq(
      count(col(valueCol)).as("agg_count"),
      sum(col(valueCol).cast("decimal(38,6)")).as("agg_sum"),
      min(col(valueCol)).as("agg_min"),
      max(col(valueCol)).as("agg_max"))
    val aggs = base ++ distinctCol.map(dc =>
      graft.functions.SketchFunctions
        .distinctSketchState(col(dc), DistinctSketchBits).as("agg_distinct")) ++
      (if (trackQuantiles)
        Seq(graft.functions.QuantileFunctions
          .quantileSketchState(col(valueCol), QuantileAlpha)
          .as("agg_quantile"))
      else Nil)
    normalize(
      batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*), keys)
  }

  /** Fold one batch into the state: union of two partial-state frames,
    * one groupBy on the key. Associative and commutative — batch
    * order never changes the result (up to the value type's own
    * min/max/sum semantics). */
  def mergeState(state: DataFrame, batch: DataFrame, keys: Seq[String],
                 valueCol: String,
                 distinctCol: Option[String] = None,
                 trackQuantiles: Boolean = false): DataFrame =
    mergeStates(state,
      partialState(batch, keys, valueCol, distinctCol, trackQuantiles), keys)

  /** Merge two already-partial states (e.g. the persisted state and a
    * pre-aggregated shard from another pipeline). The distinct column
    * rides along schema-driven: present in both → OR-merged; absent →
    * untouched; present in only one → loud unionByName failure (a
    * state cannot grow or lose a tracked aggregate mid-life). */
  def mergeStates(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val hasDistinct = a.columns.contains("agg_distinct")
    val hasQuantile = a.columns.contains("agg_quantile")
    val base = Seq(
      sum(col("agg_count")).as("agg_count"),
      sum(col("agg_sum")).as("agg_sum"),
      min(col("agg_min")).as("agg_min"),
      max(col("agg_max")).as("agg_max"))
    val aggs = base ++ (if (hasDistinct)
      Seq(graft.functions.SketchFunctions
        .mergeSketchStates(col("agg_distinct"), DistinctSketchBits)
        .as("agg_distinct"))
    else Nil) ++ (if (hasQuantile)
      Seq(graft.functions.QuantileFunctions
        .mergeQuantileStates(col("agg_quantile"), QuantileAlpha)
        .as("agg_quantile"))
    else Nil)
    normalize(a.unionByName(b).groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*), keys)
  }

  /** Read-time view of the state: the user-facing aggregate columns
    * (avg derived — it is NOT a monoid and is never stored; the
    * distinct estimate likewise derives from the stored bitmap). */
  def finalizeState(state: DataFrame, keys: Seq[String]): DataFrame = {
    val base = Seq(
      col("agg_count").as("n"),
      col("agg_sum").cast("double").as("total"),
      (col("agg_sum").cast("double") / col("agg_count")).as("mean"),
      col("agg_min").as("vmin"),
      col("agg_max").as("vmax"))
    val cols = base ++ (if (state.columns.contains("agg_distinct"))
      Seq(graft.functions.SketchFunctions
        .sketchEstimate(col("agg_distinct"), DistinctSketchBits)
        .as("n_distinct"))
    else Nil) ++ (if (state.columns.contains("agg_quantile"))
      Seq(0.5, 0.95, 0.99).map(q =>
        graft.functions.QuantileFunctions
          .quantileEstimate(col("agg_quantile"), q, QuantileAlpha)
          .as(s"p${(q * 100).toInt}"))
    else Nil)
    state.select(keys.map(col) ++ cols: _*)
  }

  /** Pin the state schema so repeated folds keep byte-identical types
    * (sum would otherwise widen decimal(28,4)→(38,4) on first merge
    * and unionByName would chase the drift). */
  private def normalize(df: DataFrame, keys: Seq[String]): DataFrame =
    df.select(keys.map(col) ++ Seq(
      col("agg_count").cast("long").as("agg_count"),
      col("agg_sum").cast("decimal(38,6)").as("agg_sum"),
      col("agg_min"),
      col("agg_max")) ++
      (if (df.columns.contains("agg_distinct")) Seq(col("agg_distinct"))
       else Nil) ++
      (if (df.columns.contains("agg_quantile")) Seq(col("agg_quantile"))
       else Nil): _*)
}
