package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared discipline for the "value-grid window" family —
  * [[Drift.ksStatistic]], [[TimeSeries.kaplanMeier]],
  * [[Skyline.frontier2d]] — operators that compress N rows to the
  * DISTINCT values of one column and run a single-partition ordered
  * window over THAT grid.
  *
  * The shape is correct at any scale ONLY while the grid stays
  * bounded. On a genuinely continuous column a 100× scale-up funnels
  * hundreds of millions of distinct values into ONE window task and
  * fails SLOW (a wedged stage, not an error) — the failure mode this
  * codebase refuses everywhere else (`pageRankQ`'s quantum guard,
  * `isotonicCalibrate`'s maxBins). These helpers make the contract
  * LOUD instead of documented-only:
  *
  *  - [[boundedGrid]] probes the grid with a limit-bounded job
  *    and refuses with an actionable message when it overflows
  *    (returning the grid persisted, so the probe's work feeds the
  *    caller's window instead of being recomputed);
  *  - [[quantize]] is the opt-in fix the message points at — bucket
  *    the axis onto a bounded uniform grid upstream.
  */
object ValueGrid {

  /** Default grid bound: a ~1M-row single-partition window is seconds
    * of work on one core; the wedged-stage regime starts orders of
    * magnitude later. Callers with a deliberately huge grid raise it
    * explicitly — the point is that nobody crosses it silently. */
  val DefaultMaxGrid: Int = 1 << 20

  /** Cache-lifetime bound for the persisted grids: [[boundedGrid]]'s
    * consumers are lazy (the caller's window materializes after the
    * call returns), so no operator can unpersist at a provably-safe
    * point — but never unpersisting accumulates up-to-1M-row cache
    * entries for the session lifetime (r11 ADVICE). A small FIFO pool
    * bounds that: the newest `MaxCachedGrids` grids stay warm for
    * their in-flight consumers; older ones are released and would
    * simply RECOMPUTE if a straggler plan still referenced them —
    * a perf fallback, never a correctness hazard. */
  private val MaxCachedGrids = 8
  private val cachedGrids = new java.util.ArrayDeque[DataFrame]

  private def registerCached(df: DataFrame): Unit = synchronized {
    cachedGrids.addLast(df)
    while (cachedGrids.size > MaxCachedGrids)
      cachedGrids.removeFirst().unpersist(blocking = false)
  }

  /** LOUD cardinality probe: counts the grid only up to `maxGrid + 1`
    * rows (a `limit`-bounded job — never a full count of an unbounded
    * grid) and refuses when it overflows. `what` names the operator
    * for the error message.
    *
    * Returns the grid PERSISTED (memory-and-disk): the probe job
    * computes the upstream aggregation, and without a cache the
    * caller's returned query would recompute that same aggregation —
    * doubling the operator's dominant cost (r10 ADVICE). In the
    * common in-bound case the probe consumes every partition fully,
    * so the cache is complete and the downstream window reads it
    * instead of re-aggregating. The cached grid is ≤ maxGrid rows
    * (≈ 1M at the default) — small against executor storage memory,
    * and evicted LRU like any cache. On overflow the persist is
    * released before the refusal throws; in-bound grids enter the
    * bounded FIFO pool ([[MaxCachedGrids]]) so repeated calls never
    * accumulate cache entries for the session lifetime. */
  def boundedGrid(grid: DataFrame, what: String,
                  maxGrid: Int): DataFrame = {
    require(maxGrid >= 1, s"maxGrid must be >= 1, got $maxGrid")
    val cached = grid.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = cached.limit(maxGrid + 1).count()
    if (n > maxGrid) {
      cached.unpersist(blocking = false)
      throw new IllegalArgumentException(
        s"$what: more than $maxGrid distinct grid values — the " +
          "single-partition window over this grid would wedge one task " +
          "at scale; quantize the axis upstream (ValueGrid.quantize) " +
          "or raise maxGrid deliberately")
    }
    registerCached(cached)
    cached
  }

  /** Opt-in quantizer: buckets a continuous column onto a uniform
    * grid of at most `buckets` values, replacing each value with its
    * bucket's LEFT EDGE (a real point on the original axis, so
    * downstream statistics read naturally). One min/max aggregate —
    * a one-row collect, the established scalar pattern — then a pure
    * arithmetic narrow map: no shuffle, no UDF, codegen-friendly.
    * NULLs and NON-FINITE values (NaN, ±Infinity) pass through
    * unchanged — min/max are taken over FINITE values only, so one
    * NaN row cannot poison `hi`/`step` into NaN and silently collapse
    * the whole grid (r10 ADVICE); the passed-through specials add at
    * most 3 extra grid points. Constant and all-NULL/all-non-finite
    * columns come back untouched. The column keeps its name and
    * position; its type widens to double (bucket edges are generally
    * not integral). */
  def quantize(df: DataFrame, valueCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val v = col(valueCol).cast("double")
    // Spark sorts NaN ABOVE +Infinity, so an unguarded max() returns
    // NaN whenever one row is NaN — hence the finite-only aggregate.
    val finite = v.isNotNull && !isnan(v) &&
      v =!= lit(Double.PositiveInfinity) && v =!= lit(Double.NegativeInfinity)
    val mm = df.agg(min(when(finite, v)).as("lo"),
      max(when(finite, v)).as("hi")).collect()(0)
    if (mm.isNullAt(0)) return df // no finite values: nothing to map
    val lo = mm.getDouble(0)
    val hi = mm.getDouble(1)
    if (lo == hi) return df // constant column: already a 1-point grid
    val step = (hi - lo) / buckets
    // the top edge (v == hi) clamps into the last bucket, so the grid
    // has AT MOST `buckets` finite points
    val bucket = least(floor((v - lit(lo)) / lit(step)),
      lit((buckets - 1).toLong))
    df.withColumn(valueCol,
      when(!finite, v) // NULL/NaN/±Inf: pass through (NULL stays NULL)
        .otherwise(lit(lo) + bucket.cast("double") * lit(step)))
  }
}
