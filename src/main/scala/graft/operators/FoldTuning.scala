package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared SMALL-FOLD execution policy for the view-maintenance fold
  * paths (CdcRollup, JoinView, the bucketed rollup sink).
  *
  * Measured motivation (r19): with AQE on, every exchange in a fold's
  * many tiny actions materializes as its OWN Spark job (stage-by-stage
  * re-optimization), so a 3-fold gate query runs 50-70 jobs whose task
  * time is under 25% of wall — the folds are JOB-COUNT-bound, not
  * compute-bound (the r18 core-scaling ratios < 1 said the same). When
  * the working set is provably small, adaptive re-planning cannot help
  * (nothing to coalesce or skew-split that matters) and its
  * per-exchange job round-trips are pure overhead — so a small fold
  * runs with AQE off: one job per action. A big fold (bulk backfill,
  * huge touched buckets) keeps AQE; the policy is sized by the DATA,
  * not by the bench config.
  *
  * "Provably small" = the netted/aggregated delta is under
  * `spark.graft.fold.smallRows` (default 1e6 rows — a 1M-row delta
  * fits comfortably in a handful of partitions at any sane row width)
  * AND the whole persisted state is under
  * `spark.graft.fold.smallBytes` (default 512 MB — one driver-side
  * content summary; touched-bucket reads are bounded by state size).
  * Both thresholds are session confs so a cluster deployment can
  * re-tune them; the defaults are conservative in the safe direction
  * (when in doubt, AQE stays on). Results are unaffected either way —
  * the folds' arithmetic is exact and order-independent (decimal
  * sums, sets, min/max). */
private[graft] object FoldTuning {

  def smallRows(spark: SparkSession): Long =
    spark.conf.get("spark.graft.fold.smallRows", "1000000").toLong

  def smallBytes(spark: SparkSession): Long =
    spark.conf.get("spark.graft.fold.smallBytes",
      (512L << 20).toString).toLong

  /** Total bytes under the state root — ONE recursive driver-side FS
    * call; Long.MaxValue (never small) when the call fails. */
  def stateBytes(fs: org.apache.hadoop.fs.FileSystem,
                 root: org.apache.hadoop.fs.Path): Long =
    try fs.getContentSummary(root).getLength
    catch { case _: Exception => Long.MaxValue } // conservative

  /** The policy predicate: small delta AND small state. */
  def smallFold(spark: SparkSession, deltaRows: Long,
                fs: org.apache.hadoop.fs.FileSystem,
                root: org.apache.hadoop.fs.Path): Boolean =
    deltaRows <= smallRows(spark) &&
      stateBytes(fs, root) <= smallBytes(spark)

  /** Run `body` with adaptive query execution OFF when `cond` holds:
    * each action plans once and runs as ONE job instead of one job
    * per exchange. The toggle is session-scoped (SQLConf has no
    * per-thread scope): each STATE is single-writer by contract, but
    * two different states CAN fold concurrently on one session (two
    * streaming sinks) and then race the toggle. That race is
    * perf-only — a fold may plan with AQE on where off was intended
    * or vice versa; results are identical either way (the fold
    * arithmetic is exact and order-independent), so correctness never
    * depends on which write wins. */
  def withAqeOffIf[T](spark: SparkSession, cond: Boolean)
                     (body: => T): T = {
    if (!cond) body
    else {
      val key = "spark.sql.adaptive.enabled"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "false")
      try body
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
