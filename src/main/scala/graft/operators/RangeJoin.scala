package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval range join.
  *
  * Spark plans a raw `p >= lo AND p < hi` join as
  * BroadcastNestedLoopJoin (or worse, cartesian) — O(|facts|·|intervals|)
  * compares. The bucketed formulation turns it into an equi-join:
  * intervals explode to the fixed-width buckets they cover, facts map
  * to the single bucket containing their point, the join keys on the
  * bucket, and a residual filter re-checks the exact bounds.
  *
  * Scale shape: the fact side (the 100 TB side) NEVER explodes — one
  * bucket per row, one hash-partitioned shuffle on the bucket key. The
  * interval side replicates by ⌈len/bucketWidth⌉, bounded by choosing
  * `bucketWidth` near the median interval length. Cost goes from
  * all-pairs to |facts| + Σ interval-cover — the standard binning
  * strategy for interval overlap at scale.
  */
object RangeJoin {

  /** Join `facts` rows to every `intervals` row whose `[lo, hi)` range
    * contains the fact's `point`. Column names are taken from the two
    * frames; all three must be numeric (cast dates to day numbers).
    *
    * @param bucketWidth bucket size in the point's units; intervals
    *   explode to ⌈(hi-lo)/bucketWidth⌉+1 rows each
    */
  /** Explode an interval frame to one row per fixed-width bucket its
    * `[lo, hi)` range covers, as `__bucket`.
    *
    * Empty intervals (hi <= lo) match nothing and are dropped before
    * the explode — Spark's sequence() would otherwise emit a DESCENDING
    * bucket range for them (garbage candidates the residual filter must
    * then discard). Coverage runs through floor(hi/width): any point
    * p < hi satisfies floor(p/w) <= floor(hi/w), and this stays exact
    * for FRACTIONAL bounds too (floor((hi-1)/w) would skip the last
    * bucket when hi has a fractional part crossing a bucket edge); the
    * at-most-one superfluous bucket row per interval is discarded by
    * the caller's residual bounds filter. */
  private def bucketCover(df: DataFrame, loCol: String, hiCol: String,
                          bucketWidth: Long): DataFrame =
    df.filter(col(hiCol) > col(loCol)).withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))

  def pointInInterval(facts: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val expanded = bucketCover(intervals, loCol, hiCol, bucketWidth)
    val pointed = facts.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    pointed.join(expanded, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Join every `left` interval `[leftLo, leftHi)` to every `right`
    * interval `[rightLo, rightHi)` it overlaps — the interval×interval
    * sibling of [[pointInInterval]] (genomics/temporal overlap shape).
    *
    * Both sides explode to their covered buckets and meet on an
    * equi-join; a pair sharing k buckets would emit k copies, so each
    * pair is kept only in its FIRST shared bucket
    * (max of the two start buckets) — dedup by arithmetic, not a
    * `distinct` shuffle over the output. Pick `bucketWidth` near the
    * larger side's median interval length to bound the explode factor.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      leftLo: String, leftHi: String,
                      rightLo: String, rightHi: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    bucketCover(left, leftLo, leftHi, bucketWidth)
      .join(bucketCover(right, rightLo, rightHi, bucketWidth), Seq("__bucket"))
      .filter(col(leftLo) < col(rightHi) && col(rightLo) < col(leftHi))
      .filter(col("__bucket") ===
        greatest(floor(col(leftLo) / bucketWidth).cast("long"),
          floor(col(rightLo) / bucketWidth).cast("long")))
      .drop("__bucket")
  }
}
