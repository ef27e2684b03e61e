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
  def pointInInterval(facts: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // empty intervals ([lo, hi) with hi <= lo) match nothing; drop them
    // before the explode — Spark's sequence() would otherwise emit a
    // DESCENDING bucket range for them (garbage candidates the residual
    // filter must then discard)
    val expanded = intervals.filter(col(hiCol) > col(loCol)).withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        // cover through floor(hi/width): any point p < hi satisfies
        // floor(p/w) <= floor(hi/w), and this stays exact for
        // FRACTIONAL bounds too (floor((hi-1)/w) would skip the last
        // bucket when hi has a fractional part crossing a bucket edge);
        // the at-most-one superfluous bucket row per interval is
        // discarded by the residual bounds filter
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val pointed = facts.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    pointed.join(expanded, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
