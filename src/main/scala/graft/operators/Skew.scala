package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the explicit tool for the case
  * AQE's runtime skew-split cannot reach (a skewed join feeding an
  * aggregation in the same stage, a key whose skew is known up front,
  * a non-sort-merge plan).
  */
object Skew {

  /** Salted equi-join: spread each hot join key over `factor` shuffle
    * partitions by salting the LARGE side with a deterministic shard
    * and replicating the SMALL side `factor`×. The join result is
    * row-for-row EXACTLY the plain join's (spec- and gate-pinned);
    * only the partitioning of the work changes: a key holding 10% of
    * the table becomes `factor` tasks of 10%/factor instead of one
    * straggler.
    *
    * The shard is a pure function of the large-side ROW
    * (xxhash64 over all its columns, mod factor) — deterministic
    * under task retry and replay, unlike a random or partition-id
    * salt that can double-count on recompute. Consequence: rows
    * identical in EVERY column share a shard; hot keys whose rows
    * are full duplicates should be pre-aggregated first (they
    * compress anyway).
    *
    * Cost model: small side shuffles factor× its size (`factor ×
    * |small|` rows — keep factor · |small| comfortably under the
    * large side's partition count × partition size); large side pays
    * one extra narrow projection. Only `inner` and `left` joins are
    * accepted: a right/full join would emit each UNMATCHED small-side
    * row once per replica — refused loud rather than silently
    * duplicated.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int = 16, joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "saltedJoin needs join keys")
    require(factor >= 1, s"factor must be >= 1, got $factor")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left (a $joinType join would emit " +
        "unmatched small-side rows once per replica)")
    require(!large.columns.contains("__salt") &&
      !small.columns.contains("__salt"), "'__salt' column collides")
    val l = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(factor)).cast("int"))
    val s = small.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i)): _*)))
    l.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
