package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling splits oversized sort-merge partitions at
  * runtime, but it cannot help when one logical key dominates a hash
  * aggregation or when the skewed side must build a hash table. The
  * classic remedy: append a salt in [0, saltFactor) to the big side's
  * key (deterministically, from a hash of the whole row so re-runs
  * agree), and replicate each small-side row saltFactor times — the
  * hot key's rows spread over saltFactor reducers instead of one.
  *
  * Equivalent to `big.join(small, keys)` for any inputs; the spec
  * asserts equality against the plain join.
  */
object SkewJoin {

  /** Equi-join of a skewed `big` side with a `small` side on `keys`,
    * spreading each key over `saltFactor` partitions. Only `inner` and
    * `left` joins are accepted — a right/full join would emit each
    * UNMATCHED small-side row once per replica, refused loud rather
    * than silently duplicated. Rows identical in EVERY column share a
    * shard (the salt is a pure row function — replay-safe under task
    * retry, unlike random/partition-id salts); pre-aggregate full
    * duplicates first if a hot key consists of them. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "saltedJoin needs join keys")
    require(saltFactor > 0)
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left (a $joinType join would emit " +
        "unmatched small-side rows once per replica)")
    require(!big.columns.contains("__salt") &&
      !small.columns.contains("__salt"), "'__salt' column collides")
    // salt from a hash of the big side's full row → deterministic,
    // uniform, and independent of the join key
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toSeq: _*), lit(saltFactor)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(replicatedSmall, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Two-phase (partial → final) aggregation that survives a skewed
    * group key: first aggregate per (key, salt), then merge the salt
    * partials. `partial`/`merge` express the same aggregate split into
    * its combine steps (e.g. count → sum of counts). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFactor: Int)(
      partial: Seq[(Column, String)], merge: Seq[(Column, String)]): DataFrame = {
    require(saltFactor > 0)
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toSeq: _*), lit(saltFactor)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head._1.as(partial.head._2),
        partial.tail.map { case (c, n) => c.as(n) }: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head._1.as(merge.head._2),
        merge.tail.map { case (c, n) => c.as(n) }: _*)
  }
}
