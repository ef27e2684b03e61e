package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage: score candidate pairs
  * by summing per-field agreement/disagreement log-odds weights.
  *
  * The classic decision model (Fellegi & Sunter 1969): for each
  * comparison field i with match probability m_i = P(agree | same
  * entity) and chance-agreement probability u_i = P(agree | different
  * entities), an agreeing field contributes log2(m_i/u_i) and a
  * disagreeing one log2((1−m_i)/(1−u_i)); the pair's total weight
  * ranks match likelihood, with upper/lower thresholds splitting
  * link / possible / non-link.
  *
  * Weights arrive PRECOMPUTED (plain doubles): m comes from labeled
  * pairs or EM, and keeping the transcendental out of the plan keeps
  * scores bit-deterministic across engines. [[estimateU]] supplies
  * the u side exactly from value frequencies.
  *
  * Scale shape: scoring is a pure per-row expression over an existing
  * candidate-pair frame — zero additional shuffles; generate
  * candidates with the blocked/banded family ([[FuzzyJoin]],
  * [[Dedup]]) so the pair set is never a cartesian. u-estimation is
  * one groupBy over each field's values.
  */
object RecordLinkage {

  /** One comparison field: `agree` is any Boolean column over the
    * pair frame; `agreeW`/`disagreeW` the (log-odds) weights applied
    * when it's true/false. NULL agreement (e.g. a NULL field on
    * either side) contributes weight 0 — the conservative "no
    * information" convention. */
  final case class Field(name: String, agree: Column,
                         agreeW: Double, disagreeW: Double) {
    require(agreeW.isFinite && disagreeW.isFinite,
      s"weights for '$name' must be finite")
  }

  /** Score `pairs` over `fields`: adds one `w_<name>` column per field
    * and their sum as `score`. Column arithmetic only — composes into
    * the candidate-generation plan with no extra exchange. */
  def score(pairs: DataFrame, fields: Seq[Field]): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field required")
    val names = fields.map(f => s"w_${f.name}")
    require(names.distinct.size == names.size,
      s"duplicate field names: ${names.mkString(", ")}")
    val withW = fields.foldLeft(pairs)((df, f) =>
      df.withColumn(s"w_${f.name}",
        when(f.agree, lit(f.agreeW))
          .when(!f.agree, lit(f.disagreeW))
          .otherwise(lit(0.0))))
    withW.withColumn("score",
      names.map(col).reduce(_ + _))
  }

  /** Exact chance-agreement probability u for an equality comparison
    * on `valueCol`: the probability two DISTINCT random records agree,
    * u = Σ_v n_v·(n_v−1) / (N·(N−1)) — all-integer until the one final
    * division, so the estimate is bit-stable under any partitioning.
    * Returns 0.0 for degenerate inputs (N < 2). */
  def estimateU(records: DataFrame, valueCol: String): Double = {
    val row = records.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * (col("n") - 1)).as("pairs"),
        sum(col("n")).as("total")).head()
    if (row.isNullAt(1)) return 0.0
    val total = row.getLong(1)
    if (total < 2) 0.0
    else row.getLong(0).toDouble / (total.toDouble * (total - 1).toDouble)
  }
}
