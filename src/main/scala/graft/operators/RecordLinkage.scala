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

  /** Field-level survivorship rule for [[goldenRecord]]. NULLs never
    * survive unless the cluster's field is entirely NULL (every rule
    * rides an ordering that is NULL for NULL inputs, and
    * `min_by`/`max_by` skip NULL orderings). Every rule is
    * deterministic — ties break toward the SMALLEST value — so the
    * golden record is a pure function of the cluster's contents,
    * independent of partitioning or arrival order. */
  sealed trait Rule
  /** Largest value survives. */          case object MaxRule extends Rule
  /** Smallest value survives. */         case object MinRule extends Rule
  /** Longest string survives (tie → smallest). */
  case object LongestRule extends Rule
  /** Most frequent value survives (tie → smallest). */
  case object ModeRule extends Rule

  /** Golden-record merge — the survivorship step that completes the
    * entity-resolution pipeline (candidate pairs → [[score]] →
    * `Dedup.duplicateClusters` → ONE surviving record per entity).
    * `records` must carry `clusterCol`; each listed field collapses
    * per cluster under its [[Rule]], plus `n_members` (cluster size).
    *
    * Scale shape: max/min/longest fold in ONE partial-aggregated
    * groupBy over the records; each MODE field needs its own
    * (cluster, value) count — one extra aggregation + one
    * cluster-keyed join per mode field, all partial-aggregated,
    * never a window over raw rows. */
  def goldenRecord(records: DataFrame, clusterCol: String,
                   rules: Seq[(String, Rule)]): DataFrame = {
    require(rules.nonEmpty, "at least one survivorship rule required")
    val names = rules.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate survivorship fields: ${names.mkString(", ")}")
    require(!names.contains(clusterCol),
      s"cluster column '$clusterCol' cannot carry a survivorship rule")
    val base = records.groupBy(col(clusterCol).as("cluster"))
      .agg(count(lit(1)).as("n_members"),
        rules.collect {
          case (f, MaxRule) => max(col(f)).as(f)
          case (f, MinRule) => min(col(f)).as(f)
          case (f, LongestRule) =>
            // longest, tie → smallest: minimize (−length, value).
            // The ordering must be NULL (not a struct OF nulls) for
            // NULL inputs so min_by skips them.
            min_by(col(f), when(col(f).isNotNull,
              struct((-length(col(f))).as("nl"), col(f).as("v")))).as(f)
        }: _*)
    rules.collect { case (f, ModeRule) => f }.foldLeft(base) { (acc, f) =>
      val mode = records.filter(col(f).isNotNull)
        .groupBy(col(clusterCol).as("cluster"), col(f))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("cluster")
        // most frequent, tie → smallest: minimize (−count, value)
        .agg(min_by(col(f), struct((-col("cnt")).as("nc"),
          col(f).as("v"))).as(f))
      acc.join(mode, Seq("cluster"), "left")
    }
  }
}
