package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification audits for training-data governance: before a
  * corpus ships, find the quasi-identifier neighborhoods small enough
  * to single someone out.
  *
  * k-anonymity (Sweeney 2002): every combination of quasi-identifier
  * values must be shared by ≥ k records — a group of 1 is a direct
  * re-identification, a group of 3 is a coin flip away. l-diversity
  * (Machanavalhala et al. 2007) patches k-anonymity's homogeneity
  * hole: a k-sized group whose SENSITIVE attribute is constant leaks
  * the attribute without identifying the row — each group must carry
  * ≥ l distinct sensitive values.
  *
  * Both audits are one partial-aggregated groupBy over the
  * quasi-identifier key — the same single-shuffle shape at any scale.
  * NULL quasi-identifier values form their own group (a NULL pattern
  * is itself identifying); NULL sensitive values count as one
  * distinct value.
  */
object Privacy {

  /** Quasi-identifier groups with FEWER than `k` members — the rows a
    * release would expose. Empty result = the frame is k-anonymous
    * over `qiCols`. */
  def kAnonymityViolations(df: DataFrame, qiCols: Seq[String],
                           k: Long): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier required")
    require(k >= 2, s"k must be >= 2 (k=1 is vacuous), got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .filter(col("group_n") < k)
  }

  /** Quasi-identifier groups whose `sensitiveCol` carries FEWER than
    * `l` distinct values (NULL counted as a value) — homogeneous
    * groups that leak the sensitive attribute even when k-anonymous.
    * Empty result = the frame is l-diverse. */
  def lDiversityViolations(df: DataFrame, qiCols: Seq[String],
                           sensitiveCol: String, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier required")
    require(!qiCols.contains(sensitiveCol),
      s"sensitive column '$sensitiveCol' cannot also be a quasi-identifier")
    require(l >= 2, s"l must be >= 2 (l=1 is vacuous), got $l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        // count_distinct ignores NULLs; add the NULL "value" back so a
        // group of all-NULL sensitive values reads as 1, not 0
        (count_distinct(col(sensitiveCol)) +
          max(when(col(sensitiveCol).isNull, 1).otherwise(0)))
          .as("sensitive_distinct"))
      .filter(col("sensitive_distinct") < l)
  }

  /** One link in a deletion cascade: rows of `df` whose `matchKey` is
    * in the incoming key set are deleted; `emitKey` (when set) feeds
    * the NEXT table's key set — the foreign-key walk of a
    * right-to-erasure request. */
  final case class CascadeStep(table: String, df: DataFrame,
                               matchKey: String,
                               emitKey: Option[String] = None)

  /** Right-to-erasure cascade AUDIT: walk the foreign-key chain from
    * the root subject keys and report, per table, how many rows the
    * deletion removes vs holds — the evidence a privacy review signs
    * off before [[purge]] runs. Pure semi-join composition: each step
    * is one key-partitioned semi-join plus two counts folded into a
    * single lazy result; nothing is quadratic and nothing collects.
    * Returns (tbl, n_total, n_deleted), one row per step, in step
    * order (add your own ORDER BY for a stable external sort). */
  def forgetCascadeAudit(rootKeys: DataFrame, rootKeyCol: String,
                         steps: Seq[CascadeStep]): DataFrame = {
    require(steps.nonEmpty, "at least one cascade step required")
    var keys = rootKeys.select(col(rootKeyCol).as("__k")).distinct()
    val audits = steps.map { st =>
      val deleted = st.df.join(keys, st.df(st.matchKey) === col("__k"),
        "left_semi")
      val row = st.df.agg(count(lit(1)).as("n_total"))
        .crossJoin(deleted.agg(count(lit(1)).as("n_deleted")))
        .select(lit(st.table).as("tbl"), col("n_total"), col("n_deleted"))
      st.emitKey.foreach { ek =>
        keys = deleted.select(col(ek).as("__k")).distinct()
      }
      row
    }
    audits.reduce(_.unionByName(_))
  }

  /** The destructive half: rows of `df` SURVIVING deletion of the
    * given subject keys (anti-join — the exact complement of the
    * audit's deleted set). */
  def purge(df: DataFrame, matchKey: String, keys: DataFrame,
            keyCol: String): DataFrame =
    df.join(keys.select(col(keyCol).as("__k")).distinct(),
      df(matchKey) === col("__k"), "left_anti")
}
