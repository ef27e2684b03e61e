package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Load-plan operators: the reference's full-replace and primary-key
  * upsert, re-expressed as declarative DataFrame plans.
  *
  * The reference implements its upsert as three SQL statements against
  * Redshift — UPDATE-join (stage values win), DELETE-anti, INSERT-
  * select (reference: src/Keboola/DbWriter/Writer/Redshift.php:155-209).
  * The net semantics (SURVEY §2.3 J3):
  *
  *   target' = stage ∪ (target ▷_pk stage)
  *
  * i.e. every target row whose PK appears in staging is replaced
  * wholesale by the staging row; staging rows with new PKs are
  * appended. No PK ⇒ plain append (Redshift.php:169 guard).
  *
  * Scale notes (100 TB posture):
  *  - `left_anti` is a single hash/sort-merge join keyed on the PK —
  *    one shuffle of each side at most. With AQE on, a small stage side
  *    is broadcast automatically and the target side never shuffles.
  *  - `unionByName` is shuffle-free (bag union of partitions).
  *  - No driver-side collection anywhere; the whole merge is one
  *    distributed plan that Catalyst can pushdown-prune into both scans.
  */
object Load {

  /** Add-column schema evolution for the incremental merge: extend
    * `target` with every column `stage` carries that it lacks,
    * NULL-filled at the stage's type — the commonest upstream drift (a
    * new nullable column appears in the feed) no longer forces a drop
    * and 100 TB reload. Pure column projection (no shuffle, no scan
    * cost beyond the merge itself). Caller gates WHETHER evolution is
    * allowed (engine flag + nullability check); this only performs it.
    * Removed/retyped columns pass through untouched so the merge union
    * still fails loudly on them. */
  def withStageColumns(target: DataFrame, stage: DataFrame): DataFrame =
    addedColumns(target, stage).foldLeft(target)((df, f) =>
      df.withColumn(f.name, lit(null).cast(f.dataType)))

  /** The columns `stage` carries that `target` lacks (case-insensitive
    * match, like the merge's own column resolution). ONE definition:
    * the engine's nullability guard and [[withStageColumns]]'s fill
    * must agree on what counts as "added", or a column could be filled
    * without being checked. */
  def addedColumns(target: DataFrame,
                   stage: DataFrame): Seq[org.apache.spark.sql.types.StructField] = {
    val have = target.columns.map(_.toLowerCase).toSet
    stage.schema.fields.filterNot(f => have(f.name.toLowerCase)).toSeq
  }

  /** Stage-wins primary-key merge (J1+J2+J3). */
  def upsert(target: DataFrame, stage: DataFrame, pk: Seq[String]): DataFrame =
    if (pk.isEmpty) target.unionByName(stage)
    else stage.unionByName(target.join(stage.select(pk.map(col): _*), pk, "left_anti"))

  /** Full load = drop + create + copy (reference:
    * RedshiftApplication.php:131-139) — in Spark the staged frame simply
    * replaces the target (`.mode("overwrite")` at the sink). Returned
    * as-is for composition. */
  def fullLoad(stage: DataFrame): DataFrame = stage

  /** J1 in isolation: rows of `target` whose PK matches a staging row,
    * with the staging values taken (the UPDATE-join's output,
    * reference: Writer/Redshift.php:169-190). */
  def updateJoin(target: DataFrame, stage: DataFrame, pk: Seq[String]): DataFrame =
    stage.join(target.select(pk.map(col): _*), pk, "left_semi")

  /** J2 in isolation: staging rows whose PK is NOT in target — the
    * "new rows" that the INSERT appends after the DELETE
    * (reference: Writer/Redshift.php:192-205). */
  def newRows(stage: DataFrame, target: DataFrame, pk: Seq[String]): DataFrame =
    stage.join(target.select(pk.map(col): _*), pk, "left_anti")

  /** Deterministic duplicate-PK resolution — the fix for the
    * reference's documented nondeterminism (its UPDATE…FROM with
    * duplicate staged PKs is undefined; SURVEY §2.3 caveat). Keeps, per
    * PK, the first row by `orderCols` descending (e.g. latest
    * timestamp). One shuffle on the PK; window + filter stays inside
    * whole-stage codegen. */
  def dedupLastWins(df: DataFrame, pk: Seq[String],
                    orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
