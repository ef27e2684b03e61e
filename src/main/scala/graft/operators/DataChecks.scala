package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the dbt-test/expectations shape:
  * a load (or a curated corpus) ships with machine-checkable
  * assertions, and the report is data, not log lines.
  *
  * Scale shape: every SCALAR check (not-null, accepted-values, range,
  * custom predicate) is a conditional sum folded into ONE aggregation
  * over ONE scan of the table, regardless of how many such checks are
  * declared. Uniqueness adds one key-grouped aggregation per distinct
  * key set; referential integrity adds one anti-join per reference
  * (the ref side is usually dimension-sized — join strategy is left
  * to the planner). Nothing collects rows; the report is
  * check-cardinality-sized.
  *
  * Violation semantics (SQL conventions, stated so reports are
  * comparable across engines):
  *  - notNull: NULL values violate.
  *  - acceptedValues / inRange / predicate: NULL passes — declare a
  *    separate notNull check to refuse NULLs (mirrors SQL CHECK
  *    constraints, where NULL is not a violation).
  *  - unique: n_violations = n_rows − n_distinct_keys (the surplus
  *    duplicates); NULL keys group together like GROUP BY.
  *  - refIntegrity: non-NULL values absent from the reference column
  *    violate; NULL foreign keys pass (SQL FK semantics).
  */
object DataChecks {

  sealed trait Check { def name: String }
  final case class NotNull(column: String) extends Check {
    val name = s"not_null:$column"
  }
  final case class AcceptedValues(column: String, values: Seq[String])
      extends Check {
    require(values.nonEmpty, "acceptedValues needs a non-empty set")
    val name = s"accepted_values:$column"
  }
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Check {
    require(lo <= hi, s"inRange needs lo <= hi, got [$lo, $hi]")
    val name = s"in_range:$column"
  }
  /** Free-form row predicate; rows where it is FALSE violate (NULL
    * passes, per the CHECK-constraint convention). */
  final case class Predicate(label: String, expr: Column) extends Check {
    val name = s"predicate:$label"
  }
  final case class Unique(columns: Seq[String]) extends Check {
    require(columns.nonEmpty, "unique needs key columns")
    val name = s"unique:${columns.mkString(",")}"
  }
  final case class RefIntegrity(column: String, ref: DataFrame,
                                refColumn: String) extends Check {
    val name = s"ref_integrity:$column"
  }

  /** Assert-before-publish gate: run `checks` and throw LOUD on any
    * violation (no-op for an empty check list). The streaming sinks
    * call this on each micro-batch BEFORE any durable write — a
    * violating batch fails the stream with nothing published, so the
    * restart replays it against the unchanged state/marker machinery;
    * a clean batch pays the one-scan report cost and proceeds. */
  def assertPass(df: DataFrame, checks: Seq[Check],
                 context: String): Unit =
    if (checks.nonEmpty) {
      val failed = run(df, checks).filter(!col("passed"))
        .select(col("check"), col("n_violations")).collect()
      if (failed.nonEmpty)
        throw new graft.model.UserException(
          s"$context: data checks failed: " + failed
            .map(r => s"${r.get(0)} (${r.get(1)} violations)")
            .mkString("; "))
    }

  /** Run all checks; @return (check, n_rows, n_violations, passed),
    * one row per check, ordered by check name. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names — label predicates uniquely")
    val spark = df.sparkSession
    import spark.implicits._

    // ONE aggregation carries every scalar check
    val scalar = checks.collect {
      case c: NotNull =>
        c.name -> sum(when(col(c.column).isNull, 1L).otherwise(0L))
      case c: AcceptedValues =>
        c.name -> sum(when(col(c.column).isNotNull &&
          !col(c.column).isin(c.values: _*), 1L).otherwise(0L))
      case c: InRange =>
        c.name -> sum(when(col(c.column).isNotNull &&
          (col(c.column) < c.lo || col(c.column) > c.hi), 1L)
          .otherwise(0L))
      case c: Predicate =>
        // violation = predicate is definitively FALSE (NULL passes)
        c.name -> sum(when(not(coalesce(c.expr, lit(true))), 1L)
          .otherwise(0L))
    }
    val scalarReport: Seq[(String, Long, Long)] =
      if (scalar.isEmpty) Nil
      else {
        // coalesce: SUM over an EMPTY frame is NULL — a filter chain
        // that dropped every row must report 0 violations, not NPE
        val aggs = count(lit(1)).as("__n") +:
          scalar.map { case (n, c) => coalesce(c, lit(0L)).as(n) }
        val row = df.agg(aggs.head, aggs.tail: _*).collect().head
        val n = row.getLong(0)
        scalar.zipWithIndex.map { case ((name, _), i) =>
          (name, n, row.getLong(i + 1))
        }
      }
    // row count shared by the reference checks: reuse the scalar
    // aggregation's count when it ran; ONE extra count otherwise
    lazy val nRowsShared: Long =
      scalarReport.headOption.map(_._2).getOrElse(df.count())

    val grouped = checks.collect {
      case c: Unique =>
        val r = df.agg(count(lit(1)).as("n"),
          count_distinct(struct(c.columns.map(col): _*)).as("d"))
          .collect().head
        (c.name, r.getLong(0), r.getLong(0) - r.getLong(1))
      case c: RefIntegrity =>
        val present = df.filter(col(c.column).isNotNull)
          .select(col(c.column).as("__fk"))
        val orphans = present.join(
          c.ref.select(col(c.refColumn).as("__fk")).distinct(),
          Seq("__fk"), "left_anti").count()
        (c.name, nRowsShared, orphans)
    }

    (scalarReport ++ grouped)
      .map { case (n, rows, v) => (n, rows, v, v == 0L) }
      .toDF("check", "n_rows", "n_violations", "passed")
      .orderBy("check")
  }

  /** Benford first-digit audit — the classic fabricated-amounts
    * screen: naturally occurring amounts spread across orders of
    * magnitude put digit d first with probability log10(1 + 1/d);
    * invented figures don't. `units` must be an EXACT positive
    * integer amount (money as cents — convert upstream via a
    * DECIMAL(p,2)·100 cast, never via double string formatting):
    * the first significant digit then falls out of INTEGER string
    * formatting, which is identical on every engine, where a double's
    * log10/format would wobble in the last ulp at decade boundaries.
    * Non-positive and NULL units are excluded (they have no first
    * significant digit).
    *
    * One partial-aggregated groupBy over the scan, a 9-row digit
    * spine join, and a 9-row window for the total. Output one row
    * per digit 1..9: (digit, n, n_total, p_obs, p_exp, chi_term)
    * with p_exp = round(log10(1+1/d), 9) and chi_term =
    * round((n − N·p_exp)² / (N·p_exp), 6) — Σ chi_term is the
    * χ² statistic (8 degrees of freedom). An EMPTY input yields NaN
    * rates (0/0), not an error — gate with a row-count check first. */
  def benfordAudit(df: DataFrame, units: Column): DataFrame = {
    val counts = df.select(units.cast("long").as("c"))
      .filter(col("c") > 0)
      .select(substring(col("c").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val spine = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    spine.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("n_total", sum(col("n")).over(w))
      .withColumn("p_exp",
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 9))
      .select(col("digit"), col("n"), col("n_total"),
        (col("n").cast("double") / col("n_total").cast("double"))
          .as("p_obs"),
        col("p_exp"),
        round(
          (col("n").cast("double") -
            col("n_total").cast("double") * col("p_exp")) *
            (col("n").cast("double") -
              col("n_total").cast("double") * col("p_exp")) /
            (col("n_total").cast("double") * col("p_exp")), 6)
          .as("chi_term"))
      .orderBy("digit")
  }
}
