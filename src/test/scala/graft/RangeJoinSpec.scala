package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Bucketed range join: equivalence to the naive theta join, and the
  * plan stays an equi-join (no nested-loop/cartesian explosion). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def facts = (0L until 2000L).map(i => (i, (i * 37) % 1000))
    .toDF("fact_id", "p")
  private def intervals = (0L until 50L)
    .map(i => (i, i * 19 % 900, i * 19 % 900 + (i % 5) * 13 + 1))
    .toDF("interval_id", "lo", "hi")

  test("bucketed result equals the naive theta join, across bucket widths") {
    val naive = facts.join(intervals,
        col("p") >= col("lo") && col("p") < col("hi"))
      .select("fact_id", "interval_id").orderBy("fact_id", "interval_id")
    for (width <- Seq(1L, 7L, 64L, 1024L)) {
      val bucketed = RangeJoin.pointInInterval(facts, intervals,
          "p", "lo", "hi", bucketWidth = width)
        .select("fact_id", "interval_id").orderBy("fact_id", "interval_id")
      withClue(s"bucketWidth=$width") { rows(bucketed) shouldBe rows(naive) }
    }
  }

  private def intervalsB = (0L until 40L)
    .map(i => (i, i * 23 % 800, i * 23 % 800 + (i % 7) * 11 + 2))
    .toDF("b_id", "b_lo", "b_hi")

  test("intervalOverlap equals the naive theta join, each pair exactly once") {
    // exact multiset equality vs the naive join proves both coverage
    // AND that the first-shared-bucket dedup emits no pair twice
    val naive = intervals.join(intervalsB,
        col("lo") < col("b_hi") && col("b_lo") < col("hi"))
      .select("interval_id", "b_id").orderBy("interval_id", "b_id")
    for (width <- Seq(1L, 13L, 256L)) {
      val got = RangeJoin.intervalOverlap(intervals, intervalsB,
          "lo", "hi", "b_lo", "b_hi", bucketWidth = width)
        .select("interval_id", "b_id").orderBy("interval_id", "b_id")
      withClue(s"bucketWidth=$width") { rows(got) shouldBe rows(naive) }
    }
  }

  test("plan shape: equi-join on the bucket, no nested loop over the fact side") {
    val plan = RangeJoin.pointInInterval(facts, intervals, "p", "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    // the join keys on __bucket (hash or broadcast-hash equi-join);
    // only the residual bounds check remains as a filter condition
    (plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin")) shouldBe true
    // the naive formulation, by contrast, nested-loops
    val naivePlan = facts.join(intervals,
        col("p") >= col("lo") && col("p") < col("hi"))
      .queryExecution.executedPlan.toString
    naivePlan should include("NestedLoop")
  }
}
