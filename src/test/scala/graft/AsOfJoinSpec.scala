package graft

import graft.operators.AsOfJoin
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)

  test("asOf picks the latest right row at-or-before each left time, per key") {
    val left = Seq(
      (1L, 1L, ts(10)),  // matches right at 5
      (2L, 1L, ts(20)),  // matches right at 20 (equal time counts)
      (3L, 1L, ts(3)),   // before any right → null
      (4L, 2L, ts(50))   // key 2: matches right at 30
    ).toDF("probe_id", "k", "t")
    val right = Seq(
      (1L, ts(5), 100.0), (1L, ts(20), 200.0), (1L, ts(25), 300.0),
      (2L, ts(30), 400.0)
    ).toDF("k", "t", "ref_value")

    val got = rows(AsOfJoin.asOf(left, right, Seq("k"), "t", "t",
      Seq("ref_value")).select("probe_id", "ref_value").orderBy("probe_id"))
    got shouldBe Seq(
      Seq(1L, 100.0), Seq(2L, 200.0), Seq(3L, null), Seq(4L, 400.0))
  }

  test("asOf forward picks the first right row at-or-after; nearest ties to backward") {
    val left = Seq(
      (1L, 1L, ts(10)), // forward → 20; nearest → 5 (5 away vs 10)
      (2L, 1L, ts(20)), // forward → 20 (equal time counts); nearest → 20
      (3L, 1L, ts(35)), // forward → null (after last); nearest → 30
      (4L, 1L, ts(25))  // equidistant 20 ↔ 30 → tie → backward (20)
    ).toDF("probe_id", "k", "t")
    val right = Seq(
      (1L, ts(5), 100.0), (1L, ts(20), 200.0), (1L, ts(30), 300.0)
    ).toDF("k", "t", "ref_value")

    val fwd = rows(AsOfJoin.asOf(left, right, Seq("k"), "t", "t",
      Seq("ref_value"), direction = "forward")
      .select("probe_id", "ref_value").orderBy("probe_id"))
    fwd shouldBe Seq(
      Seq(1L, 200.0), Seq(2L, 200.0), Seq(3L, null), Seq(4L, 300.0))

    val near = rows(AsOfJoin.asOf(left, right, Seq("k"), "t", "t",
      Seq("ref_value"), direction = "nearest")
      .select("probe_id", "ref_value").orderBy("probe_id"))
    near shouldBe Seq(
      Seq(1L, 100.0), Seq(2L, 200.0), Seq(3L, 300.0), Seq(4L, 200.0))
  }

  test("asOf tolerance nulls matches farther than the bound, keeps the rest") {
    val left = Seq(
      (1L, 1L, ts(10)), // backward match at 5 → exactly 5 min → kept
      (2L, 1L, ts(30)), // backward match at 20 → 10 min → nulled
      (3L, 1L, ts(3))   // no match at all → null either way
    ).toDF("probe_id", "k", "t")
    val right = Seq(
      (1L, ts(5), 100.0), (1L, ts(20), 200.0)
    ).toDF("k", "t", "ref_value")

    val got = rows(AsOfJoin.asOf(left, right, Seq("k"), "t", "t",
      Seq("ref_value"), tolerance = Some(5L * 60L * 1000000L))
      .select("probe_id", "ref_value").orderBy("probe_id"))
    got shouldBe Seq(Seq(1L, 100.0), Seq(2L, null), Seq(3L, null))
  }

  test("asOf nearest/tolerance work on TIMESTAMP_NTZ time columns") {
    // The driver testdata's events.ts is TIMESTAMP_NTZ; `unix_micros`
    // only accepts LTZ, so the distance arithmetic must reinterpret —
    // regression for the r5 gate failure (DATATYPE_MISMATCH on __t).
    import org.apache.spark.sql.functions.col
    def ntz(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("t", col("t").cast("timestamp_ntz"))
    val left = ntz(Seq(
      (1L, 1L, ts(10)), (2L, 1L, ts(25)), (3L, 1L, ts(35))
    ).toDF("probe_id", "k", "t"))
    val right = ntz(Seq(
      (1L, ts(5), 100.0), (1L, ts(20), 200.0), (1L, ts(30), 300.0)
    ).toDF("k", "t", "ref_value"))

    val near = rows(AsOfJoin.asOf(left, right, Seq("k"), "t", "t",
      Seq("ref_value"), direction = "nearest")
      .select("probe_id", "ref_value").orderBy("probe_id"))
    near shouldBe Seq(Seq(1L, 100.0), Seq(2L, 200.0), Seq(3L, 300.0))

    val tol = rows(AsOfJoin.asOf(left, right, Seq("k"), "t", "t",
      Seq("ref_value"), tolerance = Some(5L * 60L * 1000000L))
      .select("probe_id", "ref_value").orderBy("probe_id"))
    tol shouldBe Seq(Seq(1L, 100.0), Seq(2L, 200.0), Seq(3L, 300.0))
  }

  test("asOf is a single-shuffle plan (no range-join explosion)") {
    val left = Seq((1L, 1L, ts(1))).toDF("probe_id", "k", "t")
    val right = Seq((1L, ts(0), 1.0)).toDF("k", "t", "v")
    val df = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
    val plan = df.queryExecution.optimizedPlan.toString
    plan should not include "Join" // union + window only

    // `nearest` runs BOTH carries but they share the key partitioning:
    // still one exchange (two in-partition sorts), never a second
    // shuffle or a join
    val near = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"),
      direction = "nearest")
    near.queryExecution.optimizedPlan.toString should not include "Join"
    val explained = near.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    explained.split("\n").count(_.matches("\\(\\d+\\) Exchange.*")) shouldBe 1
  }

  test("approxDistinct sketch within 5% of exact on events") {
    val events = graft.queries.Tables(spark, "/root/testdata/sf0.01", "events")
    val exact = events.select("user_id").distinct().count()
    val approx = events
      .agg(graft.functions.SketchFunctions.approxDistinct($"user_id"))
      .collect().head.getLong(0)
    math.abs(approx - exact).toDouble / exact should be <= 0.05
  }

  test("approxDistinct is deterministic across repartitionings") {
    val events = graft.queries.Tables(spark, "/root/testdata/sf0.001", "events")
    def run(parts: Int) = events.repartition(parts)
      .agg(graft.functions.SketchFunctions.approxDistinct($"props"))
      .collect().head.getLong(0)
    run(2) shouldBe run(7)
  }
}
