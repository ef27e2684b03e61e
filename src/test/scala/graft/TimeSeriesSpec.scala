package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

/** Linear gap interpolation: exact arithmetic on planted series,
  * boundary extension, and partitioning invariance. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def filled(df: org.apache.spark.sql.DataFrame) =
    rows(TimeSeries.interpolateLinear(df, Seq("k"), "t", "v")
      .select(col("k"), col("t"), col("value_filled"))
      .orderBy("k", "t"))

  test("interior gaps interpolate on the TIME axis, not row position") {
    // gap between t=10 (v=1) and t=40 (v=7): t=20 is 1/3 of the way
    // -> 3.0, t=30 is 2/3 -> 5.0 — row-position interpolation would
    // give 3.0/5.0 too here, so add an UNEVEN axis: gap t=100 (v=0)
    // to t=400 (v=3) observed at t=130 -> 0.3, not 1.5
    val df = Seq(
      ("a", 10L, Some(1.0)), ("a", 20L, None), ("a", 30L, None),
      ("a", 40L, Some(7.0)),
      ("b", 100L, Some(0.0)), ("b", 130L, None), ("b", 400L, Some(3.0)))
      .toDF("k", "t", "v")
    filled(df) shouldBe Seq(
      Seq("a", 10L, 1.0), Seq("a", 20L, 3.0), Seq("a", 30L, 5.0),
      Seq("a", 40L, 7.0),
      Seq("b", 100L, 0.0), Seq("b", 130L, 0.3), Seq("b", 400L, 3.0))
  }

  test("boundary gaps extend the nearest observation; all-NULL stays NULL") {
    val df = Seq(
      ("a", 1L, None), ("a", 2L, Some(5.0)), ("a", 3L, None),
      ("n", 1L, None), ("n", 2L, None))
      .toDF("k", "t", "v")
    filled(df) shouldBe Seq(
      Seq("a", 1L, 5.0), Seq("a", 2L, 5.0), Seq("a", 3L, 5.0),
      Seq("n", 1L, null), Seq("n", 2L, null))
  }

  test("non-NULL rows pass through; repartition invariance") {
    val df = (0 until 500).map { i =>
      val k = s"k${i % 7}"
      val v = if (i % 5 == 0) None else Some(i * 0.25)
      (k, i.toLong * 13, v)
    }.toDF("k", "t", "v")
    val a = filled(df)
    // every non-NULL input survives unchanged
    a.count(_(2) != null) shouldBe 500
    df.collect().foreach { r =>
      if (!r.isNullAt(2)) {
        val got = a.find(x => x(0) == r.getString(0) && x(1) == r.getLong(1)).get
        got(2) shouldBe r.getDouble(2)
      }
    }
    filled(df.repartition(11)) shouldBe a
  }

  test("tie-break columns order same-instant rows deterministically") {
    val df = Seq(("a", 10L, 1L, Some(1.0)), ("a", 10L, 2L, None),
      ("a", 10L, 3L, Some(3.0))).toDF("k", "t", "id", "v")
    val got = rows(TimeSeries.interpolateLinear(df, Seq("k"), "t", "v",
        orderCols = Seq("id"))
      .select(col("id"), col("value_filled")).orderBy("id"))
    // same-instant gap: (t - prev_t) = 0 -> exactly the previous value
    got shouldBe Seq(Seq(1L, 1.0), Seq(2L, 1.0), Seq(3L, 3.0))
  }
}
