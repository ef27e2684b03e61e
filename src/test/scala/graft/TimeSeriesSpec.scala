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

  test("seasonalCountAnomalies: spike flagged against its cell, " +
      "zero-variance and single-instance cells excluded") {
    // series "a", season 0: 9 quiet instances with 2 events + one
    // spike instance with 20 events. mean≈3.8, the spike z ≈ +2.85.
    // season 1: constant counts (zero variance) must NOT divide by 0.
    // series "b": a single instance (n = 1) must be excluded.
    val rows0 =
      (0 until 9).flatMap(d => Seq.fill(2)(("a", 0L, d.toLong))) ++
        Seq.fill(20)(("a", 0L, 9L)) ++
        (0 until 10).flatMap(d => Seq.fill(3)(("a", 1L, d.toLong))) ++
        Seq.fill(5)(("b", 0L, 0L))
    val df = rows0.toDF("series", "season", "inst")
    val got = TimeSeries.seasonalCountAnomalies(df, Seq("series"),
        col("season"), col("inst"), minSigma = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    got.toSeq shouldBe Seq(("a", 0L, 9L, 20L)) // ONLY the spike
    // exact single-JVM z for the spike: counts 2×9 + 20
    val cnts = Seq.fill(9)(2L) :+ 20L
    val n = cnts.size; val sx = cnts.sum; val sxx = cnts.map(c => c * c).sum
    val z = (20L - sx.toDouble / n) /
      math.sqrt((sxx - sx.toDouble * sx / n) / (n - 1))
    val gotZ = TimeSeries.seasonalCountAnomalies(df, Seq("series"),
        col("season"), col("inst"), minSigma = 2.0)
      .collect().head.getDouble(4)
    gotZ shouldBe z
    // droughts are signed negative: flip the plant (one quiet instance
    // among spikes) and the flagged z goes negative
    val flipped = ((0 until 9).flatMap(d =>
      Seq.fill(20)(("a", 0L, d.toLong))) ++ Seq.fill(2)(("a", 0L, 9L)))
      .toDF("series", "season", "inst")
    val neg = TimeSeries.seasonalCountAnomalies(flipped, Seq("series"),
      col("season"), col("inst"), minSigma = 2.0).collect()
    neg.length shouldBe 1
    neg.head.getLong(2) shouldBe 9L
    neg.head.getDouble(4) should be < 0.0
  }

  test("cusum: argmax|S| locates a planted level shift; stable series stays near zero") {
    import spark.implicits._
    // 40 days at level 10, then 40 at level 30 — shift at day 40
    val shifted = (0 until 80).map(d =>
      ("a", d.toLong, if (d < 40) 10L else 30L)).toDF("series", "day", "n")
    val c = TimeSeries.cusum(shifted, Seq("series"), "day", "n")
    val peak = c.orderBy(col("abs_s").desc, col("day")).select("day")
      .head().getLong(0)
    peak shouldBe 39L // |S| peaks on the last pre-shift day
    // flat series: every prefix sums to exactly zero
    val flat = (0 until 50).map(d => ("b", d.toLong, 7L))
      .toDF("series", "day", "n")
    TimeSeries.cusum(flat, Seq("series"), "day", "n")
      .agg(max(abs(col("s")))).head().getDouble(0) shouldBe 0.0
    // partitioning invariance of the running float sum
    val a = TimeSeries.cusum(shifted.repartition(7), Seq("series"), "day", "n")
      .orderBy("day").select("s").collect().map(_.getDouble(0)).toSeq
    val b = TimeSeries.cusum(shifted.coalesce(1), Seq("series"), "day", "n")
      .orderBy("day").select("s").collect().map(_.getDouble(0)).toSeq
    a shouldBe b
    an[IllegalArgumentException] should be thrownBy
      TimeSeries.cusum(flat, Nil, "day", "n")
  }

  /** The operator's own arithmetic on a plain Scala list: 9-decimal
    * ln terms summed exactly, exp re-rounded to 9. */
  private def refKm(subjects: Seq[(Long, Long)]) = {
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byT = subjects.groupBy(_._1).toSeq.sortBy(_._1)
    var ls = BigDecimal(0)
    var dead = false
    byT.map { case (t, subs) =>
      val nRisk = subjects.count(_._1 >= t).toLong
      val d = subs.map(_._2).sum
      if (d == nRisk) dead = true
      else if (d > 0) ls += BigDecimal(r9(math.log(1.0 - d.toDouble / nRisk)))
      (t, nRisk, d, subs.size - d,
        d.toDouble / nRisk,
        if (dead) null else ls.toDouble: java.lang.Double,
        if (dead) 0.0 else r9(math.exp(ls.toDouble)))
    }
  }

  test("kaplanMeier matches the hand reference, censoring included") {
    import spark.implicits._
    val subs = Seq((1L, 1L), (2L, 0L), (3L, 1L), (3L, 1L), (4L, 0L))
    val got = TimeSeries.kaplanMeier(subs.toDF("dur", "ev"), "dur", "ev")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4),
        if (r.isNullAt(5)) null else r.getDouble(5): java.lang.Double,
        r.getDouble(6)))
    got.toSeq shouldBe refKm(subs)
    // the t=1 survival re-rounds to the exact product 0.8
    got(0)._7 shouldBe 0.8
    // risk sets shrink through both events and censorings
    got.map(_._2) shouldBe Array(5L, 4L, 3L, 1L)
  }

  test("kaplanMeier: hazard 1 zeroes survival from that time on") {
    import spark.implicits._
    val subs = Seq((1L, 1L), (2L, 1L), (2L, 1L))
    val got = TimeSeries.kaplanMeier(subs.toDF("dur", "ev"), "dur", "ev")
      .collect()
    got.map(_.getDouble(4)) shouldBe Array(1.0 / 3.0, 1.0)
    got(1).isNullAt(5) shouldBe true
    got(1).getDouble(6) shouldBe 0.0
    // all-censored cohort: flat S = 1
    val cens = TimeSeries.kaplanMeier(
      Seq((5L, 0L), (7L, 0L)).toDF("dur", "ev"), "dur", "ev").collect()
    cens.map(_.getDouble(6)) shouldBe Array(1.0, 1.0)
    cens.map(_.getDouble(4)) shouldBe Array(0.0, 0.0)
  }

  test("kaplanMeier excludes NULLs and is partitioning-invariant") {
    import spark.implicits._
    val dirty = Seq((Some(1L), Some(1L)), (None, Some(1L)),
      (Some(2L), None), (Some(2L), Some(0L))).toDF("dur", "ev")
    val got = TimeSeries.kaplanMeier(dirty, "dur", "ev").collect()
    got.map(_.getLong(1)) shouldBe Array(2L, 1L)
    val big = (1 to 2000).map(i => ((i % 40).toLong, (i % 3 == 0)
      .compareTo(false).toLong)).toDF("dur", "ev")
    rows(TimeSeries.kaplanMeier(big.repartition(9), "dur", "ev")) shouldBe
      rows(TimeSeries.kaplanMeier(big.coalesce(1), "dur", "ev"))
  }
}
