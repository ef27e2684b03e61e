package graft

import graft.operators.{Drift, Skyline, TimeSeries, ValueGrid}
import org.apache.spark.sql.functions._

/** The value-grid window contract, ENFORCED: the three
  * single-partition-window operators refuse loud when the distinct
  * grid exceeds maxGrid (instead of wedging one task at scale), and
  * ValueGrid.quantize is the documented escape hatch that brings the
  * same call back under the bound. */
class ValueGridSpec extends SparkSpec {
  import spark.implicits._

  private def contins(n: Int) =
    spark.range(n).select(
      (col("id").cast("double") + lit(0.25)).as("v"),
      (col("id") % 2).cast("int").as("e"))

  test("ksStatistic refuses loud past maxGrid and passes under it") {
    val base = contins(50)
    val cur = contins(60)
    val err = intercept[IllegalArgumentException] {
      Drift.ksStatistic(base, cur, "v", maxGrid = 16).collect()
    }
    err.getMessage should include("ksStatistic")
    err.getMessage should include("quantize")
    // same data through the opt-in quantizer: each side's edges come
    // from its OWN min/max, so the joined grid is ≤ 8 + 8 ≤ 16
    val q = Drift.ksStatistic(ValueGrid.quantize(base, "v", 8),
      ValueGrid.quantize(cur, "v", 8), "v", maxGrid = 16).collect()
    q.length shouldBe 1
    q(0).getAs[Long]("n_base") shouldBe 50L
    q(0).getAs[Long]("n_cur") shouldBe 60L
  }

  test("kaplanMeier refuses loud past maxGrid; quantized path survives") {
    val df = contins(100).select(col("v").as("dur"), col("e"))
    val err = intercept[IllegalArgumentException] {
      TimeSeries.kaplanMeier(df, "dur", "e", maxGrid = 8).collect()
    }
    err.getMessage should include("kaplanMeier")
    val q = TimeSeries.kaplanMeier(
      ValueGrid.quantize(df, "dur", 8), "dur", "e", maxGrid = 8).collect()
    q.length should be <= 8
    // survival is still a valid KM curve: non-increasing in duration
    val surv = q.map(_.getAs[Double]("surv"))
    surv.zip(surv.tail).foreach { case (a, b) => b should be <= a }
  }

  test("frontier2d refuses loud past maxGrid; quantized path survives") {
    val pts = contins(64).select(col("v").as("x"),
      (lit(100.0) - col("v")).as("y"))
    val err = intercept[IllegalArgumentException] {
      Skyline.frontier2d(pts, "x", "y", maxGrid = 10).collect()
    }
    err.getMessage should include("frontier2d")
    val got = Skyline.frontier2d(
      ValueGrid.quantize(pts, "x", 10), "x", "y", maxGrid = 10)
    got.count() should be >= 1L
  }

  test("quantize: bounded grid of left edges, NULL/constant passthrough") {
    val df = spark.range(1000)
      .select((col("id").cast("double") / 3.0).as("v"))
    val q = ValueGrid.quantize(df, "v", 25)
    val grid = q.select("v").distinct().as[Double].collect().sorted
    grid.length should be <= 25
    // left edges: lo + k·step with lo = 0.0, step = (hi − lo)/25
    val step = (999.0 / 3.0) / 25
    grid.foreach { g =>
      val k = math.round(g / step)
      math.abs(g - k * step) should be < 1e-9
    }
    // row count and non-grid columns untouched
    q.count() shouldBe 1000L
    // NULLs pass through
    val withNull = df.withColumn("v",
      when(col("v") < 1.0, lit(null)).otherwise(col("v")))
    ValueGrid.quantize(withNull, "v", 10)
      .filter(col("v").isNull).count() shouldBe 3L
    // constant column comes back untouched (1-point grid already)
    val const = spark.range(5).select(lit(7.5).as("v"))
    ValueGrid.quantize(const, "v", 3)
      .select("v").distinct().as[Double].collect() shouldBe Array(7.5)
    // all-NULL column: no-op, no throw
    val allNull = spark.range(4).select(lit(null).cast("double").as("v"))
    ValueGrid.quantize(allNull, "v", 3).count() shouldBe 4L
  }

  test("quantize: non-finite values neither poison the grid nor vanish") {
    // r10 ADVICE: one NaN used to make hi (and so step) NaN, mapping
    // EVERY row to NaN. min/max are now finite-only; the specials pass
    // through like NULLs.
    val df = Seq(0.0, 1.0, 2.0, 3.0, 4.0, Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity).toDF("v")
    val q = ValueGrid.quantize(df, "v", 2).select("v").as[Double].collect()
    q.length shouldBe 8
    q.count(_.isNaN) shouldBe 1
    q.count(_ == Double.PositiveInfinity) shouldBe 1
    q.count(_ == Double.NegativeInfinity) shouldBe 1
    // finite rows bucket onto {0.0, 2.0} (lo = 0, hi = 4, step = 2;
    // the top edge clamps into the last bucket)
    q.filter(v => !v.isNaN && !v.isInfinite).toSet shouldBe Set(0.0, 2.0)
    // all-non-finite column: no finite values → untouched, no throw
    val allBad = Seq(Double.NaN, Double.PositiveInfinity).toDF("v")
    ValueGrid.quantize(allBad, "v", 3).count() shouldBe 2L
  }

  test("default maxGrid leaves the gate-scale callers untouched") {
    // the three operators with default bounds over small grids — the
    // exact call shape the gate queries use
    val base = Seq(1.0, 2.0, 2.0, 3.0).toDF("v")
    val cur = Seq(2.0, 3.0, 4.0).toDF("v")
    Drift.ksStatistic(base, cur, "v").count() shouldBe 1L
    val km = Seq((1L, 1), (2L, 0), (2L, 1), (5L, 1))
      .toDF("dur", "e")
    TimeSeries.kaplanMeier(km, "dur", "e").count() shouldBe 3L
    val pts = Seq((1.0, 5.0), (2.0, 3.0), (3.0, 4.0)).toDF("x", "y")
    Skyline.frontier2d(pts, "x", "y").count() shouldBe 2L
  }
}
