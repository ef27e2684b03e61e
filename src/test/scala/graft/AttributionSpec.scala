package graft

import graft.operators.Attribution
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private val HourUs = 3600000000L

  /** (event_id, ts-micros, user, type, value) → events frame with a
    * TIMESTAMP_NTZ ts (the shape the parquet tables read as). */
  private def ev(rows: (Long, Long, Long, String, Double)*): DataFrame =
    rows.toSeq.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .drop("us")

  private val touches = Seq("click", "view")

  test("linear: each touch in the lookback gets value/n; credits conserve") {
    val e = ev(
      (1L, 1000L * HourUs, 7L, "view", 0.0),
      (2L, 1001L * HourUs, 7L, "click", 0.0),
      (3L, 1002L * HourUs, 7L, "view", 0.0),
      (4L, 1003L * HourUs, 7L, "purchase", 90.0),
      // second user: one touch, one conversion
      (5L, 1001L * HourUs, 8L, "click", 0.0),
      (6L, 1002L * HourUs, 8L, "purchase", 10.0))
    val c = Attribution.linearCredit(e, touches, "purchase", 24L * HourUs)
    val byConv = c.groupBy("conv_id").agg(
      sum("credit").as("total"), count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    byConv(4L) shouldBe ((90.0, 3L))
    byConv(6L) shouldBe ((10.0, 1L))
    // every touch of conv 4 got exactly 30
    c.filter(col("conv_id") === 4L).select("credit").as[Double]
      .collect().toSeq shouldBe Seq(30.0, 30.0, 30.0)
  }

  test("position: U-shape weights for n=1,2,3,5") {
    def mk(n: Int): DataFrame = {
      val ts = (1 to n).map(i =>
        (i.toLong, (1000L + i) * HourUs, 1L, "click", 0.0))
      ev(ts :+ ((99L, 1010L * HourUs, 1L, "purchase", 100.0)): _*)
    }
    def weights(n: Int): Seq[Double] =
      Attribution.positionCredit(mk(n), touches, "purchase", 24L * HourUs)
        .orderBy("touch_rank").select("credit").as[Double].collect().toSeq
    weights(1) shouldBe Seq(100.0)
    weights(2) shouldBe Seq(50.0, 50.0)
    weights(3) shouldBe Seq(40.0, 20.0, 40.0)
    weights(5) shouldBe Seq(40.0, 100.0 * 0.2 / 3, 100.0 * 0.2 / 3,
      100.0 * 0.2 / 3, 40.0)
    // credits conserve for every n
    (1 to 5).foreach { n =>
      weights(n).sum shouldBe (100.0 +- 1e-9)
    }
  }

  test("window boundaries: [conv-L, conv) — at-lookback in, at-conv out") {
    val L = 24L * HourUs
    val conv = 2000L * HourUs
    val e = ev(
      (1L, conv - L, 1L, "click", 0.0),      // exactly lookback ago: IN
      (2L, conv - L - 1L, 1L, "click", 0.0), // one µs earlier: OUT
      (3L, conv, 1L, "view", 0.0),           // same instant: OUT
      (4L, conv - 1L, 1L, "view", 0.0),      // one µs before: IN
      (9L, conv, 1L, "purchase", 8.0))
    val got = Attribution.touchPairs(e, touches, "purchase", L)
      .select("touch_id").as[Long].collect().toSeq.sorted
    got shouldBe Seq(1L, 4L)
  }

  test("conversions near a bucket edge still see prior-bucket touches") {
    val L = 24L * HourUs
    // conversion 1µs into bucket k; touch sits late in bucket k-1
    val conv = 48L * HourUs + 1L
    val e = ev(
      (1L, conv - 2L, 1L, "click", 0.0),
      (9L, conv, 1L, "purchase", 5.0))
    Attribution.linearCredit(e, touches, "purchase", L)
      .select("credit").as[Double].collect().toSeq shouldBe Seq(5.0)
  }

  test("touches never cross users") {
    val e = ev(
      (1L, 1000L * HourUs, 1L, "click", 0.0),
      (2L, 1001L * HourUs, 2L, "purchase", 50.0))
    Attribution.touchPairs(e, touches, "purchase", 24L * HourUs)
      .count() shouldBe 0L
  }

  test("results are partitioning-invariant") {
    val base = (1 to 400).map { i =>
      val typ = Seq("view", "click", "purchase", "error")(i % 4)
      (i.toLong, (1000L + i % 97) * HourUs, (i % 5).toLong, typ,
        if (typ == "purchase") i.toDouble else 0.0)
    }
    val e = ev(base: _*)
    def run(df: DataFrame): Seq[Seq[Any]] =
      rows(Attribution.positionCredit(df, touches, "purchase", 24L * HourUs)
        .orderBy("conv_id", "touch_rank")
        .select("conv_id", "touch_id", "credit"))
    run(e.repartition(13)) shouldBe run(e.coalesce(1))
  }

  test("LTZ timestamps work; non-timestamp ts is refused") {
    val e = ev((1L, 1000L * HourUs, 1L, "click", 0.0),
      (2L, 1001L * HourUs, 1L, "purchase", 3.0))
      .withColumn("ts", col("ts").cast("timestamp"))
    Attribution.linearCredit(e, touches, "purchase", 24L * HourUs)
      .select("credit").as[Double].collect().toSeq shouldBe Seq(3.0)
    val bad = e.withColumn("ts", col("ts").cast("date"))
    an[IllegalArgumentException] should be thrownBy
      Attribution.touchPairs(bad, touches, "purchase", 24L * HourUs)
  }
}
