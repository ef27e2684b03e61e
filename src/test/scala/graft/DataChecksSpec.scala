package graft

import graft.operators.DataChecks
import graft.operators.DataChecks._
import org.apache.spark.sql.functions._

class DataChecksSpec extends SparkSpec {
  import spark.implicits._

  private def t = Seq(
    (1L, Some("a"), Some(10.0), "F"),
    (2L, Some("b"), Some(-5.0), "O"), // range violation
    (2L, Some("c"), Some(20.0), "X"), // dup key + bad status
    (3L, None, Some(30.0), "F"), // null name
    (4L, Some("e"), None, "O")) // null price: range/pred PASS
    .toDF("id", "name", "price", "status")

  test("every check kind counts its violations with stated NULL semantics") {
    val ref = Seq(1L, 2L, 4L).toDF("rid") // id 3 is an orphan
    val got = DataChecks.run(t, Seq(
      NotNull("name"),
      AcceptedValues("status", Seq("F", "O")),
      InRange("price", 0.0, 100.0),
      Predicate("price_not_tiny", col("price") > 1.0),
      Unique(Seq("id")),
      RefIntegrity("id", ref, "rid")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    got("not_null:name") shouldBe ((5L, 1L, false))
    got("accepted_values:status") shouldBe ((5L, 1L, false))
    got("in_range:price") shouldBe ((5L, 1L, false)) // NULL price passes
    // -5.0 > 1.0 is FALSE -> violation; NULL price -> passes
    got("predicate:price_not_tiny") shouldBe ((5L, 1L, false))
    got("unique:id") shouldBe ((5L, 1L, false)) // one surplus duplicate
    got("ref_integrity:id") shouldBe ((5L, 1L, false)) // id 3 orphaned
  }

  test("a clean table reports all-pass; scalar checks share one job") {
    val clean = Seq((1L, "x", 5.0), (2L, "y", 6.0)).toDF("id", "name", "price")
    val sc = spark.sparkContext
    sc.setJobGroup("dq-jobcount", "DataChecksSpec", false)
    val rep = try {
      val r = DataChecks.run(clean, Seq(
        NotNull("name"), NotNull("price"),
        InRange("price", 0.0, 10.0),
        AcceptedValues("name", Seq("x", "y")),
        Predicate("pos", col("price") > 0))).collect()
      // 5 scalar checks fold into ONE aggregation: job count stays
      // O(1) (AQE adds per-exchange materialization jobs), never
      // O(#checks) — a per-check scan would be 10+
      val jobs = sc.statusTracker.getJobIdsForGroup("dq-jobcount").length
      assert(jobs <= 6, s"scalar checks ran $jobs jobs")
      r
    } finally sc.clearJobGroup()
    rep.foreach { r =>
      r.getLong(2) shouldBe 0L
      r.getBoolean(3) shouldBe true
    }
  }

  test("an EMPTY table reports zero violations, all-pass (no NPE on NULL sums)") {
    val empty = t.filter(col("id") < 0L)
    val rep = DataChecks.run(empty, Seq(
      NotNull("name"), InRange("price", 0.0, 1.0),
      AcceptedValues("status", Seq("F")), Unique(Seq("id")),
      RefIntegrity("id", Seq(1L).toDF("rid"), "rid"))).collect()
    rep.length shouldBe 5
    rep.foreach { r =>
      r.getLong(1) shouldBe 0L
      r.getLong(2) shouldBe 0L
      r.getBoolean(3) shouldBe true
    }
  }

  test("NULL keys group for uniqueness; NULL FKs pass integrity; refusals") {
    val d = Seq((Some(1L), "a"), (None, "b"), (None, "c"))
      .toDF("id", "v")
    val got = DataChecks.run(d, Seq(Unique(Seq("id")))).collect().head
    got.getLong(2) shouldBe 1L // the two NULL keys collide like GROUP BY
    val ref = Seq(99L).toDF("rid")
    DataChecks.run(d, Seq(RefIntegrity("id", ref, "rid")))
      .collect().head.getLong(2) shouldBe 1L // only the non-NULL orphan
    intercept[IllegalArgumentException] {
      DataChecks.run(d, Nil)
    }
    intercept[IllegalArgumentException] {
      DataChecks.run(d, Seq(NotNull("id"), NotNull("id")))
    }
    intercept[IllegalArgumentException] { InRange("x", 5.0, 1.0) }
    intercept[IllegalArgumentException] { AcceptedValues("x", Nil) }
  }

  test("benfordAudit: exact digit extraction, full spine, hand χ² term") {
    import spark.implicits._
    // cents 100, 150, 250 → first digits 1, 1, 2; zero/negative/NULL
    // amounts have no first significant digit and are excluded
    val amounts = Seq(Some(100L), Some(150L), Some(250L), Some(0L),
      Some(-300L), None).toDF("cents")
    val got = DataChecks.benfordAudit(amounts, col("cents"))
      .collect()
    got.length shouldBe 9 // every digit present even at count 0
    got.map(_.getInt(0)) shouldBe (1 to 9).toArray
    got.map(_.getLong(1)) shouldBe
      Array(2L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    all(got.map(_.getLong(2))) shouldBe 3L
    // digit-1 row: p_exp = round(log10 2, 9), χ² term mirrors the
    // operator's exact double op order
    val p1 = BigDecimal(math.log10(2.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    got(0).getDouble(4) shouldBe p1
    val d = 2.0 - 3.0 * p1
    got(0).getDouble(5) shouldBe BigDecimal(d * d / (3.0 * p1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // expected proportions cover the digit space (Σ p_exp = 1)
    math.abs(got.map(_.getDouble(4)).sum - 1.0) should be < 1e-8
  }

  test("benfordAudit: conforming vs uniform data orders by χ²; invariant") {
    import spark.implicits._
    // Benford-ish: exponential spread 1..10^4
    val benf = (1 to 2000).map(i =>
      math.pow(10.0, i * 4.0 / 2000).toLong max 1L).toDF("cents")
    // uniform 5-digit amounts: first digits equidistributed
    val unif = (1 to 2000).map(i => 10000L + i * 45L).toDF("cents")
    def chi(df: org.apache.spark.sql.DataFrame): Double =
      DataChecks.benfordAudit(df, col("cents")).collect()
        .map(_.getDouble(5)).sum
    chi(benf) should be < chi(unif)
    val a = DataChecks.benfordAudit(benf.repartition(7), col("cents"))
    val b = DataChecks.benfordAudit(benf.coalesce(1), col("cents"))
    rows(a) shouldBe rows(b)
  }
}
