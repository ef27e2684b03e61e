package graft

import graft.operators.RecordLinkage
import graft.operators.RecordLinkage.Field
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  test("score sums per-field agreement/disagreement weights") {
    val pairs = Seq(
      (1L, 2L, true, true),   // both agree: 3.0 + 1.0
      (1L, 3L, true, false),  // 3.0 - 0.25
      (1L, 4L, false, false)) // -2.0 - 0.25
      .toDF("id_a", "id_b", "name_eq", "city_eq")
    val got = RecordLinkage.score(pairs, Seq(
        Field("name", col("name_eq"), 3.0, -2.0),
        Field("city", col("city_eq"), 1.0, -0.25)))
      .orderBy("id_b").select("w_name", "w_city", "score")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    got.toSeq shouldBe Seq((3.0, 1.0, 4.0), (3.0, -0.25, 2.75),
      (-2.0, -0.25, -2.25))
  }

  test("NULL agreement contributes zero (no-information convention)") {
    val pairs = Seq((1L, Some(true)), (2L, None))
      .toDF("id", "eq")
    val got = RecordLinkage.score(pairs, Seq(Field("f", col("eq"), 5.0, -5.0)))
      .orderBy("id").select("score").as[Double].collect().toSeq
    got shouldBe Seq(5.0, 0.0)
  }

  test("wiring errors are refused") {
    val pairs = Seq((1L, true)).toDF("id", "eq")
    an[IllegalArgumentException] should be thrownBy
      RecordLinkage.score(pairs, Nil)
    an[IllegalArgumentException] should be thrownBy
      RecordLinkage.score(pairs, Seq(Field("f", col("eq"), 1.0, -1.0),
        Field("f", col("eq"), 2.0, -2.0)))
    an[IllegalArgumentException] should be thrownBy
      Field("f", col("eq"), Double.NaN, 0.0)
    an[IllegalArgumentException] should be thrownBy
      Field("f", col("eq"), 0.0, Double.PositiveInfinity)
  }

  test("estimateU is the exact distinct-pair agreement probability") {
    // values a,a,a,b,b,c → Σ n(n−1) = 6+2+0 = 8 over N(N−1) = 30
    val recs = Seq("a", "a", "a", "b", "b", "c").toDF("v")
    RecordLinkage.estimateU(recs, "v") shouldBe (8.0 / 30.0)
    // NULLs are excluded from both numerator and denominator
    val withNulls = Seq(Some("a"), Some("a"), None, None).toDF("v")
    RecordLinkage.estimateU(withNulls, "v") shouldBe 1.0
    // degenerate inputs
    RecordLinkage.estimateU(recs.limit(0), "v") shouldBe 0.0
    RecordLinkage.estimateU(Seq("x").toDF("v"), "v") shouldBe 0.0
  }

  test("estimateU is partitioning-invariant") {
    val recs = (1 to 1000).map(i => s"v${i % 37}").toDF("v")
    RecordLinkage.estimateU(recs.repartition(13), "v") shouldBe
      RecordLinkage.estimateU(recs.coalesce(1), "v")
  }
}
