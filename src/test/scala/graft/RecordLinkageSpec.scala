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

  import RecordLinkage.{goldenRecord, MaxRule, MinRule, LongestRule, ModeRule}

  test("goldenRecord applies every rule with deterministic ties") {
    val recs = Seq(
      // cluster 1: mode tie between "x" and "y" → smallest ("x");
      // longest tie between "bbb" and "aaa" → smallest ("aaa")
      (1L, 10L, "bbb", 5.0, "x"), (1L, 12L, "aaa", 7.0, "y"),
      (1L, 11L, "cc", 6.0, "x"), (1L, 13L, "d", 4.0, "y"),
      // cluster 2: singleton
      (2L, 20L, "solo", 1.5, "z"))
      .toDF("cluster", "id", "name", "bal", "seg")
    val got = goldenRecord(recs, "cluster", Seq(
        "id" -> MinRule, "name" -> LongestRule,
        "bal" -> MaxRule, "seg" -> ModeRule))
      .orderBy("cluster").collect()
    got.map(_.toSeq) shouldBe Array(
      Seq(1L, 4L, 10L, "aaa", 7.0, "x"),
      Seq(2L, 1L, 20L, "solo", 1.5, "z"))
  }

  test("goldenRecord: NULLs never survive unless the field is all-NULL") {
    val recs = Seq(
      (1L, Some("ab"), Some("m")), (1L, None, None), (1L, Some("c"), None),
      (2L, None, None))
      .toDF("cluster", "name", "seg")
    val got = goldenRecord(recs, "cluster",
        Seq("name" -> LongestRule, "seg" -> ModeRule))
      .orderBy("cluster").collect()
    got.map(_.toSeq) shouldBe Array(
      Seq(1L, 3L, "ab", "m"),
      Seq(2L, 1L, null, null))
  }

  test("goldenRecord refuses bad wiring and is partitioning-invariant") {
    val recs = (1 to 500).map(i =>
      (i % 7L, i.toLong, s"n${i % 13}")).toDF("cluster", "id", "name")
    an[IllegalArgumentException] should be thrownBy
      goldenRecord(recs, "cluster", Nil)
    an[IllegalArgumentException] should be thrownBy
      goldenRecord(recs, "cluster",
        Seq("id" -> MinRule, "id" -> MaxRule))
    an[IllegalArgumentException] should be thrownBy
      goldenRecord(recs, "cluster", Seq("cluster" -> MinRule))
    val a = goldenRecord(recs.repartition(11), "cluster",
      Seq("id" -> MinRule, "name" -> ModeRule)).orderBy("cluster")
    val b = goldenRecord(recs.coalesce(1), "cluster",
      Seq("id" -> MinRule, "name" -> ModeRule)).orderBy("cluster")
    rows(a) shouldBe rows(b)
  }
}
