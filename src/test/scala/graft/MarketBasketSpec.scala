package graft

import graft.operators.MarketBasket
import org.apache.spark.sql.functions._

class MarketBasketSpec extends SparkSpec {
  import spark.implicits._

  private def baskets = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"))
    .toDF("basket", "item")

  test("support, confidence and lift from exact counts") {
    val got = MarketBasket.pairRules(baskets, "basket", "item")
      .orderBy("antecedent", "consequent")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    // n=3 baskets; n_a=3 n_b=2 n_c=1; pairs ab:2 ac:1 bc:1
    got.toSeq shouldBe Seq(
      ("a", "b", 2L, 2.0 / 3.0, 2.0 / 3.0, 1.0),
      ("a", "c", 1L, 1.0 / 3.0, 1.0 / 3.0, 1.0),
      ("b", "a", 2L, 2.0 / 3.0, 1.0, 1.0),
      ("b", "c", 1L, 1.0 / 3.0, 0.5, 1.5),
      ("c", "a", 1L, 1.0 / 3.0, 1.0, 1.0),
      ("c", "b", 1L, 1.0 / 3.0, 1.0, 1.5))
  }

  test("duplicate items in a basket count once; NULLs drop; prune applies") {
    val messy = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("a")), (Some(1L), Some("b")),
      (Some(2L), Some("a")), (Some(2L), Some("b")),
      (None, Some("a")), (Some(3L), None))
      .toDF("basket", "item")
    val rules = MarketBasket.pairRules(messy, "basket", "item",
      minPairCount = 2)
    val got = rules.orderBy("antecedent")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    got.toSeq shouldBe Seq(("a", "b", 2L), ("b", "a", 2L))
    // support denominator counts baskets with ≥1 valid item: basket 3
    // carried only a NULL item, so n_baskets = 2 here
    rules.filter(col("antecedent") === "a")
      .select("support").as[Double].head() shouldBe 1.0
    an[IllegalArgumentException] should be thrownBy
      MarketBasket.pairRules(messy, "basket", "item", 0)
  }

  test("rules are partitioning-invariant") {
    val big = (1 to 500).flatMap(b =>
      (0 until (b % 4) + 1).map(i => (b.toLong, s"i${(b + i) % 7}")))
      .toDF("basket", "item")
    def run(df: org.apache.spark.sql.DataFrame) =
      rows(MarketBasket.pairRules(df, "basket", "item", 2)
        .orderBy("antecedent", "consequent"))
    run(big.repartition(11)) shouldBe run(big.coalesce(1))
  }
}
