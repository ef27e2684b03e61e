package graft

import graft.operators.RankingEval
import org.apache.spark.sql.functions._

class RankingEvalSpec extends SparkSpec {
  import spark.implicits._

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)
  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("binary relevance: hand-checked precision/recall/MRR/nDCG") {
    // query 1: results ranked [d1, d2, d3], relevant = {d2, d3, d9}
    val results = Seq((1L, "d1", 1), (1L, "d2", 2), (1L, "d3", 3))
      .toDF("q", "doc", "rnk")
    val judg = Seq((1L, "d2", 1.0), (1L, "d3", 1.0), (1L, "d9", 1.0))
      .toDF("q", "doc", "rel")
    val row = RankingEval.evaluate(results, "q", "doc", "rnk",
      judg, "rel", k = 3).head()
    row.getLong(1) shouldBe 3L                 // n_results
    row.getLong(2) shouldBe 3L                 // n_rel
    row.getLong(3) shouldBe 2L                 // hits
    row.getDouble(4) shouldBe (2.0 / 3.0)      // precision@3
    row.getDouble(5) shouldBe (2.0 / 3.0)      // recall@3
    row.getDouble(6) shouldBe 0.5              // mrr: first rel at rank 2
    val dcg = r9(1.0 / log2(3.0)) + r9(1.0 / log2(4.0))
    val idcg = r9(1.0 / log2(2.0)) + r9(1.0 / log2(3.0)) + r9(1.0 / log2(4.0))
    row.getDouble(7) shouldBe (dcg +- 1e-12)
    row.getDouble(8) shouldBe (idcg +- 1e-12)
    row.getDouble(9) shouldBe (r9(dcg / idcg) +- 1e-12)
  }

  test("graded relevance: ideal ordering sorts by grade, ties on doc") {
    // grades 3,1,2 retrieved in reverse-ideal order
    val results = Seq((1L, "a", 1), (1L, "b", 2), (1L, "c", 3))
      .toDF("q", "doc", "rnk")
    val judg = Seq((1L, "a", 1.0), (1L, "b", 2.0), (1L, "c", 3.0))
      .toDF("q", "doc", "rel")
    val row = RankingEval.evaluate(results, "q", "doc", "rnk",
      judg, "rel", k = 3).head()
    val dcg = r9(1.0 / log2(2.0)) + r9(2.0 / log2(3.0)) + r9(3.0 / log2(4.0))
    val idcg = r9(3.0 / log2(2.0)) + r9(2.0 / log2(3.0)) + r9(1.0 / log2(4.0))
    row.getDouble(7) shouldBe (dcg +- 1e-12)
    row.getDouble(8) shouldBe (idcg +- 1e-12)
    row.getDouble(9) should be < 1.0
    // perfect ordering scores ndcg exactly 1
    val perfect = Seq((1L, "c", 1), (1L, "b", 2), (1L, "a", 3))
      .toDF("q", "doc", "rnk")
    RankingEval.evaluate(perfect, "q", "doc", "rnk", judg, "rel", 3)
      .head().getDouble(9) shouldBe 1.0
  }

  test("no judgments → zero metrics; ranks beyond k ignored; refusals") {
    val results = Seq((1L, "a", 1), (1L, "b", 7)).toDF("q", "doc", "rnk")
    val judg = Seq((1L, "b", 1.0), (2L, "x", 1.0)).toDF("q", "doc", "rel")
    val row = RankingEval.evaluate(results, "q", "doc", "rnk",
      judg, "rel", k = 5).head()
    // only rank-1 'a' is inside k: no hits, but n_rel counts judgments
    row.getLong(1) shouldBe 1L
    row.getLong(2) shouldBe 1L
    row.getLong(3) shouldBe 0L
    row.getDouble(6) shouldBe 0.0
    row.getDouble(9) shouldBe 0.0
    // zero/negative grades are dropped entirely
    val zeroJ = Seq((1L, "a", 0.0)).toDF("q", "doc", "rel")
    val r2 = RankingEval.evaluate(results, "q", "doc", "rnk",
      zeroJ, "rel", 5).head()
    r2.getLong(2) shouldBe 0L
    r2.getDouble(5) shouldBe 0.0
    an[IllegalArgumentException] should be thrownBy
      RankingEval.evaluate(results, "q", "doc", "rnk", judg, "rel", 0)
  }

  test("metrics are partitioning-invariant") {
    val results = (1 to 50).flatMap(q => (1 to 10).map(r =>
      (q.toLong, s"d${(q * r) % 23}", r))).toDF("q", "doc", "rnk")
    val judg = (1 to 50).flatMap(q => (0 until 5).map(i =>
      (q.toLong, s"d${(q + i) % 23}", 1.0 + i % 3))).toDF("q", "doc", "rel")
      .distinct()
    def run(r: org.apache.spark.sql.DataFrame,
            j: org.apache.spark.sql.DataFrame) =
      rows(RankingEval.evaluate(r, "q", "doc", "rnk", j, "rel", 10)
        .orderBy("q"))
    run(results.repartition(13), judg.repartition(7)) shouldBe
      run(results.coalesce(1), judg.coalesce(1))
  }
}
