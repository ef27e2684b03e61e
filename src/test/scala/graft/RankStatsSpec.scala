package graft

import graft.operators.RankStats
import org.apache.spark.sql.functions._

/** Rank statistics from grouped contingency cells: tie-averaged
  * doubled ranks, Spearman's rho, Mann-Whitney U, entropy profile —
  * pinned against hand-computed classical values and invariants. */
class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  test("doubledRanks emits 2x tie-averaged ranks over grouped counts") {
    // values 10,10,20,30,30,30 -> avg ranks 1.5, 3, 5 -> doubled 3, 6, 10
    val cells = Seq((10L, 2L), (20L, 1L), (30L, 3L)).toDF("v", "cnt")
    rows(RankStats.doubledRanks(cells, Nil, "v", "cnt")
      .select(col("v"), col("r2")).orderBy("v")) shouldBe Seq(
      Seq(10L, 3L), Seq(20L, 6L), Seq(30L, 10L))
  }

  test("spearman is +1 / -1 on perfectly monotone cells") {
    val up = Seq((1L, 1L, 5L), (2L, 2L, 3L), (3L, 3L, 7L))
      .toDF("x", "y", "cn")
    rows(RankStats.spearmanFromCells(up, Nil, "x", "y", "cn")
      .select(col("rho"))) shouldBe Seq(Seq(1.0))
    val down = Seq((1L, 9L, 5L), (2L, 5L, 3L), (3L, 1L, 7L))
      .toDF("x", "y", "cn")
    rows(RankStats.spearmanFromCells(down, Nil, "x", "y", "cn")
      .select(col("rho"))) shouldBe Seq(Seq(-1.0))
  }

  test("spearman matches the hand-computed tie-averaged value") {
    // pairs (1,2)(1,3)(2,2)(2,2)(3,1)(3,3)(4,1)(4,1)(4,2)(5,1):
    // classical tie-averaged Spearman = -0.662964403
    val pairs = Seq((1, 2), (1, 3), (2, 2), (2, 2), (3, 1), (3, 3),
      (4, 1), (4, 1), (4, 2), (5, 1))
    val cells = pairs.groupBy(identity).map { case ((x, y), g) =>
      (x.toLong, y.toLong, g.size.toLong) }.toSeq.toDF("x", "y", "cn")
    rows(RankStats.spearmanFromCells(cells, Nil, "x", "y", "cn")
      .select(col("n"), col("rho"))) shouldBe Seq(
      Seq(10L, -0.662964403))
  }

  test("mannWhitney matches the hand-computed tie-corrected z") {
    // A = 1,2,2,3,5  B = 2,4,4,5,6,7: R1 = 20.5, U1 = 5.5,
    // z = -1.758601469 (tie-corrected variance)
    val df = (Seq(1.0, 2.0, 2.0, 3.0, 5.0).map(("a", _)) ++
      Seq(2.0, 4.0, 4.0, 5.0, 6.0, 7.0).map(("b", _)))
      .toDF("grp", "value")
    rows(RankStats.mannWhitney(df, col("grp") === "a", "value")
      .select(col("n1"), col("n2"), col("u1"), col("r1_mean"),
        col("z"))) shouldBe Seq(
      Seq(5L, 6L, 5.5, 4.1, -1.758601469))
  }

  test("mannWhitney is antisymmetric in the group flag") {
    val df = (Seq(1.0, 2.0, 9.0).map(("a", _)) ++
      Seq(3.0, 4.0, 5.0, 6.0).map(("b", _))).toDF("grp", "value")
    val za = rows(RankStats.mannWhitney(df, col("grp") === "a", "value")
      .select(col("z"))).head.head.asInstanceOf[Double]
    val zb = rows(RankStats.mannWhitney(df, col("grp") === "b", "value")
      .select(col("z"))).head.head.asInstanceOf[Double]
    za shouldBe -zb
  }

  test("entropy is ln(k) on uniform cells, 0 on a point mass") {
    val df = (1 to 4).flatMap(c => Seq.fill(25)(("u", c.toLong))) ++
      Seq.fill(9)(("p", 1L))
    val out = rows(RankStats.entropyProfile(df.toDF("g", "c"),
      Seq("g"), "c").select(col("g"), col("k"), col("entropy"),
      col("norm_entropy")).orderBy("g"))
    out(0) shouldBe Seq("p", 1L, -0.0, 0.0)
    out(1)(1) shouldBe 4L
    (out(1)(2).asInstanceOf[Double] -
      math.log(4.0)).abs should be < 1e-8
    out(1)(3).asInstanceOf[Double] shouldBe 1.0 +- 1e-8
  }

  test("spearman is invariant to input partitioning") {
    val cells = Seq((1L, 4L, 3L), (2L, 2L, 5L), (3L, 4L, 2L),
      (4L, 1L, 7L), (5L, 2L, 1L)).toDF("x", "y", "cn")
    val a = rows(RankStats.spearmanFromCells(cells, Nil, "x", "y", "cn")
      .select(col("rho")))
    val b = rows(RankStats.spearmanFromCells(cells.repartition(7),
      Nil, "x", "y", "cn").select(col("rho")))
    a shouldBe b
  }
}
