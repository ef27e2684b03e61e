package graft

import graft.operators.Skyline
import org.apache.spark.sql.functions._

/** Strict-dominance 2D skyline: hand frontiers, tie/duplicate
  * semantics, NULL exclusion, partitioning invariance. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("frontier2d keeps exactly the non-dominated points") {
    // minimize both: (1,5) (2,3) (3,4)✗dominated-by-(2,3) (4,1)
    // (5,1)✗ strict-x dominated by (4,1), (2,6)✗
    val pts = Seq((1, 5, "a"), (2, 3, "b"), (3, 4, "c"), (4, 1, "d"),
      (5, 1, "e"), (2, 6, "f")).toDF("x", "y", "tag")
    val got = Skyline.frontier2d(pts, "x", "y")
      .select("tag").as[String].collect().sorted
    got shouldBe Array("a", "b", "d")
  }

  test("ties on both axes dominate neither way — duplicates survive") {
    val pts = Seq((1, 1, "p"), (1, 1, "q"), (2, 2, "r"))
      .toDF("x", "y", "tag")
    Skyline.frontier2d(pts, "x", "y")
      .select("tag").as[String].collect().sorted shouldBe Array("p", "q")
    // same x, worse y: dominated; same y, worse x: dominated
    val mixed = Seq((1, 1, "keep"), (1, 2, "worseY"), (2, 1, "worseX"))
      .toDF("x", "y", "tag")
    Skyline.frontier2d(mixed, "x", "y")
      .select("tag").as[String].collect() shouldBe Array("keep")
  }

  test("NULL objectives are excluded; all columns pass through") {
    val pts = Seq((Some(1), Some(5), "a"), (None, Some(0), "n1"),
      (Some(0), None, "n2"), (Some(2), Some(3), "b"))
      .toDF("x", "y", "tag")
    val got = Skyline.frontier2d(pts, "x", "y").orderBy("x").collect()
    got.map(_.getString(2)) shouldBe Array("a", "b")
    got.head.schema.fieldNames shouldBe Array("x", "y", "tag")
  }

  test("frontier2d is partitioning-invariant and handles monotone input") {
    val pts = (1 to 500).map(i => (i, 1000 - i, s"t$i")).toDF("x", "y", "tag")
    // strictly improving y as x grows: every point is on the frontier?
    // No — larger x is WORSE on x; but each has strictly better y than
    // every smaller x, so all survive
    Skyline.frontier2d(pts, "x", "y").count() shouldBe 500L
    val rand = (1 to 500).map(i => ((i * 7919) % 101, (i * 104729) % 97))
      .toDF("x", "y")
    val a = Skyline.frontier2d(rand.repartition(13), "x", "y")
      .orderBy("x", "y")
    val b = Skyline.frontier2d(rand.coalesce(1), "x", "y")
      .orderBy("x", "y")
    rows(a) shouldBe rows(b)
  }
}
