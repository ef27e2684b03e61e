package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def large = (
    (1 to 900).map(i => (7L, s"hot$i")) ++ // one hot key: 90% of rows
      (1 to 100).map(i => (i.toLong + 100L, s"cold$i"))
    ).toDF("k", "payload")
  private def small = (Seq((7L, "seven")) ++
    (1 to 100).map(i => (i.toLong + 100L, s"dim$i"))).toDF("k", "dim")

  test("saltedJoin == plain join, row for row (inner and left)") {
    for (jt <- Seq("inner", "left")) {
      val plain = rows(large.join(small, Seq("k"), jt)
        .orderBy("k", "payload"))
      val salted = rows(SkewJoin.saltedJoin(large, small, Seq("k"),
        saltFactor = 8, joinType = jt).orderBy("k", "payload"))
      salted shouldBe plain
    }
    // left join keeps unmatched large rows exactly once
    val l2 = large.unionByName(Seq((999999L, "orphan")).toDF("k", "payload"))
    SkewJoin.saltedJoin(l2, small, Seq("k"), 8, "left")
      .filter(col("k") === 999999L).count() shouldBe 1L
  }

  test("the hot key's rows spread across factor shuffle shards") {
    val factor = 8
    // reproduce the internal salting and count distinct shards for the
    // hot key — a pure function of the rows, so assert directly
    val shards = large.filter(col("k") === 7L)
      .select(pmod(hash(col("k"), col("payload")), lit(factor))
        .cast("int").as("s"))
      .distinct().count()
    shards shouldBe factor.toLong // 900 varied rows hit all 8 shards
  }

  test("outer-duplication and column-collision hazards are refused") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(large, small, Seq("k"), 8, "full")
    }.getMessage should include("unmatched")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(large.withColumn("__salt", lit(1)), small, Seq("k"))
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(large, small, Nil)
    }
  }
}
