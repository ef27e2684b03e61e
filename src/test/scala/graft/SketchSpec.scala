package graft

import graft.functions.SketchFunctions
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters sketch: capture guarantee, undercount
  * bound, and the nominate-then-verify pattern's determinism. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish stream: token t_i appears ~N/i times, i = 1..100
  private def zipf = (1 to 100).flatMap(i => Seq.fill(1000 / i)(f"t_$i%03d"))
    .toDF("token")

  test("every item with frequency > N/(k+1) is captured; counts undercount by <= N/(k+1)") {
    val n = zipf.count()
    val k = 32
    val got = zipf.agg(SketchFunctions.frequentItems($"token", k).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.est_count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = zipf.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = n.toDouble / (k + 1)
    exact.filter(_._2 > bound).keys.foreach { hot =>
      withClue(s"$hot (freq ${exact(hot)}) missing") {
        got.contains(hot) shouldBe true
      }
    }
    got.foreach { case (item, est) =>
      est should be <= exact(item)
      (exact(item) - est).toDouble should be <= bound
    }
  }

  test("approx percentiles track exact within 1% relative error on orders") {
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    def p50(agg: String): Map[String, Double] =
      orders.groupBy("o_orderstatus")
        .agg(expr(agg).cast("double").as("p50"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = p50("percentile(o_totalprice, 0.5)")
    p50("approx_percentile(o_totalprice, 0.5, 10000)").foreach {
      case (k, approx) =>
        math.abs(approx - exact(k)) / exact(k) should be <= 0.01
    }
  }

  test("nominate-then-verify top-k is exact and partitioning-independent") {
    def topVia(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] = {
      val cands = df.agg(SketchFunctions.frequentItems($"token", 64).as("hh"))
        .select(explode($"hh").as("e")).select($"e.item".as("token"))
      df.join(broadcast(cands), Seq("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token").limit(5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    val expected = zipf.groupBy("token").count()
      .orderBy($"count".desc, $"token").limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    topVia(zipf) shouldBe expected
    topVia(zipf.repartition(17)) shouldBe expected // sketch state merges across partitions
  }

  test("count-min sketch: never undercounts, overcount within 2*eps*N") {
    val n = 2000
    val df = (1 to n).map(i => s"tok${i % 37}").toDF("tok")
    val eps = 0.001
    val skBytes = df
      .agg(count_min_sketch($"tok", lit(eps), lit(0.99), lit(42)).as("sk"))
      .head.getAs[Array[Byte]](0)
    val cm = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val exact = df.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (tok, c) =>
      val est = cm.estimateCount(tok)
      est should be >= c // CM can only overcount
      est should be <= c + math.ceil(2 * eps * n).toLong
    }
    // merge across partitionings is counter addition → deterministic
    val skBytes2 = df.repartition(17)
      .agg(count_min_sketch($"tok", lit(eps), lit(0.99), lit(42)).as("sk"))
      .head.getAs[Array[Byte]](0)
    val cm2 = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes2))
    exact.keys.foreach { tok =>
      cm2.estimateCount(tok) shouldBe cm.estimateCount(tok)
    }
  }
}
