package graft

import graft.operators.Drift
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("numericPsi: identical snapshots → zero terms, decile-even baseline") {
    val base = (1 to 100).map(_.toDouble).toDF("v")
    val got = Drift.numericPsi(base, base, "v", buckets = 10).collect()
    got.length shouldBe 10
    got.foreach { r =>
      r.getAs[Long]("base_n") shouldBe 10L      // exact deciles of 1..100
      r.getAs[Long]("cur_n") shouldBe 10L
      r.getAs[Double]("psi_term") shouldBe 0.0
      r.getAs[Double]("base_rate") shouldBe 0.1
    }
    // band edges bracket correctly: bucket 0 unbounded below, 9 above
    got.head.getAs[Double]("lo").isNegInfinity shouldBe true
    got.last.getAs[Double]("hi").isPosInfinity shouldBe true
  }

  test("numericPsi: a shifted current lands mass in the top buckets") {
    val base = (1 to 100).map(_.toDouble).toDF("v")
    val cur = (61 to 160).map(_.toDouble).toDF("v")
    val got = Drift.numericPsi(base, cur, "v", buckets = 10)
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("cur_n"),
        r.getAs[Double]("psi_term"))).toSeq
    // edges at 10.9, 20.8, …, 90.1; cur = 61..160 → buckets 0-5 empty,
    // 6 holds 61..70.3 (10), 7 holds ..80.2 (10), 8 ..90.1 (10),
    // 9 the rest (70)
    got.map(_._2) shouldBe Seq(0L, 0L, 0L, 0L, 0L, 0L, 10L, 10L, 10L, 70L)
    // PSI total is large (major drift) and every term is finite
    val psi = got.map(_._3).sum
    psi should be > 0.25
    got.foreach { case (_, _, t) => t.isNaN shouldBe false }
    // vanished buckets carry the ε-smoothed positive term
    got.take(6).foreach { case (_, _, t) => t should be > 0.0 }
  }

  test("numericPsi: NULLs excluded; empty snapshot fails loud") {
    val base = Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), None)
      .toDF("v")
    val got = Drift.numericPsi(base, base, "v", buckets = 2).collect()
    got.map(_.getAs[Long]("base_n")).sum shouldBe 4L
    val empty = Seq.empty[Option[Double]].toDF("v")
    val e = intercept[IllegalArgumentException] {
      Drift.numericPsi(empty, base, "v")
    }
    e.getMessage should include("no non-NULL")
    val e2 = intercept[IllegalArgumentException] {
      Drift.numericPsi(base, empty, "v", buckets = 2)
    }
    e2.getMessage should include("non-empty snapshots")
  }

  test("categoricalPsi: vanished/novel/NULL categories profiled, not ±inf") {
    val base = Seq("en", "en", "en", "de", null.asInstanceOf[String])
      .toDF("lang")
    val cur = Seq("en", "en", "fr", "fr", null.asInstanceOf[String],
      null.asInstanceOf[String]).toDF("lang")
    val got = Drift.categoricalPsi(base, cur, "lang").collect()
    val byCat = got.map(r => Option(r.getAs[String]("category")) ->
      (r.getAs[Long]("base_n"), r.getAs[Long]("cur_n"),
        r.getAs[Double]("psi_term"))).toMap
    byCat.keySet shouldBe Set(None, Some("en"), Some("de"), Some("fr"))
    byCat(Some("de"))._1 shouldBe 1L   // vanished: base 1, cur 0
    byCat(Some("de"))._2 shouldBe 0L
    byCat(Some("fr"))._1 shouldBe 0L   // novel
    byCat(Some("fr"))._2 shouldBe 2L
    byCat(None)._1 shouldBe 1L         // NULL is a category
    byCat(None)._2 shouldBe 2L
    got.foreach { r =>
      val t = r.getAs[Double]("psi_term")
      t.isNaN shouldBe false
      t.isInfinite shouldBe false
      t should be >= 0.0 // every (p−q)·ln(p/q) term is non-negative
    }
    // vanished and novel categories contribute the LARGE terms
    byCat(Some("de"))._3 should be > 0.5
    byCat(Some("fr"))._3 should be > 0.5
    // ordering: NULL category first, then lexicographic
    got.head.isNullAt(0) shouldBe true
  }

  test("embeddingPsi: identical snapshots ~ zero; a planted cluster shift surfaces") {
    import graft.operators.Drift
    def emb(n: Int, hotFrac: Double) = {
      val rnd = new scala.util.Random(11)
      (0 until n).map { i =>
        // two planted directions; hotFrac of rows take direction 0
        val dir = if (i < (n * hotFrac).toInt) 0 else 1
        val v = Array.tabulate(16)(d =>
          (if (d % 2 == dir) 1.0f else 0.0f) +
            (rnd.nextFloat() - 0.5f) * 0.05f)
        (i.toLong, v)
      }.toDF("vec_id", "embedding")
    }
    val base = emb(400, 0.5)
    // same distribution → PSI ≈ 0 everywhere
    val same = Drift.embeddingPsi(base, emb(400, 0.5), "embedding",
      "vec_id", nCells = 4)
      .agg(sum(col("psi_term"))).collect().head.getDouble(0)
    same should be < 0.01
    // 50/50 → 90/10 cluster mix: total PSI is large
    val shifted = Drift.embeddingPsi(base, emb(400, 0.9), "embedding",
      "vec_id", nCells = 4)
      .agg(sum(col("psi_term"))).collect().head.getDouble(0)
    shifted should be > 0.2
    shifted should be > same * 10
  }

  test("drift plans scan each snapshot once and never join them row-to-row") {
    val base = (1 to 1000).map(i => (i.toLong, (i % 7).toString))
      .toDF("id", "cat")
    val cur = (1 to 1000).map(i => (i.toLong, (i % 5).toString))
      .toDF("id", "cat")
    val plan = Drift.categoricalPsi(base, cur, "cat")
      .queryExecution.optimizedPlan.toString
    // exactly ONE join: the category-cardinality full-outer between
    // the two COUNT aggregates (totals are injected literals, not a
    // subquery cross join) — the snapshots never meet row-to-row
    "(?i)\\bjoin\\b".r.findAllIn(plan).length shouldBe 1
    // and both join inputs are post-aggregation: the id column never
    // reaches a join (it is pruned at the scans)
    plan.split("\n").filter(_.toLowerCase.contains("join"))
      .foreach(l => l should not include "id#")
  }

  test("ksStatistic: exact D, location, and boundary cases") {
    import spark.implicits._
    def one(base: Seq[Double], cur: Seq[Double]) =
      Drift.ksStatistic(base.toDF("p"), cur.toDF("p"), "p").head()
    // hand case: base {1,2,3}, cur {3,4} → sup gap 2/3 at v=2
    val r = one(Seq(1, 2, 3), Seq(3, 4))
    (r.getLong(0), r.getLong(1)) shouldBe ((3L, 2L))
    r.getDouble(2) shouldBe (4.0 / 6.0)
    r.getDouble(3) shouldBe 2.0
    // identical distributions → D = 0
    one(Seq(1, 2, 2, 5), Seq(1, 2, 2, 5)).getDouble(2) shouldBe 0.0
    // disjoint supports → D = 1
    one(Seq(1, 2), Seq(10, 11)).getDouble(2) shouldBe 1.0
    // tie on the max gap → SMALLEST attaining value wins
    val t = one(Seq(1, 3), Seq(2, 4))
    t.getDouble(2) shouldBe 0.5
    t.getDouble(3) shouldBe 1.0
  }

  test("ksStatistic refuses an empty side instead of returning NaN") {
    import spark.implicits._
    val some = Seq(1.0, 2.0).toDF("p")
    val onlyNulls = Seq[Option[Double]](None, None).toDF("p")
    an[IllegalArgumentException] should be thrownBy
      Drift.ksStatistic(some, some.limit(0), "p")
    an[IllegalArgumentException] should be thrownBy
      Drift.ksStatistic(onlyNulls, some, "p")
  }

  test("ksStatistic ignores NULLs and is partitioning-invariant") {
    import spark.implicits._
    val base = Seq[Option[Double]](Some(1), None, Some(2), Some(3)).toDF("p")
    val cur = Seq[Option[Double]](Some(3), Some(4), None).toDF("p")
    val r = Drift.ksStatistic(base, cur, "p").head()
    (r.getLong(0), r.getLong(1), r.getDouble(2)) shouldBe ((3L, 2L, 4.0 / 6.0))
    val big = (1 to 5000).map(i => (i % 97).toDouble).toDF("p")
    val cur2 = (1 to 4000).map(i => (i % 89).toDouble).toDF("p")
    val a = Drift.ksStatistic(big.repartition(17), cur2.repartition(3), "p")
      .head()
    val b = Drift.ksStatistic(big.coalesce(1), cur2.coalesce(1), "p").head()
    a.toSeq shouldBe b.toSeq
  }

  test("jensenShannon: identical mix → 0; disjoint → ln 2; no smoothing") {
    import spark.implicits._
    val base = Seq("a", "a", "b", "b").toDF("c")
    val cur = Seq("a", "b").toDF("c")
    Drift.jensenShannon(base, cur, "c").collect()
      .map(_.getDouble(5)).sum shouldBe 0.0
    // disjoint supports: each side's category contributes
    // round(0.5·ln 2, 9); the total is ln 2 to rounding
    val terms = Drift.jensenShannon(Seq("a").toDF("c"),
      Seq("b").toDF("c"), "c").collect().map(_.getDouble(5))
    terms shouldBe Array.fill(2)(
      BigDecimal(0.5 * math.log(2.0))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // a vanished category gets a FINITE term without ε (unlike PSI)
    val t2 = Drift.jensenShannon(Seq("a", "a", "b").toDF("c"),
      Seq("a", "a", "a").toDF("c"), "c").collect()
    all(t2.map(_.getDouble(5))) should be >= 0.0
    every(t2.map(_.getDouble(5)).toSeq) should not be Double.PositiveInfinity
  }

  test("jensenShannon: NULL is a category; empty side refused; invariant") {
    import spark.implicits._
    val base = Seq(Some("a"), None, None).toDF("c")
    val cur = Seq(Some("a"), Some("a"), None).toDF("c")
    val got = Drift.jensenShannon(base, cur, "c").collect()
    got.length shouldBe 2
    got.head.isNullAt(0) shouldBe true // asc_nulls_first
    got.head.getLong(1) shouldBe 2L
    got.head.getLong(2) shouldBe 1L
    an[IllegalArgumentException] should be thrownBy
      Drift.jensenShannon(base.limit(0), cur, "c")
    val big = (1 to 3000).map(i => s"c${i % 11}").toDF("c")
    val cur2 = (1 to 2000).map(i => s"c${i % 7}").toDF("c")
    rows(Drift.jensenShannon(big.repartition(13), cur2.repartition(5),
      "c")) shouldBe
      rows(Drift.jensenShannon(big.coalesce(1), cur2.coalesce(1), "c"))
  }
}
