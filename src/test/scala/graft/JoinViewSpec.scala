package graft

import graft.operators.JoinView
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private def aRows(ids: Range): DataFrame =
    ids.map(i => (i.toLong, s"a$i")).toDF("k", "a_val")
  private def bRows(ids: Range): DataFrame =
    ids.map(i => (i.toLong, i * 10.0)).toDF("k", "b_val")

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    rows(df.orderBy("k", "a_val", "b_val"))

  test("delta fold equals the one-shot join after every batch") {
    var st = JoinView.init(aRows(1 to 10), bRows(5 to 15), "k")
    canon(st.view) shouldBe canon(aRows(1 to 10).join(bRows(5 to 15), "k"))
    // batch 1: new as overlap old bs and vice versa
    st = JoinView.applyDelta(st, aRows(11 to 20), bRows(16 to 18), "k")
    canon(st.view) shouldBe canon(aRows(1 to 20).join(bRows(5 to 18), "k"))
    // batch 2: one-sided delta (empty ΔB)
    st = JoinView.applyDelta(st, aRows(21 to 25), bRows(5 until 5), "k")
    canon(st.view) shouldBe canon(aRows(1 to 25).join(bRows(5 to 18), "k"))
    // batch 3: empty ΔA, ΔB keys hitting EVERY a-generation so far
    st = JoinView.applyDelta(st, aRows(1 until 1), bRows(1 to 25), "k")
    canon(st.view) shouldBe canon(
      aRows(1 to 25).join(bRows(5 to 18).unionByName(bRows(1 to 25)), "k"))
  }

  test("duplicate join keys multiply correctly across delta folds") {
    // two a-rows and two b-rows on the same key, arriving in
    // different batches → 4 view rows, each pair exactly once
    val a1 = Seq((1L, "x")).toDF("k", "a_val")
    val a2 = Seq((1L, "y")).toDF("k", "a_val")
    val b1 = Seq((1L, 1.0)).toDF("k", "b_val")
    val b2 = Seq((1L, 2.0)).toDF("k", "b_val")
    var st = JoinView.init(a1, b1, "k")
    st = JoinView.applyDelta(st, a2, b2, "k")
    canon(st.view) shouldBe canon(a1.unionByName(a2)
      .join(b1.unionByName(b2), "k"))
    st.view.count() shouldBe 4L
  }

  test("colliding non-key columns are refused") {
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "y")).toDF("k", "v")
    an[IllegalArgumentException] should be thrownBy JoinView.init(a, b, "k")
    an[IllegalArgumentException] should be thrownBy
      JoinView.applyDelta(JoinView.init(a, Seq((1L, 2.0)).toDF("k", "w"), "k"),
        a.limit(0), b, "k")
  }

  test("bucketed persisted fold equals the one-shot join, snapshot side exchange-free") {
    val tbls = JoinView.Tables("jv_a", "jv_b", "jv_view")
    Seq(tbls.a, tbls.b, tbls.view).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    JoinView.initBucketed(aRows(1 to 10), bRows(5 to 15), "k", tbls,
      nBuckets = 4)
    JoinView.applyDeltaBucketed(spark, aRows(11 to 20), bRows(16 to 18),
      "k", tbls, nBuckets = 4)
    JoinView.applyDeltaBucketed(spark, aRows(21 to 25),
      bRows(5 until 5), "k", tbls, nBuckets = 4)
    val got = graft.sources.BucketedStore.read(spark, tbls.view)
    canon(got) shouldBe canon(aRows(1 to 25).join(bRows(5 to 18), "k"))

    // the NEXT fold's snapshot-side join must not exchange the
    // bucketed snapshot: with broadcast off, (delta ⋈ bucketed b)
    // shuffles EXACTLY the delta side into the bucket layout
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val delta = aRows(26 to 27)
      val plan = delta.join(
          graft.sources.BucketedStore.read(spark, tbls.b), "k")
        .queryExecution.executedPlan.toString
      "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    Seq(tbls.a, tbls.b, tbls.view).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
