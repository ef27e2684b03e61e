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

  test("quantile sketch: p50/p95/p99 within alpha relative error of exact, signed values and zeros included") {
    import graft.functions.QuantileFunctions
    val alpha = 0.01
    // signed, zero-crossing, 5-decades-of-magnitude stream — exercises
    // the mirrored negative store, the zero counter, and sub-1 buckets
    val vals = (1 to 4000).map { i =>
      val mag = math.pow(10.0, (i % 5) - 2) * (1.0 + (i % 97) / 97.0)
      if (i % 11 == 0) 0.0 else if (i % 3 == 0) -mag else mag
    }
    val df = vals.toDF("v")
    val exact = df.agg(
      expr("percentile(v, array(0.5, 0.95, 0.99))")).head
      .getSeq[Double](0)
    val est = df.agg(
        QuantileFunctions.quantileSketchState($"v", alpha).as("st"))
      .select(
        QuantileFunctions.quantileEstimate($"st", 0.5, alpha),
        QuantileFunctions.quantileEstimate($"st", 0.95, alpha),
        QuantileFunctions.quantileEstimate($"st", 0.99, alpha))
      .head
    Seq(0, 1, 2).foreach { i =>
      val (e, a) = (exact(i), est.getDouble(i))
      withClue(s"q=${Seq(0.5, 0.95, 0.99)(i)} exact=$e est=$a") {
        // DDSketch guarantee: the estimate is within alpha of SOME
        // value within rank-interpolation distance of the true
        // quantile; on continuous data that is |est-exact| <~ alpha*|exact|
        // (2x slack absorbs the rank convention difference)
        math.abs(a - e) should be <= 2 * alpha * math.abs(e)
      }
    }
  }

  test("quantile sketch: ±Infinity sorts at the extremes, NaN contributes nothing") {
    import graft.functions.QuantileFunctions
    // one upstream divide-by-zero among finite values: the infinity
    // must surface at the TAIL quantile, never alias into a finite
    // bucket near 1.0 (the idx<<1 overflow failure mode), and NaN
    // must act like NULL
    val df = Seq(100.0, 200.0, 300.0, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NaN).toDF("v")
    val st = df.agg(QuantileFunctions.quantileSketchState($"v").as("st"))
    val row = st.select(
      QuantileFunctions.quantileEstimate($"st", 0.0),
      QuantileFunctions.quantileEstimate($"st", 0.5),
      QuantileFunctions.quantileEstimate($"st", 1.0)).head
    row.getDouble(0) shouldBe Double.NegativeInfinity
    row.getDouble(1) should (be >= 190.0 and be <= 210.0) // NaN excluded: median of 5 values is 200
    row.getDouble(2) shouldBe Double.PositiveInfinity
    // all-NaN column = empty sketch = NULL estimate
    val onlyNaN = Seq(Double.NaN, Double.NaN).toDF("v")
      .agg(QuantileFunctions.quantileSketchState($"v").as("st"))
      .select(QuantileFunctions.quantileEstimate($"st", 0.5)).head
    onlyNaN.isNullAt(0) shouldBe true
    // the sentinel buckets survive the serialized-state combine
    val p1 = Seq(Double.PositiveInfinity).toDF("v")
      .agg(QuantileFunctions.quantileSketchState($"v").as("st"))
    val p2 = Seq(1.0, 2.0).toDF("v")
      .agg(QuantileFunctions.quantileSketchState($"v").as("st"))
    val merged = p1.unionByName(p2)
      .agg(QuantileFunctions.mergeQuantileStates($"st").as("st"))
      .select(QuantileFunctions.quantileEstimate($"st", 1.0)).head
    merged.getDouble(0) shouldBe Double.PositiveInfinity
  }

  test("quantile sketch refuses version-less legacy state bytes (possible aliased-Inf corruption)") {
    import graft.functions.QuantileFunctions
    // pre-v1 layout: [alphaBits][n][(key,count)...] with no version
    // header — such states may hold Inf counts overflowed into finite
    // buckets; merging them would perpetuate silent corruption
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(java.lang.Double.doubleToLongBits(0.01))
    out.writeInt(1)
    out.writeLong(100L); out.writeLong(5L)
    out.flush()
    val legacy = Seq(bos.toByteArray).toDF("st")
    val e = intercept[Exception] {
      legacy.agg(QuantileFunctions.mergeQuantileStates($"st")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    chain(e).exists(t => Option(t.getMessage)
      .exists(_.contains("state version"))) shouldBe true
  }

  test("quantile sketch state is byte-identical across partitionings and merge orders") {
    import graft.functions.QuantileFunctions
    val df = (1 to 2000).map(i => (i % 7, i, (i % 83) * 1.5 - 40.0))
      .toDF("k", "i", "v")
    def stateBytes(d: org.apache.spark.sql.DataFrame): Map[Int, Seq[Byte]] =
      d.groupBy("k")
        .agg(QuantileFunctions.quantileSketchState($"v").as("st"))
        .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq)
        .toMap
    val a = stateBytes(df)
    stateBytes(df.repartition(17)) shouldBe a // partitioning-independent
    // combine of partial states is order-independent: fold slices
    // 0,1,2 vs 2,1,0 through the serialized-state combine. Slice on
    // the row INDEX (every residue class is populated for every key —
    // asserted below, so the merge really does combine two non-empty
    // states in both orders; a value-derived predicate here was once
    // constant, making the assertion vacuous)
    def slice(i: Int) = df.filter(expr(s"pmod(i, 3) = $i"))
    (0 until 3).foreach { i =>
      slice(i).groupBy("k").count().count() shouldBe 7
    }
    def foldOrder(order: Seq[Int]): Map[Int, Seq[Byte]] = {
      val partials = order.map(i => slice(i).groupBy("k")
        .agg(QuantileFunctions.quantileSketchState($"v").as("st")))
      partials.reduce(_ unionByName _)
        .groupBy("k")
        .agg(QuantileFunctions.mergeQuantileStates($"st").as("st"))
        .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq)
        .toMap
    }
    foldOrder(Seq(0, 1, 2)) shouldBe foldOrder(Seq(2, 1, 0))
    // cross-alpha merge fails loud: bucket boundaries differ
    val partial = df.groupBy("k")
      .agg(QuantileFunctions.quantileSketchState($"v", 0.01).as("st"))
    val e = intercept[Exception] {
      partial.groupBy("k")
        .agg(QuantileFunctions.mergeQuantileStates($"st", 0.02).as("st"))
        .collect()
    }
    // the require fires inside a task; Spark may wrap it — search the
    // cause chain for the loud alpha-mismatch message
    Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" ") should
      include("alpha")
  }

  test("incremental rollup with trackQuantiles: fold equals one-shot within alpha; fold order cannot change a state byte") {
    import graft.operators.IncrementalAgg
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
    def slice(i: Int) = orders.filter($"o_orderkey" % 3 === i)
    def fold(order: Seq[Int]): org.apache.spark.sql.DataFrame =
      order.tail.foldLeft(
        IncrementalAgg.partialState(slice(order.head),
          Seq("o_orderpriority"), "o_totalprice", trackQuantiles = true))(
        (st, i) => IncrementalAgg.mergeState(st, slice(i),
          Seq("o_orderpriority"), "o_totalprice", trackQuantiles = true))
    val folded = fold(Seq(0, 1, 2))
    // persisted state bytes are fold-order-invariant
    def stBytes(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Byte]] =
      df.select($"o_orderpriority", $"agg_quantile").collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    stBytes(fold(Seq(2, 0, 1))) shouldBe stBytes(folded)
    // finalize estimates track the exact percentiles over ALL rows
    val got = IncrementalAgg.finalizeState(folded, Seq("o_orderpriority"))
      .select($"o_orderpriority", $"p50", $"p95", $"p99")
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = orders.groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, array(0.5, 0.95, 0.99))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    exact.foreach { case (k, es) =>
      es.zip(got(k)).foreach { case (e, a) =>
        withClue(s"key=$k exact=$e est=$a") {
          math.abs(a - e) should be <= 2 * 0.01 * math.abs(e)
        }
      }
    }
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

  // ---- KMV distinct sketch -----------------------------------------

  import graft.functions.KmvFunctions._

  test("KMV under-full is exact; state is partitioning-independent bytes") {
    val df = (1 to 300).map(i => s"v$i").toDF("v")
    val k = 512
    val sk1 = df.agg(kmvState($"v", k).as("sk")).head.getAs[Array[Byte]](0)
    val sk2 = df.repartition(17)
      .agg(kmvState($"v", k).as("sk")).head.getAs[Array[Byte]](0)
    sk1 shouldBe sk2 // set-union merge: order/partitioning invariant
    sk1.length shouldBe 300 * 8
    val est = df.agg(kmvState($"v", k).as("sk"))
      .select(kmvEstimate($"sk", k).as("e")).head.getDouble(0)
    est shouldBe 300.0
  }

  test("KMV over-full estimates within ~4/sqrt(k) relative error") {
    val n = 50000
    val k = 1024
    val df = (1 to n).map(i => s"item_$i").toDF("v")
    val est = df.agg(kmvState($"v", k).as("sk"))
      .select(kmvEstimate($"sk", k).as("e")).head.getDouble(0)
    val relErr = math.abs(est - n) / n
    withClue(s"est=$est") { relErr should be < 4.0 / math.sqrt(k.toDouble) }
  }

  test("KMV set estimates: exact under-full, bounded-error over-full") {
    val k = 2048
    // under-full: A = 1..300, B = 201..500 → inter 100, union 500
    val a = (1 to 300).map(i => s"x$i").toDF("v")
    val b = (201 to 500).map(i => s"x$i").toDF("v")
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.agg(kmvState($"v", k).as("sk"))
    val row = sk(a).crossJoin(sk(b).withColumnRenamed("sk", "sk_b"))
      .select(kmvSetEstimates($"sk", $"sk_b", k).as("e"))
      .select($"e.est_a", $"e.est_b", $"e.est_union",
        $"e.est_intersection", $"e.jaccard")
      .head
    row.getDouble(0) shouldBe 300.0
    row.getDouble(1) shouldBe 300.0
    row.getDouble(2) shouldBe 500.0
    row.getDouble(3) shouldBe 100.0
    row.getDouble(4) shouldBe (100.0 / 500.0)

    // over-full: A = 1..40000, B = 20001..60000 → jaccard 1/3
    val k2 = 512
    val bigA = (1 to 40000).map(i => s"y$i").toDF("v")
    val bigB = (20001 to 60000).map(i => s"y$i").toDF("v")
    def sk2(df: org.apache.spark.sql.DataFrame) =
      df.agg(kmvState($"v", k2).as("sk"))
    val r2 = sk2(bigA).crossJoin(sk2(bigB).withColumnRenamed("sk", "sk_b"))
      .select(kmvSetEstimates($"sk", $"sk_b", k2).as("e"))
      .select($"e.est_union", $"e.est_intersection", $"e.jaccard")
      .head
    math.abs(r2.getDouble(0) - 60000) / 60000 should be < 0.2
    math.abs(r2.getDouble(2) - 1.0 / 3.0) should be < 0.1
    math.abs(r2.getDouble(1) - 20000) / 20000 should be < 0.3
  }

  test("KMV exactness guard: under-full passes through, capacity fails loud") {
    val k = 64
    val small = (1 to 50).map(i => s"u$i").toDF("v")
      .agg(kmvState($"v", k).as("sk"))
    // under-full: guard is the identity
    small.select(kmvAssertUnderFull($"sk", k, "spec").as("g"))
      .head.getAs[Array[Byte]](0).length shouldBe 50 * 8
    // at/over capacity (here 200 distinct > k): a hash gate comparing
    // against exact set SQL must error, not silently mismatch
    val big = (1 to 200).map(i => s"u$i").toDF("v")
      .agg(kmvState($"v", k).as("sk"))
    val e = intercept[Exception] {
      big.select(kmvAssertUnderFull($"sk", k, "spec-ctx").as("g")).head
    }
    e.getMessage should include("spec-ctx")
    e.getMessage should include("capacity")
  }

  test("KMV NULLs are excluded, matching count_distinct") {
    val df = Seq(Some("a"), None, Some("b"), None, Some("a"))
      .toDF("v")
    val est = df.agg(kmvState($"v", 64).as("sk"))
      .select(kmvEstimate($"sk", 64).as("e")).head.getDouble(0)
    est shouldBe 2.0
  }
}
