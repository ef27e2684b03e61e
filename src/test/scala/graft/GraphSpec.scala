package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Integer-arithmetic PageRank: exact parity with a single-JVM
  * reference of the same update rule, plus the structural properties
  * (dedup of edges, dangling-mass decay, determinism). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference power iteration — the identical nano-unit floor
    * arithmetic, computed with plain Scala maps. */
  private def refPageRank(edges: Seq[(String, String)],
                          iterations: Int): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    val teleport = 15L * 1000000000L / (100L * n)
    var rank = nodes.map(_ -> 1000000000L / n).toMap
    (0 until iterations).foreach { _ =>
      val sums = scala.collection.mutable.Map[String, Long]()
      e.foreach { case (s, t) =>
        val c = rank(s) / outdeg(s)
        sums(t) = sums.getOrElse(t, 0L) + c
      }
      rank = nodes.map(id =>
        id -> (teleport + 85L * sums.getOrElse(id, 0L) / 100L)).toMap
    }
    rank
  }

  test("pageRankQ equals the reference arithmetic, rank for rank") {
    // a cycle, a hub, a dangling sink, and a duplicate edge
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"), // cycle
      ("a", "hub"), ("b", "hub"), ("c", "hub"), // in-star
      ("hub", "sink"), // sink has no out-edges: dangling
      ("a", "b")) // duplicate: must count once
    for (iters <- Seq(0, 1, 3, 7)) {
      val got = Graph.pageRankQ(edges.toDF("src", "dst"), "src", "dst",
        iters).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      got shouldBe refPageRank(edges, iters)
    }
  }

  test("ranking is sensible: the in-star hub outranks its spokes") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"))
    val got = Graph.pageRankQ(edges.toDF("src", "dst"), "src", "dst", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got("hub") should be > got("b")
    got("hub") should be > got("c")
    // total mass bounded by the initial mass (floor dust + dangling
    // only ever REMOVE mass)
    got.values.sum should be <= 1000000000L
  }

  test("NULL endpoints are dropped; empty graph refused; repeat runs identical") {
    val e = Seq((Some("a"), Some("b")), (None, Some("b")), (Some("a"), None))
      .toDF("src", "dst")
    Graph.pageRankQ(e, "src", "dst", 2).count() shouldBe 2L // a and b
    intercept[IllegalArgumentException] {
      Graph.pageRankQ(Seq.empty[(String, String)].toDF("src", "dst"),
        "src", "dst", 1)
    }
    val big = (0 until 500).map(i => (s"n${i % 50}", s"n${(i * 7) % 50}"))
    val r1 = rows(Graph.pageRankQ(big.toDF("src", "dst"), "src", "dst", 5)
      .orderBy("id"))
    val r2 = rows(Graph.pageRankQ(big.toDF("src", "dst").repartition(13),
      "src", "dst", 5).orderBy("id"))
    r1 shouldBe r2 // partitioning-independent by integer construction
  }

  /** Single-JVM HITS reference: the identical integer max-rescale
    * arithmetic with plain Scala maps. */
  private def refHits(edges: Seq[(String, String)], iters: Int,
                      denom: Long = 1000000L): Map[String, (Long, Long)] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var hub = nodes.map(_ -> denom).toMap
    var auth = nodes.map(_ -> 0L).toMap
    (0 until iters).foreach { _ =>
      val ar = nodes.map(n =>
        n -> e.filter(_._2 == n).map(p => hub(p._1)).sum).toMap
      val am = ar.values.max
      auth = ar.map { case (k, v) => k -> v * denom / am }
      val hr = nodes.map(n =>
        n -> e.filter(_._1 == n).map(p => auth(p._2)).sum).toMap
      val hm = hr.values.max
      hub = hr.map { case (k, v) => k -> v * denom / hm }
    }
    nodes.map(n => n -> ((hub(n), auth(n)))).toMap
  }

  test("hitsQ equals the reference arithmetic; structure is sensible") {
    // two hubs of different breadth, one shared authority, a dangling
    // source, and a duplicate edge
    val edges = Seq(
      ("h1", "a1"), ("h1", "a2"), ("h1", "a3"), // broad hub
      ("h2", "a1"), // narrow hub
      ("x", "h1"), // h1 is also an authority of x
      ("h1", "a1")) // duplicate: must count once
    for (iters <- Seq(1, 2, 4)) {
      val got = Graph.hitsQ(edges.toDF("src", "dst"), "src", "dst", iters)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      got shouldBe refHits(edges, iters)
    }
    val r3 = Graph.hitsQ(edges.toDF("src", "dst"), "src", "dst", 3)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the broad hub dominates hubs; the shared authority dominates auths
    r3("h1")._1 shouldBe 1000000L
    r3("h1")._1 should be > r3("h2")._1
    r3("a1")._2 shouldBe 1000000L
    r3("a1")._2 should be > r3("a2")._2
    // pure sinks have zero hub score; pure sources zero authority
    r3("a1")._1 shouldBe 0L
    r3("x")._2 shouldBe 0L
    // repartition invariance (integer arithmetic)
    val rep = Graph.hitsQ(edges.toDF("src", "dst").repartition(7),
      "src", "dst", 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rep shouldBe r3
    // overflow guard binds on the RESCALE product maxDeg·denom², not
    // the raw sums: denom=4e9 (denom² > Long.MaxValue) must refuse
    // even this 6-edge graph, loudly
    val ex = intercept[IllegalArgumentException] {
      Graph.hitsQ(edges.toDF("src", "dst"), "src", "dst", 1,
        denom = 4000000000L)
    }
    ex.getMessage should include("overflow")
  }

  test("triangleCounts: K4, bipartite zero, dirty-edge collapse") {
    // K4: every node closes C(3,2) = 3 triangles
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong))
      .toDF("src", "dst")
    rows(Graph.triangleCounts(k4, "src", "dst").orderBy("id")) shouldBe
      (1 to 4).map(i => Seq(i.toLong, 3L))
    // bipartite graphs have no odd cycles → empty result
    val bip = (for { a <- 1 to 3; b <- 10 to 12 } yield (a.toLong, b.toLong))
      .toDF("src", "dst")
    Graph.triangleCounts(bip, "src", "dst").count() shouldBe 0L
    // duplicates, reversed duplicates, and self-loops collapse to the
    // simple graph: one triangle {1,2,3}
    val dirty = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 2L),
      (1L, 3L)).toDF("src", "dst")
    rows(Graph.triangleCounts(dirty, "src", "dst").orderBy("id")) shouldBe
      Seq(Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L))
  }

  test("triangleCounts: parity with the orientation-free three-way join") {
    // deterministic pseudo-random graph with hubs (node 0 touches
    // everything) so the degree orientation actually reroutes wedges
    val edges = ((0 until 300).map(i => (0L, (i % 40).toLong)) ++
      (0 until 600).map(i => ((i * 7 % 40).toLong, (i * 13 % 40).toLong)))
      .toDF("src", "dst")
    val e = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v")).distinct()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e2.u") === col("e1.v"))
      .join(e.as("e3"), col("e3.u") === col("e1.u") &&
        col("e3.v") === col("e2.v"))
      .select(explode(array(col("e1.u"), col("e1.v"), col("e2.v")))
        .as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    rows(Graph.triangleCounts(edges, "src", "dst").orderBy("id")) shouldBe
      rows(naive.orderBy("id"))
    // repartition invariance: exact counts are partitioning-free
    rows(Graph.triangleCounts(edges.repartition(17), "src", "dst")
      .orderBy("id")) shouldBe rows(naive.orderBy("id"))
  }

  /** Single-JVM k-core reference: synchronous peel to fixpoint on
    * plain Scala sets. */
  private def refKCore(edges: Seq[(String, String)],
                       k: Int): Map[String, Int] = {
    val simple = edges.filter(p => p._1 != p._2)
      .map(p => if (p._1 < p._2) p else p.swap).distinct
    var live = (simple.map(_._1) ++ simple.map(_._2)).toSet
    var done = live.isEmpty
    while (!done) {
      val le = simple.filter(p => live(p._1) && live(p._2))
      val deg = (le.map(_._1) ++ le.map(_._2))
        .groupBy(identity).map { case (id, xs) => id -> xs.size }
      val next = deg.filter(_._2 >= k).keySet
      done = next == live
      live = next
    }
    val le = simple.filter(p => live(p._1) && live(p._2))
    (le.map(_._1) ++ le.map(_._2))
      .groupBy(identity).map { case (id, xs) => id -> xs.size }
  }

  test("kCore: peel parity with the reference, structure, refusals") {
    // K4 core plus a chain hanging off it, a star hub with 5 leaves
    // attached to the core, a loop, and a duplicate edge: the star hub
    // has raw degree 6 but only 1 core neighbor — classic hub-vs-
    // community separation
    val k4 = for { a <- Seq("c1", "c2", "c3", "c4")
                   b <- Seq("c1", "c2", "c3", "c4") if a < b } yield (a, b)
    val edges = k4 ++ Seq(
      ("c1", "t1"), ("t1", "t2"), ("t2", "t3"), // chain: peels off
      ("c2", "hub"), ("hub", "l1"), ("hub", "l2"), ("hub", "l3"),
      ("hub", "l4"), ("hub", "l5"), // star: peels once leaves drop
      ("c3", "c3"), // loop: ignored
      ("c1", "c2")) // duplicate: counts once
    for (k <- 1 to 4) {
      val got = Graph.kCore(edges.toDF("src", "dst"), "src", "dst", k)
        .collect()
        .map(r => r.getString(0) -> r.getLong(1).toInt).toMap
      got shouldBe refKCore(edges, k)
    }
    // the 3-core is exactly K4 with degree 3 everywhere
    val c3 = Graph.kCore(edges.toDF("src", "dst"), "src", "dst", 3)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    c3 shouldBe Map("c1" -> 3L, "c2" -> 3L, "c3" -> 3L, "c4" -> 3L)
    // above the max core the result is EMPTY but typed
    val c9 = Graph.kCore(edges.toDF("src", "dst"), "src", "dst", 9)
    c9.count() shouldBe 0L
    c9.columns.toSeq shouldBe Seq("id", "core_deg")
    // repartition invariance (the fixpoint is unique)
    rows(Graph.kCore(edges.toDF("src", "dst").repartition(13),
      "src", "dst", 2).orderBy("id")) shouldBe
      rows(Graph.kCore(edges.toDF("src", "dst"), "src", "dst", 2)
        .orderBy("id"))
    // a length-2L chain peels in ~L rounds: maxRounds refuses loudly
    val chain = (0 until 30).map(i => (f"n$i%02d", f"n${i + 1}%02d"))
    val ex = intercept[IllegalArgumentException] {
      Graph.kCore(chain.toDF("src", "dst"), "src", "dst", 2, maxRounds = 3)
    }
    ex.getMessage should include("did not converge")
    intercept[IllegalArgumentException] {
      Graph.kCore(chain.toDF("src", "dst"), "src", "dst", 0)
    }
  }

  test("bfsLevels: shortest hop from any seed, bounded by maxHops") {
    import spark.implicits._
    // path 1—2—3—4—5 plus isolated edge 8—9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("src", "dst")
    def run(seeds: Seq[Long], maxHops: Int) =
      Graph.bfsLevels(edges, "src", "dst", seeds.toDF("id"), "id", maxHops)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    run(Seq(1L), 4) shouldBe Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4)
    // hop cap truncates the frontier
    run(Seq(1L), 2) shouldBe Map(1L -> 0, 2L -> 1, 3L -> 2)
    // multi-seed: MIN hop wins; direction is ignored (undirected)
    run(Seq(1L, 5L), 4) shouldBe Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1,
      3L -> 2)
    // disconnected component unreached; off-graph seed still hop 0
    run(Seq(1L, 77L), 4) should contain allOf (77L -> 0, 5L -> 4)
    run(Seq(1L), 10).keySet should not contain 8L
  }

  test("bfsLevels is partitioning-invariant and handles empty seeds") {
    import spark.implicits._
    val edges = (1 to 300).map(i => (i.toLong, ((i * 7) % 300 + 1).toLong))
      .toDF("src", "dst")
    val seeds = Seq(1L, 42L).toDF("id")
    val a = Graph.bfsLevels(edges.repartition(9), "src", "dst",
      seeds, "id", 5).orderBy("id")
    val b = Graph.bfsLevels(edges.coalesce(1), "src", "dst",
      seeds.coalesce(1), "id", 5).orderBy("id")
    rows(a) shouldBe rows(b)
    Graph.bfsLevels(edges, "src", "dst", seeds.limit(0), "id", 5)
      .count() shouldBe 0L
  }

  test("bfsLevels drops NULL endpoints in BOTH edge directions") {
    import spark.implicits._
    val dirty = Seq((Some(1L), Some(2L)), (None, Some(1L)),
      (Some(2L), None)).toDF("src", "dst")
    val got = Graph.bfsLevels(dirty, "src", "dst", Seq(1L).toDF("id"),
        "id", 3)
      .collect().map(r => (if (r.isNullAt(0)) null else r.getLong(0))
        -> r.getInt(1))
    got.toMap shouldBe Map(1L -> 0, 2L -> 1)
  }

  test("linkPredict scores the 4-cycle's diagonals exactly") {
    import spark.implicits._
    // square 1-2-3-4-1: non-adjacent pairs (1,3) and (2,4), each with
    // 2 common neighbors, all degrees 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val got = Graph.linkPredict(edges, "src", "dst")
      .orderBy("id_a", "id_b").collect()
    got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe
      Array((1L, 3L, 2L), (2L, 4L, 2L))
    // jaccard = 2 / (2 + 2 − 2) = 1.0 (their neighborhoods coincide)
    got.map(_.getDouble(3)) shouldBe Array(1.0, 1.0)
    // adamic–adar = 2 · 1/round(ln 2, 9), summed through DECIMAL(28,12)
    val term = BigDecimal(1.0 / BigDecimal(math.log(2.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    got.map(_.getDouble(4)) shouldBe Array.fill(2)((term + term).toDouble)
  }

  test("linkPredict excludes adjacent pairs and respects minCommon") {
    import spark.implicits._
    // triangle 1-2-3 (all pairs adjacent) plus a pendant 4-1
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    // candidates: (2,4) and (3,4) via spoke 1 (cn=1), nothing else
    Graph.linkPredict(tri, "src", "dst")
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted shouldBe
      Array((2L, 4L), (3L, 4L))
    Graph.linkPredict(tri, "src", "dst", minCommon = 2).count() shouldBe 0L
  }

  test("linkPredict's maxSpokeDeg cap removes hub evidence (semantics)") {
    import spark.implicits._
    // star: hub 0 with leaves 1..5 — every leaf pair shares ONLY the hub
    val star = (1 to 5).map(i => (0L, i.toLong)).toDF("src", "dst")
    Graph.linkPredict(star, "src", "dst").count() shouldBe 10L
    // cap below the hub degree: the hub contributes no wedges
    Graph.linkPredict(star, "src", "dst", maxSpokeDeg = 4)
      .count() shouldBe 0L
    Graph.linkPredict(star, "src", "dst", maxSpokeDeg = 5)
      .count() shouldBe 10L
  }

  test("linkPredict drops NULLs/loops/duplicates and is partitioning-invariant") {
    import spark.implicits._
    val dirty = Seq((Some(1L), Some(2L)), (Some(2L), Some(1L)),
      (Some(2L), Some(3L)), (Some(3L), Some(3L)), (None, Some(1L)),
      (Some(1L), None), (Some(3L), Some(4L))).toDF("src", "dst")
    // path 1-2-3-4 after cleaning: candidates (1,3) via 2, (2,4) via 3
    val got = Graph.linkPredict(dirty, "src", "dst")
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted
    got shouldBe Array((1L, 3L), (2L, 4L))
    val a = Graph.linkPredict(dirty.repartition(7), "src", "dst")
      .orderBy("id_a", "id_b")
    val b = Graph.linkPredict(dirty.coalesce(1), "src", "dst")
      .orderBy("id_a", "id_b")
    rows(a) shouldBe rows(b)
  }
}
