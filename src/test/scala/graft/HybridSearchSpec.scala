package graft

import graft.operators.HybridSearch
import org.apache.spark.sql.functions._

/** RRF fusion: hand-computed arithmetic, union-is-outer-join
  * semantics, per-query independence, and plan shape (no join at all —
  * the fusion is a union + one k-sized aggregate). */
class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  private def c(rnk: Long, rrfK: Int = 60): Long =
    math.floor(1e9 / (rrfK + rnk.toDouble)).toLong

  test("fusion matches hand-computed quantized RRF, docs in both lists first") {
    // doc 10 is rank 1+2, doc 20 rank 2 lexical only, doc 30 rank 1
    // semantic only, doc 40 rank 3 lexical only
    val lex = Seq((10L, 1L), (20L, 2L), (40L, 3L)).toDF("doc_id", "rnk")
    val sem = Seq((30L, 1L), (10L, 2L)).toDF("doc_id", "rnk")
    val got = rows(HybridSearch.rrfFuse(Seq(lex, sem), "doc_id", topK = 10))
    val want = Seq(
      (10L, c(1) + c(2)), (30L, c(1)), (20L, c(2)), (40L, c(3)))
      .sortBy(t => (-t._2, t._1)).zipWithIndex
      .map { case ((id, s), i) => Seq[Any](id, s, i + 1L) }
    got shouldBe want
  }

  test("ties on fused score break by doc id, rnk is dense 1..k") {
    // two docs each appear only once at the same rank -> equal scores
    val lex = Seq((7L, 1L)).toDF("doc_id", "rnk")
    val sem = Seq((3L, 1L)).toDF("doc_id", "rnk")
    val got = rows(HybridSearch.rrfFuse(Seq(lex, sem), "doc_id", topK = 2))
    got shouldBe Seq(Seq(3L, c(1), 1L), Seq(7L, c(1), 2L))
  }

  test("topK truncates the fused list, not the inputs") {
    val lex = (1L to 30L).map(r => (r * 100L, r)).toDF("doc_id", "rnk")
    val sem = (1L to 30L).map(r => (r * 100L + 1L, r)).toDF("doc_id", "rnk")
    val got = HybridSearch.rrfFuse(Seq(lex, sem), "doc_id", topK = 5)
    got.count() shouldBe 5L
    // rank-1 docs of both lists survive; rank-30 of neither does
    val ids = got.select("doc_id").as[Long].collect().toSet
    ids should contain allOf (100L, 101L)
    ids should contain noneOf (3000L, 3001L)
  }

  test("keyCols fuse each query independently") {
    val lex = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("b", 20L, 1L))
      .toDF("q", "doc_id", "rnk")
    val sem = Seq(("a", 20L, 1L), ("b", 10L, 1L))
      .toDF("q", "doc_id", "rnk")
    val got = rows(HybridSearch.rrfFuse(Seq(lex, sem), "doc_id",
      topK = 10, keyCols = Seq("q")))
    got shouldBe Seq(
      Seq("a", 20L, c(2) + c(1), 1L), // in both lists for q=a
      Seq("a", 10L, c(1), 2L),
      Seq("b", 10L, c(1), 1L), // ties (same score) break by doc id
      Seq("b", 20L, c(1), 2L))
  }

  test("batch fusion == independent single-query fusions, row for row") {
    // the hybrid_search_batch gate shape: fusing N queries in ONE plan
    // (keyCols) must be exactly the concatenation of fusing each query
    // alone — per-query independence at the RESULT level, and the
    // batch's window input stays k·|lists| rows per query (the union
    // below is list-sized by construction, never corpus-sized)
    val lexRows = for (q <- 1L to 3L; r <- 1L to 20L)
      yield (q, q * 1000L + r * 7L % 25L, r)
    val semRows = for (q <- 1L to 3L; r <- 1L to 20L)
      yield (q, q * 1000L + r * 11L % 25L, r)
    val lex = lexRows.toDF("q_id", "doc_id", "rnk")
    val sem = semRows.toDF("q_id", "doc_id", "rnk")
    val batch = rows(HybridSearch.rrfFuse(Seq(lex, sem), "doc_id",
      topK = 10, keyCols = Seq("q_id")))
    val singles = (1L to 3L).flatMap { q =>
      rows(HybridSearch.rrfFuse(
        Seq(lex.filter(col("q_id") === q).drop("q_id"),
          sem.filter(col("q_id") === q).drop("q_id")),
        "doc_id", topK = 10)).map(r => Seq[Any](q) ++ r)
    }
    batch shouldBe singles
  }

  test("three lists fuse; a doc absent from a list contributes nothing for it") {
    val a = Seq((1L, 1L)).toDF("doc_id", "rnk")
    val b = Seq((1L, 3L), (2L, 1L)).toDF("doc_id", "rnk")
    val d = Seq((1L, 2L)).toDF("doc_id", "rnk")
    val got = rows(HybridSearch.rrfFuse(Seq(a, b, d), "doc_id", topK = 10))
    got shouldBe Seq(
      Seq(1L, c(1) + c(3) + c(2), 1L),
      Seq(2L, c(1), 2L))
  }

  test("plan: fusion is union + aggregate — no join, no cartesian") {
    val lex = Seq((10L, 1L)).toDF("doc_id", "rnk")
    val sem = Seq((10L, 2L)).toDF("doc_id", "rnk")
    val plan = HybridSearch.rrfFuse(Seq(lex, sem), "doc_id", topK = 5)
      .queryExecution.executedPlan.toString()
    plan.toLowerCase should not include "cartesian"
    plan.toLowerCase should not include "sortmergejoin"
    plan.toLowerCase should not include "broadcasthashjoin"
  }

  test("indexed gate fusion: IVF semantic side at full probe recalls the exact fusion") {
    // mirrors the hybrid_search / hybrid_search_indexed gate pair on a
    // synthetic corpus: with nProbe == nCentroids the IVF candidate
    // set is the full corpus, so the fused ranking must EQUAL the
    // brute-force fusion (parity, not just recall)
    val n = 200
    val dim = 8
    val emb = (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        math.sin(i * 0.37 + d * 1.13).toFloat))
    }.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 7)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val lex = (1L to 20L).map(r => ((r * 13L) % n, r)).toDF("doc_id", "rnk")
      .groupBy("doc_id").agg(min("rnk").as("rnk"))
    val exact = graft.operators.Similarity
      .bruteForceTopK(emb, q, "vec_id", "embedding", k = 20)
      .select(col("neighbor_id").as("doc_id"), col("rnk"))
    val ivf = graft.operators.Similarity
      .ivfTopK(emb, q, "vec_id", "embedding", k = 20,
        nCentroids = 4, nProbe = 4)
      .select(col("neighbor_id").as("doc_id"), col("rnk"))
    val fusedExact = rows(
      HybridSearch.rrfFuse(Seq(lex, exact), "doc_id", topK = 10))
    val fusedIvf = rows(
      HybridSearch.rrfFuse(Seq(lex, ivf), "doc_id", topK = 10))
    fusedIvf shouldBe fusedExact
  }
}
