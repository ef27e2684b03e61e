package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of independently
  * ranked candidate lists — the standard way to combine a lexical
  * (BM25) and a semantic (embedding ANN) retriever without score
  * calibration (Cormack et al., SIGIR'09: `1/(k+rank)` is robust to
  * incomparable score scales, so the fusion needs only each list's
  * RANKS, never its raw scores).
  *
  * Scale posture: each input list is already the top-k of a retrieval
  * probe (BM25 term-bucket probe, IVF pruned probe), so the fusion
  * touches k·|lists| rows per query — the union + sum + rank below is
  * work proportional to the RESULT size, not the corpus. With
  * `keyCols` (a query-id fan-out) every stage stays partitioned by
  * query; the per-query window ranks ≤ k·|lists| rows.
  *
  * Determinism discipline (the bm25/corpus_report rule): each rank's
  * contribution is floor-quantized to integer 1e-9 units BEFORE the
  * per-doc sum, so cross-list addition is order-independent and the
  * DuckDB oracle — same IEEE division, same floor — lands on the
  * identical long. Ties rank by document id.
  */
object HybridSearch {

  /** One rank's quantized RRF contribution: floor(1e9 / (rrfK + rnk)).
    * IEEE double division is correctly rounded in both engines, so the
    * floored long is bit-identical to the oracle's. */
  private def contribution(rnk: org.apache.spark.sql.Column, rrfK: Int) =
    floor(lit(1e9) / (lit(rrfK.toDouble) + rnk.cast("double"))).cast("long")

  /** Fuse ranked lists into a top-`topK` result.
    *
    * Each list must carry `keyCols ++ (idCol, "rnk")` with `rnk`
    * 1-based within its (keyCols) group — the shape every graft
    * retrieval operator already emits ([[InvertedIndex.bm25]],
    * [[Similarity.bruteForceTopK]]/`ivfTopKPersisted` after renaming
    * `neighbor_id`). A document absent from a list simply contributes
    * nothing for it (standard RRF; no outer-join NULL handling
    * needed — the union-then-sum form IS the full-outer fusion).
    *
    * @return keyCols ++ (idCol, rrf_q, rnk) — `rrf_q` the summed
    *         quantized contribution, `rnk` the fused 1-based rank
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, topK: Int,
              rrfK: Int = 60, keyCols: Seq[String] = Nil): DataFrame = {
    require(lists.nonEmpty, "at least one ranked list")
    require(topK > 0 && rrfK >= 0, s"bad topK=$topK / rrfK=$rrfK")
    val keyed = (keyCols :+ idCol).map(col)
    val contribs = lists.map { l =>
      l.select(keyed :+ contribution(col("rnk"), rrfK).as("rrf_c"): _*)
    }
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(keyed: _*)
      .agg(sum(col("rrf_c")).as("rrf_q"))
    if (keyCols.isEmpty) {
      // global list: TakeOrderedAndProject (k-sized per-partition
      // heaps), then a k-row window for the dense output rank — the
      // bm25 tail pattern, never a global sort
      fused.orderBy(col("rrf_q").desc, col(idCol))
        .limit(topK)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("rrf_q").desc, col(idCol))).cast("long"))
        .orderBy(col("rnk"))
    } else {
      // per-query fan-out: the window partitions by query id over
      // ≤ k·|lists| rows per partition (list-sized, not corpus-sized)
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col("rrf_q").desc, col(idCol))
      fused.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= topK)
        .orderBy(keyCols.map(col) :+ col("rnk"): _*)
    }
  }
}
