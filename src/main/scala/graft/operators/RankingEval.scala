package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline retrieval-quality metrics — the evaluation face of the
  * search family: given a RANKED result set and graded relevance
  * judgments, per query report precision@k, recall@k, MRR and nDCG@k
  * (Järvelin & Kekäläinen's discounted cumulative gain, normalized by
  * the ideal ordering of that query's own judgments).
  *
  * Scale shape: one (query, doc) equi-join of results against
  * judgments, one window over each query's judgments (bounded by
  * judgment list size), two grouped aggregations — everything
  * partial-aggregates, nothing is quadratic in corpus size.
  *
  * Determinism: the only transcendental is the rank discount
  * log2(rank+1); each per-row term rounds to 9 decimals (the psi_term
  * libm-ulp discipline) and cross-row sums run through DECIMAL, so
  * metric values are bit-stable across engines and partitionings.
  * Ideal-ordering ties break on doc id.
  */
object RankingEval {

  /** @param results   ranked retrieval output; `rankCol` is 1-based
    *                   and rows with rank > k are ignored
    * @param judgments  (query, doc, grade) relevance rows; grade ≤ 0
    *                   rows are dropped (standard "not relevant")
    * @return one row per query appearing in `results`:
    *         (q, n_results, n_rel, hits, precision_at_k, recall_at_k,
    *         mrr, dcg, idcg, ndcg) */
  def evaluate(results: DataFrame, qCol: String, docCol: String,
               rankCol: String, judgments: DataFrame, relCol: String,
               k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def disc(rel: org.apache.spark.sql.Column,
             rank: org.apache.spark.sql.Column) =
      round(rel / (log(rank.cast("double") + 1) / log(lit(2.0))), 9)
    val res = results.select(col(qCol).as("q"), col(docCol).as("doc"),
        col(rankCol).as("rnk"))
      .filter(col("rnk") <= k)
    val j = judgments.select(col(qCol).as("q"), col(docCol).as("doc"),
        col(relCol).cast("double").as("rel"))
      .filter(col("rel") > 0)
    val joined = res.join(j, Seq("q", "doc"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0.0)))
    val perQ = joined.groupBy("q").agg(
      count(lit(1)).as("n_results"),
      sum(when(col("rel") > 0, 1L).otherwise(0L)).as("hits"),
      min(when(col("rel") > 0, col("rnk"))).as("first_rel"),
      sum(disc(col("rel"), col("rnk")).cast("decimal(28,12)"))
        .cast("double").as("dcg"))
    // ideal ordering of the query's OWN judgments (grade desc, doc id
    // tie-break), discounted at ranks 1..min(|judgments|, k)
    val ideal = j.withColumn("irnk", row_number().over(
        Window.partitionBy("q").orderBy(col("rel").desc, col("doc"))))
    val idealQ = ideal.groupBy("q").agg(
      count(lit(1)).as("n_rel"),
      sum(when(col("irnk") <= k,
        disc(col("rel"), col("irnk")).cast("decimal(28,12)")))
        .cast("double").as("idcg"))
    perQ.join(idealQ, Seq("q"), "left")
      .select(col("q"), col("n_results"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"), col("hits"),
        (col("hits").cast("double") / lit(k.toDouble))
          .as("precision_at_k"),
        when(coalesce(col("n_rel"), lit(0L)) > 0,
          col("hits").cast("double") / col("n_rel").cast("double"))
          .otherwise(lit(0.0)).as("recall_at_k"),
        when(col("first_rel").isNotNull,
          lit(1.0) / col("first_rel").cast("double"))
          .otherwise(lit(0.0)).as("mrr"),
        col("dcg"),
        coalesce(col("idcg"), lit(0.0)).as("idcg"),
        when(coalesce(col("idcg"), lit(0.0)) > 0,
          round(col("dcg") / col("idcg"), 9)).otherwise(lit(0.0))
          .as("ndcg"))
  }
}
