package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY §2
  * (plus the scale-pipeline extensions); `oracleSql` the DuckDB
  * equivalent where SQL-expressible. Column names are aliased
  * identically on both sides; every query ends in a total ORDER BY.
  */
object SparkEntry {

  /** Flagship: the stage-wins PK merge (the reference's distinctive
    * semantics, SURVEY §2.3 J3) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("upsert_merge")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ AnalyticsQueries.queries ++
      TextQueries.queries ++ PipelineQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ AnalyticsQueries.oracleSql ++
      TextQueries.oracleSql ++ PipelineQueries.oracleSql

  /** Why each `queries` entry WITHOUT an `oracleSql` twin is rows-only
    * BY DESIGN — the correctness artifact's `no_oracle` entries are
    * this set, verbatim (Verify dumps it as `query_status.json` next
    * to `oracle_sql.json`, so the round record self-describes instead
    * of every reader re-deriving the allowlist). Each entry names the
    * ScalaTest spec that carries the query's real correctness bound.
    * ContractSpec pins keys == queries.keySet -- oracleSql.keySet:
    * adding an oracle-less query without declaring WHY fails the
    * suite. */
  def rowsOnlyReasons: Map[String, String] = {
    val sketch = "engine-specific sketch internals: approximate values" +
      " are legal within an error bound, not bit-equal across engines;" +
      " error-bound spec in "
    val ann = "LSH/ANN candidate generation is hash-seeded; contract is" +
      " a recall floor vs the exact brute-force twin, spec-pinned in "
    val pairs = "near-dup candidate PAIRS depend on banding internals;" +
      " the downstream drop-decision is oracle-checked via the corpus" +
      " queries, pair-level recall spec in "
    val media = "opaque binary columns (DuckDB compares no image/audio" +
      " bytes); plumbing shape + determinism spec-pinned in "
    Map(
      "approx_distinct_sketch" -> (sketch + "SketchSpec"),
      "token_freq_sketch" -> (sketch + "SketchSpec"),
      "incremental_rollup_distinct" -> (sketch + "SketchSpec (exact-vs-sketch bound)"),
      "incremental_rollup_quantile" -> (sketch + "SketchSpec (GK rank bound)"),
      "price_percentiles_approx" -> (sketch + "PercentilesSpec (rank-error bound vs exact twin)"),
      "profile_orders_approx" -> (sketch + "PercentilesSpec (Expand-free plan + bound)"),
      "dedup_minhash_lsh" -> (pairs + "DedupSpec"),
      "dedup_simhash" -> (pairs + "DedupSpec (Hamming bound)"),
      "dedup_filtered_corpus" -> (pairs + "DedupSpec"),
      "dedup_incremental" -> (pairs + "DedupSpec (batch-vs-rebuild parity)"),
      "dedup_incremental_persisted" -> (pairs + "DedupSpec (persisted-index parity)"),
      "decontaminate_fuzzy" -> (pairs + "DedupSpec (planted-leak capture +" +
        " no-false-drop vs the brute-force jaccard screen)"),
      "dedup_embedding_corpus" -> (ann + "SimilaritySpec"),
      "semantic_dedup" -> (ann + "SimilaritySpec (SemDeDup cells)"),
      "embedding_near_dup" -> (ann + "SimilaritySpec"),
      "embedding_lsh_topk" -> (ann + "SimilaritySpec (recall >= 0.8)"),
      "embedding_ivf_topk" -> (ann + "SimilaritySpec (recall >= 0.8)"),
      "embedding_ivf_trained" -> (ann + "SimilaritySpec (k-means training)"),
      "embedding_ivf_quantized" -> (ann + "SimilaritySpec (SQ8 recall vs" +
        " the float index)"),
      "embedding_ivf_persisted" -> (ann + "SimilaritySpec (persisted parity)"),
      "embedding_ivf_append" -> (ann + "SimilaritySpec (append parity)"),
      "embedding_pq_topk" -> (ann + "SimilaritySpec (ADC identity +" +
        " PQ recall floor)"),
      "embedding_ivf_pq" -> (ann + "SimilaritySpec (composed IVF+PQ" +
        " recall floor + true-cosine refine)"),
      "embedding_ivf_whitened" -> (ann + "SimilaritySpec (recall of" +
        " IVF over whitened-PCA-reduced vectors vs exact brute force" +
        " on the ORIGINAL space)"),
      "embedding_whitening_stats" -> ("covariance eigendecomposition" +
        " over double sums (fit is float-tolerant, not bit-exact; no" +
        " SQL twin) — whitened-covariance ~I bound, PCA factor" +
        " capture, and the Jacobi solver spec-pinned in WhiteningSpec"),
      "embedding_drift" -> ("PSI over k-means cell occupancies —" +
        " centroid training carries double-sum rounding; planted-shift" +
        " detection and near-zero-on-identical spec-pinned in DriftSpec"),
      "cluster_balanced_sample" -> ("k-means cell assignment carries" +
        " double-sum rounding (no SQL twin); per-cell cap, dominant-mode" +
        " equalization, and determinism spec-pinned in SamplingSpec"),
      "embedding_ingest_dedup" -> (ann + "SimilaritySpec (ingest gate parity)"),
      "hybrid_search_indexed" -> (ann + "HybridSearchSpec (indexed fusion" +
        " parity vs the exact hash-green hybrid_search twin)"),
      "media_binary_ingest" -> (media + "MultimodalSpec"),
      "media_batch_features" -> (media + "MultimodalSpec (capped batch shape)"),
      "media_frame_features" -> (media + "MultimodalSpec (frame sampling)"),
      "media_phash_pairs" -> (media + "MultimodalSpec (dHash plant" +
        " recall, no-false-pair, splice locality)"),
      "zorder_prune_stats" -> ("file-count pruning statistics measure THIS" +
        " engine's physical layout — DuckDB has no twin table; pruning" +
        " bound spec-pinned in ZOrderSpec"),
      "bpe_merges" -> ("iterative BPE induction has no SQL twin; exact" +
        " parity with a single-JVM reference implementation (merge list" +
        " AND encodings) is spec-pinned in BpeSpec"),
      "bpe_encode" -> ("encodes with corpus-derived merges (no SQL twin);" +
        " encoder-vs-reference parity spec-pinned in BpeSpec"),
      "compression_ratio" -> ("DuckDB has no deflate function to twin" +
        " the zlib signal; byte-exact parity with java.util.zip and the" +
        " repetitive-vs-prose ordering are spec-pinned in" +
        " TextFunctionsSpec"))
  }
}
