package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted term index over a document corpus — the retrieval-side
  * companion of the dedup indexes: posting lists `(term, doc_id, tf)`
  * persisted as a BUCKETED catalog table so a term lookup reads
  * O(one bucket), not the corpus.
  *
  * Reference analog: none (the reference delegates all querying to the
  * warehouse); this is a training-data-pipeline extension — "which
  * documents mention X" / keyword retrieval / BM25 ranking are the
  * standard corpus-inspection queries over a 100 TB text set, and a
  * full-corpus scan per question is the thing an index exists to avoid.
  *
  * Scale shape:
  *  - Build: ONE corpus scan → explode tokens → one (term, doc_id)
  *    shuffle for the tf counts; written `bucketBy(term)` + sorted, so
  *    the layout co-locates each term's whole posting list.
  *  - Probe: a literal term predicate bucket-prunes the scan (Spark's
  *    bucket pruning on single-column bucketed tables — the plan shows
  *    `SelectedBucketsCount`), and the in-bucket `sortBy(term)` makes
  *    parquet row-group stats skip non-matching groups. No shuffle of
  *    the index, ever; the probe's own aggregates shuffle only
  *    matched postings (query-sized).
  *  - Append: a new-docs batch writes only its own postings into the
  *    same bucket spec (disjoint-id contract, like the minhash index);
  *    `(term, doc_id)` stays unique so tf/df math is append-invariant.
  *
  * Tokenization is [[TextFunctions.tokens]] — the ONE tokenizer shared
  * with every text oracle (drift would silently desynchronize index
  * and corpus).
  */
object InvertedIndex {

  /** Posting rows of a corpus: one row per distinct (term, doc) with
    * the term's in-doc occurrence count. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Per-doc token counts — BM25's length normalizer, kept as its own
    * (doc-bucketed) table so ranking never re-derives lengths from the
    * posting lists (which would need a full index scan). */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokenCount(col(textCol)).as("dl"))

  /** Persist the index: `<name>_postings` bucketed+sorted by `term`,
    * `<name>_doclen` bucketed by `doc_id`. Doclen first — a failure
    * between the writes then leaves doc lengths with no postings
    * (lookups miss the batch loudly-by-absence and a re-run heals),
    * where the reverse order would leave postings whose BM25 join
    * silently drops on the missing length row. */
  def saveIndex(docs: DataFrame, idCol: String, textCol: String,
                name: String, buckets: Int = 8): Unit = {
    graft.sources.BucketedStore.writeBucketed(
      docLengths(docs, idCol, textCol), s"${name}_doclen", Seq("doc_id"), buckets)
    graft.sources.BucketedStore.writeBucketed(
      postings(docs, idCol, textCol), s"${name}_postings", Seq("term"), buckets)
  }

  /** Append a new-docs batch (disjoint ids) — postings computed from
    * the batch alone, bucket-appended; same fail-safe write order as
    * [[saveIndex]]. */
  def appendToIndex(batch: DataFrame, idCol: String, textCol: String,
                    name: String, buckets: Int = 8): Unit = {
    graft.sources.BucketedStore.appendBucketed(
      docLengths(batch, idCol, textCol), s"${name}_doclen", Seq("doc_id"), buckets)
    graft.sources.BucketedStore.appendBucketed(
      postings(batch, idCol, textCol), s"${name}_postings", Seq("term"), buckets)
  }

  /** Posting lists of the given terms — the bucket-pruned point
    * lookup. Returns `(term, doc_id, tf)`. */
  def termLookup(spark: SparkSession, name: String,
                 terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "at least one lookup term")
    spark.table(s"${name}_postings")
      .filter(col("term").isin(terms: _*))
  }

  /** BM25 ranking of the corpus against a bag-of-terms query, probing
    * only the query terms' buckets.
    *
    * Determinism discipline (the corpus_report/logprob rules): every
    * per-(term,doc) score is floor-quantized to integer 1e-4 units
    * BEFORE the per-doc sum, so the cross-term addition is
    * order-independent and the DuckDB oracle — same operation order,
    * same `ln` inputs — lands on the identical long. Ties rank by
    * doc_id. The final top-k is a TakeOrderedAndProject (k-sized
    * per-partition heaps), never a global sort.
    *
    * @return (doc_id, score_q, rnk) — score in quantized 1e-4 units
    */
  def bm25(spark: SparkSession, name: String, terms: Seq[String],
           topK: Int = 20, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    val doclen = spark.table(s"${name}_doclen")
    // corpus constants: one narrow aggregate over the (slim) doclen
    // table, broadcast as a scalar row — never a per-row recompute
    val stats = doclen.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val matched = termLookup(spark, name, terms)
    // df per probed term: aggregates only the matched (query-sized)
    // postings — the index's term axis is never globally grouped
    val df = matched.groupBy("term").agg(count(lit(1)).as("df_t"))
    val idf: Column = log(lit(1.0) +
      (col("n_docs") - col("df_t") + lit(0.5)) / (col("df_t") + lit(0.5)))
    matched
      .join(df, "term")
      .join(doclen, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("score_t",
        idf * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl").cast("double") / col("avgdl"))))
      .withColumn("score_q4", floor(col("score_t") * lit(1e4)).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("score_q4")).as("score_q"))
      .orderBy(col("score_q").desc, col("doc_id"))
      .limit(topK)
      // rank over the (already topK-sized) result — the single-
      // partition window touches k rows, never the corpus
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_q").desc, col("doc_id"))).cast("long"))
      .orderBy(col("rnk"))
  }
}
