package graft.queries

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators: the dedup suite, embedding
  * similarity search, and multimodal (binary-column) plumbing.
  *
  * Queries whose operators hinge on xxhash64/LSH internals have no
  * SQL-expressible oracle (the driver records a rows-only check);
  * everything else — exact dedup, brute-force jaccard and cosine — is
  * oracle-verified, which transitively validates the LSH variants via
  * the ScalaTest recall specs.
  */
object PipelineQueries {

  /** Corpus with injected duplicates: every 10th doc reappears with a
    * shifted id — exact copies for exact dedup, suffix-perturbed copies
    * for the near-dup family. Mirrored in [[dupCorpusSql]]. */
  private def dupCorpus(s: SparkSession, dir: String, perturb: Boolean): DataFrame = {
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val copies = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        (if (perturb) concat(col("text"), lit(" qq ww")) else col("text")).as("text"))
    docs.unionByName(copies)
  }

  private def dupCorpusSql(perturb: Boolean): String = {
    val text = if (perturb) "text || ' qq ww'" else "text"
    s"""corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, $text FROM documents WHERE doc_id % 10 = 0
       |)""".stripMargin
  }

  // the one shared tokenizer/quality-formula definition lives in
  // TextQueries — aliased here so this group's oracles can't drift
  private val tokensSql = TextQueries.tokensSql
  private val qualitySql = TextQueries.qualitySql

  /** Embedding corpus with planted duplicates: every 25th vector
    * reappears verbatim under a shifted id — shared by the near-dup
    * pair query and the corpus filter so the planted population can't
    * drift between them. */
  private def dupEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val shifted = emb.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    emb.unionByName(shifted)
  }

  /** Shared WITH-members computing the quantized per-(term,doc) BM25
    * scores over the full documents corpus — ONE definition so the
    * bm25_search and hybrid_search oracles can't drift (k1=1.2,
    * b=0.75; 2.2 == 1.2+1.0 and 0.25 == 1.0-0.75 exactly in binary;
    * probe terms mirror [[probeTerms]] literally). */
  private lazy val bm25BaseCtes =
    s"""d AS (SELECT doc_id, $tokensSql AS toks FROM documents),
       |dl AS (SELECT doc_id, len(toks) AS dl FROM d),
       |stats AS (SELECT COUNT(*) AS n_docs,
       |                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
       |          FROM dl),
       |p AS (SELECT doc_id, unnest(toks) AS term FROM d)""".stripMargin

  /** The per-term-set half of the BM25 oracle, suffix-namespaced so a
    * batch oracle can instantiate it once per query's bag of terms
    * without CTE collisions. Suffix "" reproduces the original
    * single-query names (m/df/scored). */
  private def bm25ScoredCtesFor(terms: Seq[String], sfx: String) =
    s"""m$sfx AS (SELECT term, doc_id, COUNT(*) AS tf FROM p
       |      WHERE term IN (${terms.map(t => s"'$t'").mkString(", ")})
       |      GROUP BY term, doc_id),
       |df$sfx AS (SELECT term, COUNT(*) AS df_t FROM m$sfx GROUP BY term),
       |scored$sfx AS (
       |  SELECT m$sfx.doc_id,
       |    CAST(floor(
       |      ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
       |        * (tf * 2.2)
       |        / (tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
       |        * 10000.0) AS BIGINT) AS score_q4
       |  FROM m$sfx JOIN df$sfx USING (term) JOIN dl USING (doc_id)
       |  CROSS JOIN stats)""".stripMargin

  private lazy val bm25ScoredCtes =
    bm25BaseCtes + ",\n" + bm25ScoredCtesFor(probeTerms, "")

  /** DuckDB mirror of [[Similarity.cosine]]: left-fold dot product and
    * norms in list order — the identical IEEE operation sequence to
    * Spark's `aggregate`/`transform` form, so doubles are bit-equal.
    * ONE definition shared by every cosine oracle. */
  private def cosSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       |                  s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)),
       |                (x, y) -> x + y)
       |    / (sqrt(list_reduce(list_transform($a,
       |          v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))
       |       * sqrt(list_reduce(list_transform($b,
       |          v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)))""".stripMargin

  /** DuckDB mirror of [[graft.operators.Sampling]]'s quantized A-ES
    * key — ln(u)/w in integer 1e-9 units over (doc_id, n_chars). ONE
    * definition for both weighted-sampler oracles (the single-
    * definition rule: a drifted copy would break the hash gate). */
  private val aesKeySql =
    """CAST(floor(1e9 * ln(
      |        (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |              AS BIGINT) + 1) / 4294967296.0)
      |      / CAST(n_chars AS DOUBLE)) AS BIGINT)""".stripMargin

  /** DuckDB mirror of [[Dedup.shingles]] (n=3) + array_distinct. */
  private val shinglesSql =
    s"""CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       |     ELSE list_transform(range(0, len(toks) - 2),
       |            i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) END""".stripMargin

  /** Build-once-per-session guard for the persisted inverted index
    * (the dedup_incremental_persisted pattern): half the corpus at
    * build, the other half APPENDED — so the gate itself exercises
    * append-invariance of the tf/df math; the oracle computes over the
    * full corpus. */
  private def invertedIndexFor(s: SparkSession, dir: String): String = {
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val name = "graft_inv_idx_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    if (!s.catalog.tableExists(s"${name}_postings")) {
      // fresh session catalog, but a PRIOR JVM's files may still sit
      // under the managed locations (CTAS into a non-empty dir throws)
      val wh = new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(s.sessionState.newHadoopConf())
      Seq("_postings", "_doclen").foreach { sfx =>
        fs.delete(new org.apache.hadoop.fs.Path(wh, (name + sfx).toLowerCase), true)
      }
      graft.operators.InvertedIndex.saveIndex(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", name)
      graft.operators.InvertedIndex.appendToIndex(
        docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", name)
    }
    name
  }

  /** Build-once-per-corpus PQ codebooks (the ivfIndexFor/bpeCache
    * discipline): trained on the FULL embeddings table — the
    * production shape, where codebooks are a persisted artifact —
    * keyed by (dir, corpus fingerprint) so regenerated parquet
    * re-trains. Saves ~24 training jobs per gate evaluation. */
  private val pqBooksCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Double]]]]()

  private def pqBooksFor(s: SparkSession, dir: String,
                         emb: DataFrame): Array[Array[Array[Double]]] = {
    val key = dir + "|" +
      Similarity.corpusFingerprint(emb, "vec_id", "embedding")
    pqBooksCache.computeIfAbsent(key, _ =>
      Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
        m = 8, kCodes = 16, iters = 2))
  }

  /** The one bag-of-terms retrieval query both index gate queries
    * share — mirrored literally in the oracles. */
  private val probeTerms = Seq("spark", "merge", "window")

  /** The batched retrieval workload: (query embedding id, its bag of
    * lexical terms) — three heterogeneous queries fused AT ONCE, the
    * shape a production retrieval pipeline runs (N queries per job,
    * not one). Mirrored literally in the batch oracle. */
  private val batchQueries: Seq[(Long, Seq[String])] = Seq(
    7L -> probeTerms,
    13L -> Seq("join", "hash"),
    29L -> Seq("stream", "batch", "filter"))

  /** Shared shape of the two hybrid-retrieval gate queries: BM25
    * top-20 fused with a semantic top-20 produced by `semantic`
    * (exact brute force or the persisted IVF probe) from (corpus,
    * one-query frame) — ONE definition so the exact and indexed
    * variants can't drift in anything but the retriever. */
  private def hybridFused(s: SparkSession, dir: String,
                          semantic: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val lex = graft.operators.InvertedIndex
      .bm25(s, invertedIndexFor(s, dir), probeTerms, topK = 20)
      .select(col("doc_id"), col("rnk"))
    val emb = Tables(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 7)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val sem = semantic(emb, q)
      .select(col("neighbor_id").as("doc_id"), col("rnk"))
    graft.operators.HybridSearch.rrfFuse(Seq(lex, sem), "doc_id", topK = 10)
  }

  /** Build-once-per-session guard for the persisted IVF index under a
    * deterministic per-sfDir path — shared by every gate query that
    * probes it so repeated evaluations (bench cold+warm, verify) hit
    * ONE index instead of rebuilding. Reuse is SELF-VALIDATING: the
    * index carries a content fingerprint (row count + max id +
    * vector-hash sum) of the corpus it was built from; regenerated
    * parquet under the same sf dir mismatches and triggers a rebuild
    * instead of serving stale answers. */
  private def ivfIndexFor(s: SparkSession, dir: String,
                          emb: DataFrame): String = {
    val path = sys.props("java.io.tmpdir") + "/graft_ivf_idx_" +
      dir.replaceAll("[^A-Za-z0-9]", "_")
    if (!Similarity.readIndexFingerprint(s, path)
        .contains(Similarity.corpusFingerprint(emb, "vec_id", "embedding")))
      Similarity.saveIvfIndex(emb, "vec_id", "embedding", path,
        nCentroids = 16)
    path
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- inverted term index ----------------------------------------
    // Point lookup against the PERSISTED posting lists: the term
    // predicate bucket-prunes the scan (O(one bucket), plan-pinned in
    // InvertedIndexSpec); hash-green — the oracle rebuilds the same
    // postings from a full corpus scan.
    "inverted_index_lookup" -> ((s, dir) =>
      graft.operators.InvertedIndex.termLookup(s, invertedIndexFor(s, dir),
          probeTerms)
        .orderBy(col("term"), col("doc_id"))),

    // BM25 ranking probing only the query terms' buckets; per-term
    // scores floor-quantized to 1e-4 units before the per-doc sum
    // (order-independent addition, the corpus_report discipline) so
    // the oracle lands on identical longs.
    "bm25_search" -> ((s, dir) =>
      graft.operators.InvertedIndex.bm25(s, invertedIndexFor(s, dir),
        probeTerms, topK = 20)),

    // ---- hybrid retrieval -------------------------------------------
    // BM25 (persisted inverted index) ⊕ exact cosine, fused by
    // reciprocal-rank: the fusion consumes only the two top-20 RANK
    // lists, each quantized to integer 1e-9 units before the per-doc
    // sum — hash-green, the oracle recomputes both retrievers and the
    // identical fusion arithmetic in SQL.
    "hybrid_search" -> ((s, dir) =>
      hybridFused(s, dir, (emb, q) =>
        Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 20))),

    // The 100 TB shape of the same fusion: both retrievers probe
    // PERSISTED indexes (term-bucket-pruned BM25, centroid-pruned
    // IVF), so per-query work is index-probe-sized, never
    // corpus-sized. Rows-only (IVF candidate generation is
    // centroid-dependent); indexed-vs-exact fusion parity is pinned in
    // HybridSearchSpec.
    "hybrid_search_indexed" -> ((s, dir) =>
      hybridFused(s, dir, (emb, q) =>
        Similarity.ivfTopKPersisted(s, ivfIndexFor(s, dir, emb), q,
          "vec_id", "embedding", k = 20))),

    // N queries fused AT ONCE — the per-query fan-out (rrfFuse
    // keyCols): three heterogeneous (embedding, term-bag) queries, one
    // semantic pass (brute-force window partitioned by q_id) + one
    // lexical list per term bag, fused in a single plan whose window
    // ranks ≤ k·|lists| rows PER QUERY. Hash-green: the oracle
    // instantiates the shared BM25 CTEs per term set and the same
    // per-query RRF arithmetic.
    "hybrid_search_batch" -> ((s, dir) => {
      val lex = batchQueries.map { case (qid, terms) =>
        graft.operators.InvertedIndex
          .bm25(s, invertedIndexFor(s, dir), terms, topK = 20)
          .select(lit(qid).as("q_id"), col("doc_id"), col("rnk"))
      }.reduce(_ unionByName _)
      val emb = Tables(s, dir, "embeddings")
      val q = emb.filter(col("vec_id").isin(batchQueries.map(_._1): _*))
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val sem = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding",
          k = 20)
        .select(col("q_id"), col("neighbor_id").as("doc_id"), col("rnk"))
      graft.operators.HybridSearch.rrfFuse(Seq(lex, sem), "doc_id",
        topK = 10, keyCols = Seq("q_id"))
    }),

    // ---- corpus overlap (KMV set sketches) --------------------------
    // "How much of corpus B is already in A?" from two k·8-byte KMV
    // synopses (Beyer et al. SIGMOD'07) instead of a cross-corpus
    // join. HASH-GREEN against exact DuckDB set SQL: a KMV sketch
    // holding fewer than k distinct hashes IS the distinct set, so at
    // verify SF every estimate is exact by construction; the over-full
    // estimator path (k-th-minimum extrapolation, ~1/√k error) is
    // pinned in SketchSpec. At 100 TB the two sketches are built in
    // one pass each (map-side partials, ≤ k longs over the shuffle)
    // and the set algebra touches only the synopses.
    "corpus_overlap_kmv" -> ((s, dir) => {
      import graft.functions.KmvFunctions._
      val docs = Tables(s, dir, "documents")
      // k derived from the DATA: a cheap HLL probe bounds the distinct
      // texts either side could hold, so the exactness gate scales with
      // SF instead of hard-coding a saturation ceiling
      val kk = kmvKFor(docs.agg(
        approx_count_distinct(col("text")).as("d")).head.getLong(0))
      val a = docs.filter(col("doc_id") % 3 === 0)
        .agg(kmvState(col("text"), kk).as("sk_a"))
      val b = docs.filter(col("doc_id") % 5 === 0)
        .agg(kmvState(col("text"), kk).as("sk_b"))
      a.crossJoin(b) // two one-row scalar frames
        // exactness gate: saturated sketches fail loud (the hash gate
        // compares against exact set SQL — see weekly_user_overlap_kmv)
        .select(kmvSetEstimates(
          kmvAssertUnderFull(col("sk_a"), kk, "corpus_overlap_kmv"),
          kmvAssertUnderFull(col("sk_b"), kk, "corpus_overlap_kmv"),
          kk).as("e"))
        .select(
          col("e.est_a").cast("long").as("n_a"),
          col("e.est_b").cast("long").as("n_b"),
          col("e.est_union").cast("long").as("n_union"),
          col("e.est_intersection").cast("long").as("n_inter"),
          col("e.jaccard").as("jaccard"))
        .orderBy(col("n_a"))
    }),

    // Product-quantized exhaustive ANN: 64-float vectors → 8 codebook
    // codes, queries scored by ADC cosine (m table lookups per row —
    // the memory-bound compressed-scan shape of 100 TB retrieval).
    // Rows-only: codebooks come from k-means (double-sum rounding,
    // like the IVF family); the ADC==reconstruction-cosine identity
    // and recall floor are spec-pinned in SimilaritySpec.
    "embedding_pq_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") === 7)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.pqTopK(emb, q, "vec_id", "embedding", k = 25,
          codebooks = Some(pqBooksFor(s, dir, emb)))
        .select(col("q_id"), col("neighbor_id"), col("rnk"))
        .orderBy(col("rnk"))
    }),

    // Cluster-balanced corpus cap: embedding-space topic balancing —
    // at most 40 vectors per k-means cell, so no single content mode
    // dominates the mix regardless of its raw frequency. Rows-only
    // (k-means training rounds doubles); the balance property and
    // determinism are spec-pinned in SamplingSpec.
    "cluster_balanced_sample" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      graft.operators.Sampling.clusterBalancedCap(emb, "vec_id",
          "embedding", perCluster = 40, nCells = 8)
        .select(col("vec_id"), col("cell"))
        .orderBy(col("vec_id"))
    }),

    // Embedding-distribution drift: both snapshot halves quantized
    // into k-means cells trained on the BASE half, categorical PSI
    // over cell occupancies — "did the embedding distribution move"
    // without any row-to-row comparison. Rows-only (centroid
    // training); shift-detection spec-pinned in DriftSpec.
    "embedding_drift" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      graft.operators.Drift.embeddingPsi(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1),
          "embedding", "vec_id", nCells = 8)
        .orderBy(col("cell").asc_nulls_first)
    }),

    // Embedding whitening end-to-end: fit (ONE VectorMoments
    // aggregation + driver Jacobi), ZCA-apply (codegen'd
    // WhitenVector narrow map), then re-measure — the output is the
    // identity-deviation diagnostic of the whitened corpus itself.
    // Rows-only (eigendecomposition over double sums — no SQL twin);
    // the ~I bound is spec-pinned in WhiteningSpec.
    "embedding_whitening_stats" -> ((s, dir) => {
      import graft.operators.Whitening
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val model = Whitening.fit(emb, "embedding", dim = 64)
      val white = Whitening.whiten(emb, "embedding", model)
      val m2 = Whitening.fit(white, "embedding", dim = 64)
      // whitened covariance has eigenvalues ~1: report the extremes
      s.range(1).select(
        lit(emb.count()).as("n_vectors"),
        lit(math.floor(m2.lambda.head * 1000) / 1000).as("lambda_max"),
        lit(math.floor(m2.lambda.last * 1000) / 1000).as("lambda_min"),
        lit(math.floor(model.lambda.head / model.lambda.last))
          .as("condition_before"))
    }),

    // Whitened-PCA retrieval: the whitening operator composed into
    // the ANN ladder — project the corpus onto the top 48 of 64
    // principal components (a quarter fewer floats per vector; at
    // 100 TB the reduction is paid once at index build and every
    // probe reads proportionally fewer bytes — real embedding
    // spectra decay, so production cuts go deeper) and run the same
    // IVF probe in the reduced space. Rows-only (approximate); the
    // recall floor vs exact brute force on the ORIGINAL space is
    // spec-pinned in SimilaritySpec.
    "embedding_ivf_whitened" -> ((s, dir) => {
      import graft.operators.Whitening
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val model = Whitening.fit(emb, "embedding", dim = 64)
      // UNSCALED projection (whitened = false): variance-scaling
      // equalizes the noise directions and distorts cosine ranking —
      // for retrieval the reduction keeps the dominant structure and
      // drops the tail, nothing more
      val red = Whitening.pcaProject(emb, "embedding", model, k = 48,
          whitened = false)
        // back to the corpus vector type: the IVF path is float-typed
        // end to end (a real reduced index stores float32)
        .withColumn("embedding", col("embedding").cast(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))
        // materialize the projection ONCE — a real index stores the
        // reduced vectors; inline it would re-project inside every
        // per-centroid distance of the probe
        .localCheckpoint(true)
      val queries = red.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.ivfTopK(red, queries, "vec_id", "embedding", k = 5)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // IVF × PQ: centroid pruning, compressed ADC scan, exact refine —
    // the composed 100 TB ANN shape. Rows-only (cell + codebook
    // approximation); recall floor and true-cosine refine are
    // spec-pinned in SimilaritySpec.
    "embedding_ivf_pq" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") === 7)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", k = 25,
          nCentroids = 16, nProbe = 6,
          codebooks = Some(pqBooksFor(s, dir, emb)))
        .select(col("q_id"), col("neighbor_id"), col("rnk"))
        .orderBy(col("rnk"))
    }),

    // Pairwise source-overlap matrix from per-source KMV synopses —
    // "which sources duplicate each other" answered without any
    // cross-source content join: one sketch pass, then set algebra
    // over the 5×4/2 sketch pairs (a bounded #sources² comparison of
    // k-long synopses, the corpus_overlap_kmv crossJoin precedent —
    // never a row-level cartesian). Under-full sketches are exact →
    // hash-green vs exact set SQL; saturation fails loud.
    "source_overlap_matrix" -> ((s, dir) => {
      import graft.functions.KmvFunctions._
      // per-source HLL probe → k sized to the LARGEST source, so the
      // exactness gate follows the data up the SF ladder
      val kk = kmvKFor(Tables(s, dir, "documents")
        .groupBy(col("source"))
        .agg(approx_count_distinct(col("text")).as("d"))
        // max over ZERO groups is NULL — empty input sizes k minimally
        .agg(coalesce(max(col("d")), lit(0L))).head.getLong(0))
      val sk = Tables(s, dir, "documents")
        .groupBy(col("source"))
        .agg(kmvState(col("text"), kk).as("sk"))
        .select(col("source"),
          kmvAssertUnderFull(col("sk"), kk, "source_overlap_matrix")
            .as("sk"))
      val a = sk.select(col("source").as("src_a"), col("sk").as("sk_a"))
      val b = sk.select(col("source").as("src_b"), col("sk").as("sk_b"))
      a.join(b, col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"),
          kmvSetEstimates(col("sk_a"), col("sk_b"), kk).as("e"))
        .select(col("src_a"), col("src_b"),
          col("e.est_intersection").cast("long").as("n_shared"),
          col("e.jaccard").as("jaccard"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // Cross-document n-gram NOVELTY: per doc, the fraction of its
    // distinct shingles not seen in any EARLIER doc (by id) — the
    // marginal-contribution signal dedup-aware curation ranks sources
    // by. One shingle explode + a min-per-shingle aggregation + one
    // join back; no pairwise anything. Hash-green.
    "ngram_novelty" -> ((s, dir) => {
      val sh = Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(Dedup.shingles(col("text"), 3)).as("sh"))
      val firstSeen = sh.groupBy(col("sh"))
        .agg(min(col("doc_id")).as("first_id"))
      sh.join(firstSeen, "sh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_id") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .withColumn("novelty",
          col("n_novel").cast("double") / col("n_shingles"))
        .orderBy(col("doc_id"))
    }),

    // ---- dedup suite -------------------------------------------------
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(dupCorpus(s, dir, perturb = false), "doc_id", "text")
        .orderBy(col("keep_id"))),

    // surviving corpus rows after exact dedup (all columns kept)
    "dedup_exact_corpus" -> ((s, dir) =>
      Dedup.exactCorpus(dupCorpus(s, dir, perturb = false), "doc_id", "text")
        .select(col("doc_id"), md5(col("text")).as("content_hash"))
        .orderBy(col("doc_id"))),

    // corpus minus LSH-found near-dups (rows-only: hash-dependent)
    "dedup_filtered_corpus" -> ((s, dir) => {
      val corpus = dupCorpus(s, dir, perturb = true)
      val pairs = Dedup.minhashNearDupPairs(corpus, "doc_id", "text")
      Dedup.dropNearDups(corpus, pairs, "doc_id")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashNearDupPairs(dupCorpus(s, dir, perturb = true),
          "doc_id", "text")
        .orderBy(col("id_a"), col("id_b"))),

    // Incremental dedup: a perturbed batch probes the corpus's
    // prebuilt LSH index — corpus text never rescanned, cost scales
    // with the batch (rows-only: hash-dependent).
    "dedup_incremental" -> ((s, dir) => {
      val corpus = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = corpus.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" qq ww")).as("text"))
      Dedup.incrementalNearDupPairs(
          Dedup.minhashBandKeys(corpus, "doc_id", "text"),
          Dedup.shingleStore(corpus, "doc_id", "text"),
          batch, "doc_id", "text")
        .orderBy(col("new_id"), col("corpus_id"))
    }),

    // Same probe against the PERSISTED index (bucketed catalog
    // tables), constructed incrementally: half the corpus indexed at
    // build, the other half APPENDED — band keys are order-independent,
    // so the result is identical to dedup_incremental (spec-pinned;
    // rows-only here like every hash-dependent op). Reuse is
    // session-catalog-scoped: a fresh session rebuilds (overwrite), so
    // stale-content reuse cannot occur across runs.
    "dedup_incremental_persisted" -> ((s, dir) => {
      val corpus = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = corpus.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" qq ww")).as("text"))
      val name = "graft_mh_idx_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      if (!s.catalog.tableExists(s"${name}_bands")) {
        // fresh session catalog, but a PRIOR JVM's files may still sit
        // under the managed locations (CTAS into a non-empty dir
        // throws) — clear them before rebuilding
        val wh = new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir"))
        val fs = wh.getFileSystem(s.sessionState.newHadoopConf())
        Seq("_bands", "_shingles").foreach { sfx =>
          fs.delete(new org.apache.hadoop.fs.Path(wh, (name + sfx).toLowerCase), true)
        }
        Dedup.saveMinhashIndex(corpus.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", name)
        Dedup.appendToMinhashIndex(corpus.filter(col("doc_id") % 2 =!= 0),
          "doc_id", "text", name)
      }
      Dedup.incrementalNearDupPairsPersisted(s, name, batch, "doc_id", "text")
        .orderBy(col("new_id"), col("corpus_id"))
    }),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashNearDupPairs(dupCorpus(s, dir, perturb = true),
          "doc_id", "text", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))),

    // brute-force companion, bounded to a 1-in-100 sample (quadratic!)
    "ngram_jaccard_pairs" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(
          dupCorpus(s, dir, perturb = true).filter(col("doc_id") % 100 === 0),
          "doc_id", "text", threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    // Directed containment over the FULL planted-copy corpus — the
    // asymmetric quote/partial-copy signal Jaccard misses (a short doc
    // quoted inside a long one: tiny Jaccard, containment ≈ 1 in the
    // short→long direction). Unlike the brute-force Jaccard companion
    // above (1% sample, quadratic), this runs the WHOLE corpus through
    // the df-capped posting-list join — pairs arise only from shared
    // cold shingles, never all-pairs. Hash-green.
    "ngram_containment_pairs" -> ((s, dir) =>
      Dedup.ngramContainmentPairs(dupCorpus(s, dir, perturb = true),
          "doc_id", "text", threshold = 0.6)
        .orderBy(col("id_a"), col("id_b"))),

    // Token-window duplication stats over the planted-near-copy corpus
    // — the scalable stand-in for suffix-array substring dedup: the
    // perturbed copies share most (not all) 8-token windows with their
    // originals, so dup_frac lands strictly between 0 and 1 for the
    // planted population.
    "window_dedup_stats" -> ((s, dir) =>
      Dedup.windowDupStats(dupCorpus(s, dir, perturb = true),
          "doc_id", "text", windowSize = 8, stride = 4)
        .orderBy(col("doc_id"))),

    // The REMOVAL upgrade of window_dedup_stats: tokens covered by an
    // 8-token window shared with a smaller doc_id are dropped (the
    // original keeps its text; the planted copies keep only their
    // perturbed tails). Hash-verified end to end — the oracle rebuilds
    // the cleaned text in SQL.
    "window_dedup_removal" -> ((s, dir) =>
      Dedup.removeDuplicatedSpans(dupCorpus(s, dir, perturb = true),
          "doc_id", "text", windowSize = 8)
        .orderBy(col("doc_id"))),

    // connected components over the (deterministic, oracle-able)
    // jaccard pair graph: min-label propagation to fixpoint, mirrored
    // by a recursive CTE in DuckDB.
    "dedup_clusters" -> ((s, dir) =>
      Dedup.duplicateClusters(
          Dedup.ngramJaccardPairs(
            dupCorpus(s, dir, perturb = true).filter(col("doc_id") % 100 === 0),
            "doc_id", "text", threshold = 0.5))
        .orderBy(col("id"))),

    // ---- similarity search ------------------------------------------
    // Per-vector int8 affine quantization (the faiss-SQ8 scheme): the
    // 4× memory/IO lever for 100 TB ANN indexes. Hash-green — scale/
    // zero/quantized codes and the reconstruction error are exact
    // deterministic arithmetic (floor(x+0.5) rounding, identical in
    // both engines; round() would not be).
    "embedding_quantize" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val d = col("embedding").cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))
      emb.select(col("vec_id"), d.as("d"),
          Similarity.quantizeVector(col("embedding")).as("qs"))
        .select(col("vec_id"),
          col("qs.scale").as("scale"), col("qs.zero").as("zero"),
          aggregate(col("qs.q"), lit(0L), (a, x) => a + x).as("q_sum"),
          element_at(col("qs.q"), 1).as("q_first"),
          element_at(col("qs.q"), -1).as("q_last"),
          array_max(zip_with(col("d"),
            Similarity.dequantizeVector(col("qs")),
            (a, b) => abs(a - b))).as("max_err"))
        .orderBy(col("vec_id"))
    }),

    // Hard-negative mining for contrastive training: per anchor, the
    // top-10 corpus vectors inside the cosine band (0.2, 0.9] — near
    // enough to be informative, below the near-dup ceiling that would
    // poison the loss with false negatives. Band filter runs INSIDE
    // the broadcast scan; hash-green (cosine arithmetic shared with
    // embedding_topk_cosine, band edges compare identical doubles).
    "hard_negatives" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.hardNegatives(emb, q, "vec_id", "embedding", k = 10,
          loCos = 0.2, hiCos = 0.9)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // Offline search-quality evaluation: precision/recall/MRR/nDCG@5
    // of the brute-force cosine top-k against label-match relevance
    // judgments (same-label vectors are the relevant set). One
    // (query, doc) join + one judgment window + two aggregations —
    // RankingEval scaladoc carries the determinism discipline
    // (round-9 discount terms, DECIMAL sums). Hash-green.
    "search_eval_metrics" -> ((s, dir) => {
      import graft.operators.{RankingEval, Similarity}
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val topk = Similarity.bruteForceTopK(
          emb.select(col("vec_id"), col("embedding")), queries,
          "vec_id", "embedding", k = 5)
        .withColumnRenamed("neighbor_id", "doc_id")
      val judg = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"))
        .join(emb.select(col("vec_id").as("doc_id"), col("label")),
          col("label") === col("q_label") && col("doc_id") =!= col("q_id"))
        .select(col("q_id"), col("doc_id"), lit(1.0).as("rel"))
      RankingEval.evaluate(topk, "q_id", "doc_id", "rnk", judg, "rel", 5)
        .withColumnRenamed("q", "q_id")
        .orderBy(col("q_id"))
    }),

    "embedding_topk_cosine" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
        .orderBy(col("q_id"), col("rnk"))
    }),

    "embedding_lsh_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 5)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // ANN over SQ8-compressed vectors: the corpus side carries 4×
    // smaller codes and reconstructs on the fly (codegen'd HOF) — the
    // memory/IO shape a 100 TB index actually runs. Rows-only;
    // quantized-vs-float recall pinned in SimilaritySpec.
    "embedding_ivf_quantized" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val qemb = emb.select(col("vec_id"),
        Similarity.sq8Reconstruct(col("embedding"))
          // back to the corpus vector type (float32): the IVF path is
          // float-typed end to end, and SQ8 reconstruction error
          // dwarfs the float rounding
          .cast(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)).as("embedding"))
        // materialize the reconstruction ONCE: a real SQ8 index
        // STORES the codes — leaving the reconstruction inline would
        // re-run it inside every per-centroid distance of the IVF
        // probe (with the HOF form this was 8× the query's cost;
        // the native sq8Reconstruct kernel cuts per-row cost further)
        .localCheckpoint(true)
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.ivfTopK(qemb, queries, "vec_id", "embedding", k = 5)
        .orderBy(col("q_id"), col("rnk"))
    }),

    "embedding_ivf_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k = 5)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // IVF as a PERSISTED index: centroids + centroid-partitioned
    // inverted lists written to parquet, probe reads only the probed
    // lists (partition pruning). Rows-only; parity with the in-memory
    // build is spec-pinned. Index built once per sfDir and
    // fingerprint-REUSED across evaluations ([[ivfIndexFor]]).
    "embedding_ivf_persisted" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.ivfTopKPersisted(s, ivfIndexFor(s, dir, emb), queries,
          "vec_id", "embedding", k = 5)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // Incremental-ingest shape of the persisted IVF index: build on
    // 90% of the corpus, APPEND the remaining batch (assignment scans
    // only the batch; fingerprint rolls forward), probe the combined
    // index. Rows-only like the other ANN variants; append/rebuild
    // parity and batch-only-scan are spec-pinned.
    "embedding_ivf_append" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val base = emb.filter(col("vec_id") % 10 =!= 0)
      val batch = emb.filter(col("vec_id") % 10 === 0)
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val path = sys.props("java.io.tmpdir") + "/graft_ivf_app_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      // the stored fingerprint equals fp(base)+fp(batch) = fp(corpus)
      // only once BOTH build and append have completed — so the marker
      // check covers the two-step construction atomically
      if (!Similarity.readIndexFingerprint(s, path)
          .contains(Similarity.corpusFingerprint(emb, "vec_id", "embedding"))) {
        Similarity.saveIvfIndex(base, "vec_id", "embedding", path,
          nCentroids = 16)
        Similarity.appendToIvfIndex(batch, "vec_id", "embedding", path)
      }
      Similarity.ivfTopKPersisted(s, path, queries, "vec_id", "embedding",
          k = 5)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // IVF with Lloyd-trained centroids (VectorAvg partial-sum agg);
    // rows-only like the other hash/float-sensitive ANN variants,
    // recall pinned in SimilaritySpec.
    "embedding_ivf_trained" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k = 5,
          trainIters = 2)
        .orderBy(col("q_id"), col("rnk"))
    }),

    "embedding_near_dup" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(dupEmbeddings(s, dir),
          "vec_id", "embedding", threshold = 0.99)
        .orderBy(col("id_a"), col("id_b"))),

    // Continuous embedding ingest: base corpus indexed, then one
    // batch (near-copies of indexed vectors + genuinely new ones)
    // screened through the PURE half of ingestEmbeddingBatch — copies
    // rejected against the index, novel vectors accepted. The append
    // half is exercised by embedding_ivf_append and SimilaritySpec's
    // two-batch ingest case; the gate output (accepted ids) never
    // observes it, so the base index is fingerprint-REUSED per sfDir
    // exactly like embedding_ivf_persisted instead of being rebuilt
    // every evaluation to undo the append — the r5 bench's single
    // costliest cold query (42 s) was this rebuild. Rows-only:
    // hash/centroid-dependent.
    "embedding_ingest_dedup" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val base = emb.filter(col("vec_id") % 10 =!= 0)
      val copies = base.filter(col("vec_id") % 50 === 1) // ids present in base
        .select((col("vec_id") + 2000000L).as("vec_id"),
          transform(col("embedding"), x => x + lit(1e-5f)).as("embedding"))
      val batch = emb.filter(col("vec_id") % 10 === 0).unionByName(copies)
      val path = sys.props("java.io.tmpdir") + "/graft_ivf_ing_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      if (!Similarity.readIndexFingerprint(s, path)
          .contains(Similarity.corpusFingerprint(base, "vec_id", "embedding")))
        Similarity.saveIvfIndex(base, "vec_id", "embedding", path,
          nCentroids = 16)
      Similarity.screenEmbeddingBatch(s, path, batch,
          "vec_id", "embedding", threshold = 0.99)
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    // Embedding-level corpus filter: near-dup pairs from the LSH
    // buckets, then the standard smallest-id-survives drop — the
    // semantic-dedup step of corpus assembly (rows-only:
    // hyperplane-hash-dependent; the pair stage is spec-tested via
    // planted duplicates).
    "dedup_embedding_corpus" -> ((s, dir) => {
      val all = dupEmbeddings(s, dir)
      val pairs = Similarity.cosineNearDupPairs(all, "vec_id", "embedding",
        threshold = 0.99)
      Dedup.dropNearDups(all, pairs, "vec_id")
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    // SemDeDup-style semantic dedup: k-means clusters confine the
    // pairwise comparisons (learned cells, vs dedup_embedding_corpus's
    // fixed hyperplane buckets), then the same smallest-id-survives
    // drop. Rows-only: centroid/double-rounding dependent; planted-dup
    // removal and LSH-recall parity are spec-tested.
    "semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedup(dupEmbeddings(s, dir), "vec_id", "embedding",
          threshold = 0.99, nCentroids = 16, trainIters = 2)
        .select(col("vec_id")).orderBy(col("vec_id"))),

    // binaryFile-source ingest: a directory of raw media payloads
    // enters the binary pipeline through Spark's binaryFile source
    // (glob-pruned listing, payloads scanned narrow and never
    // shuffled), then the stub decoder types it. The fixture writes
    // 20 deterministic payloads + one glob-excluded file per sf dir;
    // rows-only (byte-level round-trip is spec-pinned).
    "media_binary_ingest" -> ((s, dir) => {
      import graft.operators.Multimodal
      val out = s"/tmp/graft_media_fix_${dir.replaceAll("[^0-9.]", "")}"
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sessionState.newHadoopConf())
      fs.mkdirs(new org.apache.hadoop.fs.Path(out))
      (0 until 20).foreach { i =>
        val os = fs.create(new org.apache.hadoop.fs.Path(out, f"m$i%03d.bin"), true)
        try os.write(Array.tabulate[Byte](64 + i * 7)(j => ((i * 31 + j) % 251).toByte))
        finally os.close()
      }
      val x = fs.create(new org.apache.hadoop.fs.Path(out, "skip.txt"), true)
      try x.write("not media".getBytes("UTF-8")) finally x.close()
      val ingested = Multimodal.ingestBinaryDir(s, out, glob = Some("*.bin"))
      val meta = Multimodal.extractMeta(ingested, "media_id", "media")
      ingested.select(col("media_id"),
          element_at(split(col("path"), "/"), -1).as("file"), col("length"))
        .join(meta, "media_id")
        .select(col("file"), col("length"), col("meta.width"),
          col("meta.height"), col("meta.n_channels"), col("meta.n_frames"))
        .orderBy(col("file"))
    }),

    // mapPartitions decode pipeline (stub codec): one row per sampled
    // frame. Rows-only check (the fake features aren't SQL-expressible);
    // the plumbing is spec-tested. The feature vector is emitted as a
    // driver-comparable scalar signature (the harness can't sort/hash an
    // array<float> column) — fixed-point longs joined into one string.
    "media_frame_features" -> ((s, dir) =>
      graft.operators.Multimodal.frameFeatures(
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("media")),
        "doc_id", "media", maxFrames = 4, dim = 8)
        .select(col("doc_id"), col("frame_idx"),
          concat_ws(",", transform(col("features"),
            f => round(f.cast("double") * 1000000d).cast("long")))
            .as("feat_sig"))
        .orderBy(col("doc_id"), col("frame_idx"))),

    // ---- deterministic sampling / splitting --------------------------
    // Hash-bucket split: assignment is a pure function of doc_id, so
    // appending data never moves old rows between splits (no leakage)
    // and the DuckDB oracle reproduces exact membership.
    "sample_split" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        graft.operators.Sampling.splitLabel(col("doc_id"), 80, 10).as("split"))
        .orderBy(col("doc_id"))),

    "sample_fraction" -> ((s, dir) =>
      graft.operators.Sampling.deterministicSample(
          Tables(s, dir, "documents"), "doc_id", fraction = 0.1)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))),

    // Per-language weighted reservoir: the 20 highest A-ES keys per
    // lang, weight = doc length — "k representative docs per language,
    // longer preferred" in one window over one shuffle. Hash-green.
    "weighted_sample_grouped" -> ((s, dir) =>
      graft.operators.Sampling.weightedSamplePerGroup(
          Tables(s, dir, "documents")
            .select(col("doc_id"), col("lang"), col("n_chars")),
          "doc_id", "n_chars", "lang", n = 20)
        .select(col("doc_id"), col("lang"), col("key_q"), col("rnk"))
        .orderBy(col("lang"), col("rnk"))),

    // Weight-proportional sample (A-ES exponential keys): longer docs
    // proportionally likelier, membership a pure function of
    // (doc_id, n_chars) — hash-green, the oracle ranks the identical
    // quantized keys.
    "weighted_sample" -> ((s, dir) =>
      graft.operators.Sampling.weightedSample(
          Tables(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          "doc_id", "n_chars", n = 100)
        .orderBy(col("key_q").desc, col("doc_id"))),

    // Per-group reservoir: exactly 20 docs per language, membership a
    // pure hash function of doc_id (append-stable, engine-reproducible).
    "group_sample" -> ((s, dir) =>
      graft.operators.Sampling.groupSample(
          Tables(s, dir, "documents").select(col("doc_id"), col("lang")),
          "lang", "doc_id", k = 20)
        .orderBy(col("doc_id"))),

    // Deterministic training-order shuffle: a seeded pseudo-random
    // permutation via a keyed hash sort — range-partitioned total sort
    // (the TeraSort shape), reproducible across engines and retries,
    // append-stable per id (rand() is none of these).
    "corpus_shuffle" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        graft.operators.Sampling.shuffleKey(col("doc_id")).as("shuffle_key"))
        .orderBy(col("shuffle_key"), col("doc_id"))),

    // Benchmark decontamination: drop-list of corpus docs sharing any
    // word n-gram with the held-out eval set (doc_id % 100 == 0 stands
    // in for the benchmark; n=3 tuned to this corpus — real pipelines
    // use 8-13 grams on natural text). The eval side's distinct
    // shingles are benchmark-sized → broadcast, so the corpus scan
    // never shuffles its shingles; only matched doc_ids shuffle for
    // the final distinct.
    "decontaminate" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      def sh(d: org.apache.spark.sql.DataFrame) =
        d.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
      val benchShingles = sh(docs.filter(col("doc_id") % 100 === 0))
        .select("sh").distinct()
      sh(docs.filter(col("doc_id") % 100 =!= 0))
        .join(broadcast(benchShingles), Seq("sh"))
        .select("doc_id").distinct()
        .orderBy("doc_id")
    }),

    // Fuzzy decontamination: the near-dup generalization of the exact
    // shingle screen — perturbed eval leakage (edited benchmark
    // questions) is caught by Jaccard ≥ threshold, verified exactly
    // after banded-LSH candidate generation. Eval ids deliberately
    // OVERLAP corpus ids (they are namespaced per side). Rows-only:
    // banding internals; parity/recall bounds pinned in DedupSpec.
    "decontaminate_fuzzy" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val evalSet = docs.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("eval_id"),
          concat(col("text"), lit(" qq ww")).as("eval_text"))
      Dedup.fuzzyDecontaminate(docs, "doc_id", "text",
          evalSet, "eval_id", "eval_text", threshold = 0.5)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // Per-source cap with quality preference — the domain-quota step
    // of corpus assembly (no single source may dominate the mix, and
    // when a source exceeds its quota, its BEST documents survive):
    // per-source top-k window, one shuffle on the source key, never a
    // global sort. Quality is the engine's own scorer; the oracle
    // recomputes it bit-identically (text_quality precedent).
    "cap_per_source" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 20)
        .orderBy(col("doc_id"))
    }),

    // GRAPH PRIOR COMPOSED INTO CURATION (r10 verdict #4): integer
    // PageRank over the DIRECTED customer→supplier trading graph
    // restricted to the 20 suppliers standing in for the corpus
    // sources (the testdata's `source` column is round-robin by
    // doc_id — perfectly regular BY CONSTRUCTION, so any co-occurrence
    // graph over it has uniform ranks; the trading graph carries the
    // genuine degree skew a domain link graph would) becomes each
    // source's authority weight via srcK ↔ supplier K, and the domain
    // quota SCALES with it — cap(s) = max(1, 20·rank(s) div max_rank)
    // (Sampling.capPerSourceWeighted: ONE broadcast join for the cap,
    // the same per-source top-k window as cap_per_source; caps land in
    // 16..20 at gate SF, both scaling AND the full-quota top source
    // exercised). Hash-green: the oracle replays 2 unrolled DIRECTED
    // integer-PageRank rounds (pageRankCtes) and the identical
    // div/greatest quota arithmetic.
    "corpus_mix_graph_prior" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val docs = Tables(s, dir, "documents")
      val pairs = Tables(s, dir, "lineitem")
        .filter(col("l_suppkey") < 20)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      val prior = graft.operators.Graph.pageRankQ(pairs, "src", "dst",
          iterations = 2, rankDenom = 0L)
        .filter(col("id").startsWith("s"))
        .select(concat(lit("src"), expr("substring(id, 2)")).as("id"),
          col("rank_q"))
      val scored = docs.select(col("doc_id"), col("source"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      graft.operators.Sampling.capPerSourceWeighted(scored, "source",
          "doc_id", Seq(col("quality").desc), maxPerSource = 20,
          prior, "id", "rank_q")
        .select(col("doc_id"), col("source"), col("cap_q"), col("rnk"))
        .orderBy(col("doc_id"))
    }),

    // Corpus release versioning: row-level diff between two snapshots
    // (Maintenance.snapshotDiff) — one full-outer join on the id over
    // md5 content signatures, output CHANGE-sized (unchanged rows
    // never emitted). v2 adds the ids ≡1 (mod 5), drops ids ≡2
    // (mod 5), and edits the text of ids ≡0 (mod 7). Hash-green: the
    // oracle derives the statuses SEMANTICALLY (from the construction
    // itself, no hashing) — an independent recomputation, not a
    // signature replay.
    "corpus_snapshot_diff" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      val before = docs.filter(col("doc_id") % 5 =!= 1)
      val after = docs.filter(col("doc_id") % 5 =!= 2)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit("!"))).otherwise(col("text")))
      graft.operators.Maintenance.snapshotDiff(
          before, after, "doc_id", Seq("text", "lang"))
        .orderBy(col("doc_id"))
    }),

    // Domain-blocklist pass (the C4/RefinedWeb URL-filter shape,
    // `blocklistFilter` pipeline step): ONE broadcast left-anti join
    // against the blocklist's distinct values — never a per-row
    // membership UDF. The blocklist here derives deterministically
    // from the corpus (portable md5 bucket of the source) so the
    // oracle rebuilds it bit-for-bit.
    "blocklist_filter" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"))
      val bl = docs.select(col("source")).distinct()
        .filter(graft.operators.Sampling.hashBucket(col("source"), 5) === 0)
      docs.join(broadcast(bl), Seq("source"), "left_anti")
        .select(col("doc_id"), col("source")).orderBy(col("doc_id"))
    }),

    // Per-stratum quotas: halve English, quarter German, 5% of the
    // rest — the language-rebalancing step of corpus assembly.
    "stratified_sample" -> ((s, dir) =>
      graft.operators.Sampling.stratifiedSample(
          Tables(s, dir, "documents").select(col("doc_id"), col("lang")),
          "doc_id", "lang",
          fractions = Map("en" -> 0.5, "de" -> 0.25), default = 0.05)
        .orderBy(col("doc_id"))),

    // Deterministic weighted corpus mixture: 50% of English docs + 20%
    // of the rest, tagged by source. Membership is hash-derived, so the
    // oracle reproduces the exact mixture.
    "corpus_mix" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("lang"))
      graft.operators.Sampling.weightedMix(Seq(
          docs.filter(col("lang") === "en") -> 0.5,
          docs.filter(col("lang") =!= "en") -> 0.2), "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Sequence packing: documents accumulate into ~512-token bins per
    // hash bucket (cumulative-sum packing; nBuckets-parallel, never a
    // global-order window).
    "pack_documents" -> ((s, dir) =>
      graft.operators.Sampling.packBins(
          Tables(s, dir, "documents")
            .select(col("doc_id"),
              graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens")),
          "doc_id", "n_tokens", targetTokens = 512L, nBuckets = 16)
        .select(col("doc_id"), col("n_tokens"), col("pack_bucket"), col("bin_id"))
        .orderBy(col("doc_id"))),

    // End-to-end corpus curation: language filter → token/quality
    // gates → exact dedup (keep smallest id) → deterministic split.
    // The composed pipeline a training-data run actually executes,
    // oracle-verified at every step.
    "corpus_curation" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val filtered = Tables(s, dir, "documents")
        .filter(col("lang") === "en")
        .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
        .filter(col("n_tokens") >= 5 && col("quality") >= 0.5)
      Dedup.exactCorpus(filtered, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          graft.operators.Sampling.splitLabel(col("doc_id"), 90, 5).as("split"))
        .orderBy(col("doc_id"))
    }),

    // Batched-inference shape: one feature vector per doc computed in
    // capped decoder batches (rows-only; scalar signature for the
    // driver compare, like media_frame_features).
    "media_batch_features" -> ((s, dir) =>
      graft.operators.Multimodal.batchedFeatures(
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("media")),
        "doc_id", "media", batchSize = 64, dim = 8)
        .select(col("doc_id"),
          concat_ws(",", transform(col("features"),
            f => round(f.cast("double") * 1000000d).cast("long")))
            .as("feat_sig"))
        .orderBy(col("doc_id"))),

    // Perceptual-hash image near-dup: every 10th payload reappears
    // under a shifted id with a LENGTH-PRESERVING 2-byte splice (the
    // re-encode/touch-up analog — a changed region, same frame) —
    // dHash over the decoder seam must pair each plant with its
    // original within Hamming 3 via the shared banded join, never
    // all-pairs on payloads. Rows-only: the signature rides the
    // decoder's grayscale grid (no SQL twin); plant-recall +
    // no-false-pair + locality are spec-pinned in MultimodalSpec.
    "media_phash_pairs" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(substring(col("text"), 1, 10), lit("XY"),
            expr("substring(text, 13)")).as("text"))
      graft.operators.Multimodal.phashNearDupPairs(
          docs.unionByName(copies)
            .select(col("doc_id"), encode(col("text"), "UTF-8").as("media")),
          "doc_id", "media", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- multimodal plumbing ----------------------------------------
    // Opaque binary payload + derived typed metadata. The payload here
    // is the utf8 text bytes (no media libs in this container); the
    // schema/partitioning/metadata path is the real thing.
    "multimodal_meta" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("media"))
        .select(
          col("doc_id"),
          length(col("media")).cast("long").as("n_bytes"),
          md5(col("media")).as("checksum"),
          (length(col("media")).cast("long") % 640L).as("fake_width"),
          (length(col("media")).cast("long") * 7L % 480L).as("fake_height"))
        .orderBy(col("doc_id"))),

    // REAL container-header parsing, oracle-checked: every doc builds a
    // spec-conformant PNG / JPEG / GIF byte stream IN SQL (unhex over
    // concat'd hex — pure codegen, no UDF), with dimensions planted as
    // arithmetic functions of doc_id; MediaHeaders must invert the
    // construction byte-exactly. JPEG places variable-length APP0+COM
    // segments before an alternating SOF0/SOF2 frame header so the
    // marker SCAN is exercised, not a fixed offset; PNG varies the
    // color type (→ channel count); GIF is little-endian. The oracle
    // recomputes the planted values — the first hash-green multimodal
    // entry (parse-real-images parity vs javax.imageio is spec-pinned
    // in MultimodalSpec).
    "media_dimensions" -> ((s, dir) => {
      import graft.operators.Multimodal
      val docs = Tables(s, dir, "documents").select(col("doc_id"))
      val w = (lit(16) + pmod(col("doc_id"), lit(1000))).cast("int")
      val h = (lit(16) + pmod(col("doc_id") * 7, lit(800))).cast("int")
      def hx(c: org.apache.spark.sql.Column, n: Int) = lpad(hex(c), n, "0")
      def le16(c: org.apache.spark.sql.Column) = concat(
        hx(pmod(c, lit(256)), 2), hx(shiftright(c, 8), 2))
      val colorType = pmod(col("doc_id"), lit(4)) * 2 // 0,2,4,6
      val pngHex = concat(
        lit("89504E470D0A1A0A0000000D49484452"), // sig + IHDR len/type
        hx(w, 8), hx(h, 8), lit("08"), hx(colorType, 2),
        lit("00000000000000")) // compression/filter/interlace + CRC
      val pad = pmod(col("doc_id"), lit(37)) // COM comment length
      val sof = when(pmod(col("doc_id"), lit(2)) === 0, "FFC0")
        .otherwise("FFC2") // baseline / progressive
      val jpegHex = concat(
        lit("FFD8"),
        lit("FFE000104A46494600010100000100010000"), // APP0 JFIF
        lit("FFFE"), hx(pad + 2, 4), repeat(lit("41"), pad.cast("int")),
        sof, lit("001108"), hx(h, 4), hx(w, 4),
        lit("03012200021101031101")) // 3 components
      val gifHex = concat(lit("474946383961"), le16(w), le16(h),
        lit("F700003B")) // flags/bg/aspect + trailer
      def le32h(c: org.apache.spark.sql.Column) = concat(
        hx(pmod(c, lit(256)), 2),
        hx(pmod(shiftright(c, 8), lit(256)), 2),
        hx(pmod(shiftright(c, 16), lit(256)), 2),
        hx(pmod(shiftright(c, 24), lit(256)), 2))
      // BITMAPINFOHEADER: BM + filesize/reserved/offset, dib=40,
      // LE32 dims, planes=1, bitcount ∈ {8,24,32} → 1/3/4 channels
      val bmpBitsFixed = when(pmod(col("doc_id"), lit(3)) === 0, 8)
        .when(pmod(col("doc_id"), lit(3)) === 1, 24).otherwise(32)
      val bmpHex = concat(
        lit("424D"), le32h(lit(54)), lit("00000000"), le32h(lit(54)),
        le32h(lit(40)), le32h(w), le32h(h),
        concat(hx(lit(1), 2), lit("00")), // planes LE16 = 1
        concat(hx(bmpBitsFixed, 2), lit("00")), // bitcount LE16
        repeat(lit("00"), 24)) // compression..colors-important
      // WebP VP8L: RIFF/WEBP + VP8L chunk, 0x2F sig, 14-bit dims with
      // the alpha flag at bit 28
      val alpha = pmod(col("doc_id"), lit(2))
      val vp8lBits = (w - 1) + (h - 1) * lit(16384) +
        alpha.cast("long") * lit(268435456L)
      val webpHex = concat(
        lit("52494646"), le32h(lit(17)), lit("57454250"),
        lit("5650384C"), le32h(lit(5)), lit("2F"), le32h(vp8lBits))
      // TIFF both byte orders (the II/MM inline-SHORT trap): LE uses
      // SHORT entries (value in the LOW two bytes of the field), BE
      // mixes LONG dims with SHORT spp (value in the FIRST two bytes)
      val sppT = when(pmod(col("doc_id"), lit(2)) === 0, lit(1))
        .otherwise(lit(3))
      def le16e(c: org.apache.spark.sql.Column) = concat(
        hx(pmod(c, lit(256)), 2), hx(shiftright(c, 8), 2))
      def tiffLeEntry(tag: Int, v: org.apache.spark.sql.Column) = concat(
        le16e(lit(tag)), le16e(lit(3)), le32h(lit(1)), le16e(v),
        lit("0000"))
      val tiffLeHex = concat(
        lit("49492A00"), le32h(lit(8)), le16e(lit(4)),
        tiffLeEntry(256, w), tiffLeEntry(257, h),
        tiffLeEntry(258, lit(8)), tiffLeEntry(277, sppT),
        le32h(lit(0)))
      def tiffMmLong(tag: Int, v: org.apache.spark.sql.Column) = concat(
        hx(lit(tag), 4), lit("0004"), lit("00000001"), hx(v, 8))
      def tiffMmShort(tag: Int, v: org.apache.spark.sql.Column) = concat(
        hx(lit(tag), 4), lit("0003"), lit("00000001"), hx(v, 4),
        lit("0000"))
      val tiffMmHex = concat(
        lit("4D4D002A"), lit("00000008"), lit("0004"),
        tiffMmLong(256, w), tiffMmLong(257, h),
        tiffMmShort(258, lit(8)), tiffMmShort(277, sppT),
        lit("00000000"))
      val media = docs.select(col("doc_id"), unhex(
        when(pmod(col("doc_id"), lit(7)) === 0, pngHex)
          .when(pmod(col("doc_id"), lit(7)) === 1, jpegHex)
          .when(pmod(col("doc_id"), lit(7)) === 2, gifHex)
          .when(pmod(col("doc_id"), lit(7)) === 3, bmpHex)
          .when(pmod(col("doc_id"), lit(7)) === 4, webpHex)
          .when(pmod(col("doc_id"), lit(7)) === 5, tiffLeHex)
          .otherwise(tiffMmHex)).as("media"))
      Multimodal.imageDims(media, "doc_id", "media")
        .orderBy(col("doc_id"))
    }),

    // media_dimensions' AUDIO twin: spec-conformant PCM WAV (RIFF
    // chunk layout, little-endian) and FLAC STREAMINFO (big-endian
    // bit-packed) byte streams built IN SQL with sample rate /
    // channels / bit depth / sample count planted as doc_id
    // arithmetic; MediaHeaders.parseAudio must invert both layouts
    // byte-exactly, and duration_ms is floor integer arithmetic on
    // both sides. Real-encoder parity (javax.sound WAV writes) is
    // spec-pinned in MultimodalSpec.
    "audio_meta" -> ((s, dir) => {
      import graft.operators.Multimodal
      val docs = Tables(s, dir, "documents").select(col("doc_id"))
      def hx(c: org.apache.spark.sql.Column, n: Int) = lpad(hex(c), n, "0")
      def le16h(c: org.apache.spark.sql.Column) = concat(
        hx(pmod(c, lit(256)), 2), hx(shiftright(c, 8), 2))
      def le32h(c: org.apache.spark.sql.Column) = concat(
        hx(pmod(c, lit(256)), 2),
        hx(pmod(shiftright(c, 8), lit(256)), 2),
        hx(pmod(shiftright(c, 16), lit(256)), 2),
        hx(pmod(shiftright(c, 24), lit(256)), 2))
      val rate = expr("8000 + (doc_id % 8) * 4000")
      val ch = expr("1 + (doc_id % 4) div 2")
      val wavBits = expr("8 * (1 + (doc_id % 6) div 3)")
      val samples = expr("1000 + doc_id % 9000")
      val blockAlign = (ch * wavBits) / 8
      val dataSize = samples * blockAlign
      val wavHex = concat(
        lit("52494646"), le32h(lit(36) + dataSize), lit("57415645"),
        lit("666D7420"), le32h(lit(16)), le16h(lit(1)), le16h(ch),
        le32h(rate), le32h(rate * blockAlign), le16h(blockAlign),
        le16h(wavBits), lit("64617461"), le32h(dataSize))
      // STREAMINFO: 4096 block sizes, zero frame bounds, 20-bit rate |
      // 3-bit channels-1 | 5-bit bits-1 (fixed 16 → the F0 byte) |
      // 36-bit sample count, zero md5
      val flacHex = concat(
        lit("664C6143"), lit("80000022"), lit("10001000"),
        lit("000000000000"),
        hx(shiftright(rate, 12), 2),
        hx(pmod(shiftright(rate, 4), lit(256)), 2),
        hx(pmod(rate, lit(16)) * 16 + (ch - 1) * 2, 2),
        lit("F0"), hx(samples, 8),
        repeat(lit("00"), 16))
      // MPEG-1 Layer III: FF FB sync, bitrate/samplerate indices +
      // padding in byte 3, channel mode in byte 4, repeated at EVERY
      // frame boundary (a real CBR stream has a header per frame —
      // parseMp3's second-sync probe requires it) for exactly
      // `frames` frames so the n_samples promise
      // (payload/frameLen · 1152) is exercised with floor arithmetic.
      // Parameters key off doc_id div 3 — doc_id % 3 selects the
      // format, so it is CONSTANT on this leg.
      val d3 = expr("doc_id div 3")
      val brIdx = when(pmod(d3, lit(4)) === 0, 1)
        .when(pmod(d3, lit(4)) === 1, 5)
        .when(pmod(d3, lit(4)) === 2, 7).otherwise(9)
      val kbps = when(pmod(d3, lit(4)) === 0, 32)
        .when(pmod(d3, lit(4)) === 1, 64)
        .when(pmod(d3, lit(4)) === 2, 96).otherwise(128)
      val srIdx = pmod(d3, lit(3))
      val mRate = when(srIdx === 0, 44100).when(srIdx === 1, 48000)
        .otherwise(32000)
      val mPad = pmod(d3, lit(2))
      val mono = pmod(d3, lit(5)) === 0
      val frames = lit(2) + pmod(d3, lit(3))
      // 144000·kbps/rate exact in doubles (both ≪ 2^53), floor = the
      // spec's integer division
      val frameLen = floor((lit(144000) * kbps).cast("double") /
        mRate.cast("double")).cast("long") + mPad
      val mp3Hdr = concat(
        lit("FFFB"),
        hx(brIdx * 16 + srIdx * 4 + mPad * 2, 2),
        when(mono, "C0").otherwise("00"))
      val mp3Hex = repeat(
        concat(mp3Hdr, repeat(lit("00"), (frameLen - 4).cast("int"))),
        frames.cast("int"))
      val media = docs.select(col("doc_id"), unhex(
        when(pmod(col("doc_id"), lit(3)) === 0, wavHex)
          .when(pmod(col("doc_id"), lit(3)) === 1, flacHex)
          .otherwise(mp3Hex)).as("media"))
      Multimodal.audioMeta(media, "doc_id", "media")
        .orderBy(col("doc_id"))
    }),

    // the VIDEO leg: ISO-BMFF (MP4) containers built in SQL — ftyp
    // with alternating brands, a variable-size filler child box ahead
    // of mvhd (so the moov child WALK is exercised, not a fixed
    // offset), and mvhd alternating version 0 (32-bit fields) /
    // version 1 (64-bit); MediaHeaders.parseVideo must invert the box
    // grammar exactly. Hash-green.
    "video_meta" -> ((s, dir) => {
      import graft.operators.Multimodal
      val docs = Tables(s, dir, "documents").select(col("doc_id"))
      def hx(c: org.apache.spark.sql.Column, n: Int) = lpad(hex(c), n, "0")
      val ts = expr("600 * (1 + doc_id % 4)")
      val dur = expr("10000 + doc_id % 100000")
      val pad = expr("cast(doc_id % 9 as int)")
      val v0 = pmod(col("doc_id"), lit(2)) === 0
      val brandHex = when(v0, "69736F6D").otherwise("6D703432")
      val ftyp = concat(lit("0000001066747970"), brandHex, lit("00000000"))
      val free = concat(hx(pad + 8, 8), lit("66726565"),
        repeat(lit("00"), pad))
      val mvhd = when(v0, concat(
          lit("0000001C6D766864" + "00000000" + "00000000" + "00000000"),
          hx(ts, 8), hx(dur, 8)))
        .otherwise(concat(
          lit("000000286D766864" + "01000000" +
            "0000000000000000" + "0000000000000000"),
          hx(ts, 8), hx(dur, 16)))
      val moovSize = lit(16) + pad + when(v0, 28).otherwise(40)
      val moov = concat(hx(moovSize, 8), lit("6D6F6F76"), free, mvhd)
      val media = docs.select(col("doc_id"),
        unhex(concat(ftyp, moov)).as("media"))
      Multimodal.videoMeta(media, "doc_id", "media")
        .orderBy(col("doc_id"))
    }))

  val oracleSql: Map[String, String] = Map(
    "inverted_index_lookup" ->
      s"""WITH p AS (
         |  SELECT doc_id, unnest($tokensSql) AS term FROM documents)
         |SELECT term, doc_id, COUNT(*) AS tf
         |FROM p WHERE term IN ('spark', 'merge', 'window')
         |GROUP BY term, doc_id
         |ORDER BY term, doc_id""".stripMargin,
    // mirrors InvertedIndex.bm25 operation-for-operation (k1=1.2,
    // b=0.75; 2.2 == 1.2+1.0 and 0.25 == 1.0-0.75 exactly in binary)
    "bm25_search" ->
      s"""WITH $bm25ScoredCtes
         |SELECT doc_id, score_q,
         |  row_number() OVER (ORDER BY score_q DESC, doc_id) AS rnk
         |FROM (SELECT doc_id, CAST(SUM(score_q4) AS BIGINT) AS score_q
         |      FROM scored GROUP BY doc_id
         |      ORDER BY score_q DESC, doc_id LIMIT 20)
         |ORDER BY rnk""".stripMargin,
    // both retrievers recomputed from scratch (bm25 CTEs shared with
    // the bm25_search oracle; cosine shared with embedding_topk_cosine
    // via cosSql), then the identical quantized RRF arithmetic
    "hybrid_search" ->
      s"""WITH $bm25ScoredCtes,
         |lex AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id) AS rnk
         |  FROM (SELECT doc_id, CAST(SUM(score_q4) AS BIGINT) AS score_q
         |        FROM scored GROUP BY doc_id
         |        ORDER BY score_q DESC, doc_id LIMIT 20)),
         |qv AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 7),
         |sem_scored AS (
         |  SELECT e.vec_id AS doc_id, ${cosSql("qv.q_vec", "e.embedding")} AS cos
         |  FROM embeddings e, qv WHERE e.vec_id <> 7),
         |sem AS (
         |  SELECT doc_id, rnk FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS rnk
         |    FROM sem_scored) WHERE rnk <= 20),
         |contrib AS (
         |  SELECT doc_id,
         |         CAST(floor(1e9 / (60.0 + CAST(rnk AS DOUBLE))) AS BIGINT) AS rrf_c
         |  FROM lex
         |  UNION ALL
         |  SELECT doc_id,
         |         CAST(floor(1e9 / (60.0 + CAST(rnk AS DOUBLE))) AS BIGINT)
         |  FROM sem),
         |fused AS (
         |  SELECT doc_id, CAST(SUM(rrf_c) AS BIGINT) AS rrf_q FROM contrib
         |  GROUP BY doc_id ORDER BY rrf_q DESC, doc_id LIMIT 10)
         |SELECT doc_id, rrf_q,
         |  row_number() OVER (ORDER BY rrf_q DESC, doc_id) AS rnk
         |FROM fused ORDER BY rnk""".stripMargin,
    // the batch twin: one scored CTE per term bag (same shared base),
    // one windowed semantic pass over all three query vectors, same
    // quantized RRF — everything keyed by q_id
    "hybrid_search_batch" -> {
      val lexCtes = batchQueries.zipWithIndex.map { case ((_, terms), i) =>
        bm25ScoredCtesFor(terms, s"_q$i")
      }.mkString(",\n")
      val lexUnion = batchQueries.zipWithIndex.map { case ((qid, _), i) =>
        s"""  SELECT CAST($qid AS BIGINT) AS q_id, doc_id,
           |    row_number() OVER (ORDER BY score_q DESC, doc_id) AS rnk
           |  FROM (SELECT doc_id, CAST(SUM(score_q4) AS BIGINT) AS score_q
           |        FROM scored_q$i GROUP BY doc_id
           |        ORDER BY score_q DESC, doc_id LIMIT 20)""".stripMargin
      }.mkString("\n  UNION ALL\n")
      val qids = batchQueries.map(_._1).mkString(", ")
      s"""WITH $bm25BaseCtes,
         |$lexCtes,
         |lex AS (
         |$lexUnion),
         |qs AS (SELECT vec_id AS q_id, embedding AS q_vec
         |       FROM embeddings WHERE vec_id IN ($qids)),
         |sem_scored AS (
         |  SELECT qs.q_id, e.vec_id AS doc_id,
         |         ${cosSql("qs.q_vec", "e.embedding")} AS cos
         |  FROM embeddings e, qs WHERE e.vec_id <> qs.q_id),
         |sem AS (
         |  SELECT q_id, doc_id, rnk FROM (
         |    SELECT q_id, doc_id,
         |      row_number() OVER (PARTITION BY q_id
         |                         ORDER BY cos DESC, doc_id) AS rnk
         |    FROM sem_scored) WHERE rnk <= 20),
         |contrib AS (
         |  SELECT q_id, doc_id,
         |    CAST(floor(1e9 / (60.0 + CAST(rnk AS DOUBLE))) AS BIGINT) AS rrf_c
         |  FROM lex
         |  UNION ALL
         |  SELECT q_id, doc_id,
         |    CAST(floor(1e9 / (60.0 + CAST(rnk AS DOUBLE))) AS BIGINT)
         |  FROM sem),
         |fused AS (
         |  SELECT q_id, doc_id, CAST(SUM(rrf_c) AS BIGINT) AS rrf_q
         |  FROM contrib GROUP BY q_id, doc_id)
         |SELECT q_id, doc_id, rrf_q, rnk FROM (
         |  SELECT q_id, doc_id, rrf_q,
         |    row_number() OVER (PARTITION BY q_id
         |                       ORDER BY rrf_q DESC, doc_id) AS rnk
         |  FROM fused)
         |WHERE rnk <= 10 ORDER BY q_id, rnk""".stripMargin
    },
    // exact set SQL per source pair; zero-overlap pairs still appear
    // (the sketch side emits every pair); jaccard mirrors the
    // estimator's rho/|union| on exact counts
    "source_overlap_matrix" ->
      """WITH d AS (SELECT DISTINCT source, text FROM documents),
        |cnt AS (SELECT source, COUNT(*) AS n FROM d GROUP BY source),
        |ov AS (
        |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
        |  FROM d a JOIN d b ON a.text = b.text AND a.source < b.source
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT x.source AS src_a, y.source AS src_b, x.n AS n_a, y.n AS n_b
        |  FROM cnt x JOIN cnt y ON x.source < y.source)
        |SELECT p.src_a, p.src_b,
        |  CAST(COALESCE(ov.shared, 0) AS BIGINT) AS n_shared,
        |  CAST(COALESCE(ov.shared, 0) AS DOUBLE)
        |    / (p.n_a + p.n_b - COALESCE(ov.shared, 0)) AS jaccard
        |FROM pairs p LEFT JOIN ov
        |  ON p.src_a = ov.src_a AND p.src_b = ov.src_b
        |ORDER BY p.src_a, p.src_b""".stripMargin,
    // mirrors Dedup.shingles(3) + the min-doc_id first-seen pass
    "ngram_novelty" ->
      s"""WITH shs AS (
         |  SELECT doc_id, unnest(list_distinct($shinglesSql)) AS sh
         |  FROM (SELECT doc_id, $tokensSql AS toks FROM documents)),
         |fs AS (SELECT sh, MIN(doc_id) AS first_id FROM shs GROUP BY sh)
         |SELECT s.doc_id, COUNT(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN fs.first_id = s.doc_id THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_novel,
         |  CAST(SUM(CASE WHEN fs.first_id = s.doc_id THEN 1 ELSE 0 END)
         |       AS DOUBLE) / COUNT(*) AS novelty
         |FROM shs s JOIN fs USING (sh)
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    // exact set SQL; matches the sketch because under-full KMV is
    // exact (see the query comment)
    "corpus_overlap_kmv" ->
      """WITH a AS (SELECT DISTINCT text FROM documents WHERE doc_id % 3 = 0),
        |b AS (SELECT DISTINCT text FROM documents WHERE doc_id % 5 = 0),
        |u AS (SELECT text FROM a UNION SELECT text FROM b),
        |i AS (SELECT text FROM a INTERSECT SELECT text FROM b)
        |SELECT (SELECT COUNT(*) FROM a) AS n_a,
        |       (SELECT COUNT(*) FROM b) AS n_b,
        |       (SELECT COUNT(*) FROM u) AS n_union,
        |       (SELECT COUNT(*) FROM i) AS n_inter,
        |       CAST((SELECT COUNT(*) FROM i) AS DOUBLE)
        |         / (SELECT COUNT(*) FROM u) AS jaccard
        |ORDER BY n_a""".stripMargin,
    "dedup_exact" ->
      s"""WITH ${dupCorpusSql(perturb = false)}
         |SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
         |       COUNT(*) AS n_dups
         |FROM corpus GROUP BY md5(text)
         |ORDER BY keep_id""".stripMargin,
    "dedup_exact_corpus" ->
      s"""WITH ${dupCorpusSql(perturb = false)},
         |ranked AS (
         |  SELECT doc_id, md5(text) AS content_hash,
         |         row_number() OVER (PARTITION BY md5(text)
         |                            ORDER BY doc_id) AS rn
         |  FROM corpus)
         |SELECT doc_id, content_hash FROM ranked WHERE rn = 1
         |ORDER BY doc_id""".stripMargin,
    "ngram_jaccard_pairs" ->
      s"""WITH ${dupCorpusSql(perturb = true)},
         |sh AS (
         |  SELECT doc_id, list_distinct($shinglesSql) AS sh
         |  FROM (SELECT doc_id, $tokensSql AS toks
         |        FROM corpus WHERE doc_id % 100 = 0))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  len(list_intersect(a.sh, b.sh))
         |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
         |FROM sh a, sh b
         |WHERE a.doc_id < b.doc_id
         |  AND len(list_intersect(a.sh, b.sh))
         |        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,
    "ngram_containment_pairs" ->
      s"""WITH ${dupCorpusSql(perturb = true)},
         |sh0 AS MATERIALIZED (
         |  SELECT doc_id, unnest(list_distinct($shinglesSql)) AS sh
         |  FROM (SELECT doc_id, $tokensSql AS toks FROM corpus)),
         |colds AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 50),
         |cold AS MATERIALIZED (
         |  SELECT s.doc_id, s.sh FROM sh0 s JOIN colds c ON s.sh = c.sh),
         |n AS (SELECT doc_id, count(*) AS n_sh FROM cold GROUP BY doc_id),
         |i AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |  FROM cold a JOIN cold b ON a.sh = b.sh AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2)
         |SELECT i.id_a, i.id_b,
         |  CAST(i.inter AS DOUBLE) / CAST(n.n_sh AS DOUBLE) AS containment
         |FROM i JOIN n ON i.id_a = n.doc_id
         |WHERE CAST(i.inter AS DOUBLE) / CAST(n.n_sh AS DOUBLE) >= 0.6
         |ORDER BY id_a, id_b""".stripMargin,
    "window_dedup_stats" ->
      s"""WITH ${dupCorpusSql(perturb = true)},
         |d AS (SELECT doc_id, $tokensSql AS toks FROM corpus),
         |wins AS (
         |  SELECT doc_id, array_to_string(toks[i + 1:i + 8], ' ') AS win
         |  FROM d, LATERAL (SELECT unnest(range(0, len(toks) - 7, 4)) AS i) s
         |  WHERE len(toks) >= 8),
         |shared AS (
         |  SELECT win FROM wins
         |  GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2)
         |SELECT w.doc_id AS doc_id, COUNT(*) AS n_windows,
         |  COUNT(s.win) AS n_dup_windows,
         |  CAST(COUNT(s.win) AS DOUBLE) / COUNT(*) AS dup_frac
         |FROM wins w LEFT JOIN shared s ON w.win = s.win
         |GROUP BY w.doc_id
         |ORDER BY doc_id""".stripMargin,
    "window_dedup_removal" ->
      s"""WITH ${dupCorpusSql(perturb = true)},
         |d AS (SELECT doc_id, $tokensSql AS toks FROM corpus),
         |rows AS (
         |  SELECT doc_id, i, toks[i + 1] AS tok,
         |         CASE WHEN i <= len(toks) - 8
         |              THEN array_to_string(toks[i + 1:i + 8], ' ') END AS win
         |  FROM d, LATERAL (SELECT unnest(range(0, len(toks))) AS i) s
         |  WHERE len(toks) > 0),
         |flagged AS (
         |  SELECT doc_id, i, tok,
         |         CASE WHEN win IS NOT NULL
         |              AND MIN(doc_id) OVER (PARTITION BY win) < doc_id
         |              THEN 1 ELSE 0 END AS dupstart
         |  FROM rows),
         |covered AS (
         |  SELECT doc_id, i, tok,
         |         MAX(dupstart) OVER (PARTITION BY doc_id ORDER BY i
         |                             ROWS BETWEEN 7 PRECEDING
         |                             AND CURRENT ROW) AS cov
         |  FROM flagged)
         |SELECT doc_id,
         |  COALESCE(string_agg(tok, ' ' ORDER BY i) FILTER (WHERE cov = 0),
         |           '') AS clean_text,
         |  COUNT(*) AS n_tokens,
         |  CAST(SUM(cov) AS BIGINT) AS n_removed
         |FROM covered GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    // mirrors Similarity.quantizeVector/dequantizeVector operation
    // for operation (floor(x+0.5), zero + scale*q)
    "embedding_quantize" ->
      """WITH d AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS d
        |  FROM embeddings),
        |p AS (
        |  SELECT vec_id, d, list_min(d) AS zero,
        |    CASE WHEN list_max(d) = list_min(d) THEN 1.0
        |         ELSE (list_max(d) - list_min(d)) / 255.0 END AS scale
        |  FROM d),
        |z AS (
        |  SELECT vec_id, scale, zero, d,
        |    list_transform(d, x ->
        |      CAST(floor((x - zero) / scale + 0.5) AS BIGINT)) AS qv
        |  FROM p)
        |SELECT vec_id, scale, zero,
        |  CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
        |  qv[1] AS q_first, qv[len(qv)] AS q_last,
        |  list_max(list_transform(list_zip(d, qv), s ->
        |    abs(CAST(s[1] AS DOUBLE)
        |        - (zero + scale * CAST(s[2] AS DOUBLE))))) AS max_err
        |FROM z ORDER BY vec_id""".stripMargin,
    // embedding_topk_cosine's scorer with the hard-negative band
    // filter before ranking
    "hard_negatives" ->
      s"""WITH q AS (
         |  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
         |  WHERE vec_id % 100 = 0),
         |scored AS (
         |  SELECT q.q_id, e.vec_id AS neighbor_id,
         |    ${cosSql("q.q_vec", "e.embedding")}
         |    AS cos
         |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
         |banded AS (
         |  SELECT * FROM scored WHERE cos > 0.2 AND cos <= 0.9),
         |ranked AS (
         |  SELECT q_id, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM banded)
         |SELECT q_id, neighbor_id, cos, rnk FROM ranked WHERE rnk <= 10
         |ORDER BY q_id, rnk""".stripMargin,
    "search_eval_metrics" ->
      s"""WITH q AS (
         |  SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
         |  FROM embeddings WHERE vec_id % 100 = 0),
         |scored AS (
         |  SELECT q.q_id, e.vec_id AS doc_id,
         |    ${cosSql("q.q_vec", "e.embedding")} AS cos
         |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
         |res AS (
         |  SELECT q_id, doc_id, rnk FROM (
         |    SELECT q_id, doc_id,
         |           row_number() OVER (PARTITION BY q_id
         |                              ORDER BY cos DESC, doc_id) AS rnk
         |    FROM scored) WHERE rnk <= 5),
         |j AS (
         |  SELECT q.q_id, e.vec_id AS doc_id, CAST(1.0 AS DOUBLE) AS rel
         |  FROM q JOIN embeddings e
         |    ON e.label = q.q_label AND e.vec_id <> q.q_id),
         |joined AS (
         |  SELECT r.q_id, r.rnk, COALESCE(j.rel, CAST(0.0 AS DOUBLE)) AS rel
         |  FROM res r LEFT JOIN j ON j.q_id = r.q_id AND j.doc_id = r.doc_id),
         |perq AS (
         |  SELECT q_id, COUNT(*) AS n_results,
         |    CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS hits,
         |    MIN(CASE WHEN rel > 0 THEN rnk END) AS first_rel,
         |    CAST(SUM(CAST(round(rel / (ln(CAST(rnk AS DOUBLE) + 1)
         |                               / ln(2.0)), 9)
         |                  AS DECIMAL(28,12))) AS DOUBLE) AS dcg
         |  FROM joined GROUP BY q_id),
         |ideal AS (
         |  SELECT q_id, rel,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY rel DESC, doc_id) AS irnk
         |  FROM j),
         |idealq AS (
         |  SELECT q_id, COUNT(*) AS n_rel,
         |    CAST(SUM(CASE WHEN irnk <= 5 THEN
         |             CAST(round(rel / (ln(CAST(irnk AS DOUBLE) + 1)
         |                               / ln(2.0)), 9)
         |                  AS DECIMAL(28,12)) END) AS DOUBLE) AS idcg
         |  FROM ideal GROUP BY q_id)
         |SELECT p.q_id, p.n_results, COALESCE(i.n_rel, 0) AS n_rel,
         |       p.hits,
         |       CAST(p.hits AS DOUBLE) / CAST(5.0 AS DOUBLE)
         |         AS precision_at_k,
         |       CASE WHEN COALESCE(i.n_rel, 0) > 0
         |            THEN CAST(p.hits AS DOUBLE) / CAST(i.n_rel AS DOUBLE)
         |            ELSE CAST(0.0 AS DOUBLE) END AS recall_at_k,
         |       CASE WHEN p.first_rel IS NOT NULL
         |            THEN CAST(1.0 AS DOUBLE) / CAST(p.first_rel AS DOUBLE)
         |            ELSE CAST(0.0 AS DOUBLE) END AS mrr,
         |       p.dcg, COALESCE(i.idcg, CAST(0.0 AS DOUBLE)) AS idcg,
         |       CASE WHEN COALESCE(i.idcg, CAST(0.0 AS DOUBLE)) > 0
         |            THEN round(p.dcg / i.idcg, 9)
         |            ELSE CAST(0.0 AS DOUBLE) END AS ndcg
         |FROM perq p LEFT JOIN idealq i ON i.q_id = p.q_id
         |ORDER BY p.q_id""".stripMargin,
    "embedding_topk_cosine" ->
      s"""WITH q AS (
         |  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
         |  WHERE vec_id % 100 = 0),
         |scored AS (
         |  SELECT q.q_id, e.vec_id AS neighbor_id,
         |    ${cosSql("q.q_vec", "e.embedding")}
         |    AS cos
         |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
         |ranked AS (
         |  SELECT q_id, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT q_id, neighbor_id, cos, rnk FROM ranked WHERE rnk <= 5
         |ORDER BY q_id, rnk""".stripMargin,
    "sample_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 80 THEN 'train'
        |       WHEN b < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |             AS BIGINT) % 100 AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "sample_fraction" ->
      """SELECT doc_id FROM documents
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |           AS BIGINT) % 10000 < 1000
        |ORDER BY doc_id""".stripMargin,
    "weighted_sample_grouped" ->
      s"""SELECT doc_id, lang, key_q, rnk FROM (
        |  SELECT doc_id, lang, key_q,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY key_q DESC, doc_id) AS rnk
        |  FROM (
        |    SELECT doc_id, lang,
        |      $aesKeySql AS key_q
        |    FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0))
        |WHERE rnk <= 20
        |ORDER BY lang, rnk""".stripMargin,
    // mirrors Sampling.weightedSample: u = (md5-int + 1)/2^32 exact,
    // key = ln(u)/w floor-quantized to 1e-9 units, ties by doc_id
    "weighted_sample" ->
      s"""SELECT doc_id, n_chars, key_q FROM (
        |  SELECT doc_id, n_chars,
        |    $aesKeySql AS key_q
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
        |  ORDER BY key_q DESC, doc_id LIMIT 100)
        |ORDER BY key_q DESC, doc_id""".stripMargin,
    "group_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('shuffle:0:' || CAST(doc_id AS VARCHAR)), doc_id)
        |      AS rn
        |  FROM documents)
        |WHERE rn <= 20
        |ORDER BY doc_id""".stripMargin,
    "corpus_shuffle" ->
      """SELECT doc_id,
        |  md5('shuffle:0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |FROM documents
        |ORDER BY shuffle_key, doc_id""".stripMargin,
    "decontaminate" ->
      s"""WITH d AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         | sh AS (SELECT doc_id,
         |          unnest(CASE WHEN len(toks) < 3
         |                 THEN [array_to_string(toks, ' ')]
         |                 ELSE list_distinct(list_transform(
         |                   range(1, GREATEST(len(toks) - 2, 0) + 1),
         |                   i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
         |                 END) AS s
         |        FROM d)
         |SELECT DISTINCT a.doc_id FROM sh a
         |JOIN (SELECT DISTINCT s FROM sh WHERE doc_id % 100 = 0) b
         |  ON a.s = b.s
         |WHERE a.doc_id % 100 <> 0
         |ORDER BY doc_id""".stripMargin,
    "cap_per_source" ->
      s"""WITH scored AS (
         |  SELECT doc_id, source,
         |    $qualitySql AS quality
         |  FROM (SELECT doc_id, source, text, $tokensSql AS toks FROM documents))
         |SELECT doc_id, source, quality, rnk FROM (
         |  SELECT doc_id, source, quality,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY quality DESC, doc_id) AS rnk
         |  FROM scored)
         |WHERE rnk <= 20
         |ORDER BY doc_id""".stripMargin,
    // 2 unrolled DIRECTED integer-PageRank rounds over the restricted
    // trading graph, srcK ↔ supplier K remap, then the exact
    // div/greatest quota arithmetic of Sampling.capPerSourceWeighted
    "corpus_mix_graph_prior" ->
      s"""WITH ${AnalyticsQueries.pageRankCtes(2,
             """SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
               |         's' || CAST(l.l_suppkey AS VARCHAR) AS dst
               |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
               |  WHERE l.l_suppkey < 20""".stripMargin,
             directed = true)},
         |prior AS (
         |  SELECT 'src' || substring(id, 2) AS id,
         |         CAST(rank_q AS BIGINT) AS rank_q
         |  FROM pr2 WHERE id LIKE 's%'),
         |maxw AS (SELECT MAX(rank_q) AS m FROM prior),
         |scored AS (
         |  SELECT doc_id, source, $qualitySql AS quality
         |  FROM (SELECT doc_id, source, text, $tokensSql AS toks
         |        FROM documents)),
         |capped AS (
         |  SELECT s.doc_id, s.source,
         |    GREATEST(CAST(1 AS BIGINT),
         |      (COALESCE(p.rank_q, 0) * 20) // mw.m) AS cap_q,
         |    CAST(row_number() OVER (PARTITION BY s.source
         |      ORDER BY s.quality DESC, s.doc_id) AS BIGINT) AS rnk
         |  FROM scored s LEFT JOIN prior p ON s.source = p.id
         |  CROSS JOIN maxw mw)
         |SELECT doc_id, source, cap_q, rnk FROM capped
         |WHERE rnk <= cap_q ORDER BY doc_id""".stripMargin,
    // statuses derived from the snapshot construction itself — the
    // oracle never touches the md5 signatures
    "corpus_snapshot_diff" ->
      """WITH b AS (SELECT doc_id FROM documents WHERE doc_id % 5 <> 1),
        |a AS (SELECT doc_id FROM documents WHERE doc_id % 5 <> 2)
        |SELECT doc_id, status FROM (
        |  SELECT COALESCE(b.doc_id, a.doc_id) AS doc_id,
        |    CASE WHEN b.doc_id IS NULL THEN 'added'
        |         WHEN a.doc_id IS NULL THEN 'removed'
        |         WHEN COALESCE(b.doc_id, 0) % 7 = 0 THEN 'changed'
        |    END AS status
        |  FROM b FULL OUTER JOIN a ON b.doc_id = a.doc_id)
        |WHERE status IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    "blocklist_filter" ->
      """WITH bl AS (
        |  SELECT DISTINCT source FROM documents
        |  WHERE CAST(('0x' || substring(md5(source), 1, 8)) AS BIGINT)
        |        % 5 = 0)
        |SELECT doc_id, source FROM documents
        |ANTI JOIN bl USING (source)
        |ORDER BY doc_id""".stripMargin,
    "stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |           AS BIGINT) % 10000
        |      < CASE WHEN lang = 'en' THEN 5000
        |             WHEN lang = 'de' THEN 2500
        |             ELSE 500 END
        |ORDER BY doc_id""".stripMargin,
    "dedup_clusters" ->
      s"""WITH RECURSIVE ${dupCorpusSql(perturb = true)},
         |sh AS (
         |  SELECT doc_id, list_distinct($shinglesSql) AS sh
         |  FROM (SELECT doc_id, $tokensSql AS toks
         |        FROM corpus WHERE doc_id % 100 = 0)),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a, sh b
         |  WHERE a.doc_id < b.doc_id
         |    AND len(list_intersect(a.sh, b.sh))
         |          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id)
         |SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id
         |ORDER BY id""".stripMargin,
    "corpus_mix" ->
      """SELECT doc_id, lang, source_id FROM (
        |  SELECT doc_id, lang, 0 AS source_id FROM documents
        |  WHERE lang = 'en'
        |    AND CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |             AS BIGINT) % 10000 < 5000
        |  UNION ALL
        |  SELECT doc_id, lang, 1 AS source_id FROM documents
        |  WHERE lang <> 'en'
        |    AND CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |             AS BIGINT) % 10000 < 2000)
        |ORDER BY doc_id""".stripMargin,
    "pack_documents" ->
      s"""SELECT doc_id, nt AS n_tokens, b AS pack_bucket,
         |  CAST(floor((cum - nt) / 512.0) AS BIGINT) AS bin_id
         |FROM (
         |  SELECT doc_id, b, nt,
         |    SUM(nt) OVER (PARTITION BY b ORDER BY doc_id) AS cum
         |  FROM (SELECT doc_id,
         |          CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |               AS BIGINT) % 16 AS b,
         |          len($tokensSql) AS nt
         |        FROM documents))
         |ORDER BY doc_id""".stripMargin,
    "corpus_curation" ->
      s"""WITH scored AS (
         |  SELECT doc_id, text, len(toks) AS n_tokens,
         |    $qualitySql AS quality
         |  FROM (SELECT doc_id, lang, text, $tokensSql AS toks FROM documents)
         |  WHERE lang = 'en'
         |), ok AS (
         |  SELECT doc_id, text, n_tokens FROM scored
         |  WHERE n_tokens >= 5 AND quality >= 0.5
         |), survivors AS (
         |  SELECT doc_id, n_tokens,
         |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |  FROM ok)
         |SELECT doc_id, n_tokens,
         |  CASE WHEN b < 90 THEN 'train'
         |       WHEN b < 95 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (SELECT doc_id, n_tokens,
         |        CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |             AS BIGINT) % 100 AS b
         |      FROM survivors WHERE rn = 1)
         |ORDER BY doc_id""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS checksum,
        |  CAST(octet_length(encode(text)) AS BIGINT) % 640 AS fake_width,
        |  CAST(octet_length(encode(text)) AS BIGINT) * 7 % 480 AS fake_height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the planted-dimension arithmetic of media_dimensions: the Spark
    // side must recover exactly these values from the constructed
    // container headers
    "media_dimensions" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 7 AS INT) WHEN 0 THEN 'png'
        |       WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
        |       WHEN 3 THEN 'bmp' WHEN 4 THEN 'webp'
        |       ELSE 'tiff' END AS format,
        |  CAST(16 + doc_id % 1000 AS INT) AS width,
        |  CAST(16 + (doc_id * 7) % 800 AS INT) AS height,
        |  CAST(CASE CAST(doc_id % 7 AS INT)
        |       WHEN 0 THEN
        |         CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 3
        |              WHEN 2 THEN 2 ELSE 4 END
        |       WHEN 3 THEN
        |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 3
        |              ELSE 4 END
        |       WHEN 4 THEN
        |         CASE CAST(doc_id % 2 AS INT) WHEN 0 THEN 3 ELSE 4 END
        |       WHEN 5 THEN
        |         CASE CAST(doc_id % 2 AS INT) WHEN 0 THEN 1 ELSE 3 END
        |       WHEN 6 THEN
        |         CASE CAST(doc_id % 2 AS INT) WHEN 0 THEN 1 ELSE 3 END
        |       ELSE 3 END AS INT) AS n_channels
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the planted audio-header arithmetic of audio_meta; duration is
    // floor integer division in both engines
    "audio_meta" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN (doc_id // 3) % 3 = 0 THEN 44100
        |         WHEN (doc_id // 3) % 3 = 1 THEN 48000
        |         ELSE 32000 END AS m_rate,
        |    CASE WHEN (doc_id // 3) % 5 = 0 THEN 1 ELSE 2 END AS m_ch,
        |    2 + (doc_id // 3) % 3 AS m_frames
        |  FROM documents)
        |SELECT d.doc_id,
        |  CASE CAST(d.doc_id % 3 AS INT) WHEN 0 THEN 'wav'
        |       WHEN 1 THEN 'flac' ELSE 'mp3' END AS format,
        |  CAST(CASE WHEN d.doc_id % 3 = 2 THEN m.m_rate
        |       ELSE 8000 + (d.doc_id % 8) * 4000 END AS INT)
        |    AS sample_rate,
        |  CAST(CASE WHEN d.doc_id % 3 = 2 THEN m.m_ch
        |       ELSE 1 + (d.doc_id % 4) // 2 END AS INT) AS n_channels,
        |  CAST(CASE CAST(d.doc_id % 3 AS INT)
        |       WHEN 0 THEN 8 * (1 + (d.doc_id % 6) // 3)
        |       WHEN 1 THEN 16 ELSE 0 END AS INT) AS bits_per_sample,
        |  CAST(CASE WHEN d.doc_id % 3 = 2 THEN m.m_frames * 1152
        |       ELSE 1000 + d.doc_id % 9000 END AS BIGINT) AS n_samples,
        |  CAST(CASE WHEN d.doc_id % 3 = 2
        |       THEN m.m_frames * 1152 * 1000 // m.m_rate
        |       ELSE (1000 + d.doc_id % 9000) * 1000
        |            // (8000 + (d.doc_id % 8) * 4000) END AS BIGINT)
        |    AS duration_ms
        |FROM documents d JOIN m ON d.doc_id = m.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // the planted box-grammar arithmetic of video_meta
    "video_meta" ->
      """SELECT doc_id,
        |  'mp4' AS format,
        |  CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
        |  CAST(600 * (1 + doc_id % 4) AS INT) AS timescale,
        |  CAST(10000 + doc_id % 100000 AS BIGINT) AS duration,
        |  CAST((10000 + doc_id % 100000) * 1000
        |       // (600 * (1 + doc_id % 4)) AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin)
}
