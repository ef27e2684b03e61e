package graft.queries

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (token stats, quality
  * scoring, language-ID, fingerprinting). Every Spark expression here
  * is mirrored token-for-token in the DuckDB oracle (same regex, same
  * operation order) so double arithmetic is bit-identical.
  */
object TextQueries {

  /** Shared oracle fragment: the tokenizer, as DuckDB SQL. The ONE
    * definition for every query group — a drifted copy would pin a
    * stale tokenizer into some oracles and fail the hash gate. */
  private[queries] val tokensSql =
    "list_filter(str_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  /** Shared oracle fragment: [[graft.functions.TextFunctions.qualityScore]]
    * as DuckDB SQL (expects `text` and `toks` in scope). Same
    * single-definition rule as [[tokensSql]]. */
  private[queries] val qualitySql =
    """LEAST(length(text) / 500.0, 1.0) * 0.3
      |    + (len(list_distinct(toks)) / GREATEST(len(toks), 1)) * 0.5
      |    + (1.0 - LEAST((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
      |                     / GREATEST(length(text), 1) * 5.0, 1.0)) * 0.2""".stripMargin

  /** Learned BPE merges per sfDir — a pure function of the corpus
    * (deterministic argmax each round), memoized so verify and bench
    * share one induction per scale factor. Keyed on (dir, corpus
    * fingerprint) — the ivfIndexFor discipline — so parquet
    * regenerated under the SAME directory within one JVM session
    * re-induces instead of serving stale merges. The fingerprint is
    * one cheap aggregate; induction is 20 full rounds. */
  private val bpeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()

  private def bpeMergesFor(s: SparkSession, dir: String): Seq[(String, String)] = {
    val docs = Tables(s, dir, "documents")
    val key = dir + "|" + graft.operators.Similarity.corpusFingerprint(
      docs, "doc_id", "text")
    bpeCache.computeIfAbsent(key, _ =>
      graft.operators.BpeInduction.induceMerges(docs, "text", nMerges = 20))
  }

  /** Exact global `ntile(k)` over the total (sortCols) order WITHOUT
    * the single-partition sort a global-order window forces (the
    * "WindowExec: No Partition Defined — moving all data to a single
    * partition" scale-killer; guide §2.4). Bit-equal to
    * `ntile(k) OVER (ORDER BY sortCols)` — the oracle's ntile replays
    * it — while every stage stays parallel:
    *
    *  1. range-repartition on the sort key + local sort (ordered,
    *     disjoint partitions — the parallel form of a global sort);
    *  2. tag each row with `monotonically_increasing_id()` (= partition
    *     id in the high bits, LOCAL SORT POSITION in the low bits) and
    *     pin the ids with one eager localCheckpoint (the id assignment
    *     must not be re-derived between the two passes below);
    *  3. ONE tiny collect of per-partition row counts → rank offsets;
    *  4. global rank = offset(partition) + local position + 1, and the
    *     bin falls out of the standard ntile fill rule (the first
    *     n mod k tiles take ceil(n/k) rows, the rest floor(n/k)) as
    *     pure codegen'd integer arithmetic.
    *
    * The input is persisted around the range exchange so its (often
    * expensive — model scoring) lineage computes ONCE, not once for the
    * range sampler and again for the shuffle. sortCols must be a total
    * order (tie-break on a unique id) or the rank is ill-defined. */
  private def globalNtile(df: DataFrame, k: Int, binName: String,
                          sortCols: String*): DataFrame = {
    val cached = df.persist()
    val ranged = cached
      .repartitionByRange(sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(true)
    cached.unpersist()
    // per-partition counts: one metadata-sized collect (the
    // quality_deciles broadcast-threshold budget — never node data)
    val parts = ranged
      .groupBy(shiftright(col("__mid"), 33).as("__pid"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = parts.map(_._2).sum
    val offs = parts.map(_._1)
      .zip(parts.map(_._2).scanLeft(0L)(_ + _))
    val offExpr = offs.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(shiftright(col("__mid"), 33) === lit(pid), lit(off))
        .otherwise(acc)
    }
    val base = n / k
    val rem = n % k
    val cut = rem * (base + 1)
    ranged
      .withColumn("__rank",
        offExpr + (col("__mid") % lit(1L << 33)) + lit(1L))
      // first `rem` tiles take base+1 rows, the rest base (the SQL
      // ntile rule); all integer DIV — engine-exact. max(base,1)
      // guards the (unreachable when n >= k) else-branch divisor.
      .withColumn(binName, expr(
        s"CAST(IF(__rank <= $cut, (__rank - 1) DIV ${base + 1} + 1, " +
          s"$rem + (__rank - $cut - 1) DIV ${math.max(base, 1L)} + 1) " +
          "AS BIGINT)"))
      .drop("__mid", "__rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flesch reading-ease per document from pure regexp-group counts
    // (a [aeiouy]+ group ≈ one syllable — the standard cheap
    // heuristic): counts fall out of length-difference arithmetic on
    // regexp_replace (collapse each group to one char vs none), which
    // is exact and engine-identical; the formula is the only double
    // arithmetic, rounded to 6. Zero-word docs get NULL, not a
    // division error.
    "readability_scores" -> ((s, dir) => {
      val lo = lower(col("text"))
      def groups(pat: String) =
        (length(regexp_replace(lo, pat, "#")) -
          length(regexp_replace(lo, pat, ""))).cast("long")
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          groups("[a-z0-9]+").as("n_words"),
          groups("[aeiouy]+").as("n_syllables"),
          greatest(groups("[.!?]+"), lit(1L)).as("n_sentences"))
        .withColumn("flesch", when(col("n_words") > 0,
          round(lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences").cast("double")) -
            lit(84.6) * (col("n_syllables").cast("double") /
              col("n_words").cast("double")), 6)))
        .orderBy("doc_id")
    }),

    // TextRank keywords: integer PageRank (Graph.pageRankQ, the
    // supplier_pagerank machinery — auto-scaled denominator, floor
    // arithmetic, bit-replayable) over the token co-occurrence graph
    // (distinct token pairs sharing a document). The node set is the
    // VOCABULARY — naturally bounded here; an open-vocabulary corpus
    // caps document frequency first (the ngram-containment df-cap
    // discipline). Oracle replays four unrolled CTE rounds over the
    // same pair set.
    "textrank_keywords" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(tokens(col("text")))).as("tok"))
      val pairs = toks.as("a").join(toks.as("b"), Seq("doc_id"))
        .filter(col("a.tok") < col("b.tok"))
        .select(col("a.tok").as("src"), col("b.tok").as("dst"))
        .distinct()
      val edges = pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.Graph.pageRankQ(edges, "src", "dst",
          iterations = 4, rankDenom = 0L)
        .orderBy(col("rank_q").desc, col("id"))
    }),

    // Zipf rank-frequency fit — the one-number vocabulary-health
    // check (natural corpora run slope ≈ −1; a flatter curve smells
    // of boilerplate/templating, a steeper one of vocabulary
    // collapse). OLS of ln(freq) on ln(rank) over the exact top-200
    // tokens; each ln rounds to 9 decimals (the psi_term libm-ulp
    // discipline), the four cross-row sums go through DECIMAL, and
    // the closed-form slope/intercept evaluate in doubles with the
    // same operation order on both engines.
    "zipf_slope" -> ((s, dir) => {
      val counts = Tables(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("token"))
      val top = counts.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 200)
        .select(round(log(col("rank").cast("double")), 9).as("x"),
          round(log(col("n").cast("double")), 9).as("y"))
      top
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("x").cast("decimal(28,12)")).cast("double").as("sx"),
          sum(col("y").cast("decimal(28,12)")).cast("double").as("sy"),
          sum((col("x") * col("y")).cast("decimal(28,12)")).cast("double")
            .as("sxy"),
          sum((col("x") * col("x")).cast("decimal(28,12)")).cast("double")
            .as("sxx"))
        .select(col("n_tokens"),
          round((col("n_tokens") * col("sxy") - col("sx") * col("sy")) /
            (col("n_tokens") * col("sxx") - col("sx") * col("sx")), 6)
            .as("slope"),
          round((col("sy") * col("sxx") - col("sx") * col("sxy")) /
            (col("n_tokens") * col("sxx") - col("sx") * col("sx")), 6)
            .as("intercept"))
    }),

    "text_stats" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        distinctTokenRatio(col("text")).as("distinct_ratio"),
        punctCount(col("text")).as("n_punct"),
        meanTokenLen(col("text")).as("mean_token_len"))
        .orderBy(col("doc_id"))),

    "text_quality" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        qualityScore(col("text")).as("quality"),
        stopwordRatio(col("text")).as("stopword_ratio"))
        .orderBy(col("doc_id"))),

    // Hashed-feature linear classifier (the fastText/VW quality-model
    // shape): per-token md5-bucket weights in integer micro-units,
    // summed as longs — exact order-independent arithmetic, one
    // codegen'd projection per document, no UDF/explode. Weights here
    // are hash-derived (the deterministic stand-in that exercises the
    // full scoring path; trained-weight form is LinearModel.linearScoreQ,
    // spec-pinned in TextFunctionsSpec).
    "quality_classifier" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
          col("doc_id"),
          graft.functions.LinearModel.hashedLinearScoreQ(col("text"), 4096)
            .as("logit_q"),
          tokenCount(col("text")).as("n_toks"))
        .withColumn("mean_logit",
          graft.functions.LinearModel.meanLogit(col("logit_q"), col("n_toks")))
        .withColumn("keep", col("logit_q") > 0)
        .orderBy(col("doc_id"))),

    // The TRAINED end of the classifier: fit NB-style posterior
    // weights on an 80% doc_id-hash split labeled `lang = 'en'`
    // (one exploded aggregation, exact integer arithmetic —
    // LinearModel.trainPosteriorWeightsQ), persist nothing here (the
    // pipeline's weightsPath form covers that), then score the WHOLE
    // corpus with the weights as a plan literal (linearScoreQ, the
    // production scoring path). Oracle retrains identically in
    // DuckDB — train → model → inference end-to-end, hash-checked.
    "quality_classifier_trained" -> ((s, dir) => {
      import graft.functions.LinearModel
      val docs = Tables(s, dir, "documents")
      val w = LinearModel.trainPosteriorWeightsQ(
        docs.filter(pmod(col("doc_id"), lit(10)) < 8)
          .select(col("text"), (col("lang") === "en").as("is_en")),
        "text", "is_en", 4096)
      docs.select(
          col("doc_id"),
          LinearModel.linearScoreQ(col("text"), w).as("score_q"),
          tokenCount(col("text")).as("n_toks"))
        .withColumn("keep", col("score_q") > 0)
        .orderBy(col("doc_id"))
    }),

    // Reliability diagram for the trained classifier: the HOLDOUT
    // split (doc_id%10 >= 8 — never seen by the trainer) is scored,
    // decile-binned on the integer micro-unit logit (ntile over a
    // total (score, doc_id) order — deterministic), and each bin
    // reports its actual positive rate vs its mean score. Everything
    // is exact integer arithmetic until the two final divisions, so
    // the calibration curve hash-matches across engines. A
    // well-calibrated ranker shows pos_rate monotone in the bin.
    "calibration_bins" -> ((s, dir) => {
      import graft.functions.LinearModel
      val docs = Tables(s, dir, "documents")
      val w = LinearModel.trainPosteriorWeightsQ(
        docs.filter(pmod(col("doc_id"), lit(10)) < 8)
          .select(col("text"), (col("lang") === "en").as("is_en")),
        "text", "is_en", 4096)
      globalNtile(docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
          .select(col("doc_id"), (col("lang") === "en").as("pos"),
            LinearModel.linearScoreQ(col("text"), w).as("score_q")),
          10, "bin", "score_q", "doc_id")
        .groupBy("bin").agg(
          count(lit(1)).as("n"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
          sum(col("score_q")).as("sum_score_q"))
        .select(col("bin"), col("n"), col("n_pos"),
          (col("n_pos").cast("double") / col("n").cast("double"))
            .as("pos_rate"),
          (col("sum_score_q").cast("double") / col("n").cast("double"))
            .as("mean_score_q"))
        .orderBy(col("bin"))
    }),

    // PAVA isotonic recalibration on top of calibration_bins' decile
    // table: the least-squares non-decreasing fit of the per-bin
    // positive rate (LinearModel.isotonicCalibrate — driver PAVA over
    // the cap-guarded bin GRID with exact rational pool comparisons).
    // The oracle replays it with the minimax identity iso(i) =
    // max_{j≤i} min_{k≥i} mean(j..k) over the tiny bin cross join —
    // both attain each pool's single Σpos/Σn division, so the fit
    // hash-matches.
    "calibration_isotonic" -> ((s, dir) => {
      import graft.functions.LinearModel
      val docs = Tables(s, dir, "documents")
      val w = LinearModel.trainPosteriorWeightsQ(
        docs.filter(pmod(col("doc_id"), lit(10)) < 8)
          .select(col("text"), (col("lang") === "en").as("is_en")),
        "text", "is_en", 4096)
      val binned = globalNtile(docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
          .select(col("doc_id"), (col("lang") === "en").as("pos"),
            LinearModel.linearScoreQ(col("text"), w).as("score_q")),
          10, "bin", "score_q", "doc_id")
        .groupBy("bin").agg(
          count(lit(1)).as("n"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
      LinearModel.isotonicCalibrate(binned, "bin", "n", "n_pos")
    }),

    // Weight-of-evidence / information-value profile of the quality
    // score against the language label — the credit-scoring feature
    // diagnostic. Quality deciles (deterministic (q, doc_id) ntile);
    // per bin WOE = ln(distr_pos/distr_neg) and IV term
    // (dp−dn)·ln(dp/dn), each rounded to 9 (psi_term discipline);
    // one-sided bins (np or nn = 0) get NULL WOE and a 0 IV term —
    // the documented convention, no ε.
    "woe_quality_bins" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = globalNtile(Tables(s, dir, "documents")
          .select(col("doc_id"), (col("lang") === "en").as("pos"),
            qualityScore(col("text")).as("q")),
          10, "bin", "q", "doc_id")
      val b = d.groupBy("bin").agg(
        count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("n_neg"))
      val w = Window.partitionBy()
      val dp = col("n_pos").cast("double") /
        sum(col("n_pos")).over(w).cast("double")
      val dn = col("n_neg").cast("double") /
        sum(col("n_neg")).over(w).cast("double")
      b.select(col("bin"), col("n"), col("n_pos"), col("n_neg"),
          dp.as("dp"), dn.as("dn"),
          when(col("n_pos") > 0 && col("n_neg") > 0,
            round(log(dp / dn), 9)).as("woe"),
          when(col("n_pos") > 0 && col("n_neg") > 0,
            round((dp - dn) * log(dp / dn), 9)).otherwise(lit(0.0))
            .as("iv_term"))
        .orderBy(col("bin"))
    }),

    // Cumulative gains/lift table over the trained classifier's
    // holdout deciles (the calibration_bins table read top-down):
    // what share of all positives does the top-k% of the ranking
    // capture, and at what lift over random. Exact integer cumsums;
    // three final divisions.
    "gains_table" -> ((s, dir) => {
      import graft.functions.LinearModel
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val w = LinearModel.trainPosteriorWeightsQ(
        docs.filter(pmod(col("doc_id"), lit(10)) < 8)
          .select(col("text"), (col("lang") === "en").as("is_en")),
        "text", "is_en", 4096)
      val b = globalNtile(docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
          .select(col("doc_id"), (col("lang") === "en").as("pos"),
            LinearModel.linearScoreQ(col("text"), w).as("score_q")),
          10, "bin", "score_q", "doc_id")
        .groupBy("bin").agg(
          count(lit(1)).as("n"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
      val desc = Window.orderBy(col("bin").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = Window.partitionBy()
      b.withColumn("cum_n", sum(col("n")).over(desc))
        .withColumn("cum_pos", sum(col("n_pos")).over(desc))
        .withColumn("tot_n", sum(col("n")).over(tot))
        .withColumn("tot_pos", sum(col("n_pos")).over(tot))
        .select(col("bin"), col("n"), col("n_pos"), col("cum_n"),
          col("cum_pos"),
          (col("cum_pos").cast("double") / col("tot_pos").cast("double"))
            .as("gain"),
          ((col("cum_pos").cast("double") / col("cum_n").cast("double")) /
            (col("tot_pos").cast("double") / col("tot_n").cast("double")))
            .as("lift"))
        .orderBy(col("bin").desc)
    }),

    // Corpus card: per-(lang, source) doc counts, token totals, and
    // mean quality — the summary a curated training set ships with.
    // One grouped aggregate; the mean is FLOOR-quantized to integer
    // micro-units per row before summing, so the cross-row sum is
    // order-independent (double avg is not associative) AND boundary-
    // stable across engines (a decimal CAST rounds .5 half-up in Spark
    // but half-even in DuckDB; floor of identical doubles can't
    // disagree). Divided back out to double only at the end.
    "corpus_report" -> ((s, dir) =>
      Tables(s, dir, "documents").select(col("lang"), col("source"),
          tokenCount(col("text")).as("n_toks"),
          qualityScore(col("text")).as("q"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("total_tokens"),
          (sum(floor(col("q") * 1e6).cast("long")).cast("double")
            / (count(lit(1)) * lit(1e6))).as("mean_quality"))
        .orderBy(col("lang"), col("source"))),

    // Compression-ratio quality signal (the zlib trick of crawl
    // curation: boilerplate/templated text compresses far below
    // prose, noise barely at all). Native codegen'd deflate — one
    // call per row, narrow map. Rows-only: DuckDB has no deflate;
    // byte-exact parity with java.util.zip is spec-pinned.
    "compression_ratio" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
          col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          graft.functions.HashFunctions.deflateLength(col("text"))
            .as("deflate_bytes"))
        .withColumn("ratio", col("deflate_bytes").cast("double") /
          greatest(col("n_bytes"), lit(1L)))
        .orderBy(col("doc_id"))),

    // HTML → prose extraction (the WET step of a crawl pipeline):
    // deterministic markup — style/script blocks, comments, entities,
    // a tag-wrapped body — is planted around each doc's text in SQL,
    // then stripped by the six-pass regex chain. Hash-green: the
    // oracle constructs the identical page and mirrors every pattern.
    "html_strip" -> ((s, dir) =>
      Tables(s, dir, "documents").select(col("doc_id"),
          concat(
            lit("<html><head><title>doc</title>" +
              "<style type=\"text/css\">p { color: #333; }</style>" +
              "<script>var t = 1 < 2 && \"x\";</script></head>" +
              "<body><!-- id: "),
            col("doc_id"), lit(" --><h1>Doc "), col("doc_id"),
            lit("</h1>\n<p class=\"main\">"), col("text"),
            lit(" &amp; more &lt;tags&gt; &quot;quoted&quot; " +
              "it&#39;s</p></body></html>")).as("html"))
        .select(col("doc_id"), stripHtml(col("html")).as("clean_text"))
        .withColumn("n_tokens", tokenCount(col("clean_text")))
        .orderBy(col("doc_id"))),

    // Out-of-vocabulary rate of the held-out split against the train
    // split's token vocabulary — the coverage check run before fixing
    // a tokenizer/vocab on a corpus. Vocabulary is a distinct-token
    // table (vocab-sized, not corpus-sized); the held-out stream
    // left-joins it on the token and aggregates per language. At
    // 100 TB both sides shuffle on the token — no broadcast pin, the
    // planner may still choose one when the vocab is small.
    "oov_rate" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val vocab = docs.filter(pmod(col("doc_id"), lit(10)) < 8)
        .select(explode(tokens(col("text"))).as("tok")).distinct()
      val held = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
        .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      held.join(vocab.withColumn("__in", lit(1)), Seq("tok"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate",
          col("n_oov").cast("double") / col("n_tokens"))
        .orderBy(col("lang"))
    }),

    "lang_id" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        col("lang"),
        langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),

    "lang_id_ngram" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        col("lang"),
        langIdNgram(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),

    // Chunking for embedding/retrieval: 16-token windows with 4-token
    // overlap, one row per (doc, chunk).
    "chunk_documents" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(chunkTokens(col("text"), chunkSize = 16, overlap = 4))
            .as(Seq("idx0", "chunk_text")))
        .select(col("doc_id"), (col("idx0") + 1).cast("long").as("chunk_idx"),
          col("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Token-budget truncation: keep the first 12 tokens, space-joined
    // (what a context-window bound applies before packing).
    "truncate_tokens" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        truncateTokens(col("text"), 12).as("head_text"))
        .orderBy(col("doc_id"))),

    // Token counting at the three granularities a data pipeline uses:
    // whitespace words (wc -w), alphanumeric tokens, and BPE-ish
    // pre-tokenizer pieces (GPT-2 pattern, vocab-free).
    "token_counts" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        whitespaceTokenCount(col("text")).as("n_ws_tokens"),
        tokenCount(col("text")).as("n_alnum_tokens"),
        bpePieceCount(col("text")).as("n_bpe_pieces"))
        .orderBy(col("doc_id"))),

    // Unicode NFC normalization (native codegen'd expression): the
    // canonicalization pass that runs BEFORE hashing/dedup — the same
    // logical text can arrive composed or decomposed, and md5
    // fingerprints would split it into two "documents". The corpus
    // plants decomposed e+COMBINING-ACUTE tails on every 20th doc;
    // hash-green, the oracle uses DuckDB's own nfc_normalize.
    "normalize_text" -> ((s, dir) => {
      import graft.functions.HashFunctions.nfcNormalize
      val decorated = Tables(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 20 === 0,
          concat(col("text"), lit(" caf"),
          // DECOMPOSED e + U+0301 as an explicit escape (an editor
          // could silently NFC-normalize a raw combining char; the
          // oracle's 'e' || chr(769) matches this exactly)
          lit("e\u0301")))
          .otherwise(col("text")).as("text"))
      decorated.select(col("doc_id"),
          md5(nfcNormalize(col("text"))).as("nfc_md5"),
          (nfcNormalize(col("text")) === col("text")).as("was_nfc"),
          (length(nfcNormalize(col("text"))) - length(col("text")))
            .cast("long").as("len_delta"))
        .orderBy(col("doc_id"))
    }),

    // ---- BPE tokenizer induction ------------------------------------
    // Corpus-weighted adjacent character-pair counts — round 0 of BPE
    // induction, hash-green (the oracle rebuilds word counts and char
    // pairs in SQL). The corpus is scanned once into the vocab-sized
    // word table; the pair count aggregates THAT.
    "bpe_pair_counts" -> ((s, dir) => {
      import graft.operators.BpeInduction
      val words = BpeInduction
        .wordCounts(Tables(s, dir, "documents"), "text")
        .select(BpeInduction.toSymbols(col("word")).as("symbols"),
          col("cnt"))
      BpeInduction.pairCounts(words)
        .orderBy(col("cnt").desc, col("pair")).limit(50)
        .orderBy(col("cnt").desc, col("pair"))
    }),

    // The learned merge list (20 rounds). Rows-only: the iterative
    // induction has no SQL twin; exact parity with a single-JVM
    // reference BPE is pinned in BpeSpec. Merges are memoized per
    // sfDir — they are a pure function of the corpus, so repeated
    // evaluations (verify, bench cold+warm) must not re-run 20
    // vocab-table rounds.
    "bpe_merges" -> ((s, dir) => {
      val m = bpeMergesFor(s, dir)
      import s.implicits._
      m.zipWithIndex.map { case ((a, b), i) => (i + 1L, a, b) }
        .toDF("rnk", "left", "right").orderBy(col("rnk"))
    }),

    // Documents encoded with the induced tokenizer: per-doc BPE symbol
    // count + the first 12 symbols. Vocab-path encoder: the merge fold
    // runs once per DISTINCT word, token instances broadcast-join to
    // their encodings. Rows-only (merges are corpus-derived);
    // encoder-vs-reference parity in BpeSpec.
    "bpe_encode" -> ((s, dir) => {
      import graft.operators.BpeInduction
      val m = bpeMergesFor(s, dir)
      BpeInduction.encodeCorpus(Tables(s, dir, "documents"),
          "doc_id", "text", m)
        .select(col("doc_id"),
          size(col("bpe")).cast("long").as("n_bpe"),
          array_join(slice(col("bpe"), 1, 12), " ").as("head_syms"))
        .orderBy(col("doc_id"))
    }),

    // Heavy hitters, the scale pattern: a Misra–Gries sketch nominates
    // ≤k candidate tokens (fixed-size state over the shuffle), then an
    // exact count of ONLY the candidates picks the true top-10 — the
    // sketch guarantees every token with freq > N/(k+1) is nominated,
    // so the final ranking is deterministic and oracle-matched.
    "heavy_hitter_tokens" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("token"))
      val cands = toks
        // k=1000 keeps the capture bound (freq > N/1001) far below any
        // plausible top-10 frequency; for this corpus's small lorem
        // vocabulary the sketch never even overflows, so nomination is
        // exact — either way the exact-count pass does the ranking
        .agg(graft.functions.SketchFunctions.frequentItems(col("token"), 1000)
          .as("cands"))
        .select(explode(col("cands")).as("c"))
        .select(col("c.item").as("token"))
      toks.join(broadcast(cands), Seq("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(10)
    }),

    // PII redaction over text with planted emails/phones (the corpus
    // itself is synthetic, so the query injects deterministic PII and
    // scrubs it — the oracle mirrors both steps).
    "pii_redact" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        redactPii(concat(col("text"), lit(" contact: user"),
          col("doc_id").cast("string"),
          lit("@example.com or +1 555 123 4567")))
          .as("clean_text"))
        .orderBy(col("doc_id"))),

    // Gopher-style repetition signals: share of token/bigram
    // occurrences taken by the single most frequent one (boilerplate,
    // loops, and chant text score high; natural prose stays low).
    "repetition_stats" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        topTokenFraction(col("text")).as("top_token_frac"),
        topBigramFraction(col("text")).as("top_bigram_frac"))
        .orderBy(col("doc_id"))),

    // Boilerplate detection at the sentence level (the C4-style "same
    // line in ≥2 documents" signal): explode sentences, find the ones
    // shared across documents, and score each doc's boilerplate
    // fraction. Two shuffles — sentence-key count (map-side combined)
    // and the doc-key rollup; sentences shuffle as values once, and
    // the shared-set join keys on the sentence itself (no broadcast
    // assumption — boilerplate sets are corpus-scale).
    "boilerplate_sentences" -> ((s, dir) => {
      val sents = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), "[.!?]+")).as("raw"))
        .select(col("doc_id"), trim(col("raw")).as("sent"))
        .filter(length(col("sent")) > 0)
      val shared = sents.groupBy("sent")
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= 2)
      sents.join(shared, Seq("sent"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sents"),
          count(col("n_docs")).as("n_boiler"),
          (count(col("n_docs")).cast("double") / count(lit(1)))
            .as("boiler_frac"))
        .orderBy(col("doc_id"))
    }),

    // Unigram-LM cross-entropy — the model-based quality signal
    // (high xent ≈ unusual token mix ≈ noise): pass 1 aggregates
    // corpus token counts (one shuffle on token), pass 2 joins each
    // doc's tokens to their counts and averages -ln p(tok). The
    // token↔count join is a plain shuffle join — the vocabulary is
    // corpus-scale, nothing broadcast; the grand total is ONE scalar
    // broadcast (quality_threshold_filter's shape). ROUND(4) on both
    // sides absorbs fold-order float drift in the average.
    "unigram_logprob" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      // total from the vocab-sized counts, NOT a third corpus explode
      // (exchange reuse does not fire across the branches — measured
      // on tfidf_keywords, same shape)
      val total = counts.agg(sum(col("c")).as("n_total"))
      toks.join(counts, "tok")
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(-avg(log(col("c").cast("double") / col("n_total"))), 4)
            .as("xent"))
        .orderBy(col("doc_id"))
    }),

    // DSIR-style importance weights (Xie et al. 2023, data selection
    // via importance resampling): per-doc avg of ln p_target(tok) −
    // ln p_raw(tok), where the target LM comes from the in-domain
    // slice (source = 'src0') and the raw LM from the whole corpus.
    // Docs whose token mix looks target-like score high and would be
    // resampled in. Both LMs come from ONE conditional aggregation
    // over one token explode (never two corpus passes for the two
    // models); target counts are add-1 smoothed over the vocab so
    // out-of-target tokens stay finite; totals + vocab size ride one
    // scalar broadcast; the scoring join shuffles on the token key
    // (vocab-scale, AQE's call). unigram_logprob's ROUND(4) rule.
    "dsir_importance" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(tokens(col("text"))).as("tok"))
      val counts = toks.groupBy("tok").agg(
        count(lit(1)).as("c_raw"),
        count(when(col("source") === "src0", lit(1))).as("c_tgt"))
      val totals = counts.agg(
        sum(col("c_raw")).as("n_raw"),
        sum(col("c_tgt")).as("n_tgt"),
        count(lit(1)).as("vocab"))
      toks.join(counts, "tok")
        .crossJoin(broadcast(totals))
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(
            log((col("c_tgt") + 1).cast("double") /
              (col("n_tgt") + col("vocab"))) -
            log(col("c_raw").cast("double") / col("n_raw"))), 4)
            .as("importance"))
        .orderBy(col("doc_id"))
    }),

    // Bigram-LM cross-entropy — the CCNet-perplexity-style filter one
    // order up from unigram_logprob: xent = −avg ln p(tok | prev)
    // with p from corpus bigram/prefix counts. Token PAIRS come from
    // a lag window per doc (one doc-key shuffle of the exploded
    // stream — no self-join on position); bigram counts then prefix
    // counts are two aggregations over the already-slim pair stream;
    // scoring joins on the bigram key. Every scored pair exists in
    // the corpus LM, so no smoothing term is needed.
    "bigram_logprob" -> ((s, dir) => {
      val wPos = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val pairs = Tables(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("prev", lag(col("tok"), 1).over(wPos))
        .filter(col("prev").isNotNull)
      val bg = pairs.groupBy("prev", "tok").agg(count(lit(1)).as("c_bg"))
      val pf = bg.groupBy("prev").agg(sum(col("c_bg")).as("c_prev"))
      pairs.join(bg, Seq("prev", "tok")).join(pf, Seq("prev"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(-avg(log(col("c_bg").cast("double") / col("c_prev"))), 4)
            .as("xent2"))
        .orderBy(col("doc_id"))
    }),

    // Quality-decile binning — the "sort corpus into quality tiers"
    // curation step, in the scale shape: ONE exact-percentile
    // aggregate produces the 9 thresholds, broadcast as a scalar
    // array; each doc bins with a codegen'd count-of-thresholds-below
    // — never a global-order ntile window (which would serialize the
    // corpus through one partition).
    "quality_deciles" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), qualityScore(col("text")).as("quality"))
      val thr = docs.agg(expr(
        "percentile(quality, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
        .as("thr"))
      docs.crossJoin(broadcast(thr))
        .select(col("doc_id"), col("quality"),
          (lit(1) + size(filter(col("thr"), t => t <= col("quality"))))
            .cast("long").as("decile"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          min(col("quality")).as("min_q"), max(col("quality")).as("max_q"))
        .orderBy(col("decile"))
    }),

    // Count-Min frequency sketch over the token stream — the
    // complement of the Misra-Gries heavy hitters (MG nominates WHO is
    // frequent; CM answers "how often is X" for ANY x from a
    // fixed-size counter grid). Only the eps×δ counter grid crosses
    // the shuffle (counter addition — order-independent, so the
    // result is deterministic under the fixed seed); the sketch and
    // the exact top-10 ranking are metadata-sized driver pulls. The
    // CM guarantee (exact ≤ est ≤ exact + 2εN) is spec-pinned;
    // rows-only here (no DuckDB analog).
    "token_freq_sketch" -> ((s, dir) => {
      import s.implicits._
      val toks = Tables(s, dir, "documents")
        .select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("tok"))
      val skBytes = toks
        .agg(count_min_sketch(col("tok"), lit(0.001), lit(0.99), lit(42))
          .as("sk"))
        .head.getAs[Array[Byte]](0)
      val cm = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(skBytes))
      val top = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("tok")).limit(10).collect()
      top.toSeq.map(r => (r.getString(0), r.getLong(1),
          cm.estimateCount(r.getString(0))))
        .toDF("token", "n_exact", "n_est")
        .orderBy(col("token"))
    }),

    // The composed document-level quality gate: length bounds, lexical
    // diversity, phrase repetition, stopword presence → one keep/drop
    // boolean per doc (the decision a curation pipeline filters on).
    "gopher_quality_filter" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        distinctTokenRatio(col("text")).as("distinct_ratio"),
        topBigramFraction(col("text")).as("top_bigram_frac"),
        stopwordRatio(col("text")).as("stopword_ratio"),
        gopherKeep(col("text")).as("keep"))
        .orderBy(col("doc_id"))),

    // Percentile-gated curation: keep docs at or above the corpus's
    // 75th quality percentile. The threshold is ONE exact-percentile
    // aggregate (sort-based, one double column) broadcast as a scalar
    // — dynamic thresholds beat fixed ones when corpus mix drifts.
    "quality_threshold_filter" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select(
        col("doc_id"), qualityScore(col("text")).as("quality"))
      val thr = docs.agg(expr("percentile(quality, 0.75)").as("thr"))
      docs.crossJoin(broadcast(thr))
        .filter(col("quality") >= col("thr"))
        .select(col("doc_id"), col("quality"))
        .orderBy(col("doc_id"))
    }),

    "doc_fingerprint" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        fingerprint(col("text")).as("fp"),
        // BPE-ish subword count: ceil(len/4) per token, summed.
        aggregate(tokens(col("text")), lit(0L),
          (acc, t) => acc + floor((length(t) + 3).cast("double") / 4.0).cast("long"))
          .as("n_subwords"))
        .orderBy(col("doc_id"))),

    // TF-IDF keyword extraction: per-doc top-3 terms. The idf is the
    // RAW Sparck-Jones ratio N/df, not its log — tf·N is exact integer
    // arithmetic and one IEEE division is bit-identical across
    // engines, where ln() is libm-dependent and would make the rank
    // (and the hash gate) flap on near-ties. Shape at 100 TB: the
    // corpus TEXT is read exactly once (one explode → (doc,term)
    // shuffle for tf); df is a COUNT window over tf's slim output on
    // the term key — a join back to a separate df aggregate would
    // re-derive tf from a second corpus scan (exchange reuse does not
    // fire across the branches; measured); N is a zero-column
    // metadata-only count broadcast as a scalar; top-k is a per-doc
    // window. Two shuffles of slim rows total, one text read.
    "tfidf_keywords" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val tf = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val wTerm = org.apache.spark.sql.expressions.Window
        .partitionBy(col("term"))
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("weight").desc, col("term"))
      tf.withColumn("df", count(lit(1)).over(wTerm))
        .crossJoin(broadcast(n))
        .withColumn("weight",
          (col("tf") * col("n_docs")).cast("double") / col("df"))
        .withColumn("rnk", row_number().over(wDoc).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("weight"),
          col("rnk"))
        .orderBy(col("doc_id"), col("rnk"))
    }))

  /** Trained-classifier + holdout decile-bin CTEs shared by the
    * calibration_bins / calibration_isotonic oracles — ends with
    * `b(bin, n, n_pos, sum_score_q)`, the exact-integer bin table. */
  private val calibrationBinsCtes =
    s"""tr AS (
       |  SELECT unnest($tokensSql) AS tok, lang = 'en' AS pos
       |  FROM documents WHERE doc_id % 10 < 8),
       |w AS (
       |  SELECT CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 4096
       |           AS b,
       |         (SUM(CASE WHEN pos THEN 1 ELSE 0 END) + 1) * 1000003
       |           // (COUNT(*) + 2) - 500001 AS wq
       |  FROM tr GROUP BY b),
       |tok AS (
       |  SELECT doc_id, unnest($tokensSql) AS tok FROM documents
       |  WHERE doc_id % 10 >= 8),
       |sc AS (
       |  SELECT t.doc_id, SUM(COALESCE(w.wq, 0)) AS score_q
       |  FROM tok t LEFT JOIN w
       |    ON CAST(('0x' || substring(md5(t.tok), 1, 8)) AS BIGINT) % 4096
       |       = w.b
       |  GROUP BY t.doc_id),
       |hold AS (
       |  SELECT d.doc_id, d.lang = 'en' AS pos,
       |         CAST(COALESCE(sc.score_q, 0) AS BIGINT) AS score_q
       |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
       |  WHERE d.doc_id % 10 >= 8),
       |binned AS (
       |  SELECT *, CAST(ntile(10) OVER (ORDER BY score_q, doc_id)
       |                 AS BIGINT) AS bin
       |  FROM hold),
       |b AS (
       |  SELECT bin, COUNT(*) AS n,
       |         CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_pos,
       |         CAST(SUM(score_q) AS BIGINT) AS sum_score_q
       |  FROM binned GROUP BY bin)""".stripMargin

  /** The textrank_keywords pair set for
    * [[AnalyticsQueries.pageRankCtes]]: distinct co-occurring token
    * pairs, ordered src < dst. */
  private val textrankPairsSql =
    s"""
       |  SELECT DISTINCT a.tok AS src, b.tok AS dst
       |  FROM (SELECT doc_id, unnest(list_distinct($tokensSql)) AS tok
       |        FROM documents) a
       |  JOIN (SELECT doc_id, unnest(list_distinct($tokensSql)) AS tok
       |        FROM documents) b
       |  USING (doc_id) WHERE a.tok < b.tok""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "readability_scores" ->
      """WITH r AS (SELECT doc_id, lower(text) AS lo FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(length(regexp_replace(lo, '[a-z0-9]+', '#', 'g'))
        |       - length(regexp_replace(lo, '[a-z0-9]+', '', 'g'))
        |       AS BIGINT) AS n_words,
        |    CAST(length(regexp_replace(lo, '[aeiouy]+', '#', 'g'))
        |       - length(regexp_replace(lo, '[aeiouy]+', '', 'g'))
        |       AS BIGINT) AS n_syllables,
        |    GREATEST(CAST(length(regexp_replace(lo, '[.!?]+', '#', 'g'))
        |       - length(regexp_replace(lo, '[.!?]+', '', 'g'))
        |       AS BIGINT), 1) AS n_sentences
        |  FROM r)
        |SELECT doc_id, n_words, n_syllables, n_sentences,
        |  CASE WHEN n_words > 0 THEN
        |    round(206.835
        |      - 1.015 * (CAST(n_words AS DOUBLE)
        |                 / CAST(n_sentences AS DOUBLE))
        |      - 84.6 * (CAST(n_syllables AS DOUBLE)
        |                / CAST(n_words AS DOUBLE)), 6) END AS flesch
        |FROM c ORDER BY doc_id""".stripMargin,
    "textrank_keywords" ->
      s"""WITH ${AnalyticsQueries.pageRankCtes(4, textrankPairsSql)}
         |SELECT id, CAST(rank_q AS BIGINT) AS rank_q
         |FROM pr4 ORDER BY rank_q DESC, id""".stripMargin,
    "zipf_slope" ->
      s"""WITH toks AS (
         |  SELECT unnest($tokensSql) AS token FROM documents),
         |counts AS (
         |  SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
         |top AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rnk
         |  FROM counts QUALIFY rnk <= 200),
         |v AS (
         |  SELECT round(ln(CAST(rnk AS DOUBLE)), 9) AS x,
         |         round(ln(CAST(n AS DOUBLE)), 9) AS y
         |  FROM top),
         |s AS (
         |  SELECT COUNT(*) AS n_tokens,
         |         CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
         |         CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
         |         CAST(SUM(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
         |         CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx
         |  FROM v)
         |SELECT n_tokens,
         |       round((n_tokens * sxy - sx * sy) /
         |             (n_tokens * sxx - sx * sx), 6) AS slope,
         |       round((sy * sxx - sx * sxy) /
         |             (n_tokens * sxx - sx * sx), 6) AS intercept
         |FROM s""".stripMargin,
    "text_stats" ->
      s"""SELECT doc_id,
         |  len(toks) AS n_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  len(list_distinct(toks)) / GREATEST(len(toks), 1) AS distinct_ratio,
         |  length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
         |  COALESCE(list_aggregate(list_transform(toks, t -> CAST(length(t) AS BIGINT)), 'sum'), 0)
         |    / GREATEST(len(toks), 1) AS mean_token_len
         |FROM (SELECT doc_id, text, $tokensSql AS toks FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         |  $qualitySql AS quality,
         |  len(list_filter(toks, t -> list_contains(['the','a','an','of','to','in','and','is','on','for'], t)))
         |    / GREATEST(len(toks), 1) AS stopword_ratio
         |FROM (SELECT doc_id, text, $tokensSql AS toks FROM documents)
         |ORDER BY doc_id""".stripMargin,
    // mirrors LinearModel: bucket = md5 first-8-hex % 4096, weight =
    // bucket·2654435761 mod 1000003 − 500001, all-BIGINT; empty token
    // lists score 0 (Spark aggregate's init value; list_reduce errors
    // on [] so the CASE guard is required here)
    "quality_classifier" ->
      s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
         |s AS (SELECT doc_id,
         |        CASE WHEN len(toks) = 0 THEN 0 ELSE
         |          CAST(list_reduce(list_transform(toks,
         |            tok -> (CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 4096)
         |                     * 2654435761 % 1000003 - 500001),
         |            (a, b) -> a + b) AS BIGINT)
         |        END AS logit_q,
         |        len(toks) AS n_toks
         |      FROM t)
         |SELECT doc_id, logit_q, CAST(n_toks AS BIGINT) AS n_toks,
         |  CAST(logit_q AS DOUBLE)
         |    / (1000003.0 * GREATEST(CAST(n_toks AS DOUBLE), 1.0)) AS mean_logit,
         |  logit_q > 0 AS keep
         |FROM s ORDER BY doc_id""".stripMargin,
    // mirrors LinearModel.trainPosteriorWeightsQ + linearScoreQ: train
    // on doc_id%10<8 labeled lang='en', w_q[b] = (pos+1)*1000003 //
    // (n+2) - 500001 (integer division — exact cross-engine; buckets
    // unseen in training contribute 0), score every doc
    "quality_classifier_trained" ->
      s"""WITH tr AS (
         |  SELECT unnest($tokensSql) AS tok, lang = 'en' AS pos
         |  FROM documents WHERE doc_id % 10 < 8),
         |w AS (
         |  SELECT CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 4096
         |           AS b,
         |         (SUM(CASE WHEN pos THEN 1 ELSE 0 END) + 1) * 1000003
         |           // (COUNT(*) + 2) - 500001 AS wq
         |  FROM tr GROUP BY b),
         |tok AS (SELECT doc_id, unnest($tokensSql) AS tok FROM documents),
         |sc AS (
         |  SELECT t.doc_id, SUM(COALESCE(w.wq, 0)) AS score_q,
         |         COUNT(*) AS n
         |  FROM tok t LEFT JOIN w
         |    ON CAST(('0x' || substring(md5(t.tok), 1, 8)) AS BIGINT) % 4096
         |       = w.b
         |  GROUP BY t.doc_id)
         |SELECT d.doc_id,
         |  CAST(COALESCE(sc.score_q, 0) AS BIGINT) AS score_q,
         |  CAST(COALESCE(sc.n, 0) AS BIGINT) AS n_toks,
         |  COALESCE(sc.score_q, 0) > 0 AS keep
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // trained-classifier CTEs + decile binning on the holdout split;
    // integer arithmetic end to end except the two final divisions
    "calibration_bins" ->
      s"""WITH $calibrationBinsCtes
         |SELECT bin, n, n_pos,
         |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
         |  CAST(sum_score_q AS DOUBLE) / CAST(n AS DOUBLE)
         |    AS mean_score_q
         |FROM b ORDER BY bin""".stripMargin,
    "woe_quality_bins" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang = 'en' AS pos, ($qualitySql) AS q
         |  FROM (SELECT doc_id, lang, text, $tokensSql AS toks
         |        FROM documents)),
         |binned AS (
         |  SELECT *, CAST(ntile(10) OVER (ORDER BY q, doc_id) AS BIGINT)
         |              AS bin
         |  FROM d),
         |b AS (
         |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_pos,
         |    CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_neg
         |  FROM binned GROUP BY 1),
         |r AS (
         |  SELECT *,
         |    CAST(n_pos AS DOUBLE) / CAST(SUM(n_pos) OVER () AS DOUBLE)
         |      AS dp,
         |    CAST(n_neg AS DOUBLE) / CAST(SUM(n_neg) OVER () AS DOUBLE)
         |      AS dn
         |  FROM b)
         |SELECT bin, n, n_pos, n_neg, dp, dn,
         |  CASE WHEN n_pos > 0 AND n_neg > 0
         |       THEN round(ln(dp / dn), 9) END AS woe,
         |  CASE WHEN n_pos > 0 AND n_neg > 0
         |       THEN round((dp - dn) * ln(dp / dn), 9)
         |       ELSE 0.0 END AS iv_term
         |FROM r ORDER BY bin""".stripMargin,
    "gains_table" ->
      s"""WITH $calibrationBinsCtes,
         |g AS (
         |  SELECT bin, n, n_pos,
         |    CAST(SUM(n) OVER (ORDER BY bin DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_n,
         |    CAST(SUM(n_pos) OVER (ORDER BY bin DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum_pos,
         |    CAST(SUM(n) OVER () AS BIGINT) AS tot_n,
         |    CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos
         |  FROM b)
         |SELECT bin, n, n_pos, cum_n, cum_pos,
         |  CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE) AS gain,
         |  (CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE))
         |    / (CAST(tot_pos AS DOUBLE) / CAST(tot_n AS DOUBLE)) AS lift
         |FROM g ORDER BY bin DESC""".stripMargin,
    // the bin table + the isotonic minimax identity: iso(i) =
    // max_{j<=i} min_{k>=i} mean(j..k) — a 10-bin cross join; the
    // attained optimum is each PAVA pool's exact Sum-pos/Sum-n
    // division, matching the operator's driver PAVA bit for bit
    "calibration_isotonic" ->
      s"""WITH $calibrationBinsCtes,
         |r AS (
         |  SELECT j.bin AS jb, k.bin AS kb,
         |         CAST(SUM(m.n_pos) AS DOUBLE)
         |           / CAST(SUM(m.n) AS DOUBLE) AS mean
         |  FROM b j JOIN b k ON j.bin <= k.bin
         |  JOIN b m ON m.bin BETWEEN j.bin AND k.bin
         |  GROUP BY 1, 2),
         |im AS (
         |  SELECT i.bin, r.jb, MIN(r.mean) AS mn
         |  FROM b i JOIN r ON r.jb <= i.bin AND i.bin <= r.kb
         |  GROUP BY 1, 2),
         |iso AS (SELECT bin, MAX(mn) AS iso_rate FROM im GROUP BY bin)
         |SELECT b.bin, b.n, b.n_pos,
         |  CAST(b.n_pos AS DOUBLE) / CAST(b.n AS DOUBLE) AS pos_rate,
         |  iso.iso_rate
         |FROM b JOIN iso USING (bin) ORDER BY b.bin""".stripMargin,
    "normalize_text" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 20 = 0 THEN text || ' caf' || 'e' || chr(769)
        |         ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id, md5(nfc_normalize(text)) AS nfc_md5,
        |  nfc_normalize(text) = text AS was_nfc,
        |  CAST(length(nfc_normalize(text)) - length(text) AS BIGINT)
        |    AS len_delta
        |FROM t ORDER BY doc_id""".stripMargin,
    // mirrors BpeInduction.wordCounts + pairCounts: same tokenizer,
    // char pairs as "left right", counts weighted by word frequency
    "bpe_pair_counts" ->
      s"""SELECT pair, cnt FROM (
         |  WITH w AS (SELECT unnest($tokensSql) AS word FROM documents),
         |  wc AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word),
         |  p AS (SELECT unnest(list_transform(range(1, length(word)),
         |          i -> substring(word, CAST(i AS INTEGER), 1) || ' ' ||
         |               substring(word, CAST(i AS INTEGER) + 1, 1))) AS pair,
         |          cnt
         |        FROM wc)
         |  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS cnt FROM p
         |  GROUP BY pair ORDER BY cnt DESC, pair LIMIT 50)
         |ORDER BY cnt DESC, pair""".stripMargin,
    "corpus_report" ->
      s"""SELECT lang, source, COUNT(*) AS n_docs,
         |  CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
         |  CAST(SUM(CAST(FLOOR(($qualitySql) * 1000000) AS BIGINT)) AS DOUBLE)
         |    / (COUNT(*) * 1000000) AS mean_quality
         |FROM (SELECT lang, source, text, $tokensSql AS toks FROM documents)
         |GROUP BY lang, source
         |ORDER BY lang, source""".stripMargin,
    // mirrors TextFunctions.stripHtml pattern-for-pattern on the same
    // constructed page (entity decode order matters: &amp; LAST)
    "html_strip" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    '<html><head><title>doc</title><style type="text/css">p { color: #333; }</style><script>var t = 1 < 2 && "x";</script></head><body><!-- id: '
         |    || CAST(doc_id AS VARCHAR) || ' --><h1>Doc '
         |    || CAST(doc_id AS VARCHAR) || '</h1>' || chr(10)
         |    || '<p class="main">' || text
         |    || ' &amp; more &lt;tags&gt; &quot;quoted&quot; it&#39;s</p></body></html>'
         |      AS html
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, trim(regexp_replace(
         |    regexp_replace(
         |      regexp_replace(
         |        regexp_replace(
         |          regexp_replace(
         |            regexp_replace(
         |              regexp_replace(
         |                regexp_replace(
         |                  regexp_replace(
         |                    regexp_replace(html,
         |                      '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'),
         |                    '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g'),
         |                  '(?s)<!--.*?-->', ' ', 'g'),
         |                '(?s)<[^>]*>', ' ', 'g'),
         |              '&lt;', '<', 'g'),
         |            '&gt;', '>', 'g'),
         |          '&quot;', '"', 'g'),
         |        '&#39;', '''', 'g'),
         |      '&amp;', '&', 'g'),
         |    '\\s+', ' ', 'g')) AS clean_text
         |  FROM h)
         |SELECT doc_id, clean_text,
         |  CAST(len(list_filter(str_split_regex(lower(clean_text),
         |    '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tokens
         |FROM c ORDER BY doc_id""".stripMargin,
    // mirrors the oov_rate split/vocab/join exactly
    "oov_rate" ->
      s"""WITH v AS (
         |  SELECT DISTINCT unnest($tokensSql) AS tok
         |  FROM documents WHERE doc_id % 10 < 8),
         |h AS (
         |  SELECT lang, unnest($tokensSql) AS tok
         |  FROM documents WHERE doc_id % 10 >= 8),
         |j AS (SELECT h.lang, v.tok AS vt
         |      FROM h LEFT JOIN v ON h.tok = v.tok)
         |SELECT lang, COUNT(*) AS n_tokens,
         |  CAST(SUM(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_oov,
         |  CAST(SUM(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS oov_rate
         |FROM j GROUP BY lang ORDER BY lang""".stripMargin,
    "lang_id" ->
      s"""SELECT doc_id, lang,
         |  CASE
         |    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |    WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |    WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |    WHEN s_fr >= s_zh THEN 'fr'
         |    ELSE 'zh'
         |  END AS lang_pred
         |FROM (
         |  SELECT doc_id, lang,
         |    len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein','mit'], t))) AS s_de,
         |    len(list_filter(toks, t -> list_contains(['the','a','of','to','in','and','is','on'], t))) AS s_en,
         |    len(list_filter(toks, t -> list_contains(['el','la','de','que','y','los','del','las'], t))) AS s_es,
         |    len(list_filter(toks, t -> list_contains(['le','la','les','de','et','un','une','est'], t))) AS s_fr,
         |    len(list_filter(toks, t -> list_contains(['de','shi','le','bu','wo','you','zai','ta'], t))) AS s_zh
         |  FROM (SELECT doc_id, lang, $tokensSql AS toks FROM documents))
         |ORDER BY doc_id""".stripMargin,
    "lang_id_ngram" -> {
      def score(lang: String): String =
        graft.functions.TextFunctions.langTrigrams.toMap.apply(lang)
          .map(t => s"(length(lt) - length(replace(lt, '$t', ''))) / 3")
          .mkString(" + ")
      s"""SELECT doc_id, lang,
         |  CASE
         |    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |    WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |    WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |    WHEN s_fr >= s_zh THEN 'fr'
         |    ELSE 'zh'
         |  END AS lang_pred
         |FROM (
         |  SELECT doc_id, lang,
         |    ${score("de")} AS s_de,
         |    ${score("en")} AS s_en,
         |    ${score("es")} AS s_es,
         |    ${score("fr")} AS s_fr,
         |    ${score("zh")} AS s_zh
         |  FROM (SELECT doc_id, lang, lower(text) AS lt FROM documents))
         |ORDER BY doc_id""".stripMargin
    },

    "truncate_tokens" ->
      s"""SELECT doc_id,
         |  array_to_string(list_slice($tokensSql, 1, 12), ' ') AS head_text
         |FROM documents ORDER BY doc_id""".stripMargin,
    "chunk_documents" ->
      s"""SELECT doc_id,
         |  CAST(unnest(range(1, len(chunks) + 1)) AS BIGINT) AS chunk_idx,
         |  unnest(chunks) AS chunk_text
         |FROM (
         |  SELECT doc_id,
         |    list_transform(range(1, greatest(len(toks) - 4, 1) + 1, 12),
         |      s -> array_to_string(list_slice(toks, s, s + 15), ' ')) AS chunks
         |  FROM (SELECT doc_id, $tokensSql AS toks FROM documents))
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    "token_counts" ->
      s"""SELECT doc_id,
         |  CASE WHEN length(trim(text)) = 0 THEN 0
         |       ELSE len(str_split_regex(trim(text), '\\s+')) END AS n_ws_tokens,
         |  len($tokensSql) AS n_alnum_tokens,
         |  len(regexp_extract_all(text,
         |    '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'))
         |    AS n_bpe_pieces
         |FROM documents ORDER BY doc_id""".stripMargin,
    "heavy_hitter_tokens" ->
      s"""SELECT t AS token, COUNT(*) AS n
         |FROM (SELECT unnest(toks) AS t
         |      FROM (SELECT $tokensSql AS toks FROM documents))
         |GROUP BY t ORDER BY n DESC, token LIMIT 10""".stripMargin,
    "pii_redact" ->
      s"""SELECT doc_id,
         |  regexp_replace(
         |    regexp_replace(
         |      text || ' contact: user' || CAST(doc_id AS VARCHAR)
         |           || '@example.com or +1 555 123 4567',
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\\+?\\d[\\d() -]{7,}\\d', '<PHONE>', 'g') AS clean_text
         |FROM documents ORDER BY doc_id""".stripMargin,
    "quality_threshold_filter" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    $qualitySql AS quality
         |  FROM (SELECT doc_id, text, $tokensSql AS toks FROM documents))
         |SELECT doc_id, quality
         |FROM q, (SELECT quantile_cont(quality, 0.75) AS thr FROM q)
         |WHERE quality >= thr
         |ORDER BY doc_id""".stripMargin,
    "quality_deciles" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    $qualitySql AS quality
         |  FROM (SELECT doc_id, text, $tokensSql AS toks FROM documents)),
         |thr AS (
         |  SELECT [quantile_cont(quality, 0.1), quantile_cont(quality, 0.2),
         |          quantile_cont(quality, 0.3), quantile_cont(quality, 0.4),
         |          quantile_cont(quality, 0.5), quantile_cont(quality, 0.6),
         |          quantile_cont(quality, 0.7), quantile_cont(quality, 0.8),
         |          quantile_cont(quality, 0.9)] AS t FROM q)
         |SELECT CAST(1 + len(list_filter(t, x -> x <= quality)) AS BIGINT) AS decile,
         |  COUNT(*) AS n_docs, MIN(quality) AS min_q, MAX(quality) AS max_q
         |FROM q, thr
         |GROUP BY 1
         |ORDER BY decile""".stripMargin,
    "boilerplate_sentences" ->
      """WITH sents AS (
        |  SELECT doc_id, trim(x) AS sent
        |  FROM (SELECT doc_id, unnest(str_split_regex(text, '[.!?]+')) AS x
        |        FROM documents)
        |  WHERE length(trim(x)) > 0),
        |shared AS (
        |  SELECT sent FROM sents GROUP BY sent
        |  HAVING COUNT(DISTINCT doc_id) >= 2)
        |SELECT s.doc_id, COUNT(*) AS n_sents,
        |  COUNT(sh.sent) AS n_boiler,
        |  CAST(COUNT(sh.sent) AS DOUBLE) / COUNT(*) AS boiler_frac
        |FROM sents s LEFT JOIN shared sh ON s.sent = sh.sent
        |GROUP BY s.doc_id
        |ORDER BY s.doc_id""".stripMargin,
    "unigram_logprob" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(t) AS tok
         |  FROM (SELECT doc_id, $tokensSql AS t FROM documents)),
         |counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
         |total AS (SELECT COUNT(*) AS n_total FROM toks)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |  ROUND(-AVG(LN(CAST(c AS DOUBLE) / n_total)), 4) AS xent
         |FROM toks JOIN counts USING (tok) CROSS JOIN total
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    "dsir_importance" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source, unnest(t) AS tok
         |  FROM (SELECT doc_id, source, $tokensSql AS t FROM documents)),
         |counts AS (
         |  SELECT tok, COUNT(*) AS c_raw,
         |         COUNT(*) FILTER (WHERE source = 'src0') AS c_tgt
         |  FROM toks GROUP BY tok),
         |totals AS (
         |  SELECT SUM(c_raw) AS n_raw, SUM(c_tgt) AS n_tgt,
         |         COUNT(*) AS vocab
         |  FROM counts)
         |SELECT doc_id, source, COUNT(*) AS n_tokens,
         |  ROUND(AVG(LN(CAST(c_tgt + 1 AS DOUBLE) / (n_tgt + vocab))
         |          - LN(CAST(c_raw AS DOUBLE) / n_raw)), 4) AS importance
         |FROM toks JOIN counts USING (tok) CROSS JOIN totals
         |GROUP BY doc_id, source
         |ORDER BY doc_id""".stripMargin,
    "bigram_logprob" ->
      s"""WITH pairs AS (
         |  SELECT doc_id, prev, tok FROM (
         |    SELECT doc_id, tok,
         |           lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |    FROM (SELECT doc_id, unnest(toks) AS tok,
         |                 unnest(range(1, len(toks) + 1)) AS pos
         |          FROM (SELECT doc_id, $tokensSql AS toks FROM documents)))
         |  WHERE prev IS NOT NULL),
         |bg AS (SELECT prev, tok, COUNT(*) AS c_bg FROM pairs
         |       GROUP BY prev, tok),
         |pf AS (SELECT prev, SUM(c_bg) AS c_prev FROM bg GROUP BY prev)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |  ROUND(-AVG(LN(CAST(c_bg AS DOUBLE) / c_prev)), 4) AS xent2
         |FROM pairs JOIN bg USING (prev, tok) JOIN pf USING (prev)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    "repetition_stats" ->
      s"""SELECT doc_id,
         |  COALESCE(list_aggregate(list_transform(list_distinct(toks),
         |      x -> len(list_filter(toks, y -> y = x))), 'max'), 0)
         |    / GREATEST(len(toks), 1) AS top_token_frac,
         |  COALESCE(list_aggregate(list_transform(list_distinct(bgs),
         |      x -> len(list_filter(bgs, y -> y = x))), 'max'), 0)
         |    / GREATEST(len(bgs), 1) AS top_bigram_frac
         |FROM (SELECT doc_id, toks,
         |        list_transform(range(1, GREATEST(len(toks) - 1, 0) + 1),
         |          i -> toks[i] || ' ' || toks[i + 1]) AS bgs
         |      FROM (SELECT doc_id, $tokensSql AS toks FROM documents))
         |ORDER BY doc_id""".stripMargin,
    "gopher_quality_filter" ->
      s"""SELECT doc_id, n_tokens, distinct_ratio, top_bigram_frac,
         |  stopword_ratio,
         |  (n_tokens >= 20 AND n_tokens <= 90 AND distinct_ratio >= 0.4
         |    AND top_bigram_frac <= 0.05 AND stopword_ratio >= 0.02) AS keep
         |FROM (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    len(list_distinct(toks)) / GREATEST(len(toks), 1) AS distinct_ratio,
         |    COALESCE(list_aggregate(list_transform(list_distinct(bgs),
         |        x -> len(list_filter(bgs, y -> y = x))), 'max'), 0)
         |      / GREATEST(len(bgs), 1) AS top_bigram_frac,
         |    len(list_filter(toks, t -> list_contains(
         |        ['the','a','an','of','to','in','and','is','on','for'], t)))
         |      / GREATEST(len(toks), 1) AS stopword_ratio
         |  FROM (SELECT doc_id, toks,
         |          list_transform(range(1, GREATEST(len(toks) - 1, 0) + 1),
         |            i -> toks[i] || ' ' || toks[i + 1]) AS bgs
         |        FROM (SELECT doc_id, $tokensSql AS toks FROM documents)))
         |ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      s"""SELECT doc_id, md5(text) AS fp,
         |  CAST(COALESCE(list_aggregate(list_transform(toks,
         |    t -> CAST(floor((length(t) + 3) / 4.0) AS BIGINT)), 'sum'), 0) AS BIGINT) AS n_subwords
         |FROM (SELECT doc_id, text, $tokensSql AS toks FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "tfidf_keywords" ->
      s"""WITH tf AS (
         |  SELECT doc_id, t AS term, COUNT(*) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS t
         |        FROM (SELECT doc_id, $tokensSql AS toks FROM documents))
         |  GROUP BY doc_id, t),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents)
         |SELECT doc_id, term, tf, weight, rnk FROM (
         |  SELECT doc_id, term, tf,
         |         CAST(tf * n_docs AS DOUBLE) / df AS weight,
         |         row_number() OVER (PARTITION BY doc_id
         |                            ORDER BY CAST(tf * n_docs AS DOUBLE) / df
         |                              DESC, term) AS rnk
         |  FROM tf JOIN df USING (term) CROSS JOIN n)
         |WHERE rnk <= 3
         |ORDER BY doc_id, rnk""".stripMargin)
}
