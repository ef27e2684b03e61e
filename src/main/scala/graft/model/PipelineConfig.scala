package graft.model

/** Config surface for the `pipeline` action — the engine's curation
  * library (lang-ID → quality gates → dedup → split/sample) exposed
  * through the reference's own entry-point idiom: config-in,
  * JSON-status-out (reference: run.php:21-56 — the reference only
  * speaks writer configs; this is the engine-grade extension of the
  * same protocol).
  *
  * Every step maps 1:1 onto an already-spec-pinned library operator;
  * the parser validates shape/ranges (UserException → exit 1) and the
  * runner ([[graft.app.Pipeline]]) never interprets raw JSON.
  */
sealed trait PipelineStep { def kind: String }

object PipelineStep {
  /** Keep rows whose [[graft.functions.TextFunctions.langId]] is in
    * `languages`. */
  final case class LangFilter(languages: Seq[String]) extends PipelineStep {
    val kind = "langFilter"
  }

  /** Keep rows with [[graft.functions.TextFunctions.qualityScore]]
    * ≥ `minScore`. */
  final case class QualityFilter(minScore: Double) extends PipelineStep {
    val kind = "qualityFilter"
  }

  /** Keep rows passing [[graft.functions.TextFunctions.gopherKeep]];
    * defaults mirror that operator's. */
  final case class GopherFilter(minTokens: Long = 20L, maxTokens: Long = 90L,
                                minDistinctRatio: Double = 0.4,
                                maxTopBigramFrac: Double = 0.05,
                                minStopwordRatio: Double = 0.02)
      extends PipelineStep {
    val kind = "gopherFilter"
  }

  /** Exact dedup — smallest id survives per identical content
    * ([[graft.operators.Dedup.exactCorpus]]). */
  case object DedupExact extends PipelineStep { val kind = "dedupExact" }

  /** MinHash+LSH near-dedup: candidate pairs at Jaccard ≥ `threshold`,
    * greedy smallest-id-survives drop
    * ([[graft.operators.Dedup.minhashNearDupPairs]] + `dropNearDups`). */
  final case class DedupMinhash(threshold: Double = 0.5,
                                shingleSize: Int = 3, k: Int = 20,
                                bands: Int = 5) extends PipelineStep {
    val kind = "dedupMinhash"
  }

  /** Edit-distance dedup on a short-string column (titles, names —
    * entity resolution): among rows whose `column` values are within
    * `maxDist` edits ([[graft.operators.FuzzyJoin.selfJoin]]'s
    * SymSpell candidate scheme — never all-pairs), the smallest id
    * survives ([[graft.operators.Dedup.dropNearDups]]). */
  final case class DedupFuzzy(column: String, maxDist: Int = 1,
                              maxBucket: Int = 10000) extends PipelineStep {
    val kind = "dedupFuzzy"
  }

  /** Robust outlier filter: drop rows whose numeric `column` deviates
    * from its median (per `groupBy` group when set, else global) by
    * more than `maxMads` scaled MADs — two
    * [[graft.operators.Percentiles.exactGroupedPercentiles]] passes,
    * so the step stays bounded-memory at any group size. Rows with a
    * NULL value (or an all-NULL group) are kept: the step removes
    * outliers, it does not adjudicate missing data. A zero-MAD group
    * (over half its values identical) keeps only its median-valued
    * rows — the standard robust-z convention, documented here because
    * it is strict. */
  final case class MadOutlierFilter(column: String, maxMads: Double = 3.0,
                                    groupBy: Option[String] = None)
      extends PipelineStep {
    val kind = "madOutlierFilter"
  }

  /** Winsorize a numeric column: clamp into its per-group (or global)
    * exact [`loFrac`,`hiFrac`]-percentile band
    * ([[graft.operators.Percentiles.winsorize]]) — cap the heavy tail
    * instead of dropping the document (the clamp twin of
    * [[MadOutlierFilter]]). NULL values stay NULL. */
  final case class Winsorize(column: String, loFrac: Double = 0.01,
                             hiFrac: Double = 0.99,
                             groupBy: Option[String] = None)
      extends PipelineStep {
    val kind = "winsorize"
  }

  /** Hashed-feature linear classifier gate
    * ([[graft.functions.LinearModel]]): keep rows whose mean per-token
    * logit ≥ `minMeanLogit`. `weightsQ` carries trained micro-unit
    * weights inline (a `Seq` — NOT an `Array` — so the case-class
    * toString that feeds the checkpoint chain fingerprint renders the
    * values, not an identity hash); `weightsPath` loads a
    * LinearModel.saveWeightsQ parquet model instead (mutually
    * exclusive with weightsQ — the file's content rides the
    * checkpoint fingerprint via the secondary-input summary, like
    * decontamination eval sets); absent both, the deterministic
    * hash-derived weights score (the gate-query form). */
  final case class ClassifierFilter(minMeanLogit: Double = 0.0,
                                    dim: Int = 4096,
                                    weightsQ: Option[Seq[Long]] = None,
                                    weightsPath: Option[String] = None)
      extends PipelineStep {
    val kind = "classifierFilter"
  }

  /** Drop rows whose `column` value appears in an EXTERNAL blocklist
    * dataset — the domain/source blocklist pass of crawl curation
    * (C4/RefinedWeb-style URL filtering): ONE left-anti join against
    * the blocklist's DISTINCT values, broadcast-hinted (a blocklist
    * is dimension-sized against a 100 TB corpus). The blocklist
    * file's content rides the checkpoint fingerprint like eval sets.
    * NULL column values SURVIVE (a blocklist matches values; NULL is
    * no value — gate NULLs with a check step if they must not pass). */
  final case class BlocklistFilter(input: String, column: String,
                                   valueColumn: String,
                                   format: String = "parquet")
      extends PipelineStep {
    val kind = "blocklistFilter"
  }

  /** FIT a whitening model on the current frame's embedding column
    * and PERSIST it to `modelPath`
    * ([[graft.operators.Whitening.fit]] + `saveModel`) — the fit half
    * of the whiten lifecycle, so fit → apply is config-reachable end
    * to end (fit once on the curated corpus, consume via [[Whiten]]
    * in every downstream run). Row-identity: the model artifact is
    * the product. `dim` is the declared vector length — explicit,
    * never probed (the engine's never-infer rule). The fit is ONE
    * fixed-size-state aggregation + a driver d≤1024 eigen solve.
    * Checkpoint semantics: the step chains and reuses like any other,
    * but a reused step whose artifact was pruned REFITS (same inputs
    * → same model) instead of silently leaving no model. */
  final case class FitWhiten(modelPath: String, dim: Int,
                             column: String = "embedding")
      extends PipelineStep {
    val kind = "fitWhiten"
  }

  /** Rewrite an embedding column (array of float/double) through a
    * PERSISTED whitening model
    * ([[graft.operators.Whitening.loadModel]]) — fit once out-of-band
    * (`Whitening.fit` + `saveModel`), apply in every pipeline run:
    * the classifierFilter `weightsPath` discipline, so the model
    * file's content rides the checkpoint fingerprint via the
    * secondary-input summary. `k` absent → ZCA whitening in place
    * (same column name and length); `k` present → projection onto the
    * top-k principal components (column length becomes k),
    * variance-scaled when `whitened`. A codegen'd narrow map either
    * way — no shuffle, no UDF. */
  final case class Whiten(modelPath: String,
                          column: String = "embedding",
                          k: Option[Int] = None,
                          whitened: Boolean = true,
                          eps: Double = 1e-9)
      extends PipelineStep {
    val kind = "whiten"
  }

  /** Rewrite the text column with
    * [[graft.functions.TextFunctions.redactPii]]. */
  case object PiiRedact extends PipelineStep { val kind = "piiRedact" }

  /** Unicode-NFC-normalize the text column
    * ([[graft.functions.NfcNormalize]]) — run BEFORE dedup steps so
    * composed/decomposed variants of the same text collapse. */
  case object Normalize extends PipelineStep { val kind = "normalize" }

  /** Rewrite the text column with
    * [[graft.functions.TextFunctions.stripHtml]] — the WET-extraction
    * step; run FIRST on crawl-shaped corpora so every downstream
    * filter/dedup sees prose, not markup. */
  case object HtmlStrip extends PipelineStep { val kind = "htmlStrip" }

  /** Assert-before-publish gate ([[graft.operators.DataChecks]]): the
    * pipeline FAILS (exit 1) if any declared check finds violations —
    * a curated corpus that would ship broken ids/empty text never
    * reaches the output path. Row-preserving when green (the step is
    * an identity on the data). */
  final case class CheckStep(notNull: Seq[String] = Nil,
                             unique: Seq[String] = Nil,
                             minRows: Long = 0L) extends PipelineStep {
    val kind = "check"
  }

  /** Deterministic hash sample
    * ([[graft.operators.Sampling.deterministicSample]]). */
  final case class Sample(fraction: Double) extends PipelineStep {
    val kind = "sample"
  }

  /** Deterministic weight-proportional top-n sample
    * ([[graft.operators.Sampling.weightedSample]] — A-ES keys); rows
    * with NULL/non-positive weight are excluded. The helper `key_q`
    * column is dropped from the step output. */
  final case class WeightedSample(n: Int, weightColumn: String)
      extends PipelineStep {
    val kind = "weightedSample"
  }

  /** Per-stratum keep fractions
    * ([[graft.operators.Sampling.stratifiedSample]]) — cap dominant
    * languages/sources, keep all of rare ones. */
  final case class StratifiedSample(strataColumn: String,
                                    fractions: Map[String, Double],
                                    default: Double) extends PipelineStep {
    val kind = "stratifiedSample"
  }

  /** Truncate the text column to its first `maxTokens` tokens
    * ([[graft.functions.TextFunctions.truncateTokens]]). */
  final case class TruncateTokens(maxTokens: Int) extends PipelineStep {
    val kind = "truncateTokens"
  }

  /** Tag rows with training-sequence bins (`pack_bucket`, `bin_id`,
    * plus the derived `n_tokens`) —
    * [[graft.operators.Sampling.packBins]]'s cumulative packing. */
  final case class Pack(targetTokens: Long, buckets: Int)
      extends PipelineStep {
    val kind = "pack"
  }

  /** Drop documents sharing any word n-gram with a held-out eval set
    * (benchmark decontamination; eval shingles broadcast, the corpus
    * scan never shuffles its own shingles). */
  final case class Decontaminate(evalPath: String, evalFormat: String,
                                 evalTextColumn: String, ngram: Int)
      extends PipelineStep {
    val kind = "decontaminate"
  }

  /** Drop documents whose shingle-set Jaccard with ANY eval document
    * reaches `threshold` ([[graft.operators.Dedup.fuzzyDecontaminate]]
    * — catches eval leakage that survived light edits, which the exact
    * [[Decontaminate]] screen misses). */
  final case class DecontaminateFuzzy(evalPath: String, evalFormat: String,
                                      evalTextColumn: String,
                                      threshold: Double = 0.8,
                                      shingleSize: Int = 3)
      extends PipelineStep {
    val kind = "decontaminateFuzzy"
  }

  /** Deterministic weighted mixture of the current frame (weight
    * first) with extra corpora ([[graft.operators.Sampling
    * .weightedMix]]); adds `source_id` (0 = the pipeline's input). */
  final case class Mix(weight: Double, extra: Seq[MixSource])
      extends PipelineStep {
    val kind = "mix"
  }
  final case class MixSource(input: String, weight: Double, format: String)

  /** Domain-quota step: each `sourceColumn` group keeps its
    * `maxPerSource` highest-quality documents
    * ([[graft.functions.TextFunctions.qualityScore]] ranking, one
    * per-source window — never a global sort).
    *
    * With `graphPrior` set, the quota SCALES with each source's
    * authority weight from the supplied table — a PageRank/HITS
    * ranking composed into curation
    * ([[graft.operators.Sampling.capPerSourceWeighted]]):
    * cap(s) = max(1, maxPerSource·w(s) div max_w). The prior file's
    * content rides the checkpoint chain via the secondary-input
    * summary, like decontamination eval sets. */
  final case class CapPerSource(sourceColumn: String, maxPerSource: Int,
                                graphPrior: Option[GraphPrior] = None)
      extends PipelineStep {
    val kind = "capPerSource"
  }

  /** Authority table for [[CapPerSource]]: `sourceColumn` matches the
    * frame's source values, `weightColumn` holds integral weights
    * (the graph operators' `*_q` micro-unit outputs). Defaults match
    * [[graft.operators.Graph.pageRankQ]]'s (id, rank_q) schema. */
  final case class GraphPrior(input: String, format: String = "parquet",
                              sourceColumn: String = "id",
                              weightColumn: String = "rank_q")

  /** Append a leakage-free train/val/test label column
    * ([[graft.operators.Sampling.splitLabel]]). */
  final case class Split(trainPct: Int, valPct: Int, column: String)
      extends PipelineStep {
    val kind = "split"
  }
}

/** @param input    source path — absolute, or relative to the job's
  *                 data dir; parquet (default) or csv-with-header
  * @param output   destination directory for the curated parquet
  * @param collectStats when true the runner counts rows after every
  *                 step (one bounded persist per step) and the status
  *                 JSON reports them; default off — counting is not
  *                 free at 100 TB, so it is opt-in observability
  * @param checkpointDir when set, every step's output materializes
  *                 under `<dir>/step_<i>_<kind>` with a chain
  *                 fingerprint marker, and a re-run reuses each step
  *                 whose (input, upstream-chain, step-config)
  *                 fingerprint still matches — a 100 TB curation job
  *                 that dies at step 5 resumes at step 5 instead of
  *                 redoing days of work. Opt-in: it trades one extra
  *                 materialization per step for resumability.
  */
final case class PipelineConfig(
    input: String,
    output: String,
    idColumn: String = "doc_id",
    textColumn: String = "text",
    format: String = "parquet",
    steps: Seq[PipelineStep] = Nil,
    collectStats: Boolean = false,
    checkpointDir: Option[String] = None)
