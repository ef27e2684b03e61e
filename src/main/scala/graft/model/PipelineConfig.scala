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

  /** Rewrite the text column with
    * [[graft.functions.TextFunctions.redactPii]]. */
  case object PiiRedact extends PipelineStep { val kind = "piiRedact" }

  /** Deterministic hash sample
    * ([[graft.operators.Sampling.deterministicSample]]). */
  final case class Sample(fraction: Double) extends PipelineStep {
    val kind = "sample"
  }

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
  */
final case class PipelineConfig(
    input: String,
    output: String,
    idColumn: String = "doc_id",
    textColumn: String = "text",
    format: String = "parquet",
    steps: Seq[PipelineStep] = Nil,
    collectStats: Boolean = false)
