package graft.app

import graft.model.{PipelineConfig, PipelineStep, UserException}
import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Executes a parsed [[PipelineConfig]] — the curation library
  * (lang-ID → quality gates → dedup → split/sample) behind the CLI's
  * config-in/JSON-out protocol. Each step delegates to the
  * spec-pinned library operator; this file owns only composition,
  * path resolution, and the opt-in per-step stats.
  *
  * Scale posture: the composed job is one declarative plan unless
  * stats are requested — filters fuse into the scan, the dedup steps
  * contribute their own bounded shuffles, and nothing here collects
  * to the driver. `collectStats` bounds its overhead to one
  * persist+count per step and unpersists eagerly.
  */
object Pipeline {

  final case class StepReport(kind: String, rows: Option[Long])
  final case class Report(rowsIn: Option[Long], rowsOut: Long,
                          steps: Seq[StepReport], output: String)

  def run(spark: SparkSession, p: PipelineConfig,
          dataDir: String): Report = {
    val inPath = resolve(p.input, dataDir)
    val outPath = resolve(p.output, dataDir)
    val src = p.format match {
      case "csv" => spark.read.option("header", "true").csv(inPath)
      case _     => spark.read.parquet(inPath)
    }
    Seq(p.idColumn, p.textColumn).foreach { c =>
      if (!src.columns.contains(c))
        throw new UserException(
          s"Pipeline input has no column '$c' " +
            s"(available: ${src.columns.mkString(", ")})")
    }
    // rows_in: free for parquet (footer metadata), a whole extra parse
    // pass for CSV — so for CSV it is reported only under the same
    // opt-in that licenses the per-step counts
    val rowsIn =
      if (p.format == "csv" && !p.collectStats) None else Some(src.count())

    var prev: Option[DataFrame] = None
    val (result, reports) = p.steps.foldLeft((src, Vector.empty[StepReport])) {
      case ((df, reps), step) =>
        val next = apply(df, step, p)
        if (p.collectStats) {
          val cached = next.persist()
          val n = cached.count()
          prev.foreach(_.unpersist()) // previous stage fed this count
          prev = Some(cached)
          (cached, reps :+ StepReport(step.kind, Some(n)))
        } else (next, reps :+ StepReport(step.kind, None))
    }
    result.write.mode("overwrite").parquet(outPath)
    prev.foreach(_.unpersist())
    // parquet footers make this a metadata-only job
    val rowsOut = spark.read.parquet(outPath).count()
    Report(rowsIn, rowsOut, reports, outPath)
  }

  private def apply(df: DataFrame, step: PipelineStep,
                    p: PipelineConfig): DataFrame = {
    import PipelineStep._
    val text = col(p.textColumn)
    step match {
      case LangFilter(langs) =>
        df.filter(TextFunctions.langId(text).isin(langs: _*))
      case QualityFilter(minScore) =>
        df.filter(TextFunctions.qualityScore(text) >= minScore)
      case g: GopherFilter =>
        df.filter(TextFunctions.gopherKeep(text, g.minTokens, g.maxTokens,
          g.minDistinctRatio, g.maxTopBigramFrac, g.minStopwordRatio))
      case DedupExact =>
        Dedup.exactCorpus(df, p.idColumn, p.textColumn)
      case d: DedupMinhash =>
        val pairs = Dedup.minhashNearDupPairs(df, p.idColumn, p.textColumn,
          d.shingleSize, d.k, d.bands, d.threshold)
        Dedup.dropNearDups(df, pairs, p.idColumn)
      case PiiRedact =>
        df.withColumn(p.textColumn, TextFunctions.redactPii(text))
      case Sample(fraction) =>
        Sampling.deterministicSample(df, p.idColumn, fraction)
      case Split(tr, va, column) =>
        df.withColumn(column,
          Sampling.splitLabel(col(p.idColumn), tr, va))
    }
  }

  private def resolve(path: String, dataDir: String): String =
    if (path.startsWith("/") || path.contains("://")) path
    else s"$dataDir/$path"
}
