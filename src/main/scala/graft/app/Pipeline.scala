package graft.app

import graft.model.{PipelineConfig, PipelineStep, UserException}
import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, explode, row_number}

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

  final case class StepReport(kind: String, rows: Option[Long],
                              reused: Boolean = false)
  final case class Report(rowsIn: Option[Long], rowsOut: Long,
                          steps: Seq[StepReport], output: String)

  def run(spark: SparkSession, p: PipelineConfig,
          dataDir: String): Report = {
    val inPath = resolve(p.input, dataDir)
    val outPath = resolve(p.output, dataDir)
    val src = readInput(spark, inPath, p.format)
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

    val ckpt = p.checkpointDir.map(d => new Checkpointer(
      spark, resolve(d, dataDir), chainSeed(spark, p, inPath)))
    var prev: Option[DataFrame] = None
    val (result, reports) = p.steps.zipWithIndex
      .foldLeft((src, Vector.empty[StepReport])) {
        case ((df, reps), (step, i)) =>
          val (next, reused) = ckpt match {
            case Some(c) => c.stepOutput(step, i,
              secondaryInputSummary(spark, step, dataDir),
              () => apply(df, step, p, dataDir))
            case None => (apply(df, step, p, dataDir), false)
          }
          // fitWhiten's product is the model ARTIFACT, not the frame:
          // a checkpoint-reused step whose artifact was pruned must
          // REFIT (same inputs → same model), never leave no model
          step match {
            case f: PipelineStep.FitWhiten if reused =>
              val mp = new org.apache.hadoop.fs.Path(
                resolve(f.modelPath, dataDir))
              val mfs = mp.getFileSystem(spark.sessionState.newHadoopConf())
              if (!graft.sources.PartitionedStore.hasDataEntries(mfs, mp)) {
                apply(df, f, p, dataDir); ()
              }
            case _ => ()
          }
          if (p.collectStats) {
            // checkpointed steps count free via parquet footers; only
            // the in-memory path needs the persist
            if (ckpt.isDefined)
              (next, reps :+ StepReport(step.kind, Some(next.count()), reused))
            else {
              val cached = next.persist()
              val n = cached.count()
              prev.foreach(_.unpersist()) // previous stage fed this count
              prev = Some(cached)
              (cached, reps :+ StepReport(step.kind, Some(n), reused))
            }
          } else (next, reps :+ StepReport(step.kind, None, reused))
      }
    // checkpoint-protect the FINAL write too: on a fully-reused rerun
    // the last step's copy is the single largest write of the job —
    // skip it when the output still carries the chain's end fingerprint
    val skipFinal = ckpt.exists(_.outputCurrent(outPath))
    if (!skipFinal) {
      result.write.mode("overwrite").parquet(outPath)
      ckpt.foreach(_.markOutput(outPath))
    }
    prev.foreach(_.unpersist())
    // parquet footers make this a metadata-only job; the explicit
    // schema keeps a ZERO-ROW output readable (an empty dir has no
    // footers to infer from — the hasDataEntries lesson), so a
    // filter-everything pipeline reports rows_out: 0, not exit 2
    val rowsOut = spark.read.schema(result.schema).parquet(outPath).count()
    Report(rowsIn, rowsOut, reports, outPath)
  }

  /** One reader for every pipeline input (primary, mix sources, eval
    * sets) — format dispatch must not diverge between them. */
  private def readInput(spark: SparkSession, path: String,
                        format: String): DataFrame = format match {
    case "csv" => spark.read.option("header", "true").csv(path)
    case _     => spark.read.parquet(path)
  }

  /** File-metadata summary of a step's SECONDARY datasets (an eval
    * set, mix sources) for the checkpoint chain: the step's toString
    * carries only the PATH strings, so without this a regenerated
    * eval set under the same path would silently reuse a stale
    * decontamination. Empty for steps without secondary inputs. */
  private def secondaryInputSummary(spark: SparkSession,
                                    step: PipelineStep,
                                    dataDir: String): String = {
    import PipelineStep._
    val paths = step match {
      case d: Decontaminate      => Seq(d.evalPath)
      case d: DecontaminateFuzzy => Seq(d.evalPath)
      case m: Mix                => m.extra.map(_.input)
      case c: ClassifierFilter   => c.weightsPath.toSeq // retrained model
      case w: Whiten             => Seq(w.modelPath) // refitted model
      case b: BlocklistFilter    => Seq(b.input) // regenerated blocklist
      case c: CapPerSource       => c.graphPrior.map(_.input).toSeq
      case _                     => Nil
    }
    paths.map(pp => fileSummary(spark, resolve(pp, dataDir))).mkString(";")
  }

  /** Caveat (object stores): `getModificationTime` over s3a is the
    * object's last-PUT time — real for the direct children listed
    * here, but this listing is NON-recursive, so an in-place rewrite
    * of a file nested under an unchanged child directory (same names,
    * same lengths) is not detected. HDFS/local (the tested paths)
    * surface directory mtime bumps; on object stores treat the
    * fingerprint as name+length identity and regenerate inputs under
    * a NEW path (the layout every writer in this engine already
    * produces — overwrite mode replaces the direct children). */
  private def fileSummary(spark: SparkSession, dir: String): String = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) "absent"
    else fs.listStatus(path).toSeq.sortBy(_.getPath.getName)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .mkString(",")
  }

  /** Chain-fingerprint seed: the resolved input identity plus a cheap
    * metadata summary of its files (name, length, mtime) — a
    * regenerated input under the same path invalidates every
    * checkpoint without scanning a byte of data. */
  private def chainSeed(spark: SparkSession, p: PipelineConfig,
                        inPath: String): String =
    md5Hex(s"$inPath|${p.format}|${p.idColumn}|${p.textColumn}|" +
      fileSummary(spark, inPath))

  private[app] def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Per-step materialize-or-reuse. The marker (`_DONE` holding the
    * chain fingerprint + the step's output schema) commits AFTER the
    * data write — a crash mid-write leaves a markerless directory the
    * re-run recomputes (mode=overwrite clears it), never a half-step
    * that validates. The fingerprint chains (seed → step₀ → step₁ →
    * …), so editing step k's config recomputes k and everything after
    * it while steps before k still reuse. The stored schema keeps a
    * ZERO-ROW step readable on reuse (no footers to infer from). */
  private final class Checkpointer(spark: SparkSession, dir: String,
                                   seed: String) {
    private var fp = seed
    private val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

    def stepOutput(step: PipelineStep, i: Int, secondaries: String,
                   compute: () => DataFrame): (DataFrame, Boolean) = {
      // case-class toString is a deterministic full rendering of the
      // step's parameters — the config identity to chain; secondary
      // datasets (eval sets, mix sources) contribute their file
      // metadata since the toString holds only their path strings
      fp = md5Hex(s"$fp|$step|$secondaries")
      val stepDir = s"$dir/step_${i}_${step.kind}"
      val marker = new org.apache.hadoop.fs.Path(stepDir, "_DONE")
      // marker format: fingerprint line + schema JSON line + an
      // optional third line ("data"|"empty") recording whether the
      // committed write produced data files
      val stored: Option[Array[String]] =
        if (!fs.exists(marker)) None
        else {
          val in = fs.open(marker)
          try Some(new String(in.readAllBytes(), "UTF-8").split("\n", 3))
          finally in.close()
        }
      // a marker without the schema line (or with a stale fp) reads as
      // invalid — reuse requires the chain identity, a readable
      // schema, AND the data files the marker promises: without the
      // last check a later prune of stepDir (checkpoint GC, manual rm)
      // would silently reuse an emptied directory and report success.
      // A genuinely zero-row step output (marker line "empty" — no
      // part files to lose) stays reusable. Markers from before the
      // data line existed carry no promise — treated as promising data
      // (the conservative side: a pruned dir recomputes; a legit
      // zero-row old step recomputes ONCE and rewrites a marker that
      // then reuses).
      val okStored = stored.filter { a =>
        a.head == fp && a.length > 1 && a(1).nonEmpty && {
          val promisesData = a.length < 3 || a(2).trim != "empty"
          !promisesData || graft.sources.PartitionedStore.hasDataEntries(
            fs, new org.apache.hadoop.fs.Path(stepDir))
        }
      }
      val schema = okStored match {
        case Some(a) =>
          org.apache.spark.sql.types.DataType.fromJson(a(1))
            .asInstanceOf[org.apache.spark.sql.types.StructType]
        case None =>
          val out = compute()
          out.write.mode("overwrite").parquet(stepDir)
          val wrote = graft.sources.PartitionedStore.hasDataEntries(
            fs, new org.apache.hadoop.fs.Path(stepDir))
          val w = fs.create(marker, true)
          try w.write((fp + "\n" + out.schema.json + "\n" +
            (if (wrote) "data" else "empty")).getBytes("UTF-8"))
          finally w.close()
          out.schema
      }
      (spark.read.schema(schema).parquet(stepDir), okStored.isDefined)
    }

    /** Does `outPath` already hold the chain's END fingerprint? (Call
      * after all stepOutput calls — `fp` is then the final chain.)
      * Same data-promise check as step reuse: a fingerprint-current
      * marker over a pruned output directory must NOT skip the final
      * write (old fp-only markers promise data — conservative). */
    def outputCurrent(outPath: String): Boolean = {
      val marker = new org.apache.hadoop.fs.Path(outPath, "_DONE")
      fs.exists(marker) && {
        val in = fs.open(marker)
        val lines =
          try new String(in.readAllBytes(), "UTF-8").split("\n", 2)
          finally in.close()
        lines.head == fp && {
          val promisesData = lines.length < 2 || lines(1).trim != "empty"
          !promisesData || graft.sources.PartitionedStore.hasDataEntries(
            fs, new org.apache.hadoop.fs.Path(outPath))
        }
      }
    }

    def markOutput(outPath: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(outPath)
      val wrote = graft.sources.PartitionedStore.hasDataEntries(fs, p)
      val out = fs.create(new org.apache.hadoop.fs.Path(p, "_DONE"), true)
      try out.write(
        (fp + "\n" + (if (wrote) "data" else "empty")).getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** One micro-batch through the step chain — the streaming face of
    * [[run]] ([[graft.streaming.DocumentStreams.streamingPipeline]]
    * calls this from foreachBatch). Differences from the batch path,
    * each forced by streaming semantics:
    *
    *  - The INPUT is the micro-batch frame, so the checkpoint chain
    *    seeds off `batchId` + the step-config rendering instead of an
    *    input file summary: under Structured Streaming's offset-log
    *    contract a replayed batch_id delivers the same rows, so the
    *    id IS the data identity the batch path derives from files.
    *  - Output lands at `<output>/batch_id=<id>` with overwrite — the
    *    same idempotent-replay partition scheme as every streaming
    *    corpus sink here (foreachBatch is at-least-once; a replayed
    *    batch overwrites itself, never duplicates).
    *  - Step checkpoints live under `<root>/batch_<id>` and exist for
    *    INTRA-batch crash resume (a 12-step curation chain that dies
    *    at step 9 replays the batch but reuses steps 0–8). Once batch
    *    N commits, batches < N can never replay again, so their step
    *    dirs are garbage — deleted here after N's output lands (GC
    *    failure is non-fatal: stale dirs cost storage, not
    *    correctness).
    *  - No stats/report: per-step counts are batch-mode observability;
    *    a standing stream meters its sink instead.
    */
  private[graft] def runMicroBatch(bdf: DataFrame, p: PipelineConfig,
                                   dataDir: String,
                                   stepCkptRoot: Option[String],
                                   batchId: Long): Unit = {
    val spark = bdf.sparkSession
    Seq(p.idColumn, p.textColumn).foreach { c =>
      if (!bdf.columns.contains(c))
        throw new UserException(
          s"Pipeline stream has no column '$c' " +
            s"(available: ${bdf.columns.mkString(", ")})")
    }
    val outPath = resolve(p.output, dataDir)
    val ckptRoot = stepCkptRoot.map(resolve(_, dataDir))
    val ckpt = ckptRoot.map { root =>
      new Checkpointer(spark, s"$root/batch_$batchId",
        md5Hex(s"$batchId|${p.idColumn}|${p.textColumn}"))
    }
    val result = p.steps.zipWithIndex.foldLeft(bdf) {
      case (df, (step, i)) => ckpt match {
        case Some(c) => c.stepOutput(step, i,
          secondaryInputSummary(spark, step, dataDir),
          () => apply(df, step, p, dataDir))._1
        case None => apply(df, step, p, dataDir)
      }
    }
    result.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
    ckptRoot.foreach { root =>
      try {
        val rootPath = new org.apache.hadoop.fs.Path(root)
        val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(rootPath))
          fs.listStatus(rootPath).foreach { st =>
            val n = st.getPath.getName
            if (n.startsWith("batch_") &&
                n.stripPrefix("batch_").toLongOption.exists(_ < batchId))
              fs.delete(st.getPath, true)
          }
      } catch { case _: Exception => () } // GC is best-effort
    }
  }

  private def apply(df: DataFrame, step: PipelineStep,
                    p: PipelineConfig, dataDir: String): DataFrame = {
    import PipelineStep._
    val text = col(p.textColumn)
    def read(path: String, format: String): DataFrame =
      readInput(df.sparkSession, resolve(path, dataDir), format)
    step match {
      case LangFilter(langs) =>
        df.filter(TextFunctions.langId(text).isin(langs: _*))
      case QualityFilter(minScore) =>
        df.filter(TextFunctions.qualityScore(text) >= minScore)
      case c: ClassifierFilter =>
        import graft.functions.LinearModel
        val scoreQ = (c.weightsQ, c.weightsPath) match {
          case (Some(w), _) => LinearModel.linearScoreQ(text, w.toArray)
          case (None, Some(pp)) => LinearModel.linearScoreQ(text,
            LinearModel.loadWeightsQ(df.sparkSession,
              resolve(pp, dataDir), c.dim))
          case _ => LinearModel.hashedLinearScoreQ(text, c.dim)
        }
        df.filter(LinearModel.meanLogit(scoreQ,
          TextFunctions.tokenCount(text)) >= c.minMeanLogit)
      case b: BlocklistFilter =>
        if (!df.columns.contains(b.column))
          throw new UserException(
            s"blocklistFilter: input has no column '${b.column}'")
        val bl = read(b.input, b.format)
        if (!bl.columns.contains(b.valueColumn))
          throw new UserException(
            s"blocklistFilter: blocklist '${b.input}' has no column " +
              s"'${b.valueColumn}'")
        df.join(broadcast(bl.select(col(b.valueColumn).as(b.column))
          .distinct()), Seq(b.column), "left_anti")
      case f: FitWhiten =>
        import graft.operators.Whitening
        if (!df.columns.contains(f.column))
          throw new UserException(
            s"fitWhiten: input has no column '${f.column}'")
        Whitening.saveModel(df.sparkSession,
          Whitening.fit(df, f.column, f.dim),
          resolve(f.modelPath, dataDir))
        df // row-identity: the model artifact is the product
      case w: Whiten =>
        import graft.operators.Whitening
        if (!df.columns.contains(w.column))
          throw new UserException(
            s"whiten: input has no column '${w.column}'")
        val model = Whitening.loadModel(df.sparkSession,
          resolve(w.modelPath, dataDir))
        w.k match {
          case Some(k) =>
            if (k > model.lambda.length) throw new UserException(
              s"whiten: k=$k exceeds the model's ${model.lambda.length} " +
                "components")
            Whitening.pcaProject(df, w.column, model, k, w.whitened, w.eps)
          case None => Whitening.whiten(df, w.column, model, w.eps)
        }
      case g: GopherFilter =>
        df.filter(TextFunctions.gopherKeep(text, g.minTokens, g.maxTokens,
          g.minDistinctRatio, g.maxTopBigramFrac, g.minStopwordRatio))
      case DedupExact =>
        Dedup.exactCorpus(df, p.idColumn, p.textColumn)
      case d: DedupMinhash =>
        val pairs = Dedup.minhashNearDupPairs(df, p.idColumn, p.textColumn,
          d.shingleSize, d.k, d.bands, d.threshold)
        Dedup.dropNearDups(df, pairs, p.idColumn)
      case f: DedupFuzzy =>
        if (!df.columns.contains(f.column))
          throw new UserException(
            s"dedupFuzzy: input has no column '${f.column}'")
        val pairs = graft.operators.FuzzyJoin.selfJoin(
          df, p.idColumn, f.column, f.maxDist, f.maxBucket)
        Dedup.dropNearDups(df, pairs, p.idColumn)
      case m: MadOutlierFilter =>
        (m.column +: m.groupBy.toSeq).foreach { c =>
          if (!df.columns.contains(c))
            throw new UserException(
              s"madOutlierFilter: input has no column '$c'")
        }
        import graft.operators.Percentiles
        import org.apache.spark.sql.functions.{abs, lit, struct}
        // global mode = one constant group; the percentile operator
        // wants explicit group columns
        val (work, gcols) = m.groupBy match {
          case Some(gc) => (df, Seq(gc))
          case None     => (df.withColumn("__mad_g", lit(0)), Seq("__mad_g"))
        }
        def gk(d: DataFrame) = struct(gcols.map(d(_)): _*)
        val v = col(m.column).cast("double")
        // pass 1: per-group median; pass 2: median absolute deviation.
        // Both tables are group-cardinality-sized → broadcast joins;
        // joined ON A STRUCT of the keys so NULL group keys keep their
        // rows (a bare column equi-join would drop them — the operator
        // itself returns a row for a NULL group).
        val med = Percentiles.exactGroupedPercentiles(
          work, gcols, m.column, Seq("__med" -> 0.5))
        val withDev = work.join(
            broadcast(med.select(gk(med).as("__gk"), col("__med"))),
            gk(work) === col("__gk"), "left")
          .drop("__gk").withColumn("__dev", abs(v - col("__med")))
        val mad = Percentiles.exactGroupedPercentiles(
          withDev, gcols, "__dev", Seq("__mad" -> 0.5))
        withDev.join(
            broadcast(mad.select(gk(mad).as("__gk"), col("__mad"))),
            gk(withDev) === col("__gk"), "left")
          // keep: NULL values/medians (missing data is not an outlier
          // verdict), else |v − med| ≤ maxMads·1.4826·MAD
          .filter(col("__dev").isNull ||
            col("__dev") <= col("__mad") * lit(m.maxMads) * lit(1.4826))
          .drop("__gk", "__med", "__dev", "__mad", "__mad_g")
      case w: Winsorize =>
        (w.column +: w.groupBy.toSeq).foreach { c =>
          if (!df.columns.contains(c))
            throw new UserException(
              s"winsorize: input has no column '$c'")
        }
        import org.apache.spark.sql.functions.lit
        w.groupBy match {
          case Some(gc) => graft.operators.Percentiles.winsorize(
            df, Seq(gc), w.column, w.loFrac, w.hiFrac)
          case None => graft.operators.Percentiles.winsorize(
              df.withColumn("__w_g", lit(0)), Seq("__w_g"),
              w.column, w.loFrac, w.hiFrac)
            .drop("__w_g")
        }
      case PiiRedact =>
        df.withColumn(p.textColumn, TextFunctions.redactPii(text))
      case Normalize =>
        df.withColumn(p.textColumn,
          graft.functions.HashFunctions.nfcNormalize(text))
      case HtmlStrip =>
        df.withColumn(p.textColumn, TextFunctions.stripHtml(text))
      case c: CheckStep =>
        import graft.operators.DataChecks
        // config errors surface as UserException (exit 1), never as a
        // resolution failure mid-job (exit 2): validate columns here
        (c.notNull ++ c.unique).distinct.foreach { cc =>
          if (!df.columns.exists(_.equalsIgnoreCase(cc)))
            throw new UserException(
              s"check step references no such column '$cc' " +
                s"(available: ${df.columns.mkString(", ")})")
        }
        val checks =
          c.notNull.distinct.map(DataChecks.NotNull.apply) ++
            (if (c.unique.nonEmpty) Seq(DataChecks.Unique(c.unique)) else Nil)
        val failed =
          (if (checks.nonEmpty)
            DataChecks.run(df, checks).filter(!col("passed"))
              .select(col("check"), col("n_violations")).collect().toSeq
          else Nil) ++
            (if (c.minRows > 0) {
              // a limit probe, not a full count: minRows failing is
              // the question, the exact deficit is not. limit() takes
              // an Int — past that, only a full count can prove the
              // gate (a >2^31-row minimum is checking a full count
              // anyway)
              val have =
                if (c.minRows <= Int.MaxValue) df.limit(c.minRows.toInt).count()
                else df.count()
              if (have < c.minRows)
                Seq(org.apache.spark.sql.Row(s"min_rows:${c.minRows}",
                  c.minRows - have))
              else Nil
            } else Nil)
        if (failed.nonEmpty)
          throw new UserException("check step failed: " + failed
            .map(r => s"${r.get(0)} (${r.get(1)} violations)")
            .mkString("; "))
        df // identity when green
      case Sample(fraction) =>
        Sampling.deterministicSample(df, p.idColumn, fraction)
      case ws: WeightedSample =>
        if (!df.columns.contains(ws.weightColumn))
          throw new UserException(
            s"weightedSample: input has no column '${ws.weightColumn}'")
        // the operator emits a key_q helper column; dropping it must
        // not swallow a user column of the same name
        if (df.columns.contains("key_q"))
          throw new UserException(
            "weightedSample: input already has a 'key_q' column")
        Sampling.weightedSample(df, p.idColumn, ws.weightColumn, ws.n)
          .drop("key_q")
      case StratifiedSample(strata, fractions, default) =>
        if (!df.columns.contains(strata))
          throw new UserException(
            s"stratifiedSample: input has no column '$strata'")
        Sampling.stratifiedSample(df, p.idColumn, strata, fractions, default)
      case TruncateTokens(maxTokens) =>
        df.withColumn(p.textColumn,
          TextFunctions.truncateTokens(text, maxTokens))
      case Pack(targetTokens, buckets) =>
        // derives n_tokens for the cumulative packing; keeps it — the
        // packed output's consumer needs the per-doc token count anyway
        Sampling.packBins(
          df.withColumn("n_tokens", TextFunctions.tokenCount(text)),
          p.idColumn, "n_tokens", targetTokens, buckets)
      case d: Decontaminate =>
        val eval = read(d.evalPath, d.evalFormat)
        if (!eval.columns.contains(d.evalTextColumn))
          throw new UserException(
            s"decontaminate: eval set has no column '${d.evalTextColumn}'")
        // eval shingles are benchmark-sized → broadcast; the corpus
        // side's shingles stay inside its scan stage (never shuffled)
        val evalShingles = eval.select(
          explode(Dedup.shingles(col(d.evalTextColumn), d.ngram)).as("__sh"))
          .distinct()
        val contaminated = df.select(col(p.idColumn),
            explode(Dedup.shingles(text, d.ngram)).as("__sh"))
          .join(broadcast(evalShingles), Seq("__sh"))
          .select(p.idColumn).distinct()
        df.join(contaminated, Seq(p.idColumn), "left_anti")
      case d: DecontaminateFuzzy =>
        val evalDocs = read(d.evalPath, d.evalFormat)
        if (!evalDocs.columns.contains(d.evalTextColumn))
          throw new UserException(
            s"decontaminateFuzzy: eval set has no column '${d.evalTextColumn}'")
        // eval ids are internal (pair-dedup identities), but they MUST
        // be consistent across the two independent evaluations of the
        // eval plan inside fuzzyDecontaminate (band-key scan + shingle
        // scan) — monotonically_increasing_id is partition-layout-
        // dependent and can differ between those scans, silently
        // verifying candidates against the WRONG eval text. A content
        // hash is deterministic everywhere; duplicate texts collapsing
        // to one id is fine (identical shingle sets).
        Dedup.fuzzyDecontaminate(df, p.idColumn, p.textColumn,
          evalDocs.withColumn("__eval_id",
            org.apache.spark.sql.functions.xxhash64(col(d.evalTextColumn))),
          "__eval_id", d.evalTextColumn,
          shingleSize = d.shingleSize, threshold = d.threshold)
      case Mix(w0, extra) =>
        val sources = (df, w0) +: extra.map(s => (read(s.input, s.format), s.weight))
        // names AND types: a doc_id long vs string mismatch would
        // otherwise surface as an opaque union failure (or silently
        // coerce), not the loud config error this guard promises
        val schemas = sources.map(_._1.schema.fields
          .map(f => f.name -> f.dataType.simpleString).sortBy(_._1).toSeq)
        if (schemas.distinct.size > 1)
          throw new UserException(
            "mix sources must share the pipeline frame's schema (saw: " +
              schemas.distinct.map(_.map { case (n, t) => s"$n:$t" }
                .mkString("[", ",", "]")).mkString(" vs ") + ")")
        Sampling.weightedMix(sources, p.idColumn)
      case CapPerSource(sourceCol, k, priorSpec) =>
        if (!df.columns.contains(sourceCol))
          throw new UserException(
            s"capPerSource: input has no column '$sourceCol'")
        priorSpec match {
          case Some(g) =>
            // authority-scaled quota: the graph prior consumed by
            // curation (one broadcast join — the prior is per-source)
            val prior = read(g.input, g.format)
            for (c <- Seq(g.sourceColumn, g.weightColumn))
              if (!prior.columns.contains(c))
                throw new UserException(
                  s"capPerSource.graphPrior: no column '$c' in ${g.input}")
            Sampling.capPerSourceWeighted(df, sourceCol, p.idColumn,
                Seq(TextFunctions.qualityScore(text).desc), k,
                prior, g.sourceColumn, g.weightColumn)
              .drop("cap_q", "rnk")
          case None =>
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(col(sourceCol))
              .orderBy(TextFunctions.qualityScore(text).desc, col(p.idColumn))
            df.withColumn("__rnk", row_number().over(w))
              .filter(col("__rnk") <= k).drop("__rnk")
        }
      case Split(tr, va, column) =>
        df.withColumn(column,
          Sampling.splitLabel(col(p.idColumn), tr, va))
    }
  }

  private def resolve(path: String, dataDir: String): String =
    if (path.startsWith("/") || path.contains("://")) path
    else s"$dataDir/$path"
}
