package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** User-facing config error — maps to exit code 1 in the CLI
  * (reference exit-code protocol: run.php:37-56). */
final class UserException(msg: String) extends RuntimeException(msg)

/** Parsed job config: either many tables ("tables" mode) or exactly
  * one ("config row" mode), plus the requested action.
  *
  * Mirrors the reference's three Symfony config definitions
  * (reference: src/Keboola/DbWriter/RedshiftApplication.php:23-35 and
  * the files under Redshift/Configuration/). Re-expressed as plain
  * case classes + hand validation — idiomatic Scala, no Symfony analog
  * needed.
  */
final case class JobConfig(
    action: String,
    tables: Seq[TableConfig],
    dataDir: Option[String],
    ssh: SshConfig = SshConfig(),
    /** Engine extension (no reference analog — its loop is serial,
      * RedshiftApplication.php:64-69): width of the bounded pool
      * [[graft.app.Engine.run]] loads independent destinations on.
      * Default 1 = reference-parity serial. */
    maxParallelLoads: Int = 1,
    /** Engine extension: curation-pipeline spec for the `pipeline`
      * action ([[PipelineConfig]]). */
    pipeline: Option[PipelineConfig] = None,
    /** Engine extension: view-maintenance spec for the `maintainView`
      * action ([[ViewConfig]]). */
    view: Option[ViewConfig] = None)

object ConfigParser {
  private val mapper = new ObjectMapper()

  def parse(json: String): JobConfig = parseNode(mapper.readTree(json))

  def parseFile(path: String): JobConfig =
    parseNode(mapper.readTree(new java.io.File(path)))

  private def parseNode(root: JsonNode): JobConfig = {
    val action = opt(root, "action").map(_.asText).getOrElse("run")
    val params = Option(root.get("parameters"))
      .getOrElse(throw new UserException("Missing 'parameters' key"))
    val dataDir = opt(params, "data_dir").map(_.asText)
    // tables[] present → multi-table mode; else the parameters node
    // itself is one table ("config row" mode,
    // reference: RedshiftApplication.php:23-32).
    val tables: Seq[TableConfig] = opt(params, "tables") match {
      case Some(ts) => ts.elements.asScala.map(parseTable).toSeq
      case None if action != "run" => Nil // action configs carry no table
      case None => Seq(parseTable(params))
    }
    tables.foreach(validate)
    val width = opt(params, "maxParallelLoads").map(_.asInt).getOrElse(1)
    if (width < 1)
      throw new UserException("maxParallelLoads must be >= 1")
    val pipeline =
      if (action == "pipeline")
        Some(parsePipeline(opt(params, "pipeline").getOrElse(
          throw new UserException("Missing 'pipeline' key"))))
      else None
    val view =
      if (action == "maintainView")
        Some(parseView(opt(params, "view").getOrElse(
          throw new UserException("Missing 'view' key"))))
      else None
    JobConfig(action, tables, dataDir, parseSsh(params), width, pipeline,
      view)
  }

  /** `parameters.view` block for the `maintainView` action. Validated
    * HERE like the pipeline block: malformed config → UserException →
    * exit 1, never an opaque runner failure. */
  private def parseView(v: JsonNode): ViewConfig = {
    val statePath = req(v, "statePath").asText
    def batchId: Long = {
      val id = req(v, "batchId").asLong
      if (id < 0) throw new UserException("view.batchId must be >= 0")
      id
    }
    req(v, "kind").asText match {
      case "export" =>
        val layer = opt(v, "layer").map(_.asText).getOrElse("view")
        if (!Set("view", "base", "log")(layer) &&
            !(layer.startsWith("aux:") && layer.length > 4))
          throw new UserException(
            s"view.layer '$layer' is not supported " +
              "(view | base | log | aux:<name>)")
        val since = opt(v, "sinceBatch").map(_.asLong)
        if (since.exists(_ < 0))
          throw new UserException("view.sinceBatch must be >= 0")
        if (since.isDefined && opt(v, "asOf").isDefined)
          throw new UserException(
            "view.sinceBatch and view.asOf are mutually exclusive — " +
              "a snapshot and an incremental range are different reads")
        if (layer == "log" && since.isEmpty)
          throw new UserException(
            "view.layer 'log' is the change-log consumer pull — it " +
              "requires sinceBatch (use layer 'base' for a full " +
              "image export)")
        val manifest = opt(v, "manifest").map(_.asText)
        if (manifest.isDefined && since.isEmpty)
          throw new UserException(
            "view.manifest caps the incremental consumer pull at the " +
              "group frontier — it requires sinceBatch")
        ExportViewConfig(statePath,
          output = req(v, "output").asText, layer = layer,
          asOf = parseAsOf(v), sinceBatch = since, manifest = manifest)
      case "retain" =>
        RetainViewConfig(statePath)
      case "changelog" =>
        ChangeLogViewConfig(statePath)
      case "fsck" =>
        FsckViewConfig(statePath)
      case "repair" =>
        RepairViewConfig(statePath,
          apply = opt(v, "apply").exists(_.asBoolean))
      case "manifest" =>
        val roots = opt(v, "roots").toSeq
          .flatMap(_.elements.asScala.toSeq.map(_.asText))
        if (roots.isEmpty)
          throw new UserException(
            "view.roots must list the group's state paths")
        ManifestViewConfig(statePath, batchId, roots)
      case "diff" =>
        val from = req(v, "fromBatch").asLong
        val to = req(v, "toBatch").asLong
        if (from < 0 || to < 0)
          throw new UserException("view.fromBatch/toBatch must be >= 0")
        if (from > to)
          throw new UserException(
            "view.fromBatch must be <= view.toBatch")
        val layer = opt(v, "layer").map(_.asText).getOrElse("view")
        if (!Set("view", "base")(layer) &&
            !(layer.startsWith("aux:") && layer.length > 4))
          throw new UserException(
            s"view.layer '$layer' is not supported " +
              "(view | base | aux:<name>)")
        DiffViewConfig(statePath, output = req(v, "output").asText,
          fromBatch = from, toBatch = to, layer = layer)
      case "status" =>
        StatusViewConfig(statePath,
          countRows = opt(v, "countRows").forall(_.asBoolean))
      case "lookup" =>
        val layer = opt(v, "layer").map(_.asText)
        layer.filterNot(l => Set("view", "base")(l) ||
            (l.startsWith("aux:") && l.length > 4)).foreach { l =>
          throw new UserException(
            s"view.layer '$l' is not supported (view | base | aux:<name>)")
        }
        val maxRows = opt(v, "maxRows").map(_.asInt).getOrElse(1000)
        if (maxRows < 1)
          throw new UserException("view.maxRows must be >= 1")
        val keysNode = opt(v, "keys").getOrElse(
          throw new UserException("view.keys must list key objects"))
        val keyRows = keysNode.elements.asScala.toSeq.map { row =>
          if (!row.isObject)
            throw new UserException(
              "view.keys entries must be objects of column -> value")
          val fields = row.properties.asScala.toSeq.map { e =>
            val value = e.getValue
            if (value.isNull || value.isContainerNode)
              throw new UserException(
                s"view.keys: column '${e.getKey}' must carry a scalar " +
                  "value (NULL keys are never matchable on the pk/join " +
                  "paths; quote group-key NULLs are not expressible " +
                  "through the CLI)")
            e.getKey -> value.asText
          }
          if (fields.map(_._1).distinct.size != fields.size)
            throw new UserException(
              "view.keys: an entry names a column twice")
          fields.toMap
        }
        if (keyRows.isEmpty)
          throw new UserException("view.keys must list key objects")
        val cols = keyRows.head.keySet
        if (keyRows.exists(_.keySet != cols))
          throw new UserException(
            "view.keys entries must all carry the same columns")
        LookupViewConfig(statePath, keyRows, layer = layer,
          maxRows = maxRows, asOf = parseAsOf(v))
      case "gc" =>
        val hours = opt(v, "olderThanHours").map(_.asInt)
        if (hours.exists(_ < 0))
          throw new UserException("view.olderThanHours must be >= 0")
        val retain = opt(v, "retainHours").map(_.asInt)
        if (retain.exists(_ < 0))
          throw new UserException("view.retainHours must be >= 0")
        val logRetain = opt(v, "logRetainHours").map(_.asInt)
        if (logRetain.exists(_ < 0))
          throw new UserException("view.logRetainHours must be >= 0")
        GcViewConfig(statePath, olderThanHours = hours,
          foldMarkers = opt(v, "foldMarkers").exists(_.asBoolean),
          retainHours = retain, logRetainHours = logRetain)
      case "compact" =>
        val nBuckets = opt(v, "nBuckets").map(_.asInt)
        val nAggBuckets = opt(v, "nAggBuckets").map(_.asInt)
        if (nBuckets.exists(_ < 1) || nAggBuckets.exists(_ < 1))
          throw new UserException("view.nBuckets must be >= 1")
        // addColumns: {name: type} — insertion order kept (it rides
        // the migrated pin, so the spelling must be stable)
        val addCols = opt(v, "addColumns").toSeq.flatMap { node =>
          if (!node.isObject)
            throw new UserException(
              "view.addColumns must be an object of name -> type")
          node.properties.asScala.toSeq.map { e =>
            val t = e.getValue.asText
            if (t.isEmpty)
              throw new UserException(
                s"view.addColumns.'${e.getKey}' needs a Spark DDL type")
            e.getKey -> t
          }
        }
        CompactViewConfig(statePath,
          freshPath = req(v, "freshPath").asText, nBuckets = nBuckets,
          nAggBuckets = nAggBuckets, addColumns = addCols)
      case "join" =>
        val nBuckets = opt(v, "nBuckets").map(_.asInt).getOrElse(64)
        if (nBuckets < 1)
          throw new UserException("view.nBuckets must be >= 1")
        JoinViewConfig(statePath, batchId,
          key = req(v, "key").asText,
          deltaA = parseDelta(req(v, "deltaA")),
          deltaB = parseDelta(req(v, "deltaB")),
          nBuckets = nBuckets)
      case "rollup" =>
        val keys = opt(v, "keys").toSeq.flatMap(_.elements.asScala)
          .map(_.asText)
        if (keys.isEmpty)
          throw new UserException("view.keys must list group columns")
        val nBuckets = opt(v, "nBuckets").map(_.asInt).getOrElse(16)
        if (nBuckets < 1)
          throw new UserException("view.nBuckets must be >= 1")
        RollupViewConfig(statePath, batchId, keys,
          valueColumn = req(v, "valueColumn").asText,
          delta = parseDelta(req(v, "delta")), nBuckets = nBuckets)
      case "cdcRollup" =>
        def list(f: String): Seq[String] =
          opt(v, f).toSeq.flatMap(_.elements.asScala).map(_.asText)
        val keyCols = list("keyColumns")
        if (keyCols.isEmpty)
          throw new UserException("view.keyColumns must list pk columns")
        val keys = list("keys")
        if (keys.isEmpty)
          throw new UserException("view.keys must list group columns")
        val (nBase, nAgg) = (
          opt(v, "nBaseBuckets").map(_.asInt).getOrElse(64),
          opt(v, "nAggBuckets").map(_.asInt).getOrElse(16))
        if (nBase < 1 || nAgg < 1)
          throw new UserException(
            "view.nBaseBuckets/nAggBuckets must be >= 1")
        val delta = parseDelta(req(v, "delta"))
        // the delta IS the CDC log — netting upstream would drop the
        // deletes the retraction fold exists to apply
        if (delta.cdc.isDefined)
          throw new UserException(
            "cdcRollup deltas take seqColumn/opColumn directly; drop " +
              "the 'cdc' block (netting would hide the deletes the " +
              "fold must retract)")
        // `valueColumns` lists every measure (one fold per delta, not
        // one per measure); the legacy single-measure `valueColumn`
        // stays accepted — both at once is ambiguous, refuse
        val multi = list("valueColumns")
        val single = opt(v, "valueColumn").map(_.asText)
        if (multi.nonEmpty && single.nonEmpty)
          throw new UserException(
            "view.valueColumns and view.valueColumn are mutually " +
              "exclusive — declare the measures once")
        val valueCols = if (multi.nonEmpty) multi else single.toSeq
        if (valueCols.isEmpty)
          throw new UserException(
            "view.valueColumns must list at least one measure column")
        if (valueCols.distinct != valueCols)
          throw new UserException(
            "view.valueColumns lists a measure twice")
        val minMax = list("minMaxColumns")
        if (minMax.distinct != minMax)
          throw new UserException(
            "view.minMaxColumns lists a column twice")
        // auxViews: {name: [group cols]} — insertion order kept (it
        // rides the layout pin, so the spelling must be stable)
        val aux = opt(v, "auxViews").toSeq.flatMap { node =>
          if (!node.isObject)
            throw new UserException(
              "view.auxViews must be an object of name -> [columns]")
          node.properties.asScala.toSeq.map { e =>
            val cols = e.getValue.elements.asScala.toSeq.map(_.asText)
            if (cols.isEmpty)
              throw new UserException(
                s"view.auxViews.'${e.getKey}' must list group columns")
            e.getKey -> cols
          }
        }
        // auxMinMaxColumns: {name: [cols]} — per-aux exact MIN/MAX;
        // names must be declared aux views (checked here so config
        // misuse exits 1 instead of surfacing as a library refusal)
        val auxMm = opt(v, "auxMinMaxColumns").toSeq.flatMap { node =>
          if (!node.isObject)
            throw new UserException(
              "view.auxMinMaxColumns must be an object of " +
                "name -> [columns]")
          node.properties.asScala.toSeq.map { e =>
            val cols = e.getValue.elements.asScala.toSeq.map(_.asText)
            if (cols.isEmpty)
              throw new UserException(
                s"view.auxMinMaxColumns.'${e.getKey}' must list columns")
            if (!aux.exists(_._1 == e.getKey))
              throw new UserException(
                s"view.auxMinMaxColumns names '${e.getKey}' which is " +
                  "not declared in view.auxViews")
            e.getKey -> cols
          }
        }.toMap
        CdcRollupViewConfig(statePath, batchId, keyCols,
          seqColumn = req(v, "seqColumn").asText,
          opColumn = req(v, "opColumn").asText,
          keys = keys, valueColumns = valueCols,
          delta = delta, nBaseBuckets = nBase, nAggBuckets = nAgg,
          minMaxColumns = minMax, auxViews = aux,
          auxMinMaxColumns = auxMm)
      case other =>
        throw new UserException(s"View kind '$other' is not supported")
    }
  }

  /** Optional `view.asOf` snapshot id (lookup/export) — non-negative
    * like batchId (the snapshot axis IS the batch-id axis). */
  private def parseAsOf(v: JsonNode): Option[Long] = {
    val asOf = opt(v, "asOf").map(_.asLong)
    if (asOf.exists(_ < 0))
      throw new UserException("view.asOf must be >= 0")
    asOf
  }

  private def parseDelta(d: JsonNode): DeltaInput = {
    val cdc = opt(d, "cdc").map { c =>
      val keys = opt(c, "keyColumns").toSeq.flatMap(_.elements.asScala)
        .map(_.asText)
      if (keys.isEmpty)
        throw new UserException("cdc.keyColumns must list key columns")
      CdcSpec(keys, req(c, "seqColumn").asText, req(c, "opColumn").asText)
    }
    val input = req(d, "input").asText
    val fmt = readFormat(d, "format")
    val items = opt(d, "items").toSeq
      .flatMap(_.elements.asScala.map(parseItem))
    items.filterNot(c => TypeMapper.isAllowed(c.dataType)).foreach { c =>
      throw new UserException(
        s"Type '${c.dataType}' of column '${c.name}' is not supported")
    }
    // CSV arrives untyped and the engine never infers (SURVEY §1):
    // an all-string delta would fold lexicographic min/max into a
    // rollup monoid and type-drifted bucket hashes into a join-view
    // layout — declare the schema or use parquet
    if (fmt == "csv" && items.isEmpty)
      throw new UserException(
        s"View delta '$input': format 'csv' requires declared items[] " +
          "(name/dbName/type per column) — CSV is untyped and the " +
          "engine never infers; an all-string fold would corrupt the " +
          "maintained state. Declare the schema or feed parquet")
    DeltaInput(input, fmt, cdc, items)
  }

  /** `parameters.pipeline` block for the `pipeline` action. Shape and
    * ranges validated HERE so the runner never sees a malformed spec
    * (bad config → UserException → exit 1, the reference protocol). */
  private def parsePipeline(p: JsonNode): PipelineConfig = {
    val fmt = readFormat(p, "format")
    val steps = opt(p, "steps").toSeq
      .flatMap(_.elements.asScala).map(parseStep)
    PipelineConfig(
      input = req(p, "input").asText,
      output = req(p, "output").asText,
      idColumn = opt(p, "idColumn").map(_.asText).getOrElse("doc_id"),
      textColumn = opt(p, "textColumn").map(_.asText).getOrElse("text"),
      format = fmt,
      steps = steps,
      collectStats = opt(p, "collectStats").exists(_.asBoolean),
      checkpointDir = opt(p, "checkpointDir").map(_.asText))
  }

  /** ONE validated format vocabulary for EVERY dataset reference (the
    * top-level input, eval sets, mix sources) — the runner treats
    * unknown formats as parquet, so an unvalidated "CSV"/"json" would
    * surface as an opaque read failure instead of exit 1. */
  private def readFormat(node: JsonNode, f: String): String = {
    val v = Option(node.get(f)).filterNot(_.isNull)
      .map(_.asText).getOrElse("parquet")
    if (!Set("parquet", "csv")(v))
      throw new UserException(s"Pipeline format '$v' is not supported")
    v
  }

  private def parseStep(n: JsonNode): PipelineStep = {
    import PipelineStep._
    // STRICT numerics: Jackson's asDouble/asInt coerce non-numeric
    // JSON to 0, which would slip a typo'd "fraction":"abc" past the
    // range checks as 0.0 and silently curate an empty corpus — the
    // exact malformed-spec class this parser exists to refuse.
    def dbl(f: String, dflt: Double) = opt(n, f).map { v =>
      if (!v.isNumber) throw new UserException(
        s"Pipeline step field '$f' must be a number, got: $v")
      v.asDouble
    }.getOrElse(dflt)
    def int(f: String, dflt: Int) = opt(n, f).map { v =>
      if (!v.isIntegralNumber || !v.canConvertToInt)
        throw new UserException(
          s"Pipeline step field '$f' must be an integer, got: $v")
      v.asInt
    }.getOrElse(dflt)
    def lng(f: String, dflt: Long) = opt(n, f).map { v =>
      if (!v.isIntegralNumber || !v.canConvertToLong)
        throw new UserException(
          s"Pipeline step field '$f' must be a 64-bit integer, got: $v")
      v.asLong
    }.getOrElse(dflt)
    def fmt(node: JsonNode, f: String): String = readFormat(node, f)
    req(n, "type").asText match {
      case "langFilter" =>
        val langs = opt(n, "languages").toSeq
          .flatMap(_.elements.asScala.map(_.asText))
        if (langs.isEmpty)
          throw new UserException("langFilter needs a non-empty 'languages'")
        LangFilter(langs)
      case "qualityFilter" => QualityFilter(dbl("minScore", 0.5))
      case "gopherFilter" => GopherFilter(
        minTokens = lng("minTokens", 20L),
        maxTokens = lng("maxTokens", 90L),
        minDistinctRatio = dbl("minDistinctRatio", 0.4),
        maxTopBigramFrac = dbl("maxTopBigramFrac", 0.05),
        minStopwordRatio = dbl("minStopwordRatio", 0.02))
      case "dedupExact" => DedupExact
      case "dedupMinhash" =>
        val t = dbl("threshold", 0.5)
        if (t < 0 || t > 1)
          throw new UserException("dedupMinhash threshold must be in [0,1]")
        val (sh, kk, bd) =
          (int("shingleSize", 3), int("k", 20), int("bands", 5))
        // zero/negative values would silently disable dedup (zero band
        // rows -> zero pairs -> everything kept, reported as success)
        if (sh < 1 || kk < 1 || bd < 1)
          throw new UserException(
            "dedupMinhash shingleSize/k/bands must be >= 1")
        DedupMinhash(t, sh, kk, bd)
      case "dedupFuzzy" =>
        val d = int("maxDist", 1)
        // the deletion-neighborhood scheme is sized for d ∈ {1,2};
        // d=0 is dedupExact's job and d>2 explodes the variant count
        if (d < 1 || d > 2)
          throw new UserException("dedupFuzzy 'maxDist' must be 1 or 2")
        val mb = int("maxBucket", 10000)
        if (mb < 1)
          throw new UserException("dedupFuzzy 'maxBucket' must be >= 1")
        DedupFuzzy(req(n, "column").asText, d, mb)
      case "madOutlierFilter" =>
        val k = dbl("maxMads", 3.0)
        // 0 would keep only exact-median rows on EVERY group — surely
        // a config mistake, refused like the other silent-empty traps
        if (k <= 0)
          throw new UserException("madOutlierFilter 'maxMads' must be > 0")
        MadOutlierFilter(req(n, "column").asText, k,
          opt(n, "groupBy").map(_.asText))
      case "winsorize" =>
        val (lo, hi) = (dbl("loFrac", 0.01), dbl("hiFrac", 0.99))
        if (lo < 0 || hi > 1 || lo > hi)
          throw new UserException(
            "winsorize needs 0 <= loFrac <= hiFrac <= 1")
        Winsorize(req(n, "column").asText, lo, hi,
          opt(n, "groupBy").map(_.asText))
      case "blocklistFilter" =>
        BlocklistFilter(
          input = req(n, "input").asText,
          column = req(n, "column").asText,
          valueColumn = req(n, "valueColumn").asText,
          format = fmt(n, "format"))
      case "fitWhiten" =>
        val d = int("dim", 0)
        if (d < 1 || d > 1024)
          throw new UserException(
            "fitWhiten needs 'dim' in [1, 1024] (the declared vector " +
              "length — the driver eigen solve is O(dim^3))")
        FitWhiten(
          modelPath = req(n, "modelPath").asText,
          dim = d,
          column = opt(n, "column").map(_.asText).getOrElse("embedding"))
      case "whiten" =>
        val k = opt(n, "k").map { v =>
          if (!v.isIntegralNumber || !v.canConvertToInt)
            throw new UserException(
              s"whiten 'k' must be an integer, got: $v")
          v.asInt
        }
        if (k.exists(_ < 1))
          throw new UserException("whiten 'k' must be >= 1")
        val eps = dbl("eps", 1e-9)
        if (eps <= 0)
          throw new UserException("whiten 'eps' must be > 0")
        Whiten(
          modelPath = req(n, "modelPath").asText,
          column = opt(n, "column").map(_.asText).getOrElse("embedding"),
          k = k,
          whitened = opt(n, "whitened").forall(_.asBoolean),
          eps = eps)
      case "classifierFilter" =>
        val w = opt(n, "weightsQ").map { node =>
          if (!node.isArray)
            throw new UserException(
              "classifierFilter 'weightsQ' must be an array of integers")
          node.elements.asScala.map { e =>
            if (!e.isIntegralNumber || !e.canConvertToLong)
              throw new UserException(
                "classifierFilter 'weightsQ' entries must be 64-bit integers")
            e.asLong
          }.toSeq
        }
        if (w.exists(_.isEmpty))
          throw new UserException("classifierFilter 'weightsQ' is empty")
        val d = int("dim", w.map(_.length).getOrElse(4096))
        if (d < 1)
          throw new UserException("classifierFilter 'dim' must be >= 1")
        // a dim that disagrees with supplied weights would silently
        // bucket past the array end at score time — refuse up front
        if (w.exists(_.length != d))
          throw new UserException(
            "classifierFilter 'dim' conflicts with weightsQ length")
        val wp = opt(n, "weightsPath").map(_.asText)
        if (wp.exists(_.isEmpty))
          throw new UserException("classifierFilter 'weightsPath' is empty")
        // two weight sources would make precedence a silent guess
        if (w.isDefined && wp.isDefined)
          throw new UserException(
            "classifierFilter takes 'weightsQ' or 'weightsPath', not both")
        ClassifierFilter(dbl("minMeanLogit", 0.0), d, w, wp)
      case "piiRedact" => PiiRedact
      case "normalize" => Normalize
      case "htmlStrip" => HtmlStrip
      case "check" =>
        def strArr(f: String): Seq[String] = opt(n, f).map { v =>
          if (!v.isArray)
            throw new UserException(
              s"check '$f' must be an array of column names")
          v.elements.asScala.map(_.asText).toSeq
        }.getOrElse(Nil)
        val nn = strArr("notNull")
        val uq = strArr("unique")
        val mr = lng("minRows", 0L)
        if (mr < 0)
          throw new UserException("check 'minRows' must be >= 0")
        if (nn.isEmpty && uq.isEmpty && mr == 0)
          throw new UserException(
            "check step declares nothing to check (notNull/unique/minRows)")
        CheckStep(nn, uq, mr)
      case "sample" =>
        val f = dbl("fraction", -1)
        if (f < 0 || f > 1)
          throw new UserException("sample needs 'fraction' in [0,1]")
        Sample(f)
      case "weightedSample" =>
        val nn = int("n", -1)
        if (nn < 1)
          throw new UserException("weightedSample needs 'n' >= 1")
        WeightedSample(nn, req(n, "weightColumn").asText)
      case "stratifiedSample" =>
        val strata = req(n, "strataColumn").asText
        val fr = opt(n, "fractions").map { node =>
          node.properties.asScala.map { e =>
            if (!e.getValue.isNumber) throw new UserException(
              s"stratifiedSample fraction for '${e.getKey}' must be a number")
            e.getKey -> e.getValue.asDouble
          }.toMap
        }.getOrElse(Map.empty[String, Double])
        val dflt = dbl("default", 0.0)
        if ((dflt +: fr.values.toSeq).exists(f => f < 0 || f > 1))
          throw new UserException(
            "stratifiedSample fractions must be in [0,1]")
        StratifiedSample(strata, fr, dflt)
      case "truncateTokens" =>
        val m = int("maxTokens", -1)
        if (m < 1)
          throw new UserException("truncateTokens needs 'maxTokens' >= 1")
        TruncateTokens(m)
      case "pack" =>
        val t = lng("targetTokens", -1L)
        if (t < 1)
          throw new UserException("pack needs 'targetTokens' >= 1")
        val b = int("buckets", 256)
        if (b < 1)
          throw new UserException("pack needs 'buckets' >= 1")
        Pack(t, b)
      case "decontaminate" =>
        val ng = int("ngram", 3)
        if (ng < 1)
          throw new UserException("decontaminate 'ngram' must be >= 1")
        Decontaminate(
          evalPath = req(n, "evalPath").asText,
          evalFormat = fmt(n, "evalFormat"),
          evalTextColumn = opt(n, "evalTextColumn").map(_.asText)
            .getOrElse("text"),
          ngram = ng)
      case "decontaminateFuzzy" =>
        val thr = dbl("threshold", 0.8)
        if (thr <= 0 || thr > 1)
          throw new UserException(
            "decontaminateFuzzy 'threshold' must be in (0,1]")
        val sh = int("shingleSize", 3)
        if (sh < 1)
          throw new UserException(
            "decontaminateFuzzy 'shingleSize' must be >= 1")
        DecontaminateFuzzy(
          evalPath = req(n, "evalPath").asText,
          evalFormat = fmt(n, "evalFormat"),
          evalTextColumn = opt(n, "evalTextColumn").map(_.asText)
            .getOrElse("text"),
          threshold = thr,
          shingleSize = sh)
      case "mix" =>
        val w0 = dbl("weight", 1.0)
        val extra = opt(n, "extra").toSeq.flatMap(_.elements.asScala).map { e =>
          val w = Option(e.get("weight")).map { v =>
            if (!v.isNumber) throw new UserException(
              "mix source 'weight' must be a number")
            v.asDouble
          }.getOrElse(1.0)
          MixSource(req(e, "input").asText, w, fmt(e, "format"))
        }
        if (extra.isEmpty)
          throw new UserException("mix needs a non-empty 'extra' source list")
        if ((w0 +: extra.map(_.weight)).exists(w => w < 0 || w > 1))
          throw new UserException("mix weights are keep-fractions in [0,1]")
        Mix(w0, extra)
      case "capPerSource" =>
        val k = int("maxPerSource", -1)
        if (k < 1)
          throw new UserException("capPerSource needs 'maxPerSource' >= 1")
        val prior = opt(n, "graphPrior").map { g =>
          GraphPrior(
            input = req(g, "input").asText,
            format = readFormat(g, "format"),
            sourceColumn = opt(g, "sourceColumn").map(_.asText)
              .getOrElse("id"),
            weightColumn = opt(g, "weightColumn").map(_.asText)
              .getOrElse("rank_q"))
        }
        CapPerSource(opt(n, "sourceColumn").map(_.asText)
          .getOrElse("source"), k, prior)
      case "split" =>
        val tr = int("trainPct", -1); val va = int("valPct", 0)
        if (tr < 0 || va < 0 || tr + va > 100)
          throw new UserException(
            "split needs trainPct/valPct percentages fitting in [0,100]")
        Split(tr, va, opt(n, "column").map(_.asText).getOrElse("split"))
      case other =>
        throw new UserException(s"Pipeline step '$other' does not exist.")
    }
  }

  /** `parameters.db.ssh` block (same shape in both row definitions,
    * reference: RedshiftConfigDefinition.php:100-132). */
  private def parseSsh(params: JsonNode): SshConfig =
    opt(params, "db").flatMap(db => opt(db, "ssh")).map { ssh =>
      SshConfig(
        enabled = opt(ssh, "enabled").exists(_.asBoolean),
        sshHost = opt(ssh, "sshHost").map(_.asText),
        sshPort = opt(ssh, "sshPort").map(_.asInt).getOrElse(22),
        remoteHost = opt(ssh, "remoteHost").map(_.asText),
        remotePort = opt(ssh, "remotePort").map(_.asInt),
        localPort = opt(ssh, "localPort").map(_.asInt).getOrElse(33006),
        user = opt(ssh, "user").map(_.asText))
    }.getOrElse(SshConfig())

  private def parseTable(n: JsonNode): TableConfig = TableConfig(
    tableId = req(n, "tableId").asText,
    dbName = req(n, "dbName").asText,
    export = opt(n, "export").forall(_.asBoolean),
    incremental = opt(n, "incremental").exists(_.asBoolean),
    primaryKey = opt(n, "primaryKey").toSeq
      .flatMap(_.elements.asScala.map(_.asText)),
    items = opt(n, "items").toSeq
      .flatMap(_.elements.asScala.map(parseItem)),
    allowAddColumns = opt(n, "allowAddColumns").exists(_.asBoolean))

  private def parseItem(n: JsonNode): ColumnSpec = ColumnSpec(
    name = req(n, "name").asText,
    dbName = req(n, "dbName").asText,
    dataType = req(n, "type").asText,
    size = opt(n, "size").map(_.asText).filter(_.nonEmpty),
    nullable = opt(n, "nullable").exists(_.asBoolean),
    default = opt(n, "default").map(_.asText).filter(_.nonEmpty))

  private def validate(t: TableConfig): Unit =
    t.items.filterNot(c => TypeMapper.isAllowed(c.dataType)).foreach { c =>
      throw new UserException(
        s"Type '${c.dataType}' of column '${c.name}' is not supported")
    }

  /** Order-sensitive equality of the input column list vs the declared
    * items — the reference hard-fails on any difference because COPY
    * maps CSV columns to DDL columns positionally
    * (reference: RedshiftApplication.php:169-184). */
  def checkColumns(inputColumns: Seq[String], table: TableConfig): Unit = {
    val expected = table.items.map(_.name)
    if (inputColumns != expected)
      throw new UserException(
        s"Columns in configuration of table '${table.tableId}' don't match " +
          s"with input mapping. Expected [${expected.mkString(", ")}], " +
          s"got [${inputColumns.mkString(", ")}]")
  }

  private def req(n: JsonNode, f: String): JsonNode =
    Option(n.get(f)).getOrElse(throw new UserException(s"Missing '$f' key"))
  private def opt(n: JsonNode, f: String): Option[JsonNode] =
    Option(n.get(f)).filterNot(_.isNull)
}
