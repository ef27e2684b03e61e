package graft.sources

import graft.model.TableConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) source with the same declared-schema
  * and cast/validate semantics as [[CsvIngest]] — the arrival format
  * of most document corpora. The reference ingests CSV only
  * (src/Keboola/DbWriter/Writer/Redshift.php:92-114); this widens the
  * same load path to raw JSONL drops without touching the downstream
  * cast/strict/quarantine machinery.
  *
  * The reader gets the table's all-string source schema (scalars
  * coerce to their literal text; typing is [[CsvIngest.castAndProject]]'s
  * job, identical to CSV) plus a corrupt-record column: a line that is
  * not a parseable JSON object lands whole in `__corrupt` (PERMISSIVE
  * mode) instead of aborting the scan, and [[split]] peels those off
  * as the dead-letter side — the JSON analog of the CSV quarantine
  * twins. Schema is never inferred (no extra inference pass); scans
  * parallelize per file/split like any text source.
  */
object JsonIngest {

  private val corruptCol = "__corrupt"

  /** Parse a JSONL file/dir with the declared source schema. Every
    * declared column arrives as its literal text (string); malformed
    * lines carry their raw text in `__corrupt` and NULL elsewhere.
    *
    * Parsed as `from_json` over a text scan rather than the raw JSON
    * file source: same single pass (JsonToStructs is codegen'd), but
    * the corrupt side stays queryable standalone — the file source
    * REFUSES plans whose pruned columns are only the corrupt record
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    * documented cache() workaround is a non-starter for a 100 TB scan.
    * Blank lines are dropped (not corrupt); a line whose parse returns
    * no struct at all quarantines with its raw text. */
  def read(spark: SparkSession, path: String, table: TableConfig): DataFrame = {
    val schema = StructType(table.sourceSchema.fields)
      .add(corruptCol, StringType, nullable = true)
    val opts = Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> corruptCol)
    val fields = table.sourceSchema.fieldNames.toSeq.map(n =>
      col("j.`" + n.replace("`", "``") + "`"))
    // a top-level JSON ARRAY is corrupt for JSONL (one object per
    // line): from_json with a struct schema would silently collapse
    // it to its FIRST object, dropping the rest with no signal.
    // Whitespace-class strip, not ltrim (which strips spaces only —
    // a leading tab/CR is legal JSON whitespace Jackson accepts).
    val isArray = regexp_extract(col("value"), "^\\s*(.)", 1) === "["
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .withColumn("j", from_json(col("value"), schema, opts))
      .select(fields :+
        coalesce(col(s"j.$corruptCol"),
          when(col("j").isNull || isArray, col("value"))).as(corruptCol): _*)
  }

  /** (parsed, corrupt) split of a [[read]] frame — one pass over the
    * scan, both branches stay distributed. `parsed` matches
    * [[CsvIngest.read]]'s shape exactly, so the strict COPY-semantics
    * validation and quarantine twins compose unchanged. */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.filter(col(corruptCol).isNull).drop(corruptCol)
    val corrupt = df.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    (parsed, corrupt)
  }

  /** One-call JSONL load with COPY-strict semantics: corrupt lines
    * quarantined, then the same per-column cast/NOT NULL validation
    * and typed projection as the CSV path. Returns (typed rows,
    * corrupt raw lines). Strict-error line numbers count PARSED rows
    * (1-based): corrupt lines are already peeled off, so physical file
    * offsets shift by the number of corrupt lines above them. */
  def readStrict(spark: SparkSession, path: String,
                 table: TableConfig): (DataFrame, DataFrame) = {
    val (parsed, corrupt) = split(read(spark, path, table))
    // header = false: JSONL has no header line, so data starts at line 1
    (CsvIngest.castAndProjectStrict(parsed, table, header = false), corrupt)
  }
}
