package graft.sources

import graft.model.{ColumnSpec, TableConfig, UserException}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.jdk.CollectionConverters._

/** CSV sources with the reference's COPY dialect.
  *
  * The reference loads CSV with
  * `DELIMITER ',' CSV QUOTE '"' NULL AS 'NULL' ACCEPTANYDATE
  * TRUNCATECOLUMNS IGNOREHEADER 1 GZIP`
  * (reference: src/Keboola/DbWriter/Writer/Redshift.php:92-114), i.e.
  * comma-delimited, `"` quote, `""` embedded-quote escape, literal
  * newlines allowed inside quoted fields, the literal string `NULL`
  * decodes to SQL NULL, header skipped for whole files and absent in
  * sliced files. Spark's CSV reader covers all of it declaratively —
  * scans parallelize per file/split on executors, which is the Spark
  * analog of Redshift's parallel sliced COPY.
  */
object CsvIngest {

  /** Reference CSV dialect (SURVEY §1). `escape='"'` (doubled quotes,
    * not backslash) + multiLine are the two gotchas; `special.csv` is
    * the gate fixture. */
  private def reader(spark: SparkSession, header: Boolean) =
    spark.read
      .option("header", header.toString)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", "true")
      .option("nullValue", "NULL")
      .option("emptyValue", "")

  /** Read one CSV file/dir with the declared (all-string) source schema. */
  def read(spark: SparkSession, path: String, table: TableConfig,
           header: Boolean = true): DataFrame =
    reader(spark, header).schema(table.sourceSchema).csv(path)

  /** The file's actual header column names (no declared schema — Spark
    * takes the names from the header row). Drives the order-sensitive
    * input-mapping check (P5): with a declared schema the reader maps
    * positionally and never sees the header, so the check must read it
    * explicitly — same split as the reference, whose column list comes
    * from the storage manifest, not the COPY
    * (RedshiftApplication.php:141-146,169-184). */
  def headerColumns(spark: SparkSession, path: String): Seq[String] =
    reader(spark, header = true).csv(path).columns.toSeq

  /** Sliced-file mode: explicit file list, no header rows
    * (reference: Writer/Redshift.php:107-108). An empty entry list is a
    * no-op load → empty frame (reference: Writer/Redshift.php:83-90). */
  def readSlices(spark: SparkSession, paths: Seq[String],
                 table: TableConfig): DataFrame =
    if (paths.isEmpty)
      spark.createDataFrame(List.empty[Row].asJava, table.sourceSchema)
    else reader(spark, header = false).schema(table.sourceSchema).csv(paths: _*)

  /** Parse a COPY-style JSON manifest `{"entries":[{"url": …}, …]}`
    * into its file list (reference: Writer/Redshift.php:326-343). */
  def manifestEntries(spark: SparkSession, manifestPath: String): Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File(manifestPath))
    Option(root.get("entries")).toSeq
      .flatMap(_.elements.asScala.map(e => e.get("url").asText))
  }

  /** Typed projection: rename `name`→`dbName`, drop `ignore` columns,
    * truncate varchar(n) (= TRUNCATECOLUMNS), lenient casts (garbage →
    * NULL, = ACCEPTANYDATE-style tolerance), apply declared defaults to
    * missing values.
    *
    * All of it is a single narrow `select` — no shuffle, fully
    * codegen'd, and Catalyst prunes the ignored columns out of the scan.
    */
  def castAndProject(df: DataFrame, table: TableConfig): DataFrame = {
    val cols = table.activeItems.map { c =>
      val src = quoted(c.name)
      val truncated = c.varcharLength match {
        case Some(n) => s"substring($src, 1, $n)"
        case None    => src
      }
      val casted = expr(s"try_cast($truncated as ${c.sparkType.sql})")
      val withDefault = c.default match {
        case Some(d) if !c.dataType.equalsIgnoreCase("text") =>
          // reference renders DEFAULT '<v>' for all types except TEXT
          // (Writer/Redshift.php:142-145)
          coalesce(casted, lit(d).cast(c.sparkType))
        case _ => casted
      }
      withDefault.as(c.dbName)
    }
    df.select(cols: _*)
  }

  /** Backtick-quote an identifier for splicing into a SQL expression. */
  private def quoted(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** Strict ingest: like [[castAndProject]] but any value that fails its
    * cast aborts the load with a per-column, per-line error — the Spark
    * analog of the reference surfacing `stl_load_errors` as
    * "Column 'x', line N: …" (reference: Writer/Redshift.php:262-285;
    * asserted tests/Keboola/FunctionalTest.php:74-78).
    *
    * Line numbers are 1-based and count the header (so the first data
    * row is line 2), matching the reference's fixture assertions. The
    * line index is derived per-partition with zipWithIndex — only on
    * this validation path; the happy path stays a pure narrow select.
    */
  def castAndProjectStrict(df: DataFrame, table: TableConfig,
                           header: Boolean = true): DataFrame = {
    val base = if (header) 2L else 1L // first data row's 1-based line
    val withLine = zipWithLineNumbers(df, base)
    val bad = table.activeItems
      .filter(c => c.sparkType != StringType)
      .map { c =>
        val raw = col(c.name)
        val casted = expr(s"try_cast(${quoted(c.name)} as ${c.sparkType.sql})")
        (c, raw.isNotNull && casted.isNull)
      }
    bad.foldLeft(()) { case (_, (c, pred)) =>
      val offenders = withLine.filter(pred).select(col("__line"), col(c.name))
        .orderBy(col("__line")).limit(1).collect()
      offenders.headOption.foreach { r =>
        // message mirrors Redshift's stl_load_errors text that the
        // reference surfaces verbatim (tests/Keboola/FunctionalTest.php:74-78)
        val value = String.valueOf(r.get(1))
        val reason = c.sparkType match {
          case org.apache.spark.sql.types.DateType if value.length < 10 =>
            "Invalid Date Format - length must be 10 or more"
          case org.apache.spark.sql.types.DateType =>
            s"Invalid date format - Invalid digit encountered"
          case org.apache.spark.sql.types.TimestampType =>
            "Invalid timestamp format or value out of range"
          case t => s"Invalid digit, Value '$value', type ${t.simpleString}"
        }
        throw new UserException(
          s"Column '${c.dbName}', line ${r.getLong(0)}: $reason")
      }
    }
    castAndProject(df, table)
  }

  /** Dead-letter split: partition the raw frame into (clean, quarantined)
    * in ONE pass over the plan — rows where every declared cast succeeds
    * flow to the typed output; offenders keep their raw values plus an
    * `__errors` array naming each failing column. The scalable sibling
    * of [[castAndProjectStrict]]: no driver-side collect, no abort —
    * bad rows land in a quarantine sink for reprocessing.
    */
  def castAndProjectQuarantine(df: DataFrame, table: TableConfig): (DataFrame, DataFrame) = {
    val checks = table.activeItems
      .filter(c => c.sparkType != StringType)
      .map { c =>
        val casted = expr(s"try_cast(${quoted(c.name)} as ${c.sparkType.sql})")
        (col(c.name).isNotNull && casted.isNull, c.dbName)
      }
    val errs = array_compact(array(checks.map { case (pred, name) =>
      when(pred, lit(name)).otherwise(lit(null).cast("string"))
    }: _*))
    val flagged = df.withColumn("__errors", errs)
    val clean = castAndProject(flagged.filter(size(col("__errors")) === 0)
      .drop("__errors"), table)
    val quarantined = flagged.filter(size(col("__errors")) > 0)
    (clean, quarantined)
  }

  /** Attach 1-based line numbers (offset by `base`) preserving input
    * order. zipWithIndex is a narrow op plus one tiny count job — used
    * only on the strict-validation path. */
  private def zipWithLineNumbers(df: DataFrame, base: Long): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(StructField("__line", org.apache.spark.sql.types.LongType,
      nullable = false) +: df.schema.fields)
    val rdd = df.rdd.zipWithIndex.map { case (row, i) =>
      Row.fromSeq((i + base) +: row.toSeq)
    }
    spark.createDataFrame(rdd, schema)
  }
}
