package graft.model

import org.apache.spark.sql.types._

/** Column spec of a configured table.
  *
  * Mirrors the reference's `items[]` node
  * (reference: src/Keboola/DbWriter/Redshift/Configuration/RedshiftConfigDefinition.php:67-90):
  * `{name, dbName, type, size, nullable, default}` where `name` is the
  * source (CSV) column and `dbName` the destination column.
  */
final case class ColumnSpec(
    name: String,
    dbName: String,
    dataType: String,
    size: Option[String] = None,
    nullable: Boolean = true,
    default: Option[String] = None) {

  /** `type == "ignore"` drops the column from DDL and load
    * (reference: src/Keboola/DbWriter/Writer/Redshift.php:133-135,164-166). */
  def ignored: Boolean = dataType.equalsIgnoreCase("ignore")

  /** Spark type for this column (see [[TypeMapper]]). */
  def sparkType: DataType = TypeMapper.toSpark(dataType, size)

  /** varchar-family length modifier, when present — drives
    * TRUNCATECOLUMNS-style substring on ingest
    * (reference: src/Keboola/DbWriter/Writer/Redshift.php:104). */
  def varcharLength: Option[Int] =
    if (TypeMapper.isVarcharFamily(dataType)) size.flatMap(_.trim.toIntOption)
    else None

  /** char-family columns blank-pad to their declared width (Redshift
    * CHAR semantics; SURVEY §1 pad-truncate), unlike varchar-family
    * which only truncates. */
  def charFamily: Boolean = TypeMapper.isCharFamily(dataType)
}

/** S3 staging block of an input-mapping manifest sidecar — the
  * reference's `manifest['s3']` node handed to `writeFromS3`
  * (reference: RedshiftApplication.php:85,120,138;
  * Writer/Redshift.php:79-114): where the staged CSV lives and the
  * temporary credentials Redshift's COPY uses. Here the same block
  * resolves to an `s3a://` read with the credentials applied to the
  * Hadoop connector configuration. */
final case class S3Staged(
    bucket: String,
    key: String,
    isSliced: Boolean = false,
    region: Option[String] = None,
    accessKeyId: Option[String] = None,
    secretAccessKey: Option[String] = None,
    sessionToken: Option[String] = None)

/** SSH tunnel block — parsed for config parity (O8); the tunnel itself
  * is out of scope for the in-engine data path (in the reference the
  * common lib opens it; here reads go straight to storage).
  * Reference: RedshiftConfigDefinition.php:100-132. */
final case class SshConfig(
    enabled: Boolean = false,
    sshHost: Option[String] = None,
    sshPort: Int = 22,
    remoteHost: Option[String] = None,
    remotePort: Option[Int] = None,
    localPort: Int = 33006,
    user: Option[String] = None)

/** One configured destination table.
  *
  * Mirrors a `parameters.tables[]` element (reference:
  * RedshiftConfigDefinition.php:40-99). Defaults follow the reference:
  * `export=true` (:60-62), `incremental=false` (:57-59).
  */
final case class TableConfig(
    tableId: String,
    dbName: String,
    export: Boolean = true,
    incremental: Boolean = false,
    primaryKey: Seq[String] = Nil,
    items: Seq[ColumnSpec] = Nil,
    /** Extension beyond the reference (which hard-fails on ANY column
      * drift, RedshiftApplication.php:169-184 — and that stays the
      * default): when true, an incremental load whose stage carries
      * extra NULLABLE columns NULL-fills the target side instead of
      * failing, so a continuously-maintained 100 TB table survives the
      * commonest upstream drift without a drop-and-reload. Added NOT
      * NULL columns and removed/retyped columns still fail loudly. */
    allowAddColumns: Boolean = false) {

  /** Columns that participate in the load (ignore-typed ones dropped). */
  def activeItems: Seq[ColumnSpec] = items.filterNot(_.ignored)

  /** Destination schema as a Spark StructType (never inferred — the
    * reference's schema is always declared, SURVEY §1). */
  def schema: StructType =
    StructType(activeItems.map(c => StructField(c.dbName, c.sparkType, c.nullable)))

  /** Source-side schema (all declared CSV columns as strings, in order
    * — CSV columns are untyped until the cast/project step). */
  def sourceSchema: StructType =
    StructType(items.map(c => StructField(c.name, StringType, nullable = true)))
}

/** Redshift type whitelist → Spark DataType.
  *
  * The whitelist is the reference's entire type system
  * (reference: src/Keboola/DbWriter/Writer/Redshift.php:17-26); mapping
  * per SURVEY §1. `size` is a scalar string so `"10,2"` works for
  * decimal (RedshiftConfigDefinition.php:82-83).
  */
object TypeMapper {
  val allowed: Set[String] = Set(
    "int", "int2", "int4", "int8", "smallint", "integer", "bigint",
    "decimal", "real", "double precision", "numeric", "float", "float4",
    "float8", "boolean", "char", "character", "nchar", "bpchar",
    "varchar", "character varying", "nvarchar", "text", "date",
    "timestamp", "timestamp without timezone", "ignore")

  private val varcharFamily =
    Set("varchar", "character varying", "nvarchar", "char", "character", "nchar", "bpchar")

  private val charFamily = Set("char", "character", "nchar", "bpchar")

  def isVarcharFamily(t: String): Boolean = varcharFamily(t.toLowerCase)

  def isCharFamily(t: String): Boolean = charFamily(t.toLowerCase)

  def isAllowed(t: String): Boolean = allowed(t.toLowerCase)

  /** Parse a decimal size spec: "10,2" → (10,2); "10" → (10,0);
    * absent → Redshift's DECIMAL default (18,0). */
  private def decimalSize(size: Option[String]): (Int, Int) =
    size.map(_.split(",").map(_.trim)) match {
      case Some(Array(p))    => (p.toInt, 0)
      case Some(Array(p, s)) => (p.toInt, s.toInt)
      case _                 => (18, 0)
    }

  def toSpark(t: String, size: Option[String] = None): DataType =
    t.toLowerCase match {
      case "int" | "integer" | "int4"             => IntegerType
      case "int2" | "smallint"                    => ShortType
      case "int8" | "bigint"                      => LongType
      case "decimal" | "numeric"                  => val (p, s) = decimalSize(size); DecimalType(p, s)
      case "real" | "float4"                      => FloatType
      case "double precision" | "float" | "float8" => DoubleType
      case "boolean"                              => BooleanType
      case v if varcharFamily(v)                  => StringType // length enforced by truncate on ingest
      case "text"                                 => StringType
      case "date"                                 => DateType
      // Redshift's TIMESTAMP has no zone. The explicit spelling maps to
      // Spark's faithful TimestampNTZType (tz-independent); the bare
      // `timestamp` keeps TimestampType with the session TZ pinned UTC
      // (value-equivalent under the pin, and what parquet consumers of
      // the existing layout expect).
      case "timestamp without timezone"           => TimestampNTZType
      case "timestamp"                            => TimestampType
      case other =>
        throw new IllegalArgumentException(s"Type '$other' is not supported")
    }
}
