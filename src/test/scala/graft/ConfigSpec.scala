package graft

import graft.model._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Config parsing + type mapping (SURVEY §1, §2.2 P3-P5, O7) — pure
  * JVM, no Spark session needed. */
class ConfigSpec extends AnyFunSuite with Matchers {

  test("multi-table config parses with reference defaults") {
    val cfg = ConfigParser.parse(
      """{"parameters": {"tables": [
        |  {"tableId": "simple", "dbName": "simple",
        |   "incremental": true, "primaryKey": ["id"],
        |   "items": [
        |     {"name": "id", "dbName": "id", "type": "int"},
        |     {"name": "name", "dbName": "name", "type": "nvarchar", "size": "255"}
        |   ]},
        |  {"tableId": "skipped", "dbName": "skipped", "export": false,
        |   "items": [{"name": "x", "dbName": "x", "type": "text"}]}
        |]}}""".stripMargin)
    cfg.action shouldBe "run"
    cfg.tables.length shouldBe 2
    val t = cfg.tables.head
    t.incremental shouldBe true
    t.primaryKey shouldBe Seq("id")
    t.export shouldBe true                  // default true
    cfg.tables(1).export shouldBe false     // table-level filter P3
    cfg.tables(1).incremental shouldBe false // default false
  }

  test("config-row mode: parameters node is the single table") {
    val cfg = ConfigParser.parse(
      """{"parameters": {"tableId": "row", "dbName": "row",
        |  "items": [{"name": "id", "dbName": "id", "type": "int"}]}}""".stripMargin)
    cfg.tables.map(_.tableId) shouldBe Seq("row")
  }

  test("action configs need no table (testConnection)") {
    val cfg = ConfigParser.parse("""{"action": "testConnection", "parameters": {}}""")
    cfg.action shouldBe "testConnection"
    cfg.tables shouldBe Nil
  }

  test("unsupported type rejected with UserException") {
    val e = intercept[UserException](ConfigParser.parse(
      """{"parameters": {"tableId": "t", "dbName": "t",
        |  "items": [{"name": "x", "dbName": "x", "type": "geometry"}]}}""".stripMargin))
    e.getMessage should include("geometry")
  }

  test("checkColumns is order-sensitive (P5, RedshiftApplication.php:169-184)") {
    val t = TableConfig("t", "t", items = Seq(
      ColumnSpec("a", "a", "int"), ColumnSpec("b", "b", "int")))
    ConfigParser.checkColumns(Seq("a", "b"), t) // ok
    intercept[UserException](ConfigParser.checkColumns(Seq("b", "a"), t))
    intercept[UserException](ConfigParser.checkColumns(Seq("a"), t))
  }

  test("type whitelist maps per SURVEY §1") {
    TypeMapper.toSpark("int") shouldBe IntegerType
    TypeMapper.toSpark("int2") shouldBe ShortType
    TypeMapper.toSpark("bigint") shouldBe LongType
    TypeMapper.toSpark("decimal", Some("10,2")) shouldBe DecimalType(10, 2)
    TypeMapper.toSpark("numeric", Some("7")) shouldBe DecimalType(7, 0)
    TypeMapper.toSpark("decimal") shouldBe DecimalType(18, 0)
    TypeMapper.toSpark("real") shouldBe FloatType
    TypeMapper.toSpark("double precision") shouldBe DoubleType
    TypeMapper.toSpark("boolean") shouldBe BooleanType
    TypeMapper.toSpark("varchar", Some("255")) shouldBe StringType
    TypeMapper.toSpark("text") shouldBe StringType
    TypeMapper.toSpark("date") shouldBe DateType
    TypeMapper.toSpark("timestamp") shouldBe TimestampType
    // the explicit no-zone spelling maps to the faithful NTZ type —
    // values don't move if a consumer changes session timezone
    TypeMapper.toSpark("timestamp without timezone") shouldBe TimestampNTZType
    TypeMapper.isAllowed("IGNORE") shouldBe true
    TypeMapper.isAllowed("geometry") shouldBe false
  }

  test("ignore columns drop from schema; source schema keeps them as strings") {
    val t = TableConfig("t", "t", items = Seq(
      ColumnSpec("a", "a2", "int"),
      ColumnSpec("sec", "sec", "ignore"),
      ColumnSpec("b", "b2", "varchar", Some("10"), nullable = false)))
    t.schema shouldBe StructType(Seq(
      StructField("a2", IntegerType, nullable = true),
      StructField("b2", StringType, nullable = false)))
    t.sourceSchema.fieldNames.toSeq shouldBe Seq("a", "sec", "b")
    t.sourceSchema.fields.forall(_.dataType == StringType) shouldBe true
  }

  test("ssh block parses with reference defaults (O8, config-only)") {
    val cfg = ConfigParser.parse(
      """{"parameters": {"db": {"ssh": {"enabled": true, "sshHost": "bastion",
        |  "user": "svc", "remoteHost": "db.internal"}},
        |  "tableId": "t", "dbName": "t",
        |  "items": [{"name": "id", "dbName": "id", "type": "int"}]}}""".stripMargin)
    cfg.ssh.enabled shouldBe true
    cfg.ssh.sshHost shouldBe Some("bastion")
    cfg.ssh.sshPort shouldBe 22       // default
    cfg.ssh.localPort shouldBe 33006  // default
    ConfigParser.parse(
      """{"parameters": {"tableId": "t", "dbName": "t",
        |  "items": [{"name": "id", "dbName": "id", "type": "int"}]}}""".stripMargin)
      .ssh.enabled shouldBe false
  }

  test("varcharLength only for varchar family with numeric size") {
    ColumnSpec("x", "x", "varchar", Some("42")).varcharLength shouldBe Some(42)
    ColumnSpec("x", "x", "text", Some("42")).varcharLength shouldBe None
    ColumnSpec("x", "x", "varchar", None).varcharLength shouldBe None
  }

  test("pipeline steps refuse non-numeric numeric fields (no silent 0-coercion)") {
    def pipe(steps: String) = ConfigParser.parse(
      s"""{"action": "pipeline", "parameters": {"pipeline": {
         |  "input": "in/x", "output": "out/x", "steps": [$steps]}}}"""
        .stripMargin)
    // Jackson's asDouble would coerce "abc" to 0.0 — which PASSES the
    // range check and would silently sample an empty corpus
    val e = intercept[UserException] {
      pipe("""{"type": "sample", "fraction": "abc"}""") }
    e.getMessage should include("'fraction' must be a number")
    intercept[UserException] {
      pipe("""{"type": "split", "trainPct": "80", "valPct": 10}""") }
    intercept[UserException] {
      pipe("""{"type": "dedupMinhash", "bands": 2.5}""") }
    // well-formed numerics still parse
    pipe("""{"type": "sample", "fraction": 0.25}""")
      .pipeline.get.steps.head shouldBe PipelineStep.Sample(0.25)
  }
}
