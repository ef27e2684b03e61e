package graft

import graft.model.{ColumnSpec, TableConfig, UserException}
import graft.sources.CsvIngest
import java.nio.file.Files

/** CSV dialect + cast/project, ported from the reference's fixtures
  * (FIXTURES.md): the `special.csv` torture test, header-only `empty`,
  * `NULL` literal decoding, sliced/manifest mode, and the strict
  * `bad_type` error ("Column 'created', line 3", reference
  * tests/Keboola/FunctionalTest.php:12-79).
  */
class CsvIngestSpec extends SparkSpec {

  private def tmpCsv(content: String): String = {
    val f = Files.createTempFile("graft-test", ".csv")
    Files.writeString(f, content)
    f.toString
  }

  private val twoCol = TableConfig("t", "t", items = Seq(
    ColumnSpec("col1", "col1", "varchar", Some("255")),
    ColumnSpec("col2", "col2", "varchar", Some("255"))))

  test("special.csv dialect: doubled quotes, commas, newlines, tabs in quoted fields") {
    // mirrors reference tests/data/in/tables/special.csv
    val path = tmpCsv(
      "\"col1\",\"col2\"\n" +
        "\"without special\",\"chars\"\n" +
        "\"with\n\nnew\nlines\",\"columns\"\n" +
        "\"with \"\"double\"\" quotes\",\"columns\"\n" +
        "\"with comma, inside\",\"columns\"\n" +
        "\"with\ttab\",\"columns\"\n")
    val got = rows(CsvIngest.read(spark, path, twoCol).orderBy("col2", "col1"))
    got should contain(Seq("with \"double\" quotes", "columns"))
    got should contain(Seq("with comma, inside", "columns"))
    got should contain(Seq("with\n\nnew\nlines", "columns"))
    got should contain(Seq("with\ttab", "columns"))
    got.length shouldBe 5
  }

  test("header-only empty.csv loads zero rows with declared schema") {
    val path = tmpCsv("\"id\",\"name\"\n")
    val t = TableConfig("empty", "empty", items = Seq(
      ColumnSpec("id", "id", "int"),
      ColumnSpec("name", "name", "nvarchar", Some("255"))))
    val df = CsvIngest.read(spark, path, t)
    df.count() shouldBe 0
    df.columns.toSeq shouldBe Seq("id", "name")
  }

  test("literal NULL decodes to SQL NULL; empty string stays empty") {
    val path = tmpCsv("\"col1\",\"col2\"\nNULL,\"\"\n\"x\",NULL\n")
    val got = rows(CsvIngest.read(spark, path, twoCol).orderBy("col1"))
    got shouldBe Seq(Seq(null, ""), Seq("x", null))
  }

  test("sliced mode: no header, explicit file list; empty list is a no-op") {
    val p1 = tmpCsv("\"a\",\"1\"\n")
    val p2 = tmpCsv("\"b\",\"2\"\n")
    val df = CsvIngest.readSlices(spark, Seq(p1, p2), twoCol)
    rows(df.orderBy("col1")) shouldBe Seq(Seq("a", "1"), Seq("b", "2"))
    val empty = CsvIngest.readSlices(spark, Nil, twoCol)
    empty.count() shouldBe 0
    empty.columns.toSeq shouldBe Seq("col1", "col2")
  }

  test("manifest entries parse; missing entries key → empty") {
    val m = Files.createTempFile("graft-manifest", ".json")
    Files.writeString(m,
      """{"entries":[{"url":"s3://b/k1.gz"},{"url":"s3://b/k2.gz"}]}""")
    CsvIngest.manifestEntries(spark, m.toString) shouldBe
      Seq("s3://b/k1.gz", "s3://b/k2.gz")
    val m2 = Files.createTempFile("graft-manifest2", ".json")
    Files.writeString(m2, """{}""")
    CsvIngest.manifestEntries(spark, m2.toString) shouldBe Nil
  }

  test("castAndProject: rename, ignore-drop, varchar truncate, defaults, casts") {
    import spark.implicits._
    val t = TableConfig("t", "t", items = Seq(
      ColumnSpec("id", "pk", "int"),
      ColumnSpec("name", "label", "varchar", Some("3")),
      ColumnSpec("secret", "secret", "ignore"),
      ColumnSpec("prize", "prize", "decimal", Some("10,2"), default = Some("0")),
      ColumnSpec("note", "note", "text", default = Some("dropped-for-text"))))
    val df = Seq(("1", "abcdef", "shh", "299.9", null: String),
      ("2", "xy", "shh", null: String, null: String),
      ("3", "zz", "shh", "not-a-number", null: String))
      .toDF("id", "name", "secret", "prize", "note")
    val got = rows(CsvIngest.castAndProject(df, t).orderBy("pk"))
    got.head shouldBe Seq(1, "abc", new java.math.BigDecimal("299.90"), null)
    // explicit NULL stays NULL — DEFAULT only fires when no usable
    // value arrives, matching the reference's DB-side DDL semantics
    // (Redshift.php:141-145); TEXT default discarded (:142-145)
    got(1) shouldBe Seq(2, "xy", null, null)
    // unparsed value → repaired by the declared default
    got(2) shouldBe Seq(3, "zz", new java.math.BigDecimal("0.00"), null)
  }

  test("char(n) blank-pads to width; varchar only truncates") {
    import spark.implicits._
    val t = TableConfig("t", "t", items = Seq(
      ColumnSpec("id", "id", "int"),
      ColumnSpec("code", "code", "char", Some("5")),
      ColumnSpec("name", "name", "varchar", Some("5"))))
    val df = Seq(("1", "ab", "ab"), ("2", "abcdefgh", "abcdefgh"),
      ("3", null: String, null: String)).toDF("id", "code", "name")
    val got = rows(CsvIngest.castAndProject(df, t).orderBy("id"))
    got shouldBe Seq(
      Seq(1, "ab   ", "ab"),       // char pads, varchar doesn't
      Seq(2, "abcde", "abcde"),    // both truncate past the width
      Seq(3, null, null))          // NULL stays NULL, no padding
  }

  test("strict mode enforces NOT NULL with the stl_load_errors message") {
    import spark.implicits._
    val t = TableConfig("t", "t", items = Seq(
      ColumnSpec("id", "id", "int", nullable = false),
      ColumnSpec("name", "name", "varchar", Some("10"))))
    val df = Seq(("1", "a"), (null: String, "b"), ("3", null: String))
      .toDF("id", "name")
    val e = intercept[UserException] {
      CsvIngest.castAndProjectStrict(df, t)
    }
    e.getMessage shouldBe
      "Column 'id', line 3: Missing data for not-null field"
  }

  test("strict validation runs a bounded number of jobs regardless of column count") {
    import spark.implicits._
    // 4 typed columns + NOT NULL — the old implementation ran one job
    // per check; the fold into a single aggregation must keep the job
    // count flat (zipWithIndex offsets + one agg)
    val t = TableConfig("w", "w", items = Seq(
      ColumnSpec("a", "a", "int", nullable = false),
      ColumnSpec("b", "b", "int"),
      ColumnSpec("c", "c", "date"),
      ColumnSpec("d", "d", "decimal", Some("10,2")),
      ColumnSpec("e", "e", "timestamp")))
    val df = Seq(("1", "2", "2020-01-01", "1.5", "nope"))
      .toDF("a", "b", "c", "d", "e")
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      intercept[UserException] { CsvIngest.castAndProjectStrict(df, t) }
      Thread.sleep(1000) // listener events are delivered asynchronously
    } finally spark.sparkContext.removeSparkListener(listener)
    // exists-probe (≤2 AQE stage jobs) + zipWithIndex offsets + the one
    // location aggregation (≤2) — flat in column count; the old
    // per-column loop ran one aggregation per check (10+ here)
    counter.get() should be <= 5
  }

  test("clean strict load stays in codegen: no RDD scan, one probe job") {
    import spark.implicits._
    val t = TableConfig("w", "w", items = Seq(
      ColumnSpec("a", "a", "int", nullable = false),
      ColumnSpec("b", "b", "date"),
      ColumnSpec("c", "c", "decimal", Some("10,2"))))
    val df = Seq(("1", "2020-01-01", "1.50"), ("2", "2021-06-30", "9.25"))
      .toDF("a", "b", "c")
    // phase 1's offender-exists probe is a pure vectorized aggregation:
    // no RDD conversion, no object (de)serialization in its plan
    val probe = CsvIngest.strictExistsFrame(df, t)
    val plan = probe.queryExecution.executedPlan.toString
    plan should not include "ExistingRDD"
    plan should not include "DeserializeToObject"
    plan should not include "SerializeFromObject"
    plan should include("HashAggregate")
    // a clean load runs ONLY that probe — the zipWithIndex line-location
    // pass (RDD, extra scan) must not fire when no offender exists
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val out =
      try {
        val r = CsvIngest.castAndProjectStrict(df, t)
        Thread.sleep(1000) // listener events are delivered asynchronously
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    // one aggregation query (≤2 jobs under AQE) — the 3-job floor of
    // the old always-on zipWithIndex path is gone
    counter.get() should be <= 2
    rows(out.orderBy("a")).map(_.head) shouldBe Seq(1, 2)
  }

  test("quarantine tags NOT NULL violations") {
    import spark.implicits._
    val t = TableConfig("q", "q", items = Seq(
      ColumnSpec("id", "id", "int", nullable = false),
      ColumnSpec("v", "v", "varchar", Some("10"))))
    val df = Seq(("1", "a"), (null: String, "b")).toDF("id", "v")
    val (clean, quarantined) = CsvIngest.castAndProjectQuarantine(df, t)
    rows(clean).map(_.head) shouldBe Seq(1)
    val bad = quarantined.collect()
    bad.length shouldBe 1
    bad.head.getSeq[String](2).toSeq shouldBe Seq("id:notnull")
  }

  test("s3 scheme paths are accepted and normalized to s3a (no egress)") {
    CsvIngest.normalizeScheme("s3://bucket/key/slice.csv.gz") shouldBe
      "s3a://bucket/key/slice.csv.gz"
    CsvIngest.normalizeScheme("/local/path.csv") shouldBe "/local/path.csv"
    CsvIngest.normalizeScheme("hdfs://nn/path.csv") shouldBe "hdfs://nn/path.csv"
    // Hadoop Path parsing accepts the remote scheme without touching it
    val p = new org.apache.hadoop.fs.Path("s3a://bucket/in/tables/t.csv")
    p.toUri.getScheme shouldBe "s3a"
    p.getName shouldBe "t.csv"
    // manifests may name s3 slices; the URLs pass through verbatim
    val m = Files.createTempFile("graft-manifest-s3", ".json")
    Files.writeString(m,
      """{"entries":[{"url":"s3://b/slice.0000.csv.gz"}]}""")
    CsvIngest.manifestEntries(spark, m.toString)
      .map(CsvIngest.normalizeScheme) shouldBe Seq("s3a://b/slice.0000.csv.gz")
  }

  test("strict mode reports 'Column x, line N' like stl_load_errors (O5)") {
    // bad_type.csv: data row 2 (file line 3) has a garbage date
    val path = tmpCsv("\"id\",\"name\",\"created\"\n" +
      "\"1\",\"ok\",\"2020-01-01\"\n" +
      "\"2\",\"bad\",\"this is not a date\"\n")
    val t = TableConfig("bad_type", "bad_type", items = Seq(
      ColumnSpec("id", "id", "int"),
      ColumnSpec("name", "name", "nvarchar", Some("255")),
      ColumnSpec("created", "created", "date")))
    val raw = CsvIngest.read(spark, path, t)
    val e = intercept[UserException] {
      CsvIngest.castAndProjectStrict(raw, t)
    }
    e.getMessage should startWith("Column 'created', line 3")
    // the reference's exact stl_load_errors phrasing for short non-dates
    // ("this is not a date".length >= 10, so digit variant) — check the
    // short-value variant too
    val path2 = tmpCsv("\"id\",\"name\",\"created\"\n\"1\",\"x\",\"nope\"\n")
    val e2 = intercept[UserException] {
      CsvIngest.castAndProjectStrict(CsvIngest.read(spark, path2, t), t)
    }
    e2.getMessage shouldBe
      "Column 'created', line 2: Invalid Date Format - length must be 10 or more"
  }

  test("quarantine split: clean rows typed, offenders kept raw with error tags") {
    import spark.implicits._
    val t = TableConfig("q", "q", items = Seq(
      ColumnSpec("id", "id", "int"),
      ColumnSpec("created", "created", "date")))
    val df = Seq(("1", "2020-01-01"), ("x", "2020-01-02"), ("3", "nope"),
      ("y", "bad")).toDF("id", "created")
    val (clean, quarantined) = CsvIngest.castAndProjectQuarantine(df, t)
    rows(clean.orderBy("id")).map(_.head) shouldBe Seq(1)
    val bad = quarantined.orderBy("id").collect()
    bad.length shouldBe 3
    bad.map(_.getSeq[String](2).toSeq).toSeq shouldBe
      Seq(Seq("created"), Seq("id"), Seq("id", "created"))
  }

  test("source column names containing dots resolve literally, not as struct fields") {
    import spark.implicits._
    val t = TableConfig("t", "t", items = Seq(
      ColumnSpec("user.id", "uid", "int", nullable = false),
      ColumnSpec("user.email", "email", "varchar", Some("50"),
        default = Some("none"))))
    val df = Seq(("1", "a@b.co"), ("2", null: String))
      .toDF("user.id", "user.email")
    val got = rows(CsvIngest.castAndProject(df, t).orderBy("uid"))
    got shouldBe Seq(Seq(1, "a@b.co"), Seq(2, null))
    // strict + quarantine paths build predicates over the same names
    CsvIngest.castAndProjectStrict(df, t).count() shouldBe 2
    val (clean, _) = CsvIngest.castAndProjectQuarantine(df, t)
    clean.count() shouldBe 2
  }

  test("timestamp without timezone ingests as TimestampNTZ, tz-independent") {
    import spark.implicits._
    val t = TableConfig("t", "t", items = Seq(
      ColumnSpec("id", "id", "int"),
      ColumnSpec("at", "at", "timestamp without timezone")))
    val df = Seq(("1", "2021-06-01 12:30:00")).toDF("id", "at")
    val typed = CsvIngest.castAndProject(df, t)
    typed.schema("at").dataType shouldBe
      org.apache.spark.sql.types.TimestampNTZType
    val utcVal = typed.collect().head.get(1).toString
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      // NTZ: same wall-clock value whatever the session timezone
      CsvIngest.castAndProject(df, t).collect().head.get(1).toString shouldBe utcVal
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    utcVal shouldBe "2021-06-01T12:30"
  }

  test("gzip slices read transparently") {
    val dir = Files.createTempDirectory("graft-gz")
    val gz = dir.resolve("slice.csv.gz")
    val out = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(gz))
    out.write("\"a\",\"1\"\n\"b\",\"2\"\n".getBytes("UTF-8"))
    out.close()
    CsvIngest.readSlices(spark, Seq(gz.toString), twoCol).count() shouldBe 2
  }
}
