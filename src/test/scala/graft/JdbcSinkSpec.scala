package graft

import graft.app.{Engine, JdbcSink, Main}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** S4 integration: the JDBC sink against embedded Derby (ships with
  * Spark) — create/overwrite/read/list round-trips, the staging+swap
  * overwrite (reference `<name>_temp_<uniqid>` pattern,
  * Writer/Redshift.php:345-348), and a full engine run writing through
  * JDBC. Derby's catalog/rename dialect is passed in; production
  * defaults speak Redshift/Postgres. */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def sink = new JdbcSink(spark, url, Map.empty,
    catalogSql =
      "SELECT TABLENAME FROM SYS.SYSTABLES WHERE TABLETYPE = 'T'",
    renameSql = (from, to) => s"RENAME TABLE $from TO $to")

  test("overwrite creates, read round-trips, overwrite replaces, no temp residue") {
    val s = sink
    s.tableExists("jt1") shouldBe false
    s.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "jt1")
    s.tableExists("jt1") shouldBe true
    rows(s.read("jt1").orderBy("id")) shouldBe
      Seq(Seq(1L, "a"), Seq(2L, "b"))

    s.overwrite(Seq((3L, "c")).toDF("id", "v"), "jt1")
    rows(s.read("jt1")) shouldBe Seq(Seq(3L, "c"))

    // the staging+swap left no *_temp_* tables behind
    s.listTables().filter(_.toLowerCase.contains("_temp_")) shouldBe empty
  }

  test("partitionColumn config turns reads into parallel range scans") {
    val ps = new JdbcSink(spark, url,
      Map("partitionColumn" -> "id", "numPartitions" -> "4"),
      catalogSql =
        "SELECT TABLENAME FROM SYS.SYSTABLES WHERE TABLETYPE = 'T'",
      renameSql = (from, to) => s"RENAME TABLE $from TO $to")
    ps.overwrite((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"), "jpart")
    val df = ps.read("jpart")
    // bounds probed MIN/MAX → 4 range partitions, not one stream
    df.rdd.getNumPartitions shouldBe 4
    df.count() shouldBe 100
    rows(df.orderBy("id").limit(2)) shouldBe Seq(Seq(1L, "v1"), Seq(2L, "v2"))
    // the merge path composes: target read is partitioned, result right
    val merged = graft.operators.Load.upsert(ps.read("jpart"),
      Seq((100L, "NEW"), (101L, "v101")).toDF("id", "v"), Seq("id"))
    ps.overwrite(merged, "jpart")
    ps.read("jpart").count() shouldBe 101
    // empty table → bounds are NULL → plain single-stream read, no error
    ps.overwrite(Seq.empty[(Long, String)].toDF("id", "v"), "jempty")
    ps.read("jempty").count() shouldBe 0
    // a table WITHOUT the configured column (different PK, or any
    // catalog table via tablesInfo) falls back to the plain read
    ps.overwrite(Seq((1L, "x")).toDF("k", "v"), "jnopc")
    ps.read("jnopc").count() shouldBe 1
    // catalog listing (query option) unaffected by the partition config
    ps.listTables() should contain("jpart".toUpperCase)
  }

  test("schema-qualified names keep parallel reads (probe scopes to the qualifier)") {
    val ps = new JdbcSink(spark, url,
      Map("partitionColumn" -> "id", "numPartitions" -> "4"),
      catalogSql =
        "SELECT TABLENAME FROM SYS.SYSTABLES WHERE TABLETYPE = 'T'",
      renameSql = (from, to) => s"RENAME TABLE $from TO $to")
    ps.overwrite((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), "jqual")
    // Derby's default schema is APP: the qualified name must route the
    // getColumns probe to (APP, jqual) — matching nothing and silently
    // falling back to a single-stream read is the regression this pins
    val df = ps.read("APP.jqual")
    df.rdd.getNumPartitions shouldBe 4
    df.count() shouldBe 50
  }

  test("varchar partition column reads via predicate ranges, n > 1 partitions") {
    // Derby speaks the SQL-standard OFFSET…FETCH, not the default
    // (Redshift/Postgres) LIMIT/OFFSET — exercised via the pluggable
    // probe, like catalogSql/renameSql
    val ps = new JdbcSink(spark, url,
      Map("partitionColumn" -> "pk", "numPartitions" -> "4"),
      catalogSql =
        "SELECT TABLENAME FROM SYS.SYSTABLES WHERE TABLETYPE = 'T'",
      renameSql = (from, to) => s"RENAME TABLE $from TO $to",
      splitProbeSql = (table, q, off) =>
        s"SELECT $q FROM $table WHERE $q IS NOT NULL " +
          s"ORDER BY $q OFFSET $off ROWS FETCH NEXT 1 ROWS ONLY")
    def exec(sql: String): Unit = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val st = c.createStatement(); try st.execute(sql) finally st.close()
      } finally c.close()
    }
    // externally created, string-keyed table (the UUID-PK warehouse
    // shape); quoted lowercase columns match the engine's convention
    exec("CREATE TABLE jvar (\"pk\" VARCHAR(8), \"v\" INTEGER)")
    (0 until 40).foreach(i => exec(f"INSERT INTO jvar VALUES ('k$i%02d', $i)"))
    exec("INSERT INTO jvar VALUES (NULL, -1)") // NULLs ride partition 1

    val df = ps.read("jvar")
    // quantile split points → 4 disjoint covering predicates, not one
    // stream — and nothing lost or duplicated across the ranges
    df.rdd.getNumPartitions shouldBe 4
    df.count() shouldBe 41
    df.select(sum("v")).head().getLong(0) shouldBe (0 until 40).sum - 1
    // every partition got real work (ordered keys split evenly)
    val sizes = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    sizes.foreach(_ should be > 0)
    // content identical to the plain single-stream read
    val plainSink = new JdbcSink(spark, url, Map.empty,
      catalogSql =
        "SELECT TABLENAME FROM SYS.SYSTABLES WHERE TABLETYPE = 'T'",
      renameSql = (from, to) => s"RENAME TABLE $from TO $to")
    rows(df.orderBy("pk")) shouldBe rows(plainSink.read("jvar").orderBy("pk"))

    // a CLOB-typed key (how Derby stores Spark's unbounded strings)
    // cannot range-compare: falls back to the plain read, no error
    ps.overwrite(Seq(("a", 1), ("b", 2)).toDF("pk", "v"), "jclob")
    ps.read("jclob").rdd.getNumPartitions shouldBe 1
    ps.read("jclob").count() shouldBe 2
  }

  test("ping hits the JDBC endpoint: up succeeds, down fails (O9)") {
    val up = new JdbcSink(spark, url, Map.empty, pingSql = "VALUES 1")
    noException should be thrownBy up.ping()
    noException should be thrownBy new Engine(spark, up).testConnection()
    // a database that doesn't exist (no ;create=true) → connect fails;
    // testConnection must surface that, not succeed via local Spark
    val down = new JdbcSink(spark, "jdbc:derby:memory:graft_no_such_db",
      Map.empty, pingSql = "VALUES 1")
    an[Exception] should be thrownBy down.ping()
    an[Exception] should be thrownBy new Engine(spark, down).testConnection()
  }

  test("cleanOrphanTemps drops stranded temp tables, leaves real ones") {
    val s = sink
    s.overwrite(Seq((1L, "x")).toDF("id", "v"), "keepme")
    // simulate a stranded stage from a failed write
    Seq((9L, "z")).toDF("id", "v").write.format("jdbc")
      .option("url", url).option("dbtable", "dead_temp_0badf00d")
      .mode("errorifexists").save()
    val dropped = s.cleanOrphanTemps()
    dropped.map(_.toLowerCase) should contain("dead_temp_0badf00d")
    s.tableExists("keepme") shouldBe true
    s.tableExists("dead_temp_0badf00d") shouldBe false
  }

  test("type change takes drop+rename (new DDL lands); same shape preserves DDL") {
    def withConn[T](f: java.sql.Connection => T): T = {
      val c = java.sql.DriverManager.getConnection(url)
      try f(c) finally c.close()
    }
    def exec(sql: String): Unit = withConn { c =>
      val st = c.createStatement(); try st.execute(sql) finally st.close()
    }
    def colType(table: String, col: String): String = withConn { c =>
      val rs = c.getMetaData.getColumns(null, null, table.toUpperCase, null)
      try {
        var t: String = null
        while (rs.next())
          if (rs.getString("COLUMN_NAME").equalsIgnoreCase(col))
            t = rs.getString("TYPE_NAME")
        t
      } finally rs.close()
    }
    // externally created target whose WIDTH-only difference is
    // invisible at the Spark-schema level (VARCHAR(50) and CLOB both
    // read back as StringType) — the DDL-level compare must still
    // route this through drop+rename so the new DDL lands
    exec("CREATE TABLE shp (id BIGINT, v VARCHAR(50))")
    exec("INSERT INTO shp VALUES (0, 'old')")
    colType("shp", "v") shouldBe "VARCHAR"
    val s = sink
    s.overwrite(Seq((1L, "after type change")).toDF("id", "v"), "shp")
    colType("shp", "v") shouldBe "CLOB" // Spark's Derby mapping landed
    rows(s.read("shp")) shouldBe Seq(Seq(1L, "after type change"))

    // same-shape reload must take DELETE+INSERT: pin it with a
    // dependent view — Derby REFUSES to drop a table a view reads
    // (X0Y23), so the drop+rename branch would fail loudly here
    // Spark's JDBC writer QUOTES column names, so the rebuilt table's
    // columns are lowercase case-sensitive — quote them here too
    exec("CREATE VIEW shp_view AS SELECT \"id\" FROM shp")
    s.overwrite(Seq((2L, "delete+insert")).toDF("id", "v"), "shp")
    rows(s.read("shp")) shouldBe Seq(Seq(2L, "delete+insert"))
    // the view survived ⇒ the table was never dropped
    rows(s.read("shp_view")) shouldBe Seq(Seq(2L))
    exec("DROP VIEW shp_view")
    s.listTables().filter(_.toLowerCase.contains("_temp_")) shouldBe empty
  }

  test("width-ONLY varchar change takes drop+rename; matching width keeps DDL") {
    def withConn[T](f: java.sql.Connection => T): T = {
      val c = java.sql.DriverManager.getConnection(url)
      try f(c) finally c.close()
    }
    def exec(sql: String): Unit = withConn { c =>
      val st = c.createStatement(); try st.execute(sql) finally st.close()
    }
    def colWidth(table: String, col: String): Int = withConn { c =>
      val rs = c.getMetaData.getColumns(null, null, table.toUpperCase, null)
      try {
        var w = -1
        while (rs.next())
          if (rs.getString("COLUMN_NAME").equalsIgnoreCase(col))
            w = rs.getInt("COLUMN_SIZE")
        w
      } finally rs.close()
    }
    // same TYPE_NAME (VARCHAR), different COLUMN_SIZE — invisible at
    // the Spark-schema level (both are StringType), so only the
    // DDL-level size compare can route it correctly. The stage's DDL
    // is forced to VARCHAR via createTableColumnTypes.
    val wide = new JdbcSink(spark, url,
      Map("createTableColumnTypes" -> "v VARCHAR(40)"),
      catalogSql =
        "SELECT TABLENAME FROM SYS.SYSTABLES WHERE TABLETYPE = 'T'",
      renameSql = (from, to) => s"RENAME TABLE $from TO $to")
    exec("CREATE TABLE wshp (\"id\" BIGINT, \"v\" VARCHAR(20))")
    exec("INSERT INTO wshp VALUES (0, 'old')")
    colWidth("wshp", "v") shouldBe 20
    wide.overwrite(Seq((1L, "widened")).toDF("id", "v"), "wshp")
    // width-only drift took the drop+rename path: the NEW width landed
    colWidth("wshp", "v") shouldBe 40
    rows(wide.read("wshp")) shouldBe Seq(Seq(1L, "widened"))

    // matching width reload is same-shape → DELETE+INSERT preserves the
    // DDL; pin with a dependent view (Derby refuses to drop a viewed
    // table, so the drop+rename branch would fail loudly here)
    exec("CREATE VIEW wshp_view AS SELECT \"id\" FROM wshp")
    wide.overwrite(Seq((2L, "same width")).toDF("id", "v"), "wshp")
    rows(wide.read("wshp")) shouldBe Seq(Seq(2L, "same width"))
    rows(wide.read("wshp_view")) shouldBe Seq(Seq(2L))
    exec("DROP VIEW wshp_view")
    wide.listTables().filter(_.toLowerCase.contains("_temp_")) shouldBe empty
  }

  test("incremental merge via JDBC: the plan reads the target it replaces") {
    val s = sink
    s.overwrite((1L to 5L).map(i => (i, s"v$i")).toDF("id", "v"), "jt2")
    // stage-wins upsert whose plan READS jt2 while its replacement
    // materializes — the staging-table swap makes this safe (a
    // truncate-in-place write would feed the merge an empty target)
    val stage = Seq((5L, "NEW"), (6L, "v6")).toDF("id", "v")
    val merged = graft.operators.Load.upsert(s.read("jt2"), stage, Seq("id"))
    s.overwrite(merged, "jt2")
    rows(s.read("jt2").orderBy("id")) shouldBe
      (1L to 4L).map(i => Seq(i, s"v$i")) ++ Seq(Seq(5L, "NEW"), Seq(6L, "v6"))
  }

  test("full engine run writes through the JDBC sink (exit 0, golden rows)") {
    val dir = Files.createTempDirectory("graft-jdbc-e2e").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in/tables"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/config.json"),
      """{"parameters": {"tables": [
        |  {"tableId": "simple", "dbName": "jsimple", "items": [
        |    {"name": "id", "dbName": "id", "type": "int"},
        |    {"name": "name", "dbName": "name", "type": "nvarchar", "size": "255"}
        |  ]}]}}""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$dir/in/tables/simple.csv"),
      "\"id\",\"name\"\n\"1\",\"a\"\n\"2\",\"b\"\n")
    val (code, out) = Main.execute(spark, sink, dir)
    code shouldBe 0
    out.get should include(""""uploaded":["simple"]""")
    rows(sink.read("jsimple").orderBy("id")) shouldBe
      Seq(Seq(1, "a"), Seq(2, "b"))
  }

  test("tablesInfo reports JDBC tables with column types (O10)") {
    val s = sink
    s.overwrite(Seq((1L, 2.5)).toDF("pk", "x"), "jt3")
    val engine = new Engine(spark, s)
    val info = engine.tablesInfo().toMap
    info.keySet.map(_.toLowerCase) should contain("jt3")
  }
}
