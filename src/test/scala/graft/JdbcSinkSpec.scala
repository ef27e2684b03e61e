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
