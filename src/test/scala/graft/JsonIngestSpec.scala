package graft

import graft.model.{ColumnSpec, TableConfig, UserException}
import graft.sources.{CsvIngest, JsonIngest}
import java.nio.file.Files

/** JSONL source: declared-schema parse, corrupt-line quarantine, and
  * composition with the CSV path's strict/quarantine cast machinery. */
class JsonIngestSpec extends SparkSpec {

  private val table = TableConfig("docs", "docs", items = Seq(
    ColumnSpec("id", "id", "int"),
    ColumnSpec("name", "name", "varchar", Some("5")),
    ColumnSpec("score", "score", "float")))

  private def tmpJsonl(content: String): String = {
    val f = Files.createTempFile("graft-jsonl", ".jsonl")
    Files.writeString(f, content)
    f.toString
  }

  test("declared schema: scalars arrive as literal text, no inference pass") {
    val path = tmpJsonl(
      """{"id": 1, "name": "alpha", "score": 9.5}
        |{"id": "2", "name": "b", "score": null}
        |""".stripMargin)
    val df = JsonIngest.read(spark, path, table)
    // all-string source shape (+ the corrupt column), like CsvIngest
    df.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq shouldBe
      Seq("id" -> "string", "name" -> "string", "score" -> "string",
        "__corrupt" -> "string")
    val (parsed, corrupt) = JsonIngest.split(df)
    corrupt.count() shouldBe 0
    rows(parsed.orderBy("id")) shouldBe
      Seq(Seq("1", "alpha", "9.5"), Seq("2", "b", null))
  }

  test("corrupt lines quarantine whole; parsed rows flow to the typed cast") {
    val path = tmpJsonl(
      """{"id": 1, "name": "alphabet", "score": 1.25}
        |this is not json at all
        |{"id": 3, "name": "c", "score": 3.5}
        |""".stripMargin)
    val (typed, corrupt) = JsonIngest.readStrict(spark, path, table)
    rows(corrupt) shouldBe Seq(Seq("this is not json at all"))
    // varchar(5) truncation + float cast applied by the shared path
    rows(typed.orderBy("id")) shouldBe
      Seq(Seq(1, "alpha", 1.25f), Seq(3, "c", 3.5f))
  }

  test("top-level array lines quarantine whole (no silent first-object collapse)") {
    val path = tmpJsonl(
      """{"id": 1, "name": "a", "score": 1.0}
        |[{"id": 2, "name": "b", "score": 2.0}, {"id": 3, "name": "c", "score": 3.0}]
        |""".stripMargin)
    val (parsed, corrupt) = JsonIngest.split(JsonIngest.read(spark, path, table))
    rows(parsed).map(_.head) shouldBe Seq("1")
    corrupt.collect().map(_.getString(0)).toSeq shouldBe
      Seq("""[{"id": 2, "name": "b", "score": 2.0}, {"id": 3, "name": "c", "score": 3.0}]""")

    // leading tab is legal JSON whitespace — the array guard must be
    // whitespace-class, not space-only ltrim
    val path2 = tmpJsonl("\t[{\"id\": 9, \"name\": \"t\", \"score\": 1.0}]\n")
    val (p2, c2) = JsonIngest.split(JsonIngest.read(spark, path2, table))
    p2.count() shouldBe 0
    c2.count() shouldBe 1
  }

  test("strict validation aborts on a type offender with the COPY message") {
    val path = tmpJsonl(
      """{"id": 1, "name": "ok", "score": 1.0}
        |{"id": "nope", "name": "bad", "score": 2.0}
        |""".stripMargin)
    val e = intercept[UserException] {
      JsonIngest.readStrict(spark, path, table)._1.collect()
    }
    // parsed-row numbering, 1-based (no header in JSONL)
    e.getMessage should startWith("Column 'id', line 2")
  }

  test("quarantine twin composes: offenders split instead of aborting") {
    val path = tmpJsonl(
      """{"id": 1, "name": "ok", "score": 1.0}
        |{"id": "nope", "name": "bad", "score": 2.0}
        |""".stripMargin)
    val (parsed, corrupt) = JsonIngest.split(JsonIngest.read(spark, path, table))
    corrupt.count() shouldBe 0
    val (clean, quarantined) = CsvIngest.castAndProjectQuarantine(parsed, table)
    rows(clean).map(_.head) shouldBe Seq(1)
    quarantined.collect().map(_.getString(0)).toSeq shouldBe Seq("nope")
  }
}
