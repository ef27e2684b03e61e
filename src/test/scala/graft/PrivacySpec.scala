package graft

import graft.operators.Privacy
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def people = Seq(
    ("US", "A", "x"), ("US", "A", "y"), ("US", "A", "z"),
    ("US", "B", "x"), ("US", "B", "x"),
    ("DE", "A", "x"))
    .toDF("country", "segment", "diag")

  test("kAnonymityViolations flags exactly the small groups") {
    val got = Privacy.kAnonymityViolations(people,
        Seq("country", "segment"), k = 3)
      .orderBy("country", "segment")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    got.toSeq shouldBe Seq(("DE", "A", 1L), ("US", "B", 2L))
    // k = 2 clears the US/B group
    Privacy.kAnonymityViolations(people, Seq("country", "segment"), 2)
      .count() shouldBe 1L
  }

  test("NULL quasi-identifiers form their own group") {
    val df = Seq((Some("US"), "a"), (None, "b"), (None, "c"))
      .toDF("country", "v")
    val got = Privacy.kAnonymityViolations(df, Seq("country"), 3)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    got shouldBe Set((Some("US"), 1L), (None, 2L))
  }

  test("lDiversityViolations flags homogeneous groups, counts NULL as a value") {
    // US/B: two records, one distinct diag → violates l=2
    // US/A: three distinct → passes
    val got = Privacy.lDiversityViolations(people,
        Seq("country", "segment"), "diag", l = 2)
      .orderBy("country", "segment")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    got.toSeq shouldBe Seq(("DE", "A", 1L, 1L), ("US", "B", 2L, 1L))
    // a group whose sensitive values are NULL plus one real value
    // carries TWO distinct values; an all-NULL group carries one
    val nulls = Seq(("US", Some("x")), ("US", None),
      ("DE", None), ("DE", None)).toDF("country", "diag")
    val v = Privacy.lDiversityViolations(nulls, Seq("country"), "diag", 2)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    v shouldBe Set(("DE", 1L))
  }

  test("wiring errors are refused") {
    an[IllegalArgumentException] should be thrownBy
      Privacy.kAnonymityViolations(people, Nil, 5)
    an[IllegalArgumentException] should be thrownBy
      Privacy.kAnonymityViolations(people, Seq("country"), 1)
    an[IllegalArgumentException] should be thrownBy
      Privacy.lDiversityViolations(people, Seq("country", "diag"), "diag", 2)
    an[IllegalArgumentException] should be thrownBy
      Privacy.lDiversityViolations(people, Seq("country"), "diag", 1)
  }

  test("forgetCascadeAudit walks the FK chain; purge is its complement") {
    val users = Seq((1L, "u1"), (2L, "u2"), (3L, "u3")).toDF("uid", "name")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 3L))
      .toDF("oid", "o_uid")
    val items = Seq((10L, "a"), (10L, "b"), (12L, "c"), (13L, "d"))
      .toDF("i_oid", "sku")
    val req = Seq(1L, 2L).toDF("uid")
    val audit = Privacy.forgetCascadeAudit(req, "uid", Seq(
        Privacy.CascadeStep("users", users, "uid", Some("uid")),
        Privacy.CascadeStep("orders", orders, "o_uid", Some("oid")),
        Privacy.CascadeStep("items", items, "i_oid")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    audit.toSeq shouldBe Seq(("users", 3L, 2L), ("orders", 4L, 3L),
      ("items", 4L, 3L))
    // purge retains exactly the survivors of the same walk
    val keptOrders = Privacy.purge(orders, "o_uid", req, "uid")
    keptOrders.select("oid").as[Long].collect().toSeq shouldBe Seq(13L)
    // anti vs semi are exact complements on every step
    val delOrders = orders.join(req.select(col("uid").as("__k")),
      col("o_uid") === col("__k"), "left_semi")
    delOrders.count() + keptOrders.count() shouldBe orders.count()
    an[IllegalArgumentException] should be thrownBy
      Privacy.forgetCascadeAudit(req, "uid", Nil)
  }
}
