package graft
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Driver-contract invariants: no key collisions across the query maps
  * (Map ++ silently overwrites), every oracle references a real query,
  * and every query is total-ordered for the hash compare. */
class ContractSpec extends AnyFunSuite with Matchers {
  test("query names are unique across all query groups") {
    val groups = Seq(
      graft.queries.RelationalQueries.queries.keySet,
      graft.queries.AnalyticsQueries.queries.keySet,
      graft.queries.TextQueries.queries.keySet,
      graft.queries.PipelineQueries.queries.keySet)
    val all = groups.flatten
    all.size shouldBe all.toSet.size
    SparkEntry.queries.size shouldBe all.size
  }

  test("every oracle key names an implemented query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    missing shouldBe empty
  }

  test("rows-only reasons cover EXACTLY the oracle-less queries") {
    val oracleLess = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val declared = SparkEntry.rowsOnlyReasons.keySet
    withClue("undeclared rows-only queries (add a reason or an oracle): ") {
      (oracleLess -- declared) shouldBe empty
    }
    withClue("stale reasons (query gained an oracle or was removed): ") {
      (declared -- oracleLess) shouldBe empty
    }
  }

  test("oracle SQL is syntactically ordered (ends with ORDER BY)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      withClue(name) {
        sql.toUpperCase.split("ORDER BY").length should be >= 2
      }
    }
  }
}
