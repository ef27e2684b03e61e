package graft

import graft.operators.Percentiles
import org.apache.spark.sql.functions._

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  private val targets = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)

  /** Reference: Spark's own exact percentile() (buffers the group). */
  private def exact(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(
      expr("percentile(v, 0.25)").as("p25"),
      expr("percentile(v, 0.5)").as("p50"),
      expr("percentile(v, 0.75)").as("p75"))

  private def check(df: org.apache.spark.sql.DataFrame,
                    accuracy: Int = 10000,
                    bandDelta: Option[Double] = None): Unit = {
    val got = rows(Percentiles.exactGroupedPercentiles(
      df, Seq("g"), "v", targets, accuracy, bandDelta).orderBy("g"))
    val want = rows(exact(df).orderBy("g"))
    got shouldBe want
  }

  test("matches percentile() bit-for-bit across group shapes") {
    // deterministic pseudo-random values; groups of very different
    // sizes, heavy duplicates in one, singleton in another
    val big = (0 until 9001).map(i =>
      ("a", ((i * 2654435761L) % 100000).toDouble / 7.0))
    val dup = (0 until 500).map(i => ("b", (i % 7).toDouble))
    val one = Seq(("c", 42.0))
    // the coverage-bound boundary zone: (δ−ε)·n ≈ 1 at n ≈ 2500 with
    // default accuracy — the regime where the GK sketch stops being
    // rank-exact but the widened band must still cover
    val boundary = (0 until 2600).map(i =>
      ("d", ((i * 48271L) % 31337).toDouble / 3.0))
    check((big ++ dup ++ one ++ boundary).toDF("g", "v"))
  }

  test("integral rank positions interpolate to the exact data value") {
    // 5 values → p50 rank = 2.0 exactly: result must be v[2] itself
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0))
      .toDF("g", "v")
    val got = rows(Percentiles.exactGroupedPercentiles(
      df, Seq("g"), "v", Seq("p50" -> 0.5)))
    got shouldBe Seq(Seq("a", 3.0))
  }

  test("all-NULL group yields NULL percentiles, like percentile()") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("n", None))
      .toDF("g", "v")
    check(df)
  }

  test("NULL group keys form their own group, like percentile()") {
    // percentile() under groupBy returns a row for the NULL-key group;
    // a bare equi-join on the key would silently drop it (regression
    // for the struct-packed join key)
    val df = Seq((Some("a"), 1.0), (Some("a"), 2.0),
      (None, 10.0), (None, 20.0), (None, 30.0)).toDF("g", "v")
    check(df)
    // and with a composite key where only one component is null
    val df2 = Seq((Some("a"), 1, 1.0), (None, 1, 5.0), (None, 1, 7.0))
      .toDF("g", "g2", "v")
    val got = rows(Percentiles.exactGroupedPercentiles(
      df2, Seq("g", "g2"), "v", Seq("p50" -> 0.5)).orderBy("g", "g2"))
    val want = rows(df2.groupBy("g", "g2")
      .agg(expr("percentile(v, 0.5)").as("p50")).orderBy("g", "g2"))
    got shouldBe want
  }

  test("collapsed bands force the exact-verify fallback; result still exact") {
    // bandDelta = 0 shrinks every band to the sketch's point estimate;
    // with coarse accuracy the band misses true order statistics and
    // the AQE-gated percentile() fallback must produce them.
    val vals = (0 until 4096).map(i =>
      ("a", ((i * 40503L) % 4096).toDouble)) ++
      (0 until 1000).map(i => ("b", math.sin(i).abs * 100))
    check(vals.toDF("g", "v"), accuracy = 50, bandDelta = Some(0.0))
  }

  test("main-path plan has no full-table exact percentile aggregate") {
    // The unguarded buffer-everything aggregate must appear ONLY behind
    // the fallback join (AQE-eliminated when unneeded); the nominate
    // pass uses the bounded GK sketch.
    val df = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val plan = Percentiles.exactGroupedPercentiles(
      df, Seq("g"), "v", Seq("p50" -> 0.5))
      .queryExecution.optimizedPlan.toString
    plan should include("percentile_approx")
    // every exact percentile() node sits under a join with the
    // missed-groups side — crude but effective pin: the fallback's
    // aliases are the only exact-percentile outputs
    plan.linesIterator.filter(_.contains("percentile(__v"))
      .foreach(l => l should include("__exact_"))
  }
}
