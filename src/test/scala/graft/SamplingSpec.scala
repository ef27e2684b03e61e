package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic hash-based splitting/sampling: stable membership,
  * approximately-right fractions, leakage-free disjointness. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (0L until 10000L).toDF("id")

  test("splitLabel fractions approximate 80/10/10 and are disjoint + exhaustive") {
    val got = ids.select(col("id"), Sampling.splitLabel(col("id"), 80, 10).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.values.sum shouldBe 10000L
    got("train").toDouble shouldBe 8000.0 +- 300.0
    got("val").toDouble shouldBe 1000.0 +- 150.0
    got("test").toDouble shouldBe 1000.0 +- 150.0
  }

  test("assignment is a pure function of the id: stable across runs and partitionings") {
    val a = ids.select(col("id"), Sampling.splitLabel(col("id"), 80, 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = ids.repartition(13).select(col("id"),
        Sampling.splitLabel(col("id"), 80, 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    a shouldBe b
    // appending new rows never moves existing ones (no train/test leakage)
    val extended = (0L until 20000L).toDF("id")
      .select(col("id"), Sampling.splitLabel(col("id"), 80, 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ids.collect().map(_.getLong(0)).foreach { i =>
      extended(i) shouldBe a(i)
    }
  }

  test("deterministicSample keeps ~fraction of rows, and a sub-fraction nests") {
    val s10 = Sampling.deterministicSample(ids, "id", 0.1)
      .collect().map(_.getLong(0)).toSet
    s10.size.toDouble shouldBe 1000.0 +- 150.0
    // a smaller cut of the same bucket space is a subset: shrinking the
    // sample never introduces rows the larger sample didn't have
    val s5 = Sampling.deterministicSample(ids, "id", 0.05)
      .collect().map(_.getLong(0)).toSet
    s5.subsetOf(s10) shouldBe true
  }
}
