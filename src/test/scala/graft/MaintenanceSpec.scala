package graft

import graft.operators.Maintenance
import java.nio.file.Files

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compactParquet merges many small files into few, preserving rows") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val df = (1 to 10000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    df.repartition(50).write.parquet(dir) // 50 tiny files
    def parquetFiles = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .count(_.getName.endsWith(".parquet"))
    parquetFiles shouldBe 50

    Maintenance.compactParquet(spark, dir, targetFileBytes = 10L * 1024 * 1024)
    parquetFiles shouldBe 1
    spark.read.parquet(dir).count() shouldBe 10000
    spark.read.parquet(dir).agg(org.apache.spark.sql.functions.sum("id"))
      .collect().head.getLong(0) shouldBe (1L to 10000L).sum
  }

  test("profile computes per-column stats in one aggregation pass") {
    val df = Seq((1, Some("a")), (2, None), (2, Some("c")))
      .toDF("id", "s")
    val got = rows(Maintenance.profile(df).orderBy("column"))
    got shouldBe Seq(
      Seq("id", 3L, 0L, 2L, "1", "2"),
      Seq("s", 3L, 1L, 2L, "a", "c"))
    // one aggregate over the data — not one scan per column
    val scans = Maintenance.profile(df).queryExecution.optimizedPlan
      .collectLeaves().length
    scans shouldBe 1
  }

  test("profileDrift flags null-rate, distinct, and bounds changes per column") {
    val before = Seq((1, Some("a")), (2, Some("b")), (3, Some("c")))
      .toDF("id", "s")
    val after = Seq((1, Some("a")), (2, None: Option[String]),
      (4, Some("d")), (5, Some("d"))).toDF("id", "s")
    val got = rows(Maintenance.profileDrift(before, after).orderBy("column"))
      .map(r => r.head -> r).toMap
    val id = got("id")
    id(3) shouldBe 0.0                       // null_rate_delta
    id(4) shouldBe 1L                        // distinct 3 -> 4
    id(5) shouldBe true                      // max 3 -> 5
    val s = got("s")
    (s(3).asInstanceOf[Double] - 0.25).abs should be < 1e-9
    s(4) shouldBe -1L                        // distinct 3 -> 2
    s(5) shouldBe true                       // max c -> d
  }

  test("cleanOrphanStages removes stranded stage/compact dirs, leaves tables") {
    val base = Files.createTempDirectory("graft-orphan").toString
    def mk(name: String): Unit = {
      val d = java.nio.file.Paths.get(base, name)
      Files.createDirectories(d)
      Files.writeString(d.resolve("part-0.parquet"), "x")
    }
    mk("orders")
    mk("events")
    mk("orders__stage_ab12cd34")
    mk("events__compact_ef56ab78")
    mk("x__stage_backup") // marker substring but NOT the generated shape
    // crash-mid-swap signature: target gone, stage holds the only copy
    mk("lost__stage_deadbeef")
    // partition-scoped variant: target TABLE exists, but the stage
    // holds a partition the target lacks (deleted before its rename)
    mk("events/p_date=2024-01-01")
    mk("events__stage_0badcafe/p_date=2024-01-02")
    // age guard: a fresh (in-flight) staging dir survives the default cutoff
    Maintenance.cleanOrphanStages(spark, base) shouldBe Nil
    val deleted = Maintenance.cleanOrphanStages(spark, base, olderThanMs = 0L)
    deleted.map(p => p.substring(p.lastIndexOf('/') + 1)).sorted shouldBe
      Seq("events__compact_ef56ab78", "orders__stage_ab12cd34")
    new java.io.File(base, "orders").exists() shouldBe true
    new java.io.File(base, "x__stage_backup").exists() shouldBe true
    new java.io.File(base, "orders__stage_ab12cd34").exists() shouldBe false
    // the recoverable stages were NOT deleted (each holds the only
    // copy of its data) and are reported for rename-in recovery
    new java.io.File(base, "lost__stage_deadbeef").exists() shouldBe true
    new java.io.File(base, "events__stage_0badcafe").exists() shouldBe true
    Maintenance.recoverableStages(spark, base)
      .map(p => p.substring(p.lastIndexOf('/') + 1)).sorted shouldBe
      Seq("events__stage_0badcafe", "lost__stage_deadbeef")
    Maintenance.cleanOrphanStages(spark, base, olderThanMs = 0L) shouldBe Nil
  }

  test("approxDistinct profile: one Expand-free scan, <=5% error vs exact") {
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus")
    val approx = Maintenance.profile(orders, approxDistinct = true)
    // still exactly one scan…
    approx.queryExecution.optimizedPlan.collectLeaves().length shouldBe 1
    // …and no Expand: exact multi-column count_distinct multiplies the
    // scan per column; the sketch keeps the plan flat
    approx.queryExecution.executedPlan.toString should not include "Expand"
    Maintenance.profile(orders).queryExecution.executedPlan.toString should
      include("Expand")

    val exactByCol = rows(Maintenance.profile(orders).orderBy("column"))
      .map(r => r.head -> r(3).asInstanceOf[Long]).toMap
    rows(approx.orderBy("column")).foreach { r =>
      val (c, est) = (r.head, r(3).asInstanceOf[Long])
      val exact = exactByCol(c)
      math.abs(est - exact).toDouble should be <= math.max(1.0, 0.05 * exact)
    }
  }
}
