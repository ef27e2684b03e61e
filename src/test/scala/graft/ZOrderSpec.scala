package graft

import graft.functions.ZOrderFunctions
import graft.operators.Maintenance
import java.nio.file.Files
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zkey interleaves bucket bits: hand-checked 2-col case") {
    // bits=2, boundaries {10,20,30}: v<=10 -> 0, <=20 -> 1, <=30 -> 2, else 3
    val b = Seq(Array(10.0, 20.0, 30.0), Array(10.0, 20.0, 30.0))
    val df = Seq(
      (35.0, 15.0),   // buckets (3, 1): x bits -> pos 0,2; y bits -> pos 1,3
      (5.0, 5.0),     // buckets (0, 0)
      (35.0, 35.0)    // buckets (3, 3)
    ).toDF("x", "y")
    val got = df.select(
      ZOrderFunctions.zkey(Seq(col("x"), col("y")), b, bits = 2).as("z"))
      .as[Long].collect().toSeq
    // (3,1): x=11b -> bits 0 and 2; y=01b -> bit 1 only = 0b0111 = 7
    got shouldBe Seq(7L, 0L, 15L)
  }

  test("zkey: equal values land in ONE bucket even with duplicate boundaries") {
    // a column with fewer distinct values than buckets yields repeated
    // boundary entries; every v==20 row must get the same key
    val b = Seq(Array(20.0, 20.0, 20.0))
    val keys = Seq(20.0, 20.0, 20.0).toDF("x")
      .select(ZOrderFunctions.zkey(Seq(col("x")), b, bits = 2).as("z"))
      .as[Long].collect().toSeq
    keys.distinct.size shouldBe 1
    // and bucket = count of boundaries <= v = 3 here
    keys.head shouldBe 3L
  }

  test("zkey: NULL clusters at the low edge (bucket 0)") {
    val b = Seq(Array(10.0, 20.0, 30.0))
    val keys = Seq(Some(5.0), None, Some(35.0)).toDF("x")
      .select(ZOrderFunctions.zkey(Seq(col("x")), b, bits = 2).as("z"))
      .as[Long].collect().toSeq
    keys(1) shouldBe 0L
    keys(1) should be <= keys.min
  }

  test("boundaries: one aggregation pass, ordered, all-NULL degenerates") {
    val df = (1 to 1000).map(i => (i.toDouble, None: Option[Double]))
      .toDF("x", "n")
    val plan = df.agg(percentile_approx(col("x"), lit(Array(0.5)), lit(100)))
    plan.queryExecution.optimizedPlan.collectLeaves().length shouldBe 1
    val bs = ZOrderFunctions.boundaries(df, Seq("x", "n"), bits = 4)
    bs.length shouldBe 2
    bs.head.length shouldBe 15
    bs.head.toSeq shouldBe bs.head.toSeq.sorted // monotone boundaries
    bs.head.head should be > 1.0                // ~1/16 quantile of 1..1000
    bs(1).toSeq shouldBe Seq.fill(15)(0.0)      // all-NULL column degenerate
  }

  test("zorderCompact: rows/schema preserved, scans prune on BOTH columns") {
    val dir = Files.createTempDirectory("graft-zorder").toString + "/t"
    // two independent pseudo-random uniform columns: an unsorted layout
    // gives every file the FULL min/max span in both
    val n = 40000
    val df = (0 until n).map { i =>
      (i.toLong, (i * 7919 % n).toLong % 1000L, (i * 104729 % n).toLong % 1000L)
    }.toDF("id", "x", "y")
    df.repartition(8).write.parquet(dir)

    def files: Seq[java.io.File] = Option(new java.io.File(dir).listFiles())
      .toSeq.flatten.filter(_.getName.endsWith(".parquet")).toSeq
    // spans: per-file [min,max] of a column; overlap = files a range
    // predicate cannot skip via footer stats
    def overlapping(c: String, lo: Long, hi: Long): Int = files.count { f =>
      val r = spark.read.parquet(f.toString)
        .agg(min(col(c)), max(col(c))).head()
      r.getLong(0) <= hi && r.getLong(1) >= lo
    }
    overlapping("x", 0, 99) shouldBe files.size  // unsorted: no skipping
    overlapping("y", 0, 99) shouldBe files.size

    // enough output files that each covers a narrow z-range: the
    // overlap fraction of a 10% slab then sits well under 1/2, so the
    // assertion is not hostage to one file of range-sampling jitter
    val nFiles = Maintenance.zorderCompact(spark, dir, Seq("x", "y"),
      targetFileBytes = 12L * 1024)
    nFiles should be >= 16
    val out = spark.read.parquet(dir)
    out.columns.toSeq shouldBe Seq("id", "x", "y") // no __zkey leaks
    out.count() shouldBe n
    out.agg(sum("id")).head().getLong(0) shouldBe (0 until n).map(_.toLong).sum
    // a 10%-selectivity range on EITHER column now skips most files —
    // the whole point of the interleaved layout vs a lexicographic sort
    // (which would only ever serve x)
    val total = files.size
    overlapping("x", 0, 99) should be <= (total / 2)
    overlapping("y", 0, 99) should be <= (total / 2)
  }

  test("zorderCompact: 8 columns at default bits clamps (8x8=64 would overflow a long)") {
    val dir = Files.createTempDirectory("graft-zorder-8col").toString + "/t"
    val df = (0 until 200).map { i =>
      (i.toLong, i % 3, i % 5, i % 7, i % 11, i % 13, i % 17, i % 19, i % 23)
    }.toDF("id", "a", "b", "c", "d", "e", "f", "g", "h")
    df.repartition(4).write.parquet(dir)
    // pre-fix this passed the 1..8-column check, paid the boundary
    // scan, THEN threw from the bits*cols require — now it clamps to
    // 63/8 = 7 bits per column and completes
    Maintenance.zorderCompact(spark, dir,
      Seq("a", "b", "c", "d", "e", "f", "g", "h"))
    val out = spark.read.parquet(dir)
    out.count() shouldBe 200
    out.agg(sum("id")).head().getLong(0) shouldBe (0 until 200).map(_.toLong).sum
  }

  test("zorderCompact: absurd bits clamp instead of wrapping Int shifts / OOMing the driver") {
    val dir = Files.createTempDirectory("graft-zorder-bits").toString + "/t"
    (0 until 100).map(i => (i.toLong, (i * 37 % 100).toLong))
      .toDF("id", "x").repartition(2).write.parquet(dir)
    // pre-fix: effBits = min(64, 63/1) = 63 -> (1 << 63) wraps via Int
    // shift and the boundary pass tries a ~2^31-element driver array;
    // now clamps to 12 and completes
    Maintenance.zorderCompact(spark, dir, Seq("x"), bits = 64)
    spark.read.parquet(dir).count() shouldBe 100
    // the low-level boundary helper itself fails loud past its range
    an[IllegalArgumentException] should be thrownBy
      ZOrderFunctions.boundaries(
        Seq((1.0, 2.0)).toDF("a", "b"), Seq("a"), bits = 31)
    // and so does the key expression: bits=32 on one column passes the
    // fit-a-long check but (1 << 32) - 1 wraps to 0, which would
    // accept an EMPTY boundary array and emit a constant key (silent
    // no-op clustering)
    an[IllegalArgumentException] should be thrownBy
      ZOrderFunctions.zkey(Seq(col("a")), Seq(Array.empty[Double]),
        bits = 32)
  }

  test("zorderCompact refuses a reserved __zkey column") {
    val dir = Files.createTempDirectory("graft-zorder-bad").toString + "/t"
    Seq((1L, 2L)).toDF("__zkey", "x").write.parquet(dir)
    an[IllegalArgumentException] should be thrownBy
      Maintenance.zorderCompact(spark, dir, Seq("x"))
  }
}
