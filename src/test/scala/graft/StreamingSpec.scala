package graft

import graft.streaming.{Event, EventStreams}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming operators driven deterministically through
  * MemoryStream micro-batches. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // hour-aligned base so tumbling-window starts land on ts(0)/ts(60)
  private def ts(minutes: Long): Timestamp =
    new Timestamp(1699999200000L + minutes * 60000L)

  test("windowedStats aggregates per tumbling window with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.windowedStats(input.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_stats")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(65), 2, "view", 5.0),
        // watermark pusher: far future event closes earlier windows
        Event(4, ts(60 * 10), 2, "view", 1.0))
      q.processAllAvailable()
      val got = spark.table("win_stats")
        .select("window_start", "event_type", "n_events", "total_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).sortBy(_._1.getTime)
      got should contain((ts(0), "click", 2L, 3.0))
      got should contain((ts(60), "view", 1L, 5.0))
    } finally q.stop()
  }

  test("streamingCategoricalDrift: per-window PSI equals the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val reference = Seq(
      Event(101, ts(0), 1, "click", 1.0), Event(102, ts(0), 1, "click", 1.0),
      Event(103, ts(0), 1, "view", 1.0), Event(104, ts(0), 1, "view", 1.0))
      .toDF()
    val input = MemoryStream[Event]
    val q = EventStreams.streamingCategoricalDrift(input.toDF(),
        "event_type", reference, "event_type",
        windowLength = "1 hour", watermark = "1 hour")
      .writeStream.format("memory").queryName("drift_mon")
      .outputMode(OutputMode.Append()).start()
    try {
      val w0 = Seq(
        Event(1, ts(5), 1, "click", 1.0), Event(2, ts(10), 1, "click", 1.0),
        Event(3, ts(20), 1, "click", 1.0), Event(4, ts(30), 2, "view", 1.0),
        Event(5, ts(40), 2, "scroll", 1.0)) // novel category
      input.addData(w0: _*)
      q.processAllAvailable()
      // watermark pusher closes window 0 (two batches: advance, emit)
      input.addData(Event(9, ts(60 * 10), 2, "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(10, ts(60 * 20), 2, "view", 1.0))
      q.processAllAvailable()

      val got = spark.table("drift_mon")
        .select("window_start", "cur_total", "psi")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1.getTime)
      got.head._1 shouldBe ts(0)
      got.head._2 shouldBe 5L
      // batch twin on the same slice: sum of per-category psi terms
      val batchPsi = graft.operators.Drift.categoricalPsi(
          reference, w0.toDF(), "event_type")
        .agg(org.apache.spark.sql.functions.sum("psi_term"))
        .head.getDouble(0)
      got.head._3 shouldBe batchPsi +- 1e-8
    } finally q.stop()
  }

  test("streamingNumericDrift: per-window PSI over reference percentile bands") {
    implicit val sqlCtx = spark.sqlContext
    // reference values 1..100 → median edge at 50.5 (2 buckets)
    val reference = (1 to 100).map(i =>
      Event(1000L + i, ts(0), 1, "x", i.toDouble)).toDF()
    val input = MemoryStream[Event]
    val q = EventStreams.streamingNumericDrift(input.toDF(), "value",
        reference, "value", buckets = 2,
        windowLength = "1 hour", watermark = "1 hour")
      .writeStream.format("memory").queryName("ndrift_mon")
      .outputMode(OutputMode.Append()).start()
    try {
      // window 0 skews high: 1 below the median edge, 9 above
      val w0 = (1 to 10).map(i =>
        Event(i.toLong, ts(i.toLong), 1, "x", if (i == 1) 10.0 else 90.0))
      input.addData(w0: _*)
      q.processAllAvailable()
      input.addData(Event(90L, ts(60 * 10), 2, "x", 50.0))
      q.processAllAvailable()
      input.addData(Event(91L, ts(60 * 20), 2, "x", 50.0))
      q.processAllAvailable()
      val got = spark.table("ndrift_mon")
        .select("window_start", "cur_total", "psi")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1.getTime)
      got.head._1 shouldBe ts(0)
      got.head._2 shouldBe 10L
      // batch twin: numericPsi of the same slice over the same bands
      val batchPsi = graft.operators.Drift.numericPsi(
          reference, w0.toDF(), "value", buckets = 2)
        .agg(org.apache.spark.sql.functions.sum("psi_term"))
        .head.getDouble(0)
      got.head._3 shouldBe batchPsi +- 1e-8
    } finally q.stop()
  }

  test("sessionize emits closed sessions on gap and on event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapMinutes = 30,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 5 min apart (one session), then a 90-min gap
      // → session closes when later events advance the watermark
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(95), 1, "click", 4.0))
      q.processAllAvailable()
      // push watermark far ahead so the timeout fires for the open session
      input.addData(Event(4, ts(600), 2, "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(5, ts(1200), 2, "view", 1.0))
      q.processAllAvailable()

      val got = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).sortBy(s => (s._1, s._2.getTime))
      got should contain((1L, ts(0), ts(5), 2L, 3.0))   // gap-closed session
      got should contain((1L, ts(95), ts(95), 1L, 4.0)) // timeout-closed session
    } finally q.stop()
  }

  test("dedupStream drops duplicate event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.dedupStream(input.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(1), 1, "click", 1.0), // duplicate delivery
        Event(2, ts(2), 1, "click", 2.0))
      q.processAllAvailable()
      input.addData(Event(2, ts(3), 1, "click", 2.0)) // late duplicate
      q.processAllAvailable()
      spark.table("dedup_stream").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 2L)
    } finally q.stop()
  }

  test("streamingUpsert: micro-batches merge into the sink with stage-wins PK semantics") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-supsert").toString
    val sink = new graft.app.ParquetSink(spark, s"$base/tables")
    val input = MemoryStream[Event]
    val q = EventStreams.streamingUpsert(
      input.toDF().select($"event_id", $"user_id", $"event_type", $"value"),
      sink, "events_acc", pk = Seq("event_id"),
      checkpointDir = s"$base/ckpt", orderCols = Seq("value"))
    try {
      // batch 1: initial load (target doesn't exist yet)
      input.addData(Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      rows(sink.read("events_acc").orderBy("event_id"))
        .map(r => (r.head, r(3))) shouldBe Seq((1L, 1.0), (2L, 2.0))

      // batch 2: id 2 updated (stage wins), id 3 new, id 4 duplicated
      // in-batch → last-wins by value
      input.addData(Event(2, ts(2), 1, "view", 20.0),
        Event(3, ts(3), 2, "click", 3.0),
        Event(4, ts(4), 2, "view", 4.0),
        Event(4, ts(5), 2, "view", 40.0))
      q.processAllAvailable()
      rows(sink.read("events_acc").orderBy("event_id"))
        .map(r => (r.head, r(3))) shouldBe
        Seq((1L, 1.0), (2L, 20.0), (3L, 3.0), (4L, 40.0))
    } finally q.stop()
  }

  test("streaming check gate: a violating batch blocks before publish; replay clean") {
    import graft.operators.DataChecks
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-schk").toString
    val sink = new graft.app.ParquetSink(spark, s"$base/tables")
    val input = MemoryStream[Event]
    def start() = EventStreams.streamingUpsert(
      input.toDF().select($"event_id", $"user_id", $"event_type", $"value"),
      sink, "events_chk", pk = Seq("event_id"),
      checkpointDir = s"$base/ckpt",
      checks = Seq(DataChecks.NotNull("event_type"),
        DataChecks.InRange("value", 0.0, 100.0)))
    val q = start()
    try {
      // clean batch publishes
      input.addData(Event(1, ts(0), 1, "click", 1.0))
      q.processAllAvailable()
      rows(sink.read("events_chk").select("event_id")) shouldBe Seq(Seq(1L))
      // planted violation: NULL event_type + out-of-range value —
      // the stream fails LOUD and nothing reaches the sink
      input.addData(Event(2, ts(1), 1, null, 1.0),
        Event(3, ts(2), 2, "view", -5.0))
      val e = intercept[Exception] { q.processAllAvailable() }
      val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.toString
      msg should include("data checks failed")
      msg should include("not_null:event_type")
      msg should include("in_range:value")
      rows(sink.read("events_chk").select("event_id")) shouldBe Seq(Seq(1L))
    } finally q.stop()
    // restart from the SAME checkpoint: the blocked batch replays and
    // blocks again — attempt 1 left no partial state behind
    val q2 = start()
    try {
      intercept[Exception] { q2.processAllAvailable() }
      rows(sink.read("events_chk").select("event_id")) shouldBe Seq(Seq(1L))
    } finally q2.stop()
    // operator intervention: restart with the gate relaxed — the same
    // replayed batch now publishes, merging exactly once (the failed
    // attempts never half-applied anything)
    val q3 = EventStreams.streamingUpsert(
      input.toDF().select($"event_id", $"user_id", $"event_type", $"value"),
      sink, "events_chk", pk = Seq("event_id"),
      checkpointDir = s"$base/ckpt")
    try {
      q3.processAllAvailable()
      rows(sink.read("events_chk").select("event_id").orderBy("event_id")) shouldBe
        Seq(Seq(1L), Seq(2L), Seq(3L))
    } finally q3.stop()
  }

  test("streamingLateRouter: routes by the pinned watermark; replay byte-stable") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-late").toString
    val input = MemoryStream[Event]
    val q = EventStreams.streamingLateRouter(input.toDF(),
      s"$base/main", s"$base/late", "ts",
      latenessMs = 10L * 60000, checkpointDir = s"$base/ckpt")
    try {
      // batch 0: no watermark yet — nothing can be late
      input.addData(Event(1, ts(0), 1, "a", 1.0),
        Event(2, ts(60), 1, "a", 1.0))
      q.processAllAvailable()
      spark.read.parquet(s"$base/main/batch_id=0").count() shouldBe 2
      // batch 1: watermark ts(60) − 10 min ⇒ cutoff ts(50):
      // ts(30) late, ts(55) and ts(70) on-time (70 advances the mark)
      input.addData(Event(3, ts(30), 1, "a", 1.0),
        Event(4, ts(55), 1, "a", 1.0), Event(5, ts(70), 1, "a", 1.0))
      q.processAllAvailable()
      spark.read.parquet(s"$base/main/batch_id=1")
        .select("event_id").collect().map(_.getLong(0)).sorted shouldBe
        Array(4L, 5L)
      spark.read.parquet(s"$base/late/batch_id=1")
        .select("event_id").collect().map(_.getLong(0)) shouldBe Array(3L)
    } finally q.stop()
    // REPLAY batch 1 directly: the watermark has since advanced to
    // ts(70) (cutoff would be ts(60), flagging event 4 too) — but the
    // batch's own marker pins the ORIGINAL basis, so routing is
    // byte-identical to the first attempt
    val replay = Seq(Event(3, ts(30), 1, "a", 1.0),
      Event(4, ts(55), 1, "a", 1.0), Event(5, ts(70), 1, "a", 1.0)).toDF()
    EventStreams.routeLateBatch(replay, s"$base/main", s"$base/late",
      "ts", 10L * 60000, batchId = 1)
    spark.read.parquet(s"$base/main/batch_id=1")
      .select("event_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(4L, 5L)
    spark.read.parquet(s"$base/late/batch_id=1")
      .select("event_id").collect().map(_.getLong(0)) shouldBe Array(3L)
    // a FRESH batch 2 does see the advanced watermark: cutoff ts(60)
    val b2 = Seq(Event(6, ts(55), 1, "a", 1.0),
      Event(7, ts(65), 1, "a", 1.0)).toDF()
    EventStreams.routeLateBatch(b2, s"$base/main", s"$base/late",
      "ts", 10L * 60000, batchId = 2)
    spark.read.parquet(s"$base/late/batch_id=2")
      .select("event_id").collect().map(_.getLong(0)) shouldBe Array(6L)
    spark.read.parquet(s"$base/main/batch_id=2")
      .select("event_id").collect().map(_.getLong(0)) shouldBe Array(7L)
  }

  test("streamingCdcApply: cross-batch sequence ordering, deletes, out-of-order losers") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-scdc").toString
    val sink = new graft.app.ParquetSink(spark, s"$base/tables")
    // (key, seq, op, value)
    val input = MemoryStream[(Long, Long, String, String)]
    val q = EventStreams.streamingCdcApply(
      input.toDF().toDF("k", "seq", "op", "v"),
      sink, "cdc_state", Seq("k"), "seq", "op", s"$base/ckpt")
    try {
      // batch 1: inserts + an in-batch update
      input.addData((1L, 1L, "I", "one"), (2L, 1L, "I", "two"),
        (2L, 2L, "U", "two-v2"))
      q.processAllAvailable()
      rows(sink.read("cdc_state").select("k", "v").orderBy("k")) shouldBe
        Seq(Seq(1L, "one"), Seq(2L, "two-v2"))

      // batch 2: delete key 1, and an OUT-OF-ORDER update for key 2
      // (seq 1 < the applied seq 2) — the stored state must win
      input.addData((1L, 3L, "D", "x"), (2L, 1L, "U", "two-stale"),
        (3L, 1L, "I", "three"))
      q.processAllAvailable()
      rows(sink.read("cdc_state").select("k", "v").orderBy("k")) shouldBe
        Seq(Seq(2L, "two-v2"), Seq(3L, "three"))

      // batch 3: key 2 updated past its stored seq; key 1 resurrected
      // by a NEWER insert (legal — only sub-delete-seq events are the
      // documented retention caveat)
      input.addData((2L, 5L, "U", "two-v3"), (1L, 9L, "I", "one-again"))
      q.processAllAvailable()
      rows(sink.read("cdc_state").select("k", "v").orderBy("k")) shouldBe
        Seq(Seq(1L, "one-again"), Seq(2L, "two-v3"), Seq(3L, "three"))
    } finally q.stop()
  }

  test("streamingScd2: micro-batches keep type-2 history at the batch effective date") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-sscd2").toString
    val sink = new graft.app.ParquetSink(spark, s"$base/tables")
    val input = MemoryStream[Event]
    val q = EventStreams.streamingScd2(
      input.toDF(), sink, "dim_events", pk = Seq("event_id"),
      effCol = "ts", checkpointDir = s"$base/ckpt")
    try {
      // batch 1 bootstraps: every row an open version dated MAX(ts)
      input.addData(Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      val t1 = sink.read("dim_events")
      t1.count() shouldBe 2
      t1.filter($"is_current").count() shouldBe 2
      rows(t1.select("valid_from").distinct()) shouldBe Seq(Seq(ts(1)))

      // batch 2 (effective date = MAX(ts) = ts(14)): id 2 changed,
      // id 1 resent unchanged (no-op), id 3 new, id 4 duplicated
      // in-batch → last-wins by ts
      input.addData(
        Event(2, ts(10), 1, "view", 20.0),
        Event(1, ts(12), 1, "click", 1.0),
        Event(3, ts(11), 2, "click", 3.0),
        Event(4, ts(13), 2, "view", 4.0),
        Event(4, ts(14), 2, "view", 40.0))
      q.processAllAvailable()
      val t2 = sink.read("dim_events")
      // (event_id, value, valid_from, valid_to, is_current) tuples
      def versions(id: Long) =
        rows(t2.filter($"event_id" === id)
          .select("value", "valid_from", "valid_to", "is_current")
          .orderBy("valid_from"))
      versions(1) shouldBe Seq(Seq(1.0, ts(1), null, true)) // no-op kept open
      versions(2) shouldBe Seq(
        Seq(2.0, ts(1), ts(14), false),   // closed at batch-2 eff date
        Seq(20.0, ts(14), null, true))    // reopened with staged value
      versions(3) shouldBe Seq(Seq(3.0, ts(14), null, true))
      versions(4) shouldBe Seq(Seq(40.0, ts(14), null, true)) // dup last-wins
    } finally q.stop()
  }

  test("streamingScd2: late batches fail loud; reserved columns refused at wiring") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-sscd2-late").toString
    val sink = new graft.app.ParquetSink(spark, s"$base/tables")
    // wiring-time: a stream already carrying an SCD bookkeeping name
    // would have its column silently overwritten by the bootstrap —
    // refuse before any batch runs (case-variant included)
    val input0 = MemoryStream[Event]
    an[IllegalArgumentException] should be thrownBy
      EventStreams.streamingScd2(
        input0.toDF().withColumnRenamed("value", "VALID_FROM"),
        sink, "dim_bad", Seq("event_id"), "ts", s"$base/ckpt0")
    an[IllegalArgumentException] should be thrownBy
      EventStreams.streamingScd2(input0.toDF(), sink, "dim_bad",
        Seq("event_id"), "event_id", s"$base/ckpt1") // effCol = pk
    // effCol in a different case than the frame still wires and runs
    // (resolution is case-insensitive end to end)
    val input = MemoryStream[Event]
    val q = EventStreams.streamingScd2(input.toDF(), sink, "dim_late",
      Seq("event_id"), "TS", s"$base/ckpt2")
    try {
      input.addData(Event(1, ts(10), 1, "click", 1.0))
      q.processAllAvailable()
      sink.read("dim_late").count() shouldBe 1
      // a batch whose effective date precedes the newest valid_from
      // would close versions before they opened — refused
      input.addData(Event(1, ts(5), 1, "click", 99.0))
      val e = intercept[Exception] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      chain(e).exists(t => Option(t.getMessage)
        .exists(_.contains("late batch"))) shouldBe true
      // the refused batch wrote nothing
      rows(sink.read("dim_late").select("value", "is_current")) shouldBe
        Seq(Seq(1.0, true))
    } finally q.stop()
  }

  test("streamingUpsertPartitioned rewrites only the partitions a batch touches") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-pupsert").toString
    val target = s"$base/events_pt"
    // seed two day partitions: ts(0)/ts(30) → 2023-11-14 (22:00 UTC),
    // ts(150) → 2023-11-15 (00:30 UTC)
    val seed = Seq(Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(30), 1, "view", 2.0),
      Event(10, ts(150), 2, "click", 5.0)).toDF()
    graft.sources.PartitionedStore.writeByDay(seed, "ts", target)

    // every file (incl. local-fs .crc sidecars) under a day's partition
    def partFiles(day: String): Map[String, Seq[Byte]] = {
      val dir = java.nio.file.Paths.get(target, s"p_date=$day")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(dir).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.readAllBytes(p).toSeq)
        .toMap
    }
    val dayB = "2023-11-15"
    val before = partFiles(dayB)
    before should not be empty

    val input = MemoryStream[Event]
    val q = EventStreams.streamingUpsertPartitioned(input.toDF(), target,
      tsCol = "ts", pk = Seq("event_id"), checkpointDir = s"$base/ckpt")
    try {
      // the batch touches ONLY day A: event 1 updated (stage wins,
      // same-day per the partition-stability contract), event 3 new
      input.addData(Event(1, ts(1), 1, "click", 100.0),
        Event(3, ts(40), 3, "view", 3.0))
      q.processAllAvailable()
    } finally q.stop()

    // untouched day-B partition: the exact same files, byte for byte
    partFiles(dayB) shouldBe before
    // merge semantics across the whole table
    spark.read.parquet(target).select("event_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap shouldBe
      Map(1L -> 100.0, 2L -> 2.0, 3L -> 3.0, 10L -> 5.0)
    // no staging residue next to the target
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(base))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.contains("__stage_")).toSeq shouldBe empty
  }

  test("scd2VacuumBucketed drops expired versions rewriting only expirable buckets") {
    val base = java.nio.file.Files.createTempDirectory("graft-scd2vac").toString
    val target = s"$base/dim_vac"
    import graft.sources.PartitionedStore
    import graft.operators.Load

    // bootstrap 20 keys at t10; change key 5 at t20 (closes at t20);
    // change key 5 again at t40 (closes the t20 version at t40)
    val b1 = (1L to 20L).map(i =>
      Event(i, ts(10), i % 3, "click", i.toDouble)).toDF()
    PartitionedStore.scd2MergeBucketed(b1, target, Seq("event_id"), "ts",
      nBuckets = 8)
    PartitionedStore.scd2MergeBucketed(
      Seq(Event(5, ts(20), 99, "click", 500.0)).toDF(),
      target, Seq("event_id"), "ts", nBuckets = 8)
    PartitionedStore.scd2MergeBucketed(
      Seq(Event(5, ts(40), 99, "click", 600.0)).toDF(),
      target, Seq("event_id"), "ts", nBuckets = 8)
    val pre = spark.read.parquet(target)
    pre.count() shouldBe 22 // 20 current + 2 closed versions of key 5

    def bucketFiles(k: Int): Map[String, Long] = {
      val dir = java.nio.file.Paths.get(target, s"p_bucket=$k")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(dir).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val allBuckets = new java.io.File(target).list()
      .filter(_.startsWith("p_bucket=")).map(_.stripPrefix("p_bucket=").toInt)
    val before = allBuckets.map(k => k -> bucketFiles(k)).toMap
    // the in-memory retention over the same cutoff is the oracle
    val want = rows(Load.scd2Retention(pre, lit(ts(30)))
      .orderBy("event_id", "valid_from"))

    // cutoff t30: the [t10,t20) version of key 5 expires; the
    // [t20,t40) one (closed at t40 > t30) and all current rows stay
    val touched = PartitionedStore.scd2VacuumBucketed(
      spark, target, lit(ts(30)))
    touched should have size 1 // only key 5's bucket holds expirable rows
    val post = spark.read.parquet(target)
    post.count() shouldBe 21
    rows(post.orderBy("event_id", "valid_from")) shouldBe want
    rows(post.filter($"event_id" === 5)
      .select("value", "valid_from", "valid_to", "is_current")
      .orderBy("valid_from")) shouldBe Seq(
      Seq(500.0, ts(20), ts(40), false),
      Seq(600.0, ts(40), null, true))
    // untouched buckets: byte-identical file sets
    allBuckets.filterNot(touched.contains).foreach { k =>
      withClue(s"untouched bucket $k") { bucketFiles(k) shouldBe before(k) }
    }
    // idempotent: nothing left to expire at the same cutoff
    PartitionedStore.scd2VacuumBucketed(spark, target, lit(ts(30))) shouldBe Nil
  }

  test("scd2VacuumBucketed swaps a fully-expired bucket to an EMPTY directory") {
    val base = java.nio.file.Files.createTempDirectory("graft-scd2vac2").toString
    val target = s"$base/dim_vac2"
    // hand-built layout: bucket 0 holds ONLY closed-old rows, bucket 1
    // a mix — the vacuum must leave p_bucket=0 as an empty dir (bucket
    // set stable), not keep the stale copy
    Seq(
      (1L, 10.0, ts(0), ts(10), false, 0),
      (2L, 20.0, ts(0), ts(10), false, 0),
      (3L, 30.0, ts(0), ts(10), false, 1),
      (3L, 31.0, ts(10), null, true, 1))
      .toDF("id", "value", "valid_from", "valid_to", "is_current", "p_bucket")
      .write.partitionBy("p_bucket").parquet(target)
    val touched = graft.sources.PartitionedStore.scd2VacuumBucketed(
      spark, target, lit(ts(20)))
    touched.sorted shouldBe Seq(0, 1)
    val post = spark.read.parquet(target)
    post.count() shouldBe 1
    post.select("id").collect().head.getLong(0) shouldBe 3L
    new java.io.File(s"$target/p_bucket=0").exists() shouldBe true
    new java.io.File(s"$target/p_bucket=0").listFiles()
      .count(f => f.isFile && !f.getName.startsWith(".")) shouldBe 0
  }

  test("scd2VacuumBucketed pre-probe recovery restores a crashed swap's bucket") {
    val base = java.nio.file.Files.createTempDirectory("graft-scd2vac3").toString
    val target = s"$base/dim_vac3"
    import graft.sources.PartitionedStore
    val b1 = (1L to 12L).map(i =>
      Event(i, ts(10), i % 3, "click", i.toDouble)).toDF()
    PartitionedStore.scd2MergeBucketed(b1, target, Seq("event_id"), "ts",
      nBuckets = 4, batchId = Some(0L))
    val preCount = spark.read.parquet(target).count()

    // simulate a crash between a swap's DELETE and RENAME: a stranded
    // MARKED stage holds the only copy of one bucket
    val bucketDir = new java.io.File(target).list()
      .filter(_.startsWith("p_bucket=")).head
    val stage = new java.io.File(s"${target}__stage_0deadbee")
    java.nio.file.Files.createDirectories(stage.toPath)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(target, bucketDir),
      stage.toPath.resolve(bucketDir))
    java.nio.file.Files.createFile(stage.toPath.resolve("_APPLIED_7"))

    // vacuum (nothing expirable): the lost bucket must be recovered
    // BEFORE the probe — without recovery its keys would silently
    // vanish from this read and every later one
    PartitionedStore.scd2VacuumBucketed(spark, target, lit(ts(0)),
      batchId = Some(8L)) shouldBe Nil
    spark.read.parquet(target).count() shouldBe preCount
    new java.io.File(target, bucketDir).exists() shouldBe true

    // a MARKERLESS stage (crash mid-write, target intact) is ignored
    val halfStage = new java.io.File(s"${target}__stage_0badf00d")
    java.nio.file.Files.createDirectories(
      halfStage.toPath.resolve("p_bucket=99"))
    PartitionedStore.scd2VacuumBucketed(spark, target, lit(ts(0)),
      batchId = Some(9L)) shouldBe Nil
    new java.io.File(target, "p_bucket=99").exists() shouldBe false
  }

  test("NULL is_current rows are deterministically expirable (probe = filter complement)") {
    val base = java.nio.file.Files.createTempDirectory("graft-scd2vac4").toString
    val target = s"$base/dim_vac4"
    // bucket 1 holds ONLY the malformed row — without the coalesce the
    // probe would skip the bucket and the row would live forever even
    // though scd2Retention drops it
    Seq(
      (1L, 10.0, ts(0), Some(ts(10)), None: Option[Boolean], 1),
      (2L, 20.0, ts(0), None, Some(true), 2))
      .toDF("id", "value", "valid_from", "valid_to", "is_current", "p_bucket")
      .write.partitionBy("p_bucket").parquet(target)
    val touched = graft.sources.PartitionedStore.scd2VacuumBucketed(
      spark, target, lit(ts(20)))
    touched shouldBe Seq(1)
    spark.read.parquet(target).select("id").collect()
      .map(_.getLong(0)) shouldBe Array(2L)
  }

  test("retention wiring rejects a malformed INTERVAL at .start(), not on batch N") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-sscd2-badlag").toString
    val input = MemoryStream[Event]
    intercept[Exception] {
      EventStreams.streamingScd2Partitioned(
        input.toDF(), s"$base/dim", pk = Seq("event_id"), effCol = "ts",
        nBuckets = 4, checkpointDir = s"$base/ckpt",
        retentionLag = Some("90 dayz"), retentionEveryBatches = 64)
    }.getMessage.toLowerCase should include("interval")
  }

  test("streamingScd2Partitioned retention cadence vacuums event-time-lagged history") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-sscd2-ret").toString
    val target = s"$base/dim"
    val input = MemoryStream[Event]
    val q = EventStreams.streamingScd2Partitioned(
      input.toDF(), target, pk = Seq("event_id"), effCol = "ts",
      nBuckets = 4, checkpointDir = s"$base/ckpt",
      retentionLag = Some("1 hour"), retentionEveryBatches = 2)
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(0), 1, "view", 2.0))
      q.processAllAvailable() // batch 0: bootstrap, no vacuum
      input.addData(Event(1, ts(100), 1, "click", 10.0))
      q.processAllAvailable() // batch 1: closes v1 at t100
      input.addData(Event(1, ts(300), 1, "click", 20.0))
      q.processAllAvailable() // batch 2: closes v2 at t300, THEN
      // vacuums with cutoff t300 - 1h = t240: the t100-closed version
      // expires, the t300-closed one survives
      val hist = rows(spark.read.parquet(target)
        .filter($"event_id" === 1)
        .select("value", "valid_from", "valid_to", "is_current")
        .orderBy("valid_from"))
      hist shouldBe Seq(
        Seq(10.0, ts(100), ts(300), false),
        Seq(20.0, ts(300), null, true))
      // key 2 untouched by retention (still current from bootstrap)
      spark.read.parquet(target).filter($"event_id" === 2)
        .count() shouldBe 1
    } finally q.stop()
  }

  test("scd2MergeBucketed rewrites only the buckets a batch touches; layout pinned; late refused") {
    val base = java.nio.file.Files.createTempDirectory("graft-scd2bk").toString
    val target = s"$base/dim_bk"
    import graft.sources.PartitionedStore

    // bootstrap: 20 keys spread over 8 hash buckets
    val b1 = (1L to 20L).map(i =>
      Event(i, ts(10), i % 3, "click", i.toDouble)).toDF()
    val touched1 = PartitionedStore.scd2MergeBucketed(
      b1, target, Seq("event_id"), "ts", nBuckets = 8)
    touched1 should not be empty
    val t1 = spark.read.parquet(target)
    t1.count() shouldBe 20
    t1.filter(!$"is_current").count() shouldBe 0

    def partFiles(k: Int): Map[String, Seq[Byte]] = {
      val dir = java.nio.file.Paths.get(target, s"p_bucket=$k")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(dir).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.readAllBytes(p).toSeq)
        .toMap
    }
    val before = touched1.map(k => k -> partFiles(k)).toMap

    // batch 2 changes ONE key: only its bucket may rewrite
    val b2 = Seq(Event(5, ts(20), 99, "click", 500.0)).toDF()
    val touched2 = PartitionedStore.scd2MergeBucketed(
      b2, target, Seq("event_id"), "ts", nBuckets = 8)
    touched2 should have size 1
    touched1.filterNot(touched2.contains).foreach { k =>
      withClue(s"untouched bucket $k") { partFiles(k) shouldBe before(k) }
    }
    // key 5's version chain: closed at the batch-2 date + reopened
    rows(spark.read.parquet(target).filter($"event_id" === 5)
      .select("value", "valid_from", "valid_to", "is_current")
      .orderBy("valid_from")) shouldBe Seq(
      Seq(5.0, ts(10), ts(20), false),
      Seq(500.0, ts(20), null, true))
    // every other key untouched and still current
    spark.read.parquet(target).count() shouldBe 21
    spark.read.parquet(target).filter($"is_current").count() shouldBe 20
    // the layout prunes: a bucket predicate reaches the scan's ACTUAL
    // partition-filter list (directory-level skip before any I/O) —
    // the same pruning the merge's own touched-slice read rides.
    // (A string-contains check on the scan's toString is vacuous: the
    // metadata prints an empty 'PartitionFilters: []' entry and the
    // column name appears in the output list regardless.)
    val scans = spark.read.parquet(target)
      .filter($"p_bucket" === touched2.head)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    scans should not be empty
    scans.head.partitionFilters
      .exists(_.toString.contains("p_bucket")) shouldBe true

    // point lookup: key 5's full history at the cost of ONE bucket —
    // the bucket id recomputes from the _CONFIG pin (Int literal cast
    // to the stored Long type before hashing) and constant-folds into
    // the scan's partition filter
    val hist = PartitionedStore.scd2KeyHistory(spark, target,
      Map("event_id" -> 5))
    rows(hist.select("value", "is_current").orderBy("valid_from")) shouldBe
      Seq(Seq(5.0, false), Seq(500.0, true))
    val histScan = hist.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    histScan.partitionFilters
      .exists(_.toString.contains("p_bucket")) shouldBe true
    // mismatched key columns fail loud, not a wrong-bucket empty scan
    an[IllegalArgumentException] should be thrownBy
      PartitionedStore.scd2KeyHistory(spark, target, Map("user_id" -> 1))
    // ...as does a value that would cast to NULL (xxhash64 skips NULLs
    // -> meaningless bucket, silent empty result)
    val eCast = intercept[graft.model.UserException] {
      PartitionedStore.scd2KeyHistory(spark, target,
        Map("event_id" -> "not-a-number"))
    }
    eCast.getMessage should (include("do not evaluate") or
      include("cast to NULL"))
    // ...and case-colliding caller keys (ambiguous which value wins)
    an[IllegalArgumentException] should be thrownBy
      PartitionedStore.scd2KeyHistory(spark, target,
        Map("EVENT_ID" -> 1, "event_id" -> 2))
    // a legacy raw-cased pin (pre-lowering generation, no merge has
    // migrated it yet) still serves lookups — names canonicalize.
    // (Hand-writing the pin bypasses Hadoop's checksumming local fs —
    // drop the stale .crc sidecar or the read throws ChecksumException)
    def rewritePin(content: String): Unit = {
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(target, "._CONFIG.crc"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(target, "_CONFIG"),
        content.getBytes("UTF-8"))
    }
    rewritePin("scd2|8|EVENT_ID")
    PartitionedStore.scd2KeyHistory(spark, target, Map("event_id" -> 5))
      .count() shouldBe 2
    rewritePin("scd2|8|event_id")

    // the bucket function is pinned: different nBuckets fails loud
    a[graft.model.UserException] should be thrownBy
      PartitionedStore.scd2MergeBucketed(
        b2, target, Seq("event_id"), "ts", nBuckets = 16)
    // a late batch (effective date behind the slice's newest
    // valid_from) is refused — negative intervals would corrupt history
    a[graft.model.UserException] should be thrownBy
      PartitionedStore.scd2MergeBucketed(
        Seq(Event(6, ts(5), 1, "click", 6.0)).toDF(),
        target, Seq("event_id"), "ts", nBuckets = 8)
    // no staging residue
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(base))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.contains("__stage_")).toSeq shouldBe empty
  }

  test("streamingScd2 refuses NULL business keys per batch") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-sscd2n").toString
    val sink = new graft.app.ParquetSink(spark, s"$base/tables")
    val input = MemoryStream[(Option[Long], java.sql.Timestamp, Double)]
    val q = EventStreams.streamingScd2(
      input.toDF().toDF("id", "ts", "v"), sink, "dim_null",
      Seq("id"), "ts", s"$base/ckpt")
    try {
      input.addData((Some(1L), ts(10), 1.0), (None, ts(10), 2.0))
      val e = intercept[Exception] { q.processAllAvailable() }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      chain(e).exists(t => Option(t.getMessage)
        .exists(_.contains("NULL business key"))) shouldBe true
    } finally q.stop()
  }

  test("scd2MergeBucketed: NULL keys refused, empty _CONFIG self-heals, pk case ignored by the pin") {
    val base = java.nio.file.Files.createTempDirectory("graft-scd2bk2").toString
    val target = s"$base/dim"
    import graft.sources.PartitionedStore

    // an empty _CONFIG (crashed create-then-write) must read as absent
    // and re-pin, not brick the path with a mismatch-vs-[] forever
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(target))
    java.nio.file.Files.createFile(java.nio.file.Paths.get(target, "_CONFIG"))
    val b1 = Seq((1L, ts(10), "a"), (2L, ts(10), "b"))
      .toDF("id", "ts", "attr")
    PartitionedStore.scd2MergeBucketed(b1, target, Seq("id"), "ts",
      nBuckets = 4) should not be empty
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(target, "_CONFIG")),
      "UTF-8") should not be empty

    // a restart that re-spells the key in a different case is the SAME
    // bucket function — accepted, and the merge resolves it
    PartitionedStore.scd2MergeBucketed(
      Seq((1L, ts(20), "a2")).toDF("id", "ts", "attr"),
      target, Seq("ID"), "ts", nBuckets = 4) should have size 1
    spark.read.parquet(target).filter($"id" === 1).count() shouldBe 2

    // NULL business keys: the merge join can never match them — each
    // batch would accrete another open version; refused loudly
    val withNull = Seq((Option(3L), ts(30), "c"), (None, ts(30), "d"))
      .toDF("id", "ts", "attr")
    val e = intercept[graft.model.UserException] {
      PartitionedStore.scd2MergeBucketed(withNull, target, Seq("id"),
        "ts", nBuckets = 4)
    }
    e.getMessage should include("NULL business key")

    // an empty pin NEXT TO DATA is different: the layout is
    // unknowable, so re-pinning to this call's layout could bless a
    // changed bucket function — fail loud, never self-heal
    java.nio.file.Files.write(
      java.nio.file.Paths.get(target, "_CONFIG"), Array.empty[Byte])
    val e2 = intercept[graft.model.UserException] {
      PartitionedStore.scd2MergeBucketed(
        Seq((9L, ts(40), "z")).toDF("id", "ts", "attr"),
        target, Seq("id"), "ts", nBuckets = 4)
    }
    e2.getMessage should include("missing or empty layout pin")
  }

  test("streamingScd2Partitioned: micro-batches maintain bucketed type-2 history") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-sscd2p").toString
    val target = s"$base/dim_pt"
    val input = MemoryStream[Event]
    // wiring-time checks, like the sink-generic variant: a schema
    // violation fails at .start(), not on the first micro-batch
    an[IllegalArgumentException] should be thrownBy
      EventStreams.streamingScd2Partitioned(
        input.toDF().withColumnRenamed("value", "p_bucket"), target,
        pk = Seq("event_id"), effCol = "ts", nBuckets = 4,
        checkpointDir = s"$base/ckpt-bad")
    val q = EventStreams.streamingScd2Partitioned(input.toDF(), target,
      pk = Seq("event_id"), effCol = "ts", nBuckets = 4,
      checkpointDir = s"$base/ckpt")
    try {
      input.addData(Event(1, ts(10), 1, "click", 1.0),
        Event(2, ts(11), 1, "view", 2.0))
      q.processAllAvailable()
      spark.read.parquet(target).count() shouldBe 2

      input.addData(Event(2, ts(20), 1, "view", 20.0)) // changed
      q.processAllAvailable()
      rows(spark.read.parquet(target).filter($"event_id" === 2)
        .select("value", "valid_from", "valid_to", "is_current")
        .orderBy("valid_from")) shouldBe Seq(
        Seq(2.0, ts(11), ts(20), false),
        Seq(20.0, ts(20), null, true))
      spark.read.parquet(target).filter($"event_id" === 1)
        .count() shouldBe 1 // untouched key: still a single open version
    } finally q.stop()
  }

  test("mergeByDay treats an empty target dir as absent (crash recovery)") {
    // a crash between mkdirs and the first partition rename leaves an
    // empty target; the next merge must bootstrap, not throw on schema
    // inference
    val base = java.nio.file.Files.createTempDirectory("graft-mbd").toString
    val target = s"$base/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(target))
    val batch = Seq(Event(1, ts(0), 1, "click", 1.0)).toDF()
    graft.sources.PartitionedStore.mergeByDay(batch, target, "ts",
      pk = Seq("event_id")) should not be empty
    spark.read.parquet(target).count() shouldBe 1
    // marker-only target (a zero-row bootstrap leaves just _SUCCESS)
    // must also read as absent, not wedge on schema inference
    val target2 = s"$base/t2"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(target2))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(target2, "_SUCCESS"), "")
    graft.sources.PartitionedStore.mergeByDay(batch, target2, "ts",
      pk = Seq("event_id")) should not be empty
    spark.read.parquet(target2).count() shouldBe 1
  }

  test("mergeByDay refuses to merge over a partition stranded in a stage dir") {
    val base = java.nio.file.Files.createTempDirectory("graft-mbd2").toString
    val target = s"$base/t"
    val batch = Seq(Event(1, ts(0), 1, "click", 1.0)).toDF()
    graft.sources.PartitionedStore.mergeByDay(batch, target, "ts",
      pk = Seq("event_id"))
    // simulate the crash-mid-swap: the partition's only copy sits in a
    // stranded stage dir, the target partition is gone
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(target)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("p_date=")).head
    val stage = new org.apache.hadoop.fs.Path(s"${target}__stage_deadbeef")
    fs.mkdirs(stage)
    fs.rename(new org.apache.hadoop.fs.Path(target, part),
      new org.apache.hadoop.fs.Path(stage, part))
    val update = Seq(Event(2, ts(60), 1, "click", 2.0)).toDF()
    val e = intercept[graft.model.UserException] {
      graft.sources.PartitionedStore.mergeByDay(update, target, "ts",
        pk = Seq("event_id"))
    }
    e.getMessage should include("stranded stage")
    // recovery = rename the staged partition back in; the merge resumes
    fs.rename(new org.apache.hadoop.fs.Path(stage, part),
      new org.apache.hadoop.fs.Path(target, part))
    fs.delete(stage, true)
    graft.sources.PartitionedStore.mergeByDay(update, target, "ts",
      pk = Seq("event_id")) should not be empty
    spark.read.parquet(target).count() shouldBe 2

    // a stranded FIRST-WRITE stage (carries the _FRESH marker) is the
    // crashed write of a partition that never existed: replay must
    // self-heal by recomputing, not wedge on the audit
    val stage2 = new org.apache.hadoop.fs.Path(s"${target}__stage_00000002")
    fs.mkdirs(stage2)
    fs.rename(new org.apache.hadoop.fs.Path(target, part),
      new org.apache.hadoop.fs.Path(stage2, part))
    fs.create(new org.apache.hadoop.fs.Path(stage2,
      "_FRESH_" + part.stripPrefix("p_date=")), true).close()
    graft.sources.PartitionedStore.mergeByDay(update, target, "ts",
      pk = Seq("event_id")) should not be empty
    spark.read.parquet(target).count() shouldBe 1 // replay recomputed
    fs.delete(stage2, true)

    // a stranded stage carrying the replaying batch's _APPLIED marker
    // is that batch's completed merge: the partition renames in
    // automatically and the idempotent re-merge proceeds over it
    val stage3 = new org.apache.hadoop.fs.Path(s"${target}__stage_00000003")
    fs.mkdirs(stage3)
    fs.rename(new org.apache.hadoop.fs.Path(target, part),
      new org.apache.hadoop.fs.Path(stage3, part))
    fs.create(new org.apache.hadoop.fs.Path(stage3, "_APPLIED_77"), true)
      .close()
    val late = Seq(Event(9, ts(90), 1, "click", 9.0)).toDF()
    graft.sources.PartitionedStore.mergeByDay(late, target, "ts",
      pk = Seq("event_id"), batchId = Some(77L)) should not be empty
    // recovered row (event 2) + the batch row (event 9)
    spark.read.parquet(target).count() shouldBe 2
  }

  test("stream-stream join matches events within the time bound, drops the rest") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val joined = EventStreams.streamStreamJoin(
      clicks.toDF().select($"user_id", $"ts", $"event_id"),
      views.toDF().select($"user_id", $"ts", $"event_id"),
      keyCols = Seq("user_id"), withinSeconds = 600,
      watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(Event(1, ts(0), 7, "click", 1.0))
      views.addData(
        Event(100, ts(5), 7, "view", 1.0),   // within 10 min → match
        Event(101, ts(30), 7, "view", 1.0),  // outside the bound
        Event(102, ts(5), 8, "view", 1.0))   // different user
      // watermark pushers so buffered state can resolve
      clicks.addData(Event(2, ts(120), 99, "click", 0.0))
      views.addData(Event(103, ts(120), 99, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("ss_join")
        .select("user_id", "event_id", "r_event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got should contain((7L, 1L, 100L))
      got should not contain ((7L, 1L, 101L))
      got.map(_._1) should not contain 8L
    } finally q.stop()
  }

  test("file-source stream: windowedStats over parquet files arriving in a dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE"
    val batch1 = Seq(
      (1L, ts(5), 1L, "click", 1.0), (2L, ts(10), 1L, "click", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    batch1.write.parquet(s"$dir/b1")

    val stream = spark.readStream.schema(schema).parquet(s"$dir/b*")
    val q = EventStreams.windowedStats(stream, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("file_win")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // second file arrives; watermark pusher closes the first window
      Seq((3L, ts(600), 2L, "view", 5.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val got = spark.table("file_win").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      got should contain((ts(0), "click", 2L))
    } finally q.stop()
  }

  test("stream-static join enriches events with a broadcast dimension") {
    implicit val sqlCtx = spark.sqlContext
    val tiers = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    val q = input.toDF()
      .join(org.apache.spark.sql.functions.broadcast(tiers), Seq("user_id"), "left")
      .select("event_id", "user_id", "tier")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 2, "click", 1.0),
        Event(3, ts(2), 9, "click", 1.0)) // no tier → null
      q.processAllAvailable()
      val got = spark.table("enriched").collect()
        .map(r => (r.getLong(0), r.get(2))).sortBy(_._1).toSeq
      got shouldBe Seq((1L, "gold"), (2L, "basic"), (3L, null))
    } finally q.stop()
  }

  test("batch and streaming sessionization agree on closed sessions") {
    // batch twin over the same events
    val events = Seq(
      (1L, ts(0), 1L, "click", 1.0),
      (2L, ts(5), 1L, "click", 2.0),
      (3L, ts(95), 1L, "click", 4.0),
      (4L, ts(100), 1L, "click", 8.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = rows(graft.operators.Sessionize.sessions(
      events, "user_id", "ts", "event_id", "value", gapMinutes = 30)
      .select("user_id", "session_id", "n_events", "total_value")
      .orderBy("session_id"))
    got shouldBe Seq(Seq(1L, 1L, 2L, 3.0), Seq(1L, 2L, 2L, 12.0))
  }

  test("streamingIngestDedup: first batch bootstraps the index; later near-dups are gated") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-singest").toString
    val name = s"graft_mh_stream_${System.nanoTime}"
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.DocumentStreams.streamingIngestDedup(
      input.toDF().toDF("doc_id", "text"), name, s"$base/corpus",
      "doc_id", "text", checkpointDir = s"$base/ckpt")
    def corpusIds: Set[Long] = spark.read.parquet(s"$base/corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    try {
      // batch 1 (bootstrap): 2 is a near-copy of 1 → in-batch dropped
      input.addData(
        (1L, "seed document with words alpha beta gamma delta epsilon zeta"),
        (2L, "seed document with words alpha beta gamma delta epsilon eta"),
        (3L, "fresh topic about completely new material one two"))
      q.processAllAvailable()
      corpusIds shouldBe Set(1L, 3L)

      // batch 2: 4 near-copies an INDEXED doc → dropped; 5 is novel
      input.addData(
        (4L, "seed document with words alpha beta gamma delta epsilon zeta qq"),
        (5L, "entirely different unrelated subject matter here five"))
      q.processAllAvailable()
      corpusIds shouldBe Set(1L, 3L, 5L)

      // the index grew by every accepted doc: a dup of batch 2's
      // survivor is caught in batch 3
      input.addData(
        (6L, "entirely different unrelated subject matter here six"))
      q.processAllAvailable()
      corpusIds shouldBe Set(1L, 3L, 5L)
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS ${name}_bands")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_shingles")
    }
  }

  test("streamingIngestDedup compactEvery: index files stay bounded, gating unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-singest-c").toString
    val name = s"graft_mh_streamc_${System.nanoTime}"
    val input = MemoryStream[(Long, String)]
    // compact every 2 batches, INSIDE foreachBatch — the compactors'
    // single-writer contract holds by construction here
    // maxFilesPerBucket=0 disables the accretion gate: at test scale
    // it would skip every firing, and this test pins the REWRITE
    // (the gate itself is covered in MaintenanceSpec)
    val q = graft.streaming.DocumentStreams.streamingIngestDedup(
      input.toDF().toDF("doc_id", "text"), name, s"$base/corpus",
      "doc_id", "text", checkpointDir = s"$base/ckpt", compactEvery = 2,
      maxFilesPerBucket = 0)
    def bandFiles: Int = {
      val loc = new java.io.File(java.net.URI.create(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(s"${name}_bands"))
          .location.toString))
      Option(loc.listFiles()).toSeq.flatten
        .count(_.getName.endsWith(".parquet"))
    }
    def corpusIds: Set[Long] = spark.read.parquet(s"$base/corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    try {
      input.addData(
        (1L, "seed document with words alpha beta gamma delta epsilon zeta"),
        (3L, "fresh topic about completely new material one two"))
      q.processAllAvailable()
      (2 to 5).foreach { b =>
        input.addData((100L + b,
          s"novel subject number $b with its own distinct vocabulary"))
        q.processAllAvailable()
      }
      // 5 batches (bootstrap at batchId 0 + 4 appends) with
      // compactEvery=2 → the cadence fired at batchIds 1 and 3: at
      // assertion time the bands table is at its batch-3-compacted
      // width (8 buckets → 8 files) plus the batch-4 append residue
      bandFiles should be <= 8 * 2
      // gating still correct after compactions: a near-copy of the
      // FIRST batch and of a late append are both dropped
      input.addData(
        (7L, "seed document with words alpha beta gamma delta epsilon zeta qq"),
        (8L, "novel subject number 5 with its own distinct vocabulary x"))
      q.processAllAvailable()
      corpusIds.intersect(Set(7L, 8L)) shouldBe Set.empty
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS ${name}_bands")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_shingles")
    }
  }

  test("streamingRollup maintains a persisted per-key rollup; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-srollup").toString
    val input = MemoryStream[(String, Double)]
    val q = EventStreams.streamingRollup(input.toDF().toDF("k", "v"),
      s"$base/rollup", Seq("k"), "v", s"$base/ckpt")
    try {
      input.addData(("a", 1.0), ("a", 2.0), ("b", 10.0))
      q.processAllAvailable()
      input.addData(("a", 4.0), ("c", 7.0))
      q.processAllAvailable()
      val got = graft.operators.IncrementalAgg.finalizeState(
        spark.read.parquet(s"$base/rollup/state"), Seq("k")).orderBy("k")
      rows(got) shouldBe Seq(
        Seq("a", 3L, 7.0, 7.0 / 3, 1.0, 4.0),
        Seq("b", 1L, 10.0, 10.0, 10.0, 10.0),
        Seq("c", 1L, 7.0, 7.0, 7.0, 7.0))
    } finally q.stop()
    // replay idempotence: foreachBatch is at-least-once, so re-applying
    // the last committed batch id must be a marker-detected no-op
    val before = rows(spark.read.parquet(s"$base/rollup/state").orderBy("k"))
    val replay = Seq(("a", 4.0), ("c", 7.0)).toDF("k", "v")
    EventStreams.applyRollupBatch(replay, s"$base/rollup", 1L,
      Seq("k"), "v") shouldBe false
    rows(spark.read.parquet(s"$base/rollup/state").orderBy("k")) shouldBe before
    // a NEW batch id applies
    EventStreams.applyRollupBatch(replay, s"$base/rollup", 2L,
      Seq("k"), "v") shouldBe true
    val a = graft.operators.IncrementalAgg.finalizeState(
      spark.read.parquet(s"$base/rollup/state"), Seq("k"))
      .filter(org.apache.spark.sql.functions.col("k") === "a")
      .collect().head
    a.getLong(1) shouldBe 4L

    // crash-mid-swap, REPLAYED batch: the stranded stage carries the
    // replaying batch's own _APPLIED marker → automatic rename-in
    val root = new org.apache.hadoop.fs.Path(s"$base/rollup")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.rename(new org.apache.hadoop.fs.Path(root, "state"),
      new org.apache.hadoop.fs.Path(root, "state__stage_0123abcd"))
    EventStreams.applyRollupBatch(replay, s"$base/rollup", 2L,
      Seq("k"), "v") shouldBe true // recovered via marker, not re-folded
    val aAfter = graft.operators.IncrementalAgg.finalizeState(
      spark.read.parquet(s"$base/rollup/state"), Seq("k"))
      .filter(org.apache.spark.sql.functions.col("k") === "a")
      .collect().head
    aAfter.getLong(1) shouldBe 4L // unchanged — no double fold
    // crash-mid-swap, OLDER batch's stage: no marker for the current
    // batch id → fail loud, NOT bootstrap from one batch
    fs.rename(new org.apache.hadoop.fs.Path(root, "state"),
      new org.apache.hadoop.fs.Path(root, "state__stage_0123abcd"))
    val e = intercept[graft.model.UserException] {
      EventStreams.applyRollupBatch(replay, s"$base/rollup", 3L,
        Seq("k"), "v")
    }
    e.getMessage should include("state__stage_0123abcd")
    // manual recovery = rename the stage back in; the fold resumes
    fs.rename(new org.apache.hadoop.fs.Path(root, "state__stage_0123abcd"),
      new org.apache.hadoop.fs.Path(root, "state"))
    EventStreams.applyRollupBatch(replay, s"$base/rollup", 3L,
      Seq("k"), "v") shouldBe true
  }

  test("streamingRollup gc cadence sweeps aged healed-crash shells, keeps fresh ones") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-srgc").toString
    val input = MemoryStream[(String, Double)]
    val q = EventStreams.streamingRollup(input.toDF().toDF("k", "v"),
      s"$base/rollup", Seq("k"), "v", s"$base/ckpt", gcEveryBatches = 1)
    try {
      input.addData(("a", 1.0))
      q.processAllAvailable() // batch 0: state exists now
      // healed-crash leftover, AGED past the 24 h gate; plus a fresh
      // one that must survive (could be a concurrent writer in-flight)
      val aged = new java.io.File(s"$base/rollup/state__stage_00c0ffee")
      java.nio.file.Files.createDirectories(aged.toPath)
      java.nio.file.Files.writeString(
        aged.toPath.resolve("p.parquet"), "x")
      aged.setLastModified(1000L) shouldBe true
      val fresh = new java.io.File(s"$base/rollup/state__stage_00facade")
      java.nio.file.Files.createDirectories(fresh.toPath)
      java.nio.file.Files.writeString(
        fresh.toPath.resolve("p.parquet"), "x")
      input.addData(("a", 2.0))
      q.processAllAvailable() // batch 1: gcTick fires
      aged.exists() shouldBe false
      fresh.exists() shouldBe true
    } finally q.stop()
  }

  test("streamingRollup with distinctCol maintains approx-distinct per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-srldist").toString
    val input = MemoryStream[(String, Double, Long)]
    val q = EventStreams.streamingRollup(input.toDF().toDF("k", "v", "uid"),
      s"$base/rollup", Seq("k"), "v", s"$base/ckpt",
      distinctCol = Some("uid"))
    try {
      input.addData(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 10.0, 1L))
      q.processAllAvailable()
      // uid 2 repeats across batches: the OR-merged bitmap must not
      // double-count it; uid 3 is new
      input.addData(("a", 3.0, 2L), ("a", 4.0, 3L))
      q.processAllAvailable()
      val got = graft.operators.IncrementalAgg.finalizeState(
        spark.read.parquet(s"$base/rollup/state"), Seq("k"))
        .select("k", "n_distinct").orderBy("k")
      // at 3 values in a 2^14 bitmap the estimator is exact
      rows(got) shouldBe Seq(Seq("a", 3L), Seq("b", 1L))
    } finally q.stop()
  }

  test("streamingRollup with trackQuantiles maintains per-key quantiles across batches") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-srlq").toString
    val input = MemoryStream[(String, Double)]
    val q = EventStreams.streamingRollup(input.toDF().toDF("k", "v"),
      s"$base/rollup", Seq("k"), "v", s"$base/ckpt",
      trackQuantiles = true)
    try {
      input.addData(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0))
      q.processAllAvailable()
      input.addData(("a", 4.0), ("a", 5.0))
      q.processAllAvailable()
      val got = graft.operators.IncrementalAgg.finalizeState(
          spark.read.parquet(s"$base/rollup/state"), Seq("k"))
        .select("k", "p50", "p99").orderBy("k")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      got.length shouldBe 2
      // a holds {1..5} across the two batches: p50 ≈ 3, p99 ≈ 5,
      // each within the sketch's 1% relative error
      val (_, aP50, aP99) = got(0)
      math.abs(aP50 - 3.0) should be <= 0.03
      math.abs(aP99 - 5.0) should be <= 0.05
      val (_, bP50, _) = got(1)
      math.abs(bP50 - 10.0) should be <= 0.1
    } finally q.stop()
  }

  test("randomized differential: random insert batches through the " +
      "bucketed rollup fold equal the one-shot GROUP BY (seeded, 3 " +
      "trials, skewed keys)") {
    import graft.operators.IncrementalAgg
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(1313L)
    (0 until 3).foreach { trial =>
      val root = java.nio.file.Files.createTempDirectory("graft-brrd")
        .toString + "/rollup"
      // zipf-ish skew: key 0 dominates, some keys appear once
      val all = Seq.fill(60)((math.min(rnd.nextInt(12), rnd.nextInt(12)).toLong,
        rnd.nextInt(400) / 8.0))
      val split = all.map(r => (rnd.nextInt(4), r))
      (0 until 4).foreach { i =>
        EventStreams.applyRollupBatchBucketed(
          split.collect { case (b, r) if b == i => r }.toDF("k", "v"),
          root, i.toLong, Seq("k"), "v", nBuckets = 4)
      }
      val got = IncrementalAgg.finalizeState(
        spark.read.parquet(s"$root/state").drop("bucket"), Seq("k"))
        .orderBy("k")
      val want = IncrementalAgg.finalizeState(
        IncrementalAgg.partialState(all.toDF("k", "v"), Seq("k"), "v"),
        Seq("k")).orderBy("k")
      withClue(s"trial $trial: ") { rows(got) shouldBe rows(want) }
      // and the frontier guard took: a stale id now refuses
      intercept[graft.model.UserException] {
        EventStreams.applyRollupBatchBucketed(
          Seq((0L, 1.0)).toDF("k", "v"), root, 1L, Seq("k"), "v", 4)
      }.getMessage should include("increasing order")
    }
  }

  test("bucketed rollup: only touched buckets rewrite; replay folds only unlanded buckets") {
    import graft.operators.IncrementalAgg
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-brollup").toString
    val statePath = s"$base/rollup"
    val nB = 8
    // enough distinct keys to populate several buckets
    val b0 = (1 to 80).map(i => (s"k${i % 20}", i * 1.0)).toDF("k", "v")
    EventStreams.applyRollupBatchBucketed(b0, statePath, 0L,
      Seq("k"), "v", nB) should not be empty
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def bucketFiles(b: Int): Map[String, Long] = {
      val p = new org.apache.hadoop.fs.Path(s"$statePath/state/bucket=$b")
      if (!fs.exists(p)) Map.empty
      else fs.listStatus(p).toSeq
        .map(st => st.getPath.getName -> st.getModificationTime).toMap
    }
    val allBuckets = (0 until nB).filter(b =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$statePath/state/bucket=$b")))
    allBuckets.size should be > 2 // keys actually spread
    // batch 2 touches exactly one key → one bucket
    val before = allBuckets.map(b => b -> bucketFiles(b)).toMap
    val b1 = Seq(("k3", 100.0)).toDF("k", "v")
    val swapped = EventStreams.applyRollupBatchBucketed(b1, statePath, 1L,
      Seq("k"), "v", nB)
    swapped should have size 1
    // untouched buckets: byte-identical files (same names, same mtimes)
    allBuckets.filterNot(swapped.contains).foreach { b =>
      bucketFiles(b) shouldBe before(b)
    }
    // replay of the same batch id is a no-op (marker in the bucket)
    EventStreams.applyRollupBatchBucketed(b1, statePath, 1L,
      Seq("k"), "v", nB) shouldBe empty
    // state equals the one-shot aggregate over everything
    val oneShot = IncrementalAgg.finalizeState(
      IncrementalAgg.partialState(b0.unionByName(b1), Seq("k"), "v"),
      Seq("k")).orderBy("k")
    val got = IncrementalAgg.finalizeState(
      spark.read.parquet(s"$statePath/state").drop("bucket"), Seq("k"))
      .orderBy("k")
    rows(got) shouldBe rows(oneShot)
    // crash-mid-swap, REPLAYED batch: the stranded bucket carries the
    // replaying batch's own marker → automatic rename-in recovery
    val root = new org.apache.hadoop.fs.Path(statePath)
    val victim = swapped.head
    val stage = new org.apache.hadoop.fs.Path(root, "state__stage_0123abcd")
    fs.mkdirs(stage)
    fs.rename(new org.apache.hadoop.fs.Path(root, s"state/bucket=$victim"),
      new org.apache.hadoop.fs.Path(stage, s"bucket=$victim"))
    EventStreams.applyRollupBatchBucketed(b1, statePath, 1L,
      Seq("k"), "v", nB) shouldBe Seq(victim) // recovered, not re-folded
    rows(IncrementalAgg.finalizeState(
      spark.read.parquet(s"$statePath/state").drop("bucket"), Seq("k"))
      .orderBy("k")) shouldBe rows(oneShot) // values unchanged
    // crash-mid-swap, OLDER batch's stage: no marker for the current
    // batch → refuse loud (folding over it would drop history)
    fs.rename(new org.apache.hadoop.fs.Path(root, s"state/bucket=$victim"),
      new org.apache.hadoop.fs.Path(stage, s"bucket=$victim"))
    val e = intercept[graft.model.UserException] {
      EventStreams.applyRollupBatchBucketed(b1, statePath, 2L,
        Seq("k"), "v", nB)
    }
    e.getMessage should include("stranded stage")
    fs.rename(new org.apache.hadoop.fs.Path(stage, s"bucket=$victim"),
      new org.apache.hadoop.fs.Path(root, s"state/bucket=$victim"))
    EventStreams.applyRollupBatchBucketed(b1, statePath, 2L,
      Seq("k"), "v", nB) should have size 1
    // a changed bucket function must fail loud, not corrupt the layout
    val cfg = intercept[graft.model.UserException] {
      EventStreams.applyRollupBatchBucketed(b1, statePath, 3L,
        Seq("k"), "v", nB * 2)
    }
    cfg.getMessage should include("layout")
  }

  test("compactRollupStateTo carries the monotone frontier: fresh " +
      "buckets seed _APPLIED_<last> and _LAST_BATCH copies over, so a " +
      "pre-compaction replay no-ops or refuses exactly as at the old " +
      "root; a crash-stranded _LAST_BATCH is reclaimed on retry") {
    import graft.operators.IncrementalAgg
    val base = java.nio.file.Files.createTempDirectory("graft-rcomp").toString
    val statePath = s"$base/rollup"
    val fresh = s"$base/rollup_v2"
    // batches 3 then 7 — the guard state to preserve is last=7
    for (b <- Seq(3, 7))
      EventStreams.applyRollupBatchBucketed(
        Seq(("k1", b.toDouble), ("k2", 1.0)).toDF("k", "v"),
        statePath, b.toLong, Seq("k"), "v", 4) should not be empty
    EventStreams.compactRollupStateTo(spark, statePath, fresh) shouldBe 2L
    val fs = new org.apache.hadoop.fs.Path(fresh)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // per-bucket markers seed the SOURCE frontier, not _APPLIED_0
    val buckets = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$fresh/state")).toSeq
      .map(_.getPath).filter(_.getName.startsWith("bucket="))
    buckets should not be empty
    buckets.foreach { b =>
      fs.exists(new org.apache.hadoop.fs.Path(b, "_APPLIED_7")) shouldBe true
    }
    // replay of the frontier id: quiet per-bucket no-op, NOT a refold
    EventStreams.applyRollupBatchBucketed(
      Seq(("k1", 999.0)).toDF("k", "v"), fresh, 7L,
      Seq("k"), "v", 4) shouldBe empty
    // an OLDER pre-compaction id refuses loud at the carried frontier
    intercept[graft.model.UserException] {
      EventStreams.applyRollupBatchBucketed(
        Seq(("k1", 999.0)).toDF("k", "v"), fresh, 3L, Seq("k"), "v", 4)
    }.getMessage should include("below the last committed batch")
    // fresher ids continue, totals exact
    EventStreams.applyRollupBatchBucketed(
      Seq(("k1", 100.0)).toDF("k", "v"), fresh, 8L,
      Seq("k"), "v", 4) should have size 1
    IncrementalAgg.finalizeState(
      spark.read.parquet(s"$fresh/state").drop("bucket"), Seq("k"))
      .filter(org.apache.spark.sql.functions.col("k") === "k1")
      .head.getAs[Double]("total") shouldBe 110.0
    // crash window: a stranded _LAST_BATCH (written before the state
    // rename) must be reclaimed by the retry, not poison it
    val fresh2 = s"$base/rollup_v3"
    val f2 = new org.apache.hadoop.fs.Path(fresh2)
    fs.mkdirs(f2)
    graft.sources.PartitionedStore.pinLayout(fs, f2, fresh2,
      "4|stale|stale")
    val out = fs.create(new org.apache.hadoop.fs.Path(f2, "_LAST_BATCH"),
      true)
    out.write("99".getBytes("UTF-8")); out.close()
    EventStreams.compactRollupStateTo(spark, statePath, fresh2) shouldBe 2L
    EventStreams.readLastBatch(fs, f2) shouldBe Some(7L)
  }

  test("streamingIngestDedup fails loud on orphaned index files (catalog-less restart)") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-srestart").toString
    val name = s"graft_mh_orphan_${System.nanoTime}"
    // simulate the restart wreckage: index FILES in the warehouse,
    // no catalog entry (a prior JVM's managed tables after an
    // in-memory catalog went away)
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sessionState.newHadoopConf())
    val orphan = new org.apache.hadoop.fs.Path(wh, s"${name}_bands".toLowerCase)
    fs.mkdirs(orphan)
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.DocumentStreams.streamingIngestDedup(
      input.toDF().toDF("doc_id", "text"), name, s"$base/corpus",
      "doc_id", "text", checkpointDir = s"$base/ckpt")
    try {
      input.addData((1L, "some document text alpha beta"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      // bootstrapping over the orphan would silently rebuild the index
      // from one batch (re-admitting every prior accepted doc's dups)
      // — the gate must surface the operator error instead
      val chain = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString("\n")
      chain should include(name)
      chain should include("no catalog entry")
    } finally {
      q.stop()
      fs.delete(orphan, true)
    }
  }

  test("streamingIngestEmbeddings: IVF-gated continuous vector ingest") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-semb").toString
    // one 8-dim block spikes at 5.0; distinct blocks are near-orthogonal
    def blockVec(block: Int, seed: Int): Array[Float] = {
      val rnd = new scala.util.Random(seed)
      Array.tabulate(64)(d =>
        (if (d >= 8 * block && d < 8 * block + 8) 5.0f else 0.0f) +
          rnd.nextFloat() * 0.01f)
    }
    val input = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.DocumentStreams.streamingIngestEmbeddings(
      input.toDF().toDF("vec_id", "embedding"), s"$base/index",
      s"$base/corpus", "vec_id", "embedding",
      checkpointDir = s"$base/ckpt", nCentroids = 4, trainIters = 2,
      compactEvery = 2, maxFilesPerList = 1)
    def corpusIds: Set[Long] = spark.read.parquet(s"$base/corpus")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    try {
      // batch 1 (bootstrap): 5 is vector-identical to 1 → in-batch drop
      input.addData((1L, blockVec(0, 1)), (2L, blockVec(1, 2)),
        (3L, blockVec(2, 3)), (4L, blockVec(3, 4)), (5L, blockVec(0, 1)))
      q.processAllAvailable()
      corpusIds shouldBe Set(1L, 2L, 3L, 4L)

      // batch 2: 10 duplicates INDEXED 2 → dropped; 11 is a new block
      input.addData((10L, blockVec(1, 2)), (11L, blockVec(4, 11)))
      q.processAllAvailable()
      corpusIds shouldBe Set(1L, 2L, 3L, 4L, 11L)

      // batch 3: a dup of batch 2's survivor is caught — the index
      // grew by the accepted vectors, not just the bootstrap set
      input.addData((20L, blockVec(4, 11)))
      q.processAllAvailable()
      corpusIds shouldBe Set(1L, 2L, 3L, 4L, 11L)

      // the in-stream compaction cadence (every 2 batches, threshold 1
      // file per list) kept the touched lists collapsed: no list holds
      // more than 2 files (one compacted + at most one fresh append)
      val dirs = Option(new java.io.File(s"$base/index/assignments")
        .listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("centroid="))
      dirs should not be empty
      dirs.foreach { d =>
        Option(d.listFiles()).toSeq.flatten
          .count(_.getName.endsWith(".parquet")) should be <= 2
      }
    } finally q.stop()
  }

  test("streamingPipeline: per-batch curation, step-checkpoint GC, replay reuses steps") {
    implicit val sqlCtx = spark.sqlContext
    import graft.model.{PipelineConfig, PipelineStep}
    val base = java.nio.file.Files.createTempDirectory("graft-spipe").toString
    val p = PipelineConfig(input = "unused-by-streaming", output = "out",
      steps = Seq(PipelineStep.LangFilter(Seq("en")), PipelineStep.DedupExact))
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.DocumentStreams.streamingPipeline(
      input.toDF().toDF("doc_id", "text"), p, base, s"$base/ckpt")
    def outIds: Set[Long] = spark.read.parquet(s"$base/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    try {
      // batch 0: doc 2 exact-dups doc 1, doc 3 fails the en filter
      input.addData(
        (1L, "the cat is on the mat and a dog is in the house"),
        (2L, "the cat is on the mat and a dog is in the house"),
        (3L, "der hund ist nicht ein tier und das haus ist gross"))
      q.processAllAvailable()
      outIds shouldBe Set(1L)
      new java.io.File(s"$base/ckpt/steps/batch_0").exists() shouldBe true

      // batch 1 lands under its own partition; batch 0 can never
      // replay once 1 commits → its step checkpoints are GC'd
      input.addData((4L, "a boat of the sea is to sail in the wind and sun"))
      q.processAllAvailable()
      outIds shouldBe Set(1L, 4L)
      new java.io.File(s"$base/ckpt/steps/batch_0").exists() shouldBe false
      new java.io.File(s"$base/ckpt/steps/batch_1").exists() shouldBe true
    } finally q.stop()

    // at-least-once replay of batch 1 (same batch_id, same rows):
    // every step checkpoint REUSES (part files untouched) and the
    // partition overwrite is idempotent — same documents, no dups
    def stepFiles: Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$base/ckpt/steps/batch_1"))
        .filter(_.getName.startsWith("part-"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = stepFiles
    before should not be empty
    graft.app.Pipeline.runMicroBatch(
      Seq((4L, "a boat of the sea is to sail in the wind and sun"))
        .toDF("doc_id", "text"),
      p, base, Some(s"$base/ckpt/steps"), 1L)
    stepFiles shouldBe before
    outIds shouldBe Set(1L, 4L)
    spark.read.parquet(s"$base/out").count() shouldBe 2L
  }

  test("streamingTouchPairs: stream-stream interval join matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val out = EventStreams.streamingTouchPairs(input.toDF(),
      Seq("click", "view"), "purchase", "2 hours", "1 hour")
    val q = out.writeStream.format("memory").queryName("touch_pairs")
      .outputMode(OutputMode.Append()).start()
    try {
      val evs = Seq(
        Event(1, ts(0), 1, "click", 0.0),
        Event(2, ts(30), 1, "view", 0.0),
        Event(4, ts(10), 2, "click", 0.0), // other user: not credited
        Event(5, ts(60), 1, "error", 0.0)) // non-touch type: ignored
      val conv = Event(3, ts(90), 1, "purchase", 30.0)
      input.addData(evs: _*)
      q.processAllAvailable()
      input.addData(conv) // conversion arrives in a LATER micro-batch
      q.processAllAvailable()
      val got = spark.table("touch_pairs")
        .select("conv_id", "touch_id", "touch_type").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      got shouldBe Set((3L, 1L, "click"), (3L, 2L, "view"))
      // batch twin agrees on the matched pairs
      val batch = graft.operators.Attribution.touchPairs(
        spark.createDataset(evs :+ conv).toDF(),
        Seq("click", "view"), "purchase", 2L * 3600000000L)
        .select("conv_id", "touch_id", "touch_type").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      batch shouldBe got
    } finally q.stop()
  }

  test("streamingTouchPairs: watermark-late rows join nothing") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val out = EventStreams.streamingTouchPairs(input.toDF(),
      Seq("click", "view"), "purchase", "2 hours", "1 hour")
    val q = out.writeStream.format("memory").queryName("touch_pairs_late")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 0.0))
      q.processAllAvailable()
      // advance both watermarks far past ts(0)+lookback+delay
      input.addData(Event(2, ts(60 * 100 - 30), 2, "click", 0.0),
        Event(3, ts(60 * 100), 2, "purchase", 1.0))
      q.processAllAvailable()
      // this conversion's event time is deep below the watermark: the
      // matching touch state is gone (and the row itself is late) —
      // nothing for user 1 may appear
      input.addData(Event(4, ts(30), 1, "purchase", 9.0))
      q.processAllAvailable()
      val users = spark.table("touch_pairs_late")
        .select("conv_id").collect().map(_.getLong(0)).toSet
      users shouldBe Set(3L)
    } finally q.stop()
  }

  test("streamingLastTouch: chained join+aggregation emits closed conversions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val out = EventStreams.streamingLastTouch(input.toDF(),
      Seq("click", "view"), "purchase", "2 hours", "1 hour", "1 hour")
    val q = out.writeStream.format("memory").queryName("last_touch")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 0.0),
        Event(2, ts(30), 1, "view", 0.0),
        Event(3, ts(45), 1, "click", 0.0),
        Event(4, ts(50), 1, "purchase", 90.0))
      q.processAllAvailable()
      // push the watermark beyond the conversion's window end so the
      // chained aggregation finalizes and emits. The global watermark
      // is the MIN across both branch watermarks, and each branch only
      // sees its own event types — so the pusher batch needs BOTH a
      // far-future touch AND a far-future conversion (joining nothing);
      // and it takes two micro-batches to cross the two stateful
      // operators (watermarks advance at batch boundaries)
      input.addData(Event(9, ts(60 * 200), 7, "view", 0.0),
        Event(10, ts(60 * 200), 8, "purchase", 0.0))
      q.processAllAvailable()
      input.addData(Event(11, ts(60 * 201), 7, "view", 0.0),
        Event(12, ts(60 * 201), 8, "purchase", 0.0))
      q.processAllAvailable()
      val got = spark.table("last_touch")
        .select("conv_id", "value", "n_touches", "last_touch_id",
          "last_touch_type").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
          r.getString(4)))
      got.toSeq shouldBe Seq((4L, 90.0, 3L, 3L, "click"))
    } finally q.stop()
  }

  test("streamingCdcRollup: cross-batch updates/deletes retract the " +
      "persisted state per micro-batch; restart replay is a no-op") {
    import graft.operators.CdcRollup
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-scdcr").toString
    val statePath = s"$base/state"
    val input = MemoryStream[(Long, String, Double, Long, String)]
    val df = input.toDF().toDF("id", "grp", "v", "seq", "op")
    def run() = EventStreams.streamingCdcRollup(df, Seq("id"), "seq",
      "op", Seq("grp"), Seq("v"), statePath, s"$base/ckpt",
      nBaseBuckets = 4, nAggBuckets = 2)
    val q = run()
    def view(): Map[String, (Long, Double)] =
      CdcRollup.readView(spark, statePath).map(_.collect().map(r =>
        r.getAs[String]("grp") -> ((r.getAs[Long]("n"),
          r.getAs[java.math.BigDecimal]("total").doubleValue()))).toMap)
        .getOrElse(Map.empty)
    try {
      input.addData((1L, "a", 10.0, 1L, "I"), (2L, "a", 20.0, 1L, "I"))
      q.processAllAvailable()
      view() shouldBe Map("a" -> ((2L, 30.0)))
      // next micro-batch: cross-batch group-moving update + delete
      input.addData((1L, "b", 11.0, 2L, "U"), (2L, "a", 0.0, 2L, "D"))
      q.processAllAvailable()
      view() shouldBe Map("b" -> ((1L, 11.0)))
    } finally q.stop()
    // a replayed committed batch id through the SHARED fold: no-op
    CdcRollup.foldBatch(statePath, 1L,
      Seq((9L, "z", 99.0, 1L, "I")).toDF("id", "grp", "v", "seq", "op"),
      Seq("id"), "seq", "op", Seq("grp"), Seq("v"), 4, 2) shouldBe false
    view() shouldBe Map("b" -> ((1L, 11.0)))
    // restart from the checkpoint: state unchanged, new data folds
    val q2 = run()
    try {
      input.addData((3L, "b", 5.0, 1L, "I"))
      q2.processAllAvailable()
      view() shouldBe Map("b" -> ((2L, 16.0)))
    } finally q2.stop()
  }

  test("streamingCdcRollup GC cadence: AGED markers fold into the " +
      "watermark as the stream runs (the default 24h gate folds " +
      "nothing fresh — replay-window ids keep per-id markers); the " +
      "view stays correct and later batches keep folding") {
    import graft.operators.CdcRollup
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-scdcg").toString
    val statePath = s"$base/state"
    val input = MemoryStream[(Long, String, Double, Long, String)]
    val df = input.toDF().toDF("id", "grp", "v", "seq", "op")
    // gcOlderThanMs = 0 so the test can watch a fold happen at all;
    // the production default (24 h) is pinned by the CdcRollupSpec
    // age-gate spec — fresh ids keep their markers there
    val q = EventStreams.streamingCdcRollup(df, Seq("id"), "seq",
      "op", Seq("grp"), Seq("v"), statePath, s"$base/ckpt",
      nBaseBuckets = 4, nAggBuckets = 2, gcEveryBatches = 1,
      gcOlderThanMs = 0L)
    try {
      input.addData((1L, "a", 1.0, 1L, "I"))
      q.processAllAvailable()
      input.addData((2L, "a", 2.0, 1L, "I"))
      q.processAllAvailable() // batch 1 folds, then the GC tick fires
      val fs = new org.apache.hadoop.fs.Path(statePath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val names = fs.listStatus(new org.apache.hadoop.fs.Path(statePath))
        .map(_.getPath.getName).toSet
      names should contain("_APPLIED_UPTO_1")
      names.filter(_.matches("_APPLIED_\\d+")) shouldBe empty
      input.addData((1L, "a", 1.5, 2L, "U")) // fold past the watermark
      q.processAllAvailable()
      val got = CdcRollup.readView(spark, statePath).get.collect()
      got.length shouldBe 1
      got.head.getAs[Long]("n") shouldBe 2L
      got.head.getAs[java.math.BigDecimal]("total")
        .doubleValue() shouldBe 3.5
    } finally q.stop()
  }

  test("streamingCdcRollup with retainMs: every micro-batch's " +
      "snapshot stays servable as the stream runs; restart replay " +
      "never moves the floor; a zero window reaps on the GC tick " +
      "and advances the floor honestly") {
    import graft.operators.CdcRollup
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-scdca").toString
    val statePath = s"$base/state"
    val input = MemoryStream[(Long, String, Double, Long, String)]
    val df = input.toDF().toDF("id", "grp", "v", "seq", "op")
    def run(retain: Long, gcEvery: Int = 64) =
      EventStreams.streamingCdcRollup(df, Seq("id"), "seq",
        "op", Seq("grp"), Seq("v"), statePath, s"$base/ckpt",
        nBaseBuckets = 4, nAggBuckets = 2, gcEveryBatches = gcEvery,
        gcOlderThanMs = 0L, retainMs = Some(retain))
    def asOf(a: Long): Map[String, (Long, Double)] =
      CdcRollup.readViewAsOf(spark, statePath, a)
        .map(_.collect().map(r =>
          r.getAs[String]("grp") -> ((r.getAs[Long]("n"),
            r.getAs[java.math.BigDecimal]("total").doubleValue())))
          .toMap).getOrElse(Map.empty)
    val q = run(retain = 24L * 3600 * 1000)
    try {
      input.addData((1L, "a", 10.0, 1L, "I"))
      q.processAllAvailable()
      input.addData((1L, "a", 25.0, 2L, "U"), (2L, "b", 5.0, 2L, "I"))
      q.processAllAvailable()
      // the sink enabled retention BEFORE batch 0: floor -1, both
      // micro-batch snapshots servable
      CdcRollup.asofFloor(spark, statePath) shouldBe Some(-1L)
      asOf(0L) shouldBe Map("a" -> ((1L, 10.0)))
      asOf(1L) shouldBe Map("a" -> ((1L, 25.0)), "b" -> ((1L, 5.0)))
    } finally q.stop()
    // restart from the checkpoint: enableRetention is idempotent —
    // the floor stays put and history keeps accreting
    val q2 = run(retain = 0L, gcEvery = 1)
    try {
      input.addData((2L, "b", 7.0, 3L, "U"))
      q2.processAllAvailable() // batch 2 folds; GC tick reaps at 0ms
      CdcRollup.asofFloor(spark, statePath).get should be >= 1L
      asOf(2L) shouldBe Map("a" -> ((1L, 25.0)), "b" -> ((1L, 7.0)))
      // the reaped snapshot refuses loud instead of serving wrong
      intercept[IllegalArgumentException] { asOf(0L) }
        .getMessage should include("floor")
    } finally q2.stop()
  }

  test("streamingJoinView: tagged bus folds per micro-batch; replay " +
      "byte-stable; unknown tag fails loud") {
    import graft.operators.JoinView
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-sjview").toString
    val statePath = s"$base/view"
    // one bus, two tables: side a = (k, price), side b = (k, qty);
    // the unused column of the other side rides as a dummy and is
    // projected away by the sink
    val input = MemoryStream[(String, Long, Double, Double)]
    val df = input.toDF().toDF("side", "k", "price", "qty")
    val q = EventStreams.streamingJoinView(df, "side",
      aCols = Seq("k", "price"), bCols = Seq("k", "qty"),
      key = "k", statePath = statePath, checkpointDir = s"$base/ckpt")
    try {
      // batch 0: a-rows for keys 1,2 and a b-row for key 1 (new×new)
      input.addData(("a", 1L, 10.0, -1.0), ("a", 2L, 20.0, -1.0),
        ("b", 1L, -1.0, 5.0))
      q.processAllAvailable()
      // batch 1: b-rows for keys 1,2 (old×new both sides), a-row 3
      input.addData(("b", 1L, -1.0, 6.0), ("b", 2L, -1.0, 7.0),
        ("a", 3L, 30.0, -1.0))
      q.processAllAvailable()
      val view = JoinView.readCommittedView(spark, statePath).get
      rows(view.orderBy("k", "qty")) shouldBe Seq(
        Seq(1L, 10.0, 5.0), Seq(1L, 10.0, 6.0), Seq(2L, 20.0, 7.0))
      // replay of a committed batch id: the marker makes the refold a
      // no-op — state files byte-identical (names + mtimes)
      val fs = new org.apache.hadoop.fs.Path(statePath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      def stateFiles(): Map[String, Long] = {
        val it = fs.listFiles(new org.apache.hadoop.fs.Path(statePath), true)
        val m = scala.collection.mutable.Map[String, Long]()
        while (it.hasNext) { val st = it.next()
          m += st.getPath.toString -> st.getModificationTime }
        m.toMap
      }
      val before = stateFiles()
      JoinView.foldBatchDirs(statePath, 1L, "k",
        Seq((9L, 99.0)).toDF("k", "price"),
        Seq((9L, 98.0)).toDF("k", "qty")) shouldBe false
      stateFiles() shouldBe before
      // a third delta through the SHARED protocol (the CLI face uses
      // the same fold): view stays consistent with the one-shot join
      JoinView.foldBatchDirs(statePath, 2L, "k",
        spark.emptyDataFrame.select(lit(0L).as("k"), lit(0.0).as("price"))
          .limit(0),
        Seq((3L, 8.0)).toDF("k", "qty")) shouldBe true
      JoinView.readCommittedView(spark, statePath).get
        .filter(col("k") === 3L).count() shouldBe 1L
    } finally q.stop()

    // unknown side tag: the batch fails LOUD instead of dropping rows
    val input2 = MemoryStream[(String, Long, Double, Double)]
    val df2 = input2.toDF().toDF("side", "k", "price", "qty")
    val q2 = EventStreams.streamingJoinView(df2, "side",
      aCols = Seq("k", "price"), bCols = Seq("k", "qty"),
      key = "k", statePath = s"$base/view2",
      checkpointDir = s"$base/ckpt2")
    try {
      input2.addData(("z", 1L, 1.0, 1.0))
      val e = intercept[Exception] { q2.processAllAvailable() }
      val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.toString
      msg should include("side tag")
    } finally q2.stop()

    // NULL side tag: `isin` yields NULL and a bare `!isin` filter
    // would DROP the row — the audit must be null-safe, so a
    // NULL-tagged row fails the batch loud like any unknown tag
    val input3 = MemoryStream[(String, Long, Double, Double)]
    val df3 = input3.toDF().toDF("side", "k", "price", "qty")
    val q3 = EventStreams.streamingJoinView(df3, "side",
      aCols = Seq("k", "price"), bCols = Seq("k", "qty"),
      key = "k", statePath = s"$base/view3",
      checkpointDir = s"$base/ckpt3")
    try {
      input3.addData((null.asInstanceOf[String], 1L, 1.0, 1.0))
      val e = intercept[Exception] { q3.processAllAvailable() }
      val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.toString
      msg should include("side tag")
    } finally q3.stop()
  }

  test("fold manifest: the group-commit witness for one bus feeding " +
      "N roots — commit verifies every root's own evidence, a crash " +
      "between roots refuses loud, and consumers capped at the group " +
      "frontier never see a mixed read") {
    import graft.operators.{CdcRollup, FoldManifest, JoinView}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-manifest").toString
    val cdc = s"$dir/cdc"; val jv = s"$dir/join"; val m = s"$dir/mf"
    CdcRollup.enableRetention(spark, cdc) shouldBe -1L
    def cdcFold(id: Long, rows: Seq[(Long, String, Double)]): Boolean =
      CdcRollup.foldBatch(cdc, id,
        rows.map { case (k, g, v) => (k, g, v, id + 1, "I") }
          .toDF("id", "grp", "v", "seq", "op"),
        Seq("id"), "seq", "op", Seq("grp"), Seq("v"), 2, 2)
    // batch 0 into BOTH roots, then the group commit witnesses it
    cdcFold(0L, Seq((1L, "a", 1.0))) shouldBe true
    JoinView.foldBatchDirs(jv, 0L, "k",
      Seq((1L, 1.0)).toDF("k", "p"),
      Seq((1L, 2.0)).toDF("k", "q"), nBuckets = 2) shouldBe true
    FoldManifest.commit(spark, m, 0L, Seq(cdc, jv)) shouldBe true
    FoldManifest.frontier(spark, m) shouldBe Some(0L)
    // replaying a committed group id is a quiet no-op
    FoldManifest.commit(spark, m, 0L, Seq(cdc, jv)) shouldBe false
    // CRASH BETWEEN ROOTS: batch 1 lands in the cdc root only — the
    // group commit refuses loud instead of blessing a mixed read
    cdcFold(1L, Seq((2L, "b", 2.0))) shouldBe true
    intercept[IllegalStateException] {
      FoldManifest.commit(spark, m, 1L, Seq(cdc, jv))
    }.getMessage should include("has NOT committed")
    // the group frontier stays 0: a consumer capping its pull there
    // reads batch 0's snapshot from EVERY view — consistent — even
    // though the cdc root is already at 1
    FoldManifest.frontier(spark, m) shouldBe Some(0L)
    val (pull0, to0) = CdcRollup.readViewSincePinned(spark, cdc, 0L,
      upTo = FoldManifest.frontier(spark, m))
    to0 shouldBe 0L
    pull0.count() shouldBe 0L
    // recovery = the at-least-once replay: the already-applied root
    // no-ops, the lagging root catches up, the witness lands
    cdcFold(1L, Seq((2L, "b", 2.0))) shouldBe false
    JoinView.foldBatchDirs(jv, 1L, "k",
      Seq((2L, 3.0)).toDF("k", "p"),
      Seq((2L, 4.0)).toDF("k", "q"), nBuckets = 2) shouldBe true
    FoldManifest.commit(spark, m, 1L, Seq(cdc, jv)) shouldBe true
    val (pull1, to1) = CdcRollup.readViewSincePinned(spark, cdc, 0L,
      upTo = FoldManifest.frontier(spark, m))
    to1 shouldBe 1L
    pull1.count() shouldBe 1L // group b appeared in (0, 1]
    // a drifted root set refuses on the pin; an out-of-order group id
    // refuses on the monotone contract; a cap ahead of the root's own
    // frontier refuses (a reset root)
    intercept[graft.model.UserException] {
      FoldManifest.commit(spark, m, 2L, Seq(cdc))
    }
    cdcFold(3L, Seq((3L, "c", 3.0))) shouldBe true
    JoinView.foldBatchDirs(jv, 3L, "k",
      Seq((3L, 5.0)).toDF("k", "p"),
      Seq((3L, 6.0)).toDF("k", "q"), nBuckets = 2) shouldBe true
    FoldManifest.commit(spark, m, 3L, Seq(cdc, jv)) shouldBe true
    intercept[IllegalArgumentException] {
      FoldManifest.commit(spark, m, 2L, Seq(cdc, jv))
    }.getMessage should include("out of order")
    intercept[IllegalArgumentException] {
      CdcRollup.readViewSincePinned(spark, cdc, 0L, upTo = Some(9L))
    }.getMessage should include("AHEAD of the committed frontier")
  }

  test("streamingMultiView: one micro-batch bus folds into N roots " +
      "then group-commits through a real foreachBatch loop; a crash " +
      "BETWEEN roots restart-replays each root as its own no-op, and " +
      "manifest-gated consumers never observe a mixed frontier") {
    import graft.operators.{CdcRollup, FoldManifest}
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-smv").toString
    val cdc = s"$base/cdc"; val roll = s"$base/roll"; val m = s"$base/mf"
    CdcRollup.enableRetention(spark, cdc) shouldBe -1L
    // the injected crash: the SECOND root's fold throws exactly once,
    // after the first root already committed — the between-roots shape
    @volatile var failOnce = false
    def cdcFold(df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      CdcRollup.foldBatch(cdc, id, df,
        Seq("id"), "seq", "op", Seq("grp"), Seq("v"), 2, 2)
      ()
    }
    def rollFold(df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      if (failOnce) { failOnce = false
        throw new RuntimeException("injected crash between roots")
      }
      EventStreams.applyRollupBatchBucketed(
        df.select($"grp", $"v"), roll, id, Seq("grp"), "v", 2)
      ()
    }
    val input = MemoryStream[(Long, String, Double, Long, String)]
    def start() = EventStreams.streamingMultiView(
      input.toDF().toDF("id", "grp", "v", "seq", "op"), m,
      Seq(cdc -> (cdcFold _), roll -> (rollFold _)),
      checkpointDir = s"$base/ckpt")
    val q = start()
    try {
      input.addData((1L, "a", 1.0, 1L, "I"))
      q.processAllAvailable()
      FoldManifest.frontier(spark, m) shouldBe Some(0L)
      // batch 1 crashes BETWEEN the roots: cdc folds it, roll never
      // does, the group marker never lands
      failOnce = true
      input.addData((2L, "b", 2.0, 2L, "I"))
      intercept[Exception] { q.processAllAvailable() }
    } finally q.stop()
    // inside the crash window the group frontier holds at 0 — a
    // consumer capping there reads batch 0's snapshot from EVERY
    // view, even though the cdc root is already at 1
    FoldManifest.frontier(spark, m) shouldBe Some(0L)
    val (mid, to0) = CdcRollup.readViewSincePinned(spark, cdc, 0L,
      upTo = FoldManifest.frontier(spark, m))
    to0 shouldBe 0L
    mid.count() shouldBe 0L
    // restart from the SAME checkpoint: batch 1 replays — the cdc
    // fold no-ops under its own marker, the rollup catches up, the
    // group marker lands; the stream then continues normally
    val q2 = start()
    try {
      q2.processAllAvailable()
      FoldManifest.frontier(spark, m) shouldBe Some(1L)
      input.addData((3L, "c", 3.0, 3L, "I"))
      q2.processAllAvailable()
      FoldManifest.frontier(spark, m) shouldBe Some(2L)
    } finally q2.stop()
    // both roots converged — no double-fold anywhere: the cdc view
    // and the rollup state agree with the one-shot expectation
    CdcRollup.readView(spark, cdc).get.count() shouldBe 3L
    rows(graft.operators.IncrementalAgg.finalizeState(
      spark.read.parquet(s"$roll/state").drop("bucket"), Seq("grp"))
      .select($"grp", $"n", $"total".cast("double"))
      .orderBy("grp")) shouldBe Seq(
      Seq("a", 1L, 1.0), Seq("b", 1L, 2.0), Seq("c", 1L, 3.0))
  }

  test("fold manifest: rollup member evidence is POST-swap — a fold " +
      "crashed between its _LAST_BATCH advance and its bucket swap " +
      "refuses the witness (the frontier alone overstates), fsck " +
      "names a witness minted past the evidence, and the replay " +
      "recovery clears both") {
    import graft.operators.{BatchMarkers, FoldManifest}
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mf-rollup").toString
    val real = s"$dir/rollup"; val twin = s"$dir/twin"; val m = s"$dir/mf"
    def b(kv: (String, Double)*) = kv.toSeq.toDF("k", "v")
    def foldInto(root: String, id: Long, d: org.apache.spark.sql.DataFrame) =
      EventStreams.applyRollupBatchBucketed(d, root, id, Seq("k"), "v", 1)
    foldInto(real, 0L, b("a" -> 1.0))
    foldInto(twin, 0L, b("a" -> 1.0))
    FoldManifest.commit(spark, m, 0L, Seq(real)) shouldBe true
    // batch 1 completes on a twin; on the real root reproduce the
    // crash BETWEEN the _LAST_BATCH advance and the bucket swap: the
    // frontier reads 1, the batch's bucket (marker included) still
    // sits in a stranded stage, the live state is batch 0's
    foldInto(twin, 1L, b("b" -> 2.0))
    val fs = new Path(real)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val stage = new Path(real, "state__stage_deadbeef")
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new Path(twin, "state/bucket=0"), fs,
      new Path(stage, "bucket=0"), false,
      spark.sessionState.newHadoopConf()) shouldBe true
    locally {
      val out = fs.create(new Path(real, "_LAST_BATCH"), true)
      out.write("1".getBytes("UTF-8")); out.close()
    }
    EventStreams.readLastBatch(fs, new Path(real)) shouldBe Some(1L)
    EventStreams.rollupBatchApplied(fs, new Path(real), 1L) shouldBe false
    // the rollup root's OWN fsck names the shape as an error
    graft.app.ViewFsck.fsckJson(spark, real) should
      include("frontier advance and its bucket swap")
    // bare `_LAST_BATCH >= id` would witness batch 1 right here; the
    // post-swap evidence refuses instead of blessing the mixed read
    intercept[IllegalStateException] {
      FoldManifest.commit(spark, m, 1L, Seq(real))
    }.getMessage should include("has NOT committed")
    // a witness minted past the evidence is exactly what fsck's
    // overstatement audit names
    BatchMarkers.commit(fs, new Path(m), 1L)
    graft.app.ViewFsck.fsckJson(spark, m) should
      include("bucket swap did not finish")
    // recovery = the at-least-once replay of the same fold: the
    // bucket re-folds from the live batch-0 state (the stranded copy
    // is superseded garbage gc sweeps later) and the swap completes
    foldInto(real, 1L, b("b" -> 2.0))
    EventStreams.rollupBatchApplied(fs, new Path(real), 1L) shouldBe true
    (graft.app.ViewFsck.fsckJson(spark, real) should not).
      include("frontier advance and its bucket swap")
    (graft.app.ViewFsck.fsckJson(spark, m) should not).
      include("bucket swap did not finish")
    rows(spark.read.parquet(s"$real/state").drop("bucket")
      .orderBy("k")) shouldBe
      rows(spark.read.parquet(s"$twin/state").drop("bucket").orderBy("k"))
    // a frontier STRICTLY ahead needs no stage check: the stale
    // stage still holds batch 1's marker, but batch 2's commit
    // proves batch 1's fold returned
    foldInto(real, 2L, b("c" -> 3.0))
    FoldManifest.commit(spark, m, 2L, Seq(real)) shouldBe true
  }
}
