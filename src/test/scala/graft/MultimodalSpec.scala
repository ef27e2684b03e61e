package graft

import graft.operators.Multimodal
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._

object MultimodalSpec {
  // local[_] runs executors in this JVM, so a static counter observes
  // per-partition decoder lifecycle
  val opens = new AtomicInteger(0)
  final class CountingDecoder extends Multimodal.StubDecoder {
    override def open(): Unit = { opens.incrementAndGet(); () }
  }

  val batchCalls = new AtomicInteger(0)
  val maxBatchSeen = new AtomicInteger(0)
  final class BatchCountingDecoder extends Multimodal.StubDecoder {
    override def featuresBatch(payloads: Array[Array[Byte]], dim: Int): Array[Array[Float]] = {
      batchCalls.incrementAndGet()
      maxBatchSeen.updateAndGet(m => math.max(m, payloads.length))
      super.featuresBatch(payloads, dim)
    }
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, "a tiny payload".getBytes("UTF-8")),
    (2L, ("x" * 1000).getBytes("UTF-8")),
    (3L, ("y" * 5000).getBytes("UTF-8"))
  ).toDF("doc_id", "media")

  test("extractMeta: typed meta struct, deterministic stub dims") {
    val got = Multimodal.extractMeta(media, "doc_id", "media").orderBy("doc_id")
    got.schema("meta").dataType shouldBe Multimodal.metaSchema
    val r = got.collect()
    r.length shouldBe 3
    val m2 = r(1).getStruct(1)
    m2.getInt(0) shouldBe 1000 % 640
    m2.getInt(1) shouldBe (1000 * 7) % 480
    m2.getInt(2) shouldBe 3
    // determinism across runs
    rows(Multimodal.extractMeta(media, "doc_id", "media").orderBy("doc_id")) shouldBe rows(got.orderBy("doc_id"))
  }

  test("frameFeatures explodes one row per sampled frame with fixed-dim vectors") {
    val got = Multimodal.frameFeatures(media, "doc_id", "media",
      maxFrames = 4, dim = 8).collect()
    got.foreach { r =>
      r.getSeq[Float](2).length shouldBe 8
      r.getInt(1) should be >= 0
    }
    // payload of n bytes has n%16+1 frames, sampled up to 4
    val byDoc = got.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    byDoc(1L) shouldBe math.min(4, "a tiny payload".length % 16 + 1)
    byDoc(2L) shouldBe math.min(4, 1000 % 16 + 1)
  }

  test("NULL payloads are skipped, not NPEs") {
    val withNull = Seq((1L, "x".getBytes("UTF-8")), (2L, null: Array[Byte]))
      .toDF("doc_id", "media")
    Multimodal.extractMeta(withNull, "doc_id", "media")
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    Multimodal.frameFeatures(withNull, "doc_id", "media")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    Multimodal.batchedFeatures(withNull, "doc_id", "media")
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    Multimodal.resize(withNull, "doc_id", "media", 64, 64)
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
  }

  test("batchedFeatures: one vector per doc, decoder called in capped batches") {
    val docs = (1L to 100L).map(i => (i, s"payload$i".getBytes("UTF-8")))
      .toDF("doc_id", "media").repartition(2)
    MultimodalSpec.batchCalls.set(0)
    MultimodalSpec.maxBatchSeen.set(0)
    val got = Multimodal.batchedFeatures(docs, "doc_id", "media",
      batchSize = 16, dim = 4,
      decoder = new MultimodalSpec.BatchCountingDecoder)
    got.count() shouldBe 100
    got.schema.fieldNames.toSeq shouldBe Seq("doc_id", "features")
    // batches capped and amortized: ≥ ceil(100/16) calls (partition
    // boundaries may add one), never a call above the cap
    MultimodalSpec.maxBatchSeen.get() should be <= 16
    MultimodalSpec.batchCalls.get() should be >= 7
    MultimodalSpec.batchCalls.get() should be <= 10
    // features deterministic: stub is a pure function of payload bytes
    val f1 = got.filter(col("doc_id") === 1L).collect().head.getSeq[Float](1)
    f1 shouldBe Multimodal.batchedFeatures(docs, "doc_id", "media", 16, 4)
      .filter(col("doc_id") === 1L).collect().head.getSeq[Float](1)
  }

  test("resize emits transformed payload with target dims") {
    val got = Multimodal.resize(media, "doc_id", "media", 64, 64)
      .orderBy("doc_id").collect()
    got.foreach { r =>
      r.getInt(2) shouldBe 64
      r.getInt(3) shouldBe 64
      r.getAs[Array[Byte]](1).length should be <= 64 * 64 / 64
    }
  }

  test("decoder opens once per partition, not per row") {
    MultimodalSpec.opens.set(0)
    val df = media.repartition(2)
    Multimodal.extractMeta(df, "doc_id", "media",
      new MultimodalSpec.CountingDecoder).count()
    MultimodalSpec.opens.get() shouldBe 2
  }

  test("payload bytes stay out of the post-decode plan (only metadata flows)") {
    val meta = Multimodal.extractMeta(media, "doc_id", "media")
    val agged = meta.groupBy(col("meta.n_channels")).count()
    agged.collect().head.getLong(1) shouldBe 3
    // schema after extract carries no binary column
    meta.schema.fields.map(_.dataType) should not contain
      org.apache.spark.sql.types.BinaryType
  }

  test("ingestBinaryDir: byte-exact payloads, glob pruning, stable ids") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bin").toString
    val payloads = (0 until 5).map { i =>
      s"f$i.img" -> Array.tabulate[Byte](32 + i)(j => (i * 17 + j).toByte)
    }
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "notes.txt"),
      "ignore me".getBytes("UTF-8"))

    val got = graft.operators.Multimodal.ingestBinaryDir(spark, dir,
      glob = Some("*.img"))
    // the glob prunes the non-media file at the listing
    got.count() shouldBe 5
    val byName = got.collect().map { r =>
      r.getString(1).split("/").last ->
        (r.getLong(0), r.getLong(2), r.getAs[Array[Byte]](3))
    }.toMap
    payloads.foreach { case (name, bytes) =>
      val (_, len, content) = byName(name)
      len shouldBe bytes.length.toLong
      content.toSeq shouldBe bytes.toSeq // byte-exact round-trip
    }
    // media_id is a pure function of the path: re-ingest gives the
    // same ids (join-stable across runs)
    val again = graft.operators.Multimodal.ingestBinaryDir(spark, dir,
      glob = Some("*.img")).collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    byName.values.map(_._1).toSet shouldBe again.values.toSet
  }
}
