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

  test("resize refuses an output raster above MaxDecodePixels — the " +
      "bomb guard applies to the TARGET side too (r11 ADVICE)") {
    // 50000x50000 = 2.5G pixels: would allocate a multi-GB RGB buffer
    // per row on executors (and w*h overflows Int)
    val e = intercept[IllegalArgumentException] {
      Multimodal.resize(media, "doc_id", "media", 50000, 50000)
    }
    e.getMessage should include("MaxDecodePixels")
    // the decoder-level seam is guarded independently of the operator
    val e2 = intercept[IllegalArgumentException] {
      new Multimodal.ImageIoDecoder().resizeEncode(Array[Byte](1, 2, 3),
        50000, 50000)
    }
    e2.getMessage should include("MaxDecodePixels")
    // a maximal in-bound target still passes the guard (8192x8192 =
    // 64M pixels exactly)
    Multimodal.resize(media, "doc_id", "media", 8192, 8192)
      .schema.fieldNames should contain("media")
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

  test("MediaHeaders parses REAL images produced by javax.imageio") {
    // Ground truth from an independent encoder in the JDK itself: write
    // actual PNG/JPEG/GIF files and require the header parser to
    // recover the encoded dimensions. (ImageIO is test-only ground
    // truth — production payloads arrive as opaque bytes.)
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def render(fmt: String, w: Int, h: Int, imgType: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, imgType)
      (0 until w).foreach(x => img.setRGB(x, 0, x * 7919))
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"ImageIO lacks $fmt writer")
      bos.toByteArray
    }
    val cases = Seq(
      ("png", 640, 480, BufferedImage.TYPE_INT_RGB, 3),
      ("png", 17, 1203, BufferedImage.TYPE_INT_ARGB, 4),
      ("png", 1, 1, BufferedImage.TYPE_BYTE_GRAY, 1),
      ("jpg", 320, 240, BufferedImage.TYPE_INT_RGB, 3),
      ("jpg", 1023, 7, BufferedImage.TYPE_INT_RGB, 3),
      ("gif", 300, 200, BufferedImage.TYPE_INT_RGB, 3),
      ("gif", 65535, 1, BufferedImage.TYPE_BYTE_INDEXED, 3))
    cases.foreach { case (fmt, w, h, t, ch) =>
      val (gotFmt, gotW, gotH, gotC) =
        Multimodal.MediaHeaders.parse(render(fmt, w, h, t))
      val wantFmt = if (fmt == "jpg") "jpeg" else fmt
      (gotFmt, gotW, gotH) shouldBe ((wantFmt, w, h))
      gotC shouldBe ch
    }
  }

  test("MediaHeaders parses REAL TIFFs (ImageIO) in both byte orders") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def render(w: Int, h: Int, imgType: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, imgType)
      (0 until w).foreach(x => img.setRGB(x, 0, x * 7919))
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "tiff", bos), "ImageIO lacks tiff writer")
      bos.toByteArray
    }
    val rgb = render(321, 97, BufferedImage.TYPE_INT_RGB)
    Multimodal.MediaHeaders.parse(rgb) shouldBe (("tiff", 321, 97, 3))
    val gray = render(5, 1200, BufferedImage.TYPE_BYTE_GRAY)
    Multimodal.MediaHeaders.parse(gray) shouldBe (("tiff", 5, 1200, 1))
    // hand-built big-endian (MM) twin of the LE form ImageIO writes:
    // LONG dims (first-2-bytes SHORT trap exercised on spp)
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def entry(tag: Int, typ: Int, value: Array[Byte]) =
      be16(tag) ++ be16(typ) ++ be32(1) ++ value
    val mm = Array[Byte]('M', 'M', 0, 42) ++ be32(8) ++ be16(3) ++
      entry(256, 4, be32(777)) ++ entry(257, 3, be16(55) ++ Array[Byte](0, 0)) ++
      entry(277, 3, be16(3) ++ Array[Byte](0, 0)) ++ be32(0)
    Multimodal.MediaHeaders.parse(mm) shouldBe (("tiff", 777, 55, 3))
    // corrupt: IFD offset beyond the payload; entry table truncated
    val evil = Array[Byte]('I', 'I', 42, 0) ++ Array[Byte](-1, -1, -1, 0x7f)
    Multimodal.MediaHeaders.parse(evil) shouldBe Multimodal.MediaHeaders.Unknown
    Multimodal.MediaHeaders.parse(mm.take(20)) shouldBe
      Multimodal.MediaHeaders.Unknown
    // multi-count ImageWidth entry: the value field holds an OFFSET,
    // not a value — reading it as the width fabricates dimensions, so
    // the entry is skipped and the parse refuses (r9 ADVICE)
    val multi = Array[Byte]('M', 'M', 0, 42) ++ be32(8) ++ be16(3) ++
      (be16(256) ++ be16(4) ++ be32(2) ++ be32(777)) ++
      entry(257, 3, be16(55) ++ Array[Byte](0, 0)) ++
      entry(277, 3, be16(3) ++ Array[Byte](0, 0)) ++ be32(0)
    Multimodal.MediaHeaders.parse(multi) shouldBe
      Multimodal.MediaHeaders.Unknown
  }

  test("MediaHeaders.parseAudio decodes MP3 frame headers and ID3 skip") {
    val mh = Multimodal.MediaHeaders
    // 128 kbps, 44100 Hz, stereo, no padding: frameLen =
    // floor(144000·128/44100) = 417; three frames promise 3456
    // samples. The header repeats at every frame boundary (CBR) —
    // parseMp3's second-sync probe requires it on multi-frame
    // payloads.
    def mp3(b3: Int, b4: Int, totalLen: Int,
            frameLen: Int = Int.MaxValue): Array[Byte] = {
      val p = new Array[Byte](totalLen)
      var o = 0L
      while (o + 4 <= totalLen) {
        val i = o.toInt
        p(i) = 0xff.toByte; p(i + 1) = 0xfb.toByte
        p(i + 2) = b3.toByte; p(i + 3) = b4.toByte
        o += frameLen
      }
      p
    }
    mh.parseAudio(mp3(0x90, 0x00, 417 * 3, 417)) shouldBe
      (("mp3", 44100, 2, 0, 3456L))
    // mono (mode 3), 32 kbps @ 48000 → frameLen 96, padding adds 1
    mh.parseAudio(mp3(0x14, 0xc0, 96 * 2, 96)) shouldBe
      (("mp3", 48000, 1, 0, 2304L))
    mh.parseAudio(mp3(0x16, 0xc0, 97 * 2, 97)) shouldBe
      (("mp3", 48000, 1, 0, 2304L)) // padding bit honored
    // ID3v2 prefix: 10-byte header + syncsafe size 130 skipped
    val tagged = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 1, 2) ++
      new Array[Byte](130) ++ mp3(0x90, 0x00, 417)
    mh.parseAudio(tagged) shouldBe (("mp3", 44100, 2, 0, 1152L))
    // refusals: free/bad bitrate, reserved rate, lost sync, truncation
    mh.parseAudio(mp3(0x00, 0x00, 500)) shouldBe mh.UnknownAudio
    mh.parseAudio(mp3(0x9c, 0x00, 500)) shouldBe mh.UnknownAudio
    // a lone FF FB header followed by zeros is NOT an MPEG stream:
    // where a second frame header fits, its sync word must be there
    mh.parseAudio(mp3(0x90, 0x00, 417 * 3)) shouldBe mh.UnknownAudio
    // shorter than one declared frame: the header's promise doesn't
    // fit its own payload
    mh.parseAudio(mp3(0x90, 0x00, 100)) shouldBe mh.UnknownAudio
    mh.parseAudio("not audio at all".getBytes("UTF-8")) shouldBe
      mh.UnknownAudio
    mh.parseAudio(Array[Byte](0xff.toByte)) shouldBe mh.UnknownAudio
    // hostile syncsafe tag size must not wrap the cursor
    val evilTag = Array[Byte]('I', 'D', '3', 3, 0, 0,
      0x7f, 0x7f, 0x7f, 0x7f)
    mh.parseAudio(evilTag) shouldBe mh.UnknownAudio
  }

  test("MediaHeaders: truncated, corrupt, and non-image bytes are unknown") {
    val mh = Multimodal.MediaHeaders
    mh.parse(null) shouldBe mh.Unknown
    mh.parse(Array[Byte]()) shouldBe mh.Unknown
    mh.parse("plain text, not an image".getBytes("UTF-8")) shouldBe mh.Unknown
    // PNG signature but truncated before the IHDR data
    mh.parse(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 0, 0)
      .map(_.toByte)) shouldBe mh.Unknown
    // JPEG SOI but the stream hits start-of-scan without any SOF
    mh.parse(Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0, 0)
      .map(_.toByte)) shouldBe mh.Unknown
    // JPEG with lost marker sync (garbage where a marker must be)
    mh.parse(Array(0xff, 0xd8, 0x12, 0x34, 0, 0).map(_.toByte)) shouldBe
      mh.Unknown
    // GIF signature with a bad version byte
    mh.parse("GIF66a__________".getBytes("UTF-8")) shouldBe mh.Unknown
  }

  test("MediaHeaders: JPEG marker scan handles fill bytes and RSTn") {
    // fill 0xFF padding between segments and a standalone TEM marker
    // before SOF2 — the scanner must skip both without losing sync
    def b(xs: Int*) = xs.map(_.toByte).toArray
    val p = b(0xff, 0xd8) ++
      b(0xff, 0xff, 0xff, 0x01) ++ // fill, fill, TEM (standalone)
      b(0xff, 0xfe, 0x00, 0x05, 1, 2, 3) ++ // COM len 5
      b(0xff, 0xc2, 0x00, 0x11, 8, 0x01, 0x00, 0x02, 0x00, 3) // SOF2 256x512
    Multimodal.MediaHeaders.parse(p) shouldBe (("jpeg", 512, 256, 3))
  }

  test("imageDims: narrow map over the payload column, NULLs dropped") {
    val pngHex = "89504E470D0A1A0A0000000D49484452" +
      "00000280" + "000001E0" + "08" + "02" + "00000000000000"
    val df = Seq(
      (1L, Some(pngHex)),
      (2L, Option.empty[String]),
      (3L, Some("474946383961" + "4001" + "F000" + "F700003B")))
      .toDF("doc_id", "hex")
      .select(col("doc_id"), unhex(col("hex")).as("media"))
    val got = Multimodal.imageDims(df, "doc_id", "media")
      .orderBy("doc_id").collect()
    got.length shouldBe 2 // NULL payload dropped
    got(0).toSeq shouldBe Seq(1L, "png", 640, 480, 3)
    got(1).toSeq shouldBe Seq(3L, "gif", 320, 240, 3)
    // ImageHeaderDecoder feeds the same parse through the decoder seam
    val meta = Multimodal.extractMeta(df, "doc_id", "media",
      new Multimodal.ImageHeaderDecoder).orderBy("doc_id").collect()
    meta(0).getStruct(1).toSeq shouldBe Seq(640, 480, 3, 1)
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

  test("MediaHeaders.parseAudio parses REAL WAV bytes from javax.sound") {
    // independent-encoder ground truth, the ImageIO precedent: write
    // actual PCM WAV streams and require the header parser to recover
    // every encoded parameter
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    def render(rate: Float, bits: Int, ch: Int, nFrames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, bits, ch, bits > 8, false)
      val data = new Array[Byte](nFrames * fmt.getFrameSize)
      data.indices.foreach(i => data(i) = (i * 31).toByte)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(data), fmt, nFrames.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val cases = Seq((8000f, 8, 1, 1000), (44100f, 16, 2, 4321),
      (16000f, 16, 1, 1), (48000f, 8, 2, 0))
    cases.foreach { case (rate, bits, ch, n) =>
      Multimodal.MediaHeaders.parseAudio(render(rate, bits, ch, n)) shouldBe
        (("wav", rate.toInt, ch, bits, n.toLong))
    }
  }

  test("MediaHeaders.parseAudio: FLAC STREAMINFO unpack and junk refusal") {
    val mh = Multimodal.MediaHeaders
    // hand-packed STREAMINFO: rate 44100, 2 channels, 24 bits,
    // 0x123456789 samples (exercises the 36-bit field's high nibble)
    val rate = 44100; val ch = 2; val bits = 24
    val samples = 0x123456789L
    val si = new Array[Byte](42)
    "fLaC".getBytes("US-ASCII").copyToArray(si, 0)
    si(4) = 0x80.toByte // last block, type STREAMINFO
    si(7) = 34 // block length
    si(18) = (rate >> 12).toByte
    si(19) = ((rate >> 4) & 0xff).toByte
    si(20) = (((rate & 0xf) << 4) | ((ch - 1) << 1) |
      ((bits - 1) >> 4)).toByte
    si(21) = ((((bits - 1) & 0xf) << 4) | ((samples >> 32) & 0xf).toInt).toByte
    si(22) = ((samples >> 24) & 0xff).toByte
    si(23) = ((samples >> 16) & 0xff).toByte
    si(24) = ((samples >> 8) & 0xff).toByte
    si(25) = (samples & 0xff).toByte
    mh.parseAudio(si) shouldBe (("flac", rate, ch, bits, samples))
    // refusals: null, junk, truncated WAV, WAV missing its fmt chunk
    mh.parseAudio(null) shouldBe mh.UnknownAudio
    mh.parseAudio("not audio at all".getBytes("UTF-8")) shouldBe
      mh.UnknownAudio
    mh.parseAudio("RIFF    WAVE".getBytes("US-ASCII")) shouldBe
      mh.UnknownAudio
    val noFmt = new Array[Byte](20)
    "RIFF".getBytes.copyToArray(noFmt, 0)
    "WAVE".getBytes.copyToArray(noFmt, 8)
    "data".getBytes.copyToArray(noFmt, 12)
    mh.parseAudio(noFmt) shouldBe mh.UnknownAudio
    // hostile chunk sizes: 0xFFFFFFF8 truncated to Int is -8 (a naive
    // Int cursor advances by ZERO — infinite loop); 0x80000000 drives
    // it negative (index crash). Both must terminate as unknown.
    for (evil <- Seq(0xFFFFFFF8L, 0x80000000L)) {
      val p = new Array[Byte](24)
      "RIFF".getBytes.copyToArray(p, 0)
      "WAVE".getBytes.copyToArray(p, 8)
      "junk".getBytes.copyToArray(p, 12)
      p(16) = (evil & 0xff).toByte; p(17) = ((evil >> 8) & 0xff).toByte
      p(18) = ((evil >> 16) & 0xff).toByte
      p(19) = ((evil >> 24) & 0xff).toByte
      mh.parseAudio(p) shouldBe mh.UnknownAudio
    }
  }

  test("MediaHeaders.parseVideo: ISO-BMFF box walk, v0/v1 mvhd, refusals") {
    val mh = Multimodal.MediaHeaders
    def be32(x: Long) = Array((x >> 24).toByte, (x >> 16).toByte,
      (x >> 8).toByte, x.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload
    def ftyp(brand: String) = box("ftyp",
      brand.getBytes("US-ASCII") ++ Array.fill(4)(0.toByte))
    def mvhd0(ts: Int, dur: Long) = box("mvhd",
      Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(ts.toLong) ++ be32(dur))
    def mvhd1(ts: Int, dur: Long) = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ Array.fill(16)(0.toByte) ++
        be32(ts.toLong) ++ be32(dur >> 32) ++ be32(dur & 0xffffffffL))
    // v0, with a filler child before mvhd so the walk is exercised
    val p0 = ftyp("isom") ++ box("moov",
      box("free", Array.fill(5)(0.toByte)) ++ mvhd0(600, 123456L))
    mh.parseVideo(p0) shouldBe (("mp4", "isom", 600, 123456L, 205760L))
    // v1 with a 64-bit duration above 2^32
    val bigDur = 0x123456789L
    val p1 = ftyp("mp42") ++ box("moov", mvhd1(90000, bigDur))
    mh.parseVideo(p1) shouldBe
      (("mp4", "mp42", 90000, bigDur, bigDur * 1000L / 90000))
    // trailing mdat after moov is fine; leading free box is fine
    val p2 = box("free", Array.empty[Byte]) ++ p0 ++
      box("mdat", Array.fill(9)(1.toByte))
    mh.parseVideo(p2) shouldBe (("mp4", "isom", 600, 123456L, 205760L))
    // refusals: null, junk, ftyp without moov, moov without mvhd,
    // corrupt (size < 8) box
    mh.parseVideo(null) shouldBe mh.UnknownVideo
    mh.parseVideo("not a container".getBytes) shouldBe mh.UnknownVideo
    mh.parseVideo(ftyp("isom")) shouldBe mh.UnknownVideo
    mh.parseVideo(ftyp("isom") ++ box("moov",
      box("free", Array.empty[Byte]))) shouldBe mh.UnknownVideo
    mh.parseVideo(ftyp("isom") ++ be32(3L) ++ "moov".getBytes) shouldBe
      mh.UnknownVideo
    // a v1 duration so large the ms conversion (dur·1000) would wrap
    // Long — must refuse as unknown, not emit a negative duration_ms
    val huge = Long.MaxValue / 1000L + 1L
    mh.parseVideo(ftyp("isom") ++ box("moov", mvhd1(600, huge))) shouldBe
      mh.UnknownVideo
    // ...while the largest convertible duration still parses
    val edge = Long.MaxValue / 1000L
    mh.parseVideo(ftyp("isom") ++ box("moov", mvhd1(600, edge))) shouldBe
      (("mp4", "isom", 600, edge, edge * 1000L / 600))
  }

  test("videoMeta: narrow map, NULLs dropped") {
    def be32(x: Long) = Array((x >> 24).toByte, (x >> 16).toByte,
      (x >> 8).toByte, x.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload
    val clip = box("ftyp", "isom".getBytes ++ Array.fill(4)(0.toByte)) ++
      box("moov", box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++
        be32(0) ++ be32(1000L) ++ be32(2500L)))
    val df = Seq((1L, clip), (2L, null.asInstanceOf[Array[Byte]]),
      (3L, "junk".getBytes)).toDF("id", "media")
    rows(Multimodal.videoMeta(df, "id", "media").orderBy("id")) shouldBe Seq(
      Seq(1L, "mp4", "isom", 1000, 2500L, 2500L),
      Seq(3L, "unknown", "", -1, -1L, -1L))
  }

  test("audioMeta: narrow map, NULLs dropped, duration floor arithmetic") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    def wav(rate: Float, nFrames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(new Array[Byte](nFrames * 2)), fmt,
        nFrames.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, wav(8000f, 12000)), // 1500 ms exactly
      (2L, wav(44100f, 44099)), // floors to 999 ms
      (3L, null.asInstanceOf[Array[Byte]]),
      (4L, "garbage".getBytes("UTF-8"))).toDF("id", "media")
    val got = rows(Multimodal.audioMeta(df, "id", "media").orderBy("id"))
    got shouldBe Seq(
      Seq(1L, "wav", 8000, 1, 16, 12000L, 1500L),
      Seq(2L, "wav", 44100, 1, 16, 44099L, 999L),
      Seq(4L, "unknown", -1, -1, -1, -1L, -1L))
  }

  test("perceptualHash: dHash parity with direct grid computation, " +
      "splice locality, NULLs dropped") {
    val dec = new Multimodal.StubDecoder
    def refDHash(p: Array[Byte]): Long = {
      val g = dec.grayGrid(p, 9, 8)
      (0 until 8).flatMap(r => (0 until 8).map(c =>
        if (g(r * 9 + c) < g(r * 9 + c + 1)) 1L << (r * 8 + c) else 0L))
        .reduce(_ | _)
    }
    val rnd = new scala.util.Random(7)
    val base = Array.fill(300)(rnd.nextInt(256).toByte)
    val spliced = base.clone(); spliced(40) = 91; spliced(41) = 92
    val other = Array.fill(300)(rnd.nextInt(256).toByte)
    val df = Seq(1L -> base, 2L -> spliced, 3L -> other,
      4L -> null.asInstanceOf[Array[Byte]]).toDF("doc_id", "media")
    val got = Multimodal.perceptualHash(df, "doc_id", "media")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.keySet shouldBe Set(1L, 2L, 3L) // NULL dropped
    got(1L) shouldBe refDHash(base)
    got(3L) shouldBe refDHash(other)
    // LOCALITY: a 2-byte splice perturbs one ~4-byte cell → few bits;
    // an unrelated payload lands ~32 bits away
    java.lang.Long.bitCount(got(1L) ^ got(2L)) should be <= 3
    java.lang.Long.bitCount(got(1L) ^ got(3L)) should be > 10
  }

  test("phashNearDupPairs: planted splices pair, no false pairs") {
    val rnd = new scala.util.Random(11)
    val originals = (0L until 40L).map(i =>
      i -> Array.fill(300)(rnd.nextInt(256).toByte))
    val plants = originals.filter(_._1 % 4 == 0).map { case (i, p) =>
      val q = p.clone(); q(100) = 7; q(101) = 8
      (i + 1000L) -> q
    }
    val df = (originals ++ plants).toDF("doc_id", "media")
    val pairs = Multimodal.phashNearDupPairs(df, "doc_id", "media")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every plant pairs with exactly its original...
    val expected = originals.map(_._1).filter(_ % 4 == 0)
      .map(i => (i, i + 1000L)).toSet
    expected.subsetOf(pairs) shouldBe true
    // ...and unrelated payloads never pair (any extra pair would be
    // two independent random payloads within Hamming 3 — astronomically
    // unlikely, and a banding bug would show up exactly here)
    pairs shouldBe expected
  }

  test("grayGrid: empty and tiny payloads stay total") {
    val dec = new Multimodal.StubDecoder
    dec.grayGrid(Array.emptyByteArray, 9, 8) shouldBe Array.fill(72)(0)
    val tiny = dec.grayGrid(Array[Byte](10, 20), 9, 8)
    tiny.length shouldBe 72
    all(tiny) should be >= 0
    all(tiny) should be <= 255
  }

  test("MediaHeaders: BMP via ImageIO parity; WebP VP8/VP8L/VP8X layouts") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    val mh = Multimodal.MediaHeaders
    def bmp(w: Int, h: Int, t: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, t)
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "bmp", bos), "ImageIO lacks bmp writer")
      bos.toByteArray
    }
    mh.parse(bmp(321, 17, BufferedImage.TYPE_INT_RGB)) shouldBe
      (("bmp", 321, 17, 3))
    mh.parse(bmp(5, 1200, BufferedImage.TYPE_BYTE_GRAY)) shouldBe
      (("bmp", 5, 1200, 1))
    // hand-planted negative-height (top-down) BITMAPINFOHEADER reports
    // the absolute height
    val td = bmp(8, 4, BufferedImage.TYPE_INT_RGB).clone()
    val neg = -4
    td(22) = (neg & 0xff).toByte; td(23) = ((neg >> 8) & 0xff).toByte
    td(24) = ((neg >> 16) & 0xff).toByte; td(25) = ((neg >> 24) & 0xff).toByte
    mh.parse(td) shouldBe (("bmp", 8, 4, 3))

    // WebP layouts from the published spec (no JDK encoder exists)
    def riff(tag: String, payload: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      bos.write("RIFF".getBytes("US-ASCII"))
      val size = 4 + 8 + payload.length
      bos.write(Array[Byte]((size & 0xff).toByte, ((size >> 8) & 0xff).toByte,
        ((size >> 16) & 0xff).toByte, ((size >> 24) & 0xff).toByte))
      bos.write("WEBP".getBytes("US-ASCII"))
      bos.write(tag.getBytes("US-ASCII"))
      val ps = payload.length
      bos.write(Array[Byte]((ps & 0xff).toByte, ((ps >> 8) & 0xff).toByte,
        ((ps >> 16) & 0xff).toByte, ((ps >> 24) & 0xff).toByte))
      bos.write(payload)
      bos.toByteArray
    }
    // VP8L: 0x2F then (w-1) | (h-1)<<14 | alpha<<28, LE32
    def vp8l(w: Int, h: Int, alpha: Boolean): Array[Byte] = {
      val bits = (w - 1) | ((h - 1) << 14) | (if (alpha) 1 << 28 else 0)
      riff("VP8L", Array[Byte](0x2f, (bits & 0xff).toByte,
        ((bits >> 8) & 0xff).toByte, ((bits >> 16) & 0xff).toByte,
        ((bits >> 24) & 0xff).toByte))
    }
    mh.parse(vp8l(800, 601, alpha = false)) shouldBe (("webp", 800, 601, 3))
    mh.parse(vp8l(1, 16383, alpha = true)) shouldBe (("webp", 1, 16383, 4))
    // VP8 (lossy): 3-byte frame tag, 9D 01 2A sync, LE14 dims
    def vp8(w: Int, h: Int): Array[Byte] =
      riff("VP8 ", Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a,
        (w & 0xff).toByte, ((w >> 8) & 0x3f).toByte,
        (h & 0xff).toByte, ((h >> 8) & 0x3f).toByte))
    mh.parse(vp8(640, 480)) shouldBe (("webp", 640, 480, 3))
    // VP8X (extended): flags byte (alpha 0x10), canvas-1 as LE24
    def vp8x(w: Int, h: Int, alpha: Boolean): Array[Byte] = {
      val (cw, chh) = (w - 1, h - 1)
      riff("VP8X", Array[Byte]((if (alpha) 0x10 else 0).toByte, 0, 0, 0,
        (cw & 0xff).toByte, ((cw >> 8) & 0xff).toByte,
        ((cw >> 16) & 0xff).toByte,
        (chh & 0xff).toByte, ((chh >> 8) & 0xff).toByte,
        ((chh >> 16) & 0xff).toByte))
    }
    mh.parse(vp8x(4000, 3000, alpha = true)) shouldBe
      (("webp", 4000, 3000, 4))
    mh.parse(vp8x(2, 2, alpha = false)) shouldBe (("webp", 2, 2, 3))
    // corrupt variants stay unknown
    mh.parse(riff("VP8L", Array[Byte](0x30, 0, 0, 0, 0))) shouldBe mh.Unknown
    mh.parse(riff("VP8 ", Array[Byte](0, 0, 0, 0x11, 0x22, 0x33,
      1, 0, 1, 0))) shouldBe mh.Unknown
    mh.parse("BMX not a bitmap".getBytes("US-ASCII")) shouldBe mh.Unknown
  }

  // ---- ImageIoDecoder: the DEFAULT decoder, on REAL pixels ----------
  // (r10 verdict #1: the decoder shipped as the default with zero
  // direct coverage; these cases pin every rung of its ladder.)

  /** Encode a deterministic image via the JDK's own ImageIO — the
    * independent-encoder ground truth the MediaHeaders tests use. */
  private def encode(fmt: String, w: Int, h: Int, imgType: Int)(
      pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixel(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos),
      s"ImageIO lacks $fmt writer")
    bos.toByteArray
  }

  /** Hand-crafted PNG signature + IHDR with NO decodable body — a
    * header that parses but pixels that don't. `MediaHeaders.isPng`
    * needs ≥ 29 bytes; the bogus CRC is irrelevant to header parsing
    * and guarantees ImageIO cannot decode it. */
  private def pngHeaderOnly(w: Int, h: Int): Array[Byte] = {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    bos.write(Array[Byte](0, 0, 0, 13))
    bos.write("IHDR".getBytes("US-ASCII"))
    bos.write(be32(w)); bos.write(be32(h))
    bos.write(Array[Byte](8, 2, 0, 0, 0)) // depth 8, truecolor
    bos.write(Array[Byte](0, 0, 0, 0))    // bogus CRC
    bos.toByteArray
  }

  test("ImageIoDecoder.decode: real dimensions/channels off decoded pixels") {
    import java.awt.image.BufferedImage._
    val dec = new Multimodal.ImageIoDecoder
    dec.open()
    dec.decode(encode("png", 64, 48, TYPE_INT_RGB)((x, y) => x * y)) shouldBe
      ((64, 48, 3, 1))
    dec.decode(encode("png", 17, 203, TYPE_INT_ARGB)((x, y) => x + y)) shouldBe
      ((17, 203, 4, 1))
    dec.decode(encode("jpg", 320, 240, TYPE_INT_RGB)((x, _) => x)) shouldBe
      ((320, 240, 3, 1))
    dec.decode(encode("bmp", 31, 9, TYPE_INT_RGB)((_, y) => y)) shouldBe
      ((31, 9, 3, 1))
  }

  test("ImageIoDecoder.grayGrid: area-averaged BT.601 luminance of real pixels") {
    val dec = new Multimodal.ImageIoDecoder
    dec.open()
    // uniform color: every cell is the pixel's integer BT.601 luminance
    val c = (10 << 16) | (20 << 8) | 30 // (299*10 + 587*20 + 114*30)/1000 = 18
    val uniform = encode("png", 36, 24,
      java.awt.image.BufferedImage.TYPE_INT_RGB)((_, _) => c)
    dec.grayGrid(uniform, 9, 8) shouldBe Array.fill(72)(18)
    // left 4 of 9 cell-columns black, the rest white — cell boundaries
    // land exactly on the color edge (90/9 = 10 px cells, edge at 40)
    val split = encode("png", 90, 80,
      java.awt.image.BufferedImage.TYPE_INT_RGB)(
      (x, _) => if (x < 40) 0x000000 else 0xffffff)
    val grid = dec.grayGrid(split, 9, 8)
    grid shouldBe Array.tabulate(72)(i => if (i % 9 < 4) 0 else 255)
  }

  test("ImageIoDecoder: dHash locality on REAL pixels " +
      "(2-pixel edit ≤3 bits, unrelated image >10)") {
    import java.awt.image.BufferedImage.TYPE_INT_RGB
    def gradient(w: Int, reversed: Boolean)(x: Int): Int = {
      val v = (x * 255) / (w - 1)
      val g = if (reversed) 255 - v else v
      (g << 16) | (g << 8) | g
    }
    val w = 72; val h = 64
    val base = encode("png", w, h, TYPE_INT_RGB)((x, _) => gradient(w, reversed = false)(x))
    // 2-pixel edit inside ONE 8x8 cell: shifts that cell's mean by
    // ≤ 8 gray levels, far below the ~28-level gap between adjacent
    // cell means of the gradient — few (here zero) dHash bits move
    val edited = encode("png", w, h, TYPE_INT_RGB) { (x, y) =>
      if ((x == 4 || x == 5) && y == 4) 0xffffff
      else gradient(w, reversed = false)(x)
    }
    val other = encode("png", w, h, TYPE_INT_RGB)((x, _) => gradient(w, reversed = true)(x))
    val df = Seq(1L -> base, 2L -> edited, 3L -> other).toDF("doc_id", "media")
    val got = Multimodal.perceptualHash(df, "doc_id", "media",
        new Multimodal.ImageIoDecoder)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    java.lang.Long.bitCount(got(1L) ^ got(2L)) should be <= 3
    java.lang.Long.bitCount(got(1L) ^ got(3L)) should be > 10
  }

  test("ImageIoDecoder ladder: header-only middle rung, stub fallback " +
      "identity on header-less payloads") {
    val dec = new Multimodal.ImageIoDecoder
    val stub = new Multimodal.StubDecoder
    dec.open()
    // header parses, body doesn't: REAL container dims, stub grid
    val headerOnly = pngHeaderOnly(60, 40)
    dec.decode(headerOnly) shouldBe ((60, 40, 3, 1))
    dec.grayGrid(headerOnly, 9, 8) shouldBe stub.grayGrid(headerOnly, 9, 8)
    // corrupt BODY of a real PNG (signature + IHDR intact): same rung
    val real = encode("png", 24, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)((x, y) => x * y)
    val corrupt = real.clone()
    java.util.Arrays.fill(corrupt, 40, corrupt.length, 0x5a.toByte)
    dec.decode(corrupt) shouldBe ((24, 16, 3, 1))
    dec.grayGrid(corrupt, 9, 8) shouldBe stub.grayGrid(corrupt, 9, 8)
    // header-less payloads: byte-identical to the stub on BOTH apis —
    // the gate's synthetic payloads keep their deterministic
    // signatures under the default decoder (pinned, not lucky)
    val junk = ("z" * 300).getBytes("UTF-8")
    dec.decode(junk) shouldBe stub.decode(junk)
    dec.grayGrid(junk, 9, 8) shouldBe stub.grayGrid(junk, 9, 8)
    dec.decode(Array.emptyByteArray) shouldBe stub.decode(Array.emptyByteArray)
  }

  test("ImageIoDecoder: decompression-bomb header never reaches the codec") {
    val dec = new Multimodal.ImageIoDecoder
    dec.open()
    // a valid header DECLARING 60000x60000 (3.6G pixels — a ~14 GB
    // raster if decoded); the pixel cap refuses the ImageIO call and
    // the declared dims surface from the header-only rung instead of
    // an executor-killing OutOfMemoryError
    (60000L * 60000L) should be > Multimodal.MaxDecodePixels
    dec.decode(pngHeaderOnly(60000, 60000)) shouldBe ((60000, 60000, 3, 1))
    // just UNDER the cap: the codec call is attempted, fails on the
    // bodyless payload, and degrades to the same header rung
    (10000L * 6000L) should be <= Multimodal.MaxDecodePixels
    dec.decode(pngHeaderOnly(10000, 6000)) shouldBe ((10000, 6000, 3, 1))
  }

  test("ImageIoDecoder.resizeEncode: REAL transcode — decoded output " +
      "has target dims and area-averaged pixels; stub slice fallback") {
    import java.awt.image.BufferedImage.TYPE_INT_RGB
    val dec = new Multimodal.ImageIoDecoder
    dec.open()
    // uniform color survives any resize EXACTLY (area mean of a
    // constant), and the output is itself a decodable PNG
    val c = (40 << 16) | (90 << 8) | 200
    val uni = dec.resizeEncode(
      encode("png", 32, 16, TYPE_INT_RGB)((_, _) => c), 8, 4)
    val uimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(uni))
    (uimg.getWidth, uimg.getHeight) shouldBe ((8, 4))
    (0 until 4).foreach(y => (0 until 8).foreach(x =>
      (uimg.getRGB(x, y) & 0xffffff) shouldBe c))
    // half-black/half-white split on exact cell boundaries: left
    // output columns pure black, right pure white
    val split = dec.resizeEncode(
      encode("png", 32, 16, TYPE_INT_RGB)(
        (x, _) => if (x < 16) 0x000000 else 0xffffff), 8, 4)
    val simg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(split))
    (0 until 4).foreach { y =>
      (simg.getRGB(0, y) & 0xffffff) shouldBe 0x000000
      (simg.getRGB(7, y) & 0xffffff) shouldBe 0xffffff
    }
    // undecodable payloads keep the deterministic stub slice
    val junk = ("q" * 300).getBytes("UTF-8")
    dec.resizeEncode(junk, 8, 8) shouldBe
      (new Multimodal.StubDecoder).resizeEncode(junk, 8, 8)
    // the full operator runs the real path end-to-end
    val df = Seq(1L -> encode("png", 32, 16, TYPE_INT_RGB)((_, _) => c))
      .toDF("doc_id", "media")
    val out = Multimodal.resize(df, "doc_id", "media", 8, 4).collect()(0)
    val oimg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]](1)))
    (oimg.getWidth, oimg.getHeight) shouldBe ((8, 4))
  }
}
