package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns as opaque `binary` payloads
  * with typed metadata, processed batch-wise with `mapPartitions` —
  * the Scala analog of a Pandas-UDF/`mapInPandas` stage.
  *
  * The actual codec work is behind [[MediaDecoder]]. The DEFAULT is
  * [[ImageIoDecoder]] — real pixel decoding via the JDK's own
  * `javax.imageio`, header-probed first so non-image payloads fall
  * back to the deterministic [[StubDecoder]] (which derives fake
  * dimensions/frames/grids from the payload bytes — the gate's
  * synthetic payloads keep their stub signatures). The Spark-side
  * plumbing — schemas, per-partition decoder lifecycle, iterator
  * batch shape, row explosion for frame sampling — is shared by both
  * and is what the specs pin down.
  *
  * Scale notes:
  *  - One decoder instance per partition (`mapPartitions` closure inits
  *    it once, not per row) — the pattern that amortizes expensive codec
  *    init across a partition's rows.
  *  - Payload bytes never shuffle: decode/feature stages are narrow
  *    maps; only the extracted metadata/features (small, fixed-width)
  *    continue into joins/aggregations.
  *  - `maxRecordsPerBatch`-style batching is implicit: the iterator is
  *    consumed lazily, so memory holds one in-flight payload per task,
  *    not the whole partition.
  */
object Multimodal {

  /** Pixel-count ceiling for real decoding ([[ImageIoDecoder]]): the
    * largest DECLARED width*height a payload may claim before the
    * codec call is refused (header-only rung instead). 64M pixels ≈
    * a 256 MB ARGB raster — comfortably above any sane training image,
    * far below what would OOM a task decoding a crafted bomb. */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** Codec seam. Implementations must be Serializable (constructed on
    * the driver, initialized lazily per executor partition). */
  trait MediaDecoder extends Serializable {
    /** Called once per partition before any decode — heavyweight codec
      * init goes here (model load, JNI handles, …). */
    def open(): Unit = ()
    /** Decode payload → (width, height, nChannels, nFrames). */
    def decode(payload: Array[Byte]): (Int, Int, Int, Int)
    /** Extract a fixed-length feature vector from one frame. */
    def features(payload: Array[Byte], frameIdx: Int, dim: Int): Array[Float]
    /** Downscaled grayscale grid (`cols`×`rows`, row-major, 0–255) of
      * frame 0 — the tiny thumbnail perceptual hashing compares. A real
      * codec decodes + area-averages; the contract that matters for the
      * hash is LOCALITY: a small payload change must perturb few
      * cells. */
    def grayGrid(payload: Array[Byte], cols: Int, rows: Int): Array[Int]
    /** Batched inference: one call per batch of payloads (frame 0 of
      * each) — override where the backend amortizes per-call cost
      * (GPU inference, vectorized codecs). Default: per-item loop. */
    def featuresBatch(payloads: Array[Array[Byte]], dim: Int): Array[Array[Float]] =
      payloads.map(features(_, 0, dim))
    /** Transcode frame 0 to exactly `w`×`h` and re-encode. A real
      * codec decodes, area-averages, re-encodes
      * ([[ImageIoDecoder.resizeEncode]]); this default is the
      * deterministic stub stand-in (a length-scaled byte slice) so
      * non-image payloads keep a total, fake-but-stable behavior. */
    def resizeEncode(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      // long arithmetic: w*h overflows Int near the raster cap
      java.util.Arrays.copyOf(payload,
        math.min(payload.length.toLong, math.max(1L, w.toLong * h / 64))
          .toInt)
  }

  /** Deterministic stand-in for the absent codec libraries: dimensions
    * and features are pure functions of the payload bytes. */
  class StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Int) = {
      val n = payload.length
      (n % 640, (n * 7) % 480, 3, n % 16 + 1)
    }
    def features(payload: Array[Byte], frameIdx: Int, dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L // deterministic FNV-ish fold of the bytes
      var i = 0
      while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
      var d = 0
      while (d < dim) {
        val v = h * (frameIdx * dim + d + 1)
        out(d) = ((v % 1000003L).toFloat / 1000003f)
        d += 1
      }
      out
    }
    /** Locally-sensitive stand-in for decode-then-downscale: cell =
      * mean byte value of its contiguous payload slice. Mimics the
      * area-averaging of real thumbnailing — perturbing a few payload
      * bytes moves a few cell means slightly, which is exactly the
      * property perceptual hashing needs (the FNV fold used by
      * [[features]] would scatter any 1-byte change across all 64
      * bits). */
    def grayGrid(payload: Array[Byte], cols: Int, rows: Int): Array[Int] = {
      val cells = cols * rows
      val out = new Array[Int](cells)
      val n = payload.length
      if (n == 0) return out
      var c = 0
      while (c < cells) {
        val from = (c.toLong * n / cells).toInt
        val until = math.max(((c + 1).toLong * n / cells).toInt, from + 1)
        var s = 0L
        var i = from
        while (i < until && i < n) { s += payload(i) & 0xff; i += 1 }
        out(c) = (s / math.max(1, math.min(until, n) - from)).toInt
        c += 1
      }
      out
    }
  }

  /** Real container-header parsing for the three ubiquitous image
    * formats — pure-JVM byte inspection, no codec library. This is the
    * first NON-stub rung of the decoder ladder: dimensions/channel
    * counts come out of the actual PNG IHDR chunk, JPEG SOFn segment,
    * and GIF logical-screen descriptor. (Pixel decoding stays behind
    * the [[MediaDecoder]] seam — that genuinely needs codecs.)
    *
    * Format references are the public specs: PNG (RFC 2083 §3.1: 8-byte
    * signature, IHDR first chunk, big-endian width/height, color-type →
    * channel count), JPEG/JFIF (ITU-T T.81 §B.2.2: marker segments
    * scanned until a frame header SOF0–SOF15 excluding DHT/JPG/DAC;
    * big-endian lines/samples, component count), GIF (GIF89a spec §18:
    * 6-byte signature, little-endian logical screen width/height).
    */
  object MediaHeaders {
    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

    val Unknown: (String, Int, Int, Int) = ("unknown", -1, -1, 0)

    /** (format, width, height, n_channels); [[Unknown]] when the bytes
      * match no recognized container or the header is truncated. */
    def parse(p: Array[Byte]): (String, Int, Int, Int) = {
      if (p == null) Unknown
      else if (isPng(p)) parsePng(p)
      else if (isJpeg(p)) parseJpeg(p)
      else if (isGif(p)) ("gif", le16(p, 6), le16(p, 8), 3)
      else if (isBmp(p)) parseBmp(p)
      else if (isWebp(p)) parseWebp(p)
      else if (isTiff(p)) parseTiff(p)
      else Unknown
    }

    /** TIFF 6.0 (published Adobe spec): byte-order mark "II"(LE) /
      * "MM"(BE) + magic 42, then a walked IFD whose SHORT/LONG entries
      * carry ImageWidth(256), ImageLength(257), SamplesPerPixel(277,
      * default 1). Inline SHORT values sit in the FIRST two bytes of
      * the 4-byte value field under BE and the low two under LE — the
      * classic TIFF trap, covered by planting both flavors. */
    private def isTiff(p: Array[Byte]): Boolean =
      p.length >= 8 &&
        ((p(0) == 'I' && p(1) == 'I' && (p(2) & 0xff) == 42 && p(3) == 0) ||
          (p(0) == 'M' && p(1) == 'M' && p(2) == 0 && (p(3) & 0xff) == 42))

    private def parseTiff(p: Array[Byte]): (String, Int, Int, Int) = {
      val le = p(0) == 'I'
      def u16(i: Int) = if (le) le16(p, i) else be16(p, i)
      def u32(i: Int) = if (le) le32(p, i) else be32(p, i) & 0xffffffffL
      val ifd = u32(4)
      if (ifd < 8 || ifd + 2 > p.length) return Unknown
      val n = u16(ifd.toInt)
      if (ifd + 2 + 12L * n > p.length) return Unknown
      var w = -1; var h = -1; var spp = 1
      var k = 0
      while (k < n) {
        val e = ifd.toInt + 2 + 12 * k
        val tag = u16(e)
        val typ = u16(e + 2)
        val cnt = u32(e + 4)
        // inline value: SHORT(3) reads 2 bytes at the value field's
        // start; LONG(4) reads all 4 — but ONLY when count == 1. A
        // multi-count entry stores an OFFSET in the value field
        // (TIFF 6.0 §2), which read as a value fabricates dimensions;
        // such entries are skipped (r9 ADVICE).
        val v: Long =
          if (cnt != 1L) -1L
          else if (typ == 3) u16(e + 8).toLong
          else if (typ == 4) u32(e + 8)
          else -1L
        if (v > 0) {
          if (tag == 256) w = v.toInt
          else if (tag == 257) h = v.toInt
          else if (tag == 277) spp = v.toInt
        }
        k += 1
      }
      if (w <= 0 || h <= 0) Unknown else ("tiff", w, h, spp)
    }

    /** BMP (Windows bitmap spec): "BM", DIB header at 14 — the modern
      * BITMAPINFOHEADER family (size ≥ 40: LE32 width, SIGNED LE32
      * height — negative means top-down, dimensions reported
      * absolute) and the legacy BITMAPCOREHEADER (size 12: LE16
      * fields). Channels from the bit-count: ≤8 palette-indexed → 1,
      * 16/24 → 3, 32 → 4. */
    private def isBmp(p: Array[Byte]): Boolean =
      p.length >= 26 && p(0) == 'B' && p(1) == 'M'

    private def bmpChannels(bits: Int): Int = bits match {
      case 1 | 4 | 8 => 1
      case 16 | 24 => 3
      case 32 => 4
      case _ => -1
    }

    private def parseBmp(p: Array[Byte]): (String, Int, Int, Int) = {
      val dib = le32(p, 14)
      if (dib >= 40 && p.length >= 14 + 40) {
        val w = le32(p, 18).toInt
        val h = le32(p, 22).toInt
        val ch = bmpChannels(le16(p, 28))
        if (w <= 0 || h == 0 || ch < 0) Unknown
        else ("bmp", w, math.abs(h), ch)
      } else if (dib == 12 && p.length >= 14 + 12) {
        val ch = bmpChannels(le16(p, 24))
        val (w, h) = (le16(p, 18), le16(p, 20))
        if (w == 0 || h == 0 || ch < 0) Unknown else ("bmp", w, h, ch)
      } else Unknown
    }

    /** WebP (RIFF container, Google's published format): "RIFF" …
      * "WEBP" then the first chunk decides the flavor — "VP8 " (lossy:
      * 3-byte frame tag, 9D 01 2A sync, 14-bit LE dimensions), "VP8L"
      * (lossless: 0x2F signature then width−1/height−1 as 14-bit
      * fields with an alpha flag at bit 28), "VP8X" (extended: flag
      * byte with alpha at 0x10, canvas−1 as 24-bit LE fields). */
    private def isWebp(p: Array[Byte]): Boolean =
      p.length >= 21 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'W' && p(9) == 'E' && p(10) == 'B' &&
        p(11) == 'P'

    private def le24(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)

    private def parseWebp(p: Array[Byte]): (String, Int, Int, Int) = {
      val tag = new String(p.slice(12, 16), "US-ASCII")
      tag match {
        case "VP8L" if p.length >= 25 && (p(20) & 0xff) == 0x2f =>
          val bits = le32(p, 21)
          val w = (bits & 0x3fff).toInt + 1
          val h = ((bits >> 14) & 0x3fff).toInt + 1
          val alpha = ((bits >> 28) & 1L) == 1L
          ("webp", w, h, if (alpha) 4 else 3)
        case "VP8 " if p.length >= 30 && (p(23) & 0xff) == 0x9d &&
          (p(24) & 0xff) == 0x01 && (p(25) & 0xff) == 0x2a =>
          ("webp", le16(p, 26) & 0x3fff, le16(p, 28) & 0x3fff, 3)
        case "VP8X" if p.length >= 30 =>
          val alpha = (p(20) & 0x10) != 0
          ("webp", le24(p, 24) + 1, le24(p, 27) + 1, if (alpha) 4 else 3)
        case _ => Unknown
      }
    }

    private def isPng(p: Array[Byte]): Boolean =
      p.length >= 29 && (p(0) & 0xff) == 0x89 && p(1) == 'P' &&
        p(2) == 'N' && p(3) == 'G' && (p(4) & 0xff) == 0x0d &&
        (p(5) & 0xff) == 0x0a && (p(6) & 0xff) == 0x1a &&
        (p(7) & 0xff) == 0x0a &&
        p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R'

    private def parsePng(p: Array[Byte]): (String, Int, Int, Int) = {
      // IHDR data: width(4 BE) height(4 BE) depth(1) colorType(1) …
      val channels = (p(25) & 0xff) match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette-indexed
        case 4 => 2 // gray + alpha
        case 6 => 4 // truecolor + alpha
        case _ => return Unknown
      }
      ("png", be32(p, 16), be32(p, 20), channels)
    }

    private def isGif(p: Array[Byte]): Boolean =
      p.length >= 13 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a'

    private def isJpeg(p: Array[Byte]): Boolean =
      p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8

    private def le32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

    /** Audio twin of [[parse]]: (format, sample_rate, n_channels,
      * bits_per_sample, n_samples), [[UnknownAudio]] for unrecognized
      * or truncated containers. Parses declared header fields only —
      * PCM WAV (RIFF chunk walk to `fmt `+`data`; n_samples =
      * declared data size / block align, so a truncated payload still
      * reports its header's promise) and FLAC STREAMINFO (fixed-layout
      * bit unpack). Both are published container layouts (RIFF/WAVE
      * multimedia spec; FLAC format spec). */
    def parseAudio(p: Array[Byte]): (String, Int, Int, Int, Long) = {
      if (p == null) UnknownAudio
      else if (isWav(p)) parseWav(p)
      else if (isFlac(p)) parseFlac(p)
      else parseMp3(p) // frame-sync probe last: weakest signature
    }

    /** MPEG-1 Layer III (ISO/IEC 11172-3 frame header): an optional
      * ID3v2 tag (10-byte header, SYNCSAFE 28-bit size) is skipped,
      * then the 4-byte frame header at the sync point decodes the
      * bitrate/sample-rate indices. bits_per_sample reports 0 (lossy —
      * there is none); n_samples is the CBR promise
      * floor(audioBytes / frameLen) · 1152, the same
      * header-declared-not-verified posture as [[parseWav]].
      * frameLen = 144000·kbps/rate + padding per the spec. */
    private def parseMp3(p: Array[Byte]): (String, Int, Int, Int, Long) = {
      val MaxSaneTag = Int.MaxValue - 32
      var o = 0L
      if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
        val size = ((p(6) & 0x7fL) << 21) | ((p(7) & 0x7fL) << 14) |
          ((p(8) & 0x7fL) << 7) | (p(9) & 0x7fL)
        o = 10L + size
      }
      if (o > MaxSaneTag || o + 4 > p.length) return UnknownAudio
      val i = o.toInt
      val b1 = p(i) & 0xff; val b2 = p(i + 1) & 0xff
      val b3 = p(i + 2) & 0xff; val b4 = p(i + 3) & 0xff
      // sync (11 bits), MPEG-1 (version bits 11), Layer III (01)
      if (b1 != 0xff || (b2 & 0xfe) != 0xfa) return UnknownAudio
      val kbps = Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
        192, 224, 256, 320, -1)((b3 >> 4) & 0xf)
      val rate = Array(44100, 48000, 32000, -1)((b3 >> 2) & 3)
      if (kbps <= 0 || rate <= 0) return UnknownAudio
      val padding = (b3 >> 1) & 1
      val channels = if (((b4 >> 6) & 3) == 3) 1 else 2
      val frameLen = 144000L * kbps / rate + padding
      // A 4-byte pattern that happens to start FF FA/FB is not an MPEG
      // stream. Two structural checks (r9 ADVICE — a 2-byte sync probe
      // alone over-claims): the payload must hold at least ONE full
      // declared frame, and when a second frame header fits, its sync
      // word must appear at offset frameLen (CBR streams repeat the
      // header every frameLen bytes).
      if (p.length - o < frameLen) return UnknownAudio
      if (o + frameLen + 4 <= p.length) {
        val j = (o + frameLen).toInt
        if ((p(j) & 0xff) != 0xff || (p(j + 1) & 0xfe) != 0xfa)
          return UnknownAudio
      }
      val frames = (p.length - o) / frameLen
      ("mp3", rate, channels, 0, frames * 1152L)
    }

    val UnknownAudio: (String, Int, Int, Int, Long) =
      ("unknown", -1, -1, -1, -1L)

    private def isWav(p: Array[Byte]): Boolean =
      p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' &&
        p(11) == 'E'

    /** RIFF chunk walk: chunks are (id(4), size(4 LE), payload) —
      * unknown chunks (LIST, fact, …) skip by declared size; stop once
      * both `fmt ` and `data` have been seen. Odd chunk sizes pad to
      * even per the RIFF spec. */
    private def parseWav(p: Array[Byte]): (String, Int, Int, Int, Long) = {
      // Long cursor: a hostile 32-bit chunk size (up to 0xFFFFFFFF)
      // truncated to Int can go negative and stall or reverse the walk.
      var i = 12L
      var rate = -1; var ch = -1; var bits = -1; var blockAlign = -1
      var dataSize = -1L
      while (i + 8 <= p.length && (rate < 0 || dataSize < 0)) {
        val id = new String(p, i.toInt, 4, "US-ASCII")
        val size = le32(p, i.toInt + 4)
        if (id == "fmt ") {
          if (i + 24 > p.length) return UnknownAudio
          ch = le16(p, i.toInt + 10)
          rate = le32(p, i.toInt + 12).toInt
          blockAlign = le16(p, i.toInt + 20)
          bits = le16(p, i.toInt + 22)
        } else if (id == "data") dataSize = size
        i += 8 + size + (size & 1)
      }
      if (rate <= 0 || ch <= 0 || blockAlign <= 0 || dataSize < 0)
        UnknownAudio
      else ("wav", rate, ch, bits, dataSize / blockAlign)
    }

    /** Video twin: (format, major_brand, timescale, duration,
      * duration_ms) from an ISO-BMFF (MP4/MOV) container — the
      * published box grammar: length-prefixed boxes walked top-level
      * for `ftyp` (brand) and `moov`, whose children are walked for
      * `mvhd` (movie header: timescale + duration, version 0 = 32-bit
      * fields, version 1 = 64-bit). Both boxes must be present;
      * anything else is [[UnknownVideo]]. */
    def parseVideo(p: Array[Byte]): (String, String, Int, Long, Long) = {
      if (p == null) return UnknownVideo
      var i = 0L
      var brand = ""
      var ts = -1
      var dur = -1L
      while (i + 8 <= p.length && (brand.isEmpty || ts < 0)) {
        val size = be32(p, i.toInt) & 0xffffffffL
        if (size < 8) return UnknownVideo // 0/1 (to-EOF / 64-bit) unsupported
        val typ = new String(p, i.toInt + 4, 4, "US-ASCII")
        if (typ == "ftyp") {
          if (i + 12 > p.length) return UnknownVideo
          brand = new String(p, i.toInt + 8, 4, "US-ASCII")
        } else if (typ == "moov") {
          // child walk inside [i+8, i+size)
          var j = i + 8
          val end = math.min(i + size, p.length.toLong)
          while (j + 8 <= end && ts < 0) {
            val csize = be32(p, j.toInt) & 0xffffffffL
            if (csize < 8) return UnknownVideo
            val ctyp = new String(p, j.toInt + 4, 4, "US-ASCII")
            if (ctyp == "mvhd" && j + 12 <= end) {
              val v = p(j.toInt + 8) & 0xff
              if (v == 0 && j + 28 <= end) {
                ts = be32(p, j.toInt + 20)
                dur = be32(p, j.toInt + 24) & 0xffffffffL
              } else if (v == 1 && j + 40 <= end) {
                ts = be32(p, j.toInt + 28)
                dur = ((be32(p, j.toInt + 32) & 0xffffffffL) << 32) |
                  (be32(p, j.toInt + 36) & 0xffffffffL)
              } else return UnknownVideo
            }
            j += csize
          }
        }
        i += size
      }
      if (brand.isEmpty || ts <= 0 || dur < 0 ||
          dur > Long.MaxValue / 1000L) UnknownVideo // ms conv would overflow
      else ("mp4", brand, ts, dur, dur * 1000L / ts)
    }

    val UnknownVideo: (String, String, Int, Long, Long) =
      ("unknown", "", -1, -1L, -1L)

    private def isFlac(p: Array[Byte]): Boolean =
      p.length >= 42 && p(0) == 'f' && p(1) == 'L' && p(2) == 'a' &&
        p(3) == 'C' && (p(4) & 0x7f) == 0 // first block is STREAMINFO

    /** STREAMINFO fixed layout (34 bytes at offset 8): sample rate is
      * 20 bits, channels-1 is 3, bits-1 is 5, total samples is 36 —
      * straight bit unpack, no chunk walk needed. */
    private def parseFlac(p: Array[Byte]): (String, Int, Int, Int, Long) = {
      val rate = ((p(18) & 0xff) << 12) | ((p(19) & 0xff) << 4) |
        ((p(20) & 0xff) >>> 4)
      val ch = ((p(20) >>> 1) & 0x7) + 1
      val bits = (((p(20) & 1) << 4) | ((p(21) & 0xff) >>> 4)) + 1
      val samples = ((p(21) & 0x0fL) << 32) | ((p(22) & 0xffL) << 24) |
        ((p(23) & 0xffL) << 16) | ((p(24) & 0xffL) << 8) | (p(25) & 0xffL)
      if (rate <= 0) UnknownAudio else ("flac", rate, ch, bits, samples)
    }

    /** Walk marker segments to the first frame header. SOF markers are
      * 0xC0–0xCF minus DHT (C4), JPG (C8), DAC (CC); everything else
      * before the scan carries a 2-byte big-endian length to skip. */
    private def parseJpeg(p: Array[Byte]): (String, Int, Int, Int) = {
      var i = 2
      while (i + 3 < p.length) {
        if ((p(i) & 0xff) != 0xff) return Unknown // lost marker sync
        val m = p(i + 1) & 0xff
        if (m == 0xff) i += 1 // fill byte
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
            m != 0xcc) {
          // SOFn: len(2) precision(1) height(2 BE) width(2 BE) ncomp(1)
          return if (i + 9 < p.length)
            ("jpeg", be16(p, i + 7), be16(p, i + 5), p(i + 9) & 0xff)
          else Unknown
        }
        else if (m == 0xd9 || m == 0xda) return Unknown // scan/EOI, no SOF
        else {
          val len = be16(p, i + 2)
          if (len < 2) return Unknown
          i += 2 + len
        }
      }
      Unknown
    }
  }

  /** [[MediaDecoder]] whose `decode` reads REAL container headers via
    * [[MediaHeaders]] (n_frames fixed at 1 — frame counting needs the
    * codec); unknown payloads surface as (-1, -1, 0, 1) rather than a
    * throw so one corrupt object can't fail a 100 TB stage. Feature
    * extraction still needs pixel decoding → inherits the stub. */
  class ImageHeaderDecoder extends StubDecoder {
    override def decode(payload: Array[Byte]): (Int, Int, Int, Int) = {
      val (_, w, h, c) = MediaHeaders.parse(payload)
      (w, h, c, 1)
    }
  }

  /** REAL pixel decoding behind the seam — the DEFAULT decoder. Backed
    * by the JDK's own `javax.imageio` (PNG/JPEG/GIF/BMP/TIFF readers
    * ship with the JDK), so no external codec library is required.
    *
    * The container header is probed FIRST ([[MediaHeaders.parse]] —
    * allocation-free byte inspection): only payloads that look like a
    * recognized image container attempt an ImageIO decode, so the
    * non-image/synthetic payloads of a mixed 100 TB media column skip
    * straight to the [[StubDecoder]] fallback without paying a failed
    * codec call. Anything ImageIO cannot turn into pixels (truncated
    * body, hostile header, unsupported flavor) degrades to the stub
    * the same way rather than throwing — one corrupt object can't
    * fail a stage, and the gate's synthetic payloads keep their
    * deterministic stub signatures.
    *
    * Per-partition lifecycle: [[open]] disables ImageIO's disk cache
    * once per partition so decode stays in task memory (the
    * documented heavyweight-init seam).
    *
    * [[grayGrid]] area-averages REAL luminance (integer ITU-R BT.601
    * weights 299/587/114) over each cell's pixel block — the actual
    * decode-then-downscale a perceptual hash wants, so dHash bits
    * reflect true image gradients on encoded inputs (spec-pinned
    * locality on real PNG/JPEG bytes in MultimodalSpec).
    *
    * Decompression-bomb guard: payloads whose header DECLARES more than
    * [[MaxDecodePixels]] pixels (64M ≈ 256 MB ARGB raster) never reach
    * `ImageIO.read` — they take the header-only rung, so a tiny hostile
    * payload can't OOM an executor (OutOfMemoryError is not an
    * `Exception`; no catch would save the task). */
  class ImageIoDecoder extends StubDecoder {
    override def open(): Unit = javax.imageio.ImageIO.setUseCache(false)

    private def readImage(p: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      if (p == null) return None
      val (fmt, w, h, _) = MediaHeaders.parse(p)
      // Decompression-bomb guard: a hostile-but-valid header can declare
      // e.g. 60000x60000, and ImageIO.read would allocate the full raster
      // — the resulting OutOfMemoryError is an Error, not an Exception,
      // so the catch below would NOT save the task. Refuse the codec call
      // when the DECLARED raster exceeds the pixel cap and fall to the
      // header-only rung instead (the declared dims still surface there).
      // w/h <= 0 covers declared dims past 2^31 (big-endian reads wrap
      // negative) — refuse those too rather than hand them to a codec
      if (fmt == "unknown" || w <= 0 || h <= 0 ||
          w.toLong * h.toLong > MaxDecodePixels) None
      else try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(p)))
      catch { case _: Exception => None } // corrupt body → fallback
    }

    override def decode(payload: Array[Byte]): (Int, Int, Int, Int) =
      readImage(payload) match {
        case Some(img) =>
          (img.getWidth, img.getHeight,
            img.getColorModel.getNumComponents, 1)
        case None =>
          // header-only middle rung: real container metadata when the
          // header parses even though the pixels don't
          val (fmt, w, h, c) = MediaHeaders.parse(payload)
          if (fmt != "unknown" && w > 0) (w, h, c, 1)
          else super.decode(payload)
      }

    override def grayGrid(payload: Array[Byte], cols: Int,
                          rows: Int): Array[Int] =
      readImage(payload) match {
        case Some(img) => areaGray(img, cols, rows)
        case None      => super.grayGrid(payload, cols, rows)
      }

    /** REAL transcode: decode → integer per-channel area-average into
      * a `w`×`h` RGB raster → re-encode as PNG (lossless, ships with
      * the JDK — the output stays decodable by this same ladder).
      * Undecodable payloads keep the stub slice, mirroring every
      * other rung of the fallback ladder. */
    override def resizeEncode(payload: Array[Byte], w: Int,
                              h: Int): Array[Byte] = {
      // output-side bomb guard, same class as the decode-side one: a
      // huge TARGET raster OOMs executors regardless of input size
      require(w >= 1 && h >= 1 && w.toLong * h <= Multimodal.MaxDecodePixels,
        s"resizeEncode target ${w}x$h exceeds MaxDecodePixels " +
          s"(${Multimodal.MaxDecodePixels})")
      readImage(payload) match {
        case Some(img) =>
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val iw = img.getWidth
          val ih = img.getHeight
          var y = 0
          while (y < h) {
            val y0 = (y.toLong * ih / h).toInt
            val y1 = math.max(((y + 1).toLong * ih / h).toInt, y0 + 1)
            var x = 0
            while (x < w) {
              val x0 = (x.toLong * iw / w).toInt
              val x1 = math.max(((x + 1).toLong * iw / w).toInt, x0 + 1)
              var sr = 0L; var sg = 0L; var sb = 0L; var n = 0
              var yy = y0
              while (yy < y1 && yy < ih) {
                var xx = x0
                while (xx < x1 && xx < iw) {
                  val rgb = img.getRGB(xx, yy)
                  sr += (rgb >> 16) & 0xff
                  sg += (rgb >> 8) & 0xff
                  sb += rgb & 0xff
                  n += 1
                  xx += 1
                }
                yy += 1
              }
              val m = math.max(n, 1)
              out.setRGB(x, y,
                (((sr / m).toInt & 0xff) << 16) |
                  (((sg / m).toInt & 0xff) << 8) | ((sb / m).toInt & 0xff))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          bos.toByteArray
        case None => super.resizeEncode(payload, w, h)
      }
    }

    /** cols×rows mean-luminance grid over the image's pixel blocks —
      * integer arithmetic throughout (deterministic across JVMs). */
    private def areaGray(img: java.awt.image.BufferedImage, cols: Int,
                         rows: Int): Array[Int] = {
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Int](cols * rows)
      var r = 0
      while (r < rows) {
        val y0 = (r.toLong * h / rows).toInt
        val y1 = math.max(((r + 1).toLong * h / rows).toInt, y0 + 1)
        var c = 0
        while (c < cols) {
          val x0 = (c.toLong * w / cols).toInt
          val x1 = math.max(((c + 1).toLong * w / cols).toInt, x0 + 1)
          var s = 0L
          var n = 0
          var y = y0
          while (y < y1 && y < h) {
            var x = x0
            while (x < x1 && x < w) {
              val rgb = img.getRGB(x, y)
              s += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                114 * (rgb & 0xff)) / 1000
              n += 1
              x += 1
            }
            y += 1
          }
          out(r * cols + c) = if (n == 0) 0 else (s / n).toInt
          c += 1
        }
        r += 1
      }
      out
    }
  }

  /** Typed dimensions straight off the media column: one narrow
    * mapPartitions over the payload bytes (no decoder init needed —
    * header inspection is allocation-free), NULL payloads dropped like
    * [[extractMeta]]. Output: (id, format, width, height, n_channels). */
  def imageDims(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_channels", IntegerType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        Option(r.getAs[Array[Byte]](mediaIdx)).map { payload =>
          val (fmt, w, h, c) = MediaHeaders.parse(payload)
          Row(r.get(idIdx), fmt, w, h, c)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** [[imageDims]]' audio twin: typed header metadata straight off a
    * binary audio column — (id, format, sample_rate, n_channels,
    * bits_per_sample, n_samples, duration_ms). Same narrow
    * allocation-free mapPartitions shape (header inspection only —
    * sample decoding stays behind the codec seam); NULL payloads
    * dropped. duration_ms is integer floor arithmetic
    * (n_samples·1000 / rate) so both engines agree bit-for-bit. */
  def audioMeta(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("format", StringType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_channels", IntegerType, nullable = false),
      StructField("bits_per_sample", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        Option(r.getAs[Array[Byte]](mediaIdx)).map { payload =>
          val (fmt, rate, ch, bits, samples) =
            MediaHeaders.parseAudio(payload)
          val durMs = if (rate > 0 && samples >= 0)
            samples * 1000L / rate else -1L
          Row(r.get(idIdx), fmt, rate, ch, bits, samples, durMs)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** [[audioMeta]]'s video twin: ISO-BMFF movie-header metadata —
    * (id, format, brand, timescale, duration, duration_ms). Same
    * narrow header-only mapPartitions; NULL payloads dropped. */
  def videoMeta(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("format", StringType, nullable = false),
      StructField("brand", StringType, nullable = false),
      StructField("timescale", IntegerType, nullable = false),
      StructField("duration", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        Option(r.getAs[Array[Byte]](mediaIdx)).map { payload =>
          val (fmt, brand, ts, dur, ms) = MediaHeaders.parseVideo(payload)
          Row(r.get(idIdx), fmt, brand, ts, dur, ms)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_channels", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Ingest a DIRECTORY of raw media files as binary rows via Spark's
    * `binaryFile` source — the on-ramp from an object-store media dump
    * (`s3a://bucket/images/…`) into the binary-column pipeline above.
    * Directory listing parallelizes on the cluster, `glob` prunes by
    * name BEFORE any byte is read (pathGlobFilter), and payloads enter
    * as a narrow scan that never shuffles — downstream is the
    * mapPartitions family. `media_id` is the xxhash64 of the file
    * path: stable across re-ingests, join-ready for the dedup/meta
    * stages. */
  def ingestBinaryDir(spark: SparkSession, dir: String,
                      glob: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    glob.foreach(g => reader.option("pathGlobFilter", g))
    reader.load(dir).select(
      xxhash64(col("path")).as("media_id"),
      col("path"),
      col("length"),
      col("content").as("media"))
  }

  /** Decode each payload and attach a typed `meta` struct. Narrow map;
    * decoder opened once per partition. */
  def extractMeta(df: DataFrame, idCol: String, mediaCol: String,
                  decoder: MediaDecoder = new ImageIoDecoder): DataFrame = {
    val outSchema = StructType(
      df.schema(idCol) +: Seq(StructField("meta", metaSchema, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      decoder.open()
      // NULL payloads are skipped (no decodable media → no row); the
      // declared non-null output schemas could not represent them
      rows.flatMap { r =>
        Option(r.getAs[Array[Byte]](mediaIdx)).map { payload =>
          val (w, h, c, f) = decoder.decode(payload)
          Row(r.get(idIdx), Row(w, h, c, f))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Sample up to `maxFrames` evenly-strided frames per payload and emit
    * one row per (doc, frame) with its feature vector — the row-
    * explosion shape of video frame extraction. */
  def frameFeatures(df: DataFrame, idCol: String, mediaCol: String,
                    maxFrames: Int = 4, dim: Int = 8,
                    decoder: MediaDecoder = new ImageIoDecoder): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      decoder.open()
      rows.filter(_.getAs[Array[Byte]](mediaIdx) != null).flatMap { r =>
        val payload = r.getAs[Array[Byte]](mediaIdx)
        val (_, _, _, nFrames) = decoder.decode(payload)
        val take = math.min(maxFrames, nFrames)
        val stride = math.max(1, nFrames / math.max(take, 1))
        (0 until take).iterator.map { i =>
          val frame = i * stride
          Row(r.get(idIdx), frame,
            decoder.features(payload, frame, dim).toSeq)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** One feature vector per document, computed in fixed-size BATCHES —
    * the batch shape of GPU/accelerator inference over a 100 TB media
    * column. The iterator is consumed lazily via `grouped(batchSize)`:
    * memory holds one batch of payloads per task (batchSize × payload,
    * not the partition), the decoder sees `featuresBatch` calls whose
    * size is capped at `batchSize`, and the output flattens back to
    * one row per doc. The analog of `mapInPandas` with
    * `maxRecordsPerBatch` on the Python side.
    */
  def batchedFeatures(df: DataFrame, idCol: String, mediaCol: String,
                      batchSize: Int = 64, dim: Int = 8,
                      decoder: MediaDecoder = new ImageIoDecoder): DataFrame = {
    require(batchSize >= 1, "batchSize must be positive")
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("features", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      decoder.open()
      rows.filter(_.getAs[Array[Byte]](mediaIdx) != null)
        .grouped(batchSize).flatMap { batch =>
          val ids = batch.map(_.get(idIdx))
          val payloads = batch.map(_.getAs[Array[Byte]](mediaIdx)).toArray
          val feats = decoder.featuresBatch(payloads, dim)
          ids.lazyZip(feats).map { (id, f) => Row(id, f.toSeq) }
        }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Resize: emit a transcoded payload + new dims through the decoder
    * seam ([[MediaDecoder.resizeEncode]]) — REAL decode → area-average
    * → PNG re-encode under the default [[ImageIoDecoder]]; the stub's
    * deterministic byte slice for undecodable payloads. Narrow-map
    * shape: payload bytes transform in place per partition, never
    * shuffle. */
  def resize(df: DataFrame, idCol: String, mediaCol: String,
             targetW: Int, targetH: Int,
             decoder: MediaDecoder = new ImageIoDecoder): DataFrame = {
    require(targetW >= 1 && targetH >= 1,
      s"resize target must be >= 1x1, got ${targetW}x$targetH")
    // the OUTPUT raster needs the same bomb guard as the decode side:
    // a 50000x50000 target would allocate a multi-GB TYPE_INT_RGB
    // buffer PER ROW on executors (and w*h can overflow Int)
    require(targetW.toLong * targetH <= MaxDecodePixels,
      s"resize target ${targetW}x$targetH exceeds MaxDecodePixels " +
        s"($MaxDecodePixels) — the per-row output raster would not fit " +
        "executor memory")
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("media", BinaryType, nullable = true),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      decoder.open()
      rows.filter(_.getAs[Array[Byte]](mediaIdx) != null).map { r =>
        val payload = r.getAs[Array[Byte]](mediaIdx)
        Row(r.get(idIdx), decoder.resizeEncode(payload, targetW, targetH),
          targetW, targetH)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** 64-bit difference hash (dHash) of each payload — the standard
    * perceptual image fingerprint (Krawetz's "kind of like that"
    * construction, the workhorse of image dedup): downscale frame 0 to
    * a 9×8 grayscale grid via the decoder seam, then one bit per
    * horizontally-adjacent cell pair (bit set ⇔ left < right). Robust
    * to what gradients survive — re-encoding, mild crops, brightness
    * shifts move few bits — while unrelated images land ~32 bits
    * apart. Narrow map, decoder opened once per partition, payload
    * bytes never shuffle: only (id, LONG) flows on.
    *
    * @return (id, phash: LONG) — NULL payloads dropped */
  def perceptualHash(df: DataFrame, idCol: String, mediaCol: String,
                     decoder: MediaDecoder = new ImageIoDecoder): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("phash", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      decoder.open()
      rows.flatMap { r =>
        Option(r.getAs[Array[Byte]](mediaIdx)).map { payload =>
          val g = decoder.grayGrid(payload, 9, 8)
          var h = 0L
          var row = 0
          while (row < 8) {
            var c = 0
            while (c < 8) {
              if (g(row * 9 + c) < g(row * 9 + c + 1))
                h |= 1L << (row * 8 + c)
              c += 1
            }
            row += 1
          }
          Row(r.get(idIdx), h)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Image near-duplicate pairs: [[perceptualHash]] signatures pushed
    * through the shared banded Hamming join
    * ([[Dedup.hammingBandPairs]] — 4×16-bit bands, pigeonhole-complete
    * for Hamming ≤ 3, oversized buckets dropped, exact bit_count(xor)
    * verification). The image twin of SimHash text dedup: one narrow
    * hash scan + one band-keyed shuffle, NEVER all-pairs on payloads.
    *
    * @return (id_a, id_b, hamming) with id_a < id_b */
  def phashNearDupPairs(df: DataFrame, idCol: String, mediaCol: String,
                        maxHamming: Int = 3, maxBucket: Int = 1000,
                        decoder: MediaDecoder = new ImageIoDecoder): DataFrame =
    Dedup.hammingBandPairs(
      perceptualHash(df, idCol, mediaCol, decoder)
        .select(col(idCol).as("doc_id"), col("phash").as("sig")),
      maxHamming, maxBucket)
}
