package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal (image/audio/video) column support for training-data
 * pipelines: content is an opaque `binary` column plus a typed metadata
 * struct; decode / feature-extract / resize / frame-sample run
 * partition-wise so a codec binds once per partition. The codecs:
 *
 *  - [[ImageIoCodec]] — a REAL pure-JDK codec: `javax.imageio` decodes
 *    and re-encodes PNG/JPEG/BMP/GIF (true pixel resize + pixel
 *    access), and `javax.sound.sampled` parses WAV/AIFF headers
 *    (sample rate, exact duration). No external native libraries;
 *    spec-tested against real in-test-generated PNG/JPEG/WAV bytes.
 *  - [[BmpCodec]] / [[WavCodec]] — REAL hand-rolled codecs for the two
 *    uncompressed formats whose full byte math is SQL-replayable, so
 *    the `multimodal_real_*`/`_wav_*` oracle rows pin decode /
 *    transform / re-encode bit-for-bit.
 *  - [[AviCodec]] — a REAL MJPEG-in-AVI demuxer (RIFF chunk walk):
 *    container metadata + per-frame encoded payloads; frames then feed
 *    an image codec ([[demuxFrames]] ∘ [[imageTileStats]] — the
 *    two-stage shape every real video pipeline has).
 *  - [[Mp4Codec]] — a REAL MP4/ISO-BMFF METADATA box walk (the
 *    container real corpora actually carry); sample decode explicitly
 *    stays behind the ffmpeg seam.
 *  - [[StubCodec]] — the deterministic fake-header codec some ORACLE
 *    gates run on (the driver's synthetic `content` bytes are not real
 *    media, so those gates pin the plumbing with a codec whose outputs
 *    an external SQL engine can replay byte-for-byte); also documents
 *    the JNI binding contract for a real ffmpeg/libjpeg deployment.
 *
 * Scale notes: all operators are narrow (mapPartitions — no shuffle);
 * binary payloads never leave their partition; metadata-only consumers
 * should project the struct so Parquet column pruning drops the bytes.
 */
object Multimodal {

  /** The codec seam: total functions over untrusted bytes — corrupt or
    * foreign payloads return `unknown` / pass through, NEVER throw (a
    * single bad asset must not kill a 100 TB scan). Implementations
    * must be deterministic (same bytes → same outputs on every
    * executor) and serializable (objects, not handles — native handles
    * initialize per partition inside the operators). */
  trait MediaCodec extends Serializable {
    def decode(content: Array[Byte]): Row
    def resizeImage(content: Array[Byte], w: Int, h: Int): Array[Byte]
    /** Audio decimation by an integer factor (the audio twin of
      * [[resizeImage]]); the default passes through unchanged — only
      * codecs that own an audio format override (see [[WavCodec]]).
      * Same totality contract: non-audio/corrupt payloads return a
      * fresh copy of the input. */
    def resampleAudio(content: Array[Byte], factor: Int): Array[Byte] =
      if (content == null) null else content.clone()
    /** Signed 16-bit PCM samples when the payload is decodable audio;
      * null otherwise (default: codecs without an audio format). */
    def audioSamples(content: Array[Byte]): Array[Short] = null
    /** TOP-DOWN (w, h, interleaved BGR bytes, length w·h·3) when the
      * payload is a decodable image; null otherwise (default: codecs
      * without pixel access). */
    def imageBgr(content: Array[Byte]): ImagePixels = null
    /** The container's encoded frame payloads in stream order when the
      * payload is a DEMUXABLE video; null otherwise (default: codecs
      * without a demuxer). Demux ≠ decode: each entry is the stream's
      * raw encoded frame bytes (one JPEG per entry for MJPEG) — what a
      * frame extractor hands to the per-frame image decoder. */
    def videoFrames(content: Array[Byte]): Array[Array[Byte]] = null
  }

  /** [[MediaCodec.imageBgr]]'s return shape. */
  final case class ImagePixels(width: Int, height: Int, bgr: Array[Byte])

  /** Typed metadata carried alongside every binary asset. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),         // image | audio | video | unknown
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_frames", IntegerType),
    // ISO-BMFF only (r14): true when the stream carries movie fragments
    // (`moof` boxes / a `mvex` announcement) — moov-level duration is
    // then untrustworthy (routinely 0). Null for non-container kinds.
    StructField("fragmented", BooleanType)))

  /**
   * STUB CODEC — stands in for e.g. libjpeg/ffmpeg bindings, which are not
   * available in this environment. Deterministic: derives metadata from
   * the first bytes of the payload. A real deployment replaces only this
   * object; every operator below is codec-agnostic.
   *
   * ==JNI binding contract (what a real codec must provide, per operator)==
   *
   *  - '''Initialization''': one native handle per PARTITION, created at
   *    the top of each `mapPartitions` closure (the marked line in
   *    [[withDecodedMeta]]) and closed when the iterator is exhausted
   *    (wrap the iterator; JNI handles must never be serialized into the
   *    closure — create them executor-side only). Thread safety across
   *    partitions is the codec's problem: Spark may run many partitions
   *    per JVM concurrently, so either the handle is per-call cheap
   *    (libjpeg-turbo style) or it pools.
   *  - '''decode(bytes) → metadata''' ([[withDecodedMeta]]): must be
   *    total — null/garbage/truncated payloads return the `unknown` row,
   *    NEVER throw (a single corrupt asset must not kill a 100 TB scan);
   *    fields it cannot determine stay null. Must not retain `bytes`.
   *  - '''resizeImage(bytes, w, h) → bytes''' ([[resizeImages]]): full
   *    re-encode; must return a NEW array (the input row may be reused
   *    by Spark), and non-image/corrupt payloads return the input
   *    unchanged (pass-through is pinned by the `multimodal_resize`
   *    oracle row's md5-over-payload check).
   *  - '''frame iteration''' ([[sampleFrames]]): replace the fixed-size
   *    chunking with the codec's frame boundaries but KEEP the emitted
   *    shape — (asset_id, frame_index, frame bytes) with `frame_index`
   *    counting kept frames from 0; the downstream explode/schema
   *    contract does not change.
   *  - '''determinism''': same bytes → same outputs on every executor,
   *    or the oracle rows (md5-over-payload) and speculative execution
   *    both break. Codecs with threading-dependent output must be pinned.
   */
  object StubCodec extends MediaCodec {
    def decode(content: Array[Byte]): Row = {
      if (content == null || content.length < 4) return Row("unknown", null, null, null, null, null, null)
      def b(i: Int): Int = content(i) & 0xff
      b(0) % 3 match {
        case 0 => Row("image", 64 + b(1) % 192, 64 + b(2) % 192, null, null, null, null)
        case 1 => Row("audio", null, null, 8000 + 100 * b(1), (1000L + b(2) * 37L), null, null)
        case 2 => Row("video", 320 + b(1) % 64, 240 + b(2) % 64, null, (2000L + b(3) * 53L), 24 + b(3) % 36, null)
      }
    }
    /** STUB resize: a real codec re-encodes pixels; this re-headers. */
    def resizeImage(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = content.clone()
      if (out.length >= 3) { out(1) = (w % 192).toByte; out(2) = (h % 192).toByte }
      out
    }
  }

  /**
   * REAL pure-JDK media codec — no external libraries:
   *
   *  - images via `javax.imageio` (PNG/JPEG/BMP/GIF in any stock JDK):
   *    `decode` reads true pixel dimensions; `resizeImage` repaints into
   *    a `w`×`h` RGB raster (bilinear) and re-encodes as PNG — a real
   *    re-encode, not byte surgery;
   *  - audio via `javax.sound.sampled` (WAV/AIFF/AU): sample rate and
   *    exact `duration_ms = frames · 1000 / frameRate`;
   *  - anything else (including real video, which the JDK cannot demux)
   *    → `unknown` / pass-through, per the [[MediaCodec]] totality
   *    contract.
   *
   * Determinism: ImageIO decode and PNG encode are pure-Java and
   * bit-stable for a given JDK; file-cache temp I/O is disabled
   * process-wide up front so executors never touch disk per asset.
   */
  object ImageIoCodec extends MediaCodec {
    javax.imageio.ImageIO.setUseCache(false)

    private def unknownRow = Row("unknown", null, null, null, null, null, null)

    def decode(content: Array[Byte]): Row = {
      if (content == null || content.length == 0) return unknownRow
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        if (img != null) return Row("image", img.getWidth, img.getHeight, null, null, null, null)
      } catch { case _: Throwable => }
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(content))
        val fmt = aff.getFormat
        val frames = aff.getFrameLength
        val dur: java.lang.Long =
          if (frames >= 0 && fmt.getFrameRate > 0)
            java.lang.Long.valueOf((frames * 1000L / fmt.getFrameRate.toDouble).round)
          else null
        return Row("audio", null, null, Integer.valueOf(fmt.getSampleRate.toInt), dur, null, null)
      } catch { case _: Throwable => }
      unknownRow
    }

    def resizeImage(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      if (content == null) return null
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        if (img == null) return content.clone()
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        baos.toByteArray
      } catch { case _: Throwable => content.clone() }
    }

    /** REAL pixel access for any ImageIO-decodable format (PNG/JPEG/
      * BMP/GIF) — what lets [[imageTileStats]]/[[imageHash]] consume
      * the JPEG frame payloads [[AviCodec.videoFrames]] demuxes (the
      * demux → decode → pixel-stats composition of a real MJPEG
      * pipeline). `getRGB` normalizes every color model to sRGB ints,
      * so the BGR layout matches [[BmpCodec.imageBgr]]'s contract. */
    override def imageBgr(content: Array[Byte]): ImagePixels = {
      if (content == null) return null
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        if (img == null) return null
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val o = (y * w + x) * 3
            out(o) = rgb.toByte
            out(o + 1) = (rgb >> 8).toByte
            out(o + 2) = (rgb >> 16).toByte
            x += 1
          }
          y += 1
        }
        ImagePixels(w, h, out)
      } catch { case _: Throwable => null }
    }
  }

  /**
   * REAL hand-rolled codec for UNCOMPRESSED 24-bit BMP — the one format
   * whose full decode → transform → re-encode byte math is exact
   * integer arithmetic, so the `multimodal_*_real` oracle rows replay
   * it bit-for-bit in SQL (headers are fixed-offset little-endian
   * fields; pixels are raw BGR rows, bottom-up, 4-byte-padded — no
   * entropy coder anywhere). [[ImageIoCodec]] remains the
   * general-purpose JDK codec (PNG/JPEG re-encodes are deterministic
   * per JDK but not SQL-replayable); [[StubCodec]] remains the JNI
   * contract anchor.
   *
   *  - `decode`: parses 'BM' magic + BITMAPINFOHEADER or its V2-V5
   *    extensions — 24/32 bpp, BI_RGB or canonical-mask BI_BITFIELDS,
   *    bottom-up or top-down (negative height), bfOffBits honored
   *    (round-14 tolerant walk) — anything outside that whitelist
   *    (paletted, RLE, CORE header, exotic masks) is `unknown`, per
   *    the totality contract.
   *  - `resizeImage`: nearest-neighbor resample
   *    (`src = floor(dst · srcDim / dstDim)`, pure integer) re-encoded
   *    through [[BmpCodec.encode]]'s canonical header — corrupt or
   *    non-BMP payloads pass through as a fresh copy.
   */
  object BmpCodec extends MediaCodec {
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def put32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    private def rowBytes(w: Int, bypp: Int = 3): Int = (w * bypp + 3) & ~3

    /** Decoded layout `(width, height, dataOffset, bytesPerPixel,
      * topDown)` — the tolerant walk (round 14, the WAV/MP4 lesson
      * applied to the last canonical-only codec): real corpora ship
      * BITMAPV2-V5 headers (biSize 52/56/108/124 — Windows clipboard
      * and screenshot writers emit V5), TOP-DOWN rows (negative
      * height, the video-pipeline convention), 32 bpp BGRA, and
      * BI_BITFIELDS whose masks are just the canonical BGR layout
      * spelled out — all of which previously degraded to `unknown`
      * pass-through. Whitelist totality holds: paletted/RLE/CORE
      * headers and exotic masks still return None. `bfOffBits` is
      * honored (gap bytes between header and pixels are real-world
      * normal) and every pixel row must be present. */
    private def parse(b: Array[Byte]): Option[(Int, Int, Int, Int, Boolean)] = {
      if (b == null || b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
      val biSize = u32(b, 14)
      // BITMAPINFOHEADER + V2/V3/V4/V5 sizes; BITMAPCOREHEADER (12) has
      // a different field layout entirely — unknown
      if (biSize != 40L && biSize != 52L && biSize != 56L &&
          biSize != 108L && biSize != 124L) return None
      val w = u32(b, 18)
      val hRaw = u32(b, 22).toInt // signed read: negative = top-down
      val topDown = hRaw < 0
      val hL = math.abs(hRaw.toLong)
      if (w <= 0 || w > (1 << 20) || hL <= 0 || hL > (1 << 20)) return None
      if (u16(b, 26) != 1) return None
      val bpp = u16(b, 28)
      if (bpp != 24 && bpp != 32) return None
      val bypp = bpp / 8
      val comp = u32(b, 30)
      val maskBytes = comp match {
        case 0L => 0 // BI_RGB
        case 3L =>
          // BI_BITFIELDS decodes ONLY when the masks spell the
          // canonical BGR(A) byte layout (R 0xFF0000 / G 0xFF00 /
          // B 0xFF) — identical memory order to BI_RGB, so the pixel
          // path needs no mask arithmetic; channel-swapped or packed
          // (565) masks stay unknown. For biSize 40/52/56 the three
          // masks FOLLOW the header; for V4/V5 they live inside it —
          // absolute offsets 54/58/62 either way (header starts at 14).
          if (b.length < 66) return None
          if (u32(b, 54) != 0xFF0000L || u32(b, 58) != 0xFF00L ||
              u32(b, 62) != 0xFFL) return None
          if (biSize <= 56L) 12 else 0
        case _ => return None // RLE4/RLE8/JPEG/PNG embeddings
      }
      val off = u32(b, 10)
      if (off < 14 + biSize + maskBytes || off > Int.MaxValue) return None
      val h = hL.toInt
      val need = off + rowBytes(w.toInt, bypp).toLong * h
      if (need > b.length) return None
      Some((w.toInt, h, off.toInt, bypp, topDown))
    }

    /** Canonical encoder: 54-byte header (data offset 54, 2835 ppm),
      * bottom-up BGR rows, zero padding. `pix(x, y)` returns packed
      * 0xRRGGBB for IMAGE coordinates (y = 0 is the top row). */
    def encode(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
      val rb = rowBytes(w)
      val out = new Array[Byte](54 + rb * h)
      out(0) = 'B'.toByte; out(1) = 'M'.toByte
      put32(out, 2, out.length); put32(out, 10, 54); put32(out, 14, 40)
      put32(out, 18, w); put32(out, 22, h)
      out(26) = 1.toByte; out(28) = 24.toByte
      put32(out, 34, rb * h); put32(out, 38, 2835); put32(out, 42, 2835)
      var r = 0
      while (r < h) {
        val y = h - 1 - r
        var x = 0
        while (x < w) {
          val p = pix(x, y)
          val o = 54 + r * rb + x * 3
          out(o) = p.toByte                  // B
          out(o + 1) = (p >> 8).toByte       // G
          out(o + 2) = (p >> 16).toByte      // R
          x += 1
        }
        r += 1
      }
      out
    }

    def decode(content: Array[Byte]): Row = parse(content) match {
      case Some((w, h, _, _, _)) => Row("image", w, h, null, null, null, null)
      case None => Row("unknown", null, null, null, null, null, null)
    }

    override def imageBgr(content: Array[Byte]): ImagePixels =
      parse(content) match {
        case None => null
        case Some((w, h, off, bypp, topDown)) =>
          val rb = rowBytes(w, bypp)
          val out = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            // bottom-up files store image row y at file row h-1-y;
            // top-down files store rows in image order. 32 bpp rows are
            // BGRA — the alpha byte is simply skipped (BGR prefix is
            // byte-identical to the 24 bpp layout)
            val src = off + (if (topDown) y else h - 1 - y) * rb
            var x = 0
            while (x < w) {
              val s = src + x * bypp
              val d = (y * w + x) * 3
              out(d) = content(s)
              out(d + 1) = content(s + 1)
              out(d + 2) = content(s + 2)
              x += 1
            }
            y += 1
          }
          ImagePixels(w, h, out)
      }

    def resizeImage(content: Array[Byte], w2: Int, h2: Int): Array[Byte] =
      parse(content) match {
        case None => if (content == null) null else content.clone()
        case Some((w, h, off, bypp, topDown)) =>
          val rb = rowBytes(w, bypp)
          // re-encode is CANONICAL (24 bpp bottom-up, offset 54) —
          // resize normalizes variant headers, like downsampleAudio
          // re-emits the canonical WAV layout
          encode(w2, h2, (x2, y2) => {
            val sx = x2 * w / w2; val sy = y2 * h / h2
            val o = off + (if (topDown) sy else h - 1 - sy) * rb + sx * bypp
            ((content(o + 2) & 0xff) << 16) | ((content(o + 1) & 0xff) << 8) |
              (content(o) & 0xff)
          })
      }
  }

  /**
   * REAL hand-rolled codec for UNCOMPRESSED 16-bit PCM WAV — the
   * audio twin of [[BmpCodec]]: the RIFF container is little-endian
   * chunked fields and raw samples (no entropy coder), so the
   * full decode → decimate → re-encode byte math is exact integer
   * arithmetic the `multimodal_wav_*` oracle rows replay in SQL.
   * [[ImageIoCodec]] stays the general-purpose JDK audio header
   * parser; this codec additionally OWNS the samples, so it can
   * transform audio, not just describe it.
   *
   * TOLERANT RIFF chunk walking (round 14 — the r13 MP4 lesson applied
   * to audio; real corpora never ship the canonical 44-byte layout):
   * `decode` walks the `RIFF…WAVE` chunk list in ANY order, skipping
   * `LIST`/`fact`/`JUNK`/unknown chunks (with the RIFF odd-size pad
   * rule, tolerating a missing pad on the final chunk), and accepts
   *  - `fmt ` chunks of ANY size >= 16: plain PCM (format 1) and
   *    WAVE_FORMAT_EXTENSIBLE (format 0xFFFE, cbSize >= 22, SubFormat
   *    GUID = KSDATAFORMAT_SUBTYPE_PCM) — the two shapes every real
   *    PCM WAV uses;
   *  - mono AND stereo (16-bit only; blockAlign/byteRate must be
   *    consistent). Stereo sample access follows a documented
   *    FIRST-CHANNEL policy: [[audioSamples]] returns channel 0 (no
   *    silent downmix arithmetic — deterministic and invertible);
   *    [[resampleAudio]] decimates FRAMES, preserving every channel.
   * Structural violations (truncated chunk, duplicate `data` or
   * `fmt `, inconsistent fmt fields, trailing bytes past the declared
   * RIFF size) fail the whole file to `unknown`, per the totality
   * contract. `duration_ms = n_frames · 1000 / rate` (integer floor).
   *
   *  - `resampleAudio(bytes, k)`: keep every k-th FRAME and divide the
   *    sample rate by k (classic decimation — duration is preserved,
   *    resolution drops), re-encoded in the CANONICAL layout (a
   *    shuffled/padded input normalizes — deterministic bytes either
   *    way). Only payloads whose rate k divides exactly decimate;
   *    anything else (including non-WAV) passes through as a fresh
   *    copy, so the operator stays total per-row.
   */
  object WavCodec extends MediaCodec {
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def put32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    private def tag(b: Array[Byte], o: Int, s: String): Boolean =
      s.indices.forall(i => b(o + i) == s.charAt(i).toByte)

    /** KSDATAFORMAT_SUBTYPE_PCM = 00000001-0000-0010-8000-00AA00389B71,
      * as the 16 GUID bytes a WAVE_FORMAT_EXTENSIBLE fmt chunk carries. */
    private val PcmGuid: Array[Byte] = Array[Int](
      1, 0, 0, 0, 0, 0, 0x10, 0, 0x80, 0,
      0, 0xAA, 0, 0x38, 0x9B, 0x71).map(_.toByte)

    private final case class Wav(rate: Int, channels: Int, dataOff: Int, frames: Int)

    /** Tolerant RIFF walk (see object scaladoc). None on any structural
      * violation — the file then decodes `unknown` rather than risking
      * garbage fields. */
    private def parse(b: Array[Byte]): Option[Wav] = {
      if (b == null || b.length < 12) return None
      if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
      val riffSize = u32(b, 4)
      // the declared region must hold at least "WAVE" and exactly span
      // the payload: trailing bytes are a structural violation (the
      // MP4 walk's rule — random binaries must not half-parse)
      if (riffSize < 4 || 8 + riffSize != b.length) return None
      val end = (8 + riffSize).toInt
      var fmt: Option[(Int, Int)] = None   // (rate, channels)
      var data: Option[(Int, Int)] = None  // (offset, size)
      var o = 12
      while (o < end) {
        if (o + 8 > end) return None
        val size = u32(b, o + 4)
        if (size > end - o - 8) return None
        val ps = o + 8
        if (tag(b, o, "fmt ")) {
          if (fmt.isDefined || size < 16) return None
          val format = u16(b, ps)
          val ch = u16(b, ps + 2)
          val rate = u32(b, ps + 4)
          val byteRate = u32(b, ps + 8)
          val blockAlign = u16(b, ps + 12)
          val bits = u16(b, ps + 14)
          val pcm = format match {
            case 1 => true
            case 0xFFFE => // WAVE_FORMAT_EXTENSIBLE: PCM iff the GUID says so
              size >= 40 && u16(b, ps + 16) >= 22 &&
                PcmGuid.indices.forall(i => b(ps + 24 + i) == PcmGuid(i))
            case _ => false
          }
          if (!pcm || (ch != 1 && ch != 2) || bits != 16) return None
          if (rate <= 0 || rate > 2000000L) return None
          if (blockAlign != ch * 2 || byteRate != rate * blockAlign) return None
          fmt = Some((rate.toInt, ch))
        } else if (tag(b, o, "data")) {
          if (data.isDefined) return None // ambiguous: two sample payloads
          data = Some((ps, size.toInt))
        }
        // advance over the payload + the RIFF odd-size pad byte; a
        // missing pad on the FINAL chunk is tolerated (common in the wild)
        o = ps + size.toInt
        if (size % 2 == 1 && o < end) o += 1
      }
      for ((rate, ch) <- fmt; (off, sz) <- data; if sz % (ch * 2) == 0)
        yield Wav(rate, ch, off, sz / (ch * 2))
    }

    /** Canonical encoder: 44-byte header, little-endian 16-bit
      * samples, frames interleaved when `channels` = 2. */
    def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
      require(sampleRate > 0, s"bad sample rate $sampleRate")
      require(channels == 1 || channels == 2, s"bad channel count $channels")
      require(samples.length % channels == 0,
        s"${samples.length} samples do not interleave into $channels channels")
      val out = new Array[Byte](44 + samples.length * 2)
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      put32(out, 4, 36 + samples.length * 2)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      put32(out, 16, 16)
      out(20) = 1; out(22) = channels.toByte
      put32(out, 24, sampleRate); put32(out, 28, sampleRate * 2 * channels)
      out(32) = (2 * channels).toByte; out(34) = 16
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      put32(out, 40, samples.length * 2)
      var i = 0
      while (i < samples.length) {
        out(44 + 2 * i) = samples(i).toByte
        out(44 + 2 * i + 1) = (samples(i) >> 8).toByte
        i += 1
      }
      out
    }

    /** Mono canonical encoder (the pre-r14 signature, kept verbatim —
      * gate byte math depends on it). */
    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] =
      encode(sampleRate, 1, samples)

    def decode(content: Array[Byte]): Row = parse(content) match {
      case Some(w) =>
        Row("audio", null, null, Integer.valueOf(w.rate),
          java.lang.Long.valueOf(w.frames * 1000L / w.rate), null, null)
      case None => Row("unknown", null, null, null, null, null, null)
    }

    /** Not an image codec: pass-through per the totality contract. */
    def resizeImage(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (content == null) null else content.clone()

    override def resampleAudio(content: Array[Byte], factor: Int): Array[Byte] =
      parse(content) match {
        case Some(w) if factor >= 1 && w.rate % factor == 0 =>
          val kept = (w.frames + factor - 1) / factor
          val samples = new Array[Short](kept * w.channels)
          var i = 0
          while (i < kept) {
            var c = 0
            while (c < w.channels) {
              val o = w.dataOff + 2 * (i * factor * w.channels + c)
              samples(i * w.channels + c) =
                ((content(o) & 0xff) | (content(o + 1) << 8)).toShort
              c += 1
            }
            i += 1
          }
          encode(w.rate / factor, w.channels, samples)
        case _ => if (content == null) null else content.clone()
      }

    override def audioSamples(content: Array[Byte]): Array[Short] =
      parse(content) match {
        case Some(w) =>
          // FIRST-CHANNEL policy for stereo (documented above)
          val out = new Array[Short](w.frames)
          var i = 0
          while (i < w.frames) {
            val o = w.dataOff + 2 * i * w.channels
            out(i) = ((content(o) & 0xff) | (content(o + 1) << 8)).toShort
            i += 1
          }
          out
        case None => null
      }
  }

  /**
   * REAL hand-rolled MJPEG-in-AVI demuxer — the video twin of
   * [[BmpCodec]]/[[WavCodec]], closing the "video is chunk-based" gap:
   * an AVI is a RIFF container (fixed little-endian chunk headers, no
   * entropy coding of the CONTAINER itself), so a canonical
   * single-video-stream MJPEG AVI can be muxed and demuxed with pure
   * integer byte math — exactly the walk `ffprobe`/any player performs.
   * The frame PAYLOADS stay opaque encoded bytes (one JPEG per `00dc`
   * chunk in real MJPEG; [[videoFrames]] is a demuxer, not a frame
   * decoder — the per-frame payload goes to an image codec next, the
   * same two-stage shape every real video pipeline has).
   *
   * Canonical layout written by [[encode]] and required by [[parse]]
   * (anything else → `unknown`/null, per the totality contract):
   * {{{
   * RIFF <size> AVI
   *   LIST 192 hdrl
   *     avih 56   (usPerFrame, 0, 0, 0, totalFrames, 0, 1 stream, 0, w, h, 0×4)
   *     LIST 116 strl
   *       strh 56 (vids/MJPG, ..., scale=1, rate=fps, length=totalFrames)
   *       strf 40 (BITMAPINFOHEADER: 40, w, h, 1 plane, 24bpp, 'MJPG')
   *   LIST <size> movi
   *     00dc <len> <frame bytes> [pad to even]   × totalFrames
   * }}}
   * No idx1: the demuxer walks `movi` chunk-by-chunk (the index is an
   * optimization for seeking, not a requirement — players tolerate its
   * absence), which keeps the walk single-pass and stream-friendly.
   */
  object AviCodec extends MediaCodec {
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def put32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    private def tag(b: Array[Byte], o: Int, s: String): Boolean =
      o + s.length <= b.length &&
        s.indices.forall(i => b(o + i) == s.charAt(i).toByte)
    private def putTag(b: Array[Byte], o: Int, s: String): Unit =
      s.indices.foreach(i => b(o + i) = s.charAt(i).toByte)

    /** (width, height, fps, frame offsets+lengths) when the payload is
      * a canonical MJPEG AVI with every declared byte present. */
    private def parse(b: Array[Byte]): Option[(Int, Int, Int, Array[(Int, Int)])] = {
      if (b == null || b.length < 224) return None
      if (!tag(b, 0, "RIFF") || !tag(b, 8, "AVI ")) return None
      if (u32(b, 4) + 8 > b.length) return None        // declared RIFF size
      if (!tag(b, 12, "LIST") || u32(b, 16) != 192L || !tag(b, 20, "hdrl"))
        return None
      if (!tag(b, 24, "avih") || u32(b, 28) != 56L) return None
      val usPerFrame = u32(b, 32)
      val totalFrames = u32(b, 48)
      if (u32(b, 56) != 1L) return None                // exactly one stream
      val w = u32(b, 64); val h = u32(b, 68)
      if (w <= 0 || w > (1 << 20) || h <= 0 || h > (1 << 20)) return None
      if (totalFrames < 0 || totalFrames > (1 << 24)) return None
      if (!tag(b, 88, "LIST") || u32(b, 92) != 116L || !tag(b, 96, "strl"))
        return None
      if (!tag(b, 100, "strh") || u32(b, 104) != 56L) return None
      if (!tag(b, 108, "vids") || !tag(b, 112, "MJPG")) return None
      val scale = u32(b, 128); val rate = u32(b, 132)
      if (scale != 1L || rate <= 0 || rate > 1000000L) return None
      if (u32(b, 140) != totalFrames) return None      // stream length
      if (!tag(b, 164, "strf") || u32(b, 168) != 40L) return None
      if (u32(b, 172) != 40L) return None              // BITMAPINFOHEADER
      if (u32(b, 176) != w || u32(b, 180) != h) return None
      if (u16(b, 184) != 1 || u16(b, 186) != 24) return None
      if (!tag(b, 188, "MJPG")) return None
      // the movi LIST, then the single-pass chunk walk
      if (!tag(b, 212, "LIST")) return None
      val moviSize = u32(b, 216)
      if (!tag(b, 220, "movi")) return None
      val moviEnd = 220L + moviSize
      if (moviEnd > b.length) return None
      val frames = Array.newBuilder[(Int, Int)]
      var off = 224L
      var n = 0L
      while (off < moviEnd) {
        if (off + 8 > moviEnd) return None
        if (!tag(b, off.toInt, "00dc") && !tag(b, off.toInt, "00db"))
          return None
        val len = u32(b, off.toInt + 4)
        if (off + 8 + len > moviEnd) return None
        frames += ((off.toInt + 8, len.toInt))
        off += 8 + len + (len % 2)                     // RIFF even padding
        n += 1
      }
      if (n != totalFrames) return None
      if (usPerFrame != 1000000L / rate) return None
      Some((w.toInt, h.toInt, rate.toInt, frames.result()))
    }

    /** Canonical muxer: one `00dc` chunk per encoded frame payload,
      * odd-length payloads padded with one zero byte (RIFF rule —
      * the pad is NOT part of the declared chunk size). */
    def encode(w: Int, h: Int, fps: Int,
        frames: Seq[Array[Byte]]): Array[Byte] = {
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
      require(fps > 0, s"bad frame rate $fps")
      val padded = frames.map(f => 8 + f.length + (f.length % 2))
      val moviData = 4 + padded.sum
      val riffSize = 4 + (8 + 192) + (8 + moviData)
      val out = new Array[Byte](8 + riffSize)
      putTag(out, 0, "RIFF"); put32(out, 4, riffSize); putTag(out, 8, "AVI ")
      putTag(out, 12, "LIST"); put32(out, 16, 192); putTag(out, 20, "hdrl")
      putTag(out, 24, "avih"); put32(out, 28, 56)
      put32(out, 32, 1000000 / fps)                    // usPerFrame
      put32(out, 48, frames.length)                    // totalFrames
      put32(out, 56, 1)                                // one stream
      put32(out, 64, w); put32(out, 68, h)
      putTag(out, 88, "LIST"); put32(out, 92, 116); putTag(out, 96, "strl")
      putTag(out, 100, "strh"); put32(out, 104, 56)
      putTag(out, 108, "vids"); putTag(out, 112, "MJPG")
      put32(out, 128, 1); put32(out, 132, fps)         // scale, rate
      put32(out, 140, frames.length)                   // stream length
      putTag(out, 164, "strf"); put32(out, 168, 40)
      put32(out, 172, 40)                              // biSize
      put32(out, 176, w); put32(out, 180, h)
      out(184) = 1; out(186) = 24
      putTag(out, 188, "MJPG")
      putTag(out, 212, "LIST"); put32(out, 216, moviData)
      putTag(out, 220, "movi")
      var o = 224
      frames.foreach { f =>
        putTag(out, o, "00dc"); put32(out, o + 4, f.length)
        System.arraycopy(f, 0, out, o + 8, f.length)
        o += 8 + f.length + (f.length % 2)
      }
      out
    }

    def decode(content: Array[Byte]): Row = parse(content) match {
      case Some((w, h, fps, frames)) =>
        Row("video", w, h, null,
          java.lang.Long.valueOf(frames.length * 1000L / fps),
          Integer.valueOf(frames.length), null)
      case None => Row("unknown", null, null, null, null, null, null)
    }

    /** Not an image codec: pass-through per the totality contract. */
    def resizeImage(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (content == null) null else content.clone()

    override def videoFrames(content: Array[Byte]): Array[Array[Byte]] =
      parse(content) match {
        case Some((_, _, _, frames)) =>
          frames.map { case (off, len) =>
            java.util.Arrays.copyOfRange(content, off, off + len)
          }
        case None => null
      }
  }

  /**
   * REAL MP4/ISO-BMFF METADATA parser — real corpora carry MP4, not
   * AVI, and the container's descriptive layer is pure fixed-layout
   * BIG-endian box arithmetic (the [[BmpCodec]] discipline applied to
   * ISO/IEC 14496-12): `[u32 size]['4cc' type][payload]` boxes, nested
   * by declared size. `decode` walks `ftyp → moov → { mvhd,
   * trak → { tkhd, mdia → { mdhd, hdlr } } }` and reads
   * timescale/duration (mvhd), track dimensions (tkhd, 16.16 fixed
   * point), and the handler 4cc (hdlr: `vide` → video, `soun` → audio,
   * whose sample rate is the mdhd media timescale — the ISO
   * convention). Frame access is explicitly OUT of scope: MP4 sample
   * payloads are H.264/AAC-class entropy-coded streams that need a
   * real decoder — that stays behind the ffmpeg [[MediaCodec]] seam
   * ([[StubCodec]]'s JNI contract); this codec's `videoFrames` stays
   * null by design.
   *
   * TOLERANT box walking (round 13 — real corpora never ship one
   * canonical layout): the walk accepts arbitrary top-level box order,
   * skips unknown boxes (`free`, `skip`, `udta`, `mdat`, anything
   * unrecognized) at every nesting level, handles 64-bit `largesize`
   * headers (size == 1 → next u64) and to-end-of-enclosing boxes
   * (size == 0), reads v0 AND v1 full-box layouts for `mvhd`/`tkhd`/
   * `mdhd`, and with multiple traks picks the first `vide` handler,
   * else the first `soun` — the same resolution `MP4Box`/`ffprobe`
   * perform. A `ftyp` brand box must be present somewhere at top level
   * (so arbitrary binaries whose first bytes happen to walk are not
   * misdetected), and any STRUCTURAL violation — short header, a
   * declared size overrunning its enclosing box, trailing bytes —
   * fails the whole file to `unknown`, per the totality contract.
   *
   * FRAGMENTED streams (round 14): most DASH/recorded content ships
   * movie fragments — `moov` holds a `mvex` announcement and the media
   * lives in top-level `moof`+`mdat` pairs. The walk recognizes both
   * markers and surfaces `fragmented = true` alongside the moov-level
   * metadata; an mvhd duration of 0 (the fragmented convention — the
   * real timeline lives in the fragments) is reported as NULL rather
   * than a confident "0 ms". Per-fragment sample tables stay out of
   * scope with the rest of frame access (the ffmpeg seam).
   *
   * [[encode]] still writes the fixed canonical tree: one v0
   * `ftyp(16, isom)`, one `moov(289)` holding `mvhd(108)` and one
   * `trak(173)` = `tkhd(92)` + `mdia(73)` = `mdhd(32)` + `hdlr(33,
   * empty name)`.
   */
  object Mp4Codec extends MediaCodec {
    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def put32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v >> 24).toByte; b(o + 1) = (v >> 16).toByte
      b(o + 2) = (v >> 8).toByte; b(o + 3) = v.toByte
    }
    private def tag(b: Array[Byte], o: Int, s: String): Boolean =
      o + s.length <= b.length &&
        s.indices.forall(i => b(o + i) == s.charAt(i).toByte)
    private def putTag(b: Array[Byte], o: Int, s: String): Unit =
      s.indices.foreach(i => b(o + i) = s.charAt(i).toByte)

    /** Identity matrix every canonical tkhd/mvhd carries (16.16 fixed
      * point: 1, 0, 0 / 0, 1, 0 / 0, 0, 0x4000'0000). */
    private val Matrix: Array[Int] =
      Array(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)

    private def u64(b: Array[Byte], o: Int): Long =
      (u32(b, o) << 32) | u32(b, o + 4)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")
    private def version(b: Array[Byte], o: Int): Int = b(o) & 0xff

    /** Child boxes of `b[start, end)` as (type, payloadStart,
      * payloadEnd) — handles `largesize` (size == 1 → u64 follows) and
      * to-end boxes (size == 0). None on any structural violation
      * (short header, declared size under the header length or
      * overrunning the enclosing box): the file then decodes
      * `unknown` rather than risking garbage fields. */
    private def children(b: Array[Byte], start: Int, end: Int)
        : Option[List[(String, Int, Int)]] = {
      val out = List.newBuilder[(String, Int, Int)]
      var o = start
      while (o < end) {
        if (o + 8 > end) return None
        val sz0 = u32(b, o)
        var hdr = 8L
        val size: Long =
          if (sz0 == 1L) {
            if (o + 16 > end) return None
            hdr = 16L; u64(b, o + 8)
          } else if (sz0 == 0L) (end - o).toLong
          else sz0
        // negative u64 sizes (>= 2^63) fail the first test
        if (size < hdr || size > end - o) return None
        out += ((fourcc(b, o + 4), o + hdr.toInt, o + size.toInt))
        o += size.toInt
      }
      Some(out.result())
    }

    /** (handler4cc, width, height, movieTimescale, movieDuration,
      * mediaTimescale, fragmented) via the tolerant walk: first `vide`
      * trak, else first `soun`, else None. `fragmented` (r14) is true
      * when the stream announces movie fragments — a top-level `moof`
      * box (media segments present) or a `mvex` box inside `moov` (the
      * init-segment announcement): the moov-level duration is then
      * untrustworthy (fragmented streams routinely write mvhd/tkhd
      * duration 0 and carry the real timeline in the fragments). */
    private def parse(b: Array[Byte]): Option[(String, Int, Int, Long, Long, Long, Boolean)] = {
      if (b == null || b.length < 16) return None
      val top = children(b, 0, b.length).getOrElse(return None)
      // require the brand box somewhere at top level: a random binary
      // whose first bytes happen to form a consistent walk must not
      // misdetect as ISO-BMFF
      if (!top.exists(_._1 == "ftyp")) return None
      val (_, ms0, me0) = top.find(_._1 == "moov").getOrElse(return None)
      val kids = children(b, ms0, me0).getOrElse(return None)
      // full-box payloads must carry their complete SPEC size for the
      // claimed version (v0 mvhd = 100, v1 = 112): a v0 payload whose
      // version byte is corrupted to 1 is then rejected instead of
      // misreading rate/volume bytes as timescale/duration
      val (ts, dur) = kids.find(_._1 == "mvhd") match {
        case Some((_, s, e)) if e - s >= 100 && version(b, s) == 0 =>
          (u32(b, s + 12), u32(b, s + 16))
        case Some((_, s, e)) if e - s >= 112 && version(b, s) == 1 =>
          (u32(b, s + 20), u64(b, s + 24))
        case _ => return None
      }
      if (ts <= 0 || ts > 10000000L || dur < 0) return None
      // every structurally-complete trak → (handler, w, h, mediaTs)
      val traks = kids.filter(_._1 == "trak").flatMap { case (_, ts0, te0) =>
        for {
          ks <- children(b, ts0, te0)
          (_, hs, he) <- ks.find(_._1 == "tkhd")
          wh <- version(b, hs) match {
            case 0 if he - hs >= 84 =>
              Some((u32(b, hs + 76) >> 16, u32(b, hs + 80) >> 16))
            case 1 if he - hs >= 96 =>
              Some((u32(b, hs + 88) >> 16, u32(b, hs + 92) >> 16))
            case _ => None
          }
          (_, ds0, de0) <- ks.find(_._1 == "mdia")
          mks <- children(b, ds0, de0)
          (_, ms, me) <- mks.find(_._1 == "mdhd")
          mts <- version(b, ms) match {
            // full mdhd spec payloads: v0 = 24, v1 = 36
            case 0 if me - ms >= 24 => Some(u32(b, ms + 12))
            case 1 if me - ms >= 36 => Some(u32(b, ms + 20))
            case _ => None
          }
          (_, ls, le) <- mks.find(_._1 == "hdlr")
          if le - ls >= 12
        } yield (fourcc(b, ls + 8), wh._1, wh._2, mts)
      }
      val (handler, w, h, mts) = traks.find(_._1 == "vide")
        .orElse(traks.find(_._1 == "soun")).getOrElse(return None)
      if (w < 0 || w > (1 << 15) || h < 0 || h > (1 << 15)) return None
      if (mts <= 0 || mts > 10000000L) return None
      val fragmented = top.exists(_._1 == "moof") || kids.exists(_._1 == "mvex")
      Some((handler, w.toInt, h.toInt, ts, dur, mts, fragmented))
    }

    /** Canonical encoder: `kind` is the hdlr 4cc (`vide` | `soun`);
      * `timescale` units per second, `duration` in those units — the
      * same values land in mvhd and mdhd (a single-track file needs no
      * divergence). Audio tracks carry zero dimensions, the ISO
      * convention. */
    def encode(kind: String, w: Int, h: Int, timescale: Int,
        duration: Int): Array[Byte] = {
      require(kind == "vide" || kind == "soun", s"kind must be vide|soun, got $kind")
      require(timescale > 0, s"bad timescale $timescale")
      require(duration >= 0, s"bad duration $duration")
      require(w >= 0 && h >= 0 && w <= (1 << 15) && h <= (1 << 15),
        s"bad dimensions ${w}x$h")
      val out = new Array[Byte](305)
      put32(out, 0, 16); putTag(out, 4, "ftyp"); putTag(out, 8, "isom")
      put32(out, 12, 0x200)                              // minor version
      put32(out, 16, 289); putTag(out, 20, "moov")
      put32(out, 24, 108); putTag(out, 28, "mvhd")       // v0 + flags 0
      put32(out, 44, timescale); put32(out, 48, duration)
      put32(out, 52, 0x10000)                            // rate 1.0
      out(56) = 1                                        // volume 1.0 (0x0100)
      Matrix.indices.foreach(i => put32(out, 68 + 4 * i, Matrix(i)))
      put32(out, 128, 2)                                 // next track id
      put32(out, 132, 173); putTag(out, 136, "trak")
      put32(out, 140, 92); putTag(out, 144, "tkhd")
      put32(out, 148, 7)                                 // v0, enabled+in-movie
      put32(out, 160, 1)                                 // track id
      put32(out, 168, duration)
      Matrix.indices.foreach(i => put32(out, 188 + 4 * i, Matrix(i)))
      put32(out, 224, w << 16); put32(out, 228, h << 16) // 16.16 fixed
      put32(out, 232, 73); putTag(out, 236, "mdia")
      put32(out, 240, 32); putTag(out, 244, "mdhd")      // v0
      put32(out, 260, timescale); put32(out, 264, duration)
      out(268) = 0x55.toByte; out(269) = 0xc4.toByte     // language 'und'
      put32(out, 272, 33); putTag(out, 276, "hdlr")
      putTag(out, 288, kind)                             // handler 4cc
      out                                                // name = one NUL
    }

    def decode(content: Array[Byte]): Row = parse(content) match {
      case Some(("vide", w, h, ts, dur, _, frag)) =>
        Row("video", Integer.valueOf(w), Integer.valueOf(h), null,
          durationMs(ts, dur, frag), null, java.lang.Boolean.valueOf(frag))
      case Some(("soun", _, _, ts, dur, mediaTs, frag)) =>
        Row("audio", null, null, Integer.valueOf(mediaTs.toInt),
          durationMs(ts, dur, frag), null, java.lang.Boolean.valueOf(frag))
      case _ => Row("unknown", null, null, null, null, null, null)
    }

    /** Fragmented streams routinely carry mvhd duration 0 with the real
      * timeline in the `moof`s — a 0 there is surfaced as NULL (unknown)
      * rather than a confident "0 ms". A non-zero moov duration (e.g.
      * mehd-style authoring that fills it in) is reported as read. */
    private def durationMs(ts: Long, dur: Long, frag: Boolean): java.lang.Long =
      if (frag && dur == 0L) null else java.lang.Long.valueOf(dur * 1000L / ts)

    /** Not an image codec: pass-through per the totality contract. */
    def resizeImage(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (content == null) null else content.clone()
  }

  /**
   * Decode metadata for a binary content column, appended as a `meta`
   * struct. Partition-wise: the codec binds once per partition (the shape
   * a JNI codec needs), rows stream through without materializing the
   * whole partition.
   */
  def withDecodedMeta(df: DataFrame, contentCol: String,
      codec: MediaCodec = StubCodec): DataFrame = {
    val schema = df.schema.add("meta", MetaSchema)
    val idx = df.schema.fieldIndex(contentCol)
    implicit val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      // per-partition codec initialization would happen here (JNI handle …)
      it.map(row => Row.fromSeq(row.toSeq :+ codec.decode(row.getAs[Array[Byte]](idx))))
    }.toDF(schema.fieldNames.toIndexedSeq: _*)
  }

  /** Resize every image asset (non-images pass through unchanged). */
  def resizeImages(df: DataFrame, contentCol: String, w: Int, h: Int,
      codec: MediaCodec = StubCodec): DataFrame = {
    val idx = df.schema.fieldIndex(contentCol)
    implicit val enc = RowEncoder.encoderFor(df.schema)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val decoded = codec.decode(bytes)
        if (decoded.getString(0) != "image") row
        else Row.fromSeq(row.toSeq.updated(idx, codec.resizeImage(bytes, w, h)))
      }
    }.toDF(df.schema.fieldNames.toIndexedSeq: _*)
  }

  /** Decimate every audio asset by an integer factor (the audio twin
    * of [[resizeImages]]); non-audio rows and payloads the codec
    * cannot decimate pass through unchanged. */
  def downsampleAudio(df: DataFrame, contentCol: String, factor: Int,
      codec: MediaCodec = StubCodec): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val idx = df.schema.fieldIndex(contentCol)
    implicit val enc = RowEncoder.encoderFor(df.schema)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val decoded = codec.decode(bytes)
        if (decoded.getString(0) != "audio") row
        else Row.fromSeq(row.toSeq.updated(idx, codec.resampleAudio(bytes, factor)))
      }
    }.toDF(df.schema.fieldNames.toIndexedSeq: _*)
  }

  /**
   * Sample every `everyN`-th fixed-size frame chunk of a video payload
   * into (frame_index, frame_bytes) rows — the explode shape a frame
   * extractor produces. Real byte slicing; the chunk length stands in for
   * codec-determined frame boundaries.
   */
  def sampleFrames(df: DataFrame, idCol: String, contentCol: String,
      frameBytes: Int = 256, everyN: Int = 2): DataFrame = {
    val out = StructType(Seq(
      StructField("asset_id", df.schema(idCol).dataType),
      StructField("frame_index", IntegerType),
      StructField("frame", BinaryType)))
    val (idIdx, cIdx) = (df.schema.fieldIndex(idCol), df.schema.fieldIndex(contentCol))
    implicit val enc = RowEncoder.encoderFor(out)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](cIdx)
        if (bytes == null) Iterator.empty
        else (0 until bytes.length by frameBytes).zipWithIndex
          .filter(_._2 % everyN == 0)
          .map { case (off, fi) =>
            Row(row.get(idIdx), fi,
              java.util.Arrays.copyOfRange(bytes, off, math.min(off + frameBytes, bytes.length)))
          }.iterator
      }
    }.toDF("asset_id", "frame_index", "frame")
  }

  /**
   * Sample every `everyN`-th REAL frame of a demuxable video payload —
   * the codec-determined-boundary upgrade of [[sampleFrames]] promised
   * by the JNI contract: same emitted shape (asset_id, frame_index,
   * frame) with `frame_index` counting KEPT frames from 0, but the
   * bytes are the container's own encoded frame payloads (one JPEG per
   * row for MJPEG), not fixed-size chunks. Non-video / undecodable
   * payloads emit NO rows (the explode-shape totality convention).
   * Map-only — payloads never shuffle; project the frame column away
   * before any wide op.
   */
  def demuxFrames(df: DataFrame, idCol: String, contentCol: String,
      everyN: Int = 1, codec: MediaCodec = AviCodec): DataFrame = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    val out = StructType(Seq(
      StructField("asset_id", df.schema(idCol).dataType),
      StructField("frame_index", IntegerType),
      StructField("frame", BinaryType)))
    val (idIdx, cIdx) =
      (df.schema.fieldIndex(idCol), df.schema.fieldIndex(contentCol))
    implicit val enc = RowEncoder.encoderFor(out)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val frames = codec.videoFrames(row.getAs[Array[Byte]](cIdx))
        if (frames == null) Iterator.empty
        else frames.iterator.zipWithIndex
          .filter(_._2 % everyN == 0)
          .zipWithIndex
          .map { case ((f, _), kept) => Row(row.get(idIdx), kept, f) }
      }
    }.toDF("asset_id", "frame_index", "frame")
  }

  /**
   * Per-window audio energy — the silence/VAD gating primitive a
   * speech-data pipeline runs before anything expensive (drop silent
   * windows, bound clipping, segment on energy valleys): fixed-size
   * sample windows (the last may be short), energy = INTEGER mean
   * square of the signed 16-bit samples (Σs² div n — floor division,
   * engine-exact; Σs² ≤ n·2³⁰ never overflows a long). Non-audio and
   * undecodable payloads emit NO rows (they have no windows — the
   * explode-shape totality convention of [[sampleFrames]]). Narrow,
   * no shuffle. Output: (asset_id, window_idx, n_samples, mean_sq).
   */
  def audioEnergy(df: DataFrame, idCol: String, contentCol: String,
      windowSamples: Int, codec: MediaCodec = StubCodec): DataFrame = {
    require(windowSamples >= 1, s"windowSamples must be >= 1, got $windowSamples")
    val out = StructType(Seq(
      StructField("asset_id", df.schema(idCol).dataType),
      StructField("window_idx", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("mean_sq", LongType)))
    val (idIdx, cIdx) = (df.schema.fieldIndex(idCol), df.schema.fieldIndex(contentCol))
    implicit val enc = RowEncoder.encoderFor(out)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val samples = codec.audioSamples(row.getAs[Array[Byte]](cIdx))
        if (samples == null) Iterator.empty
        else (0 until samples.length by windowSamples).zipWithIndex.map {
          case (off, wi) =>
            val end = math.min(off + windowSamples, samples.length)
            var ss = 0L
            var i = off
            while (i < end) { val s = samples(i).toLong; ss += s * s; i += 1 }
            Row(row.get(idIdx), wi, end - off, ss / (end - off))
        }.iterator
      }
    }.toDF("asset_id", "window_idx", "n_samples", "mean_sq")
  }

  /**
   * Per-tile image statistics — the image-QA twin of [[audioEnergy]]
   * (flat/blank-region detection, exposure screening, letterbox
   * cropping): the image splits into a tile grid of `tileW`×`tileH`
   * pixels (edge tiles may be short), each tile reporting the INTEGER
   * mean of each channel (Σ div n — floor, engine-exact). Non-image
   * and undecodable payloads emit NO rows. Narrow, no shuffle.
   * Output: (asset_id, tile_x, tile_y, n_px, mean_b, mean_g, mean_r).
   */
  def imageTileStats(df: DataFrame, idCol: String, contentCol: String,
      tileW: Int, tileH: Int, codec: MediaCodec = StubCodec): DataFrame = {
    require(tileW >= 1 && tileH >= 1, s"tile must be >= 1x1, got ${tileW}x$tileH")
    val out = StructType(Seq(
      StructField("asset_id", df.schema(idCol).dataType),
      StructField("tile_x", IntegerType),
      StructField("tile_y", IntegerType),
      StructField("n_px", IntegerType),
      StructField("mean_b", LongType),
      StructField("mean_g", LongType),
      StructField("mean_r", LongType)))
    val (idIdx, cIdx) = (df.schema.fieldIndex(idCol), df.schema.fieldIndex(contentCol))
    implicit val enc = RowEncoder.encoderFor(out)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val px = codec.imageBgr(row.getAs[Array[Byte]](cIdx))
        if (px == null) Iterator.empty
        else {
          val (w, h) = (px.width, px.height)
          for {
            ty <- (0 until h by tileH).iterator.map(_ / tileH)
            tx <- (0 until w by tileW).iterator.map(_ / tileW)
          } yield {
            val (x0, y0) = (tx * tileW, ty * tileH)
            val (x1, y1) = (math.min(x0 + tileW, w), math.min(y0 + tileH, h))
            var (sb, sg, sr) = (0L, 0L, 0L)
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val o = (y * w + x) * 3
                sb += px.bgr(o) & 0xff
                sg += px.bgr(o + 1) & 0xff
                sr += px.bgr(o + 2) & 0xff
                x += 1
              }
              y += 1
            }
            val n = (x1 - x0) * (y1 - y0)
            Row(row.get(idIdx), tx, ty, n, sb / n, sg / n, sr / n)
          }
        }
      }
    }.toDF(out.fieldNames.toIndexedSeq: _*)
  }

  /**
   * Perceptual image hash (aHash) — the standard first stage of image
   * near-dup detection in a multimodal training-data pipeline: two
   * images that differ only by scale or mild level shifts map to equal
   * (or Hamming-close) hashes, so exact grouping on the hash is an
   * O(N) perceptual dedup and Hamming banding extends it to near-dups
   * (the [[graft.dedup.Dedup]] SimHash discipline, applied to pixels).
   *
   * Exact integer pipeline, engine-replayable end to end:
   *  1. decode via the REAL codec (`imageBgr`);
   *  2. nearest-neighbor downsample to `side`×`side` using the SAME
   *     index map as [[BmpCodec.resizeImage]]: src = dst·srcDim div side;
   *  3. gray = (b + g + r) div 3 per cell (floor);
   *  4. mean = Σgray div side² (floor);
   *  5. bit i (i = y·side + x, row-major) = 1 iff grayᵢ >= mean.
   * The 64 bits ship as two non-negative 32-bit halves (`hash_hi` =
   * bits 32…63, `hash_lo` = bits 0…31) so neither engine touches the
   * BIGINT sign bit. Non-image / undecodable payloads emit NO row (the
   * [[imageTileStats]] totality convention). Narrow, no shuffle — at
   * 100 TB this is a map over the asset scan; the grouping/banding that
   * consumes it shuffles only (id, hash) slim rows.
   * Output: (asset_id, width, height, hash_hi, hash_lo).
   */
  def imageHash(df: DataFrame, idCol: String, contentCol: String,
      side: Int = 8, codec: MediaCodec = StubCodec): DataFrame = {
    require(side >= 1 && side <= 8, s"side must be in 1..8, got $side")
    val out = StructType(Seq(
      StructField("asset_id", df.schema(idCol).dataType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("hash_hi", LongType),
      StructField("hash_lo", LongType)))
    val (idIdx, cIdx) = (df.schema.fieldIndex(idCol), df.schema.fieldIndex(contentCol))
    implicit val enc = RowEncoder.encoderFor(out)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val px = codec.imageBgr(row.getAs[Array[Byte]](cIdx))
        if (px == null) Iterator.empty
        else {
          val (w, h) = (px.width, px.height)
          val n = side * side
          val gray = new Array[Long](n)
          var sum = 0L
          var i = 0
          while (i < n) {
            val sx = (i % side) * w / side
            val sy = (i / side) * h / side
            val o = (sy * w + sx) * 3
            val g = ((px.bgr(o) & 0xff) + (px.bgr(o + 1) & 0xff) +
              (px.bgr(o + 2) & 0xff)) / 3
            gray(i) = g
            sum += g
            i += 1
          }
          val mean = sum / n
          var (hi, lo) = (0L, 0L)
          i = 0
          while (i < n) {
            if (gray(i) >= mean) {
              if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            }
            i += 1
          }
          Iterator.single(Row(row.get(idIdx), w, h, hi, lo))
        }
      }
    }.toDF(out.fieldNames.toIndexedSeq: _*)
  }

  /**
   * Audio energy fingerprint — the [[imageHash]] twin for audio:
   * windows the signal like [[audioEnergy]], thresholds each window's
   * integer mean-square against the clip-level floor, and packs the
   * loud/quiet pattern into one non-negative integer. Clips that share
   * a fingerprint share their coarse energy envelope — exact grouping
   * on (n_windows, fp) is the O(N) first stage of audio dedup, and the
   * threshold itself is the VAD gate [[audioEnergy]] documents.
   *
   * Exact integer pipeline: window energies eᵢ = Σs² div n (floor, as
   * [[audioEnergy]]); floor = Σeᵢ div n_windows (floor); bit i = 1 iff
   * eᵢ >= floor; fp = Σ bitᵢ·2ⁱ over the FIRST min(n_windows, 62)
   * windows (the documented prefix bound keeps fp inside a BIGINT —
   * longer clips fingerprint their opening envelope). Non-audio /
   * undecodable payloads emit NO row. Narrow, no shuffle.
   * Output: (asset_id, n_windows, energy_floor, fp).
   */
  def audioFingerprint(df: DataFrame, idCol: String, contentCol: String,
      windowSamples: Int, codec: MediaCodec = StubCodec): DataFrame = {
    require(windowSamples >= 1, s"windowSamples must be >= 1, got $windowSamples")
    val out = StructType(Seq(
      StructField("asset_id", df.schema(idCol).dataType),
      StructField("n_windows", IntegerType),
      StructField("energy_floor", LongType),
      StructField("fp", LongType)))
    val (idIdx, cIdx) = (df.schema.fieldIndex(idCol), df.schema.fieldIndex(contentCol))
    implicit val enc = RowEncoder.encoderFor(out)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val samples = codec.audioSamples(row.getAs[Array[Byte]](cIdx))
        if (samples == null || samples.length == 0) Iterator.empty
        else {
          val nw = (samples.length + windowSamples - 1) / windowSamples
          val e = new Array[Long](nw)
          var total = 0L
          var wi = 0
          while (wi < nw) {
            val off = wi * windowSamples
            val end = math.min(off + windowSamples, samples.length)
            var ss = 0L
            var i = off
            while (i < end) { val s = samples(i).toLong; ss += s * s; i += 1 }
            e(wi) = ss / (end - off)
            total += e(wi)
            wi += 1
          }
          val floor = total / nw
          var fp = 0L
          wi = 0
          while (wi < math.min(nw, 62)) {
            if (e(wi) >= floor) fp |= 1L << wi
            wi += 1
          }
          Iterator.single(Row(row.get(idIdx), nw, floor, fp))
        }
      }
    }.toDF(out.fieldNames.toIndexedSeq: _*)
  }

  /** Real feature extractor: 256-bin byte histogram (array<long>) — a
    * cheap content signature usable with graft.similarity. Narrow, no
    * shuffle, one pass per payload. */
  def byteHistogram(df: DataFrame, contentCol: String, outCol: String = "histogram"): DataFrame = {
    val idx = df.schema.fieldIndex(contentCol)
    val schema = df.schema.add(outCol, ArrayType(LongType, containsNull = false))
    implicit val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val h = new Array[Long](256)
        if (bytes != null) { var i = 0; while (i < bytes.length) { h(bytes(i) & 0xff) += 1; i += 1 } }
        Row.fromSeq(row.toSeq :+ h.toSeq)
      }
    }.toDF(schema.fieldNames.toIndexedSeq: _*)
  }
}
