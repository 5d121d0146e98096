package graft.multimodal

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.multimodal.Multimodal.Mp4Codec

/**
 * [[Multimodal.Mp4Codec]] contract: the canonical metadata-only
 * ISO-BMFF box tree round-trips through the big-endian box walk,
 * audio tracks surface the media timescale as the sample rate, frame
 * access stays behind the ffmpeg seam (videoFrames null), and the
 * parser is total over garbage.
 */
class Mp4CodecSpec extends AnyFlatSpec with Matchers {

  behavior of "Mp4Codec"

  it should "decode a canonical video MP4's metadata exactly" in {
    val mp4 = Mp4Codec.encode("vide", 1920, 1080, timescale = 600, duration = 7260)
    mp4.length shouldBe 305
    val m = Mp4Codec.decode(mp4)
    m.getString(0) shouldBe "video"
    m.getInt(1) shouldBe 1920
    m.getInt(2) shouldBe 1080
    m.isNullAt(3) shouldBe true                 // no sample rate on video
    m.getLong(4) shouldBe 12100L                // 7260/600 s = 12.1 s
    m.isNullAt(5) shouldBe true                 // frame count needs a demuxer
  }

  it should "surface the media timescale as an audio track's sample rate" in {
    val mp4 = Mp4Codec.encode("soun", 0, 0, timescale = 44100, duration = 44100 * 3)
    val m = Mp4Codec.decode(mp4)
    m.getString(0) shouldBe "audio"
    m.isNullAt(1) shouldBe true
    m.isNullAt(2) shouldBe true
    m.getInt(3) shouldBe 44100
    m.getLong(4) shouldBe 3000L
  }

  it should "floor-divide duration_ms like the SQL oracle" in {
    // 1000 units at timescale 300 -> 3333.33 ms, floor 3333
    Mp4Codec.decode(Mp4Codec.encode("vide", 64, 48, 300, 1000))
      .getLong(4) shouldBe 3333L
  }

  it should "keep frame access behind the ffmpeg seam" in {
    val mp4 = Mp4Codec.encode("vide", 640, 480, 600, 600)
    Mp4Codec.videoFrames(mp4) shouldBe null     // by design: no demuxer
    Mp4Codec.imageBgr(mp4) shouldBe null
    Mp4Codec.audioSamples(mp4) shouldBe null
    // pass-through transforms, fresh copies
    val rs = Mp4Codec.resizeImage(mp4, 2, 2)
    rs shouldBe mp4
    (rs eq mp4) shouldBe false
  }

  it should "be total over garbage (unknown, never a throw)" in {
    val good = Mp4Codec.encode("vide", 320, 240, 1000, 2500)
    val cases = Seq[Array[Byte]](
      null,
      Array.empty[Byte],
      "definitely not an mp4".getBytes,
      good.take(200),                            // truncated inside moov
      { val b = good.clone(); b(4) = 'X'; b },   // wrong ftyp tag
      { val b = good.clone(); b(28) = 'Z'; b },  // wrong mvhd tag
      { val b = good.clone(); b(32) = 1; b },    // non-v0 mvhd
      { val b = good.clone(); b(288) = 'q'; b }) // unknown handler 4cc
    cases.foreach(c => Mp4Codec.decode(c).getString(0) shouldBe "unknown")
    // a declared moov size larger than the payload is rejected, not read
    val oversize = good.clone(); oversize(19) = 0x7f.toByte
    Mp4Codec.decode(oversize).getString(0) shouldBe "unknown"
  }

  // --- tolerant ISO-BMFF walking (round 13): real corpora never ship
  // the canonical layout — hand-assembled non-canonical box trees ----

  private def u32be(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u64be(v: Long): Array[Byte] = u32be(v >>> 32) ++ u32be(v & 0xffffffffL)
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    u32be(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
  private def largeBox(typ: String, payload: Array[Byte]): Array[Byte] =
    u32be(1L) ++ typ.getBytes("US-ASCII") ++ u64be(16L + payload.length) ++ payload
  private def zeros(n: Int) = new Array[Byte](n)

  private def mvhdV0(ts: Long, dur: Long) =
    box("mvhd", zeros(12) ++ u32be(ts) ++ u32be(dur) ++ zeros(80))
  private def mvhdV1(ts: Long, dur: Long) =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++ zeros(16) ++ u32be(ts) ++ u64be(dur) ++ zeros(80))
  private def tkhdV0(w: Int, h: Int) =
    box("tkhd", zeros(76) ++ u32be(w.toLong << 16) ++ u32be(h.toLong << 16))
  private def tkhdV1(w: Int, h: Int) =
    box("tkhd", Array[Byte](1, 0, 0, 0) ++ zeros(84) ++ u32be(w.toLong << 16) ++ u32be(h.toLong << 16))
  private def mdhdV0(ts: Long) = box("mdhd", zeros(12) ++ u32be(ts) ++ zeros(8))
  private def mdhdV1(ts: Long) = box("mdhd", Array[Byte](1, 0, 0, 0) ++ zeros(16) ++ u32be(ts) ++ zeros(12))
  private def hdlr(kind: String) = box("hdlr", zeros(8) ++ kind.getBytes ++ zeros(13))
  private def trak(tkhd: Array[Byte], mdhd: Array[Byte], h: Array[Byte]) =
    box("trak", tkhd ++ box("mdia", mdhd ++ h))
  private val ftyp = box("ftyp", "isom".getBytes ++ u32be(0x200))

  it should "walk shuffled and padded top-level/moov layouts" in {
    // free before ftyp, mdat between, moov LAST; inside moov the trak
    // comes before mvhd with udta and free boxes interleaved
    val moov = box("moov",
      box("udta", "who knows".getBytes) ++
        trak(tkhdV0(640, 360), mdhdV0(48000), hdlr("vide")) ++
        box("free", zeros(20)) ++ mvhdV0(600, 1500))
    val f = box("free", zeros(4)) ++ ftyp ++ box("mdat", zeros(99)) ++ moov
    val m = Mp4Codec.decode(f)
    m.getString(0) shouldBe "video"
    m.getInt(1) shouldBe 640
    m.getInt(2) shouldBe 360
    m.getLong(4) shouldBe 2500L // 1500/600 s
  }

  it should "read 64-bit largesize headers and v1 full boxes" in {
    val moov = largeBox("moov",
      mvhdV1(1000, 5000000000L) ++ // v1: 64-bit duration past u32 range
        trak(tkhdV1(3840, 2160), mdhdV1(90000), hdlr("vide")))
    val m = Mp4Codec.decode(ftyp ++ moov)
    m.getString(0) shouldBe "video"
    m.getInt(1) shouldBe 3840
    m.getInt(2) shouldBe 2160
    m.getLong(4) shouldBe 5000000000L // dur*1000/ts = dur at ts 1000
  }

  it should "pick the video trak among several, else the audio trak" in {
    val multi = ftyp ++ box("moov",
      mvhdV0(44100, 44100 * 2) ++
        trak(tkhdV0(0, 0), mdhdV0(44100), hdlr("soun")) ++
        trak(tkhdV0(1280, 720), mdhdV0(30000), hdlr("vide")))
    val mv = Mp4Codec.decode(multi)
    mv.getString(0) shouldBe "video"
    mv.getInt(1) shouldBe 1280
    val audioOnly = ftyp ++ box("moov",
      mvhdV0(44100, 44100 * 2) ++
        trak(tkhdV0(0, 0), mdhdV0(22050), hdlr("soun")))
    val ma = Mp4Codec.decode(audioOnly)
    ma.getString(0) shouldBe "audio"
    ma.getInt(3) shouldBe 22050
    ma.getLong(4) shouldBe 2000L
  }

  it should "treat size-0 as to-end-of-enclosure and reject structural violations" in {
    // size == 0 on the LAST top-level box
    val moovPayload = mvhdV0(600, 600) ++
      trak(tkhdV0(32, 32), mdhdV0(600), hdlr("vide"))
    val toEnd = ftyp ++ (u32be(0) ++ "moov".getBytes ++ moovPayload)
    Mp4Codec.decode(toEnd).getString(0) shouldBe "video"
    // trailing partial header after the last box → whole file unknown
    val trailing = ftyp ++ box("moov", moovPayload) ++ Array[Byte](0, 0, 0)
    Mp4Codec.decode(trailing).getString(0) shouldBe "unknown"
    // child box overrunning its enclosing moov → unknown
    val overrun = ftyp ++ box("moov", u32be(9999) ++ "mvhd".getBytes ++ zeros(100))
    Mp4Codec.decode(overrun).getString(0) shouldBe "unknown"
    // no ftyp brand anywhere → not ISO-BMFF, even if the walk succeeds
    val brandless = box("moov", moovPayload)
    Mp4Codec.decode(brandless).getString(0) shouldBe "unknown"
  }

  it should "surface fragmented streams and distrust their zero durations" in {
    val tk = trak(tkhdV0(1280, 720), mdhdV0(600), hdlr("vide"))
    // init segment: mvex announcement, real moov duration filled in
    val init = ftyp ++ box("moov",
      mvhdV0(600, 1200) ++ box("mvex", zeros(8)) ++ tk)
    val mi = Mp4Codec.decode(init)
    (mi.getString(0), mi.getInt(1), mi.getBoolean(6)) shouldBe ("video", 1280, true)
    mi.getLong(4) shouldBe 2000L // a NON-zero moov duration is reported as read
    // media present: mvhd duration 0 + top-level moof/mdat pairs — the
    // fragmented convention; a confident "0 ms" would be wrong
    val media = ftyp ++ box("moov", mvhdV0(600, 0) ++ tk ++ box("mvex", zeros(8))) ++
      box("moof", zeros(16)) ++ box("mdat", zeros(5))
    val mm = Mp4Codec.decode(media)
    (mm.getString(0), mm.getBoolean(6)) shouldBe ("video", true)
    mm.isNullAt(4) shouldBe true
    // moof WITHOUT mvex (media segments only) still flags fragmented
    val moofOnly = ftyp ++ box("moov", mvhdV0(600, 0) ++ tk) ++ box("moof", zeros(16))
    val mo = Mp4Codec.decode(moofOnly)
    (mo.getBoolean(6), mo.isNullAt(4)) shouldBe (true, true)
    // an UNFRAGMENTED stream reads fragmented = false and duration 0 as 0
    val plain = Mp4Codec.decode(ftyp ++ box("moov", mvhdV0(600, 0) ++ tk))
    (plain.getBoolean(6), plain.getLong(4)) shouldBe (false, 0L)
  }

  it should "reject invalid encode parameters loudly" in {
    an[IllegalArgumentException] should be thrownBy
      Mp4Codec.encode("text", 1, 1, 1000, 0)
    an[IllegalArgumentException] should be thrownBy
      Mp4Codec.encode("vide", 1, 1, 0, 0)
    an[IllegalArgumentException] should be thrownBy
      Mp4Codec.encode("vide", -1, 1, 1000, 0)
  }
}
