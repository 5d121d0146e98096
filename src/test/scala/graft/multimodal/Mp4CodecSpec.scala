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

  it should "reject invalid encode parameters loudly" in {
    an[IllegalArgumentException] should be thrownBy
      Mp4Codec.encode("text", 1, 1, 1000, 0)
    an[IllegalArgumentException] should be thrownBy
      Mp4Codec.encode("vide", 1, 1, 0, 0)
    an[IllegalArgumentException] should be thrownBy
      Mp4Codec.encode("vide", -1, 1, 1000, 0)
  }
}
