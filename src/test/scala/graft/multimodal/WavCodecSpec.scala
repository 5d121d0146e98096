package graft.multimodal

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import Multimodal.WavCodec

class WavCodecSpec extends AnyFlatSpec with Matchers {

  private def samples(n: Int): Array[Short] =
    Array.tabulate(n)(i => ((i * 7919 + 13) % 65536 - 32768).toShort)

  behavior of "WavCodec"

  it should "round-trip rate and floor-division duration through encode/decode" in {
    val wav = WavCodec.encode(8000, samples(12000))
    wav.length shouldBe 44 + 24000
    new String(wav, 0, 4, "US-ASCII") shouldBe "RIFF"
    new String(wav, 8, 4, "US-ASCII") shouldBe "WAVE"
    val meta = WavCodec.decode(wav)
    meta.getString(0) shouldBe "audio"
    meta.getInt(3) shouldBe 8000
    meta.getLong(4) shouldBe 1500L // 12000 * 1000 / 8000
    // duration floors: 12001 samples -> still 1500 ms
    WavCodec.decode(WavCodec.encode(8000, samples(12001))).getLong(4) shouldBe 1500L
  }

  it should "store samples little-endian after the 44-byte header" in {
    val wav = WavCodec.encode(1000, Array[Short](0x1234, -2))
    (wav(44) & 0xff) shouldBe 0x34
    (wav(45) & 0xff) shouldBe 0x12
    (wav(46) & 0xff) shouldBe 0xfe // -2 = 0xfffe
    (wav(47) & 0xff) shouldBe 0xff
  }

  it should "decimate by an integer factor, halving the rate and keeping duration" in {
    val src = samples(10)
    val wav = WavCodec.encode(2000, src)
    val out = WavCodec.resampleAudio(wav, 2)
    val meta = WavCodec.decode(out)
    (meta.getString(0), meta.getInt(3)) shouldBe ("audio", 1000)
    meta.getLong(4) shouldBe WavCodec.decode(wav).getLong(4) // 5 ms both
    // kept samples are the even source indices
    out.length shouldBe 44 + 10
    for (i <- 0 until 5) {
      (out(44 + 2 * i) & 0xff) shouldBe (src(2 * i) & 0xff)
      (out(44 + 2 * i + 1) & 0xff) shouldBe ((src(2 * i) >> 8) & 0xff)
    }
    // odd sample counts keep the ceiling
    WavCodec.resampleAudio(WavCodec.encode(2000, samples(11)), 2)
      .length shouldBe 44 + 12 // ceil(11/2) = 6 samples
  }

  it should "pass through payloads it cannot own, as fresh copies" in {
    val junk = "not audio at all".getBytes("UTF-8")
    WavCodec.decode(junk).getString(0) shouldBe "unknown"
    val out = WavCodec.resampleAudio(junk, 2)
    out should not be theSameInstanceAs(junk)
    out.toSeq shouldBe junk.toSeq
    // a rate the factor does not divide passes through too
    val odd = WavCodec.encode(1001, samples(6))
    WavCodec.resampleAudio(odd, 2).toSeq shouldBe odd.toSeq
    // truncated payload (header promises more samples than present)
    val cut = java.util.Arrays.copyOf(WavCodec.encode(1000, samples(6)), 50)
    WavCodec.decode(cut).getString(0) shouldBe "unknown"
    WavCodec.decode(null).getString(0) shouldBe "unknown"
    WavCodec.resizeImage(junk, 2, 2).toSeq shouldBe junk.toSeq // not an image codec
  }

  it should "extract samples and window energy exactly" in {
    val s = Array[Short](3, -4, 5, 100, -32768)
    val wav = WavCodec.encode(1000, s)
    WavCodec.audioSamples(wav).toSeq shouldBe s.toSeq
    WavCodec.audioSamples("junk".getBytes) shouldBe null
    WavCodec.audioSamples(null) shouldBe null

    import graft.SparkTestKit.spark
    import spark.implicits._
    val df = Seq((1L, wav), (2L, "text".getBytes)).toDF("id", "content")
    val got = Multimodal.audioEnergy(df, "id", "content", 2, WavCodec)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    // windows: [3,-4] -> (9+16)/2 = 12; [5,100] -> (25+10000)/2 = 5012;
    // short last [-32768] -> 2^30; non-audio row 2 emits nothing
    got shouldBe Array((1L, 0, 2, 12L), (1L, 1, 2, 5012L),
      (1L, 2, 1, 1073741824L))
  }

  it should "agree with the JDK's own WAV parser on its output" in {
    // independent cross-validation: javax.sound.sampled reads the
    // canonical bytes back with the same rate and frame count
    val wav = WavCodec.encode(4000, samples(2000))
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(wav))
    aff.getFormat.getSampleRate shouldBe 4000f
    aff.getFormat.getChannels shouldBe 1
    aff.getFormat.getSampleSizeInBits shouldBe 16
    aff.getFrameLength shouldBe 2000
    // and the general-purpose ImageIoCodec decodes it as audio too
    val meta = Multimodal.ImageIoCodec.decode(wav)
    (meta.getString(0), meta.getInt(3), meta.getLong(4)) shouldBe ("audio", 4000, 500L)
  }
}
