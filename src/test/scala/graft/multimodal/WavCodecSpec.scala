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

  // --- tolerant RIFF chunk walking (round 14) ---

  /** Assemble a RIFF/WAVE from raw chunks (id -> payload), fixing up the
    * declared RIFF size and the odd-size pad bytes. */
  private def riff(chunks: (String, Array[Byte])*): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    chunks.foreach { case (id, p) =>
      bo.write(id.getBytes("US-ASCII")); bo.write(le32(p.length)); bo.write(p)
      if (p.length % 2 == 1) bo.write(0)
    }
    val body = bo.toByteArray
    "RIFF".getBytes ++ le32(4 + body.length) ++ "WAVE".getBytes ++ body
  }
  private def le16s(xs: Short*): Array[Byte] =
    xs.flatMap(s => Seq(s.toByte, (s >> 8).toByte)).toArray
  private def fmtPcm(rate: Int, ch: Int): Array[Byte] =
    le16s(1, ch.toShort) ++
      Array(rate, rate >> 8, rate >> 16, rate >> 24).map(_.toByte) ++
      Array(rate * 2 * ch, (rate * 2 * ch) >> 8, (rate * 2 * ch) >> 16,
        (rate * 2 * ch) >> 24).map(_.toByte) ++
      le16s((2 * ch).toShort, 16)

  it should "walk shuffled/padded chunk layouts to the canonical answer" in {
    val s = samples(10)
    val canonical = WavCodec.decode(WavCodec.encode(2000, s))
    // JUNK between fmt and data, LIST after data, odd-size JUNK (pad rule)
    val shuffled = riff(
      ("fmt ", fmtPcm(2000, 1)), ("JUNK", Array[Byte](1, 2, 3)),
      ("data", le16s(s: _*)), ("LIST", "INFO??".getBytes))
    WavCodec.decode(shuffled).toSeq shouldBe canonical.toSeq
    WavCodec.audioSamples(shuffled).toSeq shouldBe s.toSeq
    // LIST BEFORE fmt, and an 18-byte fmt (cbSize = 0)
    val leading = riff(
      ("LIST", "INFOpadding!".getBytes),
      ("fmt ", fmtPcm(2000, 1) ++ Array[Byte](0, 0)),
      ("data", le16s(s: _*)))
    WavCodec.decode(leading).toSeq shouldBe canonical.toSeq
    // decimation through a padded layout normalizes to canonical bytes
    WavCodec.resampleAudio(shuffled, 2).toSeq shouldBe
      WavCodec.resampleAudio(WavCodec.encode(2000, s), 2).toSeq
  }

  it should "decode WAVE_FORMAT_EXTENSIBLE stereo with the first-channel policy" in {
    val pcmGuid = Array[Int](1, 0, 0, 0, 0, 0, 0x10, 0, 0x80, 0,
      0, 0xAA, 0, 0x38, 0x9B, 0x71).map(_.toByte)
    val fmtExt = le16s(0xFFFE.toShort, 2) ++
      Array[Byte](0x10, 0x27, 0, 0) ++            // rate 10000
      Array[Byte](0x40, 0x9C.toByte, 0, 0) ++     // byteRate 40000
      le16s(4, 16) ++                             // blockAlign, bits
      le16s(22, 16) ++                            // cbSize, validBits
      Array[Byte](3, 0, 0, 0) ++ pcmGuid          // channelMask, SubFormat
    val frames = Array[Short](100, -100, 200, -200, 300, -300) // 3 frames x 2ch
    val wav = riff(("fmt ", fmtExt), ("fact", Array[Byte](3, 0, 0, 0)),
      ("data", le16s(frames: _*)))
    val m = WavCodec.decode(wav)
    (m.getString(0), m.getInt(3)) shouldBe ("audio", 10000)
    m.getLong(4) shouldBe 0L // 3 frames / 10 kHz floors to 0 ms
    WavCodec.audioSamples(wav).toSeq shouldBe Seq[Short](100, 200, 300) // ch 0
    // frame decimation keeps BOTH channels of every 2nd frame
    val down = WavCodec.resampleAudio(wav, 2)
    val dm = WavCodec.decode(down)
    (dm.getString(0), dm.getInt(3)) shouldBe ("audio", 5000)
    WavCodec.audioSamples(down).toSeq shouldBe Seq[Short](100, 300)
    down.length shouldBe 44 + 8 // canonical re-encode, 2 frames x 2ch
    // and the JDK parser agrees with the re-encoded stereo header
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(down))
    aff.getFormat.getChannels shouldBe 2
    aff.getFormat.getSampleRate shouldBe 5000f
  }

  it should "reject structural violations the walk cannot trust" in {
    val s = samples(4)
    // duplicate data chunks: ambiguous payload
    WavCodec.decode(riff(("fmt ", fmtPcm(1000, 1)),
      ("data", le16s(s: _*)), ("data", le16s(s: _*)))).getString(0) shouldBe "unknown"
    // duplicate fmt
    WavCodec.decode(riff(("fmt ", fmtPcm(1000, 1)), ("fmt ", fmtPcm(1000, 1)),
      ("data", le16s(s: _*)))).getString(0) shouldBe "unknown"
    // no fmt at all
    WavCodec.decode(riff(("data", le16s(s: _*)))).getString(0) shouldBe "unknown"
    // inconsistent byteRate
    val badRate = fmtPcm(1000, 1); badRate(8) = 9
    WavCodec.decode(riff(("fmt ", badRate),
      ("data", le16s(s: _*)))).getString(0) shouldBe "unknown"
    // trailing garbage past the declared RIFF size
    val ok = riff(("fmt ", fmtPcm(1000, 1)), ("data", le16s(s: _*)))
    WavCodec.decode(ok ++ Array[Byte](1)).getString(0) shouldBe "unknown"
    // a chunk whose declared size overruns the region
    val overrun = ok.clone(); overrun(16) = 0x7f // fmt size huge
    WavCodec.decode(overrun).getString(0) shouldBe "unknown"
    // extensible WITHOUT the PCM GUID (e.g. float subformat) is refused
    val floatGuid = riff(("fmt ", {
      val f = fmtPcm(1000, 2) ++ le16s(22, 16) ++ Array[Byte](3, 0, 0, 0) ++
        Array.fill[Byte](16)(7)
      f(0) = 0xFE.toByte; f(1) = 0xFF.toByte
      f(12) = 4 // blockAlign for stereo
      f(8) = 0xA0.toByte; f(9) = 0x0F; f(10) = 0; f(11) = 0 // byteRate 4000
      f
    }), ("data", le16s(s: _*)))
    WavCodec.decode(floatGuid).getString(0) shouldBe "unknown"
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
