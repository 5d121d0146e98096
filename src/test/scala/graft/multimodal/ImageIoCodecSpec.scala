package graft.multimodal

import java.io.ByteArrayOutputStream

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * The REAL pure-JDK codec against real media bytes generated in-test:
 * PNG/JPEG decode true dimensions, resize re-encodes actual pixels, WAV
 * headers parse to exact sample rate/duration, and garbage follows the
 * totality contract — plus an end-to-end pass through the partition-wise
 * operators with a mixed-media frame.
 */
class ImageIoCodecSpec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff) // deterministic pattern
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private def wav(sampleRate: Float, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val data = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  behavior of "Multimodal.ImageIoCodec"

  it should "decode real PNG and JPEG dimensions" in {
    val p = Multimodal.ImageIoCodec.decode(png(37, 21))
    (p.getString(0), p.getInt(1), p.getInt(2)) shouldBe ("image", 37, 21)
    val j = Multimodal.ImageIoCodec.decode(jpeg(64, 48))
    (j.getString(0), j.getInt(1), j.getInt(2)) shouldBe ("image", 64, 48)
  }

  it should "resize by actually re-encoding pixels" in {
    val resized = Multimodal.ImageIoCodec.resizeImage(png(37, 21), 16, 12)
    resized should not equal png(37, 21)
    val back = Multimodal.ImageIoCodec.decode(resized)
    (back.getString(0), back.getInt(1), back.getInt(2)) shouldBe ("image", 16, 12)
  }

  it should "parse WAV sample rate and exact duration" in {
    val a = Multimodal.ImageIoCodec.decode(wav(8000f, 800))
    a.getString(0) shouldBe "audio"
    a.getInt(3) shouldBe 8000
    a.getLong(4) shouldBe 100L // 800 frames at 8 kHz = 100 ms
  }

  it should "treat garbage and nulls as unknown / pass-through, never throwing" in {
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    Multimodal.ImageIoCodec.decode(garbage).getString(0) shouldBe "unknown"
    Multimodal.ImageIoCodec.decode(null).getString(0) shouldBe "unknown"
    Multimodal.ImageIoCodec.decode(Array.emptyByteArray).getString(0) shouldBe "unknown"
    val through = Multimodal.ImageIoCodec.resizeImage(garbage, 8, 8)
    through shouldBe garbage
    (through eq garbage) shouldBe false // a NEW array, per the contract
    Multimodal.ImageIoCodec.resizeImage(null, 8, 8) shouldBe null
  }

  it should "drive the partition-wise operators end-to-end on mixed real media" in {
    import spark.implicits._
    val rows = Seq(
      (1L, png(40, 30)),
      (2L, wav(16000f, 1600)),
      (3L, Array.tabulate[Byte](32)(i => (i * 11).toByte)))
    val df = rows.toDF("asset_id", "content").repartition(3)
    val meta = Multimodal.withDecodedMeta(df, "content",
        codec = Multimodal.ImageIoCodec)
      .select($"asset_id", $"meta.kind", $"meta.width", $"meta.sample_rate",
        $"meta.duration_ms")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2),
          if (r.isNullAt(3)) -1 else r.getInt(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    meta(1L) shouldBe ("image", 40, -1, -1L)
    meta(2L) shouldBe ("audio", -1, 16000, 100L)
    meta(3L) shouldBe ("unknown", -1, -1, -1L)
    val resized = Multimodal.resizeImages(df, "content", 8, 8,
        codec = Multimodal.ImageIoCodec)
      .where($"asset_id" === 1L).select($"content").head.getAs[Array[Byte]](0)
    val back = Multimodal.ImageIoCodec.decode(resized)
    (back.getInt(1), back.getInt(2)) shouldBe (8, 8)
    // non-images untouched byte-for-byte
    Multimodal.resizeImages(df, "content", 8, 8, codec = Multimodal.ImageIoCodec)
      .where($"asset_id" === 2L).select($"content").head.getAs[Array[Byte]](0) shouldBe rows(1)._2
  }
}
