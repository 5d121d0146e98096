package graft.multimodal

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.multimodal.Multimodal.AviCodec

class AviCodecSpec extends AnyFlatSpec with Matchers {

  private def frame(i: Int, len: Int): Array[Byte] =
    Array.tabulate(len)(j => ((i * 17 + j * 7) % 256).toByte)

  behavior of "AviCodec"

  it should "round-trip frames through the container byte-for-byte" in {
    // odd AND even payload lengths: the RIFF even-padding rule must
    // neither leak the pad byte into a frame nor desync the walk
    val frames = Seq(frame(0, 15), frame(1, 16), frame(2, 17), frame(3, 20))
    val avi = AviCodec.encode(320, 240, 25, frames)
    val out = AviCodec.videoFrames(avi)
    out should not be null
    out.length shouldBe 4
    out.zip(frames).foreach { case (a, b) => a shouldBe b }
    // demuxed arrays are copies, not views into the container
    out(0)(0) = 99.toByte
    AviCodec.videoFrames(avi)(0)(0) should not be 99.toByte
  }

  it should "decode the header metadata exactly" in {
    val avi = AviCodec.encode(640, 480, 20, Seq(frame(0, 9), frame(1, 10), frame(2, 11)))
    val m = AviCodec.decode(avi)
    m.getString(0) shouldBe "video"
    m.getInt(1) shouldBe 640
    m.getInt(2) shouldBe 480
    m.getLong(4) shouldBe 150L // 3 frames / 20 fps = 150 ms
    m.getInt(5) shouldBe 3
  }

  it should "handle a zero-frame container" in {
    val avi = AviCodec.encode(32, 24, 10, Seq.empty)
    AviCodec.decode(avi).getInt(5) shouldBe 0
    AviCodec.videoFrames(avi).length shouldBe 0
  }

  it should "be total over garbage (unknown / null, never a throw)" in {
    val good = AviCodec.encode(32, 24, 10, Seq(frame(0, 15)))
    val cases = Seq[Array[Byte]](
      null,
      Array.empty[Byte],
      "not an avi at all".getBytes,
      good.take(100),                       // truncated before movi
      good.take(good.length - 3),           // truncated inside a frame
      { val b = good.clone(); b(8) = 'X'; b },   // wrong form type
      { val b = good.clone(); b(112) = 'H'; b }, // wrong handler fourcc
      { val b = good.clone(); b(224) = 'Z'; b }) // corrupt chunk id in movi
    cases.foreach { c =>
      AviCodec.decode(c).getString(0) shouldBe "unknown"
      AviCodec.videoFrames(c) shouldBe null
    }
    // a declared frame count that disagrees with the walk is rejected
    val lied = good.clone()
    lied(48) = 2 // totalFrames: 1 -> 2
    AviCodec.decode(lied).getString(0) shouldBe "unknown"
  }

  it should "carry REAL JPEG frames: mux ImageIO JPEGs, demux, decode each" in {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def jpeg(seed: Int): Array[Byte] = {
      val img = new BufferedImage(16, 12, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16)
        img.setRGB(x, y, (seed * 7919 + y * 31 + x * 3) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val jpegs = (0 until 3).map(jpeg)
    val avi = AviCodec.encode(16, 12, 24, jpegs)
    val out = AviCodec.videoFrames(avi)
    out.length shouldBe 3
    // demux returns the muxed JPEG bytes untouched...
    out.zip(jpegs).foreach { case (a, b) => a shouldBe b }
    // ...and each payload is a decodable image with the right pixels
    out.foreach { f =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(f))
      img should not be null
      img.getWidth shouldBe 16
      img.getHeight shouldBe 12
    }
  }

  it should "demux frames as a Spark operator with kept-frame indexing" in {
    import graft.SparkTestKit.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, AviCodec.encode(32, 24, 10,
        Seq(frame(0, 15), frame(1, 16), frame(2, 17), frame(3, 18), frame(4, 19)))),
      (2L, "plain text, not video".getBytes),
      (3L, AviCodec.encode(48, 24, 12, Seq(frame(7, 21))))
    ).toDF("id", "content")
    val out = Multimodal.demuxFrames(rows, "id", "content", everyN = 2,
        codec = AviCodec)
      .select($"asset_id", $"frame_index",
        org.apache.spark.sql.functions.length($"frame").as("len"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    // doc 1 keeps source frames 0,2,4 re-indexed 0,1,2; doc 2 emits
    // nothing; doc 3 keeps its single frame
    out shouldBe Array((1L, 0, 15), (1L, 1, 17), (1L, 2, 19), (3L, 0, 21))
  }
}
