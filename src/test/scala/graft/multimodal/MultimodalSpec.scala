package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class MultimodalSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  private def assets = Seq(
    (1L, Array[Byte](0, 10, 20, 30) ++ Array.fill[Byte](100)(7)),   // 0 % 3 -> image
    (2L, Array[Byte](1, 50, 60, 70) ++ Array.fill[Byte](300)(8)),   // 1 % 3 -> audio
    (3L, Array[Byte](2, 90, 100, 110) ++ Array.fill[Byte](600)(9)), // 2 % 3 -> video
    (4L, Array[Byte](3, 1)),                                        // too short -> unknown
    (5L, null.asInstanceOf[Array[Byte]])).toDF("asset_id", "content")

  behavior of "Multimodal"

  it should "decode typed metadata partition-wise" in {
    val out = Multimodal.withDecodedMeta(assets, "content")
      .select("asset_id", "meta.kind", "meta.width", "meta.sample_rate", "meta.n_frames")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    out shouldBe Map(1L -> "image", 2L -> "audio", 3L -> "video", 4L -> "unknown", 5L -> "unknown")
    val img = Multimodal.withDecodedMeta(assets, "content").where("asset_id = 1").head
    img.getAs[org.apache.spark.sql.Row]("meta").getInt(1) shouldBe 64 + 10 % 192
  }

  it should "resize only image assets, preserving schema" in {
    val resized = Multimodal.resizeImages(assets.where("content is not null"), "content", 128, 96)
    resized.schema shouldBe assets.schema
    val m = Multimodal.withDecodedMeta(resized, "content")
      .select("asset_id", "meta.kind", "meta.width", "meta.height")
      .collect().map(r => r.getLong(0) -> r).toMap
    m(1L).getInt(2) shouldBe 64 + 128 % 192   // re-headered width
    m(2L).getString(1) shouldBe "audio"       // untouched
  }

  it should "sample every other frame chunk with indices" in {
    val frames = Multimodal.sampleFrames(
      assets.where("asset_id = 3"), "asset_id", "content", frameBytes = 100, everyN = 2)
    val idx = frames.select("frame_index").collect().map(_.getInt(0)).toSeq
    idx.sorted shouldBe Seq(0, 2, 4, 6) // 604 bytes -> 7 chunks, every 2nd
    frames.select(max(org.apache.spark.sql.functions.length(col("frame")))).head.getInt(0) should be <= 100
  }

  it should "extract a byte histogram summing to the payload size" in {
    val h = Multimodal.byteHistogram(assets.where("asset_id = 2"), "content")
      .select(aggregate(col("histogram"), lit(0L), (a, x) => a + x).as("total"),
        element_at(col("histogram"), 9).as("eights")) // byte value 8 -> bin index 9 (1-based)
      .head
    h.getLong(0) shouldBe 304L
    h.getLong(1) shouldBe 300L
  }

  it should "compose demux -> REAL JPEG decode -> tile stats end-to-end" in {
    // a true MJPEG pipeline: the AVI 00dc chunks are REAL JPEGs
    // (javax.imageio-encoded), demuxFrames hands each payload to the
    // REAL ImageIoCodec, and the per-tile channel means must equal an
    // independent per-pixel recompute from ImageIO's own decode of the
    // SAME payload bytes — pinning the composition without assuming
    // anything about JPEG quantization
    def jpegOf(w: Int, h: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbAt(x, y))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    // frame 0: uniform mid-gray; frame 1: left/right halves
    val j0 = jpegOf(16, 8, (_, _) => 0x606060)
    val j1 = jpegOf(16, 8, (x, _) => if (x < 8) 0x202020 else 0xa0a0a0)
    val avi = Multimodal.AviCodec.encode(16, 8, 10, Seq(j0, j1))
    val df = Seq((7L, avi)).toDF("id", "content")
    val frames = Multimodal.demuxFrames(df, "id", "content", everyN = 1,
        codec = Multimodal.AviCodec)
      .select((col("asset_id") * 16 + col("frame_index")).as("fid"), col("frame"))
    // demuxed payloads are byte-identical to the muxed JPEGs
    val payloads = frames.orderBy("fid").collect().map(_.getAs[Array[Byte]]("frame"))
    payloads.length shouldBe 2
    payloads(0) shouldBe j0
    payloads(1) shouldBe j1
    val got = Multimodal.imageTileStats(frames, "fid", "frame",
        tileW = 8, tileH = 8, codec = Multimodal.ImageIoCodec)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
        (r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    got.size shouldBe 4 // 2 frames x 2 tiles (16x8 at 8x8 tiles)
    // independent expectation: re-decode each JPEG with ImageIO directly
    def expectTile(jpeg: Array[Byte], tx: Int): (Int, Long, Long, Long) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      var (sb, sg, sr) = (0L, 0L, 0L)
      for (y <- 0 until 8; x <- tx * 8 until tx * 8 + 8) {
        val p = img.getRGB(x, y)
        sb += p & 0xff; sg += (p >> 8) & 0xff; sr += (p >> 16) & 0xff
      }
      (64, sb / 64, sg / 64, sr / 64)
    }
    for ((jpeg, fi) <- Seq(j0, j1).zipWithIndex; tx <- 0 to 1)
      got((7L * 16 + fi, tx, 0)) shouldBe expectTile(jpeg, tx)
    // and the halves frame really decoded dark-left / bright-right
    got((7L * 16 + 1, 0, 0))._2 should be < got((7L * 16 + 1, 1, 0))._2
  }
}
