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
}
