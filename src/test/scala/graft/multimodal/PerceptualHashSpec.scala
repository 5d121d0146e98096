package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark
import Multimodal.{BmpCodec, WavCodec}

/** Pins the perceptual-signature operators: [[Multimodal.imageHash]]
  * (aHash over real decoded pixels) and [[Multimodal.audioFingerprint]]
  * (window-energy envelope bits), plus their dedup consumer
  * [[graft.dedup.Dedup.keyCanon]]. */
class PerceptualHashSpec extends AnyFlatSpec with Matchers {
  import spark.implicits._

  private def grayBmp(values: Seq[Seq[Int]]): Array[Byte] = {
    val h = values.length; val w = values.head.length
    BmpCodec.encode(w, h, (x, y) =>
      (values(y)(x) << 16) | (values(y)(x) << 8) | values(y)(x))
  }

  behavior of "Multimodal.imageHash"

  it should "hand-compute the aHash of a 2x2 gray ramp at side 2" in {
    // grays 0, 30 / 60, 90 -> mean 45 -> bits (row-major) 0,0,1,1
    val df = Seq((1L, grayBmp(Seq(Seq(0, 30), Seq(60, 90)))))
      .toDF("asset_id", "content")
    val r = Multimodal.imageHash(df, "asset_id", "content", side = 2,
      codec = BmpCodec).head
    (r.getInt(1), r.getInt(2)) shouldBe ((2, 2))
    r.getLong(3) shouldBe 0L                       // hash_hi
    r.getLong(4) shouldBe ((1L << 2) | (1L << 3))  // hash_lo = 12
  }

  it should "downsample nearest-neighbor with src = dst*dim/side" in {
    // 4x4 image, side 2: cells sample source pixels (0,0),(2,0),(0,2),(2,2)
    val v = Seq(
      Seq(200, 0, 10, 0),
      Seq(0, 0, 0, 0),
      Seq(20, 0, 250, 0),
      Seq(0, 0, 0, 0))
    val r = Multimodal.imageHash(Seq((1L, grayBmp(v))).toDF("asset_id", "content"),
      "asset_id", "content", side = 2, codec = BmpCodec).head
    // sampled grays 200,10,20,250 -> mean 120 -> bits 1,0,0,1
    r.getLong(4) shouldBe ((1L << 0) | (1L << 3))
  }

  it should "emit no row for undecodable or null payloads" in {
    val df = Seq((1L, "not a bmp".getBytes), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("asset_id", "content")
    Multimodal.imageHash(df, "asset_id", "content", codec = BmpCodec)
      .count() shouldBe 0L
  }

  it should "give identical images identical hashes and level-shifted ones too" in {
    // aHash thresholds against the clip mean, so a uniform +10 shift
    // (no wraparound) keeps every bit
    val a = grayBmp(Seq(Seq(0, 30), Seq(60, 90)))
    val b = grayBmp(Seq(Seq(10, 40), Seq(70, 100)))
    val hs = Multimodal.imageHash(
      Seq((1L, a), (2L, b)).toDF("asset_id", "content"),
      "asset_id", "content", side = 2, codec = BmpCodec)
      .select("hash_hi", "hash_lo").distinct().count()
    hs shouldBe 1L
  }

  it should "reject side outside 1..8" in {
    val df = Seq((1L, grayBmp(Seq(Seq(0))))).toDF("asset_id", "content")
    an[IllegalArgumentException] should be thrownBy
      Multimodal.imageHash(df, "asset_id", "content", side = 9, codec = BmpCodec)
  }

  behavior of "Multimodal.audioFingerprint"

  it should "hand-compute the envelope bits of a 3-window clip" in {
    // windows of 2: energies 0, 100, 0 -> floor 33 -> bits 0,1,0
    val wav = WavCodec.encode(1000, Array[Short](0, 0, 10, 10, 0, 0))
    val r = Multimodal.audioFingerprint(Seq((1L, wav)).toDF("asset_id", "content"),
      "asset_id", "content", windowSamples = 2, codec = WavCodec).head
    r.getInt(1) shouldBe 3       // n_windows
    r.getLong(2) shouldBe 33L    // energy_floor
    r.getLong(3) shouldBe 2L     // fp = bit 1
  }

  it should "cap the fingerprint at the first 62 windows" in {
    // 63 one-sample windows, only the last loud: its bit (62) is beyond
    // the prefix bound, so fp stays 0 while n_windows reports 63
    val samples = Array.fill[Short](63)(0); samples(62) = 1000
    val wav = WavCodec.encode(1000, samples)
    val r = Multimodal.audioFingerprint(Seq((1L, wav)).toDF("asset_id", "content"),
      "asset_id", "content", windowSamples = 1, codec = WavCodec).head
    r.getInt(1) shouldBe 63
    r.getLong(3) shouldBe 0L
  }

  it should "emit no row for non-audio payloads" in {
    val df = Seq((1L, "plain text".getBytes)).toDF("asset_id", "content")
    Multimodal.audioFingerprint(df, "asset_id", "content", windowSamples = 2,
      codec = WavCodec).count() shouldBe 0L
  }

  behavior of "Dedup.keyCanon"

  it should "map every id to the minimum id sharing the key tuple" in {
    val df = Seq((5L, 1L, 2L), (3L, 1L, 2L), (9L, 1L, 3L))
      .toDF("id", "k1", "k2")
    val out = graft.dedup.Dedup.keyCanon(df, "id", Seq("k1", "k2"))
      .as[(Long, Long)].collect().toMap
    out shouldBe Map(5L -> 3L, 3L -> 3L, 9L -> 9L)
  }

  it should "group null keys null-safely instead of dropping them" in {
    val df = Seq((4L, Some(1L)), (2L, None), (7L, None))
      .toDF("id", "k")
    val out = graft.dedup.Dedup.keyCanon(df, "id", Seq("k"))
      .as[(Long, Long)].collect().toMap
    out shouldBe Map(4L -> 4L, 2L -> 2L, 7L -> 2L)
  }

  it should "reject an empty key list and id-as-key" in {
    val df = Seq((1L, 2L)).toDF("id", "k")
    an[IllegalArgumentException] should be thrownBy
      graft.dedup.Dedup.keyCanon(df, "id", Nil)
    an[IllegalArgumentException] should be thrownBy
      graft.dedup.Dedup.keyCanon(df, "id", Seq("id"))
  }
}
