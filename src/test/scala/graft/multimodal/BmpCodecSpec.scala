package graft.multimodal

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import Multimodal.BmpCodec

class BmpCodecSpec extends AnyFlatSpec with Matchers {

  // a 3x2 test image: packed 0xRRGGBB per (x, y), y = 0 on top
  private def pix(x: Int, y: Int): Int = ((x * 40) << 16) | ((y * 90) << 8) | (x + y)

  behavior of "BmpCodec"

  it should "round-trip dimensions through encode/decode" in {
    val bmp = BmpCodec.encode(3, 2, pix)
    // header invariants of the canonical form
    bmp(0).toChar shouldBe 'B'
    bmp(1).toChar shouldBe 'M'
    bmp.length shouldBe 54 + 12 * 2 // rowBytes(3) = 12 (9 data + 3 pad)
    val meta = BmpCodec.decode(bmp)
    meta.getString(0) shouldBe "image"
    meta.getInt(1) shouldBe 3
    meta.getInt(2) shouldBe 2
  }

  it should "store rows bottom-up as BGR with zero padding" in {
    val bmp = BmpCodec.encode(3, 2, pix)
    // file row 0 = image row y=1; pixel x=2 of that row
    val o = 54 + 0 * 12 + 2 * 3
    (bmp(o) & 0xff) shouldBe (2 + 1)       // B
    (bmp(o + 1) & 0xff) shouldBe 90        // G = y*90
    (bmp(o + 2) & 0xff) shouldBe 80        // R = x*40
    bmp(54 + 9) shouldBe 0                 // row padding
    bmp(54 + 12 + 9) shouldBe 0
  }

  it should "resize by exact integer nearest-neighbor" in {
    val bmp = BmpCodec.encode(8, 6, pix)
    val out = BmpCodec.resizeImage(bmp, 4, 4)
    val meta = BmpCodec.decode(out)
    (meta.getString(0), meta.getInt(1), meta.getInt(2)) shouldBe ("image", 4, 4)
    // dst (x2, y2) must hold src (x2*8/4, y2*6/4) — check every pixel
    for (y2 <- 0 until 4; x2 <- 0 until 4) {
      val (sx, sy) = (x2 * 8 / 4, y2 * 6 / 4)
      val o = 54 + (4 - 1 - y2) * 12 + x2 * 3
      (out(o) & 0xff) shouldBe (pix(sx, sy) & 0xff)
      (out(o + 1) & 0xff) shouldBe ((pix(sx, sy) >> 8) & 0xff)
      (out(o + 2) & 0xff) shouldBe ((pix(sx, sy) >> 16) & 0xff)
    }
  }

  it should "upscale as well as downscale" in {
    val bmp = BmpCodec.encode(2, 2, pix)
    val out = BmpCodec.resizeImage(bmp, 4, 4)
    BmpCodec.decode(out).getInt(1) shouldBe 4
    // each source pixel becomes a 2x2 block
    val rb = 12 // rowBytes(4)
    val top0 = 54 + (4 - 1) * rb
    (out(top0) & 0xff) shouldBe (pix(0, 0) & 0xff)
    (out(top0 + 3) & 0xff) shouldBe (pix(0, 0) & 0xff)
    (out(top0 + 6) & 0xff) shouldBe (pix(1, 0) & 0xff)
  }

  it should "pass through corrupt, truncated, and foreign payloads" in {
    val garbage = "not a bitmap at all".getBytes("UTF-8")
    BmpCodec.decode(garbage).getString(0) shouldBe "unknown"
    BmpCodec.resizeImage(garbage, 4, 4) should equal(garbage)
    (BmpCodec.resizeImage(garbage, 4, 4) eq garbage) shouldBe false // fresh copy
    val truncated = BmpCodec.encode(8, 6, pix).take(60)
    BmpCodec.decode(truncated).getString(0) shouldBe "unknown"
    BmpCodec.decode(null).getString(0) shouldBe "unknown"
    BmpCodec.resizeImage(null, 4, 4) shouldBe null
    // 16-bpp header is rejected (only the canonical 24-bpp form decodes)
    val bad = BmpCodec.encode(3, 2, pix)
    bad(28) = 16.toByte
    BmpCodec.decode(bad).getString(0) shouldBe "unknown"
  }

  it should "expose top-down BGR pixels and exact tile means" in {
    // 4x2 image: pix(x, y) packs R = x*40, G = y*90, B = x + y
    val bmp = Multimodal.BmpCodec.encode(4, 2, pix)
    val px = Multimodal.BmpCodec.imageBgr(bmp)
    (px.width, px.height) shouldBe ((4, 2))
    // top-left pixel (0,0): B=0, G=0, R=0; pixel (1,1): B=2, G=90, R=40
    px.bgr(0) & 0xff shouldBe 0
    val o = (1 * 4 + 1) * 3
    (px.bgr(o) & 0xff, px.bgr(o + 1) & 0xff, px.bgr(o + 2) & 0xff) shouldBe ((2, 90, 40))
    Multimodal.BmpCodec.imageBgr("junk".getBytes) shouldBe null

    import graft.SparkTestKit.spark
    import spark.implicits._
    val df = Seq((1L, bmp), (2L, "text".getBytes)).toDF("id", "content")
    val got = Multimodal.imageTileStats(df, "id", "content", 2, 2,
        Multimodal.BmpCodec)
      .collect().map(r => ((r.getInt(1), r.getInt(2)),
        (r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // tile (0,0): pixels (0,0),(1,0),(0,1),(1,1): B mean = (0+1+1+2)/4 = 1,
    // G mean = (0+0+90+90)/4 = 45, R mean = (0+40+0+40)/4 = 20
    got((0, 0)) shouldBe ((4, 1L, 45L, 20L))
    // tile (1,0): x in {2,3}: B = (2+3+3+4)/4 = 3, R = (80+120)*2/4 = 100
    got((1, 0)) shouldBe ((4, 3L, 45L, 100L))
    got.size shouldBe 2 // non-image row emits nothing
  }

  behavior of "BmpCodec tolerant header walk (round 14)"

  private def put32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
  }

  /** Same logical pixels as `encode(w, h, pixf)` under a real-world
    * header variant: biSize 40-124, 24/32 bpp, bottom-up or top-down,
    * BI_RGB or canonical-mask BI_BITFIELDS, optional gap bytes before
    * the pixel data (bfOffBits > header end). */
  private def variant(w: Int, h: Int, pixf: (Int, Int) => Int, biSize: Int,
      bypp: Int, topDown: Boolean, comp: Int, gap: Int): Array[Byte] = {
    val maskBytes = if (comp == 3 && biSize <= 56) 12 else 0
    val off = 14 + biSize + maskBytes + gap
    val rb = (w * bypp + 3) & ~3
    val out = new Array[Byte](off + rb * h)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    put32(out, 2, out.length); put32(out, 10, off); put32(out, 14, biSize)
    put32(out, 18, w); put32(out, 22, if (topDown) -h else h)
    out(26) = 1.toByte; out(28) = (bypp * 8).toByte; put32(out, 30, comp)
    if (comp == 3) {
      put32(out, 54, 0xFF0000); put32(out, 58, 0xFF00); put32(out, 62, 0xFF)
    }
    for (r <- 0 until h; x <- 0 until w) {
      val y = if (topDown) r else h - 1 - r
      val p = pixf(x, y); val o = off + r * rb + x * bypp
      out(o) = p.toByte; out(o + 1) = (p >> 8).toByte; out(o + 2) = (p >> 16).toByte
      if (bypp == 4) out(o + 3) = 0xFF.toByte
    }
    out
  }

  it should "decode V2-V5, 32bpp, top-down, bitfields, and offset gaps to identical pixels" in {
    val canon = BmpCodec.imageBgr(BmpCodec.encode(5, 4, pix))
    val variants = Seq(
      "infoheader+gap" -> variant(5, 4, pix, 40, 3, topDown = false, comp = 0, gap = 4),
      "v4 32bpp topdown bitfields" -> variant(5, 4, pix, 108, 4, topDown = true, comp = 3, gap = 0),
      "v5 24bpp" -> variant(5, 4, pix, 124, 3, topDown = false, comp = 0, gap = 0),
      "v2 topdown" -> variant(5, 4, pix, 52, 3, topDown = true, comp = 0, gap = 0),
      "infoheader 32bpp appended masks" -> variant(5, 4, pix, 40, 4, topDown = false, comp = 3, gap = 0))
    for ((name, v) <- variants) withClue(name) {
      val m = BmpCodec.decode(v)
      (m.getString(0), m.getInt(1), m.getInt(2)) shouldBe (("image", 5, 4))
      BmpCodec.imageBgr(v).bgr.toSeq shouldBe canon.bgr.toSeq
    }
  }

  it should "resize variant layouts through the canonical re-encoder" in {
    val fromCanon = BmpCodec.resizeImage(BmpCodec.encode(8, 6, pix), 4, 4)
    val fromV4 = BmpCodec.resizeImage(
      variant(8, 6, pix, 108, 4, topDown = true, comp = 3, gap = 0), 4, 4)
    fromV4.toSeq shouldBe fromCanon.toSeq // byte-identical canonical output
  }

  it should "stay unknown outside the whitelist (swapped masks, paletted, RLE, CORE)" in {
    // channel-swapped masks (RGB memory order instead of BGR)
    val swapped = variant(5, 4, pix, 108, 4, topDown = false, comp = 3, gap = 0)
    put32(swapped, 54, 0xFF); put32(swapped, 62, 0xFF0000)
    BmpCodec.decode(swapped).getString(0) shouldBe "unknown"
    // 8-bpp paletted
    val pal = variant(5, 4, pix, 40, 3, topDown = false, comp = 0, gap = 0)
    pal(28) = 8.toByte
    BmpCodec.decode(pal).getString(0) shouldBe "unknown"
    // RLE8 compression
    val rle = variant(5, 4, pix, 40, 3, topDown = false, comp = 0, gap = 0)
    put32(rle, 30, 1)
    BmpCodec.decode(rle).getString(0) shouldBe "unknown"
    // BITMAPCOREHEADER (different field layout entirely)
    val core = variant(5, 4, pix, 40, 3, topDown = false, comp = 0, gap = 0)
    put32(core, 14, 12)
    BmpCodec.decode(core).getString(0) shouldBe "unknown"
    // bfOffBits inside the V5 header
    val badOff = variant(5, 4, pix, 124, 3, topDown = false, comp = 0, gap = 0)
    put32(badOff, 10, 60)
    BmpCodec.decode(badOff).getString(0) shouldBe "unknown"
  }

  it should "agree with javax.imageio on the gap variant" in {
    val v = variant(5, 3, pix, 40, 3, topDown = false, comp = 0, gap = 8)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(v))
    img should not be null
    img.getWidth shouldBe 5
    for (y <- 0 until 3; x <- 0 until 5)
      (img.getRGB(x, y) & 0xffffff) shouldBe pix(x, y)
  }

  it should "agree with javax.imageio on its own output" in {
    // the JDK reads BMP: cross-validate dimensions and pixel content
    val bmp = BmpCodec.encode(5, 3, pix)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    img should not be null
    img.getWidth shouldBe 5
    img.getHeight shouldBe 3
    for (y <- 0 until 3; x <- 0 until 5)
      (img.getRGB(x, y) & 0xffffff) shouldBe pix(x, y)
  }
}
