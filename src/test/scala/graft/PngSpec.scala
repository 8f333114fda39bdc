package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.zonal.Png

/** The from-spec PNG codec (r20): per-filter round trips on
  * non-constant data, HAND-ASSEMBLED filter vectors (so a decoder bug
  * can't hide behind its own encoder), chunk-CRC corruption loud-fail,
  * and the out-of-boundary refusals.
  */
class PngSpec extends AnyFunSuite {

  private def px(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => (i * 37 + (i * i) % 91 + 5) % 256)

  test("each filter type round-trips exactly on non-constant data") {
    val (w, h) = (23, 9) // odd sizes: no block alignment to lean on
    val p = px(w, h)
    for (f <- 0 to 4) {
      val blob = Png.encodeGray(p, w, h, _ => f)
      val (dw, dh, back) = Png.decodeGray(blob)
      assert(dw == w && dh == h)
      assert(back.sameElements(p), s"filter $f round trip")
    }
    // the default rotation exercises all five in one image
    val (_, _, rot) = Png.decodeGray(Png.encodeGray(p, w, h))
    assert(rot.sameElements(p))
  }

  test("hand-assembled filter vectors: Sub, Paeth and Average scanlines decode to the pinned pixels") {
    // 3x2 gray: row0 = [10,20,30] (Sub), row1 = [40,60,90] (Paeth).
    // Hand-filtered (spec section 6):
    //   row0 Sub:   10, 20-10=10, 30-20=10            -> 1,10,10,10
    //   row1 Paeth: x0 pred=b=10 -> 30; x1 pred=a=40 -> 20;
    //               x2 pred=a=60 -> 30                -> 4,30,20,30
    def assemble(raw: Array[Int], w: Int, h: Int): Array[Byte] = {
      val sig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)
      def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
        val t = tpe.getBytes("US-ASCII")
        val c = new java.util.zip.CRC32(); c.update(t); c.update(data)
        val bb = java.nio.ByteBuffer.allocate(12 + data.length)
        bb.putInt(data.length).put(t).put(data).putInt(c.getValue.toInt)
        bb.array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
      ihdr.putInt(w).putInt(h).put(8.toByte).put(0.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte)
      sig ++ chunk("IHDR", ihdr.array()) ++
        chunk("IDAT", graft.zonal.TiffCodec.deflate(raw.map(_.toByte))) ++
        chunk("IEND", Array.emptyByteArray)
    }
    val subPaeth = assemble(Array(1, 10, 10, 10, 4, 30, 20, 30), 3, 2)
    val (_, _, p1) = Png.decodeGray(subPaeth)
    assert(p1.sameElements(Array(10, 20, 30, 40, 60, 90)), p1.mkString(","))
    // row1 as Average instead: x0 floor(10/2)=5 -> 35; x1 (40+20)/2=30
    // -> 30; x2 (60+30)/2=45 -> 45                -> 3,35,30,45
    val subAvg = assemble(Array(1, 10, 10, 10, 3, 35, 30, 45), 3, 2)
    val (_, _, p2) = Png.decodeGray(subAvg)
    assert(p2.sameElements(Array(10, 20, 30, 40, 60, 90)), p2.mkString(","))
    // Up on row1: 40-10=30, 60-20=40, 90-30=60     -> 2,30,40,60
    val subUp = assemble(Array(1, 10, 10, 10, 2, 30, 40, 60), 3, 2)
    val (_, _, p3) = Png.decodeGray(subUp)
    assert(p3.sameElements(Array(10, 20, 30, 40, 60, 90)), p3.mkString(","))
  }

  test("a flipped IDAT byte fails the chunk CRC loudly; refusals by name") {
    val blob = Png.encodeGray(px(16, 8), 16, 8)
    // find the IDAT payload and flip one byte
    val idx = blob.indexOfSlice("IDAT".getBytes("US-ASCII"))
    val bad = blob.clone(); bad(idx + 6) = (bad(idx + 6) ^ 0x41).toByte
    val e = intercept[IllegalArgumentException](Png.decodeGray(bad))
    assert(e.getMessage.contains("CRC"), e.getMessage)
    // refusals: colour type, bit depth, interlace
    def tweak(off: Int, v: Byte): Array[Byte] = {
      // IHDR data starts at 8 (sig) + 8 (len+type); fix up the CRC
      val b = blob.clone(); b(16 + off) = v
      val c = new java.util.zip.CRC32(); c.update(b, 12, 4 + 13)
      java.nio.ByteBuffer.wrap(b, 29, 4).putInt(c.getValue.toInt)
      b
    }
    assert(intercept[IllegalArgumentException](
      Png.decodeGray(tweak(9, 3))).getMessage.contains("colour type")) // palette
    assert(intercept[IllegalArgumentException](
      Png.decodeGray(tweak(8, 4))).getMessage.contains("bit depth")) // 4-bit
    assert(intercept[IllegalArgumentException](
      Png.decodeGray(tweak(12, 1))).getMessage.contains("interlace"))
    assert(intercept[IllegalArgumentException](
      Png.decodeGray(Array.fill(20)(0x11.toByte))).getMessage.contains("signature"))
  }

  test("r20 truecolour: per-filter RGB round trips; gray/rgb entry points refuse each other") {
    val (w, h) = (11, 7)
    val p = Array.tabulate(w * h)(i =>
      (((i * 53 + 11) % 256) << 16) | (((i * 29 + 7) % 256) << 8) | ((i * 71 + 3) % 256))
    for (f <- 0 to 4) {
      val (dw, dh, back) = Png.decodeRgb(Png.encodeRgb(p, w, h, _ => f))
      assert(dw == w && dh == h)
      assert(back.sameElements(p), s"rgb filter $f round trip")
    }
    val gray = Png.encodeGray(px(8, 8), 8, 8)
    val rgb = Png.encodeRgb(p, w, h)
    assert(intercept[IllegalArgumentException](Png.decodeRgb(gray))
      .getMessage.contains("truecolour (2) expected"))
    assert(intercept[IllegalArgumentException](Png.decodeGray(rgb))
      .getMessage.contains("grayscale (0) expected"))
  }

  test("r20 interop: the JDK's ImageIO decodes our PNGs and our decoder reads ImageIO's — pixel-exact both ways") {
    // javax.imageio is a fully INDEPENDENT codec in the JDK — PNG is
    // lossless, so cross-decoding must be bit-exact in both directions
    // (a from-spec misreading that our own encode∘decode round trip
    // cannot see dies here)
    val (w, h) = (19, 11)
    val gray = px(w, h)
    // ours -> ImageIO
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Png.encodeGray(gray, w, h)))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRaster.getSample(x, y, 0) & 0xff) == gray(y * w + x),
        s"ImageIO gray at ($x, $y)")
    val rgb = Array.tabulate(w * h)(i =>
      (((i * 53 + 11) % 256) << 16) | (((i * 29 + 7) % 256) << 8) | ((i * 71 + 3) % 256))
    val imgC = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Png.encodeRgb(rgb, w, h)))
    for (y <- 0 until h; x <- 0 until w)
      assert((imgC.getRGB(x, y) & 0xffffff) == rgb(y * w + x),
        s"ImageIO rgb at ($x, $y)")
    // ImageIO -> ours
    val biG = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      biG.getRaster.setSample(x, y, 0, gray(y * w + x))
    val outG = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(biG, "png", outG))
    val (gw, gh, gBack) = Png.decodeGray(outG.toByteArray)
    assert(gw == w && gh == h && gBack.sameElements(gray), "our decoder on ImageIO gray")
    val biC = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) biC.setRGB(x, y, rgb(y * w + x))
    val outC = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(biC, "png", outC))
    val (cw, ch, cBack) = Png.decodeRgb(outC.toByteArray)
    assert(cw == w && ch == h && cBack.sameElements(rgb), "our decoder on ImageIO rgb")
  }

  test("r20 16-bit grayscale: per-filter round trips, ImageIO interop both ways, 8/16 entry points refuse each other") {
    val (w, h) = (13, 9)
    val p = Array.tabulate(w * h)(i => (i * 5737 + (i * i) % 911 + 3) % 65536)
    for (f <- 0 to 4) {
      val (dw, dh, back) = Png.decodeGray16(Png.encodeGray16(p, w, h, _ => f))
      assert(dw == w && dh == h && back.sameElements(p), s"16-bit filter $f")
    }
    // ours -> ImageIO (TYPE_USHORT_GRAY)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Png.encodeGray16(p, w, h)))
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRaster.getSample(x, y, 0) & 0xffff) == p(y * w + x),
        s"ImageIO 16-bit at ($x, $y)")
    // ImageIO -> ours
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w) bi.getRaster.setSample(x, y, 0, p(y * w + x))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "png", out))
    val (bw, bh, back) = Png.decodeGray16(out.toByteArray)
    assert(bw == w && bh == h && back.sameElements(p), "our decoder on ImageIO 16-bit")
    // entry-point mismatches refuse by name
    assert(intercept[IllegalArgumentException](
      Png.decodeGray(Png.encodeGray16(p, w, h))).getMessage.contains("decodeGray16"))
    assert(intercept[IllegalArgumentException](
      Png.decodeGray16(Png.encodeGray(px(8, 8), 8, 8)))
      .getMessage.contains("16-bit grayscale expected"))
  }

  test("the registry fixture: every image decodes to its block formula") {
    import graft.llm.Multimodal
    val dir = Multimodal.pngBlobDir()
    for (k <- Seq(0, 7, 15)) {
      val blob = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, f"img_$k%03d.png"))
      val (w, h, p) = Png.decodeGray(blob)
      assert(w == Multimodal.MmJpegW && h == Multimodal.MmJpegH)
      for (y <- 0 until h; x <- 0 until w)
        assert(p(y * w + x) == Multimodal.mmPngLuma(k, x / 8, y / 8))
    }
  }
}
