package graft

import graft.zonal.{Jpeg, Raster}

/** Baseline JPEG codec gates: a bit-level hand-assembled stream (bytes
  * placed by explicit arithmetic, independent of the encoder), the
  * block-constant lossless invariant, general-image lossy bounds, the
  * abbreviated-stream/JPEGTables path, and named refusals.
  */
class JpegSpec extends SparkSuite {

  /** Hand-assembled single-block stream: an all-128 8×8 image. After
    * level shift every sample is 0, so DC diff = 0 (Annex K DC code for
    * category 0 is '00') and AC is one EOB ('1010'): entropy data is
    * the single byte 0b00101011 (6 code bits + two 1-pad bits) = 0x2B.
    */
  test("hand-assembled stream: all-128 block decodes from explicit bits") {
    val o = new java.io.ByteArrayOutputStream()
    def m(x: Int): Unit = { o.write(0xff); o.write(x) }
    def seg(x: Int, body: Seq[Int]): Unit = {
      m(x); o.write(0); o.write(body.length + 2); body.foreach(o.write)
    }
    m(0xd8)
    seg(0xdb, Seq(0x00) ++ Seq.fill(64)(8)) // DQT: all-8 steps
    // DHT DC0: category i at length.. Annex K luminance DC
    seg(0xc4, Seq(0x00) ++ Seq(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0) ++
      (0 to 11))
    // DHT AC0: minimal table carrying only EOB (0x00) at length 4 = '1010'
    // is fragile to build by hand — use the spec's full Annex K AC table
    seg(0xc4, Seq(0x10) ++ Seq(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d) ++ Seq(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
      0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
      0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
      0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
      0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
      0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
      0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
      0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))
    seg(0xc0, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0)) // SOF0 8×8, 1 comp
    seg(0xda, Seq(1, 1, 0x00, 0, 63, 0)) // SOS
    o.write(0x2b) // '00' (DC cat 0) + '1010' (EOB) + '11' padding
    m(0xd9)
    val (w, h, px) = Jpeg.decodeGray(o.toByteArray)
    assert(w == 8 && h == 8)
    assert(px.forall(_ == 128), s"got ${px.toSeq.distinct}")
  }

  test("block-constant images round-trip EXACTLY under the fixture quant") {
    val rnd = new scala.util.Random(42)
    val w = 24; val h = 16
    val samples = new Array[Int](w * h)
    val blockVal = Array.fill(2, 3)(rnd.nextInt(256))
    for (y <- 0 until h; x <- 0 until w) samples(y * w + x) = blockVal(y / 8)(x / 8)
    val enc = Jpeg.encodeGray(samples, w, h)
    val (dw, dh, dec) = Jpeg.decodeGray(enc)
    assert(dw == w && dh == h)
    assert(dec.sameElements(samples), "block-constant round trip must be exact")
  }

  test("r20 interop: the JDK's ImageIO decodes our block-constant JPEGs pixel-exactly") {
    // an INDEPENDENT decoder on our encoder's output: a block-constant
    // image has only DC coefficients, which the fixture quant divides
    // exactly, so even across different IDCT implementations the
    // decoded pixels must agree exactly (any disagreement means the
    // STREAM is wrong — headers, Huffman tables, coefficient coding)
    val (w, h) = (32, 24)
    val px = Array.tabulate(w * h)(i =>
      ((17 * ((i % w) / 8) + 29 * ((i / w) / 8) + 3) % 251))
    val blob = Jpeg.encodeGray(px, w, h)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRaster.getSample(x, y, 0) & 0xff) == px(y * w + x),
        s"ImageIO at ($x, $y): ${img.getRaster.getSample(x, y, 0)} vs ${px(y * w + x)}")
  }

  test("general image round-trips within quantization error") {
    val w = 32; val h = 24
    val samples = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      128 + (40 * math.sin(x * 0.7) + 40 * math.cos(y * 0.5)).toInt
    }
    val enc = Jpeg.encodeGray(samples, w, h)
    val (_, _, dec) = Jpeg.decodeGray(enc)
    val maxErr = samples.indices.map(i => math.abs(dec(i) - samples(i))).max
    // AC step 16 bounds per-coefficient error at 8; spatial error stays
    // well inside ±32 for smooth content
    assert(maxErr <= 32, s"max error $maxErr")
  }

  test("abbreviated stream + JPEGTables decodes; without tables it refuses") {
    val w = 16; val h = 8
    val samples = Array.tabulate(w * h)(i => ((i % w) / 8) * 100 + 50)
    val abbrev = Jpeg.encodeGray(samples, w, h, includeTables = false)
    val e = intercept[Exception] { Jpeg.decodeGray(abbrev) }
    assert(e.getMessage.contains("JPEGTables"),
      s"wanted the missing-tables refusal, got: ${e.getMessage}")
    val (_, _, dec) = Jpeg.decodeGray(abbrev, Some(Jpeg.tablesStream()))
    assert(dec.sameElements(samples)) // block-constant → exact
  }

  test("named refusals: progressive, multi-component, 12-bit, restart") {
    def stream(sof: Int, body: Seq[Int]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(0xff); o.write(0xd8)
      o.write(0xff); o.write(sof); o.write(0); o.write(body.length + 2)
      body.foreach(o.write)
      o.toByteArray
    }
    val e1 = intercept[Exception] {
      Jpeg.decodeGray(stream(0xc2, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0)))
    }
    assert(e1.getMessage.contains("progressive"))
    val e2 = intercept[Exception] {
      Jpeg.decodeGray(stream(0xc0, Seq(8, 0, 8, 0, 8, 3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)))
    }
    assert(e2.getMessage.contains("component"))
    val e3 = intercept[Exception] {
      Jpeg.decodeGray(stream(0xc0, Seq(12, 0, 8, 0, 8, 1, 1, 0x11, 0)))
    }
    assert(e3.getMessage.contains("12-bit"))
  }

  test("DRI restart intervals: exact roundtrip, predictor resets, desync is loud") {
    // block-constant 32x24 = 12 blocks, interval 2 → 5 restart markers
    val (w, h) = (32, 24)
    val samples = Array.tabulate(w * h) { i =>
      (40 + 16 * ((i % w) / 8) + 48 * ((i / w) / 8)) % 256
    }
    val enc = Jpeg.encodeGray(samples, w, h, restartInterval = 2)
    // the stream really carries RST markers
    val nRst = enc.sliding(2).count(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(nRst == 5, s"$nRst restart markers")
    val (dw, dh, out) = Jpeg.decodeGray(enc)
    assert(dw == w && dh == h && out.sameElements(samples))
    // a declared interval with no marker at the boundary is loud
    val noRst = Jpeg.encodeGray(samples, w, h) // no DRI, no markers
    // graft a DRI segment before SOS: find FFDA, insert FFDD 0004 0002
    var sos = -1
    var i = 0
    while (sos < 0 && i < noRst.length - 1) {
      if ((noRst(i) & 0xff) == 0xff && (noRst(i + 1) & 0xff) == 0xda) sos = i
      i += 1
    }
    val grafted = noRst.take(sos) ++
      Array[Byte](0xff.toByte, 0xdd.toByte, 0, 4, 0, 2) ++ noRst.drop(sos)
    val e = intercept[Exception] { Jpeg.decodeGray(grafted) }
    assert(e.getMessage.contains("RST") || e.getMessage.contains("restart"),
      e.getMessage)
    // color MCUs restart too
    val yp = Array.fill(16 * 16)(120)
    val cb = Array.fill(16 * 16)(90)
    val cr = Array.fill(16 * 16)(160)
    val cenc = Jpeg.encodeColor(yp, cb, cr, 16, 16, subsample = false,
      restartInterval = 1)
    val (_, _, rgb) = Jpeg.decodeColor(cenc)
    assert(rgb(0).distinct.length == 1, "constant image must stay constant")
  }

  test("corrupt streams are loud: truncated entropy data, stray marker") {
    val w = 16; val h = 16
    val samples = Array.tabulate(w * h)(i => (i * 7) % 256)
    val enc = Jpeg.encodeGray(samples, w, h)
    // truncate inside the entropy segment (before EOI)
    val cut = java.util.Arrays.copyOfRange(enc, 0, enc.length - 8)
    val e1 = intercept[Exception] { Jpeg.decodeGray(cut) }
    assert(e1.getMessage.toLowerCase.contains("truncated")
      || e1.getMessage.toLowerCase.contains("corrupt"), e1.getMessage)
    // inject a stray restart marker mid-entropy: loud, not misread
    val bad = enc.clone()
    // find SOS, then stomp two bytes a little after it with FF D3
    var sos = -1
    var i = 0
    while (sos < 0 && i < bad.length - 1) {
      if ((bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xda) sos = i
      i += 1
    }
    assert(sos > 0)
    bad(sos + 16) = 0xff.toByte
    bad(sos + 17) = 0xd3.toByte
    val e2 = intercept[Exception] { Jpeg.decodeGray(bad) }
    assert(e2.getMessage.contains("restart") || e2.getMessage.contains("marker")
      || e2.getMessage.toLowerCase.contains("corrupt"), e2.getMessage)
  }

  test("YCbCr: MCU-constant 4:2:0 and 4:4:4 round-trip the planes exactly") {
    for (sub <- Seq(true, false)) {
      val f = if (sub) 16 else 8
      val (w, h) = (48, 32)
      def plane(a: Int, b: Int, c: Int): Array[Int] =
        Array.tabulate(w * h) { i =>
          val (x, y) = (i % w, i / w)
          (a * (x / f) + b * (y / f) + c) % 256
        }
      val (yp, cb, cr) = (plane(29, 13, 40), plane(17, 31, 90), plane(23, 7, 160))
      val enc = Jpeg.encodeColor(yp, cb, cr, w, h, subsample = sub)
      val (dw, dh, rgb) = Jpeg.decodeColor(enc)
      assert(dw == w && dh == h)
      // invert the exact JFIF conversion from known Y/Cb/Cr: the codec
      // must have recovered the planes exactly for every pixel
      def clamp8(v: Double): Int = math.max(0, math.min(255, math.floor(v + 0.5).toInt))
      for (i <- 0 until w * h) {
        assert(rgb(0)(i) == clamp8(yp(i) + 1.402 * (cr(i) - 128.0)), s"R at $i")
        assert(rgb(1)(i) == clamp8(yp(i) - 0.344136 * (cb(i) - 128.0)
          - 0.714136 * (cr(i) - 128.0)), s"G at $i")
        assert(rgb(2)(i) == clamp8(yp(i) + 1.772 * (cb(i) - 128.0)), s"B at $i")
      }
    }
  }

  test("YCbCr: general 4:4:4 image round-trips within the lossy bound") {
    val rnd = new scala.util.Random(11)
    val (w, h) = (24, 24)
    def smooth(seed: Int): Array[Int] = Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      128 + (40 * math.sin((x + seed) / 5.0) + 30 * math.cos(y / 4.0)).toInt
    }
    val (yp, cb, cr) = (smooth(0), smooth(7), smooth(13))
    val enc = Jpeg.encodeColor(yp, cb, cr, w, h, subsample = false)
    val (_, _, rgb) = Jpeg.decodeColor(enc)
    // reference conversion from the ORIGINAL planes; decoded RGB must
    // stay within a quantization-sized band of it
    def clamp8(v: Double): Int = math.max(0, math.min(255, math.floor(v + 0.5).toInt))
    for (i <- 0 until w * h) {
      val er = clamp8(yp(i) + 1.402 * (cr(i) - 128.0))
      assert(math.abs(rgb(0)(i) - er) <= 48, s"R at $i: ${rgb(0)(i)} vs $er")
    }
    assert(rnd != null)
  }

  test("YCbCr named refusals: wrong component count, 3x subsampling") {
    val yc = Array.fill(64)(128)
    val gray = Jpeg.encodeGray(yc, 8, 8)
    val e1 = intercept[Exception] { Jpeg.decodeColor(gray) }
    assert(e1.getMessage.contains("component"), e1.getMessage)
    val color = Jpeg.encodeColor(yc, yc, yc, 8, 8, subsample = false)
    val e2 = intercept[Exception] { Jpeg.decodeGray(color) }
    assert(e2.getMessage.contains("component"), e2.getMessage)
    // patch the Y sampling byte to 3x1: SOF body offset is fixed in the
    // encoder's layout — find SOF0 and stomp the first component's h/v
    var p = -1
    var i = 0
    while (p < 0 && i < color.length - 1) {
      if ((color(i) & 0xff) == 0xff && (color(i + 1) & 0xff) == 0xc0) p = i
      i += 1
    }
    assert(p > 0)
    val bad = color.clone()
    bad(p + 11) = 0x31.toByte // first comp: h=3, v=1
    val e3 = intercept[Exception] { Jpeg.decodeColor(bad) }
    assert(e3.getMessage.contains("subsampling"), e3.getMessage)
  }

  test("TIFF integration: YCbCr RGB fixture scans to the exact conversion") {
    val df = Raster.scanTiffBands(spark, Raster.jpegRgbFixturePath())
    val got = df.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(got.size == Raster.JpegRgbW * Raster.JpegRgbH * 3)
    def clamp8(v: Double): Double = math.max(0.0, math.min(255.0, math.floor(v + 0.5)))
    for (y <- 0 until Raster.JpegRgbH; x <- 0 until Raster.JpegRgbW) {
      val yv = Raster.jpegRgbFixtureValue(x, y, 0)
      val cb = Raster.jpegRgbFixtureValue(x, y, 1)
      val cr = Raster.jpegRgbFixtureValue(x, y, 2)
      assert(got((x, y, 0)) == clamp8(yv + 1.402 * (cr - 128.0)), s"R ($x,$y)")
      assert(got((x, y, 1)) == clamp8(yv - 0.344136 * (cb - 128.0)
        - 0.714136 * (cr - 128.0)), s"G ($x,$y)")
      assert(got((x, y, 2)) == clamp8(yv + 1.772 * (cb - 128.0)), s"B ($x,$y)")
    }
  }

  test("TIFF integration: non-YCbCr photometric on 3-band JPEG refuses by name") {
    // copy the valid RGB fixture and flip tag 262 from 6 (YCbCr) to 2
    // (RGB-stored): the IFD entry is 12 LE bytes tag/type/count/value —
    // locate by its unique (262, SHORT, 1) prefix, stomp the value
    val src = java.nio.file.Paths.get(Raster.jpegRgbFixturePath())
    val b = java.nio.file.Files.readAllBytes(src)
    var p = -1
    var i = 0
    while (p < 0 && i < b.length - 12) {
      if ((b(i) & 0xff) == 0x06 && (b(i + 1) & 0xff) == 0x01 &&
          (b(i + 2) & 0xff) == 0x03 && (b(i + 3) & 0xff) == 0x00 &&
          (b(i + 4) & 0xff) == 0x01 && (b(i + 5) & 0xff) == 0x00 &&
          (b(i + 8) & 0xff) == 0x06) p = i
      i += 1
    }
    assert(p > 0, "tag 262 entry not found")
    b(p + 8) = 0x02
    val bad = s"${System.getProperty("java.io.tmpdir")}/graft_io/jpeg_rgb_photo2.tif"
    java.nio.file.Files.write(java.nio.file.Paths.get(bad), b)
    val e = intercept[Exception] { Raster.readMeta(bad) }
    assert(e.getMessage.contains("PhotometricInterpretation"), e.getMessage)
  }

  test("TIFF integration: JPEG fixture scans to the exact block formula") {
    val df = Raster.scanTiff(spark, Raster.jpegFixturePath())
    val got = df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size == Raster.JpegW * Raster.JpegH)
    for (y <- 0 until Raster.JpegH; x <- 0 until Raster.JpegW)
      assert(got((x, y)) == Raster.jpegFixtureValue(x, y), s"cell ($x,$y)")
    // the fixture really is JPEG + JPEGTables, not silently re-encoded
    val m = Raster.readMeta(Raster.jpegFixturePath())
    assert(m.compression == 7 && m.jpegTables.nonEmpty)
  }
}
