package graft.zonal

/** Baseline JPEG codec (round 11 — the last entry in the r10 verdict's
  * missing-codec list: TIFF Compression=7 "new-style JPEG", the codec
  * 8-bit imagery COGs actually ship with). Implemented from the public
  * ITU-T T.81 specification: baseline sequential DCT, Huffman entropy
  * coding, 8-bit GRAYSCALE (one component) — the raster engine's cube
  * is single-band by design, and color (YCbCr subsampled) tiles are
  * refused loudly by name rather than silently mis-decoded.
  *
  * Both directions are here: the decoder is the read path wired into
  * [[Raster]] tile decode; the encoder writes the fixtures and the
  * sink direction. JPEG is lossy in general — the oracle gate uses
  * BLOCK-CONSTANT images (each 8×8 block one value), for which the
  * round trip is mathematically EXACT: a constant block has only a DC
  * coefficient (8·(v−128)), the fixture quant table's DC step of 8
  * divides it exactly, and the float IDCT of a DC-only block is the
  * constant DC/8 — so encode∘decode is the identity and the DuckDB
  * formula replay hash-matches. General images round-trip within the
  * usual quantization error (JpegSpec bounds it).
  *
  * Supported: SOI/EOI, DQT (8-bit precision), DHT, SOF0 (8-bit, one
  * component), SOS, APPn/COM skip, byte stuffing, and ABBREVIATED
  * streams fed by a separate tables stream (the TIFF JPEGTables tag
  * 347 pattern). Refused by name: progressive (SOF2), arithmetic
  * coding (SOF9+), multi-component scans, 12-bit precision, 16-bit
  * quant tables, restart intervals (DRI > 0).
  */
object Jpeg {

  // zig-zag scan order: zigzag(k) = natural (row-major) index of the
  // k-th coefficient in scan order (public T.81 Figure 5)
  private[zonal] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K "typical" luminance Huffman tables (BITS counts + values) —
  // part of the public spec, used by virtually every baseline encoder.
  private val DcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals = Array(
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
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Fixture quant table, scan order: DC step 8 (divides every 8·(v−128)
    * exactly — the block-constant lossless invariant), AC step 16.
    */
  private[zonal] val FixtureQuant: Array[Int] =
    Array.tabulate(64)(k => if (k == 0) 8 else 16)

  // ---- canonical Huffman code construction (T.81 Annex C) ----

  /** (value → (code, length)) for encoding. */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    for (len <- 1 to 16) {
      for (_ <- 0 until bits(len)) {
        out(vals(k)) = (code, len)
        code += 1
        k += 1
      }
      code <<= 1
    }
    out
  }

  /** Decode tables: per-length min/max codes + value offsets. */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    private var code = 0
    private var k = 0
    for (len <- 1 to 16) {
      if (bits(len) > 0) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len)
        k += bits(len)
        maxCode(len) = code - 1
      }
      code <<= 1
    }
    def decode(br: BitReader): Int = {
      var len = 1
      var c = br.bit()
      while (len <= 16 && (maxCode(len) < 0 || c > maxCode(len))) {
        c = (c << 1) | br.bit()
        len += 1
      }
      require(len <= 16, "corrupt JPEG: huffman code over 16 bits")
      vals(valPtr(len) + (c - minCode(len)))
    }
  }

  /** MSB-first entropy bit reader with 0xFF00 byte unstuffing. */
  private[zonal] final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < b.length, "corrupt JPEG: entropy data truncated")
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          require(pos < b.length, "corrupt JPEG: dangling 0xFF")
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed data byte
          else if (m >= 0xd0 && m <= 0xd7)
            sys.error("restart marker inside entropy data where none was " +
              "expected (interval desync) — corrupt")
          else {
            // marker: entropy data ended early (over-read) — corrupt
            sys.error(f"corrupt JPEG: marker 0xFF$m%02X inside entropy data")
          }
        }
        cur = v
        nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def bitsVal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Consume an expected RSTn marker (r12 — DRI support): drop the
      * pad bits of the current byte, then require FF D(n). A missing
      * or out-of-sequence restart is loud, never resynchronized —
      * silent resync hides corrupt stripes.
      */
    def restart(expected: Int): Unit = {
      nbits = 0 // byte-align: the encoder 1-padded the tail bits
      require(pos + 1 < b.length, "corrupt JPEG: truncated at restart")
      require((b(pos) & 0xff) == 0xff && (b(pos + 1) & 0xff) == (0xd0 | (expected & 7)),
        f"corrupt JPEG: expected RST${expected & 7} at $pos, " +
          f"found 0x${b(pos) & 0xff}%02X${b(pos + 1) & 0xff}%02X")
      pos += 2
    }
  }

  /** T.81 EXTEND: map `cat` raw bits to the signed coefficient. */
  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0 else if (v < (1 << (cat - 1))) v - (1 << cat) + 1 else v

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  // ---- 8×8 DCT (naive separable float — exact for the DC-only path) --

  private val Cos: Array[Double] = {
    val t = new Array[Double](64)
    for (u <- 0 until 8; x <- 0 until 8)
      t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private def cFac(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val f = coef(v * 8 + u)
            if (f != 0) s += cFac(u) * cFac(v) * f * Cos(u * 8 + x) * Cos(v * 8 + y)
            u += 1
          }
          v += 1
        }
        val px = math.rint(s / 4.0 + 128.0).toInt
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
  }

  private def fdctBlock(px: Array[Int], coef: Array[Double]): Unit = {
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += (px(y * 8 + x) - 128) * Cos(u * 8 + x) * Cos(v * 8 + y)
            x += 1
          }
          y += 1
        }
        coef(v * 8 + u) = cFac(u) * cFac(v) * s / 4.0
        u += 1
      }
      v += 1
    }
  }

  // ---- marker-level table state ----

  private final class Tables {
    val quant = new Array[Array[Int]](4) // natural order
    val dcHuff = new Array[HuffDecoder](4)
    val acHuff = new Array[HuffDecoder](4)
  }

  /** Parse DQT/DHT segments from a tables-only stream (TIFF JPEGTables
    * tag content: SOI, tables, EOI) into `t`.
    */
  private def parseTables(b: Array[Byte], from: Int, t: Tables): Unit = {
    var p = from
    while (p + 1 < b.length) {
      require((b(p) & 0xff) == 0xff, f"tables stream: expected marker at $p")
      val m = b(p + 1) & 0xff
      p += 2
      m match {
        case 0xd8 => () // SOI
        case 0xd9 => return // EOI
        case 0xdb | 0xc4 =>
          val len = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
          readTableSegment(b, p + 2, p + len, m, t)
          p += len
        case other => sys.error(f"tables stream: unsupported marker 0xFF$other%02X")
      }
    }
  }

  private def readTableSegment(b: Array[Byte], from: Int, until: Int,
      marker: Int, t: Tables): Unit = {
    var p = from
    while (p < until) {
      if (marker == 0xdb) { // DQT
        val pq = (b(p) & 0xf0) >> 4
        val tq = b(p) & 0x0f
        require(pq == 0, "16-bit quantization tables unsupported (baseline is 8-bit)")
        require(tq < 4, s"DQT table id $tq")
        val q = new Array[Int](64)
        for (k <- 0 until 64) q(Zigzag(k)) = b(p + 1 + k) & 0xff
        t.quant(tq) = q
        p += 65
      } else { // DHT
        val tc = (b(p) & 0xf0) >> 4
        val th = b(p) & 0x0f
        require(tc <= 1 && th < 4, s"DHT class $tc id $th")
        val bits = new Array[Int](17)
        var n = 0
        for (len <- 1 to 16) { bits(len) = b(p + len) & 0xff; n += bits(len) }
        val vals = Array.tabulate(n)(k => b(p + 17 + k) & 0xff)
        val dec = new HuffDecoder(bits, vals)
        if (tc == 0) t.dcHuff(th) = dec else t.acHuff(th) = dec
        p += 17 + n
      }
    }
  }

  /** One frame component's facts (SOF) + its scan tables (SOS). */
  private final class Comp(val id: Int, val hs: Int, val vs: Int, val tq: Int) {
    var td = 0
    var ta = 0
  }

  /** Decode one baseline grayscale stream (optionally abbreviated,
    * with `tablesStream` carrying DQT/DHT — the TIFF JPEGTables
    * pattern). Returns (width, height, samples row-major u8-as-int).
    */
  def decodeGray(b: Array[Byte], tablesStream: Option[Array[Byte]] = None): (Int, Int, Array[Int]) = {
    val (w, h, _, planes, pw, _) = decodeBaseline(b, tablesStream, 1)
    // crop the block-padded plane to the image
    val out = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) out(y * w + x) = planes(0)(y * pw(0) + x)
    (w, h, out)
  }

  /** Decode one baseline YCbCr stream (r12 — PhotometricInterpretation=6
    * tiles, the most common JPEG-in-TIFF payload: 8-bit RGB imagery
    * COGs): 3 components, sampling factors 1 or 2 per axis (4:4:4,
    * 4:2:2, 4:2:0), MCU-interleaved scan, chroma upsampled by sample
    * replication, then the JFIF full-range YCbCr→RGB with the shared
    * floor(x + 0.5) rounding (spelled identically in the DuckDB twin).
    * Returns (width, height, Array(r, g, b) planes row-major).
    */
  def decodeColor(b: Array[Byte], tablesStream: Option[Array[Byte]] = None): (Int, Int, Array[Array[Int]]) = {
    val (w, h, comps, planes, pw, _) = decodeBaseline(b, tablesStream, 3)
    val hmax = comps.map(_.hs).max
    val vmax = comps.map(_.vs).max
    val r = new Array[Int](w * h)
    val g = new Array[Int](w * h)
    val bl = new Array[Int](w * h)
    def clamp8(v: Double): Int = {
      val i = math.floor(v + 0.5).toInt
      if (i < 0) 0 else if (i > 255) 255 else i
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        def samp(c: Int): Int =
          planes(c)((y * comps(c).vs / vmax) * pw(c) + x * comps(c).hs / hmax)
        val yv = samp(0).toDouble
        val cb = samp(1).toDouble
        val cr = samp(2).toDouble
        val i = y * w + x
        r(i) = clamp8(yv + 1.402 * (cr - 128.0))
        g(i) = clamp8(yv - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0))
        bl(i) = clamp8(yv + 1.772 * (cb - 128.0))
        x += 1
      }
      y += 1
    }
    (w, h, Array(r, g, bl))
  }

  /** The shared baseline-sequential machine: marker parse, MCU-
    * interleaved Huffman/DCT decode. Returns the components, their
    * block-padded planes and the plane dims (stride = pw).
    */
  private def decodeBaseline(b: Array[Byte], tablesStream: Option[Array[Byte]],
      nfWant: Int): (Int, Int, Array[Comp], Array[Array[Int]], Array[Int], Array[Int]) = {
    val t = new Tables
    tablesStream.foreach(ts => parseTables(ts, 0, t))
    require(b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      "not a JPEG stream (no SOI)")
    var p = 2
    var w = -1
    var h = -1
    var comps: Array[Comp] = null
    var sosAt = -1
    var restartInterval = 0
    while (sosAt < 0) {
      require(p + 3 < b.length, "truncated JPEG: no SOS")
      require((b(p) & 0xff) == 0xff, f"expected marker at $p")
      val m = b(p + 1) & 0xff
      val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
      m match {
        case 0xc0 | 0xc1 => // SOF0 baseline (SOF1 extended-seq decodes identically)
          require((b(p + 4) & 0xff) == 8, "12-bit precision unsupported (baseline is 8)")
          h = ((b(p + 5) & 0xff) << 8) | (b(p + 6) & 0xff)
          w = ((b(p + 7) & 0xff) << 8) | (b(p + 8) & 0xff)
          val nf = b(p + 9) & 0xff
          require(nf == nfWant, s"$nf-component JPEG where $nfWant expected — " +
            "grayscale tiles decode via decodeGray, YCbCr (Photometric=6) " +
            "tiles via decodeColor")
          comps = Array.tabulate(nf) { c =>
            val o = p + 10 + 3 * c
            val hv = b(o + 1) & 0xff
            val (hs, vs) = ((hv >> 4) & 0x0f, hv & 0x0f)
            if (nf == 1) require(hv == 0x11, f"subsampling 0x$hv%02X unsupported (1x1 only)")
            else require(Set(1, 2).contains(hs) && Set(1, 2).contains(vs),
              f"subsampling 0x$hv%02X unsupported (factors 1/2: 4:4:4, 4:2:2, 4:2:0)")
            new Comp(b(o) & 0xff, hs, vs, b(o + 2) & 0xff)
          }
        case 0xc2 => sys.error("progressive JPEG (SOF2) unsupported — baseline only")
        case mm if mm >= 0xc9 && mm <= 0xcb =>
          sys.error("arithmetic-coded JPEG unsupported — baseline Huffman only")
        case 0xc4 | 0xdb => readTableSegment(b, p + 4, p + 2 + len, m, t)
        case 0xdd => // DRI (r12 — supported: preds reset per interval)
          restartInterval = ((b(p + 4) & 0xff) << 8) | (b(p + 5) & 0xff)
        case 0xda => // SOS
          require(comps != null, "JPEG: SOS before SOF")
          val ns = b(p + 4) & 0xff
          require(ns == comps.length, s"$ns-component scan over ${comps.length} " +
            "frame components unsupported (one interleaved scan only)")
          for (c <- 0 until ns) {
            val cs = b(p + 5 + 2 * c) & 0xff
            val comp = comps.find(_.id == cs).getOrElse(
              sys.error(s"scan selects unknown component $cs"))
            comp.td = (b(p + 6 + 2 * c) & 0xf0) >> 4
            comp.ta = b(p + 6 + 2 * c) & 0x0f
          }
          // baseline scans span the full spectrum with no successive
          // approximation; a spec-invalid Ss/Se/AhAl header would
          // silently decode wrong coefficients without this check
          val se = p + 5 + 2 * ns
          require(b(se) == 0 && (b(se + 1) & 0xff) == 63 && b(se + 2) == 0,
            "non-baseline scan (Ss/Se/AhAl) unsupported")
          sosAt = p + 2 + len
        case mm if (mm >= 0xe0 && mm <= 0xef) || mm == 0xfe => () // APPn/COM
        case other => sys.error(f"unsupported JPEG marker 0xFF$other%02X")
      }
      if (sosAt < 0) p += 2 + len
    }
    require(w > 0 && h > 0, "JPEG: SOS before SOF")
    val hmax = comps.map(_.hs).max
    val vmax = comps.map(_.vs).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val q = comps.map { c =>
      val qt = t.quant(c.tq)
      require(qt != null, s"quant table ${c.tq} undefined (missing JPEGTables?)")
      qt
    }
    val dcDec = comps.map { c =>
      val d = t.dcHuff(c.td)
      require(d != null, s"huffman table (dc ${c.td}) undefined (missing JPEGTables?)")
      d
    }
    val acDec = comps.map { c =>
      val d = t.acHuff(c.ta)
      require(d != null, s"huffman table (ac ${c.ta}) undefined (missing JPEGTables?)")
      d
    }
    // block-padded planes: stride = blocks-across × 8
    val pw = comps.map(c => mcusX * c.hs * 8)
    val ph = comps.map(c => mcusY * c.vs * 8)
    val planes = comps.indices.map(c => new Array[Int](pw(c) * ph(c))).toArray
    val br = new BitReader(b, sosAt)
    val coef = new Array[Int](64)
    val px = new Array[Int](64)
    val pred = new Array[Int](comps.length)
    var mcusDone = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcusDone > 0 && mcusDone % restartInterval == 0) {
          br.restart((mcusDone / restartInterval - 1) & 7)
          java.util.Arrays.fill(pred, 0)
        }
        var c = 0
        while (c < comps.length) {
          var v = 0
          while (v < comps(c).vs) {
            var hh = 0
            while (hh < comps(c).hs) {
              java.util.Arrays.fill(coef, 0)
              val cat = dcDec(c).decode(br)
              require(cat <= 11, s"DC category $cat")
              pred(c) += extend(br.bitsVal(cat), cat)
              coef(0) = pred(c) * q(c)(0)
              var k = 1
              while (k < 64) {
                val rs = acDec(c).decode(br)
                val run = rs >> 4
                val size = rs & 0x0f
                if (size == 0) {
                  if (run == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += run
                  require(k < 64, "AC index overflow")
                  coef(Zigzag(k)) = extend(br.bitsVal(size), size) * q(c)(Zigzag(k))
                  k += 1
                }
              }
              idctBlock(coef, px)
              val bx0 = (mx * comps(c).hs + hh) * 8
              val by0 = (my * comps(c).vs + v) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  planes(c)((by0 + yy) * pw(c) + bx0 + xx) = px(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
              hh += 1
            }
            v += 1
          }
          c += 1
        }
        mcusDone += 1
        mx += 1
      }
      my += 1
    }
    (w, h, comps, planes, pw, ph)
  }

  // ---- encoder ----

  private final class BitWriter(o: java.io.ByteArrayOutputStream) {
    private var cur = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          o.write(cur)
          if (cur == 0xff) o.write(0x00) // byte stuffing
          cur = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad the tail byte with 1s per spec
      val pad = 8 - nbits
      val v = (cur << pad) | ((1 << pad) - 1)
      o.write(v)
      if (v == 0xff) o.write(0x00)
      cur = 0; nbits = 0
    }
  }

  private def writeMarker(o: java.io.ByteArrayOutputStream, m: Int): Unit = {
    o.write(0xff); o.write(m)
  }
  private def writeSeg(o: java.io.ByteArrayOutputStream, m: Int, body: Array[Int]): Unit = {
    writeMarker(o, m)
    val len = body.length + 2
    o.write(len >> 8); o.write(len & 0xff)
    body.foreach(o.write)
  }
  /** The DQT + DHT segments — ONE source for both the self-contained
    * encoder and [[tablesStream]], so the JPEGTables tag can never
    * desynchronize from the per-tile streams.
    */
  private def writeTableSegs(o: java.io.ByteArrayOutputStream,
      quantZigzag: Array[Int]): Unit = {
    writeSeg(o, 0xdb, Array(0x00) ++ quantZigzag) // DQT: Pq=0, Tq=0
    writeSeg(o, 0xc4, Array(0x00) ++ DcBits.drop(1) ++ DcVals) // DHT DC 0
    writeSeg(o, 0xc4, Array(0x10) ++ AcBits.drop(1) ++ AcVals) // DHT AC 0
  }

  /** Encode a grayscale image as a self-contained baseline stream with
    * the Annex K Huffman tables and `quant` (natural order). Lossy in
    * general; EXACT for block-constant input under [[FixtureQuant]].
    */
  def encodeGray(samples: Array[Int], w: Int, h: Int,
      quantZigzag: Array[Int] = FixtureQuant,
      includeTables: Boolean = true,
      restartInterval: Int = 0): Array[Byte] = {
    require(samples.length == w * h, s"${samples.length} samples for ${w}x$h")
    val o = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = writeMarker(o, m)
    def seg(m: Int, body: Array[Int]): Unit = writeSeg(o, m, body)
    marker(0xd8) // SOI
    if (includeTables) writeTableSegs(o, quantZigzag) // else: JPEGTables twin
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0)) // SOF0
    if (restartInterval > 0)
      seg(0xdd, Array(restartInterval >> 8, restartInterval & 0xff)) // DRI
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    val dcEnc = buildEncodeTable(DcBits, DcVals)
    val acEnc = buildEncodeTable(AcBits, AcVals)
    val q = new Array[Int](64) // natural order
    for (k <- 0 until 64) q(Zigzag(k)) = quantZigzag(k)
    val bw0 = (w + 7) / 8
    val bh0 = (h + 7) / 8
    val bwr = new BitWriter(o)
    val px = new Array[Int](64)
    var pred = 0
    var done = 0
    for (by <- 0 until bh0; bx <- 0 until bw0) {
      if (restartInterval > 0 && done > 0 && done % restartInterval == 0) {
        bwr.flush()
        marker(0xd0 | ((done / restartInterval - 1) & 7))
        pred = 0
      }
      // edge blocks replicate the last row/column (keeps them constant
      // when the image is block-aligned anyway)
      for (yy <- 0 until 8; xx <- 0 until 8) {
        val y = math.min(by * 8 + yy, h - 1)
        val x = math.min(bx * 8 + xx, w - 1)
        px(yy * 8 + xx) = samples(y * w + x)
      }
      pred = encodeBlock(px, pred, q, dcEnc, acEnc, bwr)
      done += 1
    }
    bwr.flush()
    marker(0xd9) // EOI
    o.toByteArray
  }

  /** FDCT + quantize + Huffman-encode one 8×8 block; returns the new
    * DC predictor. Shared by the grayscale and YCbCr encoders.
    */
  private def encodeBlock(px: Array[Int], pred: Int, q: Array[Int],
      dcEnc: Array[(Int, Int)], acEnc: Array[(Int, Int)],
      bwr: BitWriter): Int = {
    val coef = new Array[Double](64)
    fdctBlock(px, coef)
    val qc = new Array[Int](64)
    for (i <- 0 until 64)
      qc(i) = math.rint(coef(i) / q(i)).toInt
    val dcDiff = qc(0) - pred
    val cat = category(dcDiff)
    val (c, l) = dcEnc(cat)
    bwr.put(c, l)
    if (cat > 0)
      bwr.put(if (dcDiff < 0) dcDiff + (1 << cat) - 1 else dcDiff, cat)
    var k = 1
    var run = 0
    while (k < 64) {
      val v = qc(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { val (zc, zl) = acEnc(0xf0); bwr.put(zc, zl); run -= 16 }
        val sz = category(v)
        val (ac, al) = acEnc((run << 4) | sz)
        bwr.put(ac, al)
        bwr.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = acEnc(0x00); bwr.put(ec, el) } // EOB
    qc(0)
  }

  /** Encode a baseline YCbCr stream from full-resolution Y/Cb/Cr planes
    * (r12): 4:4:4 or 4:2:0 (chroma box-averaged over each 2×2 group —
    * exact on MCU-constant fixtures), one interleaved scan, all
    * components on the shared quant + Annex-K Huffman tables.
    */
  def encodeColor(yp: Array[Int], cb: Array[Int], cr: Array[Int],
      w: Int, h: Int, subsample: Boolean,
      quantZigzag: Array[Int] = FixtureQuant,
      includeTables: Boolean = true,
      restartInterval: Int = 0): Array[Byte] = {
    require(yp.length == w * h && cb.length == w * h && cr.length == w * h,
      s"plane sizes for ${w}x$h")
    val o = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = writeMarker(o, m)
    def seg(m: Int, body: Array[Int]): Unit = writeSeg(o, m, body)
    marker(0xd8) // SOI
    if (includeTables) writeTableSegs(o, quantZigzag)
    val s = if (subsample) 0x22 else 0x11
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3,
      1, s, 0, 2, 0x11, 0, 3, 0x11, 0)) // SOF0
    if (restartInterval > 0)
      seg(0xdd, Array(restartInterval >> 8, restartInterval & 0xff)) // DRI
    seg(0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0)) // SOS
    val dcEnc = buildEncodeTable(DcBits, DcVals)
    val acEnc = buildEncodeTable(AcBits, AcVals)
    val q = new Array[Int](64) // natural order
    for (k <- 0 until 64) q(Zigzag(k)) = quantZigzag(k)
    val f = if (subsample) 2 else 1
    val mcusX = (w + 8 * f - 1) / (8 * f)
    val mcusY = (h + 8 * f - 1) / (8 * f)
    val bwr = new BitWriter(o)
    val px = new Array[Int](64)
    def lum(x: Int, y: Int): Int = yp(math.min(y, h - 1) * w + math.min(x, w - 1))
    // chroma sample at chroma-grid (cx, cy): the box mean of its f×f
    // pixel group (replicate-padded at edges)
    def chroma(p: Array[Int], cx: Int, cy: Int): Int = {
      var s0 = 0
      for (dy <- 0 until f; dx <- 0 until f)
        s0 += p(math.min(cy * f + dy, h - 1) * w + math.min(cx * f + dx, w - 1))
      math.rint(s0.toDouble / (f * f)).toInt
    }
    val pred = new Array[Int](3)
    var done = 0
    for (my <- 0 until mcusY; mx <- 0 until mcusX) {
      if (restartInterval > 0 && done > 0 && done % restartInterval == 0) {
        bwr.flush()
        marker(0xd0 | ((done / restartInterval - 1) & 7))
        java.util.Arrays.fill(pred, 0)
      }
      done += 1
      // Y blocks: f×f per MCU
      for (v <- 0 until f; hh <- 0 until f) {
        for (yy <- 0 until 8; xx <- 0 until 8)
          px(yy * 8 + xx) = lum((mx * f + hh) * 8 + xx, (my * f + v) * 8 + yy)
        pred(0) = encodeBlock(px, pred(0), q, dcEnc, acEnc, bwr)
      }
      // one Cb, one Cr block per MCU
      for ((p, c) <- Seq((cb, 1), (cr, 2))) {
        for (yy <- 0 until 8; xx <- 0 until 8)
          px(yy * 8 + xx) = chroma(p, mx * 8 + xx, my * 8 + yy)
        pred(c) = encodeBlock(px, pred(c), q, dcEnc, acEnc, bwr)
      }
    }
    bwr.flush()
    marker(0xd9) // EOI
    o.toByteArray
  }

  /** A JPEGTables-tag stream (SOI, DQT, DHTs, EOI) + the matching
    * abbreviated per-tile encoder — the layout real JPEG COGs use.
    */
  def tablesStream(quantZigzag: Array[Int] = FixtureQuant): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    writeMarker(o, 0xd8)
    writeTableSegs(o, quantZigzag)
    writeMarker(o, 0xd9)
    o.toByteArray
  }
}
