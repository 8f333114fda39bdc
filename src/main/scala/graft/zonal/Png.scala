package graft.zonal

/** Minimal from-spec PNG codec (r20 — VERDICT r19 next-#6: the other
  * ubiquitous training-corpus image container next to the r17 baseline
  * JPEG). 8-bit GRAYSCALE (colour type 0) and 8-bit TRUECOLOUR (colour
  * type 2 — the dominant real-corpus variant), non-interlaced, all
  * FIVE scanline filters in BOTH directions (PNG spec / RFC 2083 §6:
  * None, Sub, Up, Average, Paeth — filters operate BYTE-wise with the
  * `left` sample bpp bytes back, so one loop serves both colour
  * types), zlib IDAT via the shared [[TiffCodec]] deflate/inflate
  * pair, per-chunk CRC-32 verified on read and emitted on write.
  *
  * Encode picks the filter per scanline deterministically (y mod 5 by
  * default) so a fixture directory exercises every filter path; decode
  * accepts any filter per scanline. Out-of-boundary refusals by name:
  * palette/alpha colour types, bit depths other than 8, interlace, a
  * missing/short IHDR, and a chunk whose CRC does not match (corrupt
  * blobs fail loudly, never decode to garbage).
  *
  * Scale note: the codec runs per blob inside scan tasks — one bounded
  * buffer per image, the read topology unchanged (the mm_decode_jpeg
  * posture).
  */
object Png {

  private val Sig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  private def crc(tpe: Array[Byte], data: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32()
    c.update(tpe); c.update(data)
    c.getValue.toInt
  }

  private def chunk(out: java.io.ByteArrayOutputStream, tpe: String,
      data: Array[Byte]): Unit = {
    val t = tpe.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put(t).put(data).putInt(crc(t, data))
    out.write(bb.array())
  }

  /** a + b − c Paeth predictor (PNG spec §6.6). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Filter `samples` ((1 + w·bpp)-stride scanlines) in place into the
    * raw IDAT layout — byte-wise with `left` bpp bytes back (spec §6).
    */
  private def filterScanlines(samples: Array[Int], w: Int, h: Int,
      bpp: Int, filterOf: Int => Int): Array[Byte] = {
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      val f = filterOf(y)
      require(f >= 0 && f <= 4, s"png encode: filter $f")
      raw(y * (1 + stride)) = f.toByte
      for (x <- 0 until stride) {
        val cur = samples(y * stride + x) & 0xff
        val left = if (x >= bpp) samples(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) samples((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) samples((y - 1) * stride + x - bpp) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + x) = (v & 0xff).toByte
      }
    }
    raw
  }

  private def assemble(w: Int, h: Int, colour: Int, depth: Int,
      raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
      .put(depth.toByte)      // bit depth: 8 or 16
      .put(colour.toByte)     // 0 = grayscale, 2 = truecolour
      .put(0.toByte)          // compression: deflate
      .put(0.toByte)          // filter method 0
      .put(0.toByte)          // no interlace
    chunk(out, "IHDR", ihdr.array())
    chunk(out, "IDAT", TiffCodec.deflate(raw))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Encode 8-bit grayscale; `filterOf(y)` picks each scanline's filter
    * (default y mod 5 — every filter type exercised on any image of
    * 5+ rows).
    */
  def encodeGray(px: Array[Int], w: Int, h: Int,
      filterOf: Int => Int = _ % 5): Array[Byte] = {
    require(px.length == w * h, s"png encode: ${px.length} pixels for ${w}x$h")
    assemble(w, h, 0, 8, filterScanlines(px, w, h, 1, filterOf))
  }

  /** Encode 16-bit grayscale (r20 — the DEM/elevation PNG form):
    * big-endian sample pairs, the filters byte-wise at bpp = 2
    * (spec §6 — `left` is the corresponding byte of the PRIOR sample).
    */
  def encodeGray16(px: Array[Int], w: Int, h: Int,
      filterOf: Int => Int = _ % 5): Array[Byte] = {
    require(px.length == w * h, s"png encode: ${px.length} pixels for ${w}x$h")
    val samples = new Array[Int](w * h * 2)
    for (i <- 0 until w * h) {
      require(px(i) >= 0 && px(i) <= 0xffff, s"png encode: 16-bit sample ${px(i)}")
      samples(2 * i) = (px(i) >> 8) & 0xff
      samples(2 * i + 1) = px(i) & 0xff
    }
    assemble(w, h, 0, 16, filterScanlines(samples, w, h, 2, filterOf))
  }

  /** Encode 8-bit truecolour from packed 0xRRGGBB pixels. */
  def encodeRgb(px: Array[Int], w: Int, h: Int,
      filterOf: Int => Int = _ % 5): Array[Byte] = {
    require(px.length == w * h, s"png encode: ${px.length} pixels for ${w}x$h")
    val samples = new Array[Int](w * h * 3)
    for (i <- 0 until w * h) {
      samples(3 * i) = (px(i) >> 16) & 0xff
      samples(3 * i + 1) = (px(i) >> 8) & 0xff
      samples(3 * i + 2) = px(i) & 0xff
    }
    assemble(w, h, 2, 8, filterScanlines(samples, w, h, 3, filterOf))
  }

  /** Decode an 8-bit grayscale PNG → (width, height, pixels). */
  def decodeGray(blob: Array[Byte]): (Int, Int, Array[Int]) = {
    val (w, h, colour, depth, sm) = decodeSamples(blob)
    require(colour == 0, s"png: colour type $colour where grayscale (0) " +
      "expected — decodeRgb reads truecolour")
    require(depth == 8, s"png: bit depth $depth where 8 expected — " +
      "decodeGray16 reads 16-bit grayscale")
    (w, h, sm)
  }

  /** Decode a 16-bit grayscale PNG → (width, height, 0..65535 pixels). */
  def decodeGray16(blob: Array[Byte]): (Int, Int, Array[Int]) = {
    val (w, h, colour, depth, sm) = decodeSamples(blob)
    require(colour == 0 && depth == 16,
      s"png: colour $colour depth $depth where 16-bit grayscale expected")
    (w, h, Array.tabulate(w * h)(i => (sm(2 * i) << 8) | sm(2 * i + 1)))
  }

  /** Decode an 8-bit truecolour PNG → (width, height, packed 0xRRGGBB). */
  def decodeRgb(blob: Array[Byte]): (Int, Int, Array[Int]) = {
    val (w, h, colour, depth, sm) = decodeSamples(blob)
    require(colour == 2, s"png: colour type $colour where truecolour (2) " +
      "expected — decodeGray reads grayscale")
    require(depth == 8, s"png: bit depth $depth — 16-bit truecolour is not implemented")
    (w, h, Array.tabulate(w * h)(i =>
      (sm(3 * i) << 16) | (sm(3 * i + 1) << 8) | sm(3 * i + 2)))
  }

  /** Shared chunk walk + unfilter → (w, h, colour, depth, samples). */
  private def decodeSamples(blob: Array[Byte]): (Int, Int, Int, Int, Array[Int]) = {
    require(blob.length >= 8 && blob.take(8).sameElements(Sig),
      "png: bad signature")
    val bb = java.nio.ByteBuffer.wrap(blob, 8, blob.length - 8)
    var w = -1; var h = -1; var ct = -1; var bd = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(bb.remaining >= 12, "png: truncated chunk header")
      val len = bb.getInt
      // Long arithmetic: a declared length near Int.MaxValue would wrap
      // `len + 8` negative and slip past the bound into a late
      // OOM/BufferUnderflow instead of this named refusal (r20 advice)
      require(len >= 0 && bb.remaining.toLong >= len.toLong + 8L,
        s"png: chunk of $len bytes overruns blob")
      val tpe = new Array[Byte](4); bb.get(tpe)
      val data = new Array[Byte](len); bb.get(data)
      val want = bb.getInt
      require(want == crc(tpe, data),
        s"png: CRC mismatch on ${new String(tpe, "US-ASCII")} chunk — corrupt blob")
      new String(tpe, java.nio.charset.StandardCharsets.US_ASCII) match {
        case "IHDR" =>
          require(len == 13, s"png: IHDR of $len bytes")
          val ib = java.nio.ByteBuffer.wrap(data)
          w = ib.getInt; h = ib.getInt
          val depth = ib.get(); val colour = ib.get()
          val comp = ib.get(); val filt = ib.get(); val inter = ib.get()
          require(depth == 8 || (depth == 16 && colour == 0),
            s"png: bit depth $depth / colour $colour — 8-bit gray/truecolour and " +
              "16-bit grayscale are implemented; refusing")
          require(colour == 0 || colour == 2, s"png: colour type $colour — grayscale (0) " +
            "and truecolour (2) are implemented (palette/alpha refuse rather than mislabel bytes)")
          ct = colour; bd = depth
          require(comp == 0 && filt == 0, s"png: compression=$comp filter=$filt")
          require(inter == 0, "png: interlaced (Adam7) — not implemented; refusing")
        case "IDAT" => idat.write(data)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
    }
    require(w > 0 && h > 0, "png: no IHDR before IDAT/IEND")
    val bpp = if (ct == 2) 3 else if (bd == 16) 2 else 1
    val stride = w * bpp
    val raw = TiffCodec.inflate(idat.toByteArray, h * (1 + stride))
    val sm = new Array[Int](stride * h)
    for (y <- 0 until h) {
      val f = raw(y * (1 + stride)) & 0xff
      require(f <= 4, s"png: scanline $y declares filter $f")
      for (x <- 0 until stride) {
        val v = raw(y * (1 + stride) + 1 + x) & 0xff
        val left = if (x >= bpp) sm(y * stride + x - bpp) else 0
        val up = if (y > 0) sm((y - 1) * stride + x) else 0
        val ul = if (x >= bpp && y > 0) sm((y - 1) * stride + x - bpp) else 0
        sm(y * stride + x) = f match {
          case 0 => v
          case 1 => (v + left) & 0xff
          case 2 => (v + up) & 0xff
          case 3 => (v + ((left + up) >> 1)) & 0xff
          case 4 => (v + paeth(left, up, ul)) & 0xff
        }
      }
    }
    (w, h, ct, bd, sm)
  }
}
