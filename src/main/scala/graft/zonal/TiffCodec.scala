package graft.zonal

/** Pure-JVM TIFF tile codecs (round 5): Deflate (Compression=8, the
  * zlib-wrapped stream `java.util.zip` speaks natively) and the TIFF-6
  * LZW variant (Compression=5: MSB-first bit packing, 9→12-bit codes,
  * ClearCode 256 / EOI 257, and the spec's "early change" width switch —
  * encoder widens when NextCode reaches 511/1023/2047, decoder one add
  * earlier at 510/1022/2046 because its table lags the encoder's by one
  * entry), plus horizontal-differencing Predictor=2 for 32-bit integer
  * samples.
  *
  * Both directions are implemented so raster fixtures are self-generated
  * and every compressed scan is gated by the formula-replay oracle; the
  * decoder is additionally pinned against hand-assembled code streams in
  * RasterSpec so a writer bug can't hide behind its own inverse.
  *
  * Scale note: codecs run per tile inside the scan tasks — the unit of
  * work stays one bounded tile buffer, so compression changes nothing
  * about the read topology (one range-read per tile, no driver bytes).
  */
object TiffCodec {

  // ---- Deflate (TIFF Compression=8, zlib wrapper) ----

  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Inflate to exactly `expectedLen` bytes — a stream that ends early or
    * would run long is a corrupt tile and fails loudly.
    */
  def inflate(data: Array[Byte], expectedLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new Array[Byte](expectedLen)
      var off = 0
      var n = if (expectedLen == 0) 0 else inf.inflate(out, 0, expectedLen)
      while (n > 0) {
        off += n
        n = if (off < expectedLen) inf.inflate(out, off, expectedLen - off) else 0
      }
      require(off == expectedLen,
        s"deflate tile decoded $off of expected $expectedLen bytes (truncated/corrupt)")
      // a stream that would decode to MORE than expectedLen is equally
      // corrupt: probe one extra byte instead of trusting the fill stop
      val scratch = new Array[Byte](1)
      require(inf.finished() || inf.inflate(scratch, 0, 1) == 0,
        s"deflate tile stream decodes past expected $expectedLen bytes (corrupt)")
      out
    } finally inf.end()
  }

  // ---- gzip (RFC 1952 frames — the Zarr v3 `gzip` codec: zarr-python
  // GzipCodec writes full gzip members, NOT raw zlib; conflating the
  // two reads zero real stores). Same exact-length contract. ----

  def gzipCompress(data: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
    val gz = new java.util.zip.GZIPOutputStream(bo)
    gz.write(data); gz.close()
    bo.toByteArray
  }

  def gzipDecompress(data: Array[Byte], expectedLen: Int): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(data))
    try {
      val out = new Array[Byte](expectedLen)
      var off = 0
      var n = if (expectedLen == 0) 0 else in.read(out, 0, expectedLen)
      while (n > 0) {
        off += n
        n = if (off < expectedLen) in.read(out, off, expectedLen - off) else 0
      }
      require(off == expectedLen,
        s"gzip chunk decoded $off of expected $expectedLen bytes (truncated/corrupt)")
      require(in.read() < 0,
        s"gzip chunk stream decodes past expected $expectedLen bytes (corrupt)")
      out
    } finally in.close()
  }

  // ---- ZSTD (Compression=50000, the GDAL registration — what
  // `gdal_translate -co COMPRESS=ZSTD` writes; round 7). zstd-jni ships
  // on every Spark classpath (Spark's own shuffle/parquet codecs), so
  // this costs no new dependency. Same exact-length contract as
  // [[inflate]]: short or long streams are corrupt tiles, loudly. ----

  // ---- PackBits (TIFF Compression=32773, the Macintosh RLE the spec
  // mandates every baseline reader speak; legacy scanned-archive TIFFs
  // still carry it). Control byte n: 0..127 → copy the next n+1 bytes
  // literally; -1..-127 → repeat the next byte 1-n times; -128 → noop.
  // Same exact-length contract as [[inflate]]. ----

  def packBitsDecode(data: Array[Byte], expectedLen: Int): Array[Byte] = {
    val out = new Array[Byte](expectedLen)
    var i = 0
    var o = 0
    while (o < expectedLen) {
      require(i < data.length,
        s"PackBits stream truncated at byte $i (decoded $o of $expectedLen)")
      val n = data(i); i += 1
      if (n >= 0) {
        val cnt = n + 1
        require(i + cnt <= data.length && o + cnt <= expectedLen,
          s"PackBits literal run of $cnt overruns (at $o of $expectedLen)")
        System.arraycopy(data, i, out, o, cnt); i += cnt; o += cnt
      } else if (n != -128) { // -128 is a spec'd noop
        val cnt = 1 - n
        require(i < data.length && o + cnt <= expectedLen,
          s"PackBits repeat run of $cnt overruns (at $o of $expectedLen)")
        java.util.Arrays.fill(out, o, o + cnt, data(i)); i += 1; o += cnt
      }
    }
    // trailing garbage after the expected bytes is a corrupt block too
    require(i == data.length,
      s"PackBits stream has ${data.length - i} bytes past expected $expectedLen (corrupt)")
    out
  }

  /** Encode one row: ≥2-byte runs become repeat packets, the rest
    * literal packets (both capped at 128 per the control-byte range).
    */
  private def packBitsRow(data: Array[Byte], from: Int, until: Int,
      out: java.io.ByteArrayOutputStream): Unit = {
    var i = from
    while (i < until) {
      var run = 1
      while (i + run < until && run < 128 && data(i + run) == data(i)) run += 1
      if (run >= 2) {
        out.write(1 - run); out.write(data(i)); i += run
      } else {
        var j = i + 1
        while (j < until && j - i < 128
            && !(j + 1 < until && data(j) == data(j + 1))) j += 1
        out.write(j - i - 1); out.write(data, i, j - i); i = j
      }
    }
  }

  /** TIFF PackBits: the spec packs each ROW independently (runs never
    * cross a row boundary); concatenated row streams decode as one
    * continuous stream, which is how [[packBitsDecode]] consumes them.
    */
  def packBitsEncodeRows(data: Array[Byte], rowBytes: Int): Array[Byte] = {
    require(rowBytes > 0 && data.length % rowBytes == 0,
      s"PackBits row length $rowBytes does not divide block of ${data.length}")
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    var r = 0
    while (r < data.length) {
      packBitsRow(data, r, r + rowBytes, out)
      r += rowBytes
    }
    out.toByteArray
  }

  def zstdCompress(data: Array[Byte]): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(data, 3)

  def zstdDecompress(data: Array[Byte], expectedLen: Int): Array[Byte] = {
    val known = com.github.luben.zstd.Zstd.getFrameContentSize(data)
    require(known < 0 || known == expectedLen.toLong,
      s"zstd tile frame declares $known bytes, expected $expectedLen (corrupt)")
    val out = new Array[Byte](expectedLen)
    val n = com.github.luben.zstd.Zstd.decompress(out, data)
    require(!com.github.luben.zstd.Zstd.isError(n) && n == expectedLen.toLong,
      s"zstd tile decoded $n of expected $expectedLen bytes (truncated/corrupt)")
    out
  }

  // ---- TIFF LZW (Compression=5) ----

  private final val Clear = 256
  private final val Eoi = 257

  /** MSB-first variable-width code writer. */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      acc = (acc << width) | (code & ((1L << width) - 1))
      nbits += width
      while (nbits >= 8) {
        out.write(((acc >>> (nbits - 8)) & 0xffL).toInt)
        nbits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) out.write((((acc & ((1L << nbits) - 1)) << (8 - nbits)) & 0xffL).toInt)
      out.toByteArray
    }
  }

  /** TIFF-6 LZW encoder. Emits ClearCode first, widens at NextCode =
    * 511/1023/2047 (early change), resets the table at NextCode = 4094.
    */
  def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val bw = new BitWriter
    // dict key: (prefixCode << 8) | nextByte — prefix codes fit 12 bits
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = 258
    var width = 9
    bw.put(Clear, width)
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      if (prefix < 0) prefix = b
      else {
        val key = Integer.valueOf((prefix << 8) | b)
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          bw.put(prefix, width)
          dict.put(key, Integer.valueOf(next)); next += 1
          if (next == (1 << width) - 1 && width < 12) width += 1
          if (next == 4094) {
            bw.put(Clear, width)
            dict = new java.util.HashMap[Integer, Integer]()
            next = 258; width = 9
          }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix >= 0) bw.put(prefix, width)
    bw.put(Eoi, width)
    bw.finish()
  }

  /** TIFF-6 LZW decoder producing exactly `expectedLen` bytes; anything
    * else (truncation, overrun, code past table end, non-literal after
    * clear) fails loudly — a silently misread raster is the worst bug
    * this engine could ship.
    */
  def lzwDecode(data: Array[Byte], expectedLen: Int): Array[Byte] = {
    val out = new Array[Byte](expectedLen)
    var oPos = 0
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val firstB = new Array[Byte](4096)
    var next = 258
    var width = 9
    var bitPos = 0L
    val totalBits = data.length.toLong * 8
    val stack = new Array[Byte](4096)

    def readCode(): Int = {
      require(bitPos + width <= totalBits, "LZW stream truncated (no EOI)")
      var v = 0
      var n = width
      while (n > 0) {
        val byteIdx = (bitPos >>> 3).toInt
        val bitOff = (bitPos & 7).toInt
        val take = math.min(8 - bitOff, n)
        val bits = ((data(byteIdx) & 0xff) >>> (8 - bitOff - take)) & ((1 << take) - 1)
        v = (v << take) | bits
        bitPos += take
        n -= take
      }
      v
    }
    def first(code: Int): Byte = if (code < 256) code.toByte else firstB(code)
    def writeString(code: Int): Unit = {
      if (code < 256) {
        require(oPos < expectedLen, s"LZW output overruns expected $expectedLen bytes")
        out(oPos) = code.toByte; oPos += 1
      } else {
        var c = code
        var sp = 0
        while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        require(oPos + sp + 1 <= expectedLen, s"LZW output overruns expected $expectedLen bytes")
        out(oPos) = c.toByte; oPos += 1
        while (sp > 0) { sp -= 1; out(oPos) = stack(sp); oPos += 1 }
      }
    }

    var oldCode = -1
    var code = readCode()
    while (code != Eoi) {
      if (code == Clear) {
        next = 258; width = 9
        code = readCode()
        if (code != Eoi) {
          require(code < 256, s"LZW: first code after ClearCode must be a literal, got $code")
          writeString(code)
          oldCode = code
        }
      } else {
        require(oldCode >= 0, "LZW stream must start with ClearCode")
        require(code <= next, s"LZW: code $code beyond table size $next (corrupt stream)")
        if (code < next) {
          writeString(code)
          if (next < 4096) {
            prefix(next) = oldCode; suffix(next) = first(code); firstB(next) = first(oldCode)
            next += 1
          }
        } else { // KwKwK: the just-about-to-be-defined entry
          val f = first(oldCode)
          require(next < 4096, "LZW: KwKwK with a full table (corrupt stream)")
          prefix(next) = oldCode; suffix(next) = f; firstB(next) = first(oldCode)
          next += 1
          writeString(next - 1)
        }
        oldCode = code
        // early change, decoder side: one add earlier than the encoder
        if (next == (1 << width) - 2 && width < 12) width += 1
      }
      if (code != Eoi) code = readCode()
    }
    require(oPos == expectedLen,
      s"LZW stream produced $oPos of expected $expectedLen bytes (truncated/corrupt)")
    out
  }

  // ---- Predictor=2 (horizontal differencing, 32-bit integer samples) ----

  /** Undo per-row horizontal differencing in place: each int32 sample is
    * stored as the delta from the previous sample of the SAME band in
    * the row (chunky interleave). Arithmetic is wrapping, per TIFF.
    */
  def undoPredictor2Int32(bytes: Array[Byte], rowPx: Int, rows: Int, bands: Int,
      bigEndian: Boolean): Unit = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(
      if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
    var r = 0
    while (r < rows) {
      val base = r * rowPx * bands
      var c = 1
      while (c < rowPx) {
        var b = 0
        while (b < bands) {
          val i = (base + c * bands + b) * 4
          val p = (base + (c - 1) * bands + b) * 4
          bb.putInt(i, bb.getInt(i) + bb.getInt(p))
          b += 1
        }
        c += 1
      }
      r += 1
    }
  }

  // ---- Predictor 2 for the narrow integer widths (round 7: uint8
  // land-cover and int16 DEM rasters — the most common real-world
  // sample types). Differencing is modular per sample width, so sign
  // and endianness (for 16-bit) fall out of the ring arithmetic the
  // same way GDAL's does. ----

  def applyPredictor2Int8(bytes: Array[Byte], rowPx: Int, rows: Int, bands: Int): Unit = {
    var r = 0
    while (r < rows) {
      val base = r * rowPx * bands
      var c = rowPx - 1
      while (c >= 1) {
        var b = 0
        while (b < bands) {
          val i = base + c * bands + b
          bytes(i) = (bytes(i) - bytes(i - bands)).toByte
          b += 1
        }
        c -= 1
      }
      r += 1
    }
  }

  def undoPredictor2Int8(bytes: Array[Byte], rowPx: Int, rows: Int, bands: Int): Unit = {
    var r = 0
    while (r < rows) {
      val base = r * rowPx * bands
      var c = 1
      while (c < rowPx) {
        var b = 0
        while (b < bands) {
          val i = base + c * bands + b
          bytes(i) = (bytes(i) + bytes(i - bands)).toByte
          b += 1
        }
        c += 1
      }
      r += 1
    }
  }

  def applyPredictor2Int16(bytes: Array[Byte], rowPx: Int, rows: Int, bands: Int,
      bigEndian: Boolean): Unit = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(
      if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
    var r = 0
    while (r < rows) {
      val base = r * rowPx * bands
      var c = rowPx - 1
      while (c >= 1) {
        var b = 0
        while (b < bands) {
          val i = (base + c * bands + b) * 2
          val p = (base + (c - 1) * bands + b) * 2
          bb.putShort(i, (bb.getShort(i) - bb.getShort(p)).toShort)
          b += 1
        }
        c -= 1
      }
      r += 1
    }
  }

  def undoPredictor2Int16(bytes: Array[Byte], rowPx: Int, rows: Int, bands: Int,
      bigEndian: Boolean): Unit = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(
      if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
    var r = 0
    while (r < rows) {
      val base = r * rowPx * bands
      var c = 1
      while (c < rowPx) {
        var b = 0
        while (b < bands) {
          val i = (base + c * bands + b) * 2
          val p = (base + (c - 1) * bands + b) * 2
          bb.putShort(i, (bb.getShort(i) + bb.getShort(p)).toShort)
          b += 1
        }
        c += 1
      }
      r += 1
    }
  }

  /** Forward differencing (writer side) — exact inverse of the above. */
  def applyPredictor2Int32(bytes: Array[Byte], rowPx: Int, rows: Int, bands: Int,
      bigEndian: Boolean): Unit = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(
      if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
    var r = 0
    while (r < rows) {
      val base = r * rowPx * bands
      var c = rowPx - 1
      while (c >= 1) {
        var b = 0
        while (b < bands) {
          val i = (base + c * bands + b) * 4
          val p = (base + (c - 1) * bands + b) * 4
          bb.putInt(i, bb.getInt(i) - bb.getInt(p))
          b += 1
        }
        c -= 1
      }
      r += 1
    }
  }

  // ---- Predictor=3: floating-point horizontal differencing (round 7 —
  // TIFF TechNote 3, what GDAL writes for compressed float COGs). Per
  // row the sample bytes are split into BYTE PLANES, most-significant
  // plane first (plane order is big-endian REGARDLESS of file
  // endianness), then byte-level horizontal differencing with stride =
  // samples-per-pixel is applied across the whole planar row. Decode
  // undoes both: byte-accumulate, then reassemble each sample's bytes
  // from the planes in the FILE's endianness so the existing
  // ByteBuffer-based sample reads work unchanged. ----

  /** Decoder: in-place on one block's rows. `rowPx` pixels × `bands`
    * samples of `bytesPer` bytes each per row.
    */
  def undoPredictor3Float(bytes: Array[Byte], rowPx: Int, rows: Int, bands: Int,
      bytesPer: Int, bigEndian: Boolean): Unit = {
    val wc = rowPx * bands          // samples per row
    val rowBytes = wc * bytesPer
    val tmp = new Array[Byte](rowBytes)
    var r = 0
    while (r < rows) {
      val base = r * rowBytes
      // 1) undo byte-level differencing (stride = samples per pixel)
      var i = bands
      while (i < rowBytes) {
        bytes(base + i) = (bytes(base + i) + bytes(base + i - bands)).toByte
        i += 1
      }
      // 2) planes → interleaved samples
      System.arraycopy(bytes, base, tmp, 0, rowBytes)
      var k = 0
      while (k < wc) {
        var j = 0
        while (j < bytesPer) {
          val plane = if (bigEndian) j else bytesPer - 1 - j
          bytes(base + bytesPer * k + j) = tmp(plane * wc + k)
          j += 1
        }
        k += 1
      }
      r += 1
    }
  }

  /** Writer side — exact inverse of [[undoPredictor3Float]]. */
  def applyPredictor3Float(bytes: Array[Byte], rowPx: Int, rows: Int, bands: Int,
      bytesPer: Int, bigEndian: Boolean): Unit = {
    val wc = rowPx * bands
    val rowBytes = wc * bytesPer
    val tmp = new Array[Byte](rowBytes)
    var r = 0
    while (r < rows) {
      val base = r * rowBytes
      // 1) interleaved samples → byte planes (MSB plane first)
      var k = 0
      while (k < wc) {
        var j = 0
        while (j < bytesPer) {
          val plane = if (bigEndian) j else bytesPer - 1 - j
          tmp(plane * wc + k) = bytes(base + bytesPer * k + j)
          j += 1
        }
        k += 1
      }
      System.arraycopy(tmp, 0, bytes, base, rowBytes)
      // 2) byte-level differencing, back-to-front
      var i = rowBytes - 1
      while (i >= bands) {
        bytes(base + i) = (bytes(base + i) - bytes(base + i - bands)).toByte
        i -= 1
      }
      r += 1
    }
  }
}
