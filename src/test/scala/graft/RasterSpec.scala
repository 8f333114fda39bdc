package graft

import graft.zonal.Raster

/** The raster reader against byte layouts built INDEPENDENTLY of
  * [[Raster.writeTiff]] — the oracle's formula replay catches a broken
  * writer+reader pair, these catch a reader bug the writer compensates
  * for (endianness, inline vs offset values, padding, sample types).
  */
class RasterSpec extends SparkSuite {

  test("roundtrip: written GeoTIFF scans back to the exact formula, edge tiles clipped") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_raster").toString
    val p = s"$tmp/rt.tif"
    Raster.writeTiff(p, 37, 29, 16, 16)((x, y) => ((x * 7 + y * 3) % 11).toDouble)
    val got = Raster.scanTiff(spark, p).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size == 37 * 29, "padding rows leaked or pixels dropped")
    for (x <- 0 until 37; y <- 0 until 29)
      assert(got((x, y)) == ((x * 7 + y * 3) % 11).toDouble, s"pixel ($x,$y)")
    graft.core.Fs.rmTree(tmp)
  }

  /** Hand-built BIG-endian float32 TIFF: 3×2 px, 2×2 tiles (2 tiles, the
    * second right-padded), f(x,y) = 10x + y.
    */
  private def beFloat32Bytes(compression: Int): Array[Byte] = {
    val nE = 10
    val ifdOff = 8
    val offArr = ifdOff + 2 + nE * 12 + 4
    val cntArr = offArr + 8
    val dataOff = cntArr + 8
    val tileBytes = 2 * 2 * 4
    val buf = java.nio.ByteBuffer.allocate(dataOff + 2 * tileBytes) // BIG_ENDIAN default
    buf.put('M'.toByte).put('M'.toByte).putShort(42).putInt(ifdOff)
    buf.putShort(nE.toShort)
    def e(tag: Int, tpe: Int, cnt: Int, v: Int): Unit = {
      buf.putShort(tag.toShort).putShort(tpe.toShort).putInt(cnt)
      // inline SHORT is left-justified in the 4-byte field
      if (tpe == 3 && cnt == 1) { buf.putShort(v.toShort); buf.putShort(0) }
      else buf.putInt(v)
    }
    e(256, 4, 1, 3); e(257, 4, 1, 2)
    e(258, 3, 1, 32); e(259, 3, 1, compression); e(277, 3, 1, 1)
    e(322, 4, 1, 2); e(323, 4, 1, 2)
    e(324, 4, 2, offArr); e(325, 4, 2, cntArr)
    e(339, 3, 1, 3)
    buf.putInt(0) // no next IFD
    buf.putInt(dataOff); buf.putInt(dataOff + tileBytes)
    buf.putInt(tileBytes); buf.putInt(tileBytes)
    // tile 0: rows y=0,1 of x=0,1; tile 1: x=2 plus right padding
    Seq(0f, 10f, 1f, 11f).foreach(buf.putFloat)
    Seq(20f, -999f, 21f, -999f).foreach(buf.putFloat) // padding must be clipped
    buf.array()
  }

  test("big-endian float32 with padded edge tile decodes exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_raster").toString
    val p = s"$tmp/be.tif"
    java.nio.file.Files.write(java.nio.file.Paths.get(p), beFloat32Bytes(compression = 1))
    val got = Raster.scanTiff(spark, p).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got == Map((0, 0) -> 0.0, (1, 0) -> 10.0, (2, 0) -> 20.0,
      (0, 1) -> 1.0, (1, 1) -> 11.0, (2, 1) -> 21.0))
    graft.core.Fs.rmTree(tmp)
  }

  test("compressed / non-TIFF / striped inputs fail loudly, never misread") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_raster").toString
    val pc = s"$tmp/lzw.tif"
    java.nio.file.Files.write(java.nio.file.Paths.get(pc), beFloat32Bytes(compression = 5))
    val e1 = intercept[IllegalArgumentException](Raster.readMeta(pc))
    assert(e1.getMessage.contains("compression"))
    val pn = s"$tmp/not.tif"
    java.nio.file.Files.write(java.nio.file.Paths.get(pn), "PKjunk".getBytes)
    intercept[IllegalArgumentException](Raster.readMeta(pn))
    graft.core.Fs.rmTree(tmp)
  }

  test("int32 single-tile image with inline offset entries decodes (incl. negatives)") {
    // 2×2 image exactly one 2×2 tile: count-1 LONG entries stay inline
    val nE = 10
    val ifdOff = 8
    val dataOff = ifdOff + 2 + nE * 12 + 4
    val buf = java.nio.ByteBuffer.allocate(dataOff + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    buf.putShort(nE.toShort)
    def e(tag: Int, tpe: Int, cnt: Int, v: Int): Unit = {
      buf.putShort(tag.toShort).putShort(tpe.toShort).putInt(cnt)
      if (tpe == 3 && cnt == 1) { buf.putShort(v.toShort); buf.putShort(0) }
      else buf.putInt(v)
    }
    e(256, 4, 1, 2); e(257, 4, 1, 2)
    e(258, 3, 1, 32); e(259, 3, 1, 1); e(277, 3, 1, 1)
    e(322, 4, 1, 2); e(323, 4, 1, 2)
    e(324, 4, 1, dataOff); e(325, 4, 1, 16)
    e(339, 3, 1, 2) // signed int
    buf.putInt(0)
    Seq(7, -5, 0, 123456).foreach(buf.putInt)
    val tmp = java.nio.file.Files.createTempDirectory("graft_raster").toString
    val p = s"$tmp/i32.tif"
    java.nio.file.Files.write(java.nio.file.Paths.get(p), buf.array())
    val got = Raster.scanTiff(spark, p).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got == Map((0, 0) -> 7.0, (1, 0) -> -5.0, (0, 1) -> 0.0, (1, 1) -> 123456.0))
    graft.core.Fs.rmTree(tmp)
  }

  test("window scan prunes the manifest to overlapping tiles only") {
    val p = Raster.fixturePath()
    val m = Raster.readMeta(p)
    // fixture: 90×70 at 32×32 tiles → 3×3 manifest; window 10..40 × 5..35
    // overlaps exactly the 2×2 upper-left tiles
    assert(Raster.tileRefs(m, p).size == 9)
    val pruned = Raster.windowRefs(m, p, 10, 40, 5, 35)
    assert(pruned.size == 4, s"expected 4 pruned tiles, got ${pruned.size}")
    assert(pruned.forall(t => t.tx0 <= 40 && t.ty0 <= 35))
    // and the windowed result equals the full scan filtered
    val full = Raster.scanTiff(spark, p)
      .filter(org.apache.spark.sql.functions.expr(
        "cell_x BETWEEN 10 AND 40 AND cell_y BETWEEN 5 AND 35"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    val win = Raster.scanTiffWindow(spark, p, 10, 40, 5, 35)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    assert(win == full && win.size == 31 * 31)
  }

  test("multiband: chunky interleave decodes band-major per pixel; single-band API refuses") {
    // hand-built tile: 2×1 px, 2 bands, float64 LE — samples are
    // pixel-interleaved (b0, b1 per pixel), NOT band planes
    val t = Raster.TileRef("mem", 0, 32, 0, 0, 2, 1, 2, 1, 64, 3, bigEndian = false, bands = 2)
    val buf = java.nio.ByteBuffer.allocate(2 * 1 * 2 * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(1.0, 2.0, 3.0, 4.0).foreach(buf.putDouble)
    val got = Raster.decodeTileBands(buf.array(), t).toSet
    assert(got == Set((0, 0, 0, 1.0), (0, 0, 1, 2.0), (1, 0, 0, 3.0), (1, 0, 1, 4.0)))
    // writer → reader roundtrip on the 2-band fixture, padded both ways
    val rows = Raster.scanTiffBands(spark, Raster.mbFixturePath()).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(rows.size == Raster.MbW * Raster.MbH * Raster.MbBands)
    assert(rows((47, 39, 1)) == Raster.mbValue(47, 39, 1))
    assert(rows((0, 0, 0)) == Raster.mbValue(0, 0, 0))
    // the single-band scan on a multiband file fails loudly
    val e = intercept[IllegalArgumentException](Raster.scanTiff(spark, Raster.mbFixturePath()))
    assert(e.getMessage.contains("bands"))
  }

  test("overview chain: level 0 equals the flat file, level 1 is stride-2, level 2 is absent") {
    val p = Raster.ovFixturePath()
    // level 0 of the chained file scans identically to the flat fixture
    val lv0 = Raster.scanTiffLevel(spark, p, 0).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(lv0.size == Raster.FixW * Raster.FixH)
    assert(lv0((89, 69)) == Raster.fixtureValue(89, 69))
    // level 1: half dims, stride-2 samples
    val lv1 = Raster.scanTiffLevel(spark, p, 1).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(lv1.size == ((Raster.FixW + 1) / 2) * ((Raster.FixH + 1) / 2))
    assert(lv1((10, 10)) == Raster.fixtureValue(20, 20))
    // a level past the chain end fails loudly
    val e = intercept[IllegalArgumentException](Raster.readMeta(p, 2))
    assert(e.getMessage.contains("chain ends"))
    // the flat (no-overview) fixture has no level 1
    intercept[IllegalArgumentException](Raster.readMeta(Raster.fixturePath(), 1))
  }

  test("sink_raster_tiles writes one parseable single-tile GeoTIFF per 16×16 tile") {
    q("sink_raster_tiles").collect() // runs the sink + roundtrip
    val dir = new java.io.File(s"${System.getProperty("java.io.tmpdir")}/graft_io/raster_sink")
    val files = dir.listFiles().filter(_.getName.endsWith(".tif"))
    assert(files.length == 16, s"expected 16 tile files, got ${files.length}")
    files.foreach { f =>
      val m = Raster.readMeta(f.getAbsolutePath)
      assert(m.width == 16 && m.height == 16 && m.tileOffsets.length == 1,
        s"${f.getName} is not a single-tile 16×16 GeoTIFF")
    }
  }

  test("zonal_raster_stats: every zone inside the raster, counts equal envelope areas") {
    val df = q("zonal_raster_stats")
    // zone envelopes are 8×8 and the raster covers the whole lattice →
    // every zone sees exactly 64 raster cells (one per pixel, no
    // lineitem multiplicity here)
    assert(df.count() == 25)
    assert(df.filter(org.apache.spark.sql.functions.col("n_cells") =!= 64).count() == 0)
  }
}
