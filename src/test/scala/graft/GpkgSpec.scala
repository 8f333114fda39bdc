package graft

import graft.zonal.Gpkg

/** The SQLite/GeoPackage reader against bytes built INDEPENDENTLY of
  * [[Gpkg.writeTable]] (the oracle gate covers the writer+reader pair;
  * these cover the reader alone): hand-assembled varints, record
  * headers, a hand-packed leaf page, and the named loud refusals.
  */
class GpkgSpec extends SparkSuite {

  test("varint: spec vectors round-trip both directions") {
    // 1-byte, 2-byte, the 9-byte form (9th byte contributes 8 bits)
    for (v <- Seq(0L, 1L, 127L, 128L, 255L, 16383L, 16384L, 1L << 40)) {
      val enc = Gpkg.varintBytes(v)
      assert(Gpkg.varint(enc, 0) == ((v, enc.length)), s"varint $v")
    }
    // hand vectors: 128 -> [0x81, 0x00]; 300 -> [0x82, 0x2C]
    assert(Gpkg.varintBytes(128L).toSeq == Seq(0x81.toByte, 0x00.toByte))
    assert(Gpkg.varint(Array(0x82.toByte, 0x2c.toByte), 0) == ((300L, 2)))
  }

  test("record decode: hand-assembled header across serial types") {
    // record: [null, 42 (1-byte int), 3.5 (float64), "hi" (text 17), 2-byte blob (16)]
    val body = new java.io.ByteArrayOutputStream()
    val bits = java.lang.Double.doubleToLongBits(3.5)
    body.write(42)
    (7 to 0 by -1).foreach(i => body.write(((bits >> (8 * i)) & 0xff).toInt))
    body.write('h'); body.write('i')
    body.write(0xAB); body.write(0xCD)
    val hdr = Array[Byte](6, 0, 1, 7, 17, 16) // hdrLen 6, then 5 types
    val payload = hdr ++ body.toByteArray
    val got = Gpkg.decodeRecord(payload, 5)
    assert(got(0) == null && got(1) == 42L && got(2) == 3.5 && got(3) == "hi")
    assert(got(4).asInstanceOf[Array[Byte]].toSeq == Seq(0xAB.toByte, 0xCD.toByte))
  }

  test("hand-packed single-leaf db: header, master, records decode exactly") {
    // build a 512-byte-page db BY HAND: page 1 = header + master row for
    // table t(a INTEGER PRIMARY KEY, b TEXT) rooted at page 2; page 2 =
    // leaf with rows (rowid 1, [null, "x"]), (rowid 7, [null, "yy"])
    val pageSize = 512
    val file = new Array[Byte](2 * pageSize)
    val bb = java.nio.ByteBuffer.wrap(file)
    System.arraycopy("SQLite format 3".getBytes("ISO-8859-1"), 0, file, 0, 15)
    bb.putShort(16, pageSize.toShort)
    bb.putInt(28, 2)
    bb.putInt(56, 1)
    def cell(rowid: Long, payload: Array[Byte]): Array[Byte] =
      Gpkg.varintBytes(payload.length.toLong) ++ Gpkg.varintBytes(rowid) ++ payload
    // master record: type,name,tbl_name,rootpage,sql
    val ddl = "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT)"
    def text(s: String): (Long, Array[Byte]) = (13L + 2 * s.length, s.getBytes)
    val mvals = Seq(text("table"), text("t"), text("t"), (1L, Array[Byte](2)), text(ddl))
    val mhdr = Array[Byte]((1 + mvals.size).toByte) ++ mvals.flatMap(v => Gpkg.varintBytes(v._1))
    // header length must include the type varints (2-byte types for long text)
    val mtypes = mvals.flatMap(v => Gpkg.varintBytes(v._1)).toArray
    val mpayload = (Gpkg.varintBytes((1 + mtypes.length).toLong) ++ mtypes) ++ mvals.flatMap(_._2)
    val mcell = cell(1L, mpayload)
    file(100) = 0x0d
    bb.putShort(103, 1.toShort)
    val mOff = pageSize - mcell.length
    System.arraycopy(mcell, 0, file, mOff, mcell.length)
    bb.putShort(105, mOff.toShort)
    bb.putShort(108, mOff.toShort)
    // leaf page 2: two records, a NULL (pk alias) + text
    def rec(s: String): Array[Byte] =
      Array[Byte](3, 0, (13 + 2 * s.length).toByte) ++ s.getBytes
    val c1 = cell(1L, rec("x")); val c2 = cell(7L, rec("yy"))
    file(pageSize) = 0x0d
    bb.putShort(pageSize + 3, 2.toShort)
    var content = 2 * pageSize
    content -= c1.length
    System.arraycopy(c1, 0, file, content, c1.length)
    bb.putShort(pageSize + 8, (content - pageSize).toShort)
    content -= c2.length
    System.arraycopy(c2, 0, file, content, c2.length)
    bb.putShort(pageSize + 10, (content - pageSize).toShort)
    bb.putShort(pageSize + 5, (content - pageSize).toShort)

    val dir = java.nio.file.Files.createTempDirectory("graft_gpkg").toFile
    val f = new java.io.File(dir, "hand.db")
    java.nio.file.Files.write(f.toPath, file)

    val db = Gpkg.readDbMeta(f.getPath)
    assert(db.pageSize == 512 && db.reserved == 0)
    val ti = Gpkg.tableInfo(db, "t")
    assert(ti.rootPage == 2 && ti.columns == Seq("a", "b") && ti.pkOrdinal == 0)
    val rows = Gpkg.leafPages(db, ti.rootPage)
      .flatMap(p => Gpkg.leafRecords(db, p))
      .map { case (rowid, payload) => (rowid, Gpkg.decodeRecord(payload, 2).toSeq) }
    assert(rows == Seq((1L, Seq(null, "x")), (7L, Seq(null, "yy"))), rows.toString)
  }

  test("fixture db: interior root, overflow chain, and page-parallel refs") {
    val path = Gpkg.fixturePath(spark, sf)
    val db = Gpkg.readDbMeta(path)
    val ti = Gpkg.tableInfo(db, "zones")
    assert(ti.columns == Seq("id", "zone_name", "note", "geom") && ti.pkOrdinal == 0)
    val leaves = Gpkg.leafPages(db, ti.rootPage)
    assert(leaves.size > 1, s"fixture should span multiple leaves, got ${leaves.size}")
    // all 25 zones come back with rowid-aliased ids, zone 0's note is
    // the overflow-length string
    val rows = leaves.flatMap(p => Gpkg.leafRecords(db, p))
      .map { case (rowid, payload) =>
        val v = Gpkg.decodeRecord(payload, 4)
        (rowid, v(2).asInstanceOf[String].length)
      }.toMap
    assert(rows.size == 25)
    assert(rows(0L) == "long-attribute ".length * 80,
      s"zone 0 note length ${rows(0L)} — overflow chain broken")
  }

  test("MULTI-LEVEL interior b-tree: 1200 rows at 512-byte pages roundtrip") {
    // r16: the single-level interior root silently overflowed its page
    // past a few hundred leaves (the sf0.1 stations fixture hit it);
    // 1200 tiny rows → ~50 leaves → a 2-level interior tree under the
    // 34-way fan-out, walked by the already-recursive leafPages
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_io/gpkgspec_deep.db"
    new java.io.File(p).delete()
    val n = 3000
    def pad(i: Int): String = f"row-$i%05d-${"x" * 24}"
    Gpkg.writeTables(p, Seq(
      ("t", "CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)",
        (0 until n).map(i => (i.toLong, Seq[Any](null, pad(i)))))))
    val db = Gpkg.readDbMeta(p)
    val ti = Gpkg.tableInfo(db, "t")
    // the tree REALLY has two interior levels: the root's children are
    // interior pages, not leaves
    val rb = Gpkg.pageBytes(db, ti.rootPage)
    val rh = Gpkg.pageHeaderAt(ti.rootPage)
    assert((rb(rh) & 0xff) == 0x05, "interior root")
    val child = java.nio.ByteBuffer.wrap(rb).getInt(
      java.nio.ByteBuffer.wrap(rb).getShort(rh + 12) & 0xffff)
    val cb = Gpkg.pageBytes(db, child)
    assert((cb(Gpkg.pageHeaderAt(child)) & 0xff) == 0x05,
      "root children are interior pages — a real second level")
    val leaves = Gpkg.leafPages(db, ti.rootPage)
    assert(leaves.size > 34, s"leaf count ${leaves.size} spans >1 interior node")
    val rows = leaves.flatMap(pg => Gpkg.leafRecords(db, pg))
      .map { case (rowid, payload) =>
        rowid -> Gpkg.decodeRecord(payload, 2)(1).asInstanceOf[String]
      }.toMap
    assert(rows.size == n)
    (0 until n).foreach(i => assert(rows(i.toLong) == pad(i), s"row $i"))
  }

  test("full gpkg: rtree prunes the leaf manifest; candidates match envelopes") {
    val path = Gpkg.fullFixturePath(spark, sf)
    val db = Gpkg.readDbMeta(path)
    val ti = Gpkg.tableInfo(db, "zones")
    // the virtual rtree master row (rootpage 0) is invisible; its
    // shadow node table resolves
    assert(Gpkg.tableInfoOpt(db, "rtree_zones_geom").isEmpty)
    assert(Gpkg.tableInfoOpt(db, "rtree_zones_geom_node").isDefined)
    // expected candidates straight from the feature envelopes
    val feats = Gpkg.leafPages(db, ti.rootPage)
      .flatMap(p => Gpkg.leafRecords(db, p))
      .map { case (rowid, payload) =>
        val blob = Gpkg.decodeRecord(payload, 4)(3).asInstanceOf[Array[Byte]]
        rowid -> Gpkg.blobEnvelope(blob).get
      }.toMap
    val (wx0, wx1, wy0, wy1) = (0.0, 20.0, 0.0, 20.0)
    val want = feats.collect { case (id, (x0, x1, y0, y1))
      if x0 <= wx1 && x1 >= wx0 && y0 <= wy1 && y1 >= wy0 => id }.toSet
    val got = Gpkg.rtreeCandidates(db, "zones", "geom", wx0, wx1, wy0, wy1)
    assert(got.contains(want), s"rtree $got vs envelope $want")
    assert(want.nonEmpty && want.size < feats.size, "window should split the zones")
    // the .shx-manifest effect: fewer leaf pages range-read under the
    // window than a full scan touches
    val full = Gpkg.windowLeafRefs(db, path, ti, None)
    val pruned = Gpkg.windowLeafRefs(db, path, ti, got)
    assert(full.size > 1 && pruned.size < full.size,
      s"window read touches ${pruned.size} of ${full.size} leaves — no pruning")
    // a no-rtree file degrades to the full manifest (None = no pruning)
    val plain = Gpkg.readDbMeta(Gpkg.fixturePath(spark, sf))
    assert(Gpkg.rtreeCandidates(plain, "zones", "geom", wx0, wx1, wy0, wy1).isEmpty)
  }

  test("hand-built TWO-LEVEL rtree: the node walk recurses by depth") {
    // root (node 1, depth 1) -> two leaf nodes; boxes chosen so the
    // window hits only leaf B's second entry
    def node(depth: Int, cells: Seq[(Long, Float, Float, Float, Float)]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 + 24 * cells.size)
      b.putShort(0, depth.toShort)
      b.putShort(2, cells.size.toShort)
      cells.zipWithIndex.foreach { case ((id, x0, x1, y0, y1), i) =>
        val off = 4 + 24 * i
        b.putLong(off, id)
        b.putFloat(off + 8, x0); b.putFloat(off + 12, x1)
        b.putFloat(off + 16, y0); b.putFloat(off + 20, y1)
      }
      b.array()
    }
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_io/gpkgspec_rtree2.db"
    new java.io.File(p).delete()
    Gpkg.writeTables(p, Seq(
      ("t", "CREATE TABLE t (id INTEGER PRIMARY KEY, geom BLOB)", Nil),
      ("rtree_t_geom_node",
        "CREATE TABLE rtree_t_geom_node (nodeno INTEGER PRIMARY KEY, data BLOB)",
        Seq(
          (1L, Seq[Any](null, node(1, Seq((2L, 0f, 10f, 0f, 10f), (3L, 20f, 40f, 20f, 40f))))),
          (2L, Seq[Any](null, node(0, Seq((100L, 0f, 5f, 0f, 5f), (101L, 6f, 10f, 6f, 10f))))),
          (3L, Seq[Any](null, node(0, Seq((200L, 20f, 25f, 20f, 25f), (201L, 30f, 40f, 30f, 40f)))))))),
      pageSize = 512)
    val db = Gpkg.readDbMeta(p)
    // window hits only (30..40)^2 → leaf node 3, entry 201
    assert(Gpkg.rtreeCandidates(db, "t", "geom", 28, 35, 28, 35).contains(Set(201L)))
    // window spanning both subtrees collects from both leaves
    assert(Gpkg.rtreeCandidates(db, "t", "geom", 4, 22, 4, 22)
      .contains(Set(100L, 101L, 200L)))
  }

  test("geopackage zones equal shapefile zones byte-for-byte (same WKB pipeline)") {
    import org.apache.spark.sql.functions.col
    val g = Gpkg.readZones(spark, Gpkg.fixturePath(spark, sf), "zones")
      .select("zone_id", "geom").collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val sh = graft.zonal.Shapefile.readZones(spark,
      graft.zonal.Shapefile.fixturePath(spark, sf))
      .select("zone_id", "geom").collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(g.keySet == sh.keySet)
    g.foreach { case (z, wkb) =>
      assert(wkb == sh(z), s"zone $z: gpkg WKB diverges from shapefile WKB")
    }
  }

  private def msgs(t: Throwable): String =
    if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)

  test("WKB MultiPolygon: per-part decode incl. mixed endianness; bad types loud") {
    // hand-build a 2-part multi: part 0 little-endian, part 1 BIG —
    // each child carries its own endianness per WKB
    val bo = new java.io.ByteArrayOutputStream()
    def le32(v: Int) = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def be32(v: Int) = java.nio.ByteBuffer.allocate(4).putInt(v).array()
    def le64(v: Double) = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
    def be64(v: Double) = java.nio.ByteBuffer.allocate(8).putDouble(v).array()
    bo.write(1); bo.write(le32(6)); bo.write(le32(2))
    bo.write(1); bo.write(le32(3)); bo.write(le32(1)); bo.write(le32(4))
    Seq((0, 0), (2, 0), (2, 2), (0, 0)).foreach { case (x, y) =>
      bo.write(le64(x)); bo.write(le64(y)) }
    bo.write(0); bo.write(be32(3)); bo.write(be32(1)); bo.write(be32(4))
    Seq((10, 0), (12, 0), (12, 2), (10, 0)).foreach { case (x, y) =>
      bo.write(be64(x)); bo.write(be64(y)) }
    val got = Gpkg.parseWkbGeometry(bo.toByteArray, 0, "test").toList
    assert(got == List(
      (0, 0, 0, 0, 0), (0, 0, 1, 2, 0), (0, 0, 2, 2, 2),
      (1, 0, 0, 10, 0), (1, 0, 1, 12, 0), (1, 0, 2, 12, 2)))
    // a LineString (2) refuses by name at the geometry dispatch
    val ls = java.nio.ByteBuffer.allocate(9).put(1.toByte)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(1, 2).array()
    assert(msgs(intercept[Throwable](
      Gpkg.parseWkbGeometry(ls, 0, "test").toList)).contains("MultiPolygon"))
  }

  test("feature ids above Int.MaxValue refuse instead of truncating") {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_io/gpkgspec_bigrowid.db"
    new java.io.File(p).delete()
    Gpkg.writeTables(p, Seq(
      ("t", "CREATE TABLE t (id INTEGER PRIMARY KEY, geom BLOB)",
        Seq((3000000000L, Seq[Any](null, Array[Byte](1)))))))
    assert(msgs(intercept[Throwable](
      Gpkg.readVerts(spark, p, "t").collect())).contains("32-bit zone_id"))
  }

  test("rtree float32 boxes round conservatively (min down, max up)") {
    // 2^24 + 1 is not float-representable: nearest-rounding lands BELOW
    // the true value, which would shrink a max bound — ceil pushes it
    // back up; floor likewise never rises above the true min
    val v = 16777217.0
    assert(Gpkg.rtreeCeilF(v).toDouble >= v)
    assert(Gpkg.rtreeFloorF(v).toDouble <= v)
    assert(Gpkg.rtreeFloorF(-v).toDouble <= -v)
    assert(Gpkg.rtreeCeilF(-v).toDouble >= -v)
    // representable values pass through exactly
    assert(Gpkg.rtreeFloorF(12.0) == 12.0f && Gpkg.rtreeCeilF(12.0) == 12.0f)
    val w = 0.1 // below float precision in the other direction
    assert(Gpkg.rtreeFloorF(w).toDouble <= w && Gpkg.rtreeCeilF(w).toDouble >= w)
  }

  test("named loud refusals: bad magic, missing table, non-Polygon WKB, fractional coords") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gpkg_bad").toFile
    val notDb = new java.io.File(dir, "not.db")
    java.nio.file.Files.write(notDb.toPath, Array.fill[Byte](200)(7))
    assert(msgs(intercept[Throwable](Gpkg.readDbMeta(notDb.getPath)))
      .contains("not a SQLite 3"))
    val db = Gpkg.readDbMeta(Gpkg.fixturePath(spark, sf))
    assert(msgs(intercept[Throwable](Gpkg.tableInfo(db, "nope")))
      .contains("no table 'nope'"))
    // a MultiPolygon WKB (type 6) refuses by name
    val mp = java.nio.ByteBuffer.allocate(9).put(1.toByte)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(1, 6).array()
    assert(msgs(intercept[Throwable](
      Gpkg.parseWkbPolygon(mp, 0, "test").toList)).contains("MultiPolygon"))
    // fractional coordinates refuse with the lattice message
    val frac = java.nio.ByteBuffer.allocate(9 + 4 + 4 * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    frac.put(1.toByte).putInt(3).putInt(1).putInt(4)
    Seq((0.5, 0.0), (1.0, 0.0), (1.0, 1.0), (0.5, 0.0)).foreach { case (x, y) =>
      frac.putDouble(x).putDouble(y) }
    assert(msgs(intercept[Throwable](
      Gpkg.parseWkbPolygon(frac.array(), 0, "test").toList)).contains("fractional"))
  }
}
