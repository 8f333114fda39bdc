package graft

import graft.zonal.{Cube, GeoJson, Gpkg, Shapefile}

/** Point/MultiPoint vector features (r16): container roundtrips
  * against the arithmetic station derivation, hand-built WKB blobs
  * pinning the parser alone, and the loud-refusal guards.
  */
class PointsSpec extends SparkSuite {

  private def stations(): Map[Int, (Int, Int)] =
    Cube.stations(spark, sf).select("station_id", "px", "py").collect()
      .map(r => r.getInt(0) -> ((r.getInt(1), r.getInt(2)))).toMap

  test("shapefile Point records roundtrip the station derivation") {
    val got = Shapefile.readPoints(spark, Shapefile.pointsFixturePath(spark, sf))
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    val want = stations()
    assert(got == want)
    // a Point reader pointed at the polygon fixture refuses by type
    val e = intercept[Exception](
      Shapefile.readPoints(spark, Shapefile.fixturePath(spark, sf)))
    assert(e.getMessage.contains("shape type"))
  }

  test("shapefile MultiPoint records roundtrip the member derivation") {
    val got = Shapefile.readMultiPoints(spark, Shapefile.multiPointFixturePath(spark, sf))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> ((r.getInt(2), r.getInt(3)))).toMap
    val want = Cube.multiPoints(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(got == want)
    want.foreach { case ((id, i), _) => assert(i < 2 + id % 3) }
  }

  test("geopackage Point + MultiPoint tables roundtrip; geojson Points match") {
    val p = Gpkg.pointsFixturePath(spark, sf)
    val got = Gpkg.readPoints(spark, p, "stations")
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got == stations())
    val gotM = Gpkg.readMultiPoints(spark, p, "stations_multi")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> ((r.getInt(2), r.getInt(3)))).toMap
    val wantM = Cube.multiPoints(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(gotM == wantM)
    val gotJ = GeoJson.readPoints(spark, GeoJson.pointsFixturePath(spark, sf))
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(gotJ == stations())
  }

  test("WKB point parser: hand-built blobs, mixed endianness, refusals") {
    // big-endian WKB Point inside a little-endian GPKG header
    def bePoint(x: Double, y: Double): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(21) // BIG_ENDIAN default
      b.put(0.toByte).putInt(1).putDouble(x).putDouble(y)
      b.array()
    }
    def lePoint(x: Double, y: Double): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
      b.array()
    }
    assert(Gpkg.parseWkbPoints(bePoint(7, 11), 0, "t").toSeq == Seq((0, 7, 11)))
    // MultiPoint whose members alternate endianness — each member's own
    // byte-order byte governs, per the WKB spec
    val mp = java.nio.ByteBuffer.allocate(9 + 42).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    mp.put(1.toByte).putInt(4).putInt(2)
    mp.put(bePoint(3, 4)).put(lePoint(60, 2))
    assert(Gpkg.parseWkbPoints(mp.array(), 0, "t").toSeq ==
      Seq((0, 3, 4), (1, 60, 2)))
    // non-point type refuses by name
    val ln = java.nio.ByteBuffer.allocate(9).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ln.put(1.toByte).putInt(2).putInt(0) // LineString
    val e1 = intercept[Exception](Gpkg.parseWkbPoints(ln.array(), 0, "t").toSeq)
    assert(e1.getMessage.contains("type 2"))
    // fractional coordinates refuse (the integral-lattice contract)
    val e2 = intercept[Exception](Gpkg.parseWkbPoints(lePoint(1.5, 2), 0, "t").toSeq)
    assert(e2.getMessage.contains("fractional"))
  }

  test("geojson non-Point geometry is loud IN the plan") {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_io/bad_points.geojson"
    val json =
      """{"type": "FeatureCollection", "features": [
        |{"type": "Feature", "properties": {"station_id": 0},
        | "geometry": {"type": "Point", "coordinates": [1, 2]}},
        |{"type": "Feature", "properties": {"station_id": 1},
        | "geometry": {"type": "LineString", "coordinates": [3, 4]}}]}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(p), json.getBytes("UTF-8"))
    val e = intercept[Exception](GeoJson.readPoints(spark, p).collect())
    assert(e.getMessage.contains("LineString") ||
      e.getCause != null && e.getCause.getMessage.contains("LineString"))
  }

  test("lines: all three containers roundtrip the road derivation") {
    val want = Cube.roadVerts(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getInt(2), r.getInt(3)))).toMap
    val shp = Shapefile.readLines(spark, Shapefile.linesFixturePath(spark, sf))
      .collect().map(r => (r.getInt(0), r.getInt(2)) -> ((r.getInt(3), r.getInt(4)))).toMap
    assert(shp == want)
    val gj = GeoJson.readLines(spark, GeoJson.linesFixturePath(spark, sf))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(gj == want)
    val gp = Gpkg.readLines(spark, Gpkg.pointsFixturePath(spark, sf), "roads")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(gp == want)
  }

  test("WKB LineString parser: hand-built vertices; refusals") {
    def line(pts: Seq[(Double, Double)]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(9 + 16 * pts.size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).putInt(2).putInt(pts.size)
      pts.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
      b.array()
    }
    assert(Gpkg.parseWkbLine(line(Seq((1, 2), (3, 4), (5, 6))), 0, "t").toSeq ==
      Seq((0, 1, 2), (1, 3, 4), (2, 5, 6)))
    // a 1-point line, a Point-typed blob, and fractional coords refuse
    val e1 = intercept[Exception](Gpkg.parseWkbLine(line(Seq((1, 2))), 0, "t").toSeq)
    assert(e1.getMessage.contains("min 2"))
    val pt = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    pt.put(1.toByte).putInt(1).putDouble(0).putDouble(0)
    val e2 = intercept[Exception](Gpkg.parseWkbLine(pt.array(), 0, "t").toSeq)
    assert(e2.getMessage.contains("type 1"))
    val e3 = intercept[Exception](
      Gpkg.parseWkbLine(line(Seq((1.5, 2), (3, 4))), 0, "t").toSeq)
    assert(e3.getMessage.contains("fractional"))
  }

  test("multi-geometry parity: geojson MultiPoint + gpkg MultiLineString roundtrip") {
    val wantM = Cube.multiPoints(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getInt(2), r.getInt(3)))).toMap
    val gj = GeoJson.readMultiPoints(spark, GeoJson.multiPointsFixturePath(spark, sf))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> ((r.getInt(2), r.getInt(3)))).toMap
    assert(gj == wantM)
    val roads = Cube.roadVerts(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(m => (m._3, m._4)).toSeq).toMap
    val gotML = Gpkg.readMultiLines(spark, Gpkg.pointsFixturePath(spark, sf), "roads_multi")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> ((r.getInt(3), r.getInt(4)))).toMap
    roads.foreach { case (id, pts) =>
      pts.take(2).zipWithIndex.foreach { case (p, i) =>
        assert(gotML((id, 0, i)) == p, s"road $id branch 0 vertex $i") }
      pts.drop(1).zipWithIndex.foreach { case (p, i) =>
        assert(gotML((id, 1, i)) == p, s"road $id branch 1 vertex $i") }
    }
    assert(gotML.size == roads.values.map(ps => 2 + ps.size - 1).sum)
    // hand-built mixed-endianness MultiLineString; bad child type loud
    def leLine(pts: Seq[(Double, Double)], be: Boolean = false): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(9 + 16 * pts.size)
      if (!be) b.order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(if (be) 0.toByte else 1.toByte).putInt(2).putInt(pts.size)
      pts.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
      b.array()
    }
    val ml = java.nio.ByteBuffer.allocate(9 + 2 * (9 + 32))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ml.put(1.toByte).putInt(5).putInt(2)
    ml.put(leLine(Seq((1, 2), (3, 4)), be = true))
    ml.put(leLine(Seq((5, 6), (7, 8))))
    assert(Gpkg.parseWkbLines(ml.array(), 0, "t").toSeq ==
      Seq((0, 0, 1, 2), (0, 1, 3, 4), (1, 0, 5, 6), (1, 1, 7, 8)))
    val bad = java.nio.ByteBuffer.allocate(9 + 21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bad.put(1.toByte).putInt(5).putInt(1)
    bad.put(1.toByte).putInt(1).putDouble(0).putDouble(0) // a Point child
    val e = intercept[Exception](Gpkg.parseWkbLines(bad.array(), 0, "t").toSeq)
    assert(e.getMessage.contains("child type 1"))
  }

  test("multi-part shapefile PolyLine records parse per part") {
    // hand-built .shp/.shx with ONE 2-part PolyLine record — the parts
    // array path the single-part fixtures never exercise
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_io/shpspec_mpl"
    new java.io.File(dir).mkdirs()
    val pts = Seq((1, 2), (3, 4), (5, 6), (10, 11), (12, 13)) // parts at 0 and 3
    val content = java.nio.ByteBuffer.allocate(44 + 8 + 16 * pts.size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    content.putInt(3) // PolyLine
    content.putDouble(1).putDouble(2).putDouble(12).putDouble(13)
    content.putInt(2).putInt(pts.size).putInt(0).putInt(3)
    pts.foreach { case (x, y) => content.putDouble(x.toDouble).putDouble(y.toDouble) }
    val rec = content.array()
    def mainHeader(fileBytes: Int): Array[Byte] = {
      val h = java.nio.ByteBuffer.allocate(100)
      h.putInt(0, 9994); h.putInt(24, fileBytes / 2)
      h.order(java.nio.ByteOrder.LITTLE_ENDIAN)
      h.putInt(28, 1000); h.putInt(32, 3)
      h.putDouble(36, 1).putDouble(44, 2).putDouble(52, 12).putDouble(60, 13)
      h.array()
    }
    val shp = java.nio.ByteBuffer.allocate(100 + 8 + rec.length)
    shp.put(mainHeader(100 + 8 + rec.length))
    shp.putInt(1).putInt(rec.length / 2).put(rec)
    val shx = java.nio.ByteBuffer.allocate(108)
    shx.put(mainHeader(108)).putInt(50).putInt(rec.length / 2)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/r.shp"), shp.array())
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/r.shx"), shx.array())
    val got = Shapefile.readLines(spark, s"$dir/r.shp").collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> ((r.getInt(3), r.getInt(4)))).toMap
    assert(got == Map(
      (0, 0) -> ((1, 2)), (0, 1) -> ((3, 4)), (0, 2) -> ((5, 6)),
      (1, 0) -> ((10, 11)), (1, 1) -> ((12, 13))))
  }

  test("registry: zonal_lines counts only both-endpoints-inside segments") {
    val rows = q("zonal_lines").collect()
    assert(rows.nonEmpty, "short segments must land inside zones")
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) > 0) // squared lengths are positive integers
    }
  }

  test("registry: zonal_points covers every zone a station parity-hits") {
    val rows = q("zonal_points").collect()
    assert(rows.nonEmpty)
    // counts are positive and sums are finite money values
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(!r.getDouble(2).isNaN)
    }
  }
}
