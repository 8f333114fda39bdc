package graft

import graft.zonal.Helmert
import graft.zonal.Helmert.H7

/** Pins for the 7-parameter Helmert datum shift: the unrolled
  * production formulas against an INDEPENDENT matrix-form
  * implementation (the literal-transcription cross-check recipe),
  * Bowring-inverse closure, identity behavior, and magnitude sanity —
  * with the LARGE OSGB36 set so sign/transposition bugs are
  * metres-visible even where NAD83's terms hide under rounding.
  */
class HelmertSpec extends SparkSuite {

  /** Independent twin: explicit 3×3 position-vector rotation matrix
    * multiply (different code shape from the unrolled per-axis
    * production formulas).
    */
  private def shiftMatrix(lonDeg: Double, latDeg: Double, p: H7): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg)
    val nu = Helmert.AGrs80 /
      math.sqrt(1 - Helmert.E2Grs80 * math.sin(phi) * math.sin(phi))
    val v = Array(
      nu * math.cos(phi) * math.cos(lam),
      nu * math.cos(phi) * math.sin(lam),
      nu * (1 - Helmert.E2Grs80) * math.sin(phi))
    // position-vector convention: R = I + [[0,-rz,ry],[rz,0,-rx],[-ry,rx,0]]
    val m = Array(
      Array(1.0, -p.rz, p.ry),
      Array(p.rz, 1.0, -p.rx),
      Array(-p.ry, p.rx, 1.0))
    val t = Array(p.tx, p.ty, p.tz)
    val out = Array.tabulate(3)(i =>
      t(i) + p.sc * (m(i)(0) * v(0) + m(i)(1) * v(1) + m(i)(2) * v(2)))
    Helmert.ecefToGeodetic(out(0), out(1), out(2))
  }

  private val pts = Seq(
    (-28.375, 39.125), (-10.125, 23.375), (-20.0, 30.0),
    (-7.625, 39.875), (-29.875, 22.625), (1.5, 52.25))

  test("unrolled production formulas equal the independent matrix twin (OSGB36 + NAD83)") {
    for (p <- Seq(Helmert.Osgb36ToWgs84, Helmert.Nad83ToWgs84); (lon, lat) <- pts) {
      val (lonA, latA) = Helmert.shiftLocal(lon, lat, p)
      val (lonB, latB) = shiftMatrix(lon, lat, p)
      assert(math.abs(lonA - lonB) < 1e-12 && math.abs(latA - latB) < 1e-12,
        s"($lon,$lat) $p: unrolled ($lonA,$latA) vs matrix ($lonB,$latB)")
    }
  }

  test("Bowring ECEF->geodetic closes the WGS84 forward to sub-micrometre") {
    for ((lon, lat) <- pts) {
      val (x, y, z) = Helmert.geodeticToEcefWgs84(lon, lat)
      val (lon2, lat2) = Helmert.ecefToGeodetic(x, y, z)
      // 1e-11 deg ~ 1 µm on the ground
      assert(math.abs(lon2 - lon) < 1e-11 && math.abs(lat2 - lat) < 1e-11,
        s"closure at ($lon,$lat): got ($lon2,$lat2)")
    }
  }

  test("zero parameters = pure ellipsoid change: lon exact, lat moves < 1e-5 deg") {
    val id = H7(0, 0, 0, 0, 0, 0, 0)
    for ((lon, lat) <- pts) {
      val (lon2, lat2) = Helmert.shiftLocal(lon, lat, id)
      assert(math.abs(lon2 - lon) < 1e-12, s"identity lon drifted: $lon -> $lon2")
      // GRS80 vs WGS84 flattening differs in the 10th significant digit
      assert(math.abs(lat2 - lat) < 1e-5, s"identity lat moved too far: $lat -> $lat2")
    }
  }

  test("NAD83 shift is metre-scale; OSGB36 shift is hectometre-scale") {
    for ((lon, lat) <- pts) {
      val (lonN, latN) = Helmert.shiftLocal(lon, lat, Helmert.Nad83ToWgs84)
      val dN = math.hypot((lonN - lon) * 111320 * math.cos(math.toRadians(lat)),
        (latN - lat) * 110574)
      assert(dN > 0.05 && dN < 3.0, s"NAD83 shift $dN m at ($lon,$lat)")
      val (lonO, latO) = Helmert.shiftLocal(lon, lat, Helmert.Osgb36ToWgs84)
      val dO = math.hypot((lonO - lon) * 111320 * math.cos(math.toRadians(lat)),
        (latO - lat) * 110574)
      assert(dO > 50 && dO < 1000, s"OSGB36 shift $dO m at ($lon,$lat)")
    }
  }

  test("SQL chain equals the Scala twin on fixture cells") {
    import org.apache.spark.sql.functions._
    val cells = Helmert.cellsLonLat(spark, graft.zonal.Raster.degreeFixturePath())
      .orderBy("cell_y", "cell_x").limit(5).collect()
    assert(cells.nonEmpty)
    cells.foreach { r =>
      val (x, y) = (r.getAs[Int]("cell_x"), r.getAs[Int]("cell_y"))
      val lonSrc = (-240.0 + 2 * x) / 8.0 + 0.125
      val latSrc = (320.0 - 2 * y) / 8.0 - 0.125
      val (lonT, latT) = Helmert.shiftLocal(lonSrc, latSrc)
      assert(math.abs(r.getAs[Double]("lon") - math.rint(lonT * 1e6) / 1e6) < 2e-6 &&
        math.abs(r.getAs[Double]("lat") - math.rint(latT * 1e6) / 1e6) < 2e-6,
        s"cell ($x,$y): SQL (${r.getAs[Double]("lon")},${r.getAs[Double]("lat")}) " +
          s"vs twin ($lonT,$latT)")
    }
  }
}
