package graft

import graft.zonal.Utm

/** Krüger-series gates: forward∘inverse closure at sub-mm, central
  * meridian / equator fixed points, axis monotonicity, and the shared
  * SQL spelling agreeing with the Scala twin to the last ulp-scale
  * digit (the oracle then proves Spark ≡ DuckDB on the same text).
  */
class UtmSpec extends SparkSuite {

  test("forward∘inverse closes to sub-millimeter over the fixture extent") {
    // fixture: zone 31N, E ∈ [510000, 512700], N ∈ [4647900, 4650000]
    for (e <- 509000 to 513000 by 500; nn <- 4647000 to 4651000 by 500) {
      val (lon, lat) = Utm.inverse(e, nn, 3)
      val (e2, n2) = Utm.forward(lon, lat, 3)
      assert(math.abs(e2 - e) < 1e-3 && math.abs(n2 - nn) < 1e-3,
        s"round trip at ($e, $nn): got ($e2, $n2)")
    }
    // and far afield: high latitude, larger offsets from the meridian
    for ((e, nn) <- Seq((300000.0, 6100000.0), (700000.0, 900000.0), (500000.0, 5000000.0))) {
      val (lon, lat) = Utm.inverse(e, nn, 3)
      val (e2, n2) = Utm.forward(lon, lat, 3)
      assert(math.abs(e2 - e) < 1e-3 && math.abs(n2 - nn) < 1e-3,
        s"round trip at ($e, $nn): got ($e2, $n2)")
    }
  }

  test("fixed points: central meridian maps to λ₀, equator to φ = 0") {
    val (lon0, lat0) = Utm.inverse(Utm.FalseEasting, 0.0, 3)
    assert(math.abs(lon0 - 3.0) < 1e-12 && math.abs(lat0) < 1e-12)
    // anywhere on the central meridian: lon stays λ₀
    for (nn <- Seq(1000000.0, 4650000.0, 7000000.0)) {
      val (lon, _) = Utm.inverse(Utm.FalseEasting, nn, 3)
      assert(math.abs(lon - 3.0) < 1e-9, s"N=$nn: lon $lon")
    }
    // scale check on the meridian: N = k0 * meridian arc; one degree of
    // latitude near 42° is ~111.1 km of arc
    val (_, latA) = Utm.inverse(Utm.FalseEasting, 4650000.0, 3)
    val (_, latB) = Utm.inverse(Utm.FalseEasting, 4761100.0, 3)
    val dLat = latB - latA
    assert(dLat > 0.99 && dLat < 1.01, s"111.1 km ≈ ${dLat}° of latitude")
  }

  test("southern hemisphere: 1e7 false northing round-trips negative latitudes") {
    // EPSG:327xx: N = 9,000,000 in zone 31S is ~9°S, not ~81°N
    val (lonS, latS) = Utm.inverse(500000.0 + 20000, 9000000.0, 3, Utm.SouthFalseNorthing)
    assert(latS < -8.9 && latS > -9.2, s"lat $latS should be ~ -9°")
    val (e2, n2) = Utm.forward(lonS, latS, 3, Utm.SouthFalseNorthing)
    assert(math.abs(e2 - 520000.0) < 1e-3 && math.abs(n2 - 9000000.0) < 1e-3,
      s"south round trip: ($e2, $n2)")
    // the northern interpretation of the same northing is wildly
    // different — the hemisphere parameter is load-bearing
    val (_, latN) = Utm.inverse(520000.0, 9000000.0, 3)
    assert(latN > 80, s"northern reading should be ~81°, got $latN")
  }

  test("monotonicity: easting → lon, northing → lat") {
    var prevLon = Double.NegativeInfinity
    for (e <- 480000 to 520000 by 5000) {
      val (lon, _) = Utm.inverse(e, 4650000.0, 3)
      assert(lon > prevLon); prevLon = lon
    }
    var prevLat = Double.NegativeInfinity
    for (nn <- 4600000 to 4700000 by 10000) {
      val (_, lat) = Utm.inverse(Utm.FalseEasting + 11000, nn, 3)
      assert(lat > prevLat); prevLat = lat
    }
  }

  test("shared SQL spelling matches the Scala twin at every fixture cell") {
    import org.apache.spark.sql.functions._
    // a 9-point probe lattice through the fixture envelope, run through
    // the exact SQL text the operator and oracle share
    val cells = for (i <- 0 until 3; j <- 0 until 3)
      yield (i * 40 + 4, j * 30 + 3, 1.0)
    spark.createDataFrame(cells).toDF("cell_x", "cell_y", "value")
      .createOrReplaceTempView("utmspec_probe")
    val sql = Utm.inverseSql(
      Utm.centersSql("SELECT * FROM utmspec_probe", 510000L, 4650000L, 30L, 30L), 3)
    val got = spark.sql(sql).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(got.size == 9)
    for ((x, y, _) <- cells) {
      val e = 510000.0 + 30 * x + 15
      val nn = 4650000.0 - 30 * y - 15
      val (lon, lat) = Utm.inverse(e, nn, 3)
      val (gl, gt) = got((x, y))
      assert(math.abs(gl - lon) < 2e-6 && math.abs(gt - lat) < 2e-6,
        s"cell ($x,$y): sql ($gl,$gt) vs twin ($lon,$lat)")
    }
  }
}
