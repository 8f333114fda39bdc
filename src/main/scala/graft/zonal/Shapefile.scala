package graft.zonal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ESRI Shapefile zone ingestion (round 6) — the other ubiquitous vector
  * interchange format next to GeoJSON, from the published ESRI shapefile
  * whitepaper (a plain public binary layout: BE record frame, LE shape
  * payloads). Closes the round-5 "what's missing" item on shapefile
  * ingestion; GeoPackage stays out of scope (it is a SQLite container,
  * which this offline JVM can't speak).
  *
  * Spark-first, the TIFF-manifest pattern applied to vectors: the driver
  * reads only the tiny `.shx` index (8 bytes per record) into a record
  * manifest; executors range-read each Polygon record's bytes from the
  * `.shp` and parse rings → long-form vertices → [[graft.ext.MakeWkb]]
  * assembles the same WKB the rest of the engine speaks. One record =
  * one unit of parallelism; a million-feature national parcel file scans
  * with no driver byte beyond the index.
  *
  * Contracts (loud, never silent): file code / version / shape type
  * checked per file AND per record; fractional coordinates throw (the
  * engine's integral-lattice rule, SURVEY §1.2); ring role (outer vs
  * hole) is intentionally IGNORED because the zonal pipeline is
  * even-odd — winding conventions cannot change the result.
  */
object Shapefile {

  private val FileCode = 9994
  private val Version = 1000
  private val TypePolygon = 5

  /** One executor work unit: a record's byte range in the .shp. */
  final case class ShpRef(path: String, recNo: Int, offset: Long, contentBytes: Int)

  // ---- writer (fixture generation; driver-side over the broadcast-
  // scale zone vertex table — the READ path below is the operator) ----

  /** Serialize a ring family as `.shp` + `.shx` (one Polygon record per
    * zone, record order = ascending zone_id so recNo - 1 = zone_id for
    * the dense fixture ids; every ring closed per the spec). Multi-part
    * zones flatten to one parts array — even-odd semantics make the
    * polygon/multipolygon distinction immaterial here.
    */
  def writeFixture(s: SparkSession, d: String, rings: Seq[Cube.RingSpec],
      path: String): Unit = {
    val verts = Cube.verts(s, d, rings)
      .select("zone_id", "part", "ring", "i", "vx", "vy")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
    val zones = verts.groupBy(_._1).toSeq.sortBy(_._1).map { case (zoneId, vs) =>
      val ringsClosed = vs.groupBy(v => (v._2, v._3)).toSeq.sortBy(_._1).map { case (_, pts) =>
        val ordered = pts.sortBy(_._4).map { case (_, _, _, _, x, y) => (x, y) }
        ordered :+ ordered.head // closed ring
      }
      (zoneId, ringsClosed)
    }

    val records = zones.map { case (_, ringsClosed) =>
      val numParts = ringsClosed.length
      val numPoints = ringsClosed.map(_.length).sum
      val contentBytes = 4 + 32 + 4 + 4 + 4 * numParts + 16 * numPoints
      val b = java.nio.ByteBuffer.allocate(contentBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val all = ringsClosed.flatten
      val (xs, ys) = (all.map(_._1), all.map(_._2))
      b.putInt(TypePolygon)
      b.putDouble(xs.min).putDouble(ys.min).putDouble(xs.max).putDouble(ys.max)
      b.putInt(numParts).putInt(numPoints)
      ringsClosed.scanLeft(0)(_ + _.length).init.foreach(b.putInt)
      all.foreach { case (x, y) => b.putDouble(x.toDouble).putDouble(y.toDouble) }
      b.array()
    }

    def mainHeader(fileBytes: Int, xs: Seq[Int], ys: Seq[Int]): Array[Byte] = {
      val h = java.nio.ByteBuffer.allocate(100) // BIG_ENDIAN default
      h.putInt(0, FileCode)
      h.putInt(24, fileBytes / 2) // length in 16-bit words
      h.order(java.nio.ByteOrder.LITTLE_ENDIAN)
      h.putInt(28, Version)
      h.putInt(32, TypePolygon)
      h.putDouble(36, xs.min).putDouble(44, ys.min)
      h.putDouble(52, xs.max).putDouble(60, ys.max)
      h.array()
    }
    val allX = verts.map(_._5).toSeq
    val allY = verts.map(_._6).toSeq

    val shpBytes = 100 + records.map(8 + _.length).sum
    val shp = java.nio.ByteBuffer.allocate(shpBytes)
    shp.put(mainHeader(shpBytes, allX, allY))
    val shx = java.nio.ByteBuffer.allocate(100 + 8 * records.length)
    shx.put(mainHeader(100 + 8 * records.length, allX, allY))
    var off = 100
    records.zipWithIndex.foreach { case (content, i) =>
      shx.putInt(off / 2).putInt(content.length / 2)
      shp.putInt(i + 1).putInt(content.length / 2) // record header, BE
      shp.put(content)
      off += 8 + content.length
    }

    def writeAll(p: String, bytes: Array[Byte]): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val out = fs.create(hp, true)
      try out.write(bytes) finally out.close()
    }
    writeAll(path, shp.array())
    writeAll(path.stripSuffix(".shp") + ".shx", shx.array())
  }

  // ---- reader ----

  /** Driver-side index read: the `.shx` is 100 + 8n bytes — the vector
    * analogue of the TIFF header/IFD.
    */
  def readIndex(shpPath: String): Seq[ShpRef] = {
    val ix = shpPath.stripSuffix(".shp") + ".shx"
    val p = new org.apache.hadoop.fs.Path(ix)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val len = fs.getFileStatus(p).getLen.toInt
    require(len >= 100 && (len - 100) % 8 == 0, s"$ix: not a .shx (length $len)")
    val raw = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, raw) finally in.close()
    val b = java.nio.ByteBuffer.wrap(raw) // BIG_ENDIAN default
    require(b.getInt(0) == FileCode, s"$ix: bad file code ${b.getInt(0)} (want $FileCode)")
    val shapeType = b.order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(32)
    require(shapeType == TypePolygon,
      s"$shpPath: shape type $shapeType unsupported (5 = Polygon)")
    b.order(java.nio.ByteOrder.BIG_ENDIAN)
    (0 until (len - 100) / 8).map { i =>
      // offsets/lengths are in 16-bit words; the offset addresses the
      // record HEADER, content starts 8 bytes later
      ShpRef(shpPath, i + 1,
        b.getInt(100 + 8 * i).toLong * 2 + 8, b.getInt(104 + 8 * i) * 2)
    }
  }

  /** Parse one Polygon record's content bytes to (ring, i, x, y) rows —
    * closing vertices dropped (the WKB builder recloses), fractional or
    * non-Polygon content throws.
    */
  private[zonal] def parseRecord(raw: Array[Byte], recNo: Int,
      path: String): Iterator[(Int, Int, Int, Int)] = {
    val b = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val st = b.getInt(0)
    require(st == TypePolygon, s"$path record $recNo: shape type $st, want Polygon (5)")
    val numParts = b.getInt(36)
    val numPoints = b.getInt(40)
    require(raw.length >= 44 + 4 * numParts + 16 * numPoints,
      s"$path record $recNo: truncated ($numParts parts, $numPoints points, ${raw.length} bytes)")
    val starts = Array.tabulate(numParts)(p => b.getInt(44 + 4 * p))
    val ptsOff = 44 + 4 * numParts
    def pt(j: Int): (Int, Int) = {
      val x = b.getDouble(ptsOff + 16 * j)
      val y = b.getDouble(ptsOff + 16 * j + 8)
      require(x == math.rint(x) && y == math.rint(y),
        s"$path record $recNo: fractional coordinate ($x, $y) — align to the lattice")
      (x.toInt, y.toInt)
    }
    (0 until numParts).iterator.flatMap { ring =>
      val lo = starts(ring)
      val hi = if (ring + 1 < numParts) starts(ring + 1) else numPoints
      require(hi - lo >= 4, s"$path record $recNo ring $ring: ${hi - lo} points (min 4, closed)")
      require(pt(lo) == pt(hi - 1), s"$path record $recNo ring $ring: not closed")
      (lo until hi - 1).iterator.map { j =>
        val (x, y) = pt(j); (ring, j - lo, x, y)
      }
    }
  }

  /** Long-form parsed vertices `(zone_id, part, ring, i, x, y)` — one
    * task per record manifest slice. zone_id = recNo - 1 (the fixture
    * writes records in ascending dense zone order; real deployments join
    * the .dbf attribute table on recNo). part is always 0: even-odd
    * semantics flatten the polygon/multipolygon distinction.
    */
  def readVerts(s: SparkSession, shpPath: String): DataFrame = {
    import s.implicits._
    val refs = readIndex(shpPath)
    s.createDataset(refs)
      .repartition(math.max(1, math.min(refs.size,
        s.sparkContext.defaultParallelism)))
      .flatMap { ref =>
        val p = new org.apache.hadoop.fs.Path(ref.path)
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val in = fs.open(p)
        try {
          val raw = new Array[Byte](ref.contentBytes)
          in.readFully(ref.offset, raw)
          parseRecord(raw, ref.recNo, ref.path).map { case (ring, i, x, y) =>
            (ref.recNo - 1, 0, ring, i, x, y)
          }
        } finally in.close()
      }
      .toDF("zone_id", "part", "ring", "i", "x", "y")
  }

  /** The operator: shapefile → the engine's zone shape
    * `(zone_id, geom: WKB, xmin, xmax, ymin, ymax)`, plugging straight
    * into [[Cube.rasterize]] + `point_in_wkb`.
    */
  def readZones(s: SparkSession, shpPath: String): DataFrame = {
    graft.ext.Ext.register(s)
    readVerts(s, shpPath)
      .groupBy(col("zone_id"))
      .agg(expr("make_wkb(sort_array(collect_list(struct(part, ring, i, x, y))))").as("geom"),
        min(col("x")).as("xmin"), max(col("x")).as("xmax"),
        min(col("y")).as("ymin"), max(col("y")).as("ymax"))
  }

  private val fixtures = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Write-once per-sf shapefile fixture of the NGonRings family. */
  def fixturePath(s: SparkSession, d: String): String = {
    val sfName = new java.io.File(d).getName
    fixtures.computeIfAbsent(sfName, { _ =>
      val path =
        s"${System.getProperty("java.io.tmpdir")}/graft_io/$sfName/zones_ngon.shp"
      writeFixture(s, d, Cube.NGonRings, path)
      path
    })
  }
}
