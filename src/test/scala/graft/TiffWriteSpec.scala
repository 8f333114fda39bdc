package graft

import org.apache.spark.sql.functions._

/** The DSv2 TIFF-mosaic WRITE face (r19):
  * `df.write.format("graft.zonal.TiffSource").option("height", h)
  * .option("width", w).option("tile", "th,tw").save(dir)` — staged
  * per-member GeoTIFF fragments, metadata-only (rename) commit on
  * tile-aligned input, decode+merge only for genuinely split members,
  * an exact `_tile_stats` sidecar assembled at commit, loud guards.
  */
class TiffWriteSpec extends SparkSuite {
  import spark.implicits._

  private val tmp = System.getProperty("java.io.tmpdir")

  private def grid(w: Int, h: Int) =
    (0 until w).flatMap(x => (0 until h).map(y =>
      (x, y, ((7 * x + 11 * y) % 101).toDouble)))
      .toDF("cell_x", "cell_y", "value")

  private def msgs(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")

  test("tile-aligned write commits by rename only; edge members clip; sidecar is exact") {
    val dir = s"$tmp/graft_io/tiffw_aligned"
    graft.core.Fs.rmTree(dir)
    val (w, h, ts) = (40, 24, 16) // 3x2 members, right/bottom edges partial
    grid(w, h)
      .repartition(expr(s"cell_y div $ts"), expr(s"cell_x div $ts"))
      .write.format("graft.zonal.TiffSource")
      .option("height", h).option("width", w).option("tile", s"$ts,$ts")
      .mode("overwrite").save(dir)
    assert(graft.zonal.TiffWrite.lastCommit == (6, 0),
      s"want (6 members, 0 merges), got ${graft.zonal.TiffWrite.lastCommit}")
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith(".stage")),
      "staging directory must be removed on commit")
    val back = spark.read.format("graft.zonal.TiffSource").load(dir)
    assert(back.count() == w.toLong * h, "edge members must clip to the grid, not pad")
    assert(back.filter(
      col("value") =!= (col("cell_x") * 7 + col("cell_y") * 11) % 101).count() == 0)
    // the sidecar min/max is exact per member: replay member (2, 1)
    // (x in [32,40), y in [16,24)) from the formula
    val st = graft.zonal.Raster.readStatsManifest(dir)
      .find(t => t.ox == 32 && t.oy == 16).get
    val vs = for (x <- 32 until 40; y <- 16 until 24) yield ((7 * x + 11 * y) % 101).toDouble
    assert(st.vmin == vs.min && st.vmax == vs.max, st.toString)
  }

  test("r20: the mosaic install/merge path refuses to run on the driver") {
    // the ZarrWrite.installChunk twin: the guard IS the pin — the
    // scattered-write test below (merges > 0, exact read-back) proves
    // the split-member merge now runs executor-side
    val e = intercept[IllegalArgumentException] {
      graft.zonal.TiffWrite.installMember("/nonexistent",
        graft.zonal.TiffGeom(8, 8, 8, 8), 0, 0, Seq.empty)
    }
    assert(e.getMessage.contains("executor task"), e.getMessage)
  }

  test("arbitrary (non-aligned) partitioning still writes exactly, via fragment merge") {
    val dir = s"$tmp/graft_io/tiffw_split"
    graft.core.Fs.rmTree(dir)
    val (w, h, ts) = (40, 24, 16)
    grid(w, h).repartition(8)
      .write.format("graft.zonal.TiffSource")
      .option("height", h).option("width", w).option("tile", s"$ts,$ts")
      .mode("overwrite").save(dir)
    val (n, merged) = graft.zonal.TiffWrite.lastCommit
    assert(n == 6 && merged > 0,
      s"scattered input must exercise the merge path, got ($n, $merged)")
    val back = spark.read.format("graft.zonal.TiffSource").load(dir)
    assert(back.count() == w.toLong * h)
    assert(back.filter(
      col("value") =!= (col("cell_x") * 7 + col("cell_y") * 11) % 101).count() == 0)
  }

  test("min/max aggregate over the written mosaic answers from the commit's sidecar") {
    val dir = s"$tmp/graft_io/tiffw_minmax"
    graft.core.Fs.rmTree(dir)
    val (w, h, ts) = (32, 32, 16)
    grid(w, h)
      .repartition(expr(s"cell_y div $ts"), expr(s"cell_x div $ts"))
      .write.format("graft.zonal.TiffSource")
      .option("height", h).option("width", w).option("tile", s"$ts,$ts")
      .mode("overwrite").save(dir)
    // poison one member's data region (header intact): the pushed agg
    // must still answer from the sidecar without opening data bytes
    val f = new java.io.File(dir, "tile_1_1.tif")
    val raf = new java.io.RandomAccessFile(f, "rw")
    try { raf.seek(raf.length() - 64); raf.write(Array.fill(32)(0x7f.toByte)) }
    finally raf.close()
    val mosaic = spark.read.format("graft.zonal.TiffSource").load(dir)
    val agg = mosaic.agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    assert(agg.queryExecution.executedPlan.toString.contains("graft-meta-row"),
      agg.queryExecution.executedPlan.toString.take(500))
    val vs = for (x <- 0 until w; y <- 0 until h) yield ((7 * x + 11 * y) % 101).toDouble
    val r = agg.head()
    assert(r.getDouble(0) == vs.min && r.getDouble(1) == vs.max, r.toString)
  }

  test("append upserts members into an existing mosaic; off-grid geometry refuses") {
    val dir = s"$tmp/graft_io/tiffw_append"
    graft.core.Fs.rmTree(dir)
    def opts(df: org.apache.spark.sql.DataFrame) =
      df.write.format("graft.zonal.TiffSource")
        .option("height", 16).option("width", 32).option("tile", "16,16")
    opts((0 until 16).flatMap(x => (0 until 16).map(y => (x, y, 1.0)))
      .toDF("cell_x", "cell_y", "value")).mode("overwrite").save(dir)
    opts((16 until 32).flatMap(x => (0 until 16).map(y => (x, y, 2.0)))
      .toDF("cell_x", "cell_y", "value")).mode("append").save(dir)
    val back = spark.read.format("graft.zonal.TiffSource").load(dir)
    assert(back.filter(col("value") === 1.0).count() == 256)
    assert(back.filter(col("value") === 2.0).count() == 256)
    // rewriting member (0, 0) upserts in place: same member count, new values
    opts((0 until 16).flatMap(x => (0 until 16).map(y => (x, y, 3.0)))
      .toDF("cell_x", "cell_y", "value")).mode("append").save(dir)
    assert(graft.zonal.Raster.readStatsManifest(dir).size == 2)
    assert(spark.read.format("graft.zonal.TiffSource").load(dir)
      .filter(col("value") === 3.0).count() == 256)
    // an existing member OFF this write's tile grid would overlap: refuse
    val off = s"$tmp/graft_io/tiffw_append_off"
    graft.core.Fs.rmTree(off)
    graft.zonal.Raster.writeTiff(s"$off/odd.tif", 16, 16, 16, 16)((x, y) => 1.0)
    graft.zonal.Raster.writeStatsManifest(off,
      Seq(graft.zonal.Raster.TileStats("odd.tif", 8, 0, 1.0, 1.0)))
    val e = intercept[Throwable] {
      Seq((0, 0, 9.0)).toDF("cell_x", "cell_y", "value")
        .write.format("graft.zonal.TiffSource")
        .option("height", 16).option("width", 32).option("tile", "16,16")
        .mode("append").save(off)
    }
    assert(msgs(e).contains("geometry"), msgs(e))
    // same origin under a different member name: also a refusal
    val dup = s"$tmp/graft_io/tiffw_append_dup"
    graft.core.Fs.rmTree(dup)
    graft.zonal.Raster.writeTiff(s"$dup/legacy.tif", 16, 16, 16, 16)((x, y) => 1.0)
    graft.zonal.Raster.writeStatsManifest(dup,
      Seq(graft.zonal.Raster.TileStats("legacy.tif", 0, 0, 1.0, 1.0)))
    val e2 = intercept[Throwable] {
      Seq((0, 0, 9.0)).toDF("cell_x", "cell_y", "value")
        .write.format("graft.zonal.TiffSource")
        .option("height", 16).option("width", 16).option("tile", "16,16")
        .mode("append").save(dup)
    }
    assert(msgs(e2).contains("two members"), msgs(e2))
  }

  test("out-of-grid cells, cross-partition duplicates, and missing columns refuse loudly") {
    val dir = s"$tmp/graft_io/tiffw_guard"
    graft.core.Fs.rmTree(dir)
    val oob = intercept[Throwable] {
      Seq((99, 0, 1.0)).toDF("cell_x", "cell_y", "value")
        .write.format("graft.zonal.TiffSource")
        .option("height", 8).option("width", 8).option("tile", "8,8")
        .mode("overwrite").save(dir)
    }
    assert(msgs(oob).contains("outside"), msgs(oob))
    val dupc = intercept[Throwable] {
      Seq((1, 1, 1.0), (1, 1, 2.0)).toDF("cell_x", "cell_y", "value")
        .repartition(8, col("value")).write.format("graft.zonal.TiffSource")
        .option("height", 8).option("width", 8).option("tile", "8,8")
        .mode("overwrite").save(dir)
    }
    assert(msgs(dupc).contains("two partitions"), msgs(dupc))
    val miss = intercept[Throwable] {
      Seq((1, 1.0)).toDF("cell_x", "value")
        .write.format("graft.zonal.TiffSource")
        .option("height", 8).option("width", 8)
        .mode("overwrite").save(s"$tmp/graft_io/tiffw_miss")
    }
    assert(msgs(miss).contains("cell_y"), msgs(miss))
  }

  test("registry op: sink_raster_dsv2 per-tile totals match the cells table") {
    val r = q("sink_raster_dsv2").collect()
    assert(r.nonEmpty)
    assert(graft.zonal.TiffWrite.lastCommit._2 == 0,
      "tile-aligned registry write must not merge any fragment")
    val cells = graft.zonal.Cube.cells(spark, sf)
      .groupBy("cell_x", "cell_y").agg(count(lit(1)).as("n"))
      .groupBy((col("cell_x") / 16).cast("long").as("tile_x"),
        (col("cell_y") / 16).cast("long").as("tile_y"))
      .agg(count(lit(1)).as("n_cells"), sum("n").as("sum_v"))
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3)))
      .toMap
    r.foreach { row =>
      val k = (row.getLong(0), row.getLong(1))
      assert(cells(k) == ((row.getLong(2), row.getLong(3))), s"tile $k")
    }
  }
}
