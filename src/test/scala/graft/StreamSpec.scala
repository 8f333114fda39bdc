package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.stream.{Ev, Stateful, Streaming}

case class E(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Structured-Streaming behavior the batch oracle can't check
  * (SURVEY.md §2.10): watermark late-drop, stateful dedup, custom state
  * across micro-batches. All driven through MemoryStream.
  */
class StreamSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0) =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:$sec%02d")

  test("events_gapfill: dense per-user series, counts conserved") {
    val rows = q("events_gapfill").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    assert(total == graft.core.Tables.events(spark, sf).count(),
      "gap fill lost or invented events")
    // each user's series is contiguous: row count == span in days
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val days = rs.map(_.getDate(1).toLocalDate)
      val span = java.time.temporal.ChronoUnit.DAYS.between(days.min, days.max) + 1
      assert(rs.length == span, s"user $u: ${rs.length} rows over $span days")
      assert(days.distinct.length == rs.length)
    }
    assert(rows.exists(_.getLong(2) == 0), "no gap rows — fixture has no gaps?")
  }

  test("tumbling streaming agg equals batch agg on the same rows") {
    implicit val sq = spark.sqlContext
    val rows = graft.core.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[E].collect().toSeq
    val ms = MemoryStream[E]
    ms.addData(rows)
    val q = Streaming.tumbling(ms.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("tumbling_out")
    val batch = SparkEntry.queries("stream_tumbling")(spark, sf)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("windowed approx-distinct tracks exact per-window uniques; rows conserved") {
    val got = q("stream_approx_distinct").collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = graft.core.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "15 minutes"))
      .agg(countDistinct(col("user_id")).as("u"), count(lit(1)).as("n"))
      .select(col("window.start"), col("u"), col("n"))
      .collect().map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == exact.keySet && got.nonEmpty)
    exact.foreach { case (w, (u, n)) =>
      val (au, an) = got(w)
      assert(an == n, s"window $w: row count $an vs $n")
      assert(math.abs(au.toDouble - u) / math.max(u, 1L) < 0.1,
        s"window $w: approx $au vs exact $u")
    }
  }

  test("streaming zonal stats equals the batch plan on the same rows") {
    implicit val sq = spark.sqlContext
    val rows = graft.core.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[E].collect().toSeq
    val ms = MemoryStream[E]
    ms.addData(rows)
    val q = Streaming.zonalStats(ms.toDF(), graft.zonal.Cube.zones(spark, sf))
      .writeStream.format("memory").queryName("zonal_out")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("zonal_out")
    val batch = SparkEntry.queries("stream_zonal_stats")(spark, sf)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("watermark drops a row later than (max event time - delay)") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[E]
    val q = Streaming.tumbling(ms.toDF())
      .writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    // batch 1: events at minute 1 and minute 30 → watermark → 20:00,
    // closing windows through [0:00,05:00)
    ms.addData(Seq(E(1, ts(1), 1, "click", 1.0), E(2, ts(30), 1, "click", 1.0)))
    q.processAllAvailable()
    val closed = spark.table("wm_out").count()
    assert(closed >= 1, "expected the first window to close")
    // batch 2: a LATE row back in minute 2 — behind the watermark → dropped
    ms.addData(Seq(E(3, ts(2), 1, "click", 99.0)))
    q.processAllAvailable()
    // batch 3: advance watermark far enough to close everything
    ms.addData(Seq(E(4, ts(55), 1, "click", 1.0)))
    q.processAllAvailable(); q.stop()
    val out = spark.table("wm_out")
      .filter(col("win_start") === ts(0)).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n") == 1,
      s"late row leaked into the closed window: ${out.mkString(",")}")
  }

  test("dropDuplicatesWithinWatermark keeps one of two in-watermark duplicates") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[E]
    val q = Streaming.dedupWithinWatermark(ms.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    ms.addData(Seq(
      E(1, ts(1), 7, "click", 1.0),
      E(2, ts(2), 7, "click", 2.0),   // duplicate key within watermark
      E(3, ts(3), 7, "view", 3.0)))
    q.processAllAvailable(); q.stop()
    val n = spark.table("dedup_out").count()
    assert(n == 2, s"expected 2 surviving rows, got $n")
  }

  test("stream-stream left outer: match emits immediately, null row only after eviction") {
    implicit val sq = spark.sqlContext
    val mc = MemoryStream[E]
    val mp = MemoryStream[E]
    val clicks = mc.toDF()
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = mp.toDF()
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    val q = clicks.join(purchases,
        col("user_id") === col("p_user")
          && col("purchase_ts") >= col("click_ts")
          && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTE"),
        "left_outer")
      .select(col("click_id"), col("purchase_id"))
      .writeStream.format("memory").queryName("ssl_out")
      .outputMode("append").start()
    // batch 1: user 1 click never matches; user 2 click matches in-range
    mc.addData(Seq(E(1, ts(0), 1, "click", 1.0), E(2, ts(1), 2, "click", 1.0)))
    mp.addData(Seq(E(10, ts(5), 2, "purchase", 9.0)))
    q.processAllAvailable()
    val b1 = spark.table("ssl_out").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(b1 == Set((2L, Some(10L))),
      s"batch 1 must emit ONLY the matched pair (watermark still behind): ${b1.mkString(",")}")
    // batch 2: both sides advance far past click0 + 30min + 10min delay
    // → the trailing eviction emits the null-extended row
    val far = java.sql.Timestamp.valueOf("2024-01-01 02:00:00")
    mc.addData(Seq(E(3, far, 9, "click", 1.0)))
    mp.addData(Seq(E(11, far, 9, "purchase", 1.0)))
    q.processAllAvailable(); q.stop()
    val b2 = spark.table("ssl_out").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(b2.contains((1L, None)),
      s"unmatched click must emit null-extended after watermark passes: ${b2.mkString(",")}")
  }

  test("stream-stream full outer: both null sides watermark-gated") {
    implicit val sq = spark.sqlContext
    val mc = MemoryStream[E]
    val mp = MemoryStream[E]
    val clicks = mc.toDF()
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    val purchases = mp.toDF()
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    val q = clicks.join(purchases,
        col("user_id") === col("p_user")
          && col("purchase_ts") >= col("click_ts")
          && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTE"),
        "full_outer")
      .select(col("click_id"), col("purchase_id"))
      .writeStream.format("memory").queryName("ssfull_out")
      .outputMode("append").start()
    // batch 1: user 1 click unmatched; user 3 purchase unmatched;
    // user 2 matches
    mc.addData(Seq(E(1, ts(0), 1, "click", 1.0), E(2, ts(1), 2, "click", 1.0)))
    mp.addData(Seq(E(10, ts(5), 2, "purchase", 9.0), E(11, ts(6), 3, "purchase", 2.0)))
    q.processAllAvailable()
    val b1 = spark.table("ssfull_out").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(b1 == Set((Some(2L), Some(10L))),
      s"batch 1 must emit only the match: ${b1.mkString(",")}")
    // batch 2: watermark advances far — BOTH unmatched rows emit
    val far = java.sql.Timestamp.valueOf("2024-01-01 02:00:00")
    mc.addData(Seq(E(3, far, 9, "click", 1.0)))
    mp.addData(Seq(E(12, far, 9, "purchase", 1.0)))
    q.processAllAvailable(); q.stop()
    val b2 = spark.table("ssfull_out").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(b2.contains((Some(1L), None)) && b2.contains((None, Some(11L))),
      s"both unmatched sides must emit after eviction: ${b2.mkString(",")}")
  }

  test("flatMapGroupsWithState capped spend equals the batch twin") {
    implicit val sq = spark.sqlContext
    val rows = graft.core.Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "value").as[Ev]
      .collect().sortBy(e => (Stateful.micros(e.ts), e.event_id)).toSeq
    val ms = MemoryStream[Ev]
    ms.addData(rows)
    val q = Stateful.cappedSpendStreaming(ms.toDS())
      .writeStream.format("memory").queryName("state_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("state_out")
    val batch = Stateful.cappedSpendBatch(graft.core.Tables.events(spark, sf))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("E3 end-to-end: readStream parquet -> watermarked window agg -> parquet sink") {
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory("graft_stream").toFile
    val inDir = new java.io.File(tmp, "in"); inDir.mkdirs()
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(inDir.getPath, "events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(inDir.getPath).schema
    val ev = graft.core.Tables.normalizeEventsTs(
      spark.readStream.schema(rawSchema).parquet(inDir.getPath))
    val out = new java.io.File(tmp, "out").getPath
    val q = graft.stream.Streaming.tumbling(ev)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", new java.io.File(tmp, "cp").getPath)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(out)
    // append mode emits only watermark-closed windows: batch equivalent =
    // tumbling agg restricted to win_start + 5 min <= max(ts) - 10 min
    val events = graft.core.Tables.events(spark, sf)
    val maxTs = events.agg(max("ts")).head.getTimestamp(0)
    val expected = SparkEntry.queries("stream_tumbling")(spark, sf)
      .filter(col("win_start") + expr("INTERVAL 5 MINUTE")
        <= lit(maxTs) - expr("INTERVAL 10 MINUTE"))
    assert(got.count() > 0, "no closed windows written to the sink")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("transformWithState (RocksDB ValueState) agrees with the batch twin") {
    implicit val sq = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rows = graft.core.Tables.events(spark, sf)
        .select("event_id", "user_id", "ts", "value").as[Ev]
        .collect().sortBy(e => (Stateful.micros(e.ts), e.event_id)).toSeq
      val ms = MemoryStream[Ev]
      // two micro-batches so ValueState actually carries across batches
      val (b1, b2) = rows.splitAt(rows.length / 2)
      val q = Stateful.cappedSpendTws(ms.toDS())
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("append").start()
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      q.stop()
      val streamed = spark.table("tws_out")
      val batch = Stateful.cappedSpendBatch(graft.core.Tables.events(spark, sf))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("batch and streaming twins agree on same-millisecond events (µs ordering)") {
    implicit val sq = spark.sqlContext
    // two events 800 µs apart inside the SAME millisecond: ms-truncated
    // ordering (Timestamp.getTime) would fold them in event_id order
    // while Spark's sort uses full precision — both paths must use µs
    def t(us: Int) = {
      val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      ts.setNanos(us * 1000); ts
    }
    val rows = Seq(Ev(1, 7, t(900), 300.0), Ev(2, 7, t(100), 300.0))
    val ms = MemoryStream[Ev]
    ms.addData(rows.sortBy(e => (Stateful.micros(e.ts), e.event_id)))
    val q = Stateful.cappedSpendStreaming(ms.toDS())
      .writeStream.format("memory").queryName("msfix_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("msfix_out")
    val batch = Stateful.cappedSpendBatch(rows.toDF())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // the later event (id 1, 900 µs) must be the one that resets
    val resetIds = batch.filter(col("did_reset")).collect().map(_.getLong(0)).toSeq
    assert(resetIds == Seq(1L))
  }

  test("stateful reset: cumulative never exceeds cap except on the reset row") {
    val out = Stateful.cappedSpendBatch(graft.core.Tables.events(spark, sf))
    val bad = out.filter(col("cum_after") > graft.stream.Stateful.Cap && !col("did_reset"))
    assert(bad.count() == 0)
  }

  test("foreachBatch sink: multiple micro-batches land in idempotent batch_id partitions") {
    val got = q("stream_foreach_batch").collect()
    assert(got.length > 0)
    val sfName = new java.io.File(sf).getName
    val store = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_io/$sfName/stream_feb/store")
    val parts = store.listFiles().filter(_.getName.startsWith("batch_id=")).map(_.getName).sorted
    assert(parts.length >= 2, s"expected multiple micro-batch partitions, got ${parts.toSeq}")
    // re-aggregated partials equal the plain batch aggregation
    val direct = graft.core.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach(r => assert(direct(r.getLong(0)) == r.getLong(1),
      s"user ${r.getLong(0)} count mismatch"))
  }

  test("stream_cube_time: per-file CF axes decode in-stream; final watermark holds the open tail (r18)") {
    val rows = q("stream_cube_time").collect()
    // 4 monthly landing files → 4 tumbling 30-day windows, the LAST
    // held open by the 5-day watermark (append-mode emission rule)
    assert(rows.length == 3, s"expected 3 closed windows, got ${rows.length}")
    val starts = rows.map(_.getTimestamp(0).toInstant.toEpochMilli).sorted
    assert(starts.sliding(2).forall(w => w.length < 2
      || w(1) - w(0) == 30L * 86400 * 1000), "window starts 30 days apart")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_cells")) == 2L * 80 * 70,
        "each closed window holds exactly its member's two epochs")
    }
  }

  test("r18 streaming DSv2 face: admission control batches, exactly-once resume on a late member") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("zstream").toString
    val land = s"$base/land"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    for (k <- 0 until 3)
      graft.zonal.Zarr.writeZarr(f"$land/part-$k%04d", 16, 16, 16, 16)(
        (x, y) => (x + y + 100 * k).toDouble)
    def drain(): org.apache.spark.sql.streaming.StreamingQuery = {
      val q = spark.readStream.format("graft.zonal.ZarrSource")
        .option("members_per_batch", "2").load(land)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(); q
    }
    val q1 = drain()
    // admission control: 3 members at 2/batch → at least 2 micro-batches
    val batches1 = q1.recentProgress.count(_.numInputRows > 0)
    assert(batches1 >= 2, s"expected >= 2 admission-controlled batches, got $batches1")
    val r1 = spark.read.parquet(out)
    assert(r1.count() == 3L * 16 * 16)
    assert(r1.select("epoch").distinct().collect().map(_.getInt(0)).toSet == Set(0, 1, 2))
    // a LATE member lands (name-sorted after the committed prefix):
    // a fresh AvailableNow run from the SAME checkpoint reads exactly
    // the new member — no re-read, no skip
    graft.zonal.Zarr.writeZarr(f"$land/part-0003", 16, 16, 16, 16)(
      (x, y) => (x + y + 300).toDouble)
    drain()
    val r2 = spark.read.parquet(out)
    assert(r2.count() == 4L * 16 * 16, "resume must add exactly the late member")
    val e3 = r2.filter(col("epoch") === 3)
    assert(e3.count() == 16L * 16)
    assert(e3.filter(col("cell_x") === 1 && col("cell_y") === 2)
      .head().getDouble(3) == 303.0)
    // batch read of the same landing dir sees the full cube
    val batch = spark.read.format("graft.zonal.ZarrSource").load(land)
    assert(batch.count() == 4L * 16 * 16)
    assert(batch.schema.fieldNames.toSeq == Seq("cell_x", "cell_y", "epoch", "value"))
  }

  test("r18 streaming DSv2, classic twin: file members batch under admission control and resume exactly-once") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("ncstream").toString
    val land = s"$base/land"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(land).mkdirs()
    for (k <- 0 until 3)
      graft.zonal.Netcdf.writeNetcdf(f"$land/part-$k%04d.nc", "v", 8, 8, 6,
        coordVars = false)((x, y, _) => (x + y + 100 * k).toDouble)
    def drain(): org.apache.spark.sql.streaming.StreamingQuery = {
      val q = spark.readStream.format("graft.zonal.NetcdfSource")
        .option("var", "v").option("members_per_batch", "2").load(land)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(); q
    }
    val q1 = drain()
    assert(q1.recentProgress.count(_.numInputRows > 0) >= 2,
      "3 members at 2/batch need >= 2 micro-batches")
    assert(spark.read.parquet(out).count() == 3L * 64)
    // a late file resumes exactly-once from the same checkpoint
    graft.zonal.Netcdf.writeNetcdf(f"$land/part-0003.nc", "v", 8, 8, 6,
      coordVars = false)((x, y, _) => (x + y + 300).toDouble)
    drain()
    val r2 = spark.read.parquet(out)
    assert(r2.count() == 4L * 64)
    assert(r2.filter(col("epoch") === 3 && col("cell_x") === 1 && col("cell_y") === 2)
      .head().getDouble(3) == 303.0)
    // the same landing dir batch-reads as the full cube
    val batch = spark.read.format("graft.zonal.NetcdfSource")
      .option("var", "v").load(land)
    assert(batch.count() == 4L * 64)
    assert(batch.schema.fieldNames.toSeq == Seq("cell_x", "cell_y", "epoch", "value"))
  }

  test("r19 streaming DSv2, hdf5 twin: chunked members batch under admission control and resume exactly-once") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("h5stream").toString
    val land = s"$base/land"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(land).mkdirs()
    for (k <- 0 until 3)
      graft.zonal.Hdf5.writeHdf5(f"$land/part-$k%04d.nc", "v", 8, 8, 4, 4,
        dtype = "<f8", deflate = true)((x, y) => (x + y + 100 * k).toDouble)
    def drain(): org.apache.spark.sql.streaming.StreamingQuery = {
      val q = spark.readStream.format("graft.zonal.Hdf5Source")
        .option("var", "v").option("members_per_batch", "2").load(land)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(); q
    }
    val q1 = drain()
    assert(q1.recentProgress.count(_.numInputRows > 0) >= 2,
      "3 members at 2/batch need >= 2 micro-batches")
    assert(spark.read.parquet(out).count() == 3L * 64)
    // a late file resumes exactly-once from the same checkpoint
    graft.zonal.Hdf5.writeHdf5(f"$land/part-0003.nc", "v", 8, 8, 4, 4,
      dtype = "<f8", deflate = true)((x, y) => (x + y + 300).toDouble)
    drain()
    val r2 = spark.read.parquet(out)
    assert(r2.count() == 4L * 64)
    assert(r2.filter(col("epoch") === 3 && col("cell_x") === 1 && col("cell_y") === 2)
      .head().getDouble(3) == 303.0)
    // the same landing dir batch-reads as the full cube
    val batch = spark.read.format("graft.zonal.Hdf5Source")
      .option("var", "v").load(land)
    assert(batch.count() == 4L * 64)
    assert(batch.schema.fieldNames.toSeq == Seq("cell_x", "cell_y", "epoch", "value"))
  }

  test("r20 native streaming cube write: one declarative plan; a replayed batch must not double-append its epoch") {
    import org.apache.spark.sql.functions.{col, expr}
    val base = java.nio.file.Files.createTempDirectory("zarrnative").toString
    val land = s"$base/land"; val store = s"$base/store"; val ckpt = s"$base/ckpt"
    new java.io.File(land).mkdirs()
    for (k <- 0 until 3)
      graft.zonal.Raster.writeTiff(f"$land/part-$k%04d.tif", 8, 8, 8, 8)(
        (x, y) => (x + y + 10 * k).toDouble)
    def drain(): Unit = {
      val q = spark.readStream.format("graft.zonal.TiffSource")
        .option("members_per_batch", "1").load(land)
        .repartition(expr("epoch"))
        .writeStream.format("graft.zonal.ZarrSource")
        .option("height", 8).option("width", 8).option("epochs", 3)
        .option("chunk", "1,8,8")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(store)
      q.awaitTermination()
    }
    drain()
    val back = spark.read.format("graft.zonal.ZarrSource").load(store)
    assert(back.count() == 3L * 64)
    assert(back.filter(col("epoch") === 2 && col("cell_x") === 3 && col("cell_y") === 1)
      .select("value").head().getDouble(0) == 24.0)
    val log = new java.io.File(store, ".stream_commits")
    assert(log.exists() && java.nio.file.Files.readAllLines(log.toPath).size() == 3,
      "three epochs, three commit-log lines")
    // force a REPLAY: removing the checkpoint's last commit marker makes
    // the engine re-execute batch 2 on restart — the store's commit log
    // must swallow it instead of double-appending the epoch
    assert(new java.io.File(s"$ckpt/commits/2").delete(), "checkpoint commit marker")
    new java.io.File(s"$ckpt/commits/.2.crc").delete() // checksum-FS sidecar
    val skips0 = graft.zonal.ZarrWrite.streamSkips
    drain()
    assert(graft.zonal.ZarrWrite.streamSkips > skips0,
      "the replayed epoch must be SKIPPED via the store commit log")
    val back2 = spark.read.format("graft.zonal.ZarrSource").load(store)
    assert(back2.count() == 3L * 64, "no double-append")
    assert(java.nio.file.Files.readAllLines(log.toPath).size() == 3,
      "the commit log must not grow on replay")
  }

  test("r20: a NEW streaming query (fresh checkpoint) into an existing store is not deduped against the old query's batches") {
    // code-review finding: a bare-epochId commit-log key would make a
    // new query's batch 0..n collide with the old query's and silently
    // drop data — the key scopes by the checkpoint-stable query id
    import org.apache.spark.sql.functions.expr
    val base = java.nio.file.Files.createTempDirectory("zarrnewq").toString
    val store = s"$base/store"
    def run(land: String, ckpt: String, bias: Int): Unit = {
      new java.io.File(land).mkdirs()
      for (k <- 0 until 2)
        graft.zonal.Raster.writeTiff(f"$land/part-$k%04d.tif", 8, 8, 8, 8)(
          (x, y) => (x + y + 10 * k + bias).toDouble)
      val q = spark.readStream.format("graft.zonal.TiffSource")
        .option("members_per_batch", "1").load(land)
        .repartition(expr("epoch"))
        .writeStream.format("graft.zonal.ZarrSource")
        .option("height", 8).option("width", 8).option("epochs", 2)
        .option("chunk", "1,8,8")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(store)
      q.awaitTermination()
    }
    run(s"$base/land_a", s"$base/ckpt_a", bias = 0)
    // query B: fresh checkpoint, fresh landing dir, SAME store — its
    // batch ids restart at 0 but its epochs must still apply
    run(s"$base/land_b", s"$base/ckpt_b", bias = 1000)
    val back = spark.read.format("graft.zonal.ZarrSource").load(store)
    assert(back.filter(org.apache.spark.sql.functions.col("value") >= 1000)
      .count() == 2L * 64, "the new query's batches must not be dropped")
  }

  test("r20 cube TAIL face: epochs stream as they land, resume exactly-once, pending stages hold the frontier") {
    import org.apache.spark.sql.functions.{col, expr}
    val base = java.nio.file.Files.createTempDirectory("zarrtail").toString
    val store = s"$base/store"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
    def appendEpoch(e: Int): Unit =
      spark.sql(
        s"""SELECT CAST(id % 16 AS INT) AS cell_x, CAST(id DIV 16 AS INT) AS cell_y,
           |  CAST($e AS INT) AS epoch,
           |  CAST(id % 16 + 2 * (id DIV 16) + 100 * $e AS DOUBLE) AS value
           |FROM range(0, 256)""".stripMargin)
        .repartition(expr("epoch"))
        .write.format("graft.zonal.ZarrSource")
        .option("height", 16).option("width", 16).option("epochs", 4)
        .option("chunk", "1,16,16")
        .mode(if (e == 0) "overwrite" else "append").save(store)
    appendEpoch(0); appendEpoch(1)
    def drain(): Unit = {
      val q = spark.readStream.format("graft.zonal.ZarrSource").load(store)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() == 2L * 256)
    // a pending staged fragment HOLDS the frontier: epoch 2's chunk
    // file alone must not emit while a write is mid-commit
    val stage = new java.io.File(store, ".stage_probe"); stage.mkdirs()
    java.nio.file.Files.write(new java.io.File(stage, "2.-1.0.0.p0_t0").toPath,
      Array[Byte](1))
    java.nio.file.Files.write(new java.io.File(store, "2.0.0").toPath,
      Array[Byte](1, 2, 3)) // dummy bytes — withheld, so never decoded
    drain()
    assert(spark.read.parquet(out).count() == 2L * 256,
      "a mid-commit epoch must be withheld")
    // commit completes: the stage vanishes, the real epoch lands — the
    // resumed stream emits ONLY epoch 2, exactly once
    graft.core.Fs.rmTree(stage.getPath)
    new java.io.File(store, "2.0.0").delete()
    appendEpoch(2)
    drain()
    val r = spark.read.parquet(out)
    assert(r.count() == 3L * 256)
    assert(r.filter(col("epoch") === 2).count() == 256)
    assert(r.filter(col("epoch") === 2 && col("cell_x") === 3 && col("cell_y") === 4)
      .select("value").head().getDouble(0) == 3 + 8 + 200)
    // refusal: a rank-2 store has no epoch axis to tail
    val flat = s"$base/flat"
    spark.sql("SELECT CAST(id % 8 AS INT), CAST(id DIV 8 AS INT), CAST(id AS DOUBLE) FROM range(0, 64)")
      .toDF("cell_x", "cell_y", "value")
      .write.format("graft.zonal.ZarrSource")
      .option("height", 8).option("width", 8).mode("overwrite").save(flat)
    val e = intercept[Throwable] {
      spark.readStream.format("graft.zonal.ZarrSource").load(flat)
        .writeStream.format("console")
        .option("checkpointLocation", s"$base/ckpt2")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        .awaitTermination()
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(e).contains("rank-3"), msgs(e))
  }

  test("r20: BigTIFF impostors are filtered out of the TIFF landing face, both byte orders") {
    // ADVICE r19: the magic check admitted big-endian BigTIFF (MM\0 43)
    // members the classic reader cannot parse, failing the micro-batch
    // instead of skipping the non-member; only classic version 42 admits
    val land = java.nio.file.Files.createTempDirectory("tifbig").toString
    graft.zonal.Raster.writeTiff(s"$land/part-0000.tif", 8, 8, 8, 8)(
      (x, y) => (x + y).toDouble)
    // hand-assembled BigTIFF magics (version 43), both byte orders
    java.nio.file.Files.write(new java.io.File(s"$land/part-0001.tif").toPath,
      Array[Byte]('M', 'M', 0, 43, 0, 8, 0, 0))
    java.nio.file.Files.write(new java.io.File(s"$land/part-0002.tif").toPath,
      Array[Byte]('I', 'I', 43, 0, 8, 0, 0, 0))
    val batch = spark.read.format("graft.zonal.TiffSource").load(land)
    assert(batch.count() == 64, "only the classic scene is a member")
    assert(batch.select("epoch").distinct().count() == 1)
  }

  test("r19 streaming DSv2, tiff twin: scene members batch under admission control and resume exactly-once") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("tifstream").toString
    val land = s"$base/land"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(land).mkdirs()
    for (k <- 0 until 3)
      graft.zonal.Raster.writeTiff(f"$land/part-$k%04d.tif", 8, 8, 8, 8)(
        (x, y) => (x + y + 100 * k).toDouble)
    def drain(): org.apache.spark.sql.streaming.StreamingQuery = {
      val q = spark.readStream.format("graft.zonal.TiffSource")
        .option("members_per_batch", "2").load(land)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(); q
    }
    val q1 = drain()
    assert(q1.recentProgress.count(_.numInputRows > 0) >= 2,
      "3 members at 2/batch need >= 2 micro-batches")
    assert(spark.read.parquet(out).count() == 3L * 64)
    // a late scene resumes exactly-once from the same checkpoint
    graft.zonal.Raster.writeTiff(f"$land/part-0003.tif", 8, 8, 8, 8)(
      (x, y) => (x + y + 300).toDouble)
    drain()
    val r2 = spark.read.parquet(out)
    assert(r2.count() == 4L * 64)
    assert(r2.filter(col("epoch") === 3 && col("cell_x") === 1 && col("cell_y") === 2)
      .head().getDouble(3) == 303.0)
    // the same landing dir batch-reads as the full scene stack
    val batch = spark.read.format("graft.zonal.TiffSource").load(land)
    assert(batch.count() == 4L * 64)
    assert(batch.schema.fieldNames.toSeq == Seq("cell_x", "cell_y", "epoch", "value"))
    // a multiband scene in the landing dir refuses loudly (one epoch
    // per single-band file is the contract)
    graft.zonal.Raster.writeTiffBands(f"$land/part-0004.tif", 8, 8, 8, 8, 2)(
      (x, y, b) => (x + y + b).toDouble)
    val e = intercept[Throwable] {
      spark.read.format("graft.zonal.TiffSource").load(land).count()
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(e).contains("single-band"), msgs(e))
  }

  test("r19 streaming cube build: per-batch appends commit rename-only and the cube reads back whole") {
    val rows = q("stream_cube_build").collect()
    assert(rows.length == 3, s"3 epochs, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_cells")) == 90L * 70,
        "each appended epoch holds one full scene")
    }
    // epoch-aligned chunks mean the LAST batch's append merged nothing
    assert(graft.zonal.ZarrWrite.lastCommit._2 == 0,
      "per-epoch appends must be rename-only commits")
  }

  test("events_anomaly flags exactly the >3σ tail of each event type") {
    val rows = q("events_anomaly").collect()
    assert(rows.nonEmpty, "the heavy-tailed fixture should have 3σ outliers")
    rows.foreach { r =>
      val z = r.getDouble(r.fieldIndex("z_r"))
      assert(math.abs(z) > 3 && math.abs(z) < 20, s"z out of expected band: $z")
    }
    // count cross-check against an independent double-path recompute
    // (population stddev; tolerance-free count because no fixture value
    // sits within 1e-6 of the boundary)
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val expected = ev.groupBy(_._1).map { case (_, vs) =>
      val xs = vs.map(_._2)
      val m = xs.sum / xs.length
      val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / xs.length)
      xs.count(x => math.abs((x - m) / sd) > 3)
    }.sum
    assert(rows.length == expected, s"${rows.length} flagged vs $expected recomputed")
  }
}
