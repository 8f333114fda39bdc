package graft

import org.apache.spark.sql.functions._

/** Relational invariants (SURVEY.md §5.3-5.4) + specs for the operators
  * the DuckDB oracle can't check (sinks, approx aggregates).
  */
class RelSpec extends SparkSuite {

  test("every registered query runs and is non-empty at sf0.001") {
    // synthetic data has no near-dups / fuzzy matches / close-balance
    // pairs at the tiny SF (the text-cluster pipeline DOES yield rows
    // at sf0.001 — keep it guarded)
    val allowEmpty = Set("dedup_minhash_pairs", "text_fuzzy_match", "join_band")
    SparkEntry.registry.foreach { case (name, qd) =>
      val n = qd.build(spark, sf).count()
      assert(allowEmpty.contains(name) || n > 0, s"$name returned 0 rows")
    }
  }

  test("events loader accepts both fixture generations: timestamp[us] and ns-as-long") {
    // the environment regenerated events.ts as timestamp[us] in round 9
    // and 28 operators broke at analysis time (r9 verdict headline) —
    // pin BOTH physical encodings through the shared dtype branch so a
    // future fixture swap can't break the engine twice. Hand-written
    // files: same logical instants, one file µs TIMESTAMP_NTZ (what the
    // current fixtures decode to), one BIGINT nanos (what nanosAsLong
    // yields for the legacy timestamp[ns] files).
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_events_gen").toFile.getPath
    val usDir = s"$base/us"; val nsDir = s"$base/ns"
    val rows = spark.range(5).selectExpr(
      "id AS event_id",
      "timestampadd(MINUTE, cast(id AS int), timestamp'2024-01-01 00:00:00') AS ts0",
      "id AS user_id", "'click' AS event_type", "cast(id AS double) AS value",
      "'{\"k\": 1}' AS props")
    rows.selectExpr("event_id", "cast(ts0 AS timestamp_ntz) AS ts", "user_id",
        "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$usDir/events.parquet")
    rows.selectExpr("event_id", "unix_micros(ts0) * 1000 AS ts", "user_id",
        "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$nsDir/events.parquet")
    val us = graft.core.Tables.events(spark, usDir)
    val ns = graft.core.Tables.events(spark, nsDir)
    for (df <- Seq(us, ns))
      assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
        s"normalized ts must be TIMESTAMP, got ${df.schema("ts").dataType}")
    val usTs = us.orderBy("event_id").select("ts").collect().map(_.getTimestamp(0)).toSeq
    val nsTs = ns.orderBy("event_id").select("ts").collect().map(_.getTimestamp(0)).toSeq
    assert(usTs == nsTs, s"generations diverge: $usTs vs $nsTs")
    assert(usTs.head.toInstant == java.time.Instant.parse("2024-01-01T00:00:00Z"),
      s"UTC anchoring broke: ${usTs.head.toInstant}")
  }

  test("sink_compact: the rewrite actually reduces the file count") {
    q("sink_compact").count()
    val sfName = new java.io.File(sf).getName
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_io/$sfName"
    def parquetFiles(dir: String) =
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))
    val (nIn, nOut) = (parquetFiles(s"$base/compact_in"), parquetFiles(s"$base/compact_out"))
    assert(nIn >= 8 && nOut <= 2 && nOut >= 1,
      s"compaction did not reduce files: $nIn -> $nOut")
  }

  test("scan_parquet_bloom: footer carries a bloom for l_partkey and only l_partkey") {
    q("scan_parquet_bloom").count() // triggers the write
    val sfName = new java.io.File(sf).getName
    val dir = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_io/$sfName/scan_parquet_bloom")
    val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val conf = new org.apache.hadoop.conf.Configuration()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.getAbsolutePath), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val rgs = reader.getFooter.getBlocks
      assert(!rgs.isEmpty)
      rgs.forEach { rg =>
        rg.getColumns.forEach { cc =>
          val hasBloom = cc.getBloomFilterOffset >= 0
          val isKey = cc.getPath.toDotString == "l_partkey"
          assert(hasBloom == isKey,
            s"bloom presence wrong for ${cc.getPath.toDotString}: $hasBloom")
        }
      }
    } finally reader.close()
  }

  test("join_table_diff: classification matches the snapshot key arithmetic") {
    val byChange = q("join_table_diff").collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val keys = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0))
    val added = keys.count(k => k % 10 == 0 && k % 7 != 0)
    val removed = keys.count(k => k % 10 != 0 && k % 7 == 0)
    val changed = keys.count(k => k % 10 != 0 && k % 7 != 0 && k % 5 == 0)
    assert(byChange.getOrElse("added", 0) == added)
    assert(byChange.getOrElse("removed", 0) == removed)
    assert(byChange.getOrElse("changed", 0) == changed)
  }

  test("scan_parquet_evolve: NULL back-fill lands exactly on the old generation") {
    val rows = q("scan_parquet_evolve").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gen = r.getInt(r.fieldIndex("gen"))
      val isNull = r.isNullAt(r.fieldIndex("s_acctbal"))
      assert(isNull == (gen == 1), s"key ${r.getLong(0)}: gen $gen null=$isNull")
    }
  }

  test("semi ⊎ anti partitions the left side") {
    val c = graft.core.Tables.customer(spark, sf)
    val hi = graft.core.Tables.orders(spark, sf).filter(col("o_totalprice") > 450000)
    val semi = c.join(hi, c("c_custkey") === hi("o_custkey"), "left_semi").count()
    val anti = q("join_anti").count()
    assert(semi + anti == c.count())
  }

  test("union all counts add; union distinct bounded") {
    val c = graft.core.Tables.customer(spark, sf)
    val a = c.filter(col("c_mktsegment") === "BUILDING").count()
    val b = c.filter(col("c_acctbal") > 5000).count()
    assert(q("set_union_all").count() == a + b)
    val du = q("set_union_distinct").count()
    assert(du <= a + b && du >= math.max(a, b))
  }

  test("approx_count_distinct within rsd of exact") {
    val got = q("agg_approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.core.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = got(k).toDouble
      assert(math.abs(ap - ex) / ex < 0.1, s"flag $k: approx $ap vs exact $ex")
    }
  }

  test("sketch union: rolled-up HLL estimate tracks exact distinct; rows conserved") {
    // the mergeability property: estimates from UNIONED per-status
    // sketches must track the exact per-flag distinct count as closely
    // as a direct sketch would (lgK=14 → rse ≈ 0.8%, allow 5%)
    val got = q("agg_sketch_union").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = graft.core.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"), count(lit(1)).as("rows"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (k, (ex, rows)) =>
      val (ap, gotRows) = got(k)
      assert(math.abs(ap.toDouble - ex) / ex < 0.05,
        s"flag $k: union estimate $ap vs exact $ex")
      assert(gotRows == rows, s"flag $k: row conservation $gotRows vs $rows")
    }
  }

  test("dedup_exact is idempotent and keyed-unique") {
    val d1 = q("dedup_exact")
    assert(d1.groupBy("l_orderkey", "l_linenumber").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("sink_parquet round-trips rows exactly") {
    val orig = graft.core.Tables.nation(spark, sf)
    val back = rel.Scans.parquetRoundTrip(spark, sf)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).count() == 0)
  }

  test("sink_partitioned prunes partitions on read-back") {
    val out = rel.Scans.partitionedWrite(spark, sf)
    val pruned = spark.read.parquet(out).filter(col("o_orderstatus") === "F")
    val allFiles = spark.read.parquet(out).inputFiles.length
    val prunedFiles = pruned.inputFiles.length
    // inputFiles is pre-pruning; assert via the executed plan's partition count
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(scan.toString.contains("PartitionFilters") || prunedFiles <= allFiles)
    val statuses = pruned.select("o_orderstatus").distinct().collect().map(_.getString(0))
    assert(statuses.sameElements(Array("F")))
  }

  test("sink_upsert applies MERGE semantics: updates win, inserts land, untouched rows survive") {
    val orders = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = q("sink_upsert").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val baseKeys = orders.keySet.filter(_ % 10 != 0)
    val changeKeys = orders.keySet.filter(_ % 7 != 0)
    assert(got.keySet == (baseKeys ++ changeKeys), "merged key set wrong")
    got.foreach { case (k, v) =>
      val expect =
        if (changeKeys(k)) { if (k % 5 == 0) orders(k) + 1000 else orders(k) }
        else orders(k)
      assert(v == expect, s"key $k: got $v want $expect")
    }
  }

  test("fn_variant agrees with the string-path JSON extraction") {
    // two independent engine paths over the same column must agree:
    // Σ sum_k over variant buckets == Σ k over get_json_object rows
    val variantSum = q("fn_variant").collect().map(_.getLong(2)).sum
    val stringSum = q("fn_json").agg(sum(col("k"))).head.getLong(0)
    assert(variantSum == stringSum, s"$variantSum != $stringSum")
    val n = q("fn_variant").collect().map(_.getLong(1)).sum
    assert(n == q("fn_json").count())
  }

  test("join_asof matches a hand-computed user") {
    val rows = q("join_asof").filter(col("user_id") === 12).collect()
    // events of user 12 ordered by ts; every prior_purchase_ts must be the
    // max purchase ts strictly before the event's ts
    val ev = graft.core.Tables.events(spark, sf)
      .filter(col("user_id") === 12)
      .select("ts", "event_type").collect()
      .map(r => (r.getTimestamp(0), r.getString(1))).sortBy(_._1.getTime)
    rows.foreach { r =>
      val ts = r.getTimestamp(2)
      val expected = ev.filter { case (t, ty) => ty == "purchase" && t.getTime < ts.getTime }
        .map(_._1).sortBy(_.getTime).lastOption.orNull
      assert(r.getTimestamp(3) == expected, s"asof mismatch at $ts")
    }
  }
}
