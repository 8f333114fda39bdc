package graft.zonal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.{Q, Tables}
import graft.core.Det.{dsum, dsumSql}

/** SURVEY.md §2.9 — the zonal-statistics operator surface (the
  * reference's native capability, README.md:2, re-expressed Spark-first).
  *
  * Every operator is rasterize (tile equi-join, [[Cube.rasterize]])
  * followed by a grouped aggregation — two-phase HashAggregate, so the
  * shuffle carries per-partition partials, never raw cells.
  */
object Zonal {

  /** User API: per-zone basic statistics of `value`. */
  def stats(cellsDf: DataFrame, zonesDf: DataFrame): DataFrame =
    Cube.rasterize(cellsDf, zonesDf)
      .groupBy(col("zone_id"))
      .agg(count(lit(1)).as("n_cells"),
        dsum(col("value")).as("sum_v"),
        (dsum(col("value")) / count(lit(1))).as("mean_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        round(stddev_samp(col("value")), 4).as("sd_v"))

  private val statsBodySql = Cube.withSql(
    s"""SELECT zone_id, count(*) AS n_cells,
       |  ${dsumSql("value")} AS sum_v,
       |  (${dsumSql("value")} / count(*)) AS mean_v,
       |  min(value) AS min_v, max(value) AS max_v,
       |  round(stddev_samp(value), 4) AS sd_v
       |${Cube.RasterizeJoinSql}
       |GROUP BY zone_id ORDER BY zone_id""".stripMargin)

  def defs: Seq[(String, Q)] = Seq(
    "scan_cells" -> Q(
      Cube.withSql(
        """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
          |  cell_x, cell_y, value, category, t, w
          |FROM cells
          |ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber, value""".stripMargin)) { (s, d) =>
      // cells rename l_extendedprice → value; the verified-unique order
      // key is the liKey with `value` standing in for the price column
      Cube.cells(s, d)
        .orderBy(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("value"))
    },

    "scan_zones" -> Q(
      Cube.withSql("SELECT * FROM zones ORDER BY zone_id")) { (s, d) =>
      Cube.zones(s, d).orderBy("zone_id")
    },

    "zonal_fishnet" -> Q(
      Cube.withSql(
        s"""SELECT cell_x // 8 AS tile_x, cell_y // 8 AS tile_y,
           |  count(*) AS n_cells, ${dsumSql("value")} AS sum_v
           |FROM cells GROUP BY tile_x, tile_y ORDER BY tile_x, tile_y""".stripMargin)) { (s, d) =>
      Cube.withTiles(Cube.cells(s, d))
        .groupBy(col("tile_x"), col("tile_y"))
        .agg(count(lit(1)).as("n_cells"), dsum(col("value")).as("sum_v"))
        .orderBy("tile_x", "tile_y")
    },

    "zonal_rasterize" -> Q(
      Cube.withSql(
        s"""SELECT DISTINCT zone_id, cell_x, cell_y
           |${Cube.RasterizeJoinSql}
           |ORDER BY zone_id, cell_x, cell_y""".stripMargin)) { (s, d) =>
      Cube.rasterize(Cube.cells(s, d), Cube.zones(s, d))
        .select("zone_id", "cell_x", "cell_y").distinct()
        .orderBy("zone_id", "cell_x", "cell_y")
    },

    "join_spatial_zones" -> Q(
      Cube.withSql(
        s"""SELECT zone_id, cell_x, cell_y, count(*) AS n_rows
           |${Cube.RasterizeJoinSql}
           |GROUP BY zone_id, cell_x, cell_y
           |ORDER BY zone_id, cell_x, cell_y""".stripMargin)) { (s, d) =>
      Cube.rasterize(Cube.cells(s, d), Cube.zones(s, d))
        .groupBy("zone_id", "cell_x", "cell_y")
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("zone_id", "cell_x", "cell_y")
    },

    "zonal_stats_basic" -> Q(statsBodySql) { (s, d) =>
      stats(Cube.cells(s, d), Cube.zones(s, d)).orderBy("zone_id")
    },

    "zonal_stats_categorical" -> Q(
      Cube.withSql(
        s"""SELECT zone_id,
           |  count(CASE WHEN category = 'A' THEN 1 END) AS A,
           |  count(CASE WHEN category = 'N' THEN 1 END) AS N,
           |  count(CASE WHEN category = 'R' THEN 1 END) AS R
           |${Cube.RasterizeJoinSql}
           |GROUP BY zone_id ORDER BY zone_id""".stripMargin)) { (s, d) =>
      val piv = Cube.rasterize(Cube.cells(s, d), Cube.zones(s, d))
        .groupBy(col("zone_id"))
        .pivot("category", Seq("A", "N", "R"))
        .count()
      piv.select(col("zone_id") +: Seq("A", "N", "R").map(c => coalesce(col(c), lit(0L)).as(c)): _*)
        .orderBy("zone_id")
    },

    "zonal_stats_weighted" -> Q(
      Cube.withSql(
        s"""SELECT zone_id,
           |  (CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(w AS DECIMAL(18,2))) AS DOUBLE)
           |     / ${dsumSql("w")}) AS weighted_mean,
           |  ${dsumSql("w")} AS sum_w
           |${Cube.RasterizeJoinSql}
           |GROUP BY zone_id ORDER BY zone_id""".stripMargin)) { (s, d) =>
      // coverage-fraction-weighted mean: all arithmetic in exact decimal,
      // one final IEEE divide (identical on both engines)
      val vd = col("value").cast(DecimalType(18, 2))
      val wd = col("w").cast(DecimalType(18, 2))
      Cube.rasterize(Cube.cells(s, d), Cube.zones(s, d))
        .groupBy(col("zone_id"))
        .agg((sum(vd * wd).cast("double") / sum(wd).cast("double")).as("weighted_mean"),
          sum(wd).cast("double").as("sum_w"))
        .orderBy("zone_id")
    },

    "zonal_hist" -> Q(
      Cube.withSql(
        """SELECT zone_id, CAST(floor(value / 20000) AS INTEGER) AS bucket, count(*) AS n
          |FROM cells JOIN zones
          |  ON cell_x BETWEEN xmin AND xmax AND cell_y BETWEEN ymin AND ymax
          |GROUP BY zone_id, bucket ORDER BY zone_id, bucket""".stripMargin)) { (s, d) =>
      // fixed-width histogram in long form (bucket → count); floor, not
      // cast — DuckDB's double→int cast rounds while Spark truncates
      Cube.rasterize(Cube.cells(s, d), Cube.zones(s, d))
        .withColumn("bucket", floor(col("value") / 20000).cast("int"))
        .groupBy("zone_id", "bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("zone_id", "bucket")
    },

    "zonal_timeseries" -> Q(
      Cube.withSql(
        s"""SELECT zone_id, year(t) AS yr, count(*) AS n_cells, ${dsumSql("value")} AS sum_v
           |${Cube.RasterizeJoinSql}
           |GROUP BY zone_id, yr ORDER BY zone_id, yr""".stripMargin)) { (s, d) =>
      Cube.rasterize(Cube.cells(s, d), Cube.zones(s, d))
        .groupBy(col("zone_id"), year(col("t")).as("yr"))
        .agg(count(lit(1)).as("n_cells"), dsum(col("value")).as("sum_v"))
        .orderBy("zone_id", "yr")
    },

    "zonal_pruned" -> Q(
      Cube.withSql(
        s"""SELECT zone_id, count(*) AS n_cells, ${dsumSql("value")} AS sum_v
           |FROM cells JOIN zones
           |  ON cell_x BETWEEN xmin AND xmax AND cell_y BETWEEN ymin AND ymax
           |WHERE zone_id < 5
           |GROUP BY zone_id ORDER BY zone_id""".stripMargin)) { (s, d) =>
      // zone-subset query over the tile-partitioned store: scans ONLY the
      // tiles intersecting the zones' envelopes, via dynamic partition
      // pruning — the tile set never leaves the plan (ExtSpec asserts
      // both the DPP expression and the scanned-file reduction)
      val store = ZonalStore.ensureTiled(s, d)
      val zonesF = Cube.zones(s, d).filter(col("zone_id") < 5)
      ZonalStore.prunedStatsDynamic(s, store, zonesF).orderBy("zone_id")
    },

    // one-pass map-form histogram via the typed Histogram Aggregator
    // (buffer = Map(bucket → count), shuffled as partials); equivalence
    // with the long-form zonal_hist is asserted in ExtSpec. The map is
    // serialized to a bucket-sorted "b:n" string so the driver's checker
    // can hash it — which also makes it oracle-checkable (the DuckDB
    // spelling rebuilds the same string from a long-form group-by).
    "zonal_hist_map" -> Q(
      Cube.withSql(
        """SELECT zone_id,
          |  string_agg(bucket || ':' || n, ',' ORDER BY bucket) AS hist_s
          |FROM (SELECT zone_id, CAST(floor(value / 20000.0) AS INTEGER) AS bucket, count(*) AS n
          |      FROM cells JOIN zones
          |        ON cell_x BETWEEN xmin AND xmax AND cell_y BETWEEN ymin AND ymax
          |      GROUP BY zone_id, bucket)
          |GROUP BY zone_id ORDER BY zone_id""".stripMargin)) { (s, d) =>
      val hist = org.apache.spark.sql.functions.udaf(
        new graft.ext.Aggregators.Histogram(20000.0))
      Cube.rasterize(Cube.cells(s, d), Cube.zones(s, d))
        .groupBy(col("zone_id"))
        .agg(hist(col("value")).as("hist"))
        .select(col("zone_id"), expr(
          """concat_ws(',', transform(sort_array(map_keys(hist)),
            |  k -> concat(cast(k AS string), ':', cast(element_at(hist, k) AS string))))""".stripMargin)
          .as("hist_s"))
        .orderBy("zone_id")
    },

    "zonal_multiband" -> Q(
      Cube.withSql(
        s"""SELECT zone_id, count(*) AS n_cells,
           |  ${dsumSql("value")} AS sum_b1,
           |  (${dsumSql("value")} / count(*)) AS mean_b1,
           |  ${dsumSql("w")} AS sum_b2, min(w) AS min_b2, max(w) AS max_b2
           |${Cube.RasterizeJoinSql}
           |GROUP BY zone_id ORDER BY zone_id""".stripMargin)) { (s, d) =>
      // several stats over several bands in ONE aggregation pass — one
      // shuffle of per-partition partials, however many bands
      Cube.rasterize(Cube.cells(s, d), Cube.zones(s, d))
        .groupBy(col("zone_id"))
        .agg(count(lit(1)).as("n_cells"),
          dsum(col("value")).as("sum_b1"),
          (dsum(col("value")) / count(lit(1))).as("mean_b1"),
          dsum(col("w")).as("sum_b2"),
          min(col("w")).as("min_b2"),
          max(col("w")).as("max_b2"))
        .orderBy("zone_id")
    }
  )
}
