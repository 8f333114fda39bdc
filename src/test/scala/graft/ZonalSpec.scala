package graft

import org.apache.spark.sql.functions._
import graft.zonal.Cube

/** Zonal invariants (SURVEY.md §5.4) + plan-shape checks (§5.5). */
class ZonalSpec extends SparkSuite {

  test("rasterize plans as a broadcast HASH join (tile equi-join), not NLJ") {
    val plan = Cube.rasterize(Cube.cells(spark, sf), Cube.zones(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "rasterize degraded to NLJ")
  }

  test("rasterize agrees with the naive range join") {
    val cells = Cube.cells(spark, sf)
    val zones = Cube.zones(spark, sf)
    val fast = Cube.rasterize(cells, zones)
      .select("zone_id", "cell_x", "cell_y").distinct()
    val naive = cells.join(zones,
        col("cell_x").between(col("xmin"), col("xmax"))
          && col("cell_y").between(col("ymin"), col("ymax")))
      .select("zone_id", "cell_x", "cell_y").distinct()
    assert(fast.exceptAll(naive).count() == 0 && naive.exceptAll(fast).count() == 0)
  }

  test("per-zone sums over disjoint zone-cell pairs never exceed the global sum x zone count") {
    val total = Cube.cells(spark, sf).agg(sum("value")).head.getDouble(0)
    val perZone = q("zonal_stats_basic").agg(sum("sum_v")).head.getDouble(0)
    // zones overlap (general case): per-zone total can exceed global, but
    // is bounded by zones-per-cell max (each cell is in at most 4 zones
    // of 8x8 envelopes on this layout)
    assert(perZone <= total * 4 + 1e-6)
  }

  test("cells in zero zones exist (envelopes do not tile the full grid)") {
    val assigned = q("zonal_rasterize").select("cell_x", "cell_y").distinct().count()
    val allCells = Cube.cells(spark, sf).select("cell_x", "cell_y").distinct().count()
    assert(assigned < allCells, "every cell matched a zone — overlap trap not exercised")
  }

  test("categorical counts sum to basic n_cells per zone") {
    val cat = q("zonal_stats_categorical")
      .withColumn("total", col("A") + col("N") + col("R"))
      .select("zone_id", "total")
    val basic = q("zonal_stats_basic").select("zone_id", "n_cells")
    val joined = cat.join(basic, "zone_id")
      .filter(col("total") =!= col("n_cells"))
    assert(joined.count() == 0)
  }

  test("histogram bucket counts sum to n_cells per zone") {
    val hist = q("zonal_hist").groupBy("zone_id").agg(sum("n").as("total"))
    val basic = q("zonal_stats_basic").select("zone_id", "n_cells")
    assert(hist.join(basic, "zone_id").filter(col("total") =!= col("n_cells")).count() == 0)
  }
}
