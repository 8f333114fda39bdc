package graft

/** Plan-shape assertions (SURVEY.md §5.5): the optimizer work we rely on
  * at 100 TB must actually appear in the physical plans — pushed
  * filters, pruned read schemas, the right join strategies, top-k
  * without a global sort, two-phase aggregation, codegen spans.
  */
class PlanShapeSpec extends SparkSuite {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("filter predicates are pushed into the parquet scan") {
    // the toString rendering truncates PushedFilters — read the scan
    // node's metadata directly
    val scans = q("filter_compare").queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val pushed = scans.map(_.metadata("PushedFilters")).mkString
    assert(pushed.contains("GreaterThan(l_quantity"), s"no pushed quantity filter in: $pushed")
  }

  test("column pruning reaches the scan (ReadSchema excludes unused columns)") {
    val p = plan("project_select")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("l_returnflag"),
      s"unused column not pruned: $readSchema")
  }

  test("dimension joins broadcast; fact-fact joins sort-merge; theta NLJ") {
    assert(plan("join_inner_broadcast").contains("BroadcastHashJoin"))
    assert(plan("join_inner_shuffle").contains("SortMergeJoin"))
    assert(plan("join_theta").contains("BroadcastNestedLoopJoin"))
  }

  test("limit_n plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("limit_n")
    assert(p.contains("TakeOrderedAndProject"), p.take(1000))
  }

  test("grouped aggregation is two-phase (partial before the shuffle)") {
    val p = plan("agg_basic")
    assert(p.contains("partial_"), s"no partial aggregation in:\n${p.take(2000)}")
  }

  test("subquery predicates decorrelate to semi-joins") {
    val p = plan("filter_subquery")
    assert(p.contains("LeftSemi"), p.take(2000))
  }

  test("the zonal kernel stays inside whole-stage codegen") {
    // AQE shows codegen markers only once the final plan exists — execute
    val df = q("zonal_stats_basic")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"no WholeStageCodegen span in:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"), "rasterize not a broadcast hash join")
  }

  test("asof join shuffles once on the partition key (no join at all)") {
    val p = plan("join_asof")
    assert(!p.contains("SortMergeJoin") && !p.contains("NestedLoop"),
      "asof should be window-based, not a physical join")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p.take(1500))
  }
}
