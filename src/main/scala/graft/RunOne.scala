package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one registry query in isolation (same session shape as
  * Bench) and optionally dump its formatted plan.
  *
  *   sbt "runMain graft.RunOne <query_id> [sfDir] [explain]"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup so the timing isolates the query
    spark.range(100000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // comma-separated ids: each runs 3×, in order (to observe shared-
    // codegen warming between related queries)
    name.split(",").foreach { nm =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(nm)(spark, sfDir)
        val n = df.count()
        println(f"[runone] $nm run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
        if (i == 1 && args.contains("explain")) df.explain("formatted")
      }
    }
    spark.stop()
  }
}
