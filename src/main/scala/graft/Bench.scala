package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup (codegen compiler, shuffle + broadcast + window
    // machinery, parquet footer reader) so the first measured queries
    // aren't charged one-time session costs
    locally {
      import org.apache.spark.sql.functions.broadcast
      val r = spark.range(100000).selectExpr("id", "id % 100 AS k", "id % 7 AS p")
      r.selectExpr("sum(id)").collect()
      val dim = spark.range(100).selectExpr("id AS k", "id % 5 AS v")
      r.join(broadcast(dim), "k").groupBy("v").count().collect()
      r.selectExpr("p", "row_number() OVER (PARTITION BY p ORDER BY id) AS rn")
        .filter("rn <= 3").count()
      r.limit(1000).selectExpr("explode(sequence(1, 3)) AS e").count()
      r.limit(1000).groupBy("k").agg(org.apache.spark.sql.functions.collect_list("id").as("ids"))
        .selectExpr("explode(flatten(transform(sequence(1, 2), i -> transform(sequence(1, 2), j -> struct(i, j))))) AS s")
        .distinct().count()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
