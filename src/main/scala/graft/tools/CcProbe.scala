package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch A/B main (not part of the driver contract): per-round cost
  * of the dedup_cluster CC fixpoint under candidate plan shapes
  * (r22 — VERDICT r21 next-#2). Variants:
  *
  *   base      — the shipped loop verbatim (AQE on, auto join planning)
  *   noaqe     — AQE disabled inside the loop + explicit broadcast hints
  *               on the edge and jump joins (what AQE's runtime demotion
  *               produces, without per-stage re-planning latency)
  *   bcast     — AQE on + explicit broadcast hints (skip the demotion
  *               discovery, keep AQE coalescing)
  *
  * Prints wall time, rounds, and Spark job count per variant; each runs
  * on the REAL tau=0.3 embedding near graph.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ext.Ext.register(spark)
    val sc = spark.sparkContext

    val pairs = graft.llm.Sim.nearPairs(spark, d, 0.3)
      .select(col("id1").as("x"), col("id2").as("y"))
    val edges0 = pairs.union(pairs.select(col("y").as("x"), col("x").as("y")))
    println("n_edges=" + edges0.count())
    val nodes = graft.core.Tables.embeddings(spark, d)
      .select(col("vec_id").as("node"))

    var jobs0 = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        synchronized { jobs0 += 1 }
    }
    sc.addSparkListener(listener)

    def runVariant(tag: String, aqe: Boolean, hints: Boolean): Unit = {
      val partsKey = "spark.sql.shuffle.partitions"
      val sessionParts = spark.conf.get(partsKey).toInt
      graft.core.SessionConf.scoped(spark,
        partsKey -> math.min(8, sessionParts).toString,
        "spark.sql.adaptive.enabled" -> aqe.toString) {
        def pin(df: DataFrame): DataFrame = df.localCheckpoint(false)
        val t0 = System.nanoTime()
        val jStart = jobs0
        val e0 = pin(edges0.select(col("x"), col("y")))
        val e = if (hints) broadcast(e0) else e0
        val nbrMin = e0.groupBy(col("x").as("node")).agg(min(col("y")).as("nb"))
        var labels = pin(nodes.select(col("node"), col("node").as("comp"))
          .join(nbrMin, Seq("node"))
          .select(col("node"), least(col("comp"), col("nb")).as("comp")))
        def sig(df: DataFrame): (java.math.BigDecimal, Long) = {
          val r = df.agg(sum(col("comp").cast(DecimalType(38, 0))),
            count(lit(1))).head
          (r.getDecimal(0), r.getLong(1))
        }
        val (s0, nTouched) = sig(labels)
        var prevSig = s0
        spark.conf.set(partsKey, math.max(1L,
          math.min(sessionParts.toLong, nTouched / 65536L + 1L)).toString)
        var iter = 0
        var converged = false
        def step(l: DataFrame): DataFrame = {
          val prop = l.join(e, l("node") === e("x"))
            .select(col("y").as("node"), col("comp"))
          val cur = l.union(prop).groupBy("node").agg(min("comp").as("comp"))
          val jump0 = cur.select(col("node").as("pn"), col("comp").as("pc"))
          val jump = if (hints) broadcast(jump0) else jump0
          cur.join(jump, cur("comp") === jump("pn"))
            .select(cur("node"), col("pc").as("comp"))
        }
        while (!converged && iter < 50) {
          val next = pin(step(labels))
          val s = sig(next)._1
          converged = s == prevSig
          prevSig = s
          labels = next
          iter += 1
        }
        val nComp = labels.select("comp").distinct().count()
        println(f"[ccprobe] $tag%-6s aqe=$aqe hints=$hints: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s, $iter rounds, " +
          f"${jobs0 - jStart} jobs, $nComp comps, touched $nTouched")
      }
    }

    // warm once (codegen, memo), then 2 timed reps per variant
    runVariant("warm", aqe = true, hints = false)
    for (_ <- 1 to 2) runVariant("base", aqe = true, hints = false)
    for (_ <- 1 to 2) runVariant("bcast", aqe = true, hints = true)
    for (_ <- 1 to 2) runVariant("noaqe", aqe = false, hints = true)
    spark.stop()
  }
}
