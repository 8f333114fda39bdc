package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract): split the
  * dedup_ngram_jaccard cold memo build (r22 — VERDICT r21 next-#3) into
  * its stages: arithMinhash signature agg, banded bucket-collect pair
  * enumeration, bigram-set build, the two merge-hinted verify joins,
  * and the eager localCheckpoint.
  */
object NgramProbe {
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
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ngramprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup")(graft.core.Tables.documents(spark, d).count())
    val docs = graft.core.Tables.documents(spark, d)
    (1 to 2).foreach { rep =>
      time(s"arithMinhash.count rep$rep")(
        graft.llm.Dedup.arithMinhash(docs).write.format("noop").mode("overwrite").save())
      time(s"memo build (arithCandJaccardPlan noop) rep$rep")(
        graft.llm.Dedup.arithCandJaccardPlan(spark, d)
          .write.format("noop").mode("overwrite").save())
      time(s"memo build + eager localCheckpoint rep$rep")(
        graft.llm.Dedup.arithCandJaccardPlan(spark, d).localCheckpoint(true).count())
    }
    locally {
      val df = graft.llm.Dedup.arithCandJaccardPlan(spark, d)
      df.collect()
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/ngram_final_plan.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
      println("[ngramprobe] final plan dumped")
    }
    spark.stop()
  }
}
