package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract): stage
  * split of dedup_substring (r22 — VERDICT r21 next-#6). Times each
  * pipeline prefix with the noop sink so the marginal cost of every
  * stage is visible.
  */
object SubstrProbe {
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
      println(f"[substrprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val n = 50
    val docs = graft.core.Tables.documents(spark, d)
    time("warmup")(docs.count())
    (1 to 2).foreach { rep =>
      val base = docs.filter(length(col("text")) >= n)
        .select(col("doc_id"), col("text"))
      val offs = base.select(col("doc_id"),
          posexplode(expr(s"poly_hash_shingles(text, $n)")))
        .select(col("doc_id"), col("pos").as("off"), col("col").as("h"))
      time(s"1 offs (shingle explode) rep$rep")(noop(offs))
      val dupH = offs.groupBy("h").agg(count(lit(1)).as("hn"))
        .filter(col("hn") >= 2).select("h")
      time(s"2 dupH (hash count>=2) rep$rep")(noop(dupH))
      val candOffs = offs.join(dupH, "h").select("doc_id", "off")
      time(s"3 candOffs (join back) rep$rep")(noop(candOffs))
      val cand = candOffs.join(base, "doc_id")
        .select(col("doc_id"), col("off"),
          expr(s"substring(text, off + 1, $n)").as("sh"))
      time(s"4 cand (substring extract) rep$rep")(noop(cand))
      val salt = pmod(xxhash64(col("doc_id"), col("off")), lit(graft.llm.Dedup.ConfirmSalts))
      val confirmed = cand.groupBy(col("sh"), salt.as("salt"))
        .agg(count(lit(1)).as("pc"))
        .groupBy("sh").agg(sum(col("pc")).as("sn"))
        .filter(col("sn") >= 2).select("sh")
      time(s"5 confirmed (salted sh count) rep$rep")(noop(confirmed))
      val marked = cand.join(confirmed, "sh").select("doc_id", "off")
      time(s"6 marked (rejoin) rep$rep")(noop(marked))
      time(s"7 full substringSpans rep$rep")(noop(graft.llm.Dedup.substringSpans(docs, n)))
      time(s"8 full dedup_substring query rep$rep")(
        noop(graft.SparkEntry.queries("dedup_substring")(spark, d)))
    }
    spark.stop()
  }
}
