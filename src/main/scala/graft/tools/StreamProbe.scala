package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch profiling main (not part of the driver contract): §1.2
  * job-floor attribution for the streaming micro-batch family
  * (r22 — VERDICT r21 next-#7), on the representative
  * `stream_stream_left`. Captures every micro-batch's durationMs
  * breakdown (triggerExecution, getBatch, queryPlanning, addBatch,
  * walCommit, commitOffsets) and the state-store commit metrics, so the
  * "is it machinery floor or state fan-out?" question is answered from
  * the engine's own numbers.
  */
object StreamProbe {
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

    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        println(s"[streamprobe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${dur}")
        p.stateOperators.foreach { so =>
          println(s"[streamprobe]   state: op=${so.operatorName} " +
            s"rowsTotal=${so.numRowsTotal} commitTimeMs=${so.commitTimeMs} " +
            s"memoryUsedBytes=${so.memoryUsedBytes} " +
            s"partitions=${so.customMetrics.getOrDefault("numStateStoreInstances", -1L)}")
        }
      }
    }
    spark.streams.addListener(listener)

    // warm the streaming machinery once on a trivial stream (the Bench
    // warmup shape), then run the representative query 3x
    val qname = "stream_stream_left"
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(qname)(spark, d).count()
      println(f"[streamprobe] $qname run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // A/B the state fan-out: the same join body at statePartitions 1
    // vs the registered 8 — answers whether the commit fan-out (8
    // partitions x 4 join state stores x 2 batches of files) is a real
    // lever or the floor is the machinery itself.
    import org.apache.spark.sql.functions._
    def body(n: Int, i: Int): Unit = {
      val t0 = System.nanoTime()
      spark.sql(s"DROP TABLE IF EXISTS probe_ssl_$n$i")
      val clicks = graft.stream.Runner.eventsStream(spark, d)
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
        .withWatermark("click_ts", "10 minutes")
      val purchases = graft.stream.Runner.eventsStream(spark, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "10 minutes")
      val out = graft.stream.Runner.runToTable(spark, s"probe_ssl_$n$i",
          statePartitions = Some(n)) {
        clicks.join(purchases,
            col("user_id") === col("p_user")
              && col("purchase_ts") >= col("click_ts")
              && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTE"),
            "left_outer")
          .select(col("click_id"), col("purchase_id"), col("user_id"),
            col("click_ts"), col("purchase_ts"))
          .writeStream.format("memory").queryName(s"probe_ssl_$n$i")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      }
      val rows = out.count()
      println(f"[streamprobe] body statePartitions=$n run$i: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    (1 to 2).foreach(i => body(8, i))
    (1 to 2).foreach(i => body(1, i))
    (1 to 2).foreach(i => body(2, i))
    spark.stop()
  }
}
