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
    // A/B the state fan-out: same query body with statePartitions 1
    // (keyspace-sized for sf0.1) via session conf — the Runner scopes
    // spark.sql.shuffle.partitions itself, so probe by overriding the
    // session value it clamps to... instead just report; the A/B runs
    // through the registered body which pins statePartitions=8.
    spark.stop()
  }
}
