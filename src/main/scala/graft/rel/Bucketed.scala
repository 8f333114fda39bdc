package graft.rel

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.core.Tables

/** Bucketed-table support for the co-located join path (`join_bucketed`,
  * SURVEY.md §2.3): orders and customer are saved `bucketBy(8, key)`
  * into the session warehouse, pre-repartitioned on the bucket key so
  * each bucket is exactly ONE file — which both lets the scan honor the
  * `sortBy` order (sorted-bucket reads require one file per bucket) and
  * mirrors how a production pipeline would lay the table out once and
  * join shuffle-free forever after.
  *
  * Written at most once per (session, sfDir) per JVM; `overwrite` mode
  * clobbers any stale layout from a previous run.
  */
object Bucketed {

  val NumBuckets = 8

  private val done =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  /** Ensure the bucketed twins exist; returns (ordersTable, customerTable). */
  def ensure(s: SparkSession, d: String): (String, String) = {
    val sf = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9]", "_")
    val to = s"graft_orders_bucketed_$sf"
    val tc = s"graft_customer_bucketed_$sf"
    if (done.add((s, d))) {
      // a previous JVM may have left the table location behind without a
      // catalog entry (in-memory catalog dies with the session) — drop
      // both the catalog entry and any orphaned warehouse directory
      Seq(to, tc).foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(
          new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath, t)
        if (loc.exists()) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(loc.toPath).sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
      Tables.orders(s, d)
        .repartition(NumBuckets, col("o_custkey"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(NumBuckets, "o_custkey").sortBy("o_custkey")
        .saveAsTable(to)
      Tables.customer(s, d)
        .repartition(NumBuckets, col("c_custkey"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(NumBuckets, "c_custkey").sortBy("c_custkey")
        .saveAsTable(tc)
    }
    (to, tc)
  }
}
