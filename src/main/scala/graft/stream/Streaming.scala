package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Det.dsum

/** The Structured Streaming faces of the §2.10 operators: identical
  * transformations to [[Streams]] but over a streaming DataFrame
  * (`readStream` / MemoryStream), with watermarks and state. Exercised
  * in StreamSpec; in production these are `readStream → transform →
  * writeStream` with the state store co-partitioned on the group key.
  */
object Streaming {

  def tumbling(ev: DataFrame): DataFrame =
    ev.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_v"))

  def sliding(ev: DataFrame): DataFrame =
    ev.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))

  def session(ev: DataFrame): DataFrame =
    ev.withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  def dedupWithinWatermark(ev: DataFrame): DataFrame =
    ev.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))

  /** Streaming zonal stats (round 7): events → lattice cells → static
    * broadcast zone-envelope range join → tumbling per-zone agg. The
    * stream-static join carries no state; only the windowed agg does.
    */
  def zonalStats(ev: DataFrame, zones: DataFrame): DataFrame =
    ev.withWatermark("ts", "10 minutes")
      .withColumn("cell_x", col("user_id") % 64)
      .withColumn("cell_y", col("event_id") % 64)
      .join(broadcast(zones),
        col("cell_x").between(col("xmin"), col("xmax")) &&
        col("cell_y").between(col("ymin"), col("ymax")))
      .groupBy(window(col("ts"), "5 minutes"), col("zone_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_v"))
      .select(col("window.start").as("win_start"), col("zone_id"),
        col("n"), col("sum_v"))
}
