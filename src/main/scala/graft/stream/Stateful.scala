package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event row for the typed stateful path. */
case class Ev(event_id: Long, user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Output of the capped-spend processor. */
case class SpendOut(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
    value: Double, cum_after: Double, did_reset: Boolean)

/** SURVEY.md §2.10 `stream_stateful` — custom per-key running state:
  * cumulative spend per user that RESETS once it crosses a cap. The
  * reset makes it inexpressible as a plain window function (the state is
  * iterative), which is exactly the `flatMapGroupsWithState` use case.
  *
  * The same fold runs in two harnesses:
  *   - batch: `groupByKey.flatMapGroups` with an in-group sort
  *     (scale note: for huge groups use repartition + sortWithinPartitions
  *     + mapPartitions instead of the in-memory sort)
  *   - streaming: `flatMapGroupsWithState`, carrying the accumulator in
  *     GroupState across micro-batches
  * StreamSpec asserts they agree on identical input.
  */
object Stateful {

  val Cap = 500.0

  /** The shared fold: returns outputs + final accumulator. */
  def run(rows: Iterator[Ev], init: Double): (Seq[SpendOut], Double) = {
    var acc = init
    val out = Seq.newBuilder[SpendOut]
    rows.foreach { e =>
      acc += e.value
      val reset = acc > Cap
      out += SpendOut(e.event_id, e.user_id, e.ts, e.value, acc, reset)
      if (reset) acc = 0.0
    }
    (out.result(), acc)
  }

  /** Batch twin via secondary sort: repartition on the key, sort each
    * partition by (key, ts, id), stream the fold over consecutive
    * same-key runs in `mapPartitions`. Unlike `flatMapGroups` + an
    * in-memory sort, no group ever has to fit in memory — the 100 TB
    * shape for ordered per-key folds.
    */
  def cappedSpendBatch(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select("event_id", "user_id", "ts", "value").as[Ev]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .mapPartitions { it =>
        // rows arrive clustered by user and ordered by (ts, id); fold
        // with O(1) state, resetting the accumulator at key boundaries
        var started = false
        var curKey = 0L
        var acc = 0.0
        it.map { e =>
          if (!started || e.user_id != curKey) {
            started = true; curKey = e.user_id; acc = 0.0
          }
          acc += e.value
          val reset = acc > Cap
          val o = SpendOut(e.event_id, e.user_id, e.ts, e.value, acc, reset)
          if (reset) acc = 0.0
          o
        }
      }
      .toDF()
  }

  def cappedSpendStreaming(ds: Dataset[Ev]): Dataset[SpendOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Double, SpendOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[Ev], state: GroupState[Double]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val (out, end) = run(sorted.iterator, state.getOption.getOrElse(0.0))
          state.update(end)
          out.iterator
      }
  }
}
