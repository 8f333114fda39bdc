package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event row for the typed stateful path. */
case class Ev(event_id: Long, user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Output of the capped-spend processor. */
case class SpendOut(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
    value: Double, cum_after: Double, did_reset: Boolean)

/** Event row for the streaming bucket-dedup path. */
case class DedupEv(event_id: Long, user_id: Long, event_type: String,
    ts: java.sql.Timestamp)

/** SURVEY.md §2.10 `stream_stateful` — custom per-key running state:
  * cumulative spend per user that RESETS once it crosses a cap. The
  * reset makes it inexpressible as a plain window function (the state is
  * iterative), which is exactly the custom-state use case.
  *
  * ONE fold step ([[Stateful.step]]) drives both harnesses:
  *   - batch ([[Stateful.cappedSpendBatch]]): secondary sort —
  *     repartition on the key, sortWithinPartitions by (key, ts, id),
  *     stream the fold through `mapPartitions` with O(1) state. No group
  *     ever has to fit in memory: the 100 TB shape for ordered per-key
  *     folds.
  *   - streaming ([[Stateful.cappedSpendStreaming]]):
  *     `flatMapGroupsWithState`, the accumulator carried in GroupState
  *     across micro-batches.
  * StreamSpec asserts the two agree on identical input. All three code
  * paths order events by MICROSECOND timestamps + event_id
  * ([[Stateful.micros]]) — `Timestamp.getTime` truncates to
  * milliseconds and would fold same-millisecond events differently than
  * Spark's full-precision sort.
  */
object Stateful {

  val Cap = 500.0

  /** Full-precision event-time key; `getTime` alone is ms-truncated. */
  def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  /** One fold step: (accumulator, event) → (output row, next accumulator). */
  def step(acc0: Double, e: Ev): (SpendOut, Double) = {
    val acc = acc0 + e.value
    val reset = acc > Cap
    (SpendOut(e.event_id, e.user_id, e.ts, e.value, acc, reset),
      if (reset) 0.0 else acc)
  }

  /** The shared fold: returns outputs + final accumulator. */
  def run(rows: Iterator[Ev], init: Double): (Seq[SpendOut], Double) = {
    var acc = init
    val out = Seq.newBuilder[SpendOut]
    rows.foreach { e =>
      val (o, next) = step(acc, e)
      out += o
      acc = next
    }
    (out.result(), acc)
  }

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
          val (o, next) = step(acc, e)
          acc = next
          o
        }
      }
      .toDF()
  }

  /** The same operator on the Spark 4 arbitrary-state API
    * (`transformWithState`): typed ValueState in the RocksDB state store,
    * timers/TTL available when the semantics need them. Requires
    * `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider on the running query.
    */
  class CappedSpendProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, SpendOut] {
    @transient private var acc: org.apache.spark.sql.streaming.ValueState[Double] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      acc = getHandle.getValueState[Double]("acc",
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[SpendOut] = {
      val init = if (acc.exists()) acc.get() else 0.0
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      val (out, end) = run(sorted.iterator, init)
      acc.update(end)
      out.iterator
    }
  }

  def cappedSpendTws(ds: Dataset[Ev]): Dataset[SpendOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new CappedSpendProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** Streaming bucket-dedup (the `stream_dedup` operator as a REAL
    * streaming query): per (user_id, event_type), keep the first event
    * of each 10-minute event-time bucket. Seen buckets live in
    * ListState, so the dedup holds across micro-batches; within a batch
    * rows fold in (µs ts, event_id) order — the same deterministic
    * tiebreak as the batch window spelling, so the recursive oracle
    * replays it exactly.
    *
    * State is BOUNDED: after each batch the seen-bucket list is
    * rewritten to buckets within [[DedupRetainBuckets]] of the newest
    * bucket the key has observed — the same retention contract as
    * `dropDuplicatesWithinWatermark` (an event arriving later than the
    * retention window may re-emit, exactly as a watermark would have
    * dropped or re-admitted it). Without the rewrite, per-key state
    * grows by one entry per bucket forever (~52k entries/key/year).
    */
  val DedupRetainBuckets = 3 // 30 min of 10-min buckets

  class BucketDedupProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Long, String), DedupEv, DedupEv] {
    @transient private var seen: org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      seen = getHandle.getListState[Long]("seen",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: (Long, String), rows: Iterator[DedupEv],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[DedupEv] = {
      val known = scala.collection.mutable.Set.empty[Long]
      seen.get().foreach(known += _)
      val out = Vector.newBuilder[DedupEv]
      rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        val b = Math.floorDiv(micros(e.ts), 600000000L)
        if (!known(b)) {
          known += b
          out += e
        }
      }
      if (known.nonEmpty) {
        val floor = known.max - DedupRetainBuckets
        seen.clear()
        known.toArray.filter(_ >= floor).sorted.foreach(seen.appendValue)
      }
      out.result().iterator
    }
  }

  def bucketDedupTws(ds: Dataset[DedupEv]): Dataset[DedupEv] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new BucketDedupProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  def cappedSpendStreaming(ds: Dataset[Ev]): Dataset[SpendOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Double, SpendOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[Ev], state: GroupState[Double]) =>
          val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val (out, end) = run(sorted.iterator, state.getOption.getOrElse(0.0))
          state.update(end)
          out.iterator
      }
  }
}
