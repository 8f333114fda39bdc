package graft.rel

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.{Q, Tables}

/** SURVEY.md §2.5 — window functions.
  *
  * Windowed SUM/AVG of doubles is NOT cross-engine-deterministic even
  * with a fixed frame (DuckDB evaluates window aggregates over a segment
  * tree — different addition order than a running left fold), so every
  * windowed money aggregate applies the DECIMAL(18,2) pattern inside the
  * frame (exact, order-free) and casts the result back to DOUBLE.
  */
object Windows {

  def defs: Seq[(String, Q)] = Seq(
    "win_row_number" -> Q(
      """SELECT o_orderkey, o_orderstatus,
        |  row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS rn
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), row_number().over(w).as("rn"))
        .orderBy("o_orderkey")
    },

    // rank/percent_rank/cume_dist share ties, but ntile assigns buckets by
    // ROW POSITION — tied rows straddling a bucket boundary get engine-
    // dependent quartiles unless the ntile window's order is total, so it
    // gets its own fully-deterministic window (…, o_orderkey)
    "win_rank" -> Q(
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  rank() OVER w AS rk, dense_rank() OVER w AS drk,
        |  percent_rank() OVER w AS prk,
        |  ntile(4) OVER wt AS quartile,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice),
        |       wt AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
      val wt = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          rank().over(w).as("rk"), dense_rank().over(w).as("drk"),
          percent_rank().over(w).as("prk"), ntile(4).over(wt).as("quartile"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_orderkey")
    },

    "win_lag_lead" -> Q(
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  CAST(lag(ts, 1) OVER w AS TIMESTAMP) AS prev_ts
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          lag(col("ts"), 1).over(w).as("prev_ts"))
        .orderBy("event_id")
    },

    "win_running" -> Q(
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double").as("running_total"))
        .orderBy("o_orderkey")
    },

    "win_moving" -> Q(
      """SELECT o_orderkey, o_custkey,
        |  (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |     / COUNT(*) OVER w) AS moving_avg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey").rowsBetween(-3, 0)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          (sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double")
            / count(lit(1)).over(w)).as("moving_avg"))
        .orderBy("o_orderkey")
    },

    "win_range_frame" -> Q(
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  COUNT(*) OVER w AS n_in_band,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS band_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
        |             RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
        .rangeBetween(-50000, 0)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_in_band"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double").as("band_total"))
        .orderBy("o_orderkey")
    },

    "win_range_time" -> Q(
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  COUNT(*) OVER w AS n_last_30m,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_last_30m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
        |             RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      // event-time RANGE frame (trailing 30-minute window per user) —
      // interval frames are SQL-only in Spark, so this rides the E2 front
      // door; ts is already µs-normalized by Tables.reg
      Tables.reg(s, d)
      s.sql(
        """SELECT event_id, user_id, ts,
          |  COUNT(*) OVER w AS n_last_30m,
          |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_last_30m
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts
          |             RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
          |ORDER BY event_id""".stripMargin)
    },

    "win_first_last" -> Q(
      """SELECT o_orderkey, o_orderstatus,
        |  first_value(o_orderkey) OVER w AS cheapest_key,
        |  last_value(o_orderkey) OVER w AS priciest_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          first(col("o_orderkey")).over(w).as("cheapest_key"),
          last(col("o_orderkey")).over(w).as("priciest_key"))
        .orderBy("o_orderkey")
    },

    // distribution ranks: ntile bucketing + percent_rank + cume_dist
    // over a totally-ordered frame (tie-broken by key, so both engines
    // rank identically); round-6 on the two ratio ranks absorbs the
    // division's last-ulp variance.
    "win_ntile" -> Q(
      """SELECT o_orderkey,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy("o_orderkey")
    }
  )
}
