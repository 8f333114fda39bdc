package graft.rel

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Det, Q, Tables}
import Tables.{liKey, liKeySql}

/** SURVEY.md §2.3 — joins.
  *
  * Scale posture (100 TB): dimension sides (`part`, `customer`, `nation`,
  * `region`) are always broadcast — no shuffle of the fact table for the
  * probe side; the only genuinely large⋈large case (`lineitem ⋈ orders`)
  * shuffles on the join key via sort-merge. The as-of join is composed
  * from a union + running `last(ignoreNulls)` window — one shuffle on the
  * partition key, no point-lookup loop (SURVEY.md §2.3 `join_asof`).
  */
object Joins {

  private val liKeyCols = liKey.map(col)

  def defs: Seq[(String, Q)] = Seq(
    "join_inner_broadcast" -> Q(
      s"""SELECT $liKeySql, p_name, p_brand FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |WHERE p_size < 10 ORDER BY $liKeySql""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d).filter(col("p_size") < 10)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .select(liKeyCols ++ Seq(col("p_name"), col("p_brand")): _*)
        .orderBy(liKeyCols: _*)
    },

    "join_inner_shuffle" -> Q(
      s"""SELECT $liKeySql, o_totalprice, o_orderdate FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_totalprice > 400000 ORDER BY $liKeySql""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
        .select(liKeyCols ++ Seq(col("o_totalprice"), col("o_orderdate")): _*)
        .orderBy(liKeyCols: _*)
    },

    "join_left" -> Q(
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice FROM customer
        |LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 300000
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey") && o("o_totalprice") > 300000, "left")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    },

    "join_right" -> Q(
      """SELECT o_orderkey, o_totalprice, c_custkey, c_name FROM orders
        |RIGHT JOIN customer ON o_custkey = c_custkey AND o_orderstatus = 'F'
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      o.join(c, o("o_custkey") === c("c_custkey") && o("o_orderstatus") === "F", "right")
        .select(col("o_orderkey"), col("o_totalprice"), col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    },

    "join_full" -> Q(
      """SELECT s_suppkey, s_nationkey, c_custkey, c_nationkey FROM supplier
        |FULL JOIN customer ON s_nationkey = c_nationkey AND c_acctbal > 9000
        |ORDER BY s_suppkey NULLS FIRST, c_custkey NULLS FIRST""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d)
      val c = Tables.customer(s, d)
      sup.join(c, sup("s_nationkey") === c("c_nationkey") && c("c_acctbal") > 9000, "full")
        .select(col("s_suppkey"), col("s_nationkey"), col("c_custkey"), col("c_nationkey"))
        .orderBy(col("s_suppkey").asc_nulls_first, col("c_custkey").asc_nulls_first)
    },

    "join_semi" -> Q(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    "join_anti" -> Q(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      // every customer has ≥1 order in this data, so anti-join against
      // high-value orders only (non-empty at every scale factor)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    "join_cross" -> Q(
      """SELECT r_regionkey, r_name, n_nationkey, n_name FROM region
        |CROSS JOIN nation ORDER BY r_regionkey, n_nationkey""".stripMargin) { (s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select("r_regionkey", "r_name", "n_nationkey", "n_name")
        .orderBy("r_regionkey", "n_nationkey")
    },

    // correlated LATERAL subquery through the SQL front door — Catalyst
    // decorrelates it to a plain aggregate+join (no per-row re-execution;
    // the same plan a hand-written join+groupBy would get). Customers
    // without orders are dropped by the inner join, deterministic.
    "join_lateral" -> Q(
      """SELECT c_custkey, c_mktsegment, l.n_orders, l.max_total
        |FROM customer c JOIN LATERAL (
        |  SELECT count(*) AS n_orders, max(o_totalprice) AS max_total
        |  FROM orders WHERE o_custkey = c.c_custkey) l ON l.n_orders > 0
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.reg(s, d)
      s.sql(
        """SELECT c_custkey, c_mktsegment, l.n_orders, l.max_total
          |FROM customer c JOIN LATERAL (
          |  SELECT count(*) AS n_orders, max(o_totalprice) AS max_total
          |  FROM orders WHERE o_custkey = c.c_custkey) l ON l.n_orders > 0
          |ORDER BY c_custkey""".stripMargin)
    },

    // co-located large⋈large join over BUCKETED tables: both sides are
    // written bucketBy(8, key) (one file per bucket, so the sortBy order
    // is honored too), and the join plans with ZERO exchange — at 100 TB
    // this is the standing answer to repeated fact⋈fact joins on a
    // stable key: pay the shuffle once at write time, never at read.
    // PlanShapeSpec asserts the SortMergeJoin has no shuffle below it.
    "join_bucketed" -> Q(
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         |  ${Det.dsumSql("o_totalprice")} AS sum_total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val (to, tc) = Bucketed.ensure(s, d)
      val o = s.table(to)
      val c = s.table(tc)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), Det.dsum(col("o_totalprice")).as("sum_total"))
        .orderBy("c_mktsegment")
    },

    "join_theta" -> Q(
      """SELECT s_suppkey, s_acctbal, c_custkey, c_acctbal FROM supplier
        |JOIN customer ON s_acctbal > c_acctbal AND c_acctbal > 5000
        |ORDER BY s_suppkey, c_custkey""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d)
      val c = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
      // pure non-equi predicate → BroadcastNestedLoopJoin with the small
      // (filtered) side broadcast
      sup.join(broadcast(c), sup("s_acctbal") > c("c_acctbal"))
        .select(col("s_suppkey"), col("s_acctbal"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("s_suppkey"), col("c_custkey"))
    },

    // salted join — the explicit skew-join treatment (the join twin of
    // agg_salted / zonal_skew): a 3-value join key would hash the whole
    // fact table onto 3 reducers. The fact side salts deterministically;
    // the small side replicates across all 16 salts; the join runs on
    // (key, salt) so each hot key spreads over 16 partitions. Result is
    // identical to the unsalted join (oracle = plain spelling).
    "join_salted" -> Q(
      s"""WITH dim AS (SELECT l_returnflag, ${Det.dsumSql("l_quantity")} AS flag_qty
         |            FROM lineitem GROUP BY l_returnflag)
         |SELECT l.l_returnflag, count(*) AS n, max(d.flag_qty) AS flag_qty
         |FROM lineitem l JOIN dim d ON l.l_returnflag = d.l_returnflag
         |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val dim = li.groupBy("l_returnflag")
        .agg(Det.dsum(col("l_quantity")).as("flag_qty"))
      val dimSalted = dim.crossJoin(
        s.range(16).select(col("id").cast("int").as("salt")))
      val factSalted = li.select(col("l_returnflag"),
        pmod(xxhash64(col("l_orderkey"), col("l_partkey")), lit(16)).cast("int").as("salt"))
      factSalted.join(dimSalted, Seq("l_returnflag", "salt"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), max("flag_qty").as("flag_qty"))
        .orderBy("l_returnflag")
    },

    // band join (|x − y| ≤ δ): the 100 TB spelling of a proximity
    // inequality join. Bucket both sides at width δ; each right row
    // probes its bucket and both neighbors (three equi-keys), then the
    // exact predicate filters — candidates per row are bounded by three
    // bucket occupancies, never the block size, and the join is a pure
    // hash/sort-merge equi-join (PlanShapeSpec asserts no NLJ). The
    // oracle is the plain range-predicate spelling — same result set.
    "join_band" -> Q(
      """SELECT a.c_custkey AS id1, b.c_custkey AS id2, a.c_nationkey AS nation,
        |  a.c_acctbal AS bal1, b.c_acctbal AS bal2
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        |  AND abs(a.c_acctbal - b.c_acctbal) <= 5
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).select("c_custkey", "c_nationkey", "c_acctbal")
      val a = c.withColumn("bucket", floor(col("c_acctbal") / 5.0).cast("long"))
      val b = c.withColumn("b0", floor(col("c_acctbal") / 5.0).cast("long"))
        .withColumn("bucket", explode(expr("array(b0 - 1, b0, b0 + 1)")))
      a.as("a").join(b.as("b"),
          col("a.c_nationkey") === col("b.c_nationkey")
            && col("a.bucket") === col("b.bucket")
            && col("a.c_custkey") < col("b.c_custkey")
            && abs(col("a.c_acctbal") - col("b.c_acctbal")) <= 5)
        .select(col("a.c_custkey").as("id1"), col("b.c_custkey").as("id2"),
          col("a.c_nationkey").as("nation"),
          col("a.c_acctbal").as("bal1"), col("b.c_acctbal").as("bal2"))
        .orderBy("id1", "id2")
    },

    "join_interval" -> Q(
      s"""SELECT $liKeySql, o_orderdate, l_shipdate FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |  AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
         |ORDER BY $liKeySql""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      // equi key + range predicate: Catalyst plans the equi part as the
      // join key and evaluates the interval containment as a post-filter
      li.join(o, li("l_orderkey") === o("o_orderkey")
          && li("l_shipdate") >= o("o_orderdate")
          && li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 90 DAY"))
        .select(liKeyCols ++ Seq(col("o_orderdate"), col("l_shipdate")): _*)
        .orderBy(liKeyCols: _*)
    },

    "join_asof" -> Q(
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |       CAST(p.ts AS TIMESTAMP) AS prior_purchase_ts
        |FROM events e ASOF LEFT JOIN
        |  (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts > p.ts
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      // As-of join composed Spark-first (SURVEY.md §2.3): union probes with
      // match candidates, one shuffle on the key, running last(ignoreNulls)
      // window. Probes sort before same-ts purchases (tag 0 < 1), so the
      // match is strictly prior — mirroring DuckDB's `e.ts > p.ts`.
      val ev = Tables.events(s, d)
      val probes = ev.select(col("event_id"), col("user_id"), col("ts"),
        lit(null).cast("timestamp").as("pts"), lit(0).as("tag"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(lit(null).cast("long").as("event_id"), col("user_id"), col("ts"),
          col("ts").as("pts"), lit(1).as("tag"))
      val w = Window.partitionBy("user_id").orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      probes.unionByName(purchases)
        .withColumn("prior_purchase_ts", last(col("pts"), ignoreNulls = true).over(w))
        .filter(col("tag") === 0)
        .select(col("event_id"), col("user_id"), col("ts"), col("prior_purchase_ts"))
        .orderBy("event_id")
    },

    // as-of with a MATCH TOLERANCE (round 8; pandas merge_asof's
    // `tolerance=` — sensor/trade enrichment where a stale prior row
    // must NOT match): same one-shuffle union-window shape as
    // join_asof, then the nearest prior is nulled when older than the
    // 30-minute gap. Post-filtering the NEAREST prior is exactly
    // "nearest within tolerance": if the nearest fails the gap, every
    // earlier one does too.
    "join_asof_tolerance" -> Q(
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |  CASE WHEN p.ts IS NOT NULL
        |        AND epoch_us(e.ts) - epoch_us(p.ts) <= 1800000000
        |       THEN CAST(p.ts AS TIMESTAMP) END AS recent_purchase_ts
        |FROM events e ASOF LEFT JOIN
        |  (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts > p.ts
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val probes = ev.select(col("event_id"), col("user_id"), col("ts"),
        lit(null).cast("timestamp").as("pts"), lit(0).as("tag"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(lit(null).cast("long").as("event_id"), col("user_id"), col("ts"),
          col("ts").as("pts"), lit(1).as("tag"))
      val w = Window.partitionBy("user_id").orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      probes.unionByName(purchases)
        .withColumn("prior", last(col("pts"), ignoreNulls = true).over(w))
        .filter(col("tag") === 0)
        .select(col("event_id"), col("user_id"), col("ts"),
          // Micros on BOTH engines (FIXTURES.md rule 3): cast-to-long
          // truncates to whole seconds, so a true 1800.5 s gap would
          // floor to 1800 here yet fail the oracle's full-precision
          // interval check. epoch_us/unix_micros see identical values.
          when(col("prior").isNotNull
              && unix_micros(col("ts")) - unix_micros(col("prior")) <= 1800000000L,
            col("prior")).as("recent_purchase_ts"))
        .orderBy("event_id")
    },

    "join_star" -> Q(
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE year(o_orderdate) = 1997
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(year(col("o_orderdate")) === 1997)
        .groupBy(col("r_name"), col("n_name"))
        .agg(Det.drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("r_name", "n_name")
    },

    // table RECONCILIATION diff (the CDC / data-audit staple: "what
    // changed between yesterday's snapshot and today's?"): one full
    // outer join on the key classifies every row as added / removed /
    // changed, unchanged rows drop out. Snapshots are derived from
    // orders by deterministic key arithmetic (B deletes keys %7=0,
    // bumps price by +1000 for keys %5=0 — an EXACT double add, so the
    // changed-test needs no rounding rule). At scale this is the
    // canonical co-partitioned shuffle join: both snapshots hash on the
    // key, no broadcast side, and the value compare runs post-join in
    // the same stage.
    "join_table_diff" -> Q(
      """WITH a AS (
        |  SELECT o_orderkey AS k, o_totalprice AS v FROM orders
        |  WHERE o_orderkey % 10 <> 0),
        |b AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000
        |         ELSE o_totalprice END AS v
        |  FROM orders WHERE o_orderkey % 7 <> 0)
        |SELECT coalesce(a.k, b.k) AS k,
        |  CASE WHEN a.k IS NULL THEN 'added'
        |       WHEN b.k IS NULL THEN 'removed' ELSE 'changed' END AS change,
        |  a.v AS old_v, b.v AS new_v
        |FROM a FULL JOIN b ON a.k = b.k
        |WHERE a.k IS NULL OR b.k IS NULL OR a.v <> b.v
        |ORDER BY k""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_orderkey") % 10 =!= 0)
        .select(col("o_orderkey").as("ka"), col("o_totalprice").as("va"))
      val b = o.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey").as("kb"),
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1000)
            .otherwise(col("o_totalprice")).as("vb"))
      a.join(b, col("ka") === col("kb"), "full_outer")
        .filter(col("ka").isNull || col("kb").isNull || col("va") =!= col("vb"))
        .select(coalesce(col("ka"), col("kb")).as("k"),
          when(col("ka").isNull, "added")
            .when(col("kb").isNull, "removed").otherwise("changed").as("change"),
          col("va").as("old_v"), col("vb").as("new_v"))
        .orderBy("k")
    }
  )
}
