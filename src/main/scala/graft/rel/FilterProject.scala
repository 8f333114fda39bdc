package graft.rel

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables}
import Tables.{liKey, liKeySql}

/** SURVEY.md §2.2 — projection, filter, predicates.
  *
  * All BUILTIN: the point is that each predicate shape reaches the
  * Parquet scan as a pushed filter (asserted in PlanShapeSpec). Every
  * query orders by a verified-unique key for hash-match determinism.
  */
object FilterProject {

  def defs: Seq[(String, Q)] = Seq(
    "project_select" -> Q(
      s"""SELECT $liKeySql, l_extendedprice * (1 - l_discount) AS revenue,
         |       l_quantity + 0.5 AS qty_adj
         |FROM lineitem ORDER BY $liKeySql""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("l_extendedprice"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          (col("l_quantity") + lit(0.5)).as("qty_adj"))
        .orderBy(liKey.map(col): _*)
    },

    "filter_compare" -> Q(
      s"""SELECT $liKeySql, l_quantity, l_shipdate FROM lineitem
         |WHERE l_quantity > 30 AND l_extendedprice <= 50000
         |  AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_discount <> 0.02
         |ORDER BY $liKeySql""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 30 && col("l_extendedprice") <= 50000
          && col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
          && col("l_discount") =!= 0.02)
        .select((liKey ++ Seq("l_quantity", "l_shipdate")).map(col): _*)
        .orderBy(liKey.map(col): _*)
    },

    "filter_bool" -> Q(
      s"""SELECT $liKeySql, l_returnflag, l_linestatus FROM lineitem
         |WHERE (l_returnflag = 'R' OR l_linestatus = 'F') AND NOT (l_discount < 0.02)
         |ORDER BY $liKeySql""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter((col("l_returnflag") === "R" || col("l_linestatus") === "F")
          && !(col("l_discount") < 0.02))
        .select((liKey ++ Seq("l_returnflag", "l_linestatus")).map(col): _*)
        .orderBy(liKey.map(col): _*)
    },

    "filter_in" -> Q(
      """SELECT p_partkey, p_name, p_brand, p_size FROM part
        |WHERE p_brand IN ('Brand#1','Brand#5','Brand#13') AND p_size IN (1,5,9,24,42)
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#1", "Brand#5", "Brand#13")
          && col("p_size").isin(1, 5, 9, 24, 42))
        .select("p_partkey", "p_name", "p_brand", "p_size")
        .orderBy("p_partkey")
    },

    "filter_between" -> Q(
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderdate").between(
          lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")),
          lit(java.sql.Timestamp.valueOf("1996-12-31 00:00:00"))))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
    },

    "filter_like" -> Q(
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name LIKE '%widget%' AND p_type LIKE 'S%' AND p_name NOT LIKE 'small%'
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_name").like("%widget%") && col("p_type").like("S%")
          && !col("p_name").like("small%"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    },

    "filter_null" -> Q(
      s"""SELECT $liKeySql, nullif(l_returnflag, 'N') AS rf FROM lineitem
         |WHERE nullif(l_returnflag, 'N') IS NULL OR nullif(l_linestatus, 'O') IS NOT NULL
         |ORDER BY $liKeySql""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .withColumn("rf", nullif(col("l_returnflag"), lit("N")))
        .filter(col("rf").isNull || nullif(col("l_linestatus"), lit("O")).isNotNull)
        .select((liKey :+ "rf").map(col): _*)
        .orderBy(liKey.map(col): _*)
    },

    // wide→long reshaping (melt): Spark's native unpivot; both metric
    // columns cast to a common DOUBLE before unpivoting. Oracle spelled
    // as UNION ALL (engine-neutral and trivially deterministic).
    "project_unpivot" -> Q(
      """SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |ORDER BY p_partkey, metric""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("double").as("p_size"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size")), "metric", "value")
        .orderBy("p_partkey", "metric")
    },

    "project_case" -> Q(
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'high'
        |       WHEN o_totalprice > 150000 THEN 'mid'
        |       ELSE 'low' END AS price_band,
        |  CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open' ELSE 'other' END AS status_word
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 150000, "mid")
            .otherwise("low").as("price_band"),
          when(col("o_orderstatus") === "F", "final")
            .when(col("o_orderstatus") === "O", "open")
            .otherwise("other").as("status_word"))
        .orderBy("o_orderkey")
    },

    "filter_subquery" -> Q(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // SQL front door (E2): Catalyst decorrelates IN/EXISTS to semi-joins
      // (RewritePredicateSubquery) — asserted in PlanShapeSpec.
      Tables.reg(s, d)
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
          |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
          |ORDER BY o_orderkey""".stripMargin)
    }
  )
}
