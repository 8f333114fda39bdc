package graft.rel

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.{Q, Tables}

/** SURVEY.md §2.8 — scalar function families, one representative query
  * per family. All stock `org.apache.spark.sql.functions._` (codegen'd);
  * the oracle strings navigate known dialect deltas:
  *   - DuckDB `dayofweek` is 0=Sunday, Spark is 1=Sunday → oracle adds 1
  *   - DuckDB `date_trunc`/`last_day` return DATE, Spark TIMESTAMP/DATE →
  *     Spark side casts to date
  *   - DuckDB double→INT cast rounds, Spark truncates → never cast
  *     computed doubles to ints in oracle queries (use floor/ceil)
  *   - transcendentals (ln/log10/sqrt/pow) are libm-dependent in the last
  *     ulp → rounded to 6 decimals on both sides
  */
object Functions {

  def defs: Seq[(String, Q)] = Seq(
    // null-handling family: coalesce/nullif/ifnull/greatest/least.
    // DuckDB widens greatest/least to int64 → explicit casts (memory
    // trap); nullif(x, x) nulls are exercised through the aggregate
    "fn_null" -> Q(
      """SELECT o_orderkey,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
        |  ifnull(nullif(o_orderpriority, o_orderpriority), 'none') AS always_none,
        |  CAST(greatest(o_custkey, o_orderkey) AS BIGINT) AS gk,
        |  CAST(least(o_custkey, o_orderkey) AS BIGINT) AS lk
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_or_open"),
          ifnull(nullif(col("o_orderpriority"), col("o_orderpriority")), lit("none")).as("always_none"),
          greatest(col("o_custkey"), col("o_orderkey")).cast("long").as("gk"),
          least(col("o_custkey"), col("o_orderkey")).cast("long").as("lk"))
        .orderBy("o_orderkey")
    },

    // C-style formatting family: printf/format_string agree literally;
    // %.2f on 2-decimal money never hits a rounding tie (the stored
    // double is never exactly halfway), so the rendering is identical
    "fn_format" -> Q(
      """SELECT s_suppkey,
        |  printf('%s|%.2f', s_name, s_acctbal) AS fmt,
        |  lpad(s_name, 30, '*') AS padded,
        |  rpad(s_name, 30, '.') AS rpadded,
        |  translate(s_name, 'AEIOU', 'aeiou') AS tr,
        |  reverse(s_name) AS rev,
        |  repeat(s_nationkey || '-', 3) AS rep
        |FROM supplier ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      Tables.supplier(s, d)
        .select(col("s_suppkey"),
          format_string("%s|%.2f", col("s_name"), col("s_acctbal")).as("fmt"),
          lpad(col("s_name"), 30, "*").as("padded"),
          rpad(col("s_name"), 30, ".").as("rpadded"),
          translate(col("s_name"), "AEIOU", "aeiou").as("tr"),
          reverse(col("s_name")).as("rev"),
          repeat(concat(col("s_nationkey").cast("string"), lit("-")), 3).as("rep"))
        .orderBy("s_suppkey")
    },

    "fn_string" -> Q(
      """SELECT p_partkey,
        |  concat(p_brand, ':', p_name) AS branded,
        |  upper(p_name) AS up, lower(p_brand) AS lo,
        |  trim(concat('  ', p_name, ' ')) AS tr,
        |  replace(p_name, 'widget', 'gadget') AS repl,
        |  length(p_name) AS len,
        |  lpad(p_type, 12, '*') AS pad,
        |  split_part(p_name, ' ', 1) AS first_word,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS rex,
        |  starts_with(p_name, 'small') AS sw,
        |  ends_with(p_name, 'bolt') AS ew
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(col("p_partkey"),
        concat(col("p_brand"), lit(":"), col("p_name")).as("branded"),
        upper(col("p_name")).as("up"), lower(col("p_brand")).as("lo"),
        trim(concat(lit("  "), col("p_name"), lit(" "))).as("tr"),
        expr("replace(p_name, 'widget', 'gadget')").as("repl"),
        length(col("p_name")).as("len"),
        lpad(col("p_type"), 12, "*").as("pad"),
        expr("split_part(p_name, ' ', 1)").as("first_word"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("rex"),
        col("p_name").startsWith("small").as("sw"),
        col("p_name").endsWith("bolt").as("ew"))
        .orderBy("p_partkey")
    },

    "fn_date" -> Q(
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  day(o_orderdate) AS dd, quarter(o_orderdate) AS q,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  o_orderdate + INTERVAL 5 DAY AS plus5,
        |  date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_2000,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  last_day(o_orderdate) AS month_end,
        |  (dayofweek(o_orderdate) + 1) AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dd"), quarter(col("o_orderdate")).as("q"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 5 DAY")).as("plus5"),
        datediff(lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")), col("o_orderdate")).as("days_to_2000"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        last_day(col("o_orderdate")).as("month_end"),
        dayofweek(col("o_orderdate")).as("dow"))
        .orderBy("o_orderkey")
    },

    "fn_math" -> Q(
      """SELECT p_partkey,
        |  round(p_retailprice) AS r0,
        |  abs(p_size - 25) AS ab,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ce, CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  pow(p_size, 2) AS p2,
        |  round(sqrt(p_size), 6) AS sq,
        |  round(ln(p_retailprice), 6) AS lnp,
        |  round(log10(p_retailprice), 6) AS lg,
        |  mod(p_size, 7) AS md,
        |  CAST(sign(p_size - 25) AS INTEGER) AS sg,
        |  CAST(greatest(p_size, 25) AS INTEGER) AS g, CAST(least(p_size, 25) AS INTEGER) AS l
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(col("p_partkey"),
        round(col("p_retailprice")).as("r0"),
        abs(col("p_size") - 25).as("ab"),
        ceil(col("p_retailprice")).as("ce"), floor(col("p_retailprice")).as("fl"),
        pow(col("p_size"), 2).as("p2"),
        round(sqrt(col("p_size")), 6).as("sq"),
        round(log(col("p_retailprice")), 6).as("lnp"),
        round(log10(col("p_retailprice")), 6).as("lg"),
        expr("mod(p_size, 7)").as("md"),
        signum(col("p_size") - 25).cast("int").as("sg"),
        greatest(col("p_size"), lit(25)).as("g"), least(col("p_size"), lit(25)).as("l"))
        .orderBy("p_partkey")
    },

    // array ops surface; outputs are scalars (float→double widening is
    // bit-exact on both engines) — the driver's checker can't hash arrays
    // trigonometric family — libm-dependent in the last ulp, so rounded
    // at 6 decimals on both engines (same rule as ln/log10/sqrt)
    "fn_trig" -> Q(
      """SELECT p_partkey,
        |  round(sin(p_size), 6) AS sn, round(cos(p_size), 6) AS cs,
        |  round(tan(p_size), 6) AS tn,
        |  round(atan2(p_size, 10), 6) AS at2,
        |  round(degrees(atan(p_size)), 6) AS deg,
        |  round(radians(p_size), 6) AS rad
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(col("p_partkey"),
        round(sin(col("p_size")), 6).as("sn"),
        round(cos(col("p_size")), 6).as("cs"),
        round(tan(col("p_size")), 6).as("tn"),
        round(atan2(col("p_size"), lit(10)), 6).as("at2"),
        round(degrees(atan(col("p_size"))), 6).as("deg"),
        round(radians(col("p_size")), 6).as("rad"))
        .orderBy("p_partkey")
    },

    "fn_array" -> Q(
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_val,
        |  CAST(embedding[2] AS DOUBLE) AS v2,
        |  CAST(embedding[3] AS DOUBLE) AS v3,
        |  round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 5) AS vsum,
        |  round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 5) AS norm2
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d).select(col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        element_at(col("embedding"), 2).cast("double").as("v2"),
        element_at(col("embedding"), 3).cast("double").as("v3"),
        expr("round(aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE)), 5)").as("vsum"),
        expr("round(aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 5)").as("norm2"))
        .orderBy("vec_id")
    },

    // map build/keys/values/lookup; key+value lists serialized to strings
    // (literal-keyed map → insertion order is deterministic on both sides)
    "fn_map" -> Q(
      """SELECT event_id,
        |  array_to_string(map_keys(MAP {'et': event_type, 'src': 'events'}), ',') AS ks,
        |  array_to_string(map_values(MAP {'et': event_type, 'src': 'events'}), ',') AS vs,
        |  map_extract(MAP {'et': event_type, 'src': 'events'}, 'et')[1] AS et
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val m = map(lit("et"), col("event_type"), lit("src"), lit("events"))
      Tables.events(s, d).select(col("event_id"),
        concat_ws(",", map_keys(m)).as("ks"),
        concat_ws(",", map_values(m)).as("vs"),
        element_at(m, "et").as("et"))
        .orderBy("event_id")
    },

    "fn_json" -> Q(
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")
    },

    // the VARIANT path for the same JSON column (Spark 4's semi-
    // structured type): parse ONCE into the binary variant encoding,
    // then typed extraction + aggregation downstream — unlike fn_json's
    // per-access string re-parse, the real engine win at 100 TB is
    // parse-once-read-many. The oracle replays the arithmetic over
    // DuckDB's JSON extraction; the variant encoding itself is engine-
    // internal, the CONTRACT is the extracted values.
    "fn_variant" -> Q(
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS bucket,
        |  count(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  CAST(min(json_extract_string(props, '$.k')) AS INTEGER) AS min_k_lex
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(expr("parse_json(props)").as("v"))
        .select(expr("variant_get(v, '$.k', 'int')").as("k"),
          expr("CAST(variant_get(v, '$.k', 'string') AS STRING)").as("k_str"))
        .groupBy((col("k") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("bigint").as("sum_k"),
          min(col("k_str")).cast("int").as("min_k_lex"))
        .orderBy("bucket")
    },

    "fn_bitwise" -> Q(
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS band, o_orderkey | 16 AS bor,
        |  xor(o_orderkey, 42) AS bxor,
        |  o_orderkey << 2 AS shl, o_orderkey >> 1 AS shr,
        |  CAST(bit_count(o_orderkey) AS INTEGER) AS popcnt
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderkey").bitwiseAND(255).as("band"),
        col("o_orderkey").bitwiseOR(16).as("bor"),
        col("o_orderkey").bitwiseXOR(42).as("bxor"),
        shiftleft(col("o_orderkey"), 2).as("shl"),
        shiftright(col("o_orderkey"), 1).as("shr"),
        bit_count(col("o_orderkey")).cast("int").as("popcnt"))
        .orderBy("o_orderkey")
    },

    "fn_struct" -> Q(
      """SELECT o_orderkey,
        |  ({'k': o_orderkey, 'p': o_totalprice}).k AS st_k,
        |  ({'k': o_orderkey, 'p': o_totalprice}).p AS st_p,
        |  ({'outer': {'inner': o_custkey}}).outer.inner AS deep
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // nested StructType surface (§1.2 type table): build, access,
      // two-level nesting; only the extracted scalars are output (the
      // driver's checker can't hash struct columns)
      val st = struct(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      val nested = struct(struct(col("o_custkey").as("inner")).as("outer"))
      Tables.orders(s, d).select(col("o_orderkey"),
        st.getField("k").as("st_k"), st.getField("p").as("st_p"),
        nested.getField("outer").getField("inner").as("deep"))
        .orderBy("o_orderkey")
    },

    "fn_cast" -> Q(
      """SELECT o_orderkey,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_2dec,
        |  CAST(o_orderdate AS DATE) AS od,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od_str,
        |  TRY_CAST(o_orderpriority AS INTEGER) AS prio_int,
        |  TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER) AS prio_num,
        |  CAST(o_custkey AS DOUBLE) AS cust_d
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderkey").cast("string").as("key_str"),
        col("o_totalprice").cast(DecimalType(18, 2)).cast("double").as("price_2dec"),
        col("o_orderdate").cast("date").as("od"),
        col("o_orderdate").cast("date").cast("string").as("od_str"),
        expr("try_cast(o_orderpriority AS INT)").as("prio_int"),
        expr("try_cast(split_part(o_orderpriority, '-', 1) AS INT)").as("prio_num"),
        col("o_custkey").cast("double").as("cust_d"))
        .orderBy("o_orderkey")
    }
  )
}
