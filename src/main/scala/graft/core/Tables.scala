package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md:13-15,
  * schemas in FIXTURES.md). One parquet file per table under the
  * scale-factor directory; Spark's vectorized columnar reader picks the
  * schema up from the Parquet footers.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, dir): re-resolving a table re-lists its files
  // and re-reads Parquet footers — measurable when a bench session runs
  // 100+ queries against the same ten tables. The DataFrame (logical
  // plan) is immutable, so sharing it across queries is safe.
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // evict entries for stopped sessions so the static map never retains
    // plans (or session references) past the session's lifetime
    loaded.keySet.removeIf(k => k._1.sparkContext.isStopped)
    loaded.computeIfAbsent((spark, dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped as two physical Parquet types across fixture
    * generations, so the loader branches on the dtype Spark actually read:
    *
    *  - `timestamp[ns]`: Spark 4 rejects ns unless read as raw Long
    *    (`nanosAsLong`, runtime-settable — set below, harmless for µs
    *    files). Convert to a microsecond Timestamp with integer `div` —
    *    `/` would round-trip through Double and lose precision above
    *    2^53 ns (~1970+104 days).
    *  - `timestamp[us]` (current fixtures): arrives as TIMESTAMP_NTZ
    *    (no UTC-adjust flag in the footer); cast to the session
    *    TimestampType — value-identical under the pinned-UTC session.
    *
    * Either way the published schema is `ts: TIMESTAMP` in microseconds.
    * DuckDB reads both encodings natively, so oracles compare at µs or
    * coarser — see SURVEY.md §1.2.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(load(s, d, "events"))
  }

  /** The dtype branch alone, shared with the streaming reader
    * ([[graft.stream.Runner.eventsStream]]) and specs that read the raw
    * file themselves — both fixture generations must normalize
    * identically wherever the file is read.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // the NTZ→TIMESTAMP cast below is instant-preserving ONLY under a
    // UTC session (the repo's entry points all pin it); a library caller
    // on a zoned session would silently shift every event — fail loudly
    // instead of skewing data
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"events.ts normalization requires spark.sql.session.timeZone=UTC " +
        s"(got '$tz') — the TIMESTAMP_NTZ cast would shift every instant")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts: unsupported Parquet type $other (expected ns-as-long, timestamp_ntz, or timestamp)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view — the SQL front door (E2).
    * Goes through the typed loaders so `events.ts` arrives converted.
    */
  def reg(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  /** The synthetic lineitem has no short primary key (FIXTURES.md); this
    * column set is verified unique at sf0.001/sf0.01 and is the standard
    * deterministic ORDER BY for row-level lineitem outputs.
    */
  val liKey: Seq[String] =
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_extendedprice")
  val liKeySql: String = liKey.mkString(", ")
}
