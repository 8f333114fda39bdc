package graft

import org.apache.spark.sql.functions._

/** The graft V2 catalog (r20): requested chunk clustering through
  * RequiresDistributionAndOrdering + the catalog's own chunk_div
  * function — Spark shuffles ARBITRARY input into chunk-aligned tasks,
  * so every commit is rename-only with no manual repartition (the r19
  * verdict's "write-side distribution contract gap", closed the
  * FunctionCatalog way).
  */
class CatalogSpec extends SparkSuite {
  import spark.implicits._

  private def setup(): String = {
    val wh = java.nio.file.Files.createTempDirectory("graftwh").toString
    spark.conf.set("spark.sql.catalog.graft", "graft.zonal.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    wh
  }

  test("a SCATTERED writeTo through the catalog commits rename-only: Spark applies the requested clustering") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft.cubes.t")
    spark.sql(
      """CREATE TABLE graft.cubes.t (cell_x INT, cell_y INT, value DOUBLE)
        |OPTIONS (height '24', width '40', chunk '16,16')""".stripMargin)
    val (w, h) = (40, 24)
    val df = (0 until w).flatMap(x => (0 until h).map(y =>
        (x, y, ((7 * x + 11 * y) % 101).toDouble)))
      .toDF("cell_x", "cell_y", "value")
      .repartition(8) // round-robin: every chunk's cells scatter
    df.writeTo("graft.cubes.t").append()
    // the pin: the path-based face would merge here (ZarrWriteSpec's
    // scattered test proves merges > 0 on identical input); through
    // the catalog Spark clusters on chunk_div and NO chunk splits
    assert(graft.zonal.ZarrWrite.lastCommit == (6, 0),
      s"requested distribution must make the commit rename-only, " +
        s"got ${graft.zonal.ZarrWrite.lastCommit}")
    val back = spark.table("graft.cubes.t")
    assert(back.count() == w.toLong * h)
    assert(back.filter(
      col("value") =!= (col("cell_x") * 7 + col("cell_y") * 11) % 101).count() == 0)
  }

  test("rank-3 catalog table: scattered SQL INSERT clusters on (epoch, y, x) chunk ordinals") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft.cubes.cube3")
    spark.sql(
      """CREATE TABLE graft.cubes.cube3 (cell_x INT, cell_y INT, epoch INT, value DOUBLE)
        |OPTIONS (height '16', width '16', epochs '4', chunk '1,16,16')""".stripMargin)
    // DISTRIBUTE BY a hash unrelated to chunks: deliberately scattered
    spark.sql(
      """INSERT INTO graft.cubes.cube3
        |SELECT CAST(id % 16 AS INT), CAST((id DIV 16) % 16 AS INT),
        |  CAST(id DIV 256 AS INT), CAST(id AS DOUBLE)
        |FROM range(0, 1024) DISTRIBUTE BY pmod(id, 7)""".stripMargin)
    assert(graft.zonal.ZarrWrite.lastCommit == (4, 0),
      s"4 epoch chunks, zero merges — got ${graft.zonal.ZarrWrite.lastCommit}")
    assert(spark.table("graft.cubes.cube3").count() == 1024)
    assert(spark.sql(
      "SELECT value FROM graft.cubes.cube3 WHERE cell_x = 3 AND cell_y = 2 AND epoch = 1")
      .head().getDouble(0) == 256 + 32 + 3)
  }

  test("catalog CTAS clusters the scattered query; MERGE delta-applies through the catalog") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft.cubes.ct")
    spark.sql(
      """CREATE TABLE graft.cubes.ct
        |OPTIONS (height '24', width '40', chunk '16,16')
        |AS SELECT CAST(x.id AS INT) AS cell_x, CAST(y.id AS INT) AS cell_y,
        |  CAST((3 * x.id + 5 * y.id) % 97 AS DOUBLE) AS value
        |FROM range(0, 40) x CROSS JOIN range(0, 24) y
        |DISTRIBUTE BY pmod(x.id * 7 + y.id, 11)""".stripMargin)
    assert(graft.zonal.ZarrWrite.lastCommit == (6, 0),
      s"CTAS through the catalog must cluster too, got ${graft.zonal.ZarrWrite.lastCommit}")
    assert(spark.table("graft.cubes.ct").count() == 40L * 24)
    // MERGE through the catalog table: the same SupportsDelta apply
    spark.sql(
      """MERGE INTO graft.cubes.ct t
        |USING (SELECT CAST(id AS INT) AS cell_x, CAST(5 AS INT) AS cell_y,
        |         CAST(7777 AS DOUBLE) AS value FROM range(30, 34)) s
        |ON t.cell_x = s.cell_x AND t.cell_y = s.cell_y
        |WHEN MATCHED THEN UPDATE SET value = s.value""".stripMargin)
    assert(spark.sql(
      "SELECT count(*) FROM graft.cubes.ct WHERE value = 7777").head().getLong(0) == 4)
    assert(spark.sql(
      """SELECT count(*) FROM graft.cubes.ct
        |WHERE NOT (cell_y = 5 AND cell_x BETWEEN 30 AND 33)
        |  AND value <> (3 * cell_x + 5 * cell_y) % 97""".stripMargin)
      .head().getLong(0) == 0, "untouched cells keep their values")
  }

  test("sharded v3 catalog table: scattered INSERT clusters on SHARD ordinals; MERGE rebuilds the touched shard") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft.cubes.sh")
    spark.sql(
      """CREATE TABLE graft.cubes.sh (cell_x INT, cell_y INT, value DOUBLE)
        |OPTIONS (height '32', width '32', chunk '8,8', shard '16,16', format 'v3')""".stripMargin)
    spark.sql(
      """INSERT INTO graft.cubes.sh
        |SELECT CAST(id % 32 AS INT), CAST(id DIV 32 AS INT), CAST(id AS DOUBLE)
        |FROM range(0, 1024) DISTRIBUTE BY pmod(id, 9)""".stripMargin)
    assert(graft.zonal.ZarrWrite.lastCommit == (4, 0),
      s"4 shards, zero merges — got ${graft.zonal.ZarrWrite.lastCommit}")
    spark.sql(
      """MERGE INTO graft.cubes.sh t
        |USING (SELECT CAST(id AS INT) AS cell_x, CAST(9 AS INT) AS cell_y,
        |         CAST(55555 AS DOUBLE) AS value FROM range(3, 6)) s
        |ON t.cell_x = s.cell_x AND t.cell_y = s.cell_y
        |WHEN MATCHED THEN UPDATE SET value = s.value""".stripMargin)
    val back = spark.table("graft.cubes.sh")
    assert(back.count() == 1024)
    assert(spark.sql("SELECT count(*) FROM graft.cubes.sh WHERE value = 55555")
      .head().getLong(0) == 3)
    // every other cell of the TOUCHED shard (and all others) intact
    assert(spark.sql(
      """SELECT count(*) FROM graft.cubes.sh
        |WHERE NOT (cell_y = 9 AND cell_x BETWEEN 3 AND 5)
        |  AND value <> cell_y * 32 + cell_x""".stripMargin).head().getLong(0) == 0)
  }

  test("tiff-face catalog table: scattered INSERT clusters on tile ordinals; sidecar min/max answers through the catalog") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft.cubes.mosaic")
    spark.sql(
      """CREATE TABLE graft.cubes.mosaic (cell_x INT, cell_y INT, value DOUBLE)
        |OPTIONS (face 'tiff', height '24', width '40', tile '16,16')""".stripMargin)
    spark.sql(
      """INSERT INTO graft.cubes.mosaic
        |SELECT CAST(id % 40 AS INT), CAST(id DIV 40 AS INT), CAST(id AS DOUBLE)
        |FROM range(0, 960) DISTRIBUTE BY pmod(id, 7)""".stripMargin)
    assert(graft.zonal.TiffWrite.lastCommit == (6, 0),
      s"6 members, zero merges — got ${graft.zonal.TiffWrite.lastCommit}")
    val back = spark.table("graft.cubes.mosaic")
    assert(back.count() == 960)
    // the sidecar-answered aggregate works through the catalog read
    val mm = spark.sql("SELECT min(value), max(value) FROM graft.cubes.mosaic").head()
    assert(mm.getDouble(0) == 0.0 && mm.getDouble(1) == 959.0, mm.toString)
  }

  test("a rank-3 catalog cube TAILS as a stream: readStream.table emits landed epochs") {
    setup()
    val base = java.nio.file.Files.createTempDirectory("cattail").toString
    spark.sql("DROP TABLE IF EXISTS graft.cubes.tail3")
    spark.sql(
      """CREATE TABLE graft.cubes.tail3 (cell_x INT, cell_y INT, epoch INT, value DOUBLE)
        |OPTIONS (height '8', width '8', epochs '3', chunk '1,8,8')""".stripMargin)
    for (e <- 0 until 2)
      spark.sql(
        s"""INSERT INTO graft.cubes.tail3
           |SELECT CAST(id % 8 AS INT), CAST(id DIV 8 AS INT),
           |  CAST($e AS INT), CAST(id + 10 * $e AS DOUBLE) FROM range(0, 64)""".stripMargin)
    val q = spark.readStream.table("graft.cubes.tail3")
      .writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val r = spark.read.parquet(s"$base/out")
    assert(r.count() == 2L * 64)
    assert(r.select("epoch").distinct().count() == 2)
  }

  test("catalog hygiene: duplicate create refuses, rename moves the store, drop removes it, ALTER refuses") {
    setup()
    spark.sql("DROP TABLE IF EXISTS graft.ns.a")
    spark.sql("DROP TABLE IF EXISTS graft.ns.b")
    spark.sql(
      """CREATE TABLE graft.ns.a (cell_x INT, cell_y INT, value DOUBLE)
        |OPTIONS (height '8', width '8', chunk '8,8')""".stripMargin)
    val dup = intercept[Throwable](spark.sql(
      """CREATE TABLE graft.ns.a (cell_x INT, cell_y INT, value DOUBLE)
        |OPTIONS (height '8', width '8')""".stripMargin))
    assert(dup.getMessage.toLowerCase.contains("already exists"), dup.getMessage)
    spark.sql("INSERT INTO graft.ns.a SELECT CAST(id % 8 AS INT), CAST(id DIV 8 AS INT), 1.0 FROM range(0, 64)")
    spark.sql("ALTER TABLE graft.ns.a RENAME TO graft.ns.b")
    assert(spark.table("graft.ns.b").count() == 64)
    assert(!spark.catalog.tableExists("graft.ns.a"))
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val alter = intercept[Throwable](
      spark.sql("ALTER TABLE graft.ns.b SET TBLPROPERTIES ('height'='9')"))
    assert(msgs(alter).contains("immutable"), msgs(alter))
    spark.sql("DROP TABLE graft.ns.b")
    assert(!spark.catalog.tableExists("graft.ns.b"))
    // a geometry-less create refuses loudly
    val noGeom = intercept[Throwable](spark.sql(
      "CREATE TABLE graft.ns.c (cell_x INT, cell_y INT, value DOUBLE)"))
    assert(msgs(noGeom).contains("height"), msgs(noGeom))
  }
}
