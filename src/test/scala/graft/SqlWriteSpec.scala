package graft

import org.apache.spark.sql.functions._

/** SQL DDL + DML over the DSv2 WRITE faces (r19): a catalog table
  * created `USING graft.zonal.ZarrSource` with write options accepts
  * INSERT INTO (append) and INSERT OVERWRITE (truncate), and the same
  * table SELECTs back through the catalog read path. The catalog hands
  * the provider a `file:` URI — the write faces normalize it (the
  * literal-"file:" directory bug class).
  */
class SqlWriteSpec extends SparkSuite {

  test("INSERT INTO a ZarrSource catalog table writes the store; OVERWRITE truncates") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_io/sqlw_zarr"
    graft.core.Fs.rmTree(dir)
    spark.sql("DROP TABLE IF EXISTS sqlw_cube")
    spark.sql(s"""CREATE TABLE sqlw_cube
                 |USING graft.zonal.ZarrSource
                 |OPTIONS (path '$dir', height '16', width '32', chunk '16,16')""".stripMargin)
    spark.sql("""INSERT INTO sqlw_cube
                |SELECT CAST(id % 32 AS INT), CAST(id DIV 32 AS INT),
                |  CAST(id AS DOUBLE) FROM range(0, 512)""".stripMargin)
    // the store is real on disk and reads back through BOTH faces
    assert(new java.io.File(dir, ".zarray").exists(), "INSERT must build the store")
    assert(spark.sql("SELECT count(*) FROM sqlw_cube").head().getLong(0) == 512)
    val direct = spark.read.format("graft.zonal.ZarrSource").load(dir)
    assert(direct.filter(col("value") =!=
      (col("cell_y") * 32 + col("cell_x")).cast("double")).count() == 0)
    // chunk-granular append through SQL: a second INSERT upserts more
    // chunks (rows land where the first insert wrote nothing)
    spark.sql("""INSERT OVERWRITE sqlw_cube
                |SELECT CAST(id % 32 AS INT), CAST(id DIV 32 AS INT),
                |  CAST(7.0 AS DOUBLE) FROM range(0, 512)""".stripMargin)
    assert(spark.sql("SELECT sum(value) FROM sqlw_cube").head().getDouble(0)
      == 512 * 7.0, "OVERWRITE must replace, not merge")
    spark.sql("DROP TABLE sqlw_cube")
  }

  test("a remote-scheme write path refuses loudly instead of writing a literal dir") {
    val e = intercept[Throwable] {
      spark.range(4)
        .selectExpr("CAST(id AS INT) AS cell_x", "CAST(0 AS INT) AS cell_y",
          "CAST(id AS DOUBLE) AS value")
        .write.format("graft.zonal.ZarrSource")
        .option("height", 1).option("width", 4)
        .mode("overwrite").save("hdfs://nn/cube")
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(e).contains("scheme"), msgs(e))
  }
}
