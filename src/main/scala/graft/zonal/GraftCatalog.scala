package graft.zonal

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A V2 catalog for cube tables (r20 — the write-side distribution
  * contract the r19 verdict flagged as unexpressible on the PATH-based
  * face): `spark.sql.catalog.graft = graft.zonal.GraftCatalog` (+
  * `…graft.warehouse = dir`) registers tables whose geometry lives in
  * a `.graft_table` properties file, and — because this catalog is
  * ALSO a [[FunctionCatalog]] carrying `chunk_div` — a write through
  * it can REQUEST chunk clustering via
  * `RequiresDistributionAndOrdering`: Spark itself shuffles arbitrary
  * input into chunk-aligned tasks, so EVERY commit is rename-only
  * (zero merges) with no manual repartition. At 100 TB that one
  * requested exchange replaces either a user-remembered repartition
  * or a scattered write whose every chunk pays the decode-merge
  * fallback.
  *
  * Scope: geometry is immutable (ALTER refuses by name), PARTITIONED
  * BY refuses (the chunk geometry IS the layout), DROP removes the
  * store, RENAME is a directory move.
  */
class GraftCatalog extends TableCatalog with FunctionCatalog {
  private var catName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"catalog $name: spark.sql.catalog.$name.warehouse is required")
  }
  override def name(): String = catName

  private def tableDir(ident: Identifier): java.io.File =
    new java.io.File((warehouse +: ident.namespace().toSeq :+ ident.name()).mkString("/"))
  private def metaFile(ident: Identifier): java.io.File =
    new java.io.File(tableDir(ident), ".graft_table")

  override def listTables(ns: Array[String]): Array[Identifier] = {
    val d = new java.io.File((warehouse +: ns.toSeq).mkString("/"))
    Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(k => new java.io.File(k, ".graft_table").exists())
      .map(k => Identifier.of(ns, k.getName))
  }

  override def tableExists(ident: Identifier): Boolean = metaFile(ident).exists()

  override def loadTable(ident: Identifier): Table = {
    if (!metaFile(ident).exists())
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val p = new java.util.Properties()
    val in = new java.io.FileInputStream(metaFile(ident))
    try p.load(in) finally in.close()
    val opts = new java.util.HashMap[String, String]()
    p.stringPropertyNames().forEach(k => opts.put(k, p.getProperty(k)))
    // clusterWrite: writes THROUGH THE CATALOG may request the chunk
    // clustering (this catalog resolves chunk_div); path-based writes
    // cannot (no FunctionCatalog in scope) and stay unspecified
    opts.getOrDefault("face", "zarr") match {
      case "zarr" =>
        val geom = ZarrWrite.geomFrom(opts)
        require(geom.isDefined, s"$ident: table metadata lacks height/width")
        new ZarrTable(tableDir(ident).getPath, null, null, geom, clusterWrite = true)
      case "tiff" =>
        val geom = TiffWrite.geomFrom(opts)
        require(geom.isDefined, s"$ident: table metadata lacks height/width")
        new TiffMosaicTable(tableDir(ident).getPath, geom, clusterWrite = true)
      case other => sys.error(
        s"$ident: face '$other' — zarr (default) and tiff are the catalog faces")
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (ident.namespace().toSeq :+ ident.name()).mkString("."))
    require(partitions.isEmpty,
      s"$ident: PARTITIONED BY is not a cube axis — the chunk geometry " +
        "(options height/width/chunk/shard/epochs/levels) IS the layout")
    val opts = new java.util.HashMap[String, String]()
    properties.forEach { (k, v) =>
      if (k.startsWith(TableCatalog.OPTION_PREFIX))
        opts.put(k.substring(TableCatalog.OPTION_PREFIX.length), v)
      else if (!Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_OWNER,
          TableCatalog.PROP_LOCATION, TableCatalog.PROP_COMMENT,
          TableCatalog.PROP_TABLE_TYPE, TableCatalog.PROP_EXTERNAL).contains(k))
        opts.put(k, v)
    }
    val face = opts.getOrDefault("face", "zarr")
    require(face == "zarr" || face == "tiff",
      s"$ident: face '$face' — zarr (default) and tiff are the catalog faces")
    val want =
      if (face == "tiff") {
        val geom = TiffWrite.geomFrom(opts)
        require(geom.isDefined,
          s"$ident: a mosaic table wants OPTIONS (height, width [, tile])")
        TiffSource.Schema
      } else {
        val geom = ZarrWrite.geomFrom(opts)
        require(geom.isDefined,
          s"$ident: a cube table wants OPTIONS (height, width [, chunk/shard/epochs/levels/...])")
        ZarrWrite.writeSchemaFor(geom.get)
      }
    // the declared columns must be the geometry's own write schema
    // (names + types; CTAS hands the query's schema here)
    require(schema.isEmpty
        || schema.fields.map(f => (f.name, f.dataType)).toSeq ==
           want.fields.map(f => (f.name, f.dataType)).toSeq,
      s"$ident: declared schema ${schema.simpleString} does not match the " +
        s"rank's write schema ${want.simpleString}")
    tableDir(ident).mkdirs()
    val p = new java.util.Properties()
    opts.forEach((k, v) => p.setProperty(k, v))
    val out = new java.io.FileOutputStream(metaFile(ident))
    try p.store(out, "graft cube table") finally out.close()
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    sys.error(s"$ident: cube geometry is immutable — create a new table " +
      "and rewrite (ALTER refuses rather than mislabeling chunks)")

  override def dropTable(ident: Identifier): Boolean =
    if (!metaFile(ident).exists()) false
    else { ZarrWrite.rmTree(tableDir(ident)); true }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    // RENAME TO hands the raw multipart target: a leading catalog part
    // (`graft.ns.b`) strips — the rename stays inside this catalog
    val toIdent =
      if (to.namespace().headOption.contains(catName))
        Identifier.of(to.namespace().drop(1), to.name())
      else to
    if (!metaFile(from).exists())
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(from)
    require(!tableExists(toIdent), s"$toIdent already exists")
    toIdent.namespace().foldLeft(new java.io.File(warehouse)) { (d, n) =>
      val k = new java.io.File(d, n); k.mkdirs(); k
    }
    require(tableDir(from).renameTo(tableDir(toIdent)),
      s"rename $from -> $toIdent failed")
  }

  // ---- FunctionCatalog: the chunk-bucket primitive ----

  override def listFunctions(ns: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty[String], "chunk_div"))

  override def loadFunction(ident: Identifier): UnboundFunction = {
    if (ident.name() != "chunk_div")
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
    GraftCatalog.ChunkDiv
  }
}

object GraftCatalog {
  /** `chunk_div(v, k)` — floor-div of a non-negative grid index by its
    * chunk size: the clustering key `RequiresDistributionAndOrdering`
    * asks for. Codegen'd through the magic `invoke` path.
    */
  object ChunkDiv extends UnboundFunction {
    override def name(): String = "chunk_div"
    override def description(): String =
      "chunk_div(v, k): grid index v's chunk ordinal at chunk size k"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2
          && inputType.fields.forall(_.dataType == IntegerType),
        s"chunk_div wants (INT, INT), got ${inputType.simpleString}")
      ChunkDivBound
    }
  }

  object ChunkDivBound extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, IntegerType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "chunk_div"
    override def canonicalName(): String = "graft.chunk_div"
    override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): Integer =
      input.getInt(0) / input.getInt(1)
    /** The codegen magic-method path (ScalarFunction.MAGIC_METHOD_NAME). */
    def invoke(v: Int, k: Int): Int = v / k
  }
}
