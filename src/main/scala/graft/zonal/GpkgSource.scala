package graft.zonal

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 face of the GeoPackage VECTOR reader (r18 — the
  * vector member of the DSv2 family):
  *
  *  - `spark.read.format("graft.zonal.GpkgSource").option("table",
  *    name).load(path)` reads a feature table as the long-form vertex
  *    relation `(zone_id, part, ring, i, x, y)` — one `InputPartition`
  *    per SQLite LEAF PAGE straight from the driver-side B-tree walk;
  *  - pushed `x`/`y` comparisons become an ENVELOPE window that prunes
  *    leaf pages at planning time through the `gpkg_rtree` shadow
  *    index when the file carries one (float32-conservative, the r12
  *    machinery) — pruning is feature-envelope granular and therefore
  *    a SUPERSET of the row-level predicate, which Spark re-applies
  *    exactly as the residual;
  *  - a pushed `zone_id` EqualTo/In prunes leaf pages by ROWID RANGE
  *    (sound only when the id column IS the INTEGER PRIMARY KEY — the
  *    rowid alias — otherwise it stays purely residual);
  *  - semantics are ROW-LEVEL (vertices matching the predicate), the
  *    relational contract — the feature-level bbox-intersection read
  *    stays [[Gpkg.readVertsWindow]].
  */
class GpkgSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GpkgSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft.zonal.GpkgSource: a load(path) is required")
    val table = properties.get("table")
    require(table != null && table.nonEmpty,
      "graft.zonal.GpkgSource: .option(\"table\", <feature table>) is required")
    new GpkgTable(path, table,
      Option(properties.get("id")).getOrElse("id"),
      Option(properties.get("geom")).getOrElse("geom"))
  }
}

object GpkgSource {
  val Schema: StructType = StructType(Seq(
    StructField("zone_id", IntegerType, nullable = false),
    StructField("part", IntegerType, nullable = false),
    StructField("ring", IntegerType, nullable = false),
    StructField("i", IntegerType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false)))
}

final class GpkgTable(path: String, table: String, idCol: String,
    geomCol: String) extends Table with SupportsRead {
  override def name(): String = s"gpkg:$path/$table"
  override def schema(): StructType = GpkgSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GpkgScanBuilder(path, table, idCol, geomCol)
}

/** Accumulates an (x, y) envelope window and a zone_id candidate set
  * from pushed comparisons; `build()` freezes both into the scan.
  * Double bounds are kept INCLUSIVE even for strict comparisons — the
  * envelope prune is a superset by construction, the residual trims.
  */
final class GpkgScanBuilder(path: String, table: String, idCol: String,
    geomCol: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var wx0 = Double.NegativeInfinity; private var wx1 = Double.PositiveInfinity
  private var wy0 = Double.NegativeInfinity; private var wy1 = Double.PositiveInfinity
  private var ids: Option[Set[Long]] = None
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GpkgSource.Schema

  private def bound(f: Filter): Boolean = f match {
    case And(l, r) => val a = bound(l); val b = bound(r); a || b
    case GreaterThanOrEqual(c, v: Number) => clamp(c, lo = v.doubleValue())
    case GreaterThan(c, v: Number) => clamp(c, lo = v.doubleValue())
    case LessThanOrEqual(c, v: Number) => clamp(c, hi = v.doubleValue())
    case LessThan(c, v: Number) => clamp(c, hi = v.doubleValue())
    case EqualTo("zone_id", v: Number) => idSet(Set(v.longValue())); true
    case In("zone_id", vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Number]) =>
      idSet(vs.map(_.asInstanceOf[Number].longValue()).toSet); true
    case EqualTo(c, v: Number) => clamp(c, lo = v.doubleValue()) | clamp(c, hi = v.doubleValue())
    case _ => false
  }
  private def clamp(col: String, lo: Double = Double.NegativeInfinity,
      hi: Double = Double.PositiveInfinity): Boolean = col match {
    case "x" => wx0 = math.max(wx0, lo); wx1 = math.min(wx1, hi); true
    case "y" => wy0 = math.max(wy0, lo); wy1 = math.min(wy1, hi); true
    case _ => false
  }
  private def idSet(vs: Set[Long]): Unit =
    ids = Some(ids.fold(vs)(_ intersect vs))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(bound)
    filters // page-granular pruning: every filter stays residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(s: StructType): Unit = required = s
  override def build(): Scan =
    new GpkgScan(path, table, idCol, geomCol, required, wx0, wx1, wy0, wy1, ids)
}

final class GpkgScan(path: String, table: String, idCol: String,
    geomCol: String, required: StructType,
    wx0: Double, wx1: Double, wy0: Double, wy1: Double,
    ids: Option[Set[Long]]) extends Scan with Batch {

  private def windowed: Boolean =
    wx0 > Double.NegativeInfinity || wx1 < Double.PositiveInfinity ||
    wy0 > Double.NegativeInfinity || wy1 < Double.PositiveInfinity

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-gpkg $path/$table window=[$wx0..$wx1]x[$wy0..$wy1] " +
      s"ids=${ids.fold("*")(_.size.toString)} cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val db = Gpkg.readDbMeta(path)
    val ti = Gpkg.tableInfo(db, table)
    val idIx = ti.columns.indexOf(idCol)
    val geomIx = ti.columns.indexOf(geomCol)
    require(idIx >= 0 && geomIx >= 0,
      s"$path/$table: need columns '$idCol' and '$geomCol', have ${ti.columns.mkString(", ")}")
    // candidate rowids: the rtree walk for an envelope window, the
    // pushed id set when the id column IS the rowid alias (INTEGER
    // PRIMARY KEY) — both None degrade to a full page manifest
    val envCands: Option[Set[Long]] =
      if (windowed) Gpkg.rtreeCandidates(db, table, geomCol, wx0, wx1, wy0, wy1)
      else None
    val idCands: Option[Set[Long]] =
      if (idIx == ti.pkOrdinal) ids else None
    val cands = (envCands, idCands) match {
      case (Some(a), Some(b)) => Some(a intersect b)
      case (a, b) => a.orElse(b)
    }
    Gpkg.windowLeafRefs(db, path, ti, cands)
      .map(r => GpkgInputPartition(r, idIx, geomIx,
        wx0, wx1, wy0, wy1, windowed): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GpkgReaderFactory(required.fieldNames)
}

final case class GpkgInputPartition(ref: Gpkg.LeafRef, idIx: Int, geomIx: Int,
    wx0: Double, wx1: Double, wy0: Double, wy1: Double,
    windowed: Boolean) extends InputPartition

final class GpkgReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GpkgPartitionReader(p.asInstanceOf[GpkgInputPartition], cols)
}

/** One leaf page's reader: decode each feature record, drop features
  * whose header envelope misses the window (sound — a vertex passing
  * the residual x/y filter implies its feature's envelope intersects),
  * and emit the WKB vertex walk.
  */
final class GpkgPartitionReader(p: GpkgInputPartition, cols: Array[String])
    extends PartitionReader[InternalRow] {

  private val it: Iterator[(Int, Int, Int, Int, Int, Int)] = {
    val ref = p.ref
    val rdb = Gpkg.DbMeta(ref.path, ref.pageSize, ref.reserved)
    Gpkg.leafRecords(rdb, ref.page).flatMap { case (rowid, payload) =>
      val vals = Gpkg.decodeRecord(payload, ref.nCols)
      val zid = vals(p.idIx) match {
        case l: Long => l
        case null if p.idIx == ref.pkOrdinal => rowid
        case other => sys.error(s"${ref.path}: id column holds $other")
      }
      val blob = vals(p.geomIx) match {
        case b: Array[Byte] => b
        case other => sys.error(s"${ref.path}: geometry column holds " +
          s"${if (other == null) "NULL" else other.getClass.getSimpleName}")
      }
      val keep = !p.windowed || (Gpkg.blobEnvelope(blob) match {
        case Some((minx, maxx, miny, maxy)) =>
          minx <= p.wx1 && maxx >= p.wx0 && miny <= p.wy1 && maxy >= p.wy0
        case None => true // no envelope: keep, the residual decides
      })
      require(zid >= Int.MinValue && zid <= Int.MaxValue,
        s"${ref.path}: feature id $zid outside the 32-bit zone_id range")
      if (!keep) Iterator.empty
      else {
        val what = s"${ref.path} feature $zid"
        Gpkg.parseWkbGeometry(blob, Gpkg.wkbOffset(blob, what), what).map {
          case (part, ring, i, x, y) => (zid.toInt, part, ring, i, x, y)
        }
      }
    }
  }
  private var cur: (Int, Int, Int, Int, Int, Int) = _

  override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
  override def get(): InternalRow = {
    val row = new GenericInternalRow(cols.length)
    var k = 0
    while (k < cols.length) {
      cols(k) match {
        case "zone_id" => row.update(k, cur._1)
        case "part" => row.update(k, cur._2)
        case "ring" => row.update(k, cur._3)
        case "i" => row.update(k, cur._4)
        case "x" => row.update(k, cur._5)
        case "y" => row.update(k, cur._6)
      }
      k += 1
    }
    row
  }
  override def close(): Unit = ()
}
