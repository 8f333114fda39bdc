package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** OGC WKB geometry support (SURVEY.md §1.2: zone geometry as WKB
  * `BinaryType`; §2.14 `zonal_stats_polygon_n` / `zonal_stats_multipolygon`).
  *
  * Two codegen'd expressions:
  *   - `make_wkb(array<struct<part,ring,i,x,y>>)` — assemble standard
  *     little-endian WKB (Polygon when one part, MultiPolygon otherwise;
  *     rings closed per spec) from a SORTED flat vertex list. Runs once
  *     per zone on the tiny broadcast side.
  *   - `point_in_wkb(px, py, geom)` — even-odd crossing test of an
  *     integer lattice point against every ring of the geometry, the
  *     n-ary generalization of [[PointInQuad]]: coordinates are decoded
  *     to longs, the crossing test is the same division-free exact
  *     integer arithmetic with the same half-open edge rule, so the
  *     DuckDB oracle can replay it over the unnested vertex table.
  *     This is the hot cell-side predicate — one static call per row.
  *
  * Parity over ALL rings gives even-odd semantics: holes subtract,
  * disjoint parts union — no containment bookkeeping needed.
  */
object Wkb {

  /** Assemble WKB from vertices sorted by (part, ring, i). Each struct
    * is (part:int, ring:int, i:int, x:int, y:int). Rings are emitted
    * closed (first point repeated last) per the OGC spec.
    */
  def build(verts: ArrayData): Array[Byte] = {
    val n = verts.numElements()
    // parts -> rings -> points, preserving the sorted order
    val parts = scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.LinkedHashMap[Int, scala.collection.mutable.ArrayBuffer[(Int, Int)]]]
    var k = 0
    while (k < n) {
      val row = verts.getStruct(k, 5)
      val rings = parts.getOrElseUpdate(row.getInt(0),
        scala.collection.mutable.LinkedHashMap.empty)
      rings.getOrElseUpdate(row.getInt(1), scala.collection.mutable.ArrayBuffer.empty)
        .append((row.getInt(3), row.getInt(4)))
      k += 1
    }
    def polySize(rings: Iterable[Iterable[(Int, Int)]]): Int =
      1 + 4 + 4 + rings.map(r => 4 + (r.size + 1) * 16).sum
    val multi = parts.size > 1
    val total = (if (multi) 1 + 4 + 4 else 0) + parts.valuesIterator.map(p => polySize(p.values)).sum
    val buf = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (multi) { buf.put(1.toByte); buf.putInt(6); buf.putInt(parts.size) }
    parts.valuesIterator.foreach { rings =>
      buf.put(1.toByte); buf.putInt(3); buf.putInt(rings.size)
      rings.valuesIterator.foreach { pts =>
        buf.putInt(pts.size + 1)
        (pts :+ pts.head).foreach { case (x, y) =>
          buf.putDouble(x.toDouble); buf.putDouble(y.toDouble)
        }
      }
    }
    buf.array()
  }

  /** Parse a Polygon/MultiPolygon WKB back to its CLOSED rings,
    * flattened across parts (even-odd semantics make the part structure
    * immaterial to every consumer here — same flattening the shapefile
    * writer's Polygon record type uses). The exact inverse of [[build]]
    * modulo that flattening; integral-coordinate discipline as
    * [[pointIn]] (fractional vertices throw, never truncate).
    */
  def ringsOf(wkb: Array[Byte]): Seq[Seq[(Int, Int)]] = {
    val buf = java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[(Int, Int)]]
    def polygon(): Unit = {
      require(buf.get() == 1.toByte, "big-endian WKB unsupported")
      buf.getInt match {
        case 3 =>
          val nRings = buf.getInt
          var r = 0
          while (r < nRings) {
            val npts = buf.getInt
            out += Seq.tabulate(npts) { _ =>
              val xd = buf.getDouble; val yd = buf.getDouble
              if (xd.toInt.toDouble != xd || yd.toInt.toDouble != yd)
                throw new IllegalArgumentException(
                  s"wkb rings require integral lattice coordinates, got ($xd, $yd)")
              (xd.toInt, yd.toInt)
            }
            r += 1
          }
        case 6 =>
          val nPolys = buf.getInt
          var p = 0
          while (p < nPolys) { polygon(); p += 1 }
        case t => throw new IllegalArgumentException(s"unsupported WKB type $t")
      }
    }
    polygon()
    out.toSeq
  }

  /** Even-odd containment of the integer point (px, py): crossing
    * parity across every ring of every polygon. Exact long arithmetic,
    * half-open edge rule — identical to [[PointInQuad.inside]] and to
    * the unnested-edge SQL the oracles replay.
    */
  def pointIn(px: Long, py: Long, wkb: Array[Byte]): Boolean = {
    val buf = java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var crossings = 0
    def ring(): Unit = {
      val npts = buf.getInt
      var x0 = 0L; var y0 = 0L
      var j = 0
      while (j < npts) {
        val xd = buf.getDouble
        val yd = buf.getDouble
        val x = xd.toLong
        val y = yd.toLong
        // The crossing test is exact INTEGER arithmetic on the shared
        // lattice (SURVEY §1.2 CRS boundary). Externally supplied WKB
        // with fractional vertices must fail loudly here — silent
        // truncation would move polygon edges by up to a whole cell.
        if (x.toDouble != xd || y.toDouble != yd)
          throw new IllegalArgumentException(
            s"point_in_wkb requires integral lattice coordinates, got ($xd, $yd); " +
              "align/reproject geometry to the cube grid upstream")
        if (j > 0 && ((y0 > py) != (y > py))) {
          val dy = y - y0
          val cross = (x - x0) * (py - y0) - (px - x0) * dy
          if ((dy > 0 && cross > 0) || (dy < 0 && cross < 0)) crossings += 1
        }
        x0 = x; y0 = y; j += 1
      }
    }
    def polygon(): Unit = {
      require(buf.get() == 1.toByte, "big-endian WKB unsupported")
      val tpe = buf.getInt
      tpe match {
        case 3 =>
          val nRings = buf.getInt
          var r = 0
          while (r < nRings) { ring(); r += 1 }
        case 6 =>
          val nPolys = buf.getInt
          var p = 0
          while (p < nPolys) { polygon(); p += 1 }
        case t => throw new IllegalArgumentException(s"unsupported WKB type $t")
      }
    }
    polygon()
    (crossings & 1) == 1
  }

  /** EXACT covered area of cell (cx, cy) under the geometry's even-odd
    * semantics, as the 2·L²·area BIGINT numerator ([[CellCover]]): each
    * polygon contributes |clip(exterior ring)| − Σ|clip(interior
    * rings)| — valid because holes lie inside their exterior and parts
    * are disjoint (the OGC polygon validity rules both zone families
    * obey). Same integral-coordinate and lattice-local contracts as
    * [[pointIn]]/[[CellCover]]; violations throw, never truncate.
    */
  def cover2L2(cx: Long, cy: Long, wkb: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var total = 0L
    def ring(sign: Long): Unit = {
      val npts = buf.getInt
      val xs = new Array[Long](npts)
      val ys = new Array[Long](npts)
      var j = 0
      while (j < npts) {
        val xd = buf.getDouble
        val yd = buf.getDouble
        xs(j) = xd.toLong; ys(j) = yd.toLong
        if (xs(j).toDouble != xd || ys(j).toDouble != yd)
          throw new IllegalArgumentException(
            s"cell_cover_wkb requires integral lattice coordinates, got ($xd, $yd); " +
              "align/reproject geometry to the cube grid upstream")
        j += 1
      }
      // WKB rings are closed (first vertex repeated) — clip the OPEN ring
      val nOpen = if (npts > 1 && xs(0) == xs(npts - 1) && ys(0) == ys(npts - 1)) npts - 1 else npts
      total += sign * CellCover.ringCover2L2(xs, ys, nOpen, cx, cy)
    }
    def polygon(): Unit = {
      require(buf.get() == 1.toByte, "big-endian WKB unsupported")
      buf.getInt match {
        case 3 =>
          val nRings = buf.getInt
          var r = 0
          while (r < nRings) { ring(if (r == 0) 1L else -1L); r += 1 }
        case 6 =>
          val nPolys = buf.getInt
          var p = 0
          while (p < nPolys) { polygon(); p += 1 }
        case t => throw new IllegalArgumentException(s"unsupported WKB type $t")
      }
    }
    polygon()
    total
  }

  /** Field order of the [[stats]] struct (shared with [[WkbStats]]). */
  val StatsSchema: StructType = StructType(Seq(
    StructField("area2", LongType, nullable = false),     // 2·area (even-odd)
    StructField("cx_num", LongType, nullable = false),    // centroid_x · 3·area2
    StructField("cy_num", LongType, nullable = false),
    StructField("n_parts", IntegerType, nullable = false),
    StructField("n_rings", IntegerType, nullable = false),
    StructField("n_verts", IntegerType, nullable = false), // open vertices
    StructField("gxmin", LongType, nullable = false),
    StructField("gymin", LongType, nullable = false),
    StructField("gxmax", LongType, nullable = false),
    StructField("gymax", LongType, nullable = false)))

  /** Exact geometry metrics in ONE WKB pass, all integer arithmetic:
    * `area2` = 2·area under even-odd semantics (per-ring |shoelace|,
    * exterior +, holes −, so ring orientation is irrelevant), centroid
    * NUMERATORS (centroid = num / (3·area2) — the single IEEE divide
    * happens in the query, identically on both engines), part/ring/
    * open-vertex counts, and the vertex bbox. Same integral-coordinate
    * contract as [[pointIn]]: fractional vertices throw, never truncate.
    */
  def stats(wkb: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val buf = java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var area2 = 0L; var cxNum = 0L; var cyNum = 0L
    var nParts = 0; var nRings = 0; var nVerts = 0
    var gxmin = Long.MaxValue; var gymin = Long.MaxValue
    var gxmax = Long.MinValue; var gymax = Long.MinValue
    def ring(holeSign: Long): Unit = {
      val npts = buf.getInt
      val xs = new Array[Long](npts)
      val ys = new Array[Long](npts)
      var j = 0
      while (j < npts) {
        val xd = buf.getDouble
        val yd = buf.getDouble
        xs(j) = xd.toLong; ys(j) = yd.toLong
        if (xs(j).toDouble != xd || ys(j).toDouble != yd)
          throw new IllegalArgumentException(
            s"wkb_stats requires integral lattice coordinates, got ($xd, $yd); " +
              "align/reproject geometry to the cube grid upstream")
        j += 1
      }
      val nOpen = if (npts > 1 && xs(0) == xs(npts - 1) && ys(0) == ys(npts - 1)) npts - 1 else npts
      nRings += 1; nVerts += nOpen
      var a = 0L; var sx = 0L; var sy = 0L
      var i = 0
      while (i < nOpen) {
        val k = if (i + 1 == nOpen) 0 else i + 1
        val cross = xs(i) * ys(k) - xs(k) * ys(i)
        a += cross
        sx += (xs(i) + xs(k)) * cross
        sy += (ys(i) + ys(k)) * cross
        if (xs(i) < gxmin) gxmin = xs(i)
        if (ys(i) < gymin) gymin = ys(i)
        if (xs(i) > gxmax) gxmax = xs(i)
        if (ys(i) > gymax) gymax = ys(i)
        i += 1
      }
      val orient = if (a < 0) -1L else 1L // normalize CW/CCW away
      area2 += holeSign * orient * a
      cxNum += holeSign * orient * sx
      cyNum += holeSign * orient * sy
    }
    def polygon(): Unit = {
      require(buf.get() == 1.toByte, "big-endian WKB unsupported")
      buf.getInt match {
        case 3 =>
          nParts += 1
          val nRingsHere = buf.getInt
          var r = 0
          while (r < nRingsHere) { ring(if (r == 0) 1L else -1L); r += 1 }
        case 6 =>
          val nPolys = buf.getInt
          var p = 0
          while (p < nPolys) { polygon(); p += 1 }
        case t => throw new IllegalArgumentException(s"unsupported WKB type $t")
      }
    }
    polygon()
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      area2, cxNum, cyNum, nParts, nRings, nVerts, gxmin, gymin, gxmax, gymax))
  }

  /** WKB → GeoJSON geometry text (`{"type":"Polygon","coordinates":…}`
    * or MultiPolygon), integer coordinates, no whitespace — the exact
    * serialization the DuckDB oracle re-derives by string aggregation
    * over the vertex table, so the sink is hash-gated byte-for-byte.
    * Same integral-coordinate contract as the other WKB expressions.
    */
  def toGeoJson(wkb: Array[Byte]): String = {
    val buf = java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val sb = new java.lang.StringBuilder(wkb.length)
    def ring(): Unit = {
      val npts = buf.getInt
      sb.append('[')
      var j = 0
      while (j < npts) {
        val xd = buf.getDouble
        val yd = buf.getDouble
        val x = xd.toLong
        val y = yd.toLong
        if (x.toDouble != xd || y.toDouble != yd)
          throw new IllegalArgumentException(
            s"wkb_geojson requires integral lattice coordinates, got ($xd, $yd)")
        if (j > 0) sb.append(',')
        sb.append('[').append(x).append(',').append(y).append(']')
        j += 1
      }
      sb.append(']')
    }
    def polyBody(): Unit = { // rings of one polygon: [...],[...]
      val nRings = buf.getInt
      sb.append('[')
      var r = 0
      while (r < nRings) {
        if (r > 0) sb.append(',')
        ring()
        r += 1
      }
      sb.append(']')
    }
    require(buf.get() == 1.toByte, "big-endian WKB unsupported")
    buf.getInt match {
      case 3 =>
        sb.append("{\"type\":\"Polygon\",\"coordinates\":")
        polyBody()
        sb.append('}')
      case 6 =>
        sb.append("{\"type\":\"MultiPolygon\",\"coordinates\":[")
        val nPolys = buf.getInt
        var p = 0
        while (p < nPolys) {
          if (p > 0) sb.append(',')
          require(buf.get() == 1.toByte, "big-endian WKB unsupported")
          require(buf.getInt == 3, "MultiPolygon parts must be Polygons")
          polyBody()
          p += 1
        }
        sb.append("]}")
      case t => throw new IllegalArgumentException(s"unsupported WKB type $t")
    }
    sb.toString
  }
}

/** `wkb_geojson(geom)` — see [[Wkb.toGeoJson]]. */
case class WkbGeoJson(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"wkb_geojson needs binary WKB, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      Wkb.toGeoJson(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.ext.Wkb.toGeoJson($a));")

  override protected def withNewChildInternal(newChild: Expression): WkbGeoJson =
    copy(child = newChild)
}

/** `wkb_stats(geom)` — see [[Wkb.stats]]. */
case class WkbStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Wkb.StatsSchema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"wkb_stats needs binary WKB, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    Wkb.stats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.ext.Wkb.stats($a);")

  override protected def withNewChildInternal(newChild: Expression): WkbStats =
    copy(child = newChild)
}

/** `make_wkb(verts)` — see [[Wkb.build]]. */
case class MakeWkb(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _)
        if fs.length == 5 && fs.forall(_.dataType == IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"make_wkb needs array<struct<part:int,ring:int,i:int,x:int,y:int>>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    Wkb.build(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.ext.Wkb.build($a);")

  override protected def withNewChildInternal(newChild: Expression): MakeWkb =
    copy(child = newChild)
}

/** `point_in_wkb(px, py, geom)` — see [[Wkb.pointIn]]. */
case class PointInWkb(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = {
    def integral(t: DataType) =
      t == IntegerType || t == LongType || t == ShortType || t == ByteType
    if (integral(first.dataType) && integral(second.dataType)
        && third.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"point_in_wkb needs (integral, integral, binary), got " +
        s"${first.dataType}, ${second.dataType}, ${third.dataType}")
  }

  override def nullSafeEval(px: Any, py: Any, wkb: Any): Any =
    Wkb.pointIn(px.asInstanceOf[Number].longValue(),
      py.asInstanceOf[Number].longValue(), wkb.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, py, wkb) =>
      s"${ev.value} = graft.ext.Wkb.pointIn((long) $px, (long) $py, $wkb);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PointInWkb =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `cell_cover_wkb(cx, cy, geom)` — see [[Wkb.cover2L2]]. */
case class CellCoverWkb(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def integral(t: DataType) =
      t == IntegerType || t == LongType || t == ShortType || t == ByteType
    if (integral(first.dataType) && integral(second.dataType)
        && third.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cell_cover_wkb needs (integral, integral, binary), got " +
        s"${first.dataType}, ${second.dataType}, ${third.dataType}")
  }

  override def nullSafeEval(cx: Any, cy: Any, wkb: Any): Any =
    Wkb.cover2L2(cx.asInstanceOf[Number].longValue(),
      cy.asInstanceOf[Number].longValue(), wkb.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cx, cy, wkb) =>
      s"${ev.value} = graft.ext.Wkb.cover2L2((long) $cx, (long) $cy, $wkb);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CellCoverWkb =
    copy(first = newFirst, second = newSecond, third = newThird)
}
