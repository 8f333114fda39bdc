package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** EXACT partial-coverage of a unit cell by an integer-vertex quad ring
  * (SURVEY §2.9 `zonal_stats_coverage_exact` — replaces the 4×4
  * supersampling approximation with true clipped area).
  *
  * Algorithm: Sutherland–Hodgman clip of the ring against the cell's
  * four half-planes, then the shoelace sum — all in LONG integer
  * arithmetic on a ×L lattice with L = 840 = lcm(1..8). Every ring edge
  * delta within the 8-wide zone envelopes divides L and every clip
  * plane sits at a multiple of L, so each intersection coordinate is
  * exactly integral on the lattice and each long division in the clip
  * is exact (the dividend is always an exact multiple of the divisor —
  * no rounding anywhere). The return value is the shoelace numerator
  * `2·L²·area(ring ∩ cell)`, an exact BIGINT in [0, 2·L²] that DuckDB
  * reproduces bit-for-bit by replaying the same clip with list lambdas
  * ([[graft.zonal.Cube.coverClipSql]]), so the oracle compares integers,
  * never floats.
  *
  * Children: (cx, cy, x0, y0, x1, y1, x2, y2, x3, y3), any integral
  * type. Cell = [cx, cx+1] × [cy, cy+1].
  */
case class CellCover(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size != 10)
      TypeCheckResult.TypeCheckFailure(s"cell_cover needs 10 arguments, got ${children.size}")
    else if (!children.forall(c => c.dataType == IntegerType || c.dataType == LongType
        || c.dataType == ShortType || c.dataType == ByteType))
      TypeCheckResult.TypeCheckFailure(
        s"cell_cover needs integral inputs, got ${children.map(_.dataType).mkString(", ")}")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val v = new Array[Long](10)
    var i = 0
    while (i < 10) {
      val x = children(i).eval(input)
      if (x == null) return null
      v(i) = x.asInstanceOf[Number].longValue()
      i += 1
    }
    CellCover.cover2L2(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("cc")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val anyNull =
      if (nullable) evals.map(_.isNull.toString).mkString(" || ") else "false"
    val fills = evals.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = (long) ${e.value};" }.mkString("\n")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        long[] $arr = new long[10];
        $fills
        ${ev.value} = graft.ext.CellCover.cover2L2($arr);
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CellCover =
    copy(children = newChildren)
}

object CellCover {
  /** Lattice scale: lcm(1..8); every envelope-bounded edge delta divides it. */
  val L = 840L

  /** `cover2L2 / Denom` = covered fraction of the unit cell. */
  val Denom: Long = 2L * L * L // 1411200

  /** v = (cx, cy, x0, y0, x1, y1, x2, y2, x3, y3) — returns
    * 2·L²·area(quad ∩ [cx,cx+1]×[cy,cy+1]), exact.
    */
  def cover2L2(v: Array[Long]): Long = {
    val xs = Array(v(2), v(4), v(6), v(8))
    val ys = Array(v(3), v(5), v(7), v(9))
    ringCover2L2(xs, ys, 4, v(0), v(1))
  }

  private def exactDiv(num: Long, den: Long): Long = {
    // the lattice contract (class doc) makes every clip division
    // remainder-free; a nonzero remainder means the ring's edge deltas
    // don't divide L — fail loudly rather than return a wrong area
    if (num % den != 0)
      throw new IllegalArgumentException(
        s"cell_cover: ring edge delta does not divide the lattice scale $L — " +
          "geometry is outside the engine's lattice-local contract (edge deltas must be ≤ 8)")
    num / den
  }

  /** General n-vertex core: 2·L²·area(ring ∩ cell(cx, cy)) for an OPEN
    * ring (no repeated closing vertex) of UNSCALED integer vertices.
    */
  def ringCover2L2(vxs: Array[Long], vys: Array[Long], nIn: Int, cx: Long, cy: Long): Long = {
    // ring on the ×L lattice; SH against a box adds ≤ 4 vertices
    var nx = new Array[Long](nIn + 6)
    var ny = new Array[Long](nIn + 6)
    var n = nIn
    var i = 0
    while (i < nIn) { nx(i) = vxs(i) * L; ny(i) = vys(i) * L; i += 1 }

    // one half-plane clip; axis 0 = x, 1 = y; keep coord >= b (ge) or <= b
    def clip(axis: Int, b: Long, ge: Boolean): Unit = {
      if (n == 0) return
      // each edge emits ≤ 2 points, so 2n bounds any ring, convex or not
      val ox = new Array[Long](2 * n + 2)
      val oy = new Array[Long](2 * n + 2)
      var m = 0
      var j = 0
      while (j < n) {
        val k = if (j + 1 == n) 0 else j + 1
        val px = nx(j); val py = ny(j)
        val qx = nx(k); val qy = ny(k)
        val pc = if (axis == 0) px else py
        val qc = if (axis == 0) qx else qy
        val pin = if (ge) pc >= b else pc <= b
        val qin = if (ge) qc >= b else qc <= b
        if (pin != qin) {
          if (axis == 0) {
            ox(m) = b
            oy(m) = py + exactDiv((qy - py) * (b - px), qx - px)
          } else {
            ox(m) = px + exactDiv((qx - px) * (b - py), qy - py)
            oy(m) = b
          }
          m += 1
        }
        if (qin) { ox(m) = qx; oy(m) = qy; m += 1 }
        j += 1
      }
      nx = ox; ny = oy; n = m
    }

    val bx = cx * L
    val by = cy * L
    clip(0, bx, ge = true)
    clip(0, bx + L, ge = false)
    clip(1, by, ge = true)
    clip(1, by + L, ge = false)

    var s = 0L
    var j = 0
    while (j < n) {
      val k = if (j + 1 == n) 0 else j + 1
      s += nx(j) * ny(k) - nx(k) * ny(j)
      j += 1
    }
    math.abs(s)
  }
}
