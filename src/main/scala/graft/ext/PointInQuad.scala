package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Even-odd ray-casting point-in-quadrilateral over integer coordinates
  * — the codegen'd twin of [[graft.zonal.Cube.pipSql]] (same division-
  * free crossing test, same half-open edge rule, exact long arithmetic;
  * equivalence asserted in ExtSpec).
  *
  * Why an Expression and not the composed SQL: inlining the sample
  * coordinates into the predicate's ~24 term references makes the
  * generated eval method exceed HotSpot's huge-method JIT limit, so the
  * whole filter runs in the bytecode interpreter — measured 25 s vs
  * ~1 s at sf0.1 on the coverage supersampler. This node compiles to
  * one call into a tight static loop.
  *
  * Children: (px, py, vx0, vy0, vx1, vy1, vx2, vy2, vx3, vy3), any
  * integral type.
  */
case class PointInQuad(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size != 10)
      TypeCheckResult.TypeCheckFailure(s"point_in_quad needs 10 arguments, got ${children.size}")
    else if (!children.forall(c => c.dataType == IntegerType || c.dataType == LongType
        || c.dataType == ShortType || c.dataType == ByteType))
      TypeCheckResult.TypeCheckFailure(
        s"point_in_quad needs integral inputs, got ${children.map(_.dataType).mkString(", ")}")
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
    PointInQuad.inside(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("pq")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val anyNull =
      if (nullable) evals.map(_.isNull.toString).mkString(" || ") else "false"
    val fills = evals.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = (long) ${e.value};" }.mkString("\n")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $anyNull;
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        long[] $arr = new long[10];
        $fills
        ${ev.value} = graft.ext.PointInQuad.inside($arr);
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PointInQuad =
    copy(children = newChildren)
}

object PointInQuad {
  /** v = (px, py, x0, y0, x1, y1, x2, y2, x3, y3). */
  def inside(v: Array[Long]): Boolean = {
    val px = v(0)
    val py = v(1)
    var crossings = 0
    var e = 0
    while (e < 4) {
      val xi = v(2 + 2 * e); val yi = v(3 + 2 * e)
      val j = (e + 1) % 4
      val xj = v(2 + 2 * j); val yj = v(3 + 2 * j)
      if ((yi > py) != (yj > py)) {
        val dy = yj - yi
        val cross = (xj - xi) * (py - yi) - (px - xi) * dy
        if ((dy > 0 && cross > 0) || (dy < 0 && cross < 0)) crossings += 1
      }
      e += 1
    }
    (crossings & 1) == 1
  }
}
