package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ROLLING [[PolyHash]] over every `n`-codepoint window of a string
  * (r17 — the O(len) formulation behind `dedup_substring`: hashing
  * each window independently is O(len·n), which benched at 8 s on the
  * sf0.1 corpus; the polynomial rolls in O(1) per step):
  *
  *   h(i)   = Σ_j c_{i+j}·31^{n-1-j} mod p          (p = 1 000 000 007)
  *   h(i+1) = (h(i) − c_i·31^{n-1})·31 + c_{i+n} mod p
  *
  * Returns `array<long>` of length `len − n + 1` (empty when the
  * string is shorter than `n`), element k = `poly_hash(substring(s,
  * k+1, n))` EXACTLY — every intermediate stays under 2^63 (h < 2^30,
  * c·pow < 2^51) and the result is pinned against the per-window fold
  * in ExtSpec. Windows count Unicode CODE POINTS, matching
  * [[PolyHash]]'s iteration and both engines' substring/length
  * semantics.
  *
  * Codegen'd via a static helper (a CodegenFallback here would drop
  * the WHOLE Generate + partial-agg stage out of whole-stage codegen —
  * measured 2.3 s vs sub-second for the downstream hash agg at sf0.1).
  */
case class PolyHashShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"poly_hash_shingles needs (string, int), got ($l, $r)")
    }

  override def nullSafeEval(str: Any, nAny: Any): Any =
    PolyHashShingles.compute(str.asInstanceOf[UTF8String],
      nAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ext.PolyHashShingles.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolyHashShingles =
    copy(left = newLeft, right = newRight)
}

object PolyHashShingles {
  private val P = 1000000007L

  /** The O(len) rolling scan — shared by the interpreted eval and the
    * generated code (a static call keeps the stage inside whole-stage
    * codegen).
    */
  def compute(str: UTF8String, n: Int): ArrayData = {
    require(n > 0, s"poly_hash_shingles: window $n must be positive")
    val s = str.toString
    // code points, not UTF-16 units — the PolyHash iteration
    val cps = s.codePoints().toArray
    if (cps.length < n) return new GenericArrayData(Array.emptyLongArray)
    var pow = 1L // 31^(n-1) mod p
    var k = 1
    while (k < n) { pow = pow * 31L % P; k += 1 }
    val out = new Array[Long](cps.length - n + 1)
    var h = 0L
    var i = 0
    while (i < n) { h = (31L * h + cps(i)) % P; i += 1 }
    out(0) = h
    var w = 1
    while (w <= cps.length - n) {
      val drop = cps(w - 1) * pow % P
      h = ((h - drop + P) % P * 31L + cps(w + n - 1)) % P
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }
}
