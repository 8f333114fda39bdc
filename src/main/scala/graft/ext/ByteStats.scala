package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** The multimodal "decode / feature-extract" stub (BASELINE.json:6):
  * byte-level features over an opaque binary column, standing in for an
  * image/audio decoder (no media libs ship in this container — the
  * deterministic fake mandated by the builder contract). The Spark-side
  * plumbing is real: a typed Catalyst expression binary → struct, usable
  * anywhere a decoded-feature column would be.
  *
  * CodegenFallback is deliberate: a real decoder calls a native library
  * per row, which is exactly the non-codegen boundary this models. Keep
  * it OUT of hot relational loops; it runs map-side only.
  */
case class ByteStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("min_byte", IntegerType, nullable = false),
    StructField("max_byte", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"byte_stats needs binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) InternalRow(0, 0.0, 0, 0)
    else {
      var sum = 0L; var mn = 255; var mx = 0; var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b; if (b < mn) mn = b; if (b > mx) mx = b; i += 1
      }
      InternalRow(bytes.length, sum.toDouble / bytes.length, mn, mx)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ByteStats =
    copy(child = newChild)
}
