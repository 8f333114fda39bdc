package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (SURVEY.md §2.12 `udaf_geomean`, §4
  * "Histogram / vector-sum aggregates"). `Aggregator[IN, BUF, OUT]` is
  * the Catalyst-native typed-aggregation extension point: the buffer is
  * Tungsten-encoded, merge is associative, and the aggregate runs
  * partial+final like any builtin — the shuffle carries one buffer per
  * (partition, group), never rows.
  */
object Aggregators {

  /** Geometric mean = exp(mean(ln x)): log-domain sum + count buffer. */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Element-wise vector sum + count → centroid (mean vector), over
    * `Array[Float]` embedding columns. The scale rationale: the exploded
    * alternative (posexplode → groupBy(label, pos) → avg) shuffles one
    * ROW PER VECTOR COMPONENT; this buffer shuffles one (dim+1)-double
    * array per (partition, group) — dim× less shuffle volume at any SF.
    * Buffer layout: [count, sum_0, …, sum_{dim-1}], sized lazily from
    * the first vector.
    */
  object VecCentroid extends Aggregator[Array[Float], Array[Double], Array[Double]] {
    override def zero: Array[Double] = Array.empty
    override def reduce(b: Array[Double], v: Array[Float]): Array[Double] = {
      val buf = if (b.isEmpty) new Array[Double](v.length + 1) else b
      buf(0) += 1
      var i = 0
      while (i < v.length) { buf(i + 1) += v(i); i += 1 }
      buf
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    override def finish(b: Array[Double]): Array[Double] =
      if (b.isEmpty) b else b.drop(1).map(_ / b(0))
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** One-pass fixed-width histogram: value → Map(bucket → count).
    * The map-buffer alternative to the long-form groupBy histogram
    * (`zonal_hist`); preferable when the per-group bucket set is small
    * and a single row per group is wanted.
    */
  final class Histogram(width: Double) extends Aggregator[Double, Map[Int, Long], Map[Int, Long]] {
    override def zero: Map[Int, Long] = Map.empty
    override def reduce(m: Map[Int, Long], x: Double): Map[Int, Long] = {
      val b = math.floor(x / width).toInt
      m.updated(b, m.getOrElse(b, 0L) + 1)
    }
    override def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
      b.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
    override def finish(m: Map[Int, Long]): Map[Int, Long] = m
    override def bufferEncoder: Encoder[Map[Int, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Int, Long]]()
    override def outputEncoder: Encoder[Map[Int, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Int, Long]]()
  }
}
