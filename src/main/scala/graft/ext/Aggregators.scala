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
