package graft.zonal

import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Exact scan statistics from geometry (r18): the pruned partition
  * manifests know their in-bounds cell counts exactly, so the DSv2
  * scans report PRECISE numRows/sizeInBytes — Catalyst's join-side
  * sizing and AQE see a heavily-windowed cube scan as the tiny
  * relation it is and BROADCAST it (a statistics-less DSv2 scan
  * defaults to "huge" and never broadcasts).
  */
private[zonal] final case class GeomStats(rows: Long, rowBytes: Long)
    extends Statistics {
  override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
  override def sizeInBytes(): java.util.OptionalLong =
    java.util.OptionalLong.of(rows * rowBytes)
}

/** COUNT(*) answered from METADATA alone (r18 — the parquet
  * footer-count optimization for the DSv2 quartet): when Spark pushes
  * a bare `count(*)` aggregation (no grouping, no filters — Spark only
  * attempts aggregate pushdown when every post-scan filter is gone,
  * and the builders additionally refuse if any window clamp was
  * accepted), the scan is replaced by this ONE-partition, one-row
  * source whose value is the dimension product from the already-parsed
  * header/manifest. At 100 TB a `SELECT count(*) FROM cube` touches
  * zero chunks, zero stripes, zero tasks-per-chunk — one metadata row.
  * Exactness holds because fill is a VALUE in every format here
  * (absent chunks decode to fill cells, never to missing rows).
  */


final class MetaCountScan(count: Long, what: String) extends Scan with Batch
    with SupportsReportStatistics {
  override def estimateStatistics(): Statistics = GeomStats(1L, 8L)
  override def readSchema(): StructType =
    StructType(Seq(StructField("count", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String = s"graft-meta-count $what count=$count"
  override def planInputPartitions(): Array[InputPartition] =
    Array(MetaCountPartition(count))
  override def createReaderFactory(): PartitionReaderFactory =
    MetaCountReaderFactory
}

final case class MetaCountPartition(count: Long) extends InputPartition

object MetaCountReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var done = false
      private val n = p.asInstanceOf[MetaCountPartition].count
      override def next(): Boolean = { val h = !done; done = true; h }
      override def get(): InternalRow = {
        val row = new GenericInternalRow(1)
        row.update(0, n)
        row
      }
      override def close(): Unit = ()
    }
}

/** One-row metadata-answer scan (r19 — the MIN/MAX generalization of
  * [[MetaCountScan]]): a completely-pushed aggregation whose answer is
  * EXACT from trusted metadata (the `_tile_stats` sidecar) plans this
  * single-partition, single-row scan — zero data files opened.
  */
final class MetaRowScan(schema: StructType, values: Array[Any], what: String)
    extends Scan with Batch with SupportsReportStatistics {
  require(schema.length == values.length, s"$what: ${schema.length} fields, ${values.length} values")
  override def estimateStatistics(): Statistics = GeomStats(1L, 8L * values.length)
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-meta-row $what ${schema.fieldNames.zip(values).map { case (n, v) => s"$n=$v" }.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(MetaRowPartition(values))
  override def createReaderFactory(): PartitionReaderFactory = MetaRowReaderFactory
}

final case class MetaRowPartition(values: Array[Any]) extends InputPartition

object MetaRowReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var done = false
      private val vs = p.asInstanceOf[MetaRowPartition].values
      override def next(): Boolean = { val h = !done; done = true; h }
      override def get(): InternalRow = {
        val row = new GenericInternalRow(vs.length)
        var i = 0
        while (i < vs.length) { row.update(i, vs(i)); i += 1 }
        row
      }
      override def close(): Unit = ()
    }
}
