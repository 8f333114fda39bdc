package graft.zonal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}

/** The cube TAIL face (r20): `spark.readStream.format(
  * "graft.zonal.ZarrSource").load(store)` on a rank-3 (t, y, x) ARRAY
  * store streams the GROWING cube — each epoch's cells emit exactly
  * once as its chunk files land. This is the reading half of the
  * ingest pipeline whose writing half is `stream_cube_native`: scenes
  * land → the cube grows → downstream consumers tail it, all three
  * stages declarative streams.
  *
  * Offset = the CONTIGUOUS landed-epoch frontier: epoch e is visible
  * once a `e.i.j` chunk file exists, every epoch below it is visible,
  * and NO staged fragment for it is pending (a write in flight stages
  * fragments under `.stage_*` from planning until commit's cleanup, so
  * a mid-commit epoch never half-emits). A gap holds the frontier —
  * out-of-order appends surface in order.
  *
  * Boundary (refusals by name): rank-3 only, epoch-aligned chunks
  * (chunkT = 1 — the ingest geometry both cube-build ops write), v2
  * keys (a v3/sharded store refuses). An epoch written as pure fill
  * (no chunk files at all) never advances the frontier — the ingest
  * shapes write every epoch's chunks.
  */
object ZarrTail {

  private val ChunkName = """(\d+)\.\d+\.\d+""".r

  /** The contiguous landed-epoch frontier (see class doc). */
  private[zonal] def frontier(path: String): Long = {
    val kids = new java.io.File(path).list()
    if (kids == null) 0L
    else {
      // epochs with a pending staged fragment are NOT landed — their
      // commit is still installing
      val pending: Set[Int] = kids.filter(_.startsWith(".stage")).toSet
        .flatMap { (d: String) =>
          val fs = new java.io.File(new java.io.File(path), d).list()
          if (fs == null) Set.empty[Int]
          else fs.flatMap(_.split("\\.").headOption.flatMap(_.toIntOption)).toSet
        }
      val landed: Set[Int] = kids.collect {
        case ChunkName(ck) => ck.toInt
      }.toSet -- pending
      var e = 0
      while (landed.contains(e)) e += 1
      e.toLong
    }
  }

  private[zonal] def requireTailable(path: String): Unit = {
    val m = Zarr.readMeta(path)
    require(m.rank3,
      s"$path: the cube tail face streams a rank-3 (t, y, x) store — " +
        s"this one is rank-${if (m.rank4) 4 else 2}")
    require(m.chunkT == 1,
      s"$path: tailing wants epoch-aligned chunks (chunkT = 1, the ingest " +
        s"geometry) — got chunkT ${m.chunkT}; refusing rather than emitting " +
        "half-landed epochs")
    require(!m.v3 && !m.sharded,
      s"$path: the tail face reads v2 chunk keys — v3/sharded stores refuse")
  }
}

/** Offset = landed-epoch count. */
final case class ZarrEpochOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

final class ZarrTailStream(path: String, epochsPerBatch: Int)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // AvailableNow drains to THIS snapshot, then the query stops
  @volatile private var availableNowTarget: Long = -1L
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = ZarrTail.frontier(path)

  override def initialOffset(): Offset = ZarrEpochOffset(0L)
  override def deserializeOffset(json: String): Offset =
    ZarrEpochOffset(json.trim.toLong)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-controlled path")
  override def getDefaultReadLimit: ReadLimit =
    if (epochsPerBatch > 0) ReadLimit.maxFiles(epochsPerBatch)
    else ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ZarrEpochOffset].n
    val now =
      if (availableNowTarget >= 0) availableNowTarget
      else ZarrTail.frontier(path)
    val cap = limit match {
      case l: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        s + l.maxFiles()
      case _ => now
    }
    ZarrEpochOffset(math.min(now, cap))
  }
  override def reportLatestOffset(): Offset =
    ZarrEpochOffset(ZarrTail.frontier(path))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ZarrEpochOffset].n
    val e = end.asInstanceOf[ZarrEpochOffset].n
    val m = Zarr.readMeta(path)
    Zarr.chunkRefs3(m, path)
      .filter(r => r.ck >= s && r.ck < e)
      .map(r => Zarr3InputPartition(r): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ZarrReaderFactory(Array("cell_x", "cell_y", "epoch", "value"))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
