package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_list` with a hard per-group element bound, enforced DURING
  * accumulation (r22 — VERDICT r21 wrong-#1/#2).
  *
  * The r21 bucket-collect pair generators guarded the LSH mega-bucket
  * cap with `CASE WHEN size(collect_list(...)) <= cap ... raise_error`,
  * i.e. AFTER the aggregation buffer had already materialized the whole
  * bucket: on a degenerate corpus region the query still failed
  * (semantics preserved) but as an executor OOM instead of the named
  * refusal — at 100 TB a stop-word bucket is billions of rows in ONE
  * buffer. This aggregate bounds the buffer itself:
  *
  *  - every partial AND final buffer holds at most `cap + 1` elements —
  *    the overflow state is "length == cap + 1", so serialized partial
  *    buffers stay O(cap) on the map side too (stricter than a count
  *    pre-pass, which still shuffles and sorts the mega bucket's rows);
  *  - `errMsg == Some(...)`: the (cap+1)-th element THROWS the named
  *    error — the task dies on the first overflowing element, exactly
  *    when the old in-plan raise_error would have fired, megabytes not
  *    gigabytes in;
  *  - `errMsg == None` (drop mode, the `dedup_containment` df-bound):
  *    overflowing groups evaluate to NULL so a downstream filter
  *    excludes them by definition — boilerplate grams carry no identity
  *    signal — and their posting lists are never materialized past
  *    cap + 1 ids.
  *
  * Plan topology is IDENTICAL to plain collect_list (one
  * ObjectHashAggregate pair, partial + final), so the r21 one-pipeline-
  * evaluation win is untouched.
  */
case class BoundedCollectList(
    child: Expression,
    cap: Int,
    errMsg: Option[String],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(cap >= 1, s"bounded_collect_list cap must be >= 1, got $cap")

  // the Collect base declares nullable=false (collect_list yields an
  // empty array, never NULL); drop mode DOES yield NULL for overflowed
  // groups, and codegen trusts this flag
  override def nullable: Boolean = errMsg.isEmpty

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectList =
    copy(child = newChild)

  override protected def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)
  override protected lazy val bufferElementType: DataType = child.dataType

  private def overflowed(buffer: mutable.ArrayBuffer[Any]): Boolean =
    buffer.length > cap

  private def raiseIfGuarded(): Unit =
    errMsg.foreach(m => throw new IllegalStateException(m))

  override def update(buffer: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null && !overflowed(buffer)) {
      buffer += convertToBufferElement(v)
      if (overflowed(buffer)) raiseIfGuarded()
    }
    buffer
  }

  override def merge(buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (it.hasNext && !overflowed(buffer)) {
      buffer += it.next()
      if (overflowed(buffer)) raiseIfGuarded()
    }
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    if (overflowed(buffer)) { raiseIfGuarded(); null }
    else new GenericArrayData(buffer.toArray)

  override def prettyName: String = "bounded_collect_list"
}
