package graft.functions.catalyst

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable aggregation state for [[BoundedCollectAgg]]: an exact group
  * count plus the collected items, where the item list is DROPPED (and
  * stays dropped) the moment the count exceeds the cap. `cnt` keeps
  * counting so the caller can distinguish "small bucket" from
  * "over-cap bucket" exactly.
  */
final class BoundedCollectBuf(var cnt: Long, val items: ArrayBuffer[Any])

/** `collect_list` with a hard per-group memory bound: collects up to
  * `cap` non-null child values per group and counts ALL of them; a group
  * whose count exceeds the cap frees its list immediately and yields an
  * EMPTY `items` array (with the exact `cnt` preserved), instead of ever
  * materializing the oversized list in the aggregation buffer.
  *
  * This is the single-shuffle form of the dedup hot-bucket guard
  * ([[graft.operators.Dedup]] `bucketPairs`): the alternative — a
  * `groupBy.count` pre-election plus a left-semi join back onto the
  * input — shuffles the banded set twice (measured ~2x on the
  * minhash-banding query family); a plain `collect_list` + post-filter
  * shuffles once but buffers the hot bucket (millions of members at
  * 100 TB) in ONE in-memory reducer list before the filter can drop it.
  * Here the buffer can never hold more than `cap + 1` items per group
  * on any path — update, partial merge, or final merge — so one
  * exchange does the whole job with O(cap) memory per key.
  *
  * Output is `struct<items: array<childType>, cnt: bigint>`; callers
  * filter on `cnt` (e.g. `2 <= cnt <= cap`) and explode `items`.
  * Partial aggregation applies (the buffer merges associatively: counts
  * add, lists concatenate-or-drop), so map-side combine still bounds
  * the shuffle volume per bucket to `cap` items per map task.
  */
case class BoundedCollectAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedCollectBuf] with UnaryLike[Expression] {
  require(cap >= 1, s"cap=$cap out of range (must be >= 1)")

  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(child.dataType, containsNull = false),
      nullable = false),
    StructField("cnt", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BoundedCollectBuf =
    new BoundedCollectBuf(0L, new ArrayBuffer[Any])

  override def update(buf: BoundedCollectBuf, input: InternalRow): BoundedCollectBuf = {
    val v = child.eval(input)
    if (v != null) {
      buf.cnt += 1
      if (buf.cnt <= cap) buf.items += InternalRow.copyValue(v)
      else if (buf.items.nonEmpty) buf.items.clear()
    }
    buf
  }

  override def merge(buf: BoundedCollectBuf, other: BoundedCollectBuf): BoundedCollectBuf = {
    buf.cnt += other.cnt
    if (buf.cnt <= cap) buf.items ++= other.items
    else if (buf.items.nonEmpty) buf.items.clear()
    buf
  }

  override def eval(buf: BoundedCollectBuf): Any = {
    val items =
      if (buf.cnt > cap) new GenericArrayData(Array.empty[Any])
      else new GenericArrayData(buf.items.toArray)
    new GenericInternalRow(Array[Any](items, buf.cnt))
  }

  // serialize() runs once per GROUP at the partial-aggregation output —
  // millions of times per map task on a banded dedup set — so the
  // projection and scratch buffers are per-operator-instance state, not
  // per-call allocations (UnsafeProjection.create per call would pay an
  // expression-tree + codegen-cache lookup per group).
  @transient private lazy val itemProj =
    UnsafeProjection.create(Array[DataType](child.dataType))
  @transient private lazy val projInput = new GenericInternalRow(1)
  @transient private lazy val scratch = new Array[Byte](4096)

  // Partial buffers cross the exchange as bytes: each item is projected
  // into a single-field UnsafeRow and length-prefixed (over-cap buffers
  // serialize as count-only — zero items, so the hot bucket never even
  // ships).
  override def serialize(buf: BoundedCollectBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.cnt)
    out.writeInt(buf.items.length)
    buf.items.foreach { v =>
      projInput.update(0, v)
      val u = itemProj(projInput)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, scratch)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val cnt = in.readLong()
    val n = in.readInt()
    val items = new ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      val sz = in.readInt()
      val b = new Array[Byte](sz)
      in.readFully(b)
      val u = new UnsafeRow(1)
      u.pointTo(b, sz)
      items += InternalRow.copyValue(u.get(0, child.dataType))
      i += 1
    }
    new BoundedCollectBuf(cnt, items)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectAgg =
    copy(child = newChild)
}
