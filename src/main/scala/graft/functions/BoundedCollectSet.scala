package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Size-capped distinct-collect aggregate: gathers the DISTINCT string
  * values of a group up to `maxSize` of them; a group that exceeds the
  * cap evaluates to NULL — and, crucially, its buffer is emptied the
  * moment it overflows, so memory per group is O(maxSize) no matter how
  * hot the key is. The output array is sorted by UTF-8 bytes (Spark's
  * own string ordering, so downstream `x < y` comparisons agree with
  * `sort_array` and with the SQL oracles' binary collation).
  *
  * This is the fused form of the posting-list DF-cap discipline: the
  * unfused pipeline pays one aggregation to count per-key frequencies,
  * an anti-join to drop hot keys, and a second aggregation to collect
  * the survivors — three corpus-of-variants exchanges. One pass of this
  * aggregate replaces all three with identical semantics (overflow ⟺
  * distinct count > cap, because the buffer dedupes before counting),
  * and the overflow-clears-buffer rule is what Spark's built-in
  * `collect_set` cannot promise: a pathological key there materializes
  * an unbounded array in the aggregation buffer.
  *
  * Distributed correctness: partial buffers dedupe within a partition;
  * merge unions the sets and re-checks the cap, and `overflow` is
  * absorbing under merge — so the final verdict equals the single-node
  * distinct count regardless of partitioning or merge order. Determinism:
  * the surviving set is emitted sorted, so results are order-free.
  */
case class BoundedCollectSet(
    child: Expression,
    maxSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedCollectSet.SetBuf]
  with UnaryLike[Expression] {

  require(maxSize >= 1, s"maxSize must be >= 1, got $maxSize")

  override def prettyName: String = "bounded_collect_set"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): BoundedCollectSet.SetBuf =
    new BoundedCollectSet.SetBuf()

  override def update(
      buf: BoundedCollectSet.SetBuf, input: InternalRow): BoundedCollectSet.SetBuf = {
    if (!buf.overflow) {
      val v = child.eval(input)
      if (v != null) {
        buf.names.add(v.asInstanceOf[UTF8String].clone())
        if (buf.names.size > maxSize) buf.spill()
      }
    }
    buf
  }

  override def merge(
      buf: BoundedCollectSet.SetBuf,
      other: BoundedCollectSet.SetBuf): BoundedCollectSet.SetBuf = {
    if (buf.overflow || other.overflow) buf.spill()
    else {
      buf.names.addAll(other.names)
      if (buf.names.size > maxSize) buf.spill()
    }
    buf
  }

  override def eval(buf: BoundedCollectSet.SetBuf): Any =
    if (buf.overflow) null
    else new GenericArrayData(buf.names.toArray)

  override def serialize(buf: BoundedCollectSet.SetBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.overflow)
    out.writeInt(buf.names.size)
    buf.names.forEach { s =>
      val b = s.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectSet.SetBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BoundedCollectSet.SetBuf()
    buf.overflow = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.names.add(UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectSet =
    copy(child = newChild)
}

object BoundedCollectSet {
  /** Aggregation buffer: a TreeSet ordered by UTF8String's binary
    * comparator (UTF-8 byte order — Spark's string ordering), plus the
    * absorbing overflow flag. `spill()` clears the set when the cap is
    * crossed so a hot key's memory stays O(cap).
    */
  final class SetBuf {
    val names = new java.util.TreeSet[UTF8String]()
    var overflow: Boolean = false
    def spill(): Unit = { names.clear(); overflow = true }
  }
}
