package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded deterministic sample as a native aggregate: the k smallest
  * DISTINCT string values of the child, returned sorted ascending.
  *
  * This is the skew-safe replacement for the distinct→salt→window sample plan
  * (the round-4 `nodes`-stage bottleneck): a TypedImperativeAggregate whose
  * buffer is a ≤k-element sorted set, merged map-side like any partial
  * aggregate. A hub key that appears in a billion rows contributes one O(k)
  * buffer per map partition — the aggregation state is bounded by k at every
  * level (update caps, merge caps), so there is no group whose state grows
  * with group size, no corpus-wide `distinct`, and no window sort. The whole
  * sample computation collapses into the same single partial-agged shuffle
  * that carries `count`/`min`.
  *
  * Deterministic by construction (smallest-k-distinct is order-independent),
  * so retries, resume and repartitioning reproduce identical results.
  */
final case class BoundedMinSet(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]] {

  require(k >= 1, s"bounded_min_set requires k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType}")

  override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
    new java.util.TreeSet[UTF8String]()

  /** Insert keeping only the k smallest distinct values. The incoming
    * UTF8String may point into a reused row buffer, so it is copied iff it
    * actually enters the set.
    */
  private def add(buf: java.util.TreeSet[UTF8String], v: UTF8String): Unit =
    if (buf.size < k) { buf.add(v.copy()); () }
    else if (v.compareTo(buf.last()) < 0 && !buf.contains(v)) {
      buf.add(v.copy())
      buf.pollLast()
      ()
    }

  override def update(buf: java.util.TreeSet[UTF8String], input: InternalRow): java.util.TreeSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(a: java.util.TreeSet[UTF8String], b: java.util.TreeSet[UTF8String]): java.util.TreeSet[UTF8String] = {
    // values in b were copied on entry (or deserialized) — still re-copied by
    // add() only when they displace; cheap at ≤k elements
    b.forEach(v => add(a, v))
    a
  }

  override def eval(buf: java.util.TreeSet[UTF8String]): Any =
    new GenericArrayData(buf.toArray.asInstanceOf[Array[Any]]) // TreeSet iterates ascending

  override def serialize(buf: java.util.TreeSet[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { v =>
      val bytes = v.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[UTF8String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.add(UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_bounded_min_set"
}
