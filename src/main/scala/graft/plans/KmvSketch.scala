package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002) as a custom
  * aggregate: the k SMALLEST DISTINCT hash values seen per group, with
  * bounded state (≤ k longs), mergeable across partitions — the 100 TB
  * primitive for distinct-count AND set-operation estimates (union =
  * merge the sketches; intersection/Jaccard = membership arithmetic on
  * the combined k minima) where an exact distinct would shuffle the full
  * key universe per group.
  *
  * Determinism is the design point: "the k smallest distinct values" is
  * a pure function of the input SET — independent of partitioning, merge
  * order, and row order — so every downstream estimate (D̂ =
  * (k−1)·range/v_k, KMV Jaccard) is hash-oracle-able in another engine
  * that can compute the same minima exactly (`ORDER BY h LIMIT k` over a
  * DISTINCT set). Feed it the house md5 hash ([[graft.operators.TextOps.hashKey]])
  * for cross-engine work; xxhash64 works when only Spark needs to agree
  * with itself. When the group's true distinct count ≤ k the sketch IS
  * the distinct set and estimates degrade to exact.
  *
  * Returns the ascending array<long> of kept minima.
  */
case class KmvSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 2, s"kmv_sketch: k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], v: Long): Unit =
    if (buf.size < k) buf += v
    else if (v < buf.last && !buf.contains(v)) { buf += v; buf -= buf.last }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray[Long].map(v => v: Any))

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
