package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a custom aggregate: top-k frequent
  * strings with bounded state (`capacity` counters), mergeable across
  * partitions — the 100 TB path for "most frequent tokens/domains/shingles"
  * where an exact groupBy would shuffle the full vocabulary.
  *
  * Exact when the true distinct count fits in `capacity` (that invariant
  * is what the DuckDB oracle for q52 relies on); otherwise counts are
  * overestimates within the classic SpaceSaving n/capacity bound.
  */
case class TopKFreq(child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, Long], key: String, n: Long): Unit = {
    buf.get(key) match {
      case Some(c) => buf.update(key, c + n)
      case None if buf.size < capacity => buf.update(key, n)
      case None =>
        // SpaceSaving eviction: replace the minimum counter
        val (mk, mc) = buf.minBy(_._2)
        buf.remove(mk)
        buf.update(key, mc + n)
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long], other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (w, c) => add(buf, w, c) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (w, c) => (-c, w) }.take(k)
    new GenericArrayData(top.map { case (w, c) =>
      InternalRow(UTF8String.fromString(w), c)
    }.toArray[Any])
  }

  // Length-prefixed UTF-8, not writeUTF: modified-UTF-8 caps entries at
  // 64 KB and a single oversized token (base64 blob, minified JS) would
  // fail the whole partial-aggregate shuffle.
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (w, c) =>
      val b = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKFreq = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKFreq = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
