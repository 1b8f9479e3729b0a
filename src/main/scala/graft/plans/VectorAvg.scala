package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of `array<double>` vectors — the k-means centroid
  * kernel as ONE aggregate over n rows. The alternative Spark-native
  * formulation (posexplode → groupBy(key, pos) → avg → re-assemble)
  * shuffles dim × n rows and pays a second aggregation to restore array
  * order; this buffer holds one running sum per group and shuffles a
  * single array per partial — at 100 TB of 64-dim vectors that is a 64×
  * smaller Lloyd-pass exchange.
  *
  * Accepts array<float> and array<double> (reading a float-backed array
  * with double accessors would silently reinterpret bits — wrong means,
  * no error). Null VECTORS are ignored (SQL avg semantics); an empty
  * group yields null. Null ELEMENTS and rows whose length differs from
  * the first-seen length fail loudly — posexplode+avg would skip a null
  * element per-dimension, and silently averaging 0.0 instead (or
  * truncating) would corrupt every centroid downstream.
  */
case class VectorAvg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorAvg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_avg needs array<float|double>, got ${t.simpleString(10)}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def elem(arr: ArrayData, i: Int): Double = {
    require(!arr.isNullAt(i),
      "vec_avg: null vector element - clean or impute before averaging")
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
  }

  override def createAggregationBuffer(): VectorAvg.Buf =
    new VectorAvg.Buf(Array.emptyDoubleArray, 0L)

  private def addVec(buf: VectorAvg.Buf, arr: ArrayData): VectorAvg.Buf = {
    val n = arr.numElements()
    if (buf.count == 0L && buf.sum.isEmpty) {
      val s = new Array[Double](n)
      var i = 0
      while (i < n) { s(i) = elem(arr, i); i += 1 }
      new VectorAvg.Buf(s, 1L)
    } else {
      require(n == buf.sum.length,
        s"vec_avg: mixed vector lengths ($n vs ${buf.sum.length})")
      var i = 0
      while (i < n) { buf.sum(i) += elem(arr, i); i += 1 }
      buf.count += 1
      buf
    }
  }

  override def update(buf: VectorAvg.Buf, input: InternalRow): VectorAvg.Buf = {
    val v = child.eval(input)
    if (v == null) buf else addVec(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: VectorAvg.Buf, other: VectorAvg.Buf): VectorAvg.Buf = {
    if (other.count == 0L) buf
    else if (buf.count == 0L) other
    else {
      require(buf.sum.length == other.sum.length,
        s"vec_avg: mixed vector lengths (${other.sum.length} vs ${buf.sum.length})")
      var i = 0
      while (i < buf.sum.length) { buf.sum(i) += other.sum(i); i += 1 }
      buf.count += other.count
      buf
    }
  }

  override def eval(buf: VectorAvg.Buf): Any =
    if (buf.count == 0L) null
    else {
      val out = new Array[Double](buf.sum.length)
      var i = 0
      while (i < out.length) { out(i) = buf.sum(i) / buf.count; i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: VectorAvg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.count)
    out.writeInt(buf.sum.length)
    var i = 0
    while (i < buf.sum.length) { out.writeDouble(buf.sum(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VectorAvg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val count = in.readLong()
    val n = in.readInt()
    val s = new Array[Double](n)
    var i = 0
    while (i < n) { s(i) = in.readDouble(); i += 1 }
    new VectorAvg.Buf(s, count)
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorAvg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorAvg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object VectorAvg {
  /** Mutable running (element-wise sum, row count). */
  final class Buf(var sum: Array[Double], var count: Long)
}
