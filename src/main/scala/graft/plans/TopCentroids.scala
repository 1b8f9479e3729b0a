package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row top-k nearest centroids by cosine — the IVF assignment kernel
  * with the centroid table embedded in the expression (it is
  * driver-collectable by construction: ≤4096 centroids × 64 dims ≈ 2 MB,
  * the same payload a broadcast would ship). The DataFrame alternative
  * (crossJoin against broadcast centroids, then a row_number window over
  * vec_id) materializes n×C rows and EXCHANGES them to rank per vector —
  * at 10⁹ vectors × 4096 centroids that is trillions of rows through a
  * shuffle; this expression scans each vector once, keeps a k-slot
  * running top list, and shuffles nothing. Codegen ships the kernel as a
  * reference object (the SimHash64 static-kernel pattern), so the
  * assignment projection stays inside whole-stage codegen.
  *
  * Ordering matches the window formulation exactly: cosine descending,
  * centroid id ascending on ties, NaN ordered greatest (Spark's double
  * ordering), so the two formulations pick identical assignments.
  * Dimension drift fails loudly — a truncated dot product would assign
  * wrong-dimensioned appends to arbitrary buckets silently.
  *
  * Returns array<struct<cid:int, ccos:double>> of length min(k, C).
  */
case class TopCentroids(vec: Expression, norm: Expression,
    cids: Array[Int], cvecs: Array[Array[Double]], cnorms: Array[Double],
    k: Int)
    extends BinaryExpression {

  require(k > 0 && cids.length == cvecs.length && cids.length == cnorms.length)

  override def left: Expression = vec
  override def right: Expression = norm

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, norm.dataType) match {
      case (ArrayType(DoubleType | FloatType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, n) => TypeCheckResult.TypeCheckFailure(
        s"top_centroids needs (array<float|double>, double), got (${v.simpleString(10)}, ${n.simpleString(10)})")
    }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("ccos", DoubleType, nullable = false))), containsNull = false)

  @transient private lazy val kernel = new TopCentroids.Kernel(
    cids, cvecs, cnorms, k,
    vec.dataType match { case ArrayType(FloatType, _) => true; case _ => false })

  override def nullSafeEval(v: Any, n: Any): Any =
    kernel.compute(v.asInstanceOf[ArrayData], n.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("tcKernel", kernel,
      classOf[TopCentroids.Kernel].getName)
    nullSafeCodeGen(ctx, ev, (v, n) => s"${ev.value} = $kRef.compute($v, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, norm = newRight)
}

object TopCentroids {
  /** Shared interpreted/codegen kernel; serializable so codegen can ship
    * it to executors as a reference object.
    */
  final class Kernel(cids: Array[Int], cvecs: Array[Array[Double]],
      cnorms: Array[Double], k: Int, vecIsFloat: Boolean) extends Serializable {

    // Spark double ordering: NaN greatest; (cos desc, cid asc)
    private def beats(cosA: Double, cidA: Int, cosB: Double, cidB: Int): Boolean = {
      val c = java.lang.Double.compare(cosA, cosB) // NaN > any, matches Spark
      c > 0 || (c == 0 && cidA < cidB)
    }

    def compute(arr: ArrayData, vnorm: Double): ArrayData = {
      val dim = arr.numElements()
      val x = new Array[Double](dim)
      var i = 0
      if (vecIsFloat) while (i < dim) { x(i) = arr.getFloat(i).toDouble; i += 1 }
      else while (i < dim) { x(i) = arr.getDouble(i); i += 1 }
      val kk = math.min(k, cids.length)
      val topCos = Array.fill(kk)(Double.NegativeInfinity)
      val topCid = Array.fill(kk)(Int.MaxValue)
      var j = 0
      while (j < cids.length) {
        val cv = cvecs(j)
        // fail loudly on dimension drift: a truncated dot product would
        // assign wrong-dimensioned appends to arbitrary buckets silently
        require(dim == cv.length,
          s"top_centroids: $dim-dim vector against ${cv.length}-dim centroid")
        var d = 0.0
        var t = 0
        while (t < dim) { d += x(t) * cv(t); t += 1 }
        val cos = d / (vnorm * cnorms(j))
        if (beats(cos, cids(j), topCos(kk - 1), topCid(kk - 1))) {
          // insertion into the k-slot sorted list (k is 1-2 in practice)
          var p = kk - 1
          while (p > 0 && beats(cos, cids(j), topCos(p - 1), topCid(p - 1))) {
            topCos(p) = topCos(p - 1); topCid(p) = topCid(p - 1); p -= 1
          }
          topCos(p) = cos; topCid(p) = cids(j)
        }
        j += 1
      }
      new GenericArrayData(
        (0 until kk).map(p => InternalRow(topCid(p), topCos(p))).toArray[Any])
    }
  }
}
