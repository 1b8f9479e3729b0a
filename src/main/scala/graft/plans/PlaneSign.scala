package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Per-band sign-LSH signatures in ONE fused kernel — the blocking
  * projection of [[graft.operators.VectorOps.embedNeardupBlocked]]
  * (q58 / the production embedNeardupBlockedAuto).
  *
  * The Column formulation built `numPlanes` separate `vec_dot(vec,
  * array(<64 literals>))` expressions (32 at q58's defaults, up to 512
  * at the auto form's maxBands×16 ceiling) wrapped in when/otherwise
  * and summed into per-band structs: correct, but the generated code is
  * enormous — and in a long-lived session running many distinct plans
  * (the bench suite, a multi-tenant driver) Spark's bounded generated-
  * class cache evicts it, so every re-plan pays Janino compilation of
  * the whole block again. The r20 q58 profile measured exactly this:
  * isolated min-of-5 sat at 1.01× baseline while the full-suite figure
  * crept to 1.44× — the wall was per-pass recompilation, not the
  * query's work.
  *
  * This expression ships the plane matrix as ONE codegen reference
  * object (the [[TopCentroids]] kernel pattern): the generated code is
  * a single call, the dots run in a fused row-major loop over a
  * flattened primitive matrix, and band packing matches the Column
  * formulation bit-for-bit — bit j of band b is set iff
  * dot(vec, planes(b·bandBits+j)) > 0 (strictly, matching the original
  * `when(dot > 0, …)`).
  *
  * Returns array<long> of length numPlanes/bandBits; null input → null.
  * Dimension drift fails loudly (a truncated dot would block vectors
  * into arbitrary buckets silently).
  */
case class PlaneSignBands(vec: Expression, planes: Array[Array[Double]],
    bandBits: Int) extends UnaryExpression {

  require(planes.nonEmpty && bandBits >= 1 && bandBits <= 63 &&
    planes.length % bandBits == 0,
    s"plane_sign_bands: ${planes.length} planes must be a positive multiple " +
      s"of bandBits=$bandBits (<= 63)")

  override def child: Expression = vec

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"plane_sign_bands needs array<float|double>, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val kernel = new PlaneSignBands.Kernel(
    planes, bandBits,
    vec.dataType match { case ArrayType(FloatType, _) => true; case _ => false })

  override def nullSafeEval(v: Any): Any =
    kernel.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("psKernel", kernel,
      classOf[PlaneSignBands.Kernel].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $kRef.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(vec = newChild)
}

object PlaneSignBands {
  /** Shared interpreted/codegen kernel; serializable so codegen ships it
    * to executors as a reference object. Planes are flattened row-major
    * at construction so the hot loop walks one primitive array.
    */
  final class Kernel(planes: Array[Array[Double]], bandBits: Int,
      vecIsFloat: Boolean) extends Serializable {
    private val numPlanes = planes.length
    private val numBands = numPlanes / bandBits
    private val dim = planes.head.length
    private val flat: Array[Double] = {
      require(planes.forall(_.length == dim),
        "plane_sign_bands: ragged plane matrix")
      val f = new Array[Double](numPlanes * dim)
      var j = 0
      while (j < numPlanes) {
        System.arraycopy(planes(j), 0, f, j * dim, dim); j += 1
      }
      f
    }

    def compute(arr: ArrayData): ArrayData = {
      val n = arr.numElements()
      require(n == dim,
        s"plane_sign_bands: $n-dim vector against $dim-dim planes")
      val x = new Array[Double](dim)
      var i = 0
      if (vecIsFloat) while (i < dim) { x(i) = arr.getFloat(i).toDouble; i += 1 }
      else while (i < dim) { x(i) = arr.getDouble(i); i += 1 }
      val out = new Array[Any](numBands)
      var b = 0
      var j = 0
      while (b < numBands) {
        var word = 0L
        var k = 0
        while (k < bandBits) {
          var d = 0.0
          val off = j * dim
          var t = 0
          while (t < dim) { d += x(t) * flat(off + t); t += 1 }
          if (d > 0) word |= 1L << k
          k += 1; j += 1
        }
        out(b) = word
        b += 1
      }
      new GenericArrayData(out)
    }
  }
}
