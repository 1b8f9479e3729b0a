package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row PQ assignment: the nearest codebook entry in EVERY subspace,
  * in one pass — the product-quantization analog of [[TopCentroids]].
  * The m codebooks (k integer centroid slices each) are embedded in the
  * expression (k·dims longs — the same payload a broadcast would ship)
  * and codegen ships the kernel as a reference object, so the whole
  * m-subspace argmin stays inside whole-stage codegen as one tight
  * integer loop. The DataFrame formulation — per subspace a least()
  * over k struct(aggregate(zip_with(...))) candidates — evaluates
  * m·k CodegenFallback higher-order functions per row, each allocating
  * a zipped array: measured 16 s vs sub-second for this kernel on the
  * q130 grid (m=16, k=64) at sf0.1.
  *
  * Ordering matches the column formulation exactly: d2 ascending, code
  * id ascending on ties — integer-exact, so the DuckDB oracle's
  * row_number() OVER (ORDER BY d2, cid) picks identical codes.
  * Dimension drift fails loudly. Returns
  * array<struct<cid:bigint, d2:bigint>> of length m.
  */
case class PqAssign(vec: Expression,
    cids: Array[Long], cvecs: Array[Array[Array[Long]]])
    extends UnaryExpression {

  require(cvecs.nonEmpty && cvecs.forall(_.length == cids.length),
    "pq_assign: every subspace codebook must have one entry per code id")

  override def child: Expression = vec

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case v => TypeCheckResult.TypeCheckFailure(
      s"pq_assign needs array<bigint> (an intVec), got ${v.simpleString(10)}")
  }

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("d2", LongType, nullable = false))), containsNull = false)

  @transient private lazy val kernel = new PqAssign.Kernel(cids, cvecs)

  override def nullSafeEval(v: Any): Any =
    kernel.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("pqaKernel", kernel,
      classOf[PqAssign.Kernel].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $kRef.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(vec = newChild)
}

object PqAssign {
  final class Kernel(cids: Array[Long], cvecs: Array[Array[Array[Long]]])
      extends Serializable {
    private val m = cvecs.length
    private val sub = cvecs(0)(0).length

    def compute(arr: ArrayData): ArrayData = {
      val dims = arr.numElements()
      require(dims == m * sub,
        s"pq_assign: $dims-dim vector against $m×$sub-dim codebooks")
      val out = new Array[Any](m)
      var j = 0
      while (j < m) {
        val cb = cvecs(j)
        val base = j * sub
        var bestD2 = Long.MaxValue
        var bestCid = Long.MaxValue
        var c = 0
        while (c < cb.length) {
          val cv = cb(c)
          var d2 = 0L
          var t = 0
          while (t < sub) {
            val d = arr.getLong(base + t) - cv(t)
            d2 += d * d
            t += 1
          }
          if (d2 < bestD2 || (d2 == bestD2 && cids(c) < bestCid)) {
            bestD2 = d2; bestCid = cids(c)
          }
          c += 1
        }
        out(j) = InternalRow(bestCid, bestD2)
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Asymmetric-distance computation (ADC) for PQ serving: exact query
  * int-vec vs a corpus row's m PQ codes — Σ_j ‖q_j − centroid_j[code_j]‖²
  * as one codegen'd integer loop over the embedded codebooks. The column
  * formulation (per subspace an element_at on a constant-folded lookup
  * map feeding a zip_with/aggregate pair) pays m CodegenFallback HOF
  * evaluations and m array allocations per scored pair; at serving
  * volume (queries × corpus) that dominates the scan. Unknown code ids
  * fail loudly — a silent 0-distance would promote garbage into top-k.
  */
case class PqAdc(qvec: Expression, codes: Expression,
    cids: Array[Long], cvecs: Array[Array[Array[Long]]])
    extends BinaryExpression {

  require(cvecs.nonEmpty && cvecs.forall(_.length == cids.length),
    "pq_adc: every subspace codebook must have one entry per code id")

  override def left: Expression = qvec
  override def right: Expression = codes

  override def checkInputDataTypes(): TypeCheckResult =
    (qvec.dataType, codes.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (q, c) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc needs (array<bigint>, array<bigint>), got (${q.simpleString(10)}, ${c.simpleString(10)})")
    }

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  @transient private lazy val kernel = new PqAdc.Kernel(cids, cvecs)

  override def nullSafeEval(q: Any, c: Any): Any =
    kernel.compute(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("pqdKernel", kernel,
      classOf[PqAdc.Kernel].getName)
    nullSafeCodeGen(ctx, ev, (q, c) => s"${ev.value} = $kRef.compute($q, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(qvec = newLeft, codes = newRight)
}

object PqAdc {
  final class Kernel(cids: Array[Long], cvecs: Array[Array[Array[Long]]])
      extends Serializable {
    private val m = cvecs.length
    private val sub = cvecs(0)(0).length
    private val idx: java.util.HashMap[java.lang.Long, Integer] = {
      val h = new java.util.HashMap[java.lang.Long, Integer](cids.length * 2)
      var i = 0
      while (i < cids.length) { h.put(cids(i), i); i += 1 }
      h
    }

    def compute(q: ArrayData, codes: ArrayData): Long = {
      require(q.numElements() == m * sub,
        s"pq_adc: ${q.numElements()}-dim query against $m×$sub-dim codebooks")
      require(codes.numElements() == m,
        s"pq_adc: ${codes.numElements()} codes against $m subspaces")
      var total = 0L
      var j = 0
      while (j < m) {
        val ci = idx.get(codes.getLong(j))
        require(ci != null,
          s"pq_adc: unknown code id ${codes.getLong(j)} in subspace $j")
        val cv = cvecs(j)(ci)
        val base = j * sub
        var t = 0
        while (t < sub) {
          val d = q.getLong(base + t) - cv(t)
          total += d * d
          t += 1
        }
        j += 1
      }
      total
    }
  }
}
