package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over a token array: one fused per-row kernel.
  *
  * The pure-SQL formulation (explode → per-(doc,word) tf → 64 fused
  * conditional-sum aggregates → bit fold) pays a full shuffle and 64
  * aggregate buffers per group; this expression computes the identical
  * value in a single pass over the row's token array — no shuffle at all,
  * so a 100 TB corpus simhashes at scan speed.
  *
  * Identity with the aggregate form: summing ±1 per *occurrence* equals
  * summing ±tf per *distinct* token, so no per-row hash map is needed.
  * Token hash = Spark's `xxhash64` (XXH64, seed 42) — signatures are
  * bit-identical to the SQL formulation (asserted in VectorOpsSpec).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    SimHashKernel.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHashKernel.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static kernel shared by the interpreted and codegen paths. */
object SimHashKernel {
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
