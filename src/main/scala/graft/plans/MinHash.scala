package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused k-way MinHash over a token array: one per-row kernel computes
  * all k signature rows in a single pass — no explode, no per-doc
  * shuffle, so a 100 TB corpus minhashes at scan speed (the SQL
  * formulation explodes to one row per word and pays a k-aggregate
  * groupBy shuffle per document).
  *
  * Identity with the aggregate form: min over the word *multiset* equals
  * min over the word *set* (duplicates never change a min), so no
  * per-row dedup is needed. Hash family i of word w is Spark's
  * `xxhash64(lit(i), w)` chain — hashInt(i, seed=42) seeding the string
  * hash — reproduced exactly (asserted bit-identical in VectorOpsSpec).
  *
  * An empty/null-only token array yields Long.MaxValue rows (no word ever
  * collides with them; the aggregate form emits no row for such docs —
  * callers filter empties when that distinction matters).
  */
case class MinHash(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure("minhash requires numHashes > 0")
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    MinHashKernel.compute(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MinHashKernel.compute($c, $numHashes);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static kernel shared by the interpreted and codegen paths. */
object MinHashKernel {
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    // family seeds: xxhash64(lit(i), w) chains hashInt(i, 42) into the
    // string hash's seed — precompute the per-family seed once per row
    val seeds = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) { seeds(i) = XXH64.hashInt(i, 42L); i += 1 }
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        var k = 0
        while (k < numHashes) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seeds(k))
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}
