package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row word n-gram shingling: array<string> tokens → array<string> of
  * overlapping space-joined n-grams, all inside one codegen'd kernel.
  *
  * This is the map-side replacement for the posexplode + per-doc window
  * (`lead(w, i) over (partition by doc_id order by pos)`) formulation:
  * the window pays a full shuffle keyed by doc_id BEFORE any dedup or
  * index join can start, while this kernel shingles at scan speed — at
  * 100 TB that removes an entire corpus-wide exchange from every
  * shingle-based pipeline (Jaccard index build, decontamination,
  * repetition scoring).
  *
  * Semantics match `concat_ws(" ", tokens[i], ..., tokens[i+n-1])` with
  * non-null inputs; null token elements are skipped by concat-ws
  * convention. Fewer than n tokens → empty array.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure("shingles requires n > 0")
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles requires array<string>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    ShinglesKernel.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShinglesKernel.compute($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Static kernel shared by the interpreted and codegen paths. */
object ShinglesKernel {
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val out = len - n + 1
    if (out <= 0) return new GenericArrayData(Array.empty[Any])
    val grams = new Array[Any](out)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < out) {
      var j = 0
      while (j < n) { window(j) = arr.getUTF8String(i + j); j += 1 }
      grams(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(grams)
  }
}
