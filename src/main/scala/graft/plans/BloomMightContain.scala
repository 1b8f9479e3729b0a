package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen'd predicate.
  *
  * The filter rides a `Broadcast` handle: the expression itself stays a
  * few bytes in the serialized plan, and each EXECUTOR materializes the
  * filter once (torrent-fetched), however many tasks it runs — at 100 TB
  * a corpus filter is hundreds of MB to ~1 GB (10⁹ items at 1% FPP
  * ≈ 1.2 GB), which must ship per-executor, never per-task-closure.
  * Codegen hoists `broadcast.value()` into generated-class init, so the
  * per-row cost is one hash-and-probe inside whole-stage codegen.
  *
  * Membership scheme: UTF-8 bytes of the string value, matching what
  * `DataFrameStatFunctions.bloomFilter` puts for string columns
  * (`putBinary(utf8)` ≡ `putString`, verified against Spark 4.1's
  * BloomFilterImplV2). Null input → null (three-valued, like any
  * predicate).
  */
case class BloomMightContain(child: Expression, bloomBc: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires string, got ${t.catalogString}")
  }

  @transient private lazy val bloom: BloomFilter = bloomBc.value

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc,
      classOf[Broadcast[BloomFilter]].getName)
    // one broadcast.value() per generated-class instance, not per row
    val bloomVar = ctx.addMutableState(
      classOf[BloomFilter].getName, "bloomFilter",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $bloomVar.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

  /** Column wrapper: true iff `c` might be in `bloomBc`'s filter (false
    * = definitely absent — the side a dedup gate can trust).
    */
  def might(c: Column, bloomBc: Broadcast[BloomFilter]): Column =
    toCol(BloomMightContain(toExpr(c), bloomBc))
}
