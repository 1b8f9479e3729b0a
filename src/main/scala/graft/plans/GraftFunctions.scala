package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.sqrt

/** Column/SQL surface for graft's native expressions. */
object GraftFunctions {

  import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

  /** Codegen'd dot product over array<float>/array<double> columns. */
  def vec_dot(a: Column, b: Column): Column = toCol(DotProduct(toExpr(a), toExpr(b)))

  /** Cosine similarity composed from the native dot kernel. */
  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)))

  /** L2 norm. */
  def vec_norm(v: Column): Column = sqrt(vec_dot(v, v))

  /** SpaceSaving heavy-hitters aggregate: top-k frequent values with
    * bounded sketch state (exact when distinct values <= capacity).
    */
  def topk_freq(c: Column, k: Int, capacity: Int = 4096): Column =
    toCol(TopKFreq(toExpr(c), k, capacity).toAggregateExpression())

  /** Fused per-row 64-bit SimHash over an array<string> token column. */
  def simhash64(tokens: Column): Column = toCol(SimHash64(toExpr(tokens)))

  /** Register the SQL-callable names on a session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
  }
}
