package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.expressions.Expression

/** Unwraps leftover [[ColumnNodeExpression]] leaves — the Unevaluable
  * wrapper a Column→Expression round-trip leaves around an embedded
  * catalyst expression. The DataFrame analyzer converts these; the
  * FUNCTION-REGISTRY path does not, so a registry builder composing
  * `functions._` Columns over its argument expressions dies at codegen
  * with "Cannot generate code for expression: columnnodeexpression".
  * `ColumnNodeExpression` is private[classic], hence this package-side
  * shim (the same pattern as graft's ColumnBridge).
  */
object GraftColumnMaterialize {
  def materialize(e: Expression): Expression = e.transformUp {
    case cne: ColumnNodeExpression =>
      // the full Column-DSL → catalyst conversion the DataFrame analyzer
      // would run; it recursively handles embedded expression leaves too
      ColumnNodeToExpressionConverter(cne.node)
  }
}
