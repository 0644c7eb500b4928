/*
 * Bridge between graft's native Catalyst expressions and the public Column
 * API. In Spark 4 the Column class wraps a ColumnNode and the
 * Expression <-> Column converters live in
 * org.apache.spark.sql.classic.ExpressionUtils, which is private[sql].
 * This object sits inside the org.apache.spark.sql package hierarchy so it
 * can legally call them, and re-exports the two conversions graft needs.
 */
package org.apache.spark.sql.graftshims

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  /** Wrap a raw Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column back to its Catalyst Expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
