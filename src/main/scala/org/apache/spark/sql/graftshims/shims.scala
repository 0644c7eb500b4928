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

object StreamingBridge {
  import org.apache.spark.rdd.RDD
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.StructType

  /** Streaming-tagged DataFrame from internal rows — what a DSv1 streaming
    * Source.getBatch must return (private[sql] on the classic session). */
  def internalCreateDataFrame(spark: org.apache.spark.sql.SparkSession,
                              rdd: RDD[InternalRow],
                              schema: StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
