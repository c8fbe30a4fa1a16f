package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public Column(Expression) constructor (Column is
  * backed by ColumnNode for the connect/classic split); the supported
  * bridge lives in `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * private[sql] — this shim re-exports exactly the two conversions a
  * library defining native Catalyst expressions needs.
  */
object ColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
