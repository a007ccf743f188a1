package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression converters.
  * Spark 4 wraps Columns around ColumnNodes; building a Column from a
  * custom Catalyst Expression needs `classic.ExpressionUtils`, which is
  * sql-package-private — hence this one-file shim living in the
  * org.apache.spark.sql namespace (the standard pattern used by public
  * Spark extension libraries).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
