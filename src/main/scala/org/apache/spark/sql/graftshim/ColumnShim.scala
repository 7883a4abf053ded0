package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Accessor for the private[sql] Column <-> Expression bridge in Spark 4
 * (org.apache.spark.sql.classic.ExpressionUtils). Living under the
 * org.apache.spark.sql package tree is the standard technique used by
 * open-source Spark extensions (Delta, Iceberg) to reach these APIs.
 */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
