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

  /** A batch DataFrame's rows re-wrapped with `isStreaming = true` — what
    * a V1 streaming Source's getBatch must return (MicroBatchExecution
    * asserts the flag). Same bridge KafkaSource uses; the inner plan
    * still executes with its own codegen/pushdown, the wrapper only
    * carries the streaming bit. */
  def asStreamingFrame(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
