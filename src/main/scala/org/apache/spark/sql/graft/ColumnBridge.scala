package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic Column↔Expression converters, which are
  * `private[sql]` in Spark 4. Same placement trick the reference uses for
  * spark-private APIs (reference:
  * src/main/scala/com/mozilla/telemetry/ml/NaNRegressionEvaluator.scala:4
  * puts itself in org.apache.spark.ml.evaluation for the same reason). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
