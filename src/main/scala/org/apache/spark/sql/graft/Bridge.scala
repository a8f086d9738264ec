package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal `private[sql]` access bridge: converts between the public
  * `Column` API and catalyst `Expression`s so the engine's native
  * expressions (graft.functions) can be used from the DataFrame API
  * without requiring `spark.sql.extensions` registration. This is the
  * standard pattern for libraries that ship custom catalyst expressions;
  * nothing else from the private surface is touched.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
