package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4.x removed the public `Column(expr)` / `col.expr` bridge between
  * the user-facing Column API and Catalyst expressions (they moved behind
  * `private[sql] classic.ExpressionUtils`). This object lives in the
  * `org.apache.spark.sql` package solely to re-export those two conversions
  * for graft's native Catalyst expressions. No Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
