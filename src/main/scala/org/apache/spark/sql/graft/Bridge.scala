package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge.
  *
  * Spark 4 unified `Column` over a backend-agnostic `ColumnNode`, so
  * wrapping a custom catalyst `Expression` into a `Column` goes through
  * `classic.ExpressionUtils`, which is `private[sql]` — hence this one
  * object living under `org.apache.spark.sql`. Standard technique for
  * libraries shipping native expressions against the classic backend.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
