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

  /** Drop the storage blocks behind a `localCheckpoint(eager = true)`d
    * DataFrame. `Dataset.unpersist` only touches cache-manager entries
    * (`persist()`), so superseded checkpoints of an iterative algorithm
    * otherwise pin block-store memory until driver GC gets around to
    * them — measured as multi-second eviction/GC cliffs across
    * consecutive connected-components runs. Safe to call once every
    * DOWNSTREAM consumer has itself been eagerly materialized (the blocks
    * are an endpoint, not a lineage link, after checkpoint truncation).
    * No-op for plans that are not a bare checkpoint scan.
    */
  def freeLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
    }
}
