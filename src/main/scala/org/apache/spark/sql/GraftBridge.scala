package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> catalyst Expression bridge. Spark 4 hides ExpressionUtils behind
 * `private[sql]`, so libraries shipping custom native Expressions (see
 * graft.plans) need this one-file shim in the sql package — the same pattern
 * Sedona/Frameless-style extensions use. No Spark internals are modified.
 */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
