package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters of
  * Spark 4's classic API — the standard pattern expression libraries use
  * to wrap a custom Catalyst `Expression` into a user-facing `Column`
  * (frameless' FramelessInternals, Sedona's expressions do the same).
  * Kept to exactly these two one-liners.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
