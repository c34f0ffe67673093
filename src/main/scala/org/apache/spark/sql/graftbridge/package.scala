package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column ↔ Expression converters — the
  * conventional hook point for third-party Catalyst expressions (the public
  * `Column(Expression)` constructor was removed in Spark 4; extensions nest a
  * shim in the sql package instead). No Spark internals are modified. */
package object graftbridge {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
