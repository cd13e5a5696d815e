package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal accessor bridge for `private[sql]` Spark internals needed by
 * graft's custom Catalyst expressions (Column ⇄ Expression conversion and
 * the AbstractDataType upper bound for ExpectsInputTypes). Lives in the
 * org.apache.spark.sql namespace purely for access — standard practice for
 * Catalyst extensions built outside the Spark tree.
 */
object Bridge {
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
