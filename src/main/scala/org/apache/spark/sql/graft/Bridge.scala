package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst `Expression` bridge.
  *
  * Spark 4 moved the public `Column` API to column nodes and made the
  * classic converters `private[sql]`; extension libraries that ship native
  * expressions host a one-line bridge inside the `org.apache.spark.sql`
  * namespace to reach them (the standard pattern across public Spark
  * connector/extension projects). Everything else in this library lives
  * under `graft.*`.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
