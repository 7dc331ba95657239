package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `ExpressionUtils.column` (a `private[sql]` helper in Spark's
  * classic API): wraps a raw Catalyst [[Expression]] as a user-facing
  * [[Column]]. Needed for native expressions that carry non-literal runtime
  * state — e.g. [[graft.functions.CmsOrderedSort]] holds a broadcast
  * count-min sketch, which the string-based `expr("fn(...)")` registry path
  * cannot express. Lives under `org.apache.spark.sql` solely for package
  * access; no Spark behavior is altered.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
