package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made the converters
  * (`classic.ExpressionUtils`) `private[sql]`, so custom Catalyst
  * expressions (e.g. [[graft.ops.TitleCase]]) need this one-hop shim in
  * the `org.apache.spark.sql` namespace to surface as `Column`s.
  * Public-API based: mirrors what Spark's own `functions` object does.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` (the `ExpectsInputTypes.inputTypes` element
    * type) is `private[sql]` in Spark 4 — aliased here so custom
    * expressions outside the sql package can still declare typed
    * input contracts.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** Drain the async listener bus so QueryExecutionListener callbacks
    * (graft.Metrics) are visible — `listenerBus` is `private[spark]`,
    * hence bridged here.
    */
  def flushListeners(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
