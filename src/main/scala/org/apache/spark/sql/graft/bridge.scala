package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal visibility bridge: `Column <-> catalyst Expression` converters
  * are `private[sql]` in Spark 4, so custom native expressions (the usual
  * extension mechanism — same trick as Sedona/Frameless) need a one-liner
  * inside the sql package. Nothing else from the private API is touched.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a catalyst-native SQL function on a LIVE session (the
    * FunctionRegistry is `private[sql]`; new sessions should prefer
    * `spark.sql.extensions=graft.plans.GraftExtensions`). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       id: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)

  /** DataFrame over a raw logical plan (`Dataset.ofRows` is
    * `private[sql]`) — lets an optimizer rule price a side of a join with
    * a small stats sub-query (the adaptive-grid rewrite). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Globally-unique id of a session (`sessionUUID` is `private[sql]`) —
    * cache keys that must never collide across sessions use this instead
    * of identity hash codes (which can recur after GC). */
  def sessionUUID(spark: org.apache.spark.sql.SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID

  /** Drain the async listener bus (`listenerBus` is `private[spark]`) —
    * test assertions over QueryExecutionListener-captured plans need the
    * in-flight events delivered before checking. */
  def waitListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
