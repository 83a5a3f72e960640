package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for `private[sql]` conversion helpers — the standard
  * pattern for third-party Catalyst extensions that need to wrap custom
  * `Expression`s as public `Column`s.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Structural type equality ignoring nullable/containsNull/valueContainsNull
    * flags — Spark's file sources force read-back schemas fully nullable
    * (`asNullable` in planning), so a read-rewrite path comparing against a
    * stored schema needs this, not `==`.
    */
  def sameTypeIgnoreNullability(a: org.apache.spark.sql.types.DataType,
                                b: org.apache.spark.sql.types.DataType): Boolean =
    org.apache.spark.sql.types.DataType.equalsIgnoreNullability(a, b)

  /** Fully-nullable rendering of a type (every nested field/element/value
    * nullable) — what Spark's own file-source planning does to read schemas.
    */
  def asNullable(dt: org.apache.spark.sql.types.DataType):
      org.apache.spark.sql.types.DataType = dt.asNullable

  /** Deterministic listener-bus drain: blocks until all queued events
    * (e.g. the onTaskEnd carrying task metrics) have been delivered, so a
    * CPU/bytes counter read after a job sees every completed task — the
    * benches previously settled with Thread.sleep, which silently
    * undercounts whenever the async bus lags longer. `waitUntilEmpty` is
    * private[spark]; bridged here like the expression helpers. Returns
    * false on timeout (caller keeps the possibly-partial reading and can
    * flag it).
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext,
                       timeoutMs: Long = 60000L): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
