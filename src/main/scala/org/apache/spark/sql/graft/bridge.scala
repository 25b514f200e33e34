package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's Catalyst expressions and the public Column API.
  *
  * Spark 4 moved `Column` to a backend-agnostic module; wrapping a raw
  * Catalyst `Expression` goes through the classic backend's
  * `ExpressionUtils`, which is `private[sql]` — hence this one-file shim
  * inside the `org.apache.spark.sql` namespace (the standard extension
  * pattern used by Spark-native libraries).
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (classic backend). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame. */
  def planOf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed

  /** Install an extra planner strategy at runtime (idempotent). */
  def installStrategy(spark: org.apache.spark.sql.SparkSession,
                      strategy: org.apache.spark.sql.execution.SparkStrategy)
      : Unit = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!s.experimental.extraStrategies.contains(strategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ strategy
  }

  /** Remove a previously installed strategy / optimizer rule. */
  def uninstallStrategy(spark: org.apache.spark.sql.SparkSession,
                        strategy: org.apache.spark.sql.execution.SparkStrategy)
      : Unit = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    s.experimental.extraStrategies =
      s.experimental.extraStrategies.filterNot(_ == strategy)
  }
  def uninstallOptimization(spark: org.apache.spark.sql.SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations.filterNot(_ == rule)
  }

  /** Install an extra optimizer rule at runtime (idempotent). */
  def installOptimization(spark: org.apache.spark.sql.SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!s.experimental.extraOptimizations.contains(rule))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ rule
  }

  /** Block until all queued listener-bus events are delivered —
    * `ListenerBus.waitUntilEmpty` is `private[spark]`, and per-query
    * metric attribution (Bench's shuffle accounting) is wrong without
    * the drain because stage-completed events arrive asynchronously. */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Read the context's RESOLVED checkpoint dir (`private[spark]`; the
    * public API only exposes a setter). Paired with
    * [[restoreCheckpointDir]] so a library call that needs a temporary
    * reliable checkpoint location can put back whatever the caller had
    * configured — including none, which `setCheckpointDir` can't express. */
  def checkpointDir(spark: org.apache.spark.sql.SparkSession): Option[String] =
    spark.sparkContext.checkpointDir

  /** Restore a checkpoint dir previously read by [[checkpointDir]]. Writes
    * the resolved value back verbatim (no new UUID subdir is minted). */
  def restoreCheckpointDir(spark: org.apache.spark.sql.SparkSession,
                           prior: Option[String]): Unit =
    spark.sparkContext.checkpointDir = prior

  /** Register a SQL function into an existing session's registry (the
    * runtime-path complement to `SparkSessionExtensions.injectFunction`,
    * for sessions graft didn't build — e.g. the driver's). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
