package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇄ Expression converters — the
  * standard packaging trick for Catalyst extensions living outside the
  * Spark tree (Spark 4 moved `Column.expr`/`new Column(expr)` behind
  * `classic.ExpressionUtils`).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

/** Bridge to the `private[sql]` streaming-frame constructor: a V1
  * streaming Source's `getBatch` must return a DataFrame whose logical
  * plan carries `isStreaming = true` (MicroBatchExecution asserts it),
  * and the only way to mint one over a BaseRelation is
  * `LogicalRelation(relation, isStreaming = true)` + `Dataset.ofRows` —
  * exactly how Delta's source does it (`DeltaLog.createDataFrame`).
  */
object GraftStreamingBridge {
  def streamingFrame(spark: SparkSession,
                     relation: sources.BaseRelation): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession],
      execution.datasources.LogicalRelation(relation, isStreaming = true))
}

/** Bridge to the `private[sql]` session-state registries — imperative
  * (per-session) registration of table-valued functions, for sessions
  * built without `spark.sql.extensions` (the extensions path registers
  * the same builders via `injectTableFunction`).
  */
/** Bridge to the resolved `autoBroadcastJoinThreshold` (SQLConf parses
  * the size-string forms — "10MB", "-1" — which a raw conf.get string
  * would force callers to re-implement).
  */
object GraftConfBridge {
  def autoBroadcastJoinThreshold(spark: SparkSession): Long =
    spark.asInstanceOf[classic.SparkSession].sessionState.conf
      .autoBroadcastJoinThreshold
}

object GraftRegistryBridge {
  def registerTableFunction(
      spark: SparkSession, name: String,
      info: catalyst.expressions.ExpressionInfo,
      builder: Seq[catalyst.expressions.Expression] => catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.tableFunctionRegistry
      .registerFunction(catalyst.FunctionIdentifier(name), info, builder)
}
