package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ↔ Expression converters — the
  * supported extension-point shape for libraries that ship custom Catalyst
  * expressions (the converters are package-private, so the bridge lives
  * under org.apache.spark.sql). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Force-create the session's StateStoreCoordinator RPC endpoint.
    *
    * Streaming queries create it on first use, but BATCH
    * `transformWithState` does not: its state-store init builds a default
    * SQLConf (so session overrides like
    * `coordinatorReportSnapshotUploadLag=false` never reach it) while the
    * RocksDB provider's snapshot-upload telemetry unconditionally resolves
    * the coordinator endpoint — absent a prior streaming query, that dies
    * with RpcEndpointNotFoundException → CANNOT_LOAD_STATE_STORE. Creating
    * the endpoint up front (what any streaming query would do anyway)
    * makes batch TWS safe. Idempotent and ~free. */
  def ensureStateStoreCoordinator(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .streams.stateStoreCoordinator

  /** Register a function builder into an EXISTING session's registry
    * (`sessionState` is `private[sql]`; the config-driven
    * `spark.sql.extensions` path cannot retrofit a live session). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
