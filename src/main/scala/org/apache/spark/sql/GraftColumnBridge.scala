package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Column ↔ Expression bridge for graft's native Catalyst expressions.
 * Spark 4 made the classic helpers (`classic.ExpressionUtils`)
 * `private[sql]`; extension libraries conventionally bridge from inside
 * this package to expose Column-API access to custom expressions (the
 * session-extension registry path in graft.functions.GraftExtensions
 * works without this — the bridge serves callers that want the typed
 * Column API without registering SQL functions).
 */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
