package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge into `private[sql]` Spark internals needed to build
 * `Column`s from raw Catalyst `Expression`s (the supported extension path
 * for libraries shipping custom expressions on Spark 4's split sql/api
 * modules).
 */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Parse a SQL expression string to a real (unresolved) Catalyst tree.
    * `functions.expr` on Spark 4 defers parsing inside a lazy
    * `SqlExpression` column node, which `transform`/`collect` cannot see
    * through — this gives us the actual tree. */
  def parseExpression(sql: String): Expression =
    classic.SparkSession.active.sessionState.sqlParser.parseExpression(sql)
}
