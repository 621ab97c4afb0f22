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

  /** Raise a typed AnalysisException (the user-facing plan-time error) —
    * the errorClass constructors are private[sql], hence the bridge. */
  def analysisError(msg: String): Nothing =
    throw new AnalysisException(
      errorClass = "INTERNAL_ERROR", messageParameters = Map("message" -> msg))

  /** Parse a SQL expression string to a real (unresolved) Catalyst tree.
    * `functions.expr` on Spark 4 defers parsing inside a lazy
    * `SqlExpression` column node, which `transform`/`collect` cannot see
    * through — this gives us the actual tree. */
  def parseExpression(sql: String): Expression =
    classic.SparkSession.active.sessionState.sqlParser.parseExpression(sql)

  /** Rewrap a frame's physical RDD in a fresh `LogicalRDD` WITHOUT the
    * origin plan's statistics or constraints (no Row re-encoding — the
    * InternalRow RDD is reused as-is).
    *
    * Why: Spark 4's `Dataset.checkpoint`/`localCheckpoint` copy the
    * origin plan's size estimate onto the new `LogicalRDD`
    * (`LogicalRDD.rewriteStatsAndConstraints`). Catalyst's size-only join
    * estimate MULTIPLIES child sizes, so an iterative loop whose
    * per-round plan joins previous checkpoints compounds the carried
    * estimate exponentially — after a dozen rounds the BigInt size has
    * millions of digits and every subsequent stats visit pins the driver
    * in BigInteger multiplication. Dropping the carried stats resets each
    * round to the (finite) default size estimate; runtime broadcast
    * decisions are unaffected because AQE re-plans from ACTUAL sizes. */
  def freshStats(df: DataFrame): DataFrame = {
    val c = df.asInstanceOf[classic.Dataset[Row]]
    c.queryExecution.logical match {
      // checkpointed frames: rebuild the SAME LogicalRDD minus the origin
      // stats/constraints — crucially KEEPING outputPartitioning and
      // ordering, so downstream joins/aggregates on the checkpoint key
      // stay exchange-free
      case l: execution.LogicalRDD =>
        classic.Dataset.ofRows(c.sparkSession,
          execution.LogicalRDD(l.output, l.rdd, l.outputPartitioning,
            l.outputOrdering, l.isStreaming, l.stream)(c.sparkSession))
      case _ =>
        c.sparkSession.internalCreateDataFrame(c.queryExecution.toRdd, c.schema)
    }
  }
}
