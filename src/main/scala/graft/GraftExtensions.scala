package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * Spark-native extension entry point: register the engine's functions via
 * `spark.sql.extensions=graft.GraftExtensions` (the supported mechanism for
 * third-party Catalyst expressions — the reference instead calls
 * `spark.udf.registerJavaFunction` per session,
 * `spark/database_api.py:175-199`). `funcs.registerAll(spark)` remains the
 * programmatic equivalent; both paths register the SAME
 * `funcs.sqlFunctions` table, so they cannot drift.
 *
 * No custom `Rule`/`SparkStrategy` is injected by design: every operator
 * the engine needs is expressible with built-in logical operators plus
 * codegen'd scalar expressions, which is the preferred extension depth —
 * a custom physical operator would add maintenance surface without a plan
 * Catalyst cannot already produce.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.funcs.sqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}
