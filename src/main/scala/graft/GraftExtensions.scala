package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/**
 * Spark-native extension entry point: register the engine's functions via
 * `spark.sql.extensions=graft.GraftExtensions` (the supported mechanism for
 * third-party Catalyst expressions — the reference instead calls
 * `spark.udf.registerJavaFunction` per session,
 * `spark/database_api.py:175-199`). `funcs.registerAll(spark)` remains the
 * programmatic equivalent.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def reg(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    reg("jaro_sim", es => JaroSim(es(0), es(1)))
    reg("jaro_winkler", es => JaroWinklerSim(es(0), es(1)))
    reg("damerau_levenshtein", es => DamerauLevenshtein(es(0), es(1)))
    reg("jaccard_sim", es => JaccardSim(es(0), es(1)))
    reg("dmetaphone", es => DMetaphone(es(0)))
    reg("dmetaphone_alt", es => DMetaphoneAlt(es(0)))
    reg("qgram_tokenise", es => QgramTokenise(es(0),
      es(1).eval(null).asInstanceOf[Int]))
    reg("simhash64", es => SimHash64(es(0)))
    reg("char_shingles", es => CharShingles(es(0),
      es(1).eval(null).asInstanceOf[Int]))
    reg("text_stats", es => TextStats(es(0)))
  }
}
