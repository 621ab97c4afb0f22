package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val c = expr("first_name_l = first_name_r")
    val e = GraftSqlBridge.expression(c)
    println("CLASS: " + e.getClass)
    println("TREE: " + e)
    println("ATTRS: " + e.collect { case a: UnresolvedAttribute => a.name })
    val qualified = graft.model.BlockingRule.sideExpr("surname", "l")
    val qe = GraftSqlBridge.expression(qualified)
    println("QUAL TREE: " + qe)
    val cond = graft.model.BlockingRule.blockOn("surname").condition
    println("COND TREE: " + GraftSqlBridge.expression(cond))
    spark.stop()
  }
}
