package graft

import org.apache.spark.sql.functions._
import graft.model.ColExpr

class ColExprSpec extends SparkSpec {
  import spark.implicits._

  test("transform chain renders and evaluates") {
    val df = Seq(Tuple1("  AB12 3CD  "), Tuple1("xyz"), Tuple1(null: String)).toDF("postcode")
    val ce = ColExpr("postcode").lower.regexExtract("^\\s*([a-z]+)", 1)
    val got = df.select(ce.column).collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("ab"), Some("xyz"), None))
  }

  test("empty regex extract becomes null (NULLIF wrap)") {
    val df = Seq(Tuple1("123")).toDF("v")
    val ce = ColExpr("v").regexExtract("[a-z]+")
    assert(df.select(ce.column).first().isNullAt(0))
  }

  test("try-parse date returns null on garbage") {
    val df = Seq(("2020-01-15", "not-a-date")).toDF("good", "bad")
    val g = ColExpr("good").tryParseDate()
    val b = ColExpr("bad").tryParseDate()
    val row = df.select(g.column, b.column).first()
    assert(row.getDate(0).toString == "2020-01-15")
    assert(row.isNullAt(1))
  }

  test("array element access") {
    val df = Seq(Tuple1(Seq("a", "b", "c"))).toDF("arr")
    val row = df.select(
      ColExpr("arr").firstArrayElement.column,
      ColExpr("arr").lastArrayElement.column).first()
    assert(row.getString(0) == "a" && row.getString(1) == "c")
  }

  test("l/r rendering plugs into comparison levels") {
    val ce = ColExpr("email").lower.regexExtract("^[^@]+")
    assert(ce.sqlL.contains("email_l") && ce.sqlR.contains("email_r"))
    val df = Seq(("Bob@x.com", "bob@y.org")).toDF("email_l", "email_r")
    val level = graft.model.LevelLibrary.custom("username", s"${ce.sqlL} = ${ce.sqlR}")
    assert(df.select(level.condition).first().getBoolean(0))
  }

  test("substr + nullif + cast chain") {
    val df = Seq(Tuple1(42)).toDF("n")
    val ce = ColExpr("n").castToString.substr(1, 1).nullif("9")
    assert(df.select(ce.column).first().getString(0) == "4")
  }
}
