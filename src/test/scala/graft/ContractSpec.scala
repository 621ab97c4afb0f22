package graft

/** Driver-contract invariants: every declared query must carry a DuckDB
  * oracle (a missing entry silently downgrades the driver's check to
  * rows-only), and names must be unique and well-formed. */
class ContractSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("every query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q -- o == Set.empty, s"queries without oracle: ${q -- o}")
    assert(o -- q == Set.empty, s"oracles without query: ${o -- q}")
  }

  test("every query executes fully codegen'd (whole-stage fallback disabled)") {
    // a silent Janino failure runs the stage interpreted with correct
    // results — this sweep turns any such regression into a hard failure
    val spark = SparkSpec.session
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      SparkEntry.queries.foreach { case (name, fn) =>
        try {
          val n = fn(spark, "/root/testdata/sf0.001").count()
          assert(n >= 0)
        } catch {
          case e: Throwable =>
            fail(s"$name failed with codegen fallback disabled: " +
              e.getMessage.take(300))
        }
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("oracle SQL references only driver-registered tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // crude FROM/JOIN scan: every bare identifier after FROM/JOIN is either
    // a registered table or a CTE defined in the same statement
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val ctes = "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([a-z0-9_, ]*\\))?\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val refs = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- tables -- ctes
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }
}
