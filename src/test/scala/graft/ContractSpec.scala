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
