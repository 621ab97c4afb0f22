package graft

import graft.pipeline.TextOps

/** Gopher rule-based quality gate (Rae et al. 2021 appendix A1.1): each
  * rule's feature and the conjunction verdict. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private val good = ("the quick brown fox and the lazy dog have been " +
    "seen with that other animal near the fence of our garden yesterday " +
    "morning while everyone watched quietly from the old porch") // 31 toks

  private def run(rows: (Long, String)*) =
    TextOps.gopherRules(rows.toSeq.toDF("doc_id", "text"), "doc_id", "text",
        minTokens = 10, minStopHits = 2)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("a clean document passes every rule") {
    val out = run((1L, good))(1L)
    assert(out.getAs[Int]("keep") == 1)
    assert(out.getAs[Long]("n_tokens") == 31L)
    assert(out.getAs[Double]("alpha_word_ratio") == 1.0)
    assert(out.getAs[Long]("n_stop_hits") >= 2L)
  }

  test("too short, symbol-heavy, and stopword-free docs are rejected") {
    val out = run(
      (1L, "just five words right here"),                  // < 10 tokens
      (2L, good + " ## ## ## ## ## ... ... ... ... ..."),  // symbol ratio
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"))   // no stopwords
    assert(out(1L).getAs[Int]("keep") == 0)
    assert(out(2L).getAs[Int]("keep") == 0)
    assert(out(2L).getAs[Double]("symbol_word_ratio") > 0.1)
    assert(out(3L).getAs[Int]("keep") == 0)
    assert(out(3L).getAs[Long]("n_stop_hits") == 0L)
  }

  test("bullet and ellipsis line ratios count lines, numeric words fail alpha") {
    val bullets = (1 to 9).map(i => s"- bullet item number $i").mkString("\n")
    val out = run(
      (1L, bullets + "\nclosing line"),
      (2L, good.split(" ").take(8).mkString(" ") + "\nand then some more..." +
        "\nanother trailing thing...\nplain line\nplain again"),
      (3L, (1 to 12).map(_.toString).mkString(" ") + " the and of"))
    assert(out(1L).getAs[Double]("bullet_line_ratio") == 0.9)
    assert(out(1L).getAs[Int]("keep") == 0)
    assert(out(2L).getAs[Double]("ellipsis_line_ratio") == 0.4)
    // 12 numeric words of 15 -> alpha ratio 0.2
    assert(out(3L).getAs[Double]("alpha_word_ratio") == 0.2)
    assert(out(3L).getAs[Int]("keep") == 0)
  }

  test("empty text yields zero features and is rejected") {
    val out = run((1L, ""))(1L)
    assert(out.getAs[Long]("n_tokens") == 0L)
    assert(out.getAs[Int]("keep") == 0)
  }

  test("null text propagates null features and a null verdict (oracle-consistent)") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Some("the be to of and that have with more words here")),
        (2L, None: Option[String]))
      .toDF("doc_id", "text")
    val out = TextOps.gopherRules(df, "doc_id", "text",
        minTokens = 5, minStopHits = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("keep") == 1)
    // DuckDB's NULL-text row yields NULL features and a NULL keep; the
    // engine must agree or the hash compare would diverge
    assert(out(2L).isNullAt(out(2L).fieldIndex("n_tokens")))
    assert(out(2L).isNullAt(out(2L).fieldIndex("keep")))
    val tc = TextOps.tokenCounts(df, "doc_id", "text")
      .filter(col("doc_id") === 2L).collect()(0)
    assert(tc.isNullAt(tc.fieldIndex("ws_tokens")))
    assert(tc.isNullAt(tc.fieldIndex("bpe_tokens")))
  }
}
