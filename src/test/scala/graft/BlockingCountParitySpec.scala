package graft

import org.apache.spark.sql.DataFrame
import graft.model._
import graft.model.{LevelLibrary => ll}
import graft.evaluation.Evaluation
import graft.operators.VerticalConcat

/** Ports the reference's `test_analyse_blocking.py` exact comparison
  * counts (three small frames, every link type, equi and cartesian
  * rules) against `countComparisonsLinkAware`. */
class BlockingCountParitySpec extends SparkSpec {
  import spark.implicits._

  lazy val df1 = Seq((1L, "John", "Smith"), (2L, "Mary", "Jones"),
    (3L, "Jane", "Taylor"), (4L, "John", "Brown"))
    .toDF("unique_id", "first_name", "surname")
  lazy val df2 = Seq((1L, "John", "Smyth"), (2L, "Mary", "Jones"),
    (3L, "Jayne", "Tailor")).toDF("unique_id", "first_name", "surname")
  lazy val df3 = Seq((1L, "John", "Smith"), (2L, "Mary", "Jones"))
    .toDF("unique_id", "first_name", "surname")

  private def settings(lt: LinkType) = LinkSettings(
    linkType = lt,
    blockingRules = Seq(BlockingRule.blockOn("first_name")),
    comparisons = Seq(Comparison("surname", Seq(
      ll.nullLevel("surname"),
      ll.exactMatch("surname").withM(0.9).withU(0.1),
      ll.elseLevel.withM(0.1).withU(0.9)))))

  private def count(inputs: Seq[(String, DataFrame)], lt: LinkType,
      rule: BlockingRule): Long = {
    val s = settings(lt)
    val concat = VerticalConcat(inputs, s)
    Evaluation.countComparisonsLinkAware(concat, s, rule, exact = true)
      .collect()(0).getAs[Long]("n_comparisons")
  }

  val cartesian = BlockingRule.CustomBlockingRule("1=1")

  test("dedupe_only counts (test_analyse_blocking.py:54-60)") {
    assert(count(Seq("df1" -> df1), LinkType.DedupeOnly, cartesian) == 6)
    assert(count(Seq("df1" -> df1), LinkType.DedupeOnly,
      BlockingRule.blockOn("first_name")) == 1)
  }

  test("link_only counts (test_analyse_blocking.py:62-83)") {
    val two = Seq("df1" -> df1, "df2" -> df2)
    assert(count(two, LinkType.LinkOnly, cartesian) == 12)
    assert(count(two, LinkType.LinkOnly, BlockingRule.blockOn("surname")) == 1)
    assert(count(two, LinkType.LinkOnly, BlockingRule.blockOn("first_name")) == 3)
    val three = two :+ ("df3" -> df3)
    assert(count(three, LinkType.LinkOnly, cartesian) == 4 * 3 + 4 * 2 + 2 * 3)
  }

  test("link_and_dedupe counts (test_analyse_blocking.py:86-102)") {
    val two = Seq("df1" -> df1, "df2" -> df2)
    assert(count(two, LinkType.LinkAndDedupe, cartesian) ==
      4 * 3 + (4 * 3 / 2) + (3 * 2 / 2))
    assert(count(two, LinkType.LinkAndDedupe,
      BlockingRule.CustomBlockingRule("l.first_name = r.first_name and l.surname = r.surname")) == 1)
    assert(count(two, LinkType.LinkAndDedupe,
      BlockingRule.blockOn("first_name", "surname")) == 1)
  }
}
