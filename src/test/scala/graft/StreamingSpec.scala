package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.model._
import graft.model.{LevelLibrary => ll}
import graft.streaming.StreamingLink

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming find-matches scores each micro-batch against the corpus") {
    val corpus = Seq(
      (0L, "John", "Smith"), (1L, "Mary", "Jones"), (2L, "Peter", "Brown"))
      .toDF("unique_id", "first_name", "surname")
    val settings = LinkSettings(
      linkType = LinkType.DedupeOnly,
      blockingRules = Seq(BlockingRule.blockOn("surname")),
      comparisons = Seq(Comparison("first_name", Seq(
        ll.nullLevel("first_name"),
        ll.exactMatch("first_name").withM(0.9).withU(0.01),
        ll.elseLevel.withM(0.1).withU(0.99)))),
      probabilityTwoRandomRecordsMatch = 0.1)
    val linker = new Linker(corpus, settings)

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    stream.addData((100L, "John", "Smith"), (101L, "Zoe", "Nguyen"))
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    val query = StreamingLink.startCollecting(linker,
      stream.toDF.toDF("unique_id", "first_name", "surname"), None, out)
    query.awaitTermination(60000)
    // only (0, 100) share the Smith block; Zoe matches nothing
    assert(out.map(r => (r.getAs[Long]("unique_id_l"),
      r.getAs[Long]("unique_id_r"))).toSet == Set((0L, 100L)))
  }
}
