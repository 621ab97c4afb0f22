package graft

import org.apache.spark.sql.functions._
import graft.operators.BlockingAdvisor

/** Candidate blocking-rule profiling via one GROUPING SETS pass:
  * brute-force metric equality, null-key semantics, budgeted
  * recommendation, and the single-input-scan plan shape. */
class BlockingAdvisorSpec extends SparkSpec {
  import spark.implicits._

  // (city, surname, phone) with nulls and a hot city key
  private def frame = Seq(
    ("london", "smith", "020-1"), ("london", "smith", "020-2"),
    ("london", "jones", "020-3"), ("london", null, "020-4"),
    ("leeds", "smith", "0113-1"), ("leeds", "patel", null),
    (null, "patel", "0161-1"), (null, null, "0161-2")
  ).toDF("city", "surname", "phone")

  test("profile matches a per-candidate brute force, null keys excluded") {
    val got = BlockingAdvisor.profile(frame, Seq("city", "surname"))
      .collect().map(r => r.getAs[String]("rule") ->
        ((r.getAs[Int]("n_columns"), r.getAs[Long]("n_comparisons"),
          r.getAs[Long]("n_blocks"), r.getAs[Long]("largest_block"),
          r.getAs[Double]("completeness")))).toMap
    // city: london=4, leeds=2 (nulls out) -> 6+1=7 pairs, completeness 6/8
    assert(got("block_on(city)") == ((1, 7L, 2L, 4L, 0.75)))
    // surname: smith=3, jones=1, patel=2 -> 3+0+1, completeness 6/8
    assert(got("block_on(surname)") == ((1, 4L, 3L, 3L, 0.75)))
    // city+surname: (london,smith)=2, (london,jones)=1, (leeds,smith)=1,
    // (leeds,patel)=1 -> 1 pair, completeness 5/8
    assert(got("block_on(city, surname)") == ((2, 1L, 4L, 2L, 0.625)))
    assert(got.size == 3)
  }

  test("SQL-fragment candidates (with commas) survive the full round trip") {
    val advice = BlockingAdvisor.recommend(frame,
      Seq("city", "substr(phone, 1, 3)"), budget = 100)
    assert(advice.nonEmpty)
    val best = advice.head
    // substr(phone, 1, 3): 020x4(1 null surname row still counts)=6 pairs,
    // 011=0, 016=1 -> 7 pairs at completeness 7/8 — beats city (6/8)
    assert(best.rule.exprs == Seq("substr(phone, 1, 3)"))
    assert(best.nComparisons == 7L && best.completeness == 0.875)
    // the recommended rule is directly usable by the blocking machinery,
    // and the advisor's count IS the blocked-pair count
    val linker = new Linker(
      frame.withColumn("unique_id", monotonically_increasing_id()),
      graft.model.LinkSettings(
        linkType = graft.model.LinkType.DedupeOnly,
        blockingRules = Seq(best.rule),
        comparisons = Seq(graft.model.ComparisonLibrary.exactMatch("city"))))
    assert(linker.blockedIdPairs().count() == best.nComparisons)
  }

  test("recommend respects the budget, drops zero-count rules, ranks " +
      "completeness first then loosest") {
    val advice = BlockingAdvisor.recommend(frame, Seq("city", "surname"),
      budget = 5)
    // city (7 pairs) over budget; surname (4) in; city+surname (1) in
    assert(advice.map(_.rule.exprs) ==
      Seq(Seq("surname"), Seq("city", "surname")))
    // nothing affordable -> empty, never an exception
    assert(BlockingAdvisor.recommend(frame, Seq("city"), budget = 0).isEmpty)
    // a never-repeating key blocks nothing and is never recommended
    val uniq = (1 to 10).map(i => (s"u$i", "x")).toDF("uid_key", "const")
    val rec = BlockingAdvisor.recommend(uniq, Seq("uid_key"), budget = 1000)
    assert(rec.isEmpty)
  }

  test("Linker.suggestBlockingRules profiles the model's own comparison " +
      "columns and returns applicable rules") {
    import graft.model._
    import graft.model.{LevelLibrary => ll}
    val df = frame.withColumn("unique_id", monotonically_increasing_id())
    val settings = LinkSettings(
      linkType = LinkType.DedupeOnly,
      blockingRules = Seq(BlockingRule.blockOn("phone")),
      comparisons = Seq(
        Comparison("city", Seq(ll.nullLevel("city"),
          ll.exactMatch("city").withM(0.9).withU(0.1),
          ll.elseLevel.withM(0.1).withU(0.9))),
        Comparison("surname", Seq(ll.nullLevel("surname"),
          ll.exactMatch("surname").withM(0.9).withU(0.1),
          ll.elseLevel.withM(0.1).withU(0.9)))))
    val linker = new Linker(df, settings)
    val advice = linker.suggestBlockingRules(budget = 100)
    // candidates come from the comparison columns (city, surname), ranked
    // completeness first: both singles tie at 6/8, city is looser (7 > 4)
    assert(advice.map(_.rule.exprs) == Seq(Seq("city"), Seq("surname"),
      Seq("city", "surname")))
    val applied = new Linker(df, settings.copy(
      blockingRules = Seq(advice.head.rule)))
    assert(applied.blockedIdPairs().count() == advice.head.nComparisons)
  }

  test("recommendSet charges overlapping rules their NOT-previous " +
      "marginal cost, not their individual count") {
    val df = frame.withColumn("unique_id", monotonically_increasing_id())
    // individual counts: city=7, surname=4, city+surname=1; but under
    // NOT-previous semantics the pairs of (city, surname) overlap heavily:
    // exact union = city(7) + surname-only pairs not sharing city
    val (chosen, total) = graft.operators.BlockingAdvisor.recommendSet(
      df, Seq("city", "surname"), budget = 9, maxRules = 3)
    // greedy ranking: city (7, compl .75) first; surname individually 4
    // would bust a naive 7+4 > 9 budget, but its marginal pairs are only
    // smith(0,4? cross-city) + patel -> exact cumulative fits
    assert(chosen.map(_.rule.exprs).contains(Seq("city")))
    assert(total <= 9, s"cumulative $total must respect the budget")
    // the reported total is the engine's own multi-rule count
    val settings = graft.model.LinkSettings(
      linkType = graft.model.LinkType.DedupeOnly,
      blockingRules = chosen.map(_.rule),
      comparisons = Seq(graft.model.ComparisonLibrary.exactMatch("city")))
    assert(new Linker(df, settings).blockedIdPairs().count() == total)
    // and the set beats any single rule under the same budget
    assert(total >= chosen.map(_.nComparisons).max)
  }

  test("randomized property: profile equals a driver brute force at " +
      "every arity and column count (gid bit-order check)") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 5) {
      val m = 2 + rnd.nextInt(3) // 2..4 candidate columns
      val nRows = 30 + rnd.nextInt(40)
      val cols = (0 until m).map(i => s"c$i")
      // small value domains force collisions; ~20% nulls exercise the
      // null-rejecting semantics
      val rows = (0 until nRows).map { _ =>
        (0 until m).map { _ =>
          if (rnd.nextDouble() < 0.2) null
          else s"v${rnd.nextInt(4)}"
        }
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(
          r => org.apache.spark.sql.Row(r: _*)), 2),
        org.apache.spark.sql.types.StructType(cols.map(c =>
          org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.StringType))))
      val maxArity = 1 + rnd.nextInt(m)
      val got = BlockingAdvisor.profile(df, cols, maxArity)
        .collect().map(r => r.getAs[String]("rule") ->
          ((r.getAs[Long]("n_comparisons"), r.getAs[Long]("n_blocks"),
            r.getAs[Long]("largest_block"),
            r.getAs[Double]("completeness")))).toMap
      val sets = (1 to maxArity).flatMap(a => (0 until m).combinations(a))
      assert(got.size == sets.size)
      for (s <- sets) {
        val label = s"block_on(${s.map(cols).mkString(", ")})"
        val keys = rows.map(r => s.map(r)).filter(_.forall(_ != null))
        val groups = keys.groupBy(identity).values.map(_.size.toLong).toSeq
        val expect = (groups.map(n => n * (n - 1) / 2).sum,
          groups.size.toLong,
          if (groups.isEmpty) 0L else groups.max,
          BigDecimal(keys.size.toDouble / nRows)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
        assert(got(label) == expect,
          s"trial $trial m=$m arity=$maxArity rule=$label: " +
            s"got ${got(label)}, expected $expect")
      }
    }
  }

  test("sampled profiling: 24 exprs / arity 3 (2324 candidates) agrees " +
      "with an exact driver brute force within sampling tolerance") {
    val rnd = new scala.util.Random(101L)
    val m = 24
    val n = 3000
    val cols = (0 until m).map(i => s"c$i")
    // two-value domains force large blocks (every candidate block holds
    // hundreds of rows, so the 1/f^2 estimator concentrates)
    val rows = (0 until n).map { id =>
      org.apache.spark.sql.Row(
        (Seq(id.toString) ++ (0 until m).map(j => s"v${rnd.nextInt(2)}")): _*)
    }
    val schema = org.apache.spark.sql.types.StructType(
      (Seq("row_id") ++ cols).map(c =>
        org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    // the exact path refuses this width outright
    intercept[IllegalArgumentException] {
      BlockingAdvisor.profile(df, cols, maxArity = 3)
    }
    val f = 0.3
    val got = BlockingAdvisor.profileSampled(df, cols, "row_id", f,
        maxArity = 3)
      .collect().map(r => r.getAs[String]("rule") ->
        ((r.getAs[Long]("n_comparisons"), r.getAs[Long]("largest_block"),
          r.getAs[Double]("completeness")))).toMap
    val sets = (1 to 3).flatMap(a => (0 until m).combinations(a))
    assert(got.size == sets.size && sets.size == 2324)
    val data = rows.map(r => (0 until m).map(j => r.getString(j + 1)))
    var worstRel = 0.0
    for (s <- sets) {
      val label = s"block_on(${s.map(cols).mkString(", ")})"
      val groups = data.map(r => s.map(r)).groupBy(identity)
        .values.map(_.size.toLong)
      val exact = groups.map(x => x * (x - 1) / 2).sum
      val (estPairs, estLargest, estCompl) = got(label)
      val rel = math.abs(estPairs - exact).toDouble / exact
      worstRel = math.max(worstRel, rel)
      assert(rel < 0.25,
        s"$label: sampled $estPairs vs exact $exact (rel $rel)")
      val exactLargest = groups.max
      assert(math.abs(estLargest - exactLargest).toDouble / exactLargest
        < 0.35, s"$label largest: $estLargest vs $exactLargest")
      assert(estCompl == 1.0, "no nulls -> completeness exactly 1")
    }
    info(f"worst relative n_comparisons error over 2324 candidates: " +
      f"$worstRel%.3f")
  }

  test("sampled profiling keeps the single-scan single-Expand plan shape") {
    val df = frame.withColumn("row_id",
      monotonically_increasing_id().cast("string"))
    val rendered = BlockingAdvisor.profileSampled(df,
        Seq("city", "surname", "phone"), "row_id", 0.5)
      .queryExecution.executedPlan.toString
    assert(rendered.linesIterator.count(_.contains("LocalTableScan")) == 1,
      s"expected 1 input scan:\n$rendered")
    assert(rendered.linesIterator.count(_.contains("Expand")) == 1,
      s"expected 1 Expand:\n$rendered")
  }

  test("profile plan codegen: every whole-stage subtree compiles AND stays " +
      "JIT-able at the exact cap (16 exprs) and the sampled max (24/arity 3)") {
    import org.apache.spark.sql.execution.debug._
    // codegenStringSeq can't see inside an unexecuted AdaptiveSparkPlan
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def check(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
        val res = codegenStringSeq(df.queryExecution.executedPlan)
        assert(res.nonEmpty, s"$what: no whole-stage codegen subtrees")
        for ((subtree, _, stats) <- res) {
          assert(stats.maxMethodCodeSize > 0,
            s"$what: a whole-stage subtree failed janino compilation " +
              s"(silent interpreted fallback):\n$subtree")
          assert(stats.maxMethodCodeSize <= 8000,
            s"$what: generated method is ${stats.maxMethodCodeSize}B " +
              s"bytecode — past HotSpot's huge-method JIT limit:\n$subtree")
        }
      }
      val c16 = (0 until 16).map(i => s"c$i")
      val df16 = spark.range(100).select(
        c16.map(c => (col("id") % 3).cast("string").as(c)): _*)
      check(BlockingAdvisor.profile(df16, c16, maxArity = 2),
        "exact 16 exprs / arity 2 (136 sets)")
      val c24 = (0 until 24).map(i => s"c$i")
      val df24 = spark.range(100).select(
        c24.map(c => (col("id") % 3).cast("string").as(c)) :+
          col("id").cast("string").as("row_id"): _*)
      check(BlockingAdvisor.profileSampled(df24, c24, "row_id", 0.5,
        maxArity = 3), "sampled 24 exprs / arity 3 (2324 sets)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("one input scan and one wide-input exchange feed all candidates") {
    val rendered = BlockingAdvisor.profile(frame, Seq("city", "surname", "phone"))
      .queryExecution.executedPlan.toString
    // the candidate lattice (6 sets) must NOT re-scan the input per rule:
    // one Expand over one scan, then the grouping aggregate (string match —
    // the AQE wrapper hides the inner plan from collect())
    assert(rendered.linesIterator.count(_.contains("LocalTableScan")) == 1,
      s"expected 1 input scan:\n$rendered")
    assert(rendered.linesIterator.count(_.contains("Expand")) == 1,
      s"expected 1 Expand:\n$rendered")
  }
}
