package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.charts.ChartSpec
import graft.exploratory.SimilarityAnalysis
import graft.functions.Phonetics

/** Exploratory similarity-analysis helpers (reference
  * `splink/internals/similarity_analysis.py`): comparator score frames,
  * phonetic transform frames, and the heatmap chart emitters. */
class SimilarityAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def pairs = Seq(
    ("Stephen", "Stephen"),
    ("Stephen", "Steven"),
    ("Stephen", "Stephan")
  ).toDF("string1", "string2")

  private def parse(c: ChartSpec): JValue = JsonMethods.parse(c.json)

  private def arr(j: JValue): List[JValue] = j match {
    case JArray(xs) => xs
    case _ => fail(s"expected array, got $j")
  }

  test("comparatorScoreDf: five comparators, reference column names and values") {
    val rows = SimilarityAnalysis
      .comparatorScoreDf(pairs, "string1", "string2")
      .collect()
      .map(r => r.getAs[String]("string2") -> r).toMap
    assert(rows.size == 3)
    val cols = SimilarityAnalysis
      .comparatorScoreDf(pairs, "string1", "string2").columns.toSeq
    assert(cols == Seq("string1", "string2", "levenshtein_distance",
      "damerau_levenshtein_distance", "jaro_similarity",
      "jaro_winkler_similarity", "jaccard_similarity"))
    // identical strings: zero distance, unit similarity
    val same = rows("Stephen")
    assert(same.getAs[Int]("levenshtein_distance") == 0)
    assert(same.getAs[Double]("jaro_similarity") == 1.0)
    assert(same.getAs[Double]("jaccard_similarity") == 1.0)
    // reference's own docstring example pair, scores rounded to 2dp
    val steven = rows("Steven")
    assert(steven.getAs[Int]("levenshtein_distance") == 2)
    assert(steven.getAs[Int]("damerau_levenshtein_distance") == 2)
    assert(steven.getAs[Double]("jaro_similarity") ==
      BigDecimal(graft.functions.StringSim.jaro("Stephen", "Steven"))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("comparatorScore single-pair convenience matches the frame API") {
    val one = SimilarityAnalysis
      .comparatorScore(spark, "Richard", "iRchard").collect()
    assert(one.length == 1)
    // one transposition: damerau 1, levenshtein 2
    assert(one(0).getAs[Int]("damerau_levenshtein_distance") == 1)
    assert(one(0).getAs[Int]("levenshtein_distance") == 2)
  }

  test("phoneticTransformDf: [left, right] code arrays; dmetaphone keeps tuples") {
    val df = SimilarityAnalysis.phoneticTransformDf(pairs, "string1", "string2")
    assert(df.columns.toSeq ==
      Seq("string1", "string2", "soundex", "metaphone", "dmetaphone"))
    val r = df.where($"string2" === "Steven").collect()(0)
    assert(r.getSeq[String](2) ==
      Seq(Phonetics.soundex("Stephen"), Phonetics.soundex("Steven")))
    assert(r.getSeq[String](3) ==
      Seq(Phonetics.metaphone("Stephen"), Phonetics.metaphone("Steven")))
    // dmetaphone carries the full (primary, alternate) tuple per side
    assert(r.getSeq[Seq[String]](4) == Seq(
      Seq(Phonetics.doubleMetaphone("Stephen"),
        Phonetics.doubleMetaphoneAlt("Stephen")),
      Seq(Phonetics.doubleMetaphone("Steven"),
        Phonetics.doubleMetaphoneAlt("Steven"))))
  }

  test("phoneticTransform includes the double-metaphone alternate") {
    val m = SimilarityAnalysis.phoneticTransform("Smith")
    assert(m.keySet ==
      Set("soundex", "metaphone", "dmetaphone", "dmetaphone_alt"))
    assert(m("dmetaphone") == Phonetics.doubleMetaphone("Smith"))
    assert(m("dmetaphone_alt") == Phonetics.doubleMetaphoneAlt("Smith"))
    assert(m("dmetaphone") != m("dmetaphone_alt")) // SM0 vs XMT
  }

  test("comparatorScoreChart: data rows present, fold strips metric suffixes") {
    val j = parse(SimilarityAnalysis.comparatorScoreChart(pairs, "string1", "string2"))
    assert(arr(j \ "data" \ "values").size == 3)
    val panels = arr(j \ "hconcat")
    assert(panels.size == 2)
    // each panel's fold is followed by the suffix-stripping calculate
    panels.zip(Seq("_similarity", "_distance")).foreach { case (p, suffix) =>
      val tr = arr(p \ "transform")
      assert(tr.exists(t => (t \ "fold") != JNothing))
      val calcs = tr.flatMap(t => (t \ "calculate") match {
        case JString(s) => Some(s); case _ => None
      })
      assert(calcs.exists(_.contains(suffix)), s"no $suffix strip in $calcs")
    }
  }

  test("comparatorScoreThresholdChart: panels render only for given thresholds") {
    def panels(c: ChartSpec): List[JValue] = arr(parse(c) \ "hconcat")
    val both = SimilarityAnalysis.comparatorScoreThresholdChart(
      pairs, "string1", "string2", Some(0.8), Some(2))
    assert(panels(both).size == 2)
    val simOnly = SimilarityAnalysis.comparatorScoreThresholdChart(
      pairs, "string1", "string2", similarityThreshold = Some(0.8))
    assert(panels(simOnly).size == 1)
    val JString(title) = (panels(simOnly).head \ "title" \ "text"): @unchecked
    assert(title == ">= 0.8")
    val none = SimilarityAnalysis.comparatorScoreThresholdChart(
      pairs, "string1", "string2")
    assert(panels(none).size == 2) // unconditioned score heatmaps
    panels(none).foreach(p =>
      assert((p \ "encoding" \ "color" \ "condition") == JNothing))
  }

  test("phoneticMatchChart: dmetaphone match requires primary AND alternate") {
    // equal primaries, different alternates: Smith/Schmidt both encode
    // primary XMT under double metaphone? use a constructed pair instead:
    // dmetaphone('Smith') = (SM0, XMT); dmetaphone('Smyth') = (SM0, XMT)
    // — matching tuple. For a primary-equal/alternate-unequal pair use
    // Catherine (KTRN, KTRN) vs Kathryn? verify from the kernels directly.
    val df = Seq(
      ("Smith", "Smyth"),
      ("Stephen", "Steven")
    ).toDF("string1", "string2")
    val j = parse(SimilarityAnalysis.phoneticMatchChart(df, "string1", "string2"))
    val recs = arr(j \ "data" \ "values")
    // 2 pairs x 3 phonetics
    assert(recs.size == 6)
    val dmeta = recs.filter(r =>
      (r \ "phonetic") == JString("dmetaphone"))
    assert(dmeta.size == 2)
    dmeta.foreach { r =>
      val JString(s2) = (r \ "string2"): @unchecked
      val JBool(m) = (r \ "matches"): @unchecked
      val expected =
        Phonetics.doubleMetaphoneBoth(if (s2 == "Smyth") "Smith" else "Stephen") ==
          Phonetics.doubleMetaphoneBoth(s2)
      assert(m == expected, s"dmetaphone match for $s2")
      // codes render all four codes for the tooltip
      val JString(codes) = (r \ "codes"): @unchecked
      assert(codes.split(", ").length == 4)
    }
  }
}
