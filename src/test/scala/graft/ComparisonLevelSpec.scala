package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model._
import graft.model.{LevelLibrary => ll}

/**
 * Literal-level tests of comparison levels: feed literal `_l`/`_r` rows,
 * assert in/out of level — the reference's `is_in_level` harness
 * (`splink/internals/testing.py:16-103`, `tests/test_comparison_level_lib.py`).
 */
class ComparisonLevelSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.funcs.registerAll(spark)

  def inLevel(level: ComparisonLevel, df: DataFrame): Seq[Boolean] =
    df.select(coalesce(level.condition, lit(false))).collect().map(_.getBoolean(0)).toSeq

  test("string levels: exact, levenshtein, damerau, jaro, jw, jaccard") {
    val df = Seq(
      ("martha", "martha"), ("martha", "marhta"), ("martha", "xyz"),
      (null, "martha")).toDF("c_l", "c_r")
    assert(inLevel(ll.exactMatch("c"), df) == Seq(true, false, false, false))
    assert(inLevel(ll.levenshtein("c", 2), df) == Seq(true, true, false, false))
    assert(inLevel(ll.damerauLevenshtein("c", 1), df) == Seq(true, true, false, false))
    assert(inLevel(ll.jaro("c", 0.9), df) == Seq(true, true, false, false))
    assert(inLevel(ll.jaroWinkler("c", 0.95), df) == Seq(true, true, false, false))
    assert(inLevel(ll.jaccard("c", 0.5), df) == Seq(true, false, false, false))
    assert(inLevel(ll.nullLevel("c"), df) == Seq(false, false, false, true))
  }

  test("numeric levels: absolute and percentage difference") {
    val df = Seq((100.0, 105.0), (100.0, 130.0), (-50.0, -52.0))
      .toDF("v_l", "v_r")
    assert(inLevel(ll.absoluteDifference("v", 10.0), df) == Seq(true, false, true))
    assert(inLevel(ll.percentageDifference("v", 0.1), df) == Seq(true, false, true))
  }

  test("date levels: absolute date difference") {
    val df = Seq(("2020-01-01", "2020-01-15"), ("2020-01-01", "2021-06-01"))
      .toDF("d0_l", "d0_r")
      .select(to_date(col("d0_l")).as("d_l"), to_date(col("d0_r")).as("d_r"))
    assert(inLevel(ll.absoluteDateDifference("d", 30), df) == Seq(true, false))
    assert(inLevel(ll.absoluteDateDifference("d", 600), df) == Seq(true, true))
  }

  test("time level: absolute time difference in seconds") {
    val df = Seq(("2020-01-01 10:00:00", "2020-01-01 10:30:00"))
      .toDF("t0_l", "t0_r")
      .select(to_timestamp(col("t0_l")).as("t_l"), to_timestamp(col("t0_r")).as("t_r"))
    assert(inLevel(ll.absoluteTimeDifference("t", 3600), df) == Seq(true))
    assert(inLevel(ll.absoluteTimeDifference("t", 600), df) == Seq(false))
  }

  test("geo level: distance in km (London-Paris ~344km)") {
    val df = Seq((51.5074, -0.1278, 48.8566, 2.3522))
      .toDF("lat_l", "lon_l", "lat_r", "lon_r")
    assert(inLevel(ll.distanceInKM("lat", "lon", 400), df) == Seq(true))
    assert(inLevel(ll.distanceInKM("lat", "lon", 300), df) == Seq(false))
  }

  test("array levels: intersect, subset, pairwise distance") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "b"), Seq("a", "b", "z")),
      (Seq("a"), Seq("x"))).toDF("arr_l", "arr_r")
    assert(inLevel(ll.arrayIntersect("arr", 2), df) == Seq(true, true, false))
    assert(inLevel(ll.arraySubset("arr"), df) == Seq(false, true, false))
    val pw = ll.pairwiseStringDistance("arr", "jaro_winkler", 0.99)
    assert(inLevel(pw, df) == Seq(true, true, false))
  }

  test("cosine similarity level on float arrays") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("v_l", "v_r")
    assert(inLevel(ll.cosineSimilarity("v", 0.9), df) == Seq(true, false))
  }

  test("columns reversed and literal match") {
    val df = Seq(("john", "smith", "smith", "john"), ("a", "b", "c", "d"))
      .toDF("fn_l", "sn_l", "fn_r", "sn_r")
    assert(inLevel(ll.columnsReversed("fn", "sn"), df) == Seq(true, false))
  }

  test("phonetic level: dmetaphone equality") {
    val df = Seq(("catherine", "katherine"), ("smith", "jones"))
      .toDF("n_l", "n_r")
    val level = ll.custom("dmetaphone", "dmetaphone(n_l) = dmetaphone(n_r)")
    assert(inLevel(level, df) == Seq(true, false))
  }

  test("composed levels: and/or/not") {
    val df = Seq(("a", "a", 1.0, 1.0), ("a", "a", 1.0, 99.0), ("a", "b", 1.0, 1.0))
      .toDF("s_l", "s_r", "v_l", "v_r")
    val both = ll.and("both", ll.exactMatch("s"), ll.absoluteDifference("v", 0.5))
    assert(inLevel(both, df) == Seq(true, false, false))
    val either = ll.or("either", ll.exactMatch("s"), ll.absoluteDifference("v", 0.5))
    assert(inLevel(either, df) == Seq(true, true, true))
  }

  private def gammas(c: Comparison, df: DataFrame): Seq[Int] =
    df.select(c.gammaColumn).collect().map(_.getInt(0)).toSeq

  test("email template reproduces the reference's literal gammas " +
      "(test_comparison_template_lib.py:7-49)") {
    val df = Seq(
      ("john@smith.com", "john@smith.com"),            // exact -> 4
      ("rebecca@company.com", "rebecca@smith.com"),    // username -> 3
      ("rebecca@company.com", "rebbecca@company.com"), // jw email -> 2
      ("rebecca@company.com", "rebbecca@xyz.com"),     // jw username -> 1
      ("john@smith.com", "rebbecca@xyz.com"))          // else -> 0
      .toDF("email_l", "email_r")
    assert(gammas(ComparisonLibrary.email("email"), df) == Seq(4, 3, 2, 1, 0))
  }

  test("date-of-birth template reproduces the reference's literal gammas " +
      "(test_comparison_template_lib.py:53-105)") {
    val df = Seq(
      ("1990-05-20", "1990-05-20"), // exact -> 5
      ("1990-05-01", "1990-05-11"), // damerau-levenshtein <= 1 -> 4
      ("1990-05-20", "1990-06-19"), // <= 1 month -> 3
      ("1990-05-20", "1991-04-21"), // <= 1 year -> 2
      ("1990-05-20", "1999-02-20"), // <= 10 years -> 1
      ("1990-05-20", "2010-01-17")) // else -> 0
      .toDF("s_l", "s_r")
      .select(to_date(col("s_l")).as("dob_l"), to_date(col("s_r")).as("dob_r"))
    assert(gammas(ComparisonLibrary.dateOfBirth("dob"), df) ==
      Seq(5, 4, 3, 2, 1, 0))
  }

  test("postcode template reproduces the reference's literal gammas " +
      "(test_comparison_template_lib.py:109-151)") {
    val df = Seq(
      ("SW1A 1AA", "SW1A 1AA"), // full -> 4
      ("SW1A 1AA", "SW1A 1AB"), // sector -> 3
      ("SW1A 1AA", "SW1A 2AA"), // district -> 2
      ("SW1A 1AA", "SW2A 1AA"), // area -> 1
      ("SW1A 1AA", "NW1A 1AA")) // else -> 0
      .toDF("postcode_l", "postcode_r")
    assert(gammas(ComparisonLibrary.postcode("postcode"), df) ==
      Seq(4, 3, 2, 1, 0))
  }

  test("name template reproduces the reference's literal gammas " +
      "(test_comparison_template_lib.py:156-199)") {
    val df = Seq(
      ("John", "John"),       // exact -> 4
      ("Stephen", "Stephan"), // jw >= 0.92 -> 3
      ("Stephen", "Steven"),  // jw >= 0.88 -> 2
      ("Stephen", "Steve"),   // jw >= 0.70 -> 1
      ("Alice", "Bob"))       // else -> 0
      .toDF("name_l", "name_r")
    assert(gammas(ComparisonLibrary.name("name"), df) == Seq(4, 3, 2, 1, 0))
  }

  test("forename-surname template reproduces the reference's literal " +
      "gammas (test_comparison_template_lib.py:202-260)") {
    val df = Seq(
      ("John", "John", "Smith", "Smith"),       // exact both -> 6
      ("James", "Smith", "Smith", "James"),     // reversed -> 5
      ("Stephen", "Stephan", "Smith", "Smith"), // jw .92 both -> 4
      ("Stephen", "Steven", "Smith", "Smith"),  // jw .88 both -> 3
      ("John", "John", "Doe", "Smith"),         // exact forename -> 1
      ("Alice", "Bob", "Jones", "Smith"))       // else -> 0
      .toDF("forename_l", "forename_r", "surname_l", "surname_r")
    assert(gammas(ComparisonLibrary.forenameSurname("forename", "surname"), df)
      == Seq(6, 5, 4, 3, 1, 0))
  }

  test("array-intersect template reproduces the reference's literal " +
      "gammas (test_array_columns.py:10-65)") {
    val df = Seq(
      (Seq("A", "B", "C", "D"), Seq("A", "B", "C", "D")), // >=4 -> 4
      (Seq("A", "B", "C", "D"), Seq("A", "B", "C", "Z")), // >=3 -> 3
      (Seq("A", "B"), Seq("A", "B", "C", "D")),           // >=2 -> 2
      (Seq("A", "B", "C", "D"), Seq("X", "Y", "Z")))      // else -> 0
      .toDF("arr_l", "arr_r")
    assert(gammas(ComparisonLibrary.arrayIntersectAtSizes("arr",
      Seq(4, 3, 2, 1)), df) == Seq(4, 3, 2, 0))
    // second reference case: sizes [4, 1] -> gammas 2 / 1 / 1
    assert(gammas(ComparisonLibrary.arrayIntersectAtSizes("arr",
      Seq(4, 1)), df) == Seq(2, 1, 1, 0))
  }

  test("pairwise-string-distance template reproduces the reference's " +
      "literal gammas (test_comparison_lib.py:69-121)") {
    val df = Seq(
      (Seq("Cally", "Sally"), Seq("Cally")),             // shared elem -> 3
      (Seq("Geof"), Seq("Geoff")),                       // min dl <= 1 -> 2
      (Seq("Saly", "Barey"), Seq("Sally", "Barry")),     // min dl <= 1 -> 2
      (Seq("Carry", "Different"), Seq("Barry", "Completely")), // -> 2
      (Seq("Carry", "Sabby"), Seq("Cally")),             // min dl <= 2 -> 1
      (Seq("Completely", "Different"), Seq("Something", "Else"))) // else -> 0
      .toDF("forename_l", "forename_r")
    assert(gammas(ComparisonLibrary.pairwiseStringDistanceAtThresholds(
      "forename", "damerau_levenshtein", Seq(1.0, 2.0)), df) ==
      Seq(3, 2, 2, 2, 1, 0))
  }

  test("pairwise-string-distance thresholds keep caller order " +
      "(comparison_library.py:350 builds levels as given)") {
    val sorted = ComparisonLibrary.pairwiseStringDistanceAtThresholds(
      "x", "damerau_levenshtein", Seq(1.0, 2.0))
    val unsorted = ComparisonLibrary.pairwiseStringDistanceAtThresholds(
      "x", "damerau_levenshtein", Seq(2.0, 1.0))
    def thresholdsOf(c: graft.model.Comparison): Seq[String] =
      c.levels.map(_.label)
    // same level multiset, but caller order preserved — NOT re-sorted
    assert(thresholdsOf(unsorted) == thresholdsOf(sorted).take(2) ++
      thresholdsOf(sorted).slice(2, 4).reverse ++ thresholdsOf(sorted).drop(4))
  }

  test("comparison templates expand to expected level counts") {
    assert(ComparisonLibrary.exactMatch("x").levels.size == 3)
    assert(ComparisonLibrary.levenshteinAtThresholds("x", Seq(1, 2)).levels.size == 5)
    assert(ComparisonLibrary.name("x").levels.size == 6)
    assert(ComparisonLibrary.name("x", dmetaphone = true).levels.size == 7)
    assert(ComparisonLibrary.email("x").levels.size == 6)
    assert(ComparisonLibrary.postcode("x").levels.size == 6)
    assert(ComparisonLibrary.dateOfBirth("x").levels.size == 7)
    assert(ComparisonLibrary.forenameSurname("fn", "sn").levels.size == 8)
    // gamma ordering: most similar level has highest gamma
    val c = ComparisonLibrary.levenshteinAtThresholds("x", Seq(1, 2))
    val gammas = c.activeLevelsWithGamma.map(_._2)
    assert(gammas == Seq(3, 2, 1, 0))
  }
}
