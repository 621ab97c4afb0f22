package graft.exploratory

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.JsonDSL._

import graft.charts.ChartSpec
import graft.charts.VegaLite.{dfRecords, spec => mkSpec, titled}
import graft.functions.funcs

/**
 * The reference's exploratory similarity-analysis helpers
 * (`splink/exploratory/similarity_analysis` →
 * `splink/internals/similarity_analysis.py`): score example string pairs
 * under every comparator the engine ships, show their phonetic codes, and
 * render the heatmap charts an analyst uses to pick comparison-level
 * thresholds.
 *
 * The reference evaluates the scores IN DuckDB (`similarity_analysis.py:
 * 10-21` runs `_comparator_cols_sql` through a local connection), so its
 * `jaccard` is DuckDB's character-SET Jaccard — mirrored here with
 * [[funcs.jaccard_chars]], not the Spark-jar bigram variant. All scoring
 * runs through the engine's native codegen'd expressions; for the
 * intended input (a small hand-picked list of example pairs) this is one
 * local job, and the same frame API scales to a full column of pairs
 * unchanged.
 */
object SimilarityAnalysis {

  /** All five comparator scores for each (col1, col2) pair, appended to
    * the input columns (`similarity_analysis.py:48-80`
    * `comparator_score_df`). Similarities are rounded to `decimalPlaces`
    * like the reference; integer distances are exact. */
  def comparatorScoreDf(pairs: DataFrame, col1: String, col2: String,
      decimalPlaces: Int = 2): DataFrame = {
    val (a, b) = (col(col1), col(col2))
    pairs.select(pairs.columns.map(col) ++ Seq(
      levenshtein(a, b).as("levenshtein_distance"),
      funcs.damerau_levenshtein(a, b).as("damerau_levenshtein_distance"),
      round(funcs.jaro_sim(a, b), decimalPlaces).as("jaro_similarity"),
      round(funcs.jaro_winkler(a, b), decimalPlaces)
        .as("jaro_winkler_similarity"),
      round(funcs.jaccard_chars(a, b), decimalPlaces)
        .as("jaccard_similarity")): _*)
  }

  /** Single-pair convenience (`similarity_analysis.py:23-46`
    * `comparator_score`). */
  def comparatorScore(spark: SparkSession, str1: String, str2: String,
      decimalPlaces: Int = 2): DataFrame = {
    import spark.implicits._
    comparatorScoreDf(Seq((str1, str2)).toDF("string1", "string2"),
      "string1", "string2", decimalPlaces)
  }

  /** Phonetic codes for both sides of each pair
    * (`similarity_analysis.py:190-264` `phonetic_transform_df`): soundex
    * and classic metaphone as 2-element [left, right] arrays; `dmetaphone`
    * carries the full (primary, alternate) tuple per side — a 2-element
    * array of 2-element arrays, `[[p_l, a_l], [p_r, a_r]]` — exactly the
    * shape the reference gets from `phonetics.dmetaphone`. */
  def phoneticTransformDf(pairs: DataFrame, col1: String,
      col2: String): DataFrame = {
    val (a, b) = (col(col1), col(col2))
    pairs.select(pairs.columns.map(col) ++ Seq(
      array(funcs.soundex_code(a), funcs.soundex_code(b)).as("soundex"),
      array(funcs.metaphone(a), funcs.metaphone(b)).as("metaphone"),
      array(array(funcs.dmetaphone(a), funcs.dmetaphone_alt(a)),
        array(funcs.dmetaphone(b), funcs.dmetaphone_alt(b)))
        .as("dmetaphone")): _*)
  }

  /** Single-string phonetic codes (`similarity_analysis.py:170-188`
    * `phonetic_transform`). The reference's `dmetaphone` value is the
    * package's (primary, alternate) tuple; both ride here under
    * `dmetaphone` / `dmetaphone_alt`. */
  def phoneticTransform(s: String): Map[String, String] = Map(
    "soundex" -> graft.functions.Phonetics.soundex(s),
    "metaphone" -> graft.functions.Phonetics.metaphone(s),
    "dmetaphone" -> graft.functions.Phonetics.doubleMetaphone(s),
    "dmetaphone_alt" -> graft.functions.Phonetics.doubleMetaphoneAlt(s))

  // --------------------------------------------------------------- charts

  private def pairColumn(col1: String, col2: String): JObject =
    ("calculate" -> s"datum.$col1 + ', ' + datum.$col2") ~ ("as" -> "pair")

  private val SimilarityMetrics =
    List("jaro_similarity", "jaro_winkler_similarity", "jaccard_similarity")
  private val DistanceMetrics =
    List("levenshtein_distance", "damerau_levenshtein_distance")

  private def heatPanel(metrics: List[String], stripSuffix: String,
      title: String, colorEnc: JObject): JValue =
    ("transform" -> JArray(List(
      (("fold" -> metrics) ~ ("as" -> List("comparator", "score"))): JValue,
      // the reference strips the `_similarity`/`_distance` suffix from
      // the melted comparator names (`similarity_analysis.py:118-126`)
      ("calculate" -> s"replace(datum.comparator, '$stripSuffix', '')") ~
        ("as" -> "comparator")))) ~
    ("title" -> (("text" -> title): JObject)) ~
    ("mark" -> "rect") ~
    ("encoding" ->
      (("x" -> (("field" -> "comparator") ~ ("type" -> "nominal") ~
         ("title" -> ""))) ~
       ("y" -> (("field" -> "pair") ~ ("type" -> "nominal") ~ ("title" -> ""))) ~
       ("color" -> colorEnc) ~
       ("tooltip" -> JArray(List(
         ("field" -> "pair") ~ ("type" -> "nominal"): JValue,
         ("field" -> "comparator") ~ ("type" -> "nominal"),
         ("field" -> "score") ~ ("type" -> "quantitative") ~
           ("format" -> ".4g"))))))

  /** Similarity + distance heatmaps side by side
    * (`similarity_analysis.py:83-130` + `charts.py:707-714`). */
  def comparatorScoreChart(pairs: DataFrame, col1: String,
      col2: String): ChartSpec = {
    val recs = dfRecords(comparatorScoreDf(pairs, col1, col2))
    ChartSpec(mkSpec(recs, titled("Comparator scores") ~
      ("transform" -> JArray(List(pairColumn(col1, col2): JValue))) ~
      ("hconcat" -> JArray(List(
        heatPanel(SimilarityMetrics, "_similarity", "Similarity",
          ("field" -> "score") ~ ("type" -> "quantitative") ~
            ("scale" -> (("domain" -> List(0.0, 1.0)) ~
              ("scheme" -> "greenblue")))),
        heatPanel(DistanceMetrics, "_distance", "Distance",
          ("field" -> "score") ~ ("type" -> "quantitative") ~
            ("scale" -> (("reverse" -> true) ~ ("scheme" -> "yellowred")))))))))
  }

  /** Pass/fail heatmaps at a similarity >= / distance <= threshold
    * (`similarity_analysis.py:133-188` + `charts.py:717-736`). Both
    * thresholds default to None like the reference; a panel renders only
    * when its threshold is given (the reference renders a degenerate
    * all-fail `>= None` panel instead — deliberate divergence). With
    * neither given, both panels render unconditioned score heatmaps. */
  def comparatorScoreThresholdChart(pairs: DataFrame, col1: String,
      col2: String, similarityThreshold: Option[Double] = None,
      distanceThreshold: Option[Int] = None): ChartSpec = {
    val recs = dfRecords(comparatorScoreDf(pairs, col1, col2))
    val panels: List[JValue] =
      if (similarityThreshold.isEmpty && distanceThreshold.isEmpty)
        List(
          heatPanel(SimilarityMetrics, "_similarity", "Similarity",
            ("field" -> "score") ~ ("type" -> "quantitative") ~
              ("scale" -> (("domain" -> List(0.0, 1.0)) ~
                ("scheme" -> "greenblue")))),
          heatPanel(DistanceMetrics, "_distance", "Distance",
            ("field" -> "score") ~ ("type" -> "quantitative") ~
              ("scale" -> (("reverse" -> true) ~ ("scheme" -> "yellowred")))))
      else
        similarityThreshold.map(t =>
          heatPanel(SimilarityMetrics, "_similarity", s">= $t",
            ("condition" ->
              (("test" -> s"datum.score >= $t") ~
               ("value" -> "green"))) ~ ("value" -> "red"))).toList ++
        distanceThreshold.map(t =>
          heatPanel(DistanceMetrics, "_distance", s"<= $t",
            ("condition" ->
              (("test" -> s"datum.score <= $t") ~
               ("value" -> "green"))) ~ ("value" -> "red"))).toList
    ChartSpec(mkSpec(recs, titled("Comparator scores at threshold") ~
      ("transform" -> JArray(List(pairColumn(col1, col2): JValue))) ~
      ("hconcat" -> JArray(panels))))
  }

  /** Phonetic agreement heatmap (`similarity_analysis.py:267-311`
    * `phonetic_match_chart` + `charts.py:739-745`): one cell per
    * (pair, phonetic), green when both sides share the code. */
  def phoneticMatchChart(pairs: DataFrame, col1: String,
      col2: String): ChartSpec = {
    val coded = phoneticTransformDf(pairs, col1, col2)
    val long = (Seq("soundex", "metaphone").map { ph =>
      coded.select(col(col1), col(col2), lit(ph).as("phonetic"),
        concat_ws(", ", col(ph)).as("codes"),
        (element_at(col(ph), 1) === element_at(col(ph), 2)).as("matches"))
    } :+ coded.select(col(col1), col(col2), lit("dmetaphone").as("phonetic"),
      // full (primary, alternate) tuple per side, like the reference's
      // `x[0] == x[1]` over `phonetics.dmetaphone` tuples: equal-on-primary
      // but differing-on-alternate pairs are NON-matching
      concat_ws(", ", flatten(col("dmetaphone"))).as("codes"),
      (element_at(col("dmetaphone"), 1) === element_at(col("dmetaphone"), 2))
        .as("matches"))).reduce(_.unionByName(_))
    val recs = dfRecords(long)
    ChartSpec(mkSpec(recs, titled("Phonetic matches") ~
      ("transform" -> JArray(List(pairColumn(col1, col2): JValue))) ~
      ("mark" -> "rect") ~
      ("encoding" ->
        (("x" -> (("field" -> "phonetic") ~ ("type" -> "nominal") ~
           ("title" -> ""))) ~
         ("y" -> (("field" -> "pair") ~ ("type" -> "nominal") ~
           ("title" -> ""))) ~
         ("color" ->
           (("condition" -> (("test" -> "datum.matches === true") ~
              ("value" -> "green"))) ~ ("value" -> "red"))) ~
         ("tooltip" -> JArray(List(
           ("field" -> "pair") ~ ("type" -> "nominal"): JValue,
           ("field" -> "phonetic") ~ ("type" -> "nominal"),
           ("field" -> "codes") ~ ("type" -> "nominal"),
           ("field" -> "matches") ~ ("type" -> "nominal"))))))))
  }
}
