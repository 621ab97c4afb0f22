package graft.model

/**
 * Builder library for comparison levels and comparison templates. Mirrors
 * the reference surface in `splink/internals/comparison_level_library.py`
 * (1119 LoC) and `comparison_library.py` (1237 LoC), re-expressed as Spark
 * SQL condition strings over `_l`/`_r` suffixed columns. The custom
 * similarity functions (jaro_sim, jaro_winkler, damerau_levenshtein,
 * jaccard_sim, dmetaphone) are registered by
 * [[graft.functions.funcs.registerAll]].
 */
object LevelLibrary {
  import Cols.{l, r}

  /** `l IS NULL OR r IS NULL` (`comparison_level_library.py:88-123`). */
  def nullLevel(c: String): ComparisonLevel =
    ComparisonLevel(s"$c is NULL", s"${l(c)} IS NULL OR ${r(c)} IS NULL", isNull = true)

  /** Null level applied to an expression of the column (e.g. regex extract). */
  def nullLevelExpr(c: String, exprTemplate: String): ComparisonLevel = {
    val le = exprTemplate.replace("{}", l(c))
    val re = exprTemplate.replace("{}", r(c))
    ComparisonLevel(s"$c transformed is NULL", s"($le) IS NULL OR ($re) IS NULL",
      isNull = true)
  }

  def elseLevel: ComparisonLevel = ComparisonLevel("All other comparisons", "ELSE")

  /** `l = r` (`comparison_level_library.py:236-292`). */
  def exactMatch(c: String, tfAdjustment: Boolean = false): ComparisonLevel = {
    val lv = ComparisonLevel(s"Exact match on $c", s"${l(c)} = ${r(c)}")
    if (tfAdjustment) lv.copy(tfColumn = Some(c)) else lv
  }

  def custom(label: String, sql: String): ComparisonLevel = ComparisonLevel(label, sql)

  /** `col = literal` on both sides (`:295-360`). */
  def literalMatch(c: String, value: String): ComparisonLevel =
    ComparisonLevel(s"$c = '$value'",
      s"${l(c)} = '$value' AND ${r(c)} = '$value'")

  /** `col1_l = col2_r` optionally symmetric (`:363-403`). */
  def columnsReversed(c1: String, c2: String, symmetric: Boolean = true): ComparisonLevel = {
    val sql =
      if (symmetric) s"${l(c1)} = ${r(c2)} AND ${l(c2)} = ${r(c1)}"
      else s"${l(c1)} = ${r(c2)}"
    ComparisonLevel(s"Match on reversed cols: $c1 and $c2", sql)
  }

  /** `levenshtein(l, r) <= d` (`:406-428`) — decided by the banded
    * early-exit kernel (`levenshtein_lte`, O(n*d)) instead of the
    * built-in full-matrix distance: the predicate is the single
    * hottest term of the gamma CASE at 100M+ pairs (measured ~3us/pair
    * built-in vs sub-us banded on 18-char names). */
  def levenshtein(c: String, d: Int): ComparisonLevel =
    ComparisonLevel(s"Levenshtein distance of $c <= $d",
      s"levenshtein_lte(${l(c)}, ${r(c)}, $d)")

  /** `damerau_levenshtein(l, r) <= d` — decided by the banded bounded
    * kernel (`damerau_levenshtein_lte`, O(n*d)) instead of the full
    * alphabet-mapped O(n*m) matrix, mirroring the levenshtein level. */
  def damerauLevenshtein(c: String, d: Int): ComparisonLevel =
    ComparisonLevel(s"Damerau-Levenshtein distance of $c <= $d",
      s"damerau_levenshtein_lte(${l(c)}, ${r(c)}, $d)")

  def jaroWinkler(c: String, t: Double): ComparisonLevel =
    ComparisonLevel(s"Jaro-Winkler distance of $c >= $t",
      s"jaro_winkler(${l(c)}, ${r(c)}) >= $t")

  def jaro(c: String, t: Double): ComparisonLevel =
    ComparisonLevel(s"Jaro distance of $c >= $t",
      s"jaro_sim(${l(c)}, ${r(c)}) >= $t")

  def jaccard(c: String, t: Double): ComparisonLevel =
    ComparisonLevel(s"Jaccard distance of $c >= $t",
      s"jaccard_sim(${l(c)}, ${r(c)}) >= $t")

  /** Arbitrary registered distance fn (`:563-610`). */
  def distanceFunction(c: String, fn: String, t: Double,
      higherIsMoreSimilar: Boolean = true): ComparisonLevel = {
    val op = if (higherIsMoreSimilar) ">=" else "<="
    ComparisonLevel(s"$fn of $c $op $t", s"$fn(${l(c)}, ${r(c)}) $op $t")
  }

  /** Best pairwise distance over two array columns via higher-order
    * functions — same shape the reference generates (`:613-709`). */
  def pairwiseStringDistance(c: String, fn: String, t: Double,
      higherIsMoreSimilar: Boolean = true): ComparisonLevel = {
    val agg = if (higherIsMoreSimilar) "array_max" else "array_min"
    val op = if (higherIsMoreSimilar) ">=" else "<="
    val sql = s"$agg(flatten(transform(${l(c)}, x -> transform(${r(c)}, " +
      s"y -> $fn(x, y))))) $op $t"
    ComparisonLevel(s"Pairwise $fn of $c $op $t", sql)
  }

  /** `abs(epoch(l) - epoch(r)) <= seconds` (`:715-837`). */
  def absoluteTimeDifference(c: String, thresholdSeconds: Long): ComparisonLevel =
    ComparisonLevel(s"Abs time difference of $c <= ${thresholdSeconds}s",
      s"abs(unix_timestamp(${l(c)}) - unix_timestamp(${r(c)})) <= $thresholdSeconds")

  /** Date variant in days (`:839-846`). */
  def absoluteDateDifference(c: String, thresholdDays: Int): ComparisonLevel =
    ComparisonLevel(s"Abs date difference of $c <= ${thresholdDays}d",
      s"abs(datediff(${l(c)}, ${r(c)})) <= $thresholdDays")

  /** Haversine great-circle distance <= km
    * (`:849-904`, formula `comparison_level_sql.py:1-30`). */
  def distanceInKM(latCol: String, lonCol: String, km: Double): ComparisonLevel = {
    val latL = l(latCol); val latR = r(latCol); val lonL = l(lonCol); val lonR = r(lonCol)
    val sql =
      s"""2 * 6371 * asin(sqrt(
         |  pow(sin(radians($latR - $latL) / 2), 2) +
         |  cos(radians($latL)) * cos(radians($latR)) *
         |  pow(sin(radians($lonR - $lonL) / 2), 2)
         |)) <= $km""".stripMargin.replace("\n", " ")
    ComparisonLevel(s"Distance in km <= $km", sql)
  }

  /** Cosine similarity of array columns >= t — higher-order built-ins, the
    * exact Spark formula the reference emits (`dialects.py:409-427`). */
  def cosineSimilarity(c: String, t: Double): ComparisonLevel = {
    val sql = s"""(aggregate(zip_with(${l(c)}, ${r(c)}, (x, y) -> CAST(x AS DOUBLE) * y),
      |CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
      |/ (sqrt(aggregate(${l(c)}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * v))
      |* sqrt(aggregate(${r(c)}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * v)))) >= $t"""
      .stripMargin.replace("\n", " ")
    ComparisonLevel(s"Cosine similarity of $c >= $t", sql)
  }

  /** `size(array_intersect(l, r)) >= n` (`:957-1000`). */
  def arrayIntersect(c: String, minSize: Int = 1): ComparisonLevel =
    ComparisonLevel(s"Array intersection size >= $minSize",
      s"size(array_intersect(${l(c)}, ${r(c)})) >= $minSize")

  /** Intersection = smaller array (subset), empty arrays excluded (`:1003-1046`). */
  def arraySubset(c: String): ComparisonLevel =
    ComparisonLevel(s"Array subset of $c",
      s"size(array_intersect(${l(c)}, ${r(c)})) = least(size(${l(c)}), size(${r(c)})) " +
        s"AND least(size(${l(c)}), size(${r(c)})) > 0")

  /** `abs(l - r) / greatest(l, r) < t` (`:1049-1085`). */
  def percentageDifference(c: String, t: Double): ComparisonLevel =
    ComparisonLevel(s"Percentage difference of $c < $t",
      s"abs(${l(c)} - ${r(c)}) / greatest(abs(${l(c)}), abs(${r(c)})) < $t")

  /** `abs(l - r) <= t` (`:1088-1119`). */
  def absoluteDifference(c: String, t: Double): ComparisonLevel =
    ComparisonLevel(s"Abs difference of $c <= $t",
      s"abs(${l(c)} - ${r(c)}) <= $t")

  def and(label: String, parts: ComparisonLevel*): ComparisonLevel =
    ComparisonLevel(label, parts.map(p => s"(${p.sqlCondition})").mkString(" AND "))
  def or(label: String, parts: ComparisonLevel*): ComparisonLevel =
    ComparisonLevel(label, parts.map(p => s"(${p.sqlCondition})").mkString(" OR "))
  def not(label: String, part: ComparisonLevel): ComparisonLevel =
    ComparisonLevel(label, s"NOT (${part.sqlCondition})")
}

/** Comparison templates (`splink/internals/comparison_library.py`). */
object ComparisonLibrary {
  import LevelLibrary._

  /** `ExactMatch` (`comparison_library.py:14`). */
  def exactMatch(c: String, tfAdjustment: Boolean = false): Comparison =
    Comparison(c, Seq(nullLevel(c), LevelLibrary.exactMatch(c, tfAdjustment), elseLevel))

  /** `LevenshteinAtThresholds` (`:42`). */
  def levenshteinAtThresholds(c: String, thresholds: Seq[Int] = Seq(1, 2)): Comparison =
    Comparison(c, nullLevel(c) +: LevelLibrary.exactMatch(c) +:
      thresholds.map(levenshtein(c, _)) :+ elseLevel)

  /** `DamerauLevenshteinAtThresholds` (`:92`). */
  def damerauLevenshteinAtThresholds(c: String, thresholds: Seq[Int] = Seq(1, 2)): Comparison =
    Comparison(c, nullLevel(c) +: LevelLibrary.exactMatch(c) +:
      thresholds.map(damerauLevenshtein(c, _)) :+ elseLevel)

  /** `JaccardAtThresholds` (`:148`). */
  def jaccardAtThresholds(c: String, thresholds: Seq[Double] = Seq(0.9, 0.7)): Comparison =
    Comparison(c, nullLevel(c) +: LevelLibrary.exactMatch(c) +:
      thresholds.map(jaccard(c, _)) :+ elseLevel)

  /** `JaroAtThresholds` (`:195`). */
  def jaroAtThresholds(c: String, thresholds: Seq[Double] = Seq(0.9, 0.7)): Comparison =
    Comparison(c, nullLevel(c) +: LevelLibrary.exactMatch(c) +:
      thresholds.map(jaro(c, _)) :+ elseLevel)

  /** `JaroWinklerAtThresholds` (`:242`). */
  def jaroWinklerAtThresholds(c: String, thresholds: Seq[Double] = Seq(0.9, 0.7)): Comparison =
    Comparison(c, nullLevel(c) +: LevelLibrary.exactMatch(c) +:
      thresholds.map(jaroWinkler(c, _)) :+ elseLevel)

  /** `AbsoluteTimeDifferenceAtThresholds` (`:420`). */
  def absoluteTimeDifferenceAtThresholds(c: String, seconds: Seq[Long]): Comparison =
    Comparison(c, nullLevel(c) +: LevelLibrary.exactMatch(c) +:
      seconds.map(absoluteTimeDifference(c, _)) :+ elseLevel)

  /** `AbsoluteDateDifferenceAtThresholds` (`:541`). */
  def absoluteDateDifferenceAtThresholds(c: String, days: Seq[Int]): Comparison =
    Comparison(c, nullLevel(c) +: LevelLibrary.exactMatch(c) +:
      days.map(absoluteDateDifference(c, _)) :+ elseLevel)

  /** `ArrayIntersectAtSizes` (`:551`). */
  def arrayIntersectAtSizes(c: String, sizes: Seq[Int] = Seq(1)): Comparison =
    Comparison(c, nullLevel(c) +:
      sizes.sorted.reverse.map(arrayIntersect(c, _)) :+ elseLevel)

  /** `PairwiseStringDistanceFunctionAtThresholds` (`:350`): top level is
    * array intersection >= 1 (any exact shared element), then best-pair
    * distance/similarity thresholds in CALLER order — the reference builds
    * levels exactly as given (comparison_library.py:350), so unsorted
    * thresholds produce the same (loose-first) gamma assignment there and
    * here. */
  def pairwiseStringDistanceAtThresholds(c: String, fn: String,
      thresholds: Seq[Double],
      higherIsMoreSimilar: Boolean = false): Comparison =
    Comparison(c, nullLevel(c) +: arrayIntersect(c, 1) +:
      thresholds.map(t =>
        pairwiseStringDistance(c, fn, t, higherIsMoreSimilar)) :+ elseLevel)

  /** `DistanceInKMAtThresholds` (`:596`). */
  def distanceInKMAtThresholds(lat: String, lon: String, kms: Seq[Double],
      name: String = "latlon"): Comparison =
    Comparison(name, nullLevelCombined(Seq(lat, lon)) +:
      kms.sorted.map(distanceInKM(lat, lon, _)) :+ elseLevel)

  /** `CosineSimilarityAtThresholds` (`:1196`). */
  def cosineSimilarityAtThresholds(c: String, thresholds: Seq[Double] = Seq(0.9)): Comparison =
    Comparison(c, nullLevel(c) +:
      thresholds.sorted.reverse.map(cosineSimilarity(c, _)) :+ elseLevel)

  /** `CustomComparison` (`:647`). */
  def customComparison(name: String, levels: Seq[ComparisonLevel]): Comparison =
    Comparison(name, levels)

  /** `NameComparison` (`:1005`): exact (TF-able), jaro-winkler bands,
    * dmetaphone, else. */
  /** `NameComparison` (`:1005`): default levels exact / jw .92 / .88 / .7;
    * the dmetaphone level is OPT-IN, matching the reference's
    * `dmeta_col_name=None` default. */
  def name(c: String, tfAdjustment: Boolean = false,
      dmetaphone: Boolean = false): Comparison = {
    val dmeta = if (dmetaphone)
      Seq(custom(s"dmetaphone match on $c",
        s"dmetaphone(${Cols.l(c)}) = dmetaphone(${Cols.r(c)})"))
    else Nil
    Comparison(c, Seq(
      nullLevel(c),
      LevelLibrary.exactMatch(c, tfAdjustment),
      jaroWinkler(c, 0.92),
      jaroWinkler(c, 0.88)) ++ dmeta ++ Seq(
      jaroWinkler(c, 0.7),
      elseLevel))
  }

  /** `ForenameSurnameComparison` (`:1090`). */
  def forenameSurname(forename: String, surname: String,
      name: String = "forename_surname"): Comparison =
    Comparison(name, Seq(
      nullLevelCombined(Seq(forename, surname)),
      custom("Exact match on both",
        s"${Cols.l(forename)} = ${Cols.r(forename)} AND ${Cols.l(surname)} = ${Cols.r(surname)}"),
      columnsReversed(forename, surname),
      custom(s"JW >= 0.92 on both",
        s"jaro_winkler(${Cols.l(forename)}, ${Cols.r(forename)}) >= 0.92 AND " +
          s"jaro_winkler(${Cols.l(surname)}, ${Cols.r(surname)}) >= 0.92"),
      custom(s"JW >= 0.88 on both",
        s"jaro_winkler(${Cols.l(forename)}, ${Cols.r(forename)}) >= 0.88 AND " +
          s"jaro_winkler(${Cols.l(surname)}, ${Cols.r(surname)}) >= 0.88"),
      custom(s"Exact on $surname", s"${Cols.l(surname)} = ${Cols.r(surname)}"),
      custom(s"Exact on $forename", s"${Cols.l(forename)} = ${Cols.r(forename)}"),
      elseLevel))

  /** `DateOfBirthComparison` (`:712`): exact, damerau-lev 1 on string form,
    * widening date windows. */
  def dateOfBirth(c: String): Comparison =
    Comparison(c, Seq(
      nullLevel(c),
      custom(s"Exact match on $c", s"${Cols.l(c)} = ${Cols.r(c)}"),
      custom(s"DamerauLevenshtein distance <= 1",
        s"damerau_levenshtein(CAST(${Cols.l(c)} AS STRING), CAST(${Cols.r(c)} AS STRING)) <= 1"),
      absoluteDateDifference(c, 31),
      absoluteDateDifference(c, 366),
      absoluteDateDifference(c, 3653),
      elseLevel))

  /** `EmailComparison` (`:954`): exact, username-only exact, jw on username,
    * else. */
  def email(c: String): Comparison = {
    def user(side: String) = s"regexp_extract($side, '^[^@]+', 0)"
    Comparison(c, Seq(
      nullLevel(c),
      custom(s"Exact match on $c", s"${Cols.l(c)} = ${Cols.r(c)}"),
      custom("Exact match on username",
        s"${user(Cols.l(c))} = ${user(Cols.r(c))}"),
      custom("JW >= 0.88 on email",
        s"jaro_winkler(${Cols.l(c)}, ${Cols.r(c)}) >= 0.88"),
      custom("JW >= 0.88 on username",
        s"jaro_winkler(${user(Cols.l(c))}, ${user(Cols.r(c))}) >= 0.88"),
      elseLevel))
  }

  /** `PostcodeComparison` (`:836`): full, sector, district, area matches. */
  def postcode(c: String): Comparison = {
    def re(side: String, pat: String) = s"regexp_extract($side, '$pat', 0)"
    val sector = "^[A-Za-z]{1,2}[0-9][A-Za-z0-9]? [0-9]"
    val district = "^[A-Za-z]{1,2}[0-9][A-Za-z0-9]?"
    val area = "^[A-Za-z]{1,2}"
    Comparison(c, Seq(
      nullLevel(c),
      custom(s"Exact match on full postcode", s"${Cols.l(c)} = ${Cols.r(c)}"),
      custom("Exact match on sector", s"${re(Cols.l(c), sector)} = ${re(Cols.r(c), sector)}"),
      custom("Exact match on district", s"${re(Cols.l(c), district)} = ${re(Cols.r(c), district)}"),
      custom("Exact match on area", s"${re(Cols.l(c), area)} = ${re(Cols.r(c), area)}"),
      elseLevel))
  }

  private def nullLevelCombined(cols: Seq[String]): ComparisonLevel =
    ComparisonLevel(s"${cols.mkString("/")} is NULL",
      cols.map(c => s"${Cols.l(c)} IS NULL OR ${Cols.r(c)} IS NULL").mkString(" OR "),
      isNull = true)
}
