package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.GraftSqlBridge

/**
 * Core model for the linkage engine: link type, blocking rules, comparisons
 * made of ordered comparison levels, and the prior. Mirrors the reference's
 * Settings / Comparison / ComparisonLevel tree (reference:
 * `splink/internals/settings.py:197-270`, `comparison.py:26-114`,
 * `comparison_level.py:161-246`) but compiles to Spark `Column` trees
 * instead of SQL strings.
 *
 * Conventions (same as the reference):
 *  - pairwise tables carry columns suffixed `_l` / `_r`
 *  - comparison-vector columns are `gamma_<output_column_name>` (-1 = null
 *    level, 0 = else level, highest = most similar)
 *  - term-frequency columns are `tf_<col>`; per-comparison Bayes-factor
 *    columns `bf_<name>`; TF-adjusted `bf_tf_adj_<name>`
 */
object Cols {
  val MatchKey = "match_key"
  val MatchWeight = "match_weight"
  val MatchProbability = "match_probability"
  def gamma(name: String): String = s"gamma_$name"
  def bf(name: String): String = s"bf_$name"
  def bfTf(name: String): String = s"bf_tf_adj_$name"
  def tf(col: String): String = s"tf_$col"
  def l(c: String): String = s"${c}_l"
  def r(c: String): String = s"${c}_r"
}

sealed trait LinkType
object LinkType {
  /** Dedupe a single input frame against itself. */
  case object DedupeOnly extends LinkType
  /** Find links across >=2 frames; never within a frame. */
  case object LinkOnly extends LinkType
  /** Both within- and across-frame pairs. */
  case object LinkAndDedupe extends LinkType
  def fromString(s: String): LinkType = s match {
    case "dedupe_only" => DedupeOnly
    case "link_only" => LinkOnly
    case "link_and_dedupe" => LinkAndDedupe
    case other => throw new IllegalArgumentException(s"unknown link_type $other")
  }
  def asString(lt: LinkType): String = lt match {
    case DedupeOnly => "dedupe_only"
    case LinkOnly => "link_only"
    case LinkAndDedupe => "link_and_dedupe"
  }
}

/** One parameter estimate recorded by a training session
  * (`comparison_level.py:355-399`). `observed = false` marks a session in
  * which the level never appeared (the reference's LEVEL_NOT_OBSERVED_TEXT,
  * `em_training_session.py:336-353`) — such sessions are excluded from the
  * median so one sparse session can't drag a real estimate toward the
  * sentinel. */
case class TrainedValue(probability: Double, description: String,
    observed: Boolean = true)

/**
 * One level of a comparison: a boolean predicate over `_l`/`_r` suffixed
 * columns plus trained/declared m and u probabilities.
 *
 * `sqlCondition` is Spark SQL (parsed with `expr`); "ELSE" marks the
 * catch-all level — same convention as the reference's model JSON
 * (`comparison_level.py:161-246`).
 *
 * `trainedM`/`trainedU` record every training session's estimate; the
 * live m/u are the MEDIAN across sessions (`linker.py:459-467`) — a second
 * EM session refines rather than overwrites the first.
 */
case class ComparisonLevel(
    label: String,
    sqlCondition: String,
    isNull: Boolean = false,
    m: Option[Double] = None,
    u: Option[Double] = None,
    tfColumn: Option[String] = None,
    tfAdjustmentWeight: Double = 1.0,
    tfMinimumUValue: Double = 0.0,
    fixMProbability: Boolean = false,
    fixUProbability: Boolean = false,
    trainedM: Seq[TrainedValue] = Nil,
    trainedU: Seq[TrainedValue] = Nil) {
  def isElse: Boolean = sqlCondition.trim.equalsIgnoreCase("ELSE")
  def condition: Column =
    if (isElse) lit(true) else expr(sqlCondition)
  def withM(v: Double): ComparisonLevel = copy(m = Some(v))
  def withU(v: Double): ComparisonLevel = copy(u = Some(v))

  /** Record a session's m estimate AND refresh m to the median of all
    * OBSERVED sessions (no-op when m is fixed); the sentinel applies only
    * when no session observed the level (`comparison_level.py:386-399`). */
  def addTrainedM(v: Double, desc: String, observed: Boolean = true): ComparisonLevel =
    if (fixMProbability) this
    else {
      val hist = trainedM :+ TrainedValue(v, desc, observed)
      copy(trainedM = hist, m = Some(Model.medianObserved(hist)))
    }

  /** Record a session's u estimate AND refresh u to the median. */
  def addTrainedU(v: Double, desc: String, observed: Boolean = true): ComparisonLevel =
    if (fixUProbability) this
    else {
      val hist = trainedU :+ TrainedValue(v, desc, observed)
      copy(trainedU = hist, u = Some(Model.medianObserved(hist)))
    }

  /** log2 Bayes factor for this level, clamped like the reference
    * (`comparison_level.py:33-52`: probabilities floored at 1e-32 so the
    * ratio stays finite in double math). */
  def matchWeight: Double = {
    val mm = math.max(m.getOrElse(Model.UnobservedSentinel), Model.ProbFloor)
    val uu = math.max(u.getOrElse(Model.UnobservedSentinel), Model.ProbFloor)
    math.log(mm / uu) / math.log(2.0)
  }
}

object Model {
  /** Floor applied to probabilities before ratio (reference clamps at
    * 1e-32 / 1e-300 depending on path; we use 1e-32). */
  val ProbFloor = 1e-32
  /** Sentinel for levels never observed in training
    * (`comparison_level.py:287-289`). */
  val UnobservedSentinel = 1e-6
  /** statistics.median semantics: mean of the two middle values when even. */
  def median(vals: Seq[Double]): Double = {
    require(vals.nonEmpty)
    val s = vals.sorted
    val n = s.size
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Median over the sessions that observed the level; sentinel otherwise
    * (`comparison_level.py:386-399`). */
  def medianObserved(hist: Seq[TrainedValue]): Double = {
    val obs = hist.filter(_.observed).map(_.probability)
    if (obs.isEmpty) UnobservedSentinel else median(obs)
  }
}

/**
 * An ordered set of levels over one conceptual input (reference
 * `comparison.py:26-114`). The null level(s) come first, the ELSE level
 * last. Gamma values: null -> -1, else -> 0, otherwise descending from
 * (numActiveLevels - 1) in declaration order (`comparison.py:97-114`).
 */
case class Comparison(outputColumnName: String, levels: Seq[ComparisonLevel]) {
  require(levels.nonEmpty, s"comparison $outputColumnName has no levels")

  def nullLevels: Seq[ComparisonLevel] = levels.filter(_.isNull)
  def activeLevels: Seq[ComparisonLevel] = levels.filterNot(_.isNull)

  /** (level, gammaValue) for scoring; else level has gamma 0. */
  def activeLevelsWithGamma: Seq[(ComparisonLevel, Int)] = {
    val n = activeLevels.size
    activeLevels.zipWithIndex.map { case (lv, i) => (lv, n - 1 - i) }
  }

  def gammaColumnName: String = Cols.gamma(outputColumnName)

  /** The CASE expression producing the comparison-vector value. */
  def gammaColumn: Column = {
    val start: Column = nullLevels.foldLeft(null: Column) { (acc, lv) =>
      if (acc == null) when(lv.condition, lit(-1)) else acc.when(lv.condition, lit(-1))
    }
    val withActive = activeLevelsWithGamma.filterNot(_._1.isElse)
      .foldLeft(start) { case (acc, (lv, g)) =>
        if (acc == null) when(lv.condition, lit(g)) else acc.when(lv.condition, lit(g))
      }
    if (withActive == null) lit(0) else withActive.otherwise(lit(0))
  }

  /** Match-weight contribution looked up from a literal array indexed by
    * gamma (+2 for the 1-based index and the -1 null gamma). Model params
    * are driver-side scalars folded into literals — same constant-folding
    * the reference does (`comparison_level.py:664-669`).
    *
    * Deliberately NOT a `when` chain: a CASE references the gamma column
    * once per branch, and when the optimizer inlines the gamma projection
    * the full gamma expression (levenshtein/jaro/...) is duplicated into
    * every branch — Spark's subexpression elimination skips conditionally-
    * executed code, so the string kernels would run tens of times per row.
    * `element_at` references gamma exactly once. */
  def matchWeightColumn: Column = {
    val g = col(gammaColumnName)
    val n = activeLevels.size
    // index i holds the weight for gamma = i - 2 (i=1 -> null level -> 0)
    val weights = 0.0 +: (0 until n).map { gv =>
      activeLevelsWithGamma.collectFirst {
        case (lv, v) if v == gv => lv.matchWeight }.getOrElse(0.0)
    }
    element_at(typedLit(weights), (g + 2).cast("int"))
  }

  /** TF-adjustment match-weight column (0 when not applicable). Reference
    * formula (`comparison_level.py:671-731`): for a TF level with exact-u
    * u_e and observed term frequencies tf_l / tf_r,
    *   adj_mw = weight * (log2(u_e) - log2(greatest(coalesce(tf_l, tf_r),
    *            coalesce(tf_r, tf_l), tf_min))).
    */
  def tfAdjustmentColumn: Column = {
    val g = col(gammaColumnName)
    val tfLevels = activeLevelsWithGamma.filter(_._1.tfColumn.isDefined)
    if (tfLevels.isEmpty) return lit(0.0)
    val log2 = math.log(2.0)
    tfLevels.foldLeft(null: Column) { case (acc, (lv, gv)) =>
      val c = lv.tfColumn.get
      val tfL = col(Cols.l(Cols.tf(c)))
      val tfR = col(Cols.r(Cols.tf(c)))
      val uExact = math.max(lv.u.getOrElse(Model.UnobservedSentinel), Model.ProbFloor)
      val tfVal = greatest(coalesce(tfL, tfR), coalesce(tfR, tfL),
        lit(lv.tfMinimumUValue))
      val adj = (lit(math.log(uExact) / log2) - log(2.0, tfVal)) *
        lit(lv.tfAdjustmentWeight)
      val guarded = when(coalesce(tfL, tfR).isNull, lit(0.0)).otherwise(adj)
      if (acc == null) when(g === gv, guarded)
      else acc.when(g === gv, guarded)
    }.otherwise(lit(0.0))
  }

  def hasTfLevels: Boolean = levels.exists(_.tfColumn.isDefined)
  def tfColumns: Seq[String] = levels.flatMap(_.tfColumn).distinct

  /** log2 of the effective term frequency at this row's TF level — the
    * data-dependent half of the TF adjustment (`tfAdjustmentColumn` =
    * weight * (log2(u_level) - THIS)). NaN when the row is not at a TF
    * level or both tf values are null. TF-aware EM groups patterns on it
    * and recombines with the iteration's current u. */
  def tfTermColumn: Column = {
    val g = col(gammaColumnName)
    val tfLevels = activeLevelsWithGamma.filter(_._1.tfColumn.isDefined)
    if (tfLevels.isEmpty) return lit(Double.NaN)
    tfLevels.foldLeft(null: Column) { case (acc, (lv, gv)) =>
      val c = lv.tfColumn.get
      val tfL = col(Cols.l(Cols.tf(c)))
      val tfR = col(Cols.r(Cols.tf(c)))
      val tfVal = greatest(coalesce(tfL, tfR), coalesce(tfR, tfL),
        lit(lv.tfMinimumUValue))
      val term = when(coalesce(tfL, tfR).isNull, lit(Double.NaN))
        .otherwise(log(2.0, tfVal))
      if (acc == null) when(g === gv, term)
      else acc.when(g === gv, term)
    }.otherwise(lit(Double.NaN))
  }

  /** Per-TF-level adjustment weights keyed by gamma (for TF-aware EM). */
  def tfWeightsByGamma: Map[Int, Double] =
    activeLevelsWithGamma.collect {
      case (lv, g) if lv.tfColumn.isDefined => g -> lv.tfAdjustmentWeight
    }.toMap

  /** Base input columns referenced by any level (suffix stripped). Used for
    * the `_l`/`_r` projection (reference `settings.py:366-378`). */
  def inputColumns: Seq[String] = {
    val names = levels.filterNot(_.isElse).flatMap { lv =>
      GraftSqlBridge.parseExpression(lv.sqlCondition).collect {
        case a: UnresolvedAttribute => a.name
      }
    }
    names.collect {
      case n if n.endsWith("_l") => n.dropRight(2)
      case n if n.endsWith("_r") => n.dropRight(2)
    }.distinct.filterNot(n => n.startsWith("tf_"))
  }
}

/**
 * A blocking rule: a join condition over frames aliased `l` and `r`
 * (reference `blocking.py:108-325`). `BlockOn` is the equi-join fast path
 * (`blocking_rule_library.py:162`); `CustomBlockingRule` is raw Spark SQL
 * referencing `l.` / `r.`; exploding rules unnest array columns before the
 * join (`blocking.py:333-484`).
 */
sealed trait BlockingRule {
  /** Join condition as a raw Catalyst tree over aliases "l" and "r". */
  def conditionExpression: org.apache.spark.sql.catalyst.expressions.Expression
  /** Join condition over DataFrames aliased "l" and "r". */
  final def condition: Column = GraftSqlBridge.column(conditionExpression)
  def arraysToExplode: Seq[String] = Nil
  /** Description used in analysis output. */
  def describe: String
}

object BlockingRule {
  import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, Not, Or}

  /** Qualify unresolved single-part column refs in a SQL fragment with an
    * alias (the reference does the same via sqlglot `_l`/`_r` rewriting,
    * `input_column.py:155-382`). */
  def sideExpression(sqlFragment: String, side: String): Expression =
    GraftSqlBridge.parseExpression(sqlFragment).transform {
      case a: UnresolvedAttribute if a.nameParts.size == 1 =>
        UnresolvedAttribute(side +: a.nameParts)
    }

  def sideExpr(sqlFragment: String, side: String): Column =
    GraftSqlBridge.column(sideExpression(sqlFragment, side))

  /** block_on("surname", "substring(first_name,1,1)"): equality of each
    * expression evaluated on both sides. */
  def blockOn(exprs: String*): BlockOnRule = BlockOnRule(exprs)

  case class BlockOnRule(exprs: Seq[String], salts: Int = 1,
      override val arraysToExplode: Seq[String] = Nil) extends BlockingRule {
    def conditionExpression: Expression =
      exprs.map(e => EqualTo(sideExpression(e, "l"), sideExpression(e, "r")): Expression)
        .reduce(And(_, _))
    def describe: String = s"block_on(${exprs.mkString(", ")})"
    def withExplode(cols: String*): BlockOnRule = copy(arraysToExplode = cols)
  }

  case class CustomBlockingRule(sql: String,
      override val arraysToExplode: Seq[String] = Nil) extends BlockingRule {
    def conditionExpression: Expression = GraftSqlBridge.parseExpression(sql)
    def describe: String = sql
  }

  case class AndRule(parts: Seq[BlockingRule]) extends BlockingRule {
    def conditionExpression: Expression =
      parts.map(_.conditionExpression).reduce(And(_, _))
    override def arraysToExplode: Seq[String] = parts.flatMap(_.arraysToExplode).distinct
    def describe: String = parts.map(_.describe).mkString("(", " AND ", ")")
  }
  case class OrRule(parts: Seq[BlockingRule]) extends BlockingRule {
    def conditionExpression: Expression =
      parts.map(_.conditionExpression).reduce(Or(_, _))
    def describe: String = parts.map(_.describe).mkString("(", " OR ", ")")
  }
  case class NotRule(part: BlockingRule) extends BlockingRule {
    def conditionExpression: Expression = Not(part.conditionExpression)
    def describe: String = s"NOT ${part.describe}"
  }
}

/** Full model settings (reference `settings.py:197-270`). */
case class LinkSettings(
    linkType: LinkType = LinkType.DedupeOnly,
    blockingRules: Seq[BlockingRule] = Nil,
    comparisons: Seq[Comparison] = Nil,
    /** λ — prior probability two random records match
      * (`probability_two_random_records_match`). */
    probabilityTwoRandomRecordsMatch: Double = 1e-4,
    uniqueIdColumn: String = "unique_id",
    sourceDatasetColumn: String = "source_dataset",
    retainMatchingColumns: Boolean = true,
    retainIntermediateCalculations: Boolean = false,
    additionalColumnsToRetain: Seq[String] = Nil,
    emConvergence: Double = 1e-4,
    maxIterations: Int = 25) {

  def comparisonByName(name: String): Comparison =
    comparisons.find(_.outputColumnName == name)
      .getOrElse(throw new NoSuchElementException(s"no comparison $name"))

  def withComparison(c: Comparison): LinkSettings =
    copy(comparisons = comparisons.map(x =>
      if (x.outputColumnName == c.outputColumnName) c else x))

  /** All base input columns the pipeline must carry. */
  def allInputColumns: Seq[String] =
    comparisons.flatMap(_.inputColumns).distinct

  def tfColumns: Seq[String] = comparisons.flatMap(_.tfColumns).distinct

  /** Prior as a log2 Bayes factor (`predict.py:203-213`). */
  def priorMatchWeight: Double = {
    val lam = math.min(math.max(probabilityTwoRandomRecordsMatch, Model.ProbFloor),
      1 - 1e-15)
    math.log(lam / (1 - lam)) / math.log(2.0)
  }
}
