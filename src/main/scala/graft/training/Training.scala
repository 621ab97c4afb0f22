package graft.training

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.operators._
import graft.pipeline.TextOps

/**
 * Model-parameter estimation, mirroring the reference's training surface:
 *
 *  - [[estimateU]]: u probabilities from random-pair sampling
 *    (reference `splink/internals/estimate_u.py:330-560`)
 *  - [[EMSession]]: m (and optionally u) via expectation-maximisation over
 *    pairs blocked on a training rule
 *    (`expectation_maximisation.py:225-311`, `em_training_session.py:76-177`)
 *  - [[estimateMFromLabelColumn]]: m from a ground-truth label column
 *    (`m_training.py:26-102`)
 *  - [[estimateLambdaFromDeterministicRules]]: prior λ from
 *    high-precision rules + assumed recall
 *    (`linker_components/training.py:35-161`)
 *
 * Scale design: the cluster only ever computes comparison-vector COUNTS
 * (`groupBy(gammas).count` — the agreement-pattern rewrite from
 * `expectation_maximisation.py:28-42`); the EM loop itself runs on the
 * driver over those few hundred patterns, so iterations cost zero Spark
 * jobs. The reference re-runs a SQL E-step per iteration; on Spark that
 * would be 25 scans — collecting patterns once is strictly better and
 * numerically identical.
 */
object Training {

  /** Rows to sample so that n*(n-1)/2 ~= targetPairs
    * (`estimate_u.py:301-327`). */
  def rowsForPairCount(targetPairs: Long): Long =
    math.ceil(0.5 * (math.sqrt(8.0 * targetPairs + 1) + 1)).toLong

  /**
   * Estimate u probabilities: sample records deterministically, take the
   * cartesian self-join (random pairs are assumed non-matches), and set
   * each level's u to its share of non-null gammas.
   */
  /**
   * @param numChunks   the sampled cartesian is processed in hash chunks of
   *                    the right side (`estimate_u.py:443-517`)
   * @param minObsPerLevel stop consuming chunks once every active level has
   *                    at least this many observations (reference default
   *                    100, `linker_components/training.py:163-200`)
   */
  def estimateU(inputs: Seq[(String, DataFrame)], settings: LinkSettings,
      maxPairs: Long = 1000000L, numChunks: Int = 10,
      minObsPerLevel: Long = 100L, seed: Option[Long] = None): LinkSettings = {
    val concat = VerticalConcat(inputs, settings)
    val total = concat.count()
    val needed = rowsForPairCount(maxPairs)
    // deterministic hash sample; an explicit seed salts the key so callers
    // can draw an independent sample (`training.py:166` seed) — the
    // unseeded path stays byte-identical run to run
    val sampleKey = seed match {
      case Some(s) => concat_ws("",
        col(settings.uniqueIdColumn).cast("string"), lit(s.toString))
      case None => col(settings.uniqueIdColumn).cast("string")
    }
    // repartition-to-role before the persist (`spark/database_api.py:263`,
    // `__splink__df_concat_with_tf_sample` ÷4): the filter keeps input
    // partitioning, so a sparse sample would otherwise cache as many
    // near-empty partitions feeding the cartesian below
    val sampled = Repartition(
      if (needed >= total) concat
      else concat.filter(TextOps.hashSample(sampleKey, needed.toDouble / total)),
      Repartition.ConcatWithTfSample).persist()
    val uSettings = settings.copy(
      blockingRules = Seq(BlockingRule.CustomBlockingRule("1=1")))
    val pairs = Blocking.blockedIdPairs(sampled, uSettings)
    val withTf = TermFrequency.joinAll(sampled, settings.tfColumns)

    // chunked accumulation with early exit: chunk k = hash bucket of the
    // right join key; stop when every active level is observed enough
    val merged = scala.collection.mutable.Map.empty[String, Map[Int, Long]]
    def enough: Boolean = settings.comparisons.forall { c =>
      val byGamma = merged.getOrElse(c.outputColumnName, Map.empty)
      c.activeLevelsWithGamma.forall { case (_, g) =>
        byGamma.getOrElse(g, 0L) >= minObsPerLevel }
    }
    val chunkCol = pmod(hash(col("join_key_r")), lit(numChunks))
    // the records side is a SAMPLE of concat: measuring the raw concat
    // (file-source stats) covers it — fits ⇒ the sample fits. The pair
    // frame is a near-cartesian, so keeping it unshuffled matters most
    // of anywhere in the library.
    val broadcastRecs = ComparisonVectors.recordsBroadcastOk(concat)
    var k = 0
    while (k < numChunks && !(k > 0 && enough)) {
      val cv = ComparisonVectors.compute(
        pairs.filter(chunkCol === k), withTf, uSettings,
        broadcastRecords = broadcastRecs)
      gammaCounts(cv, settings).foreach { case (name, byGamma) =>
        val acc = merged.getOrElse(name, Map.empty)
        merged(name) = (acc.keySet ++ byGamma.keySet).map(g =>
          g -> (acc.getOrElse(g, 0L) + byGamma.getOrElse(g, 0L))).toMap
      }
      k += 1
    }
    sampled.unpersist()
    applyLevelProbabilities(settings, merged.toMap, setM = false,
      sessionDesc = "estimate u by random sampling")
  }

  /** groupBy each comparison's gamma column -> Map(comparison ->
    * Map(gamma -> count)). One aggregation per comparison over one cached
    * cv frame. */
  private def gammaCounts(cv: DataFrame, settings: LinkSettings)
      : Map[String, Map[Int, Long]] = {
    val cached = cv.persist()
    try {
      settings.comparisons.map { c =>
        val rows = cached.groupBy(col(c.gammaColumnName)).count().collect()
        c.outputColumnName -> rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
      }.toMap
    } finally { cached.unpersist() }
  }

  /** Record per-level probabilities (share of non-null gammas) as a
    * training session for m or u; the live value becomes the median across
    * all recorded sessions (`comparison_level.py:355-399`,
    * `linker.py:459-467`). */
  private def applyLevelProbabilities(settings: LinkSettings,
      counts: Map[String, Map[Int, Long]], setM: Boolean,
      sessionDesc: String): LinkSettings = {
    val updated = settings.comparisons.map { c =>
      val byGamma = counts.getOrElse(c.outputColumnName, Map.empty)
      val totalObs = byGamma.collect { case (g, n) if g >= 0 => n }.sum.toDouble
      val newLevels = c.levels.map { lv =>
        if (lv.isNull) lv
        else {
          val gv = c.activeLevelsWithGamma.collectFirst {
            case (l2, g) if l2 == lv => g }.get
          // a level with zero observations records an UNOBSERVED session:
          // the sentinel must not enter the cross-session median
          val obs = totalObs > 0 && byGamma.getOrElse(gv, 0L) > 0
          val share =
            if (obs) byGamma(gv) / totalObs else Model.UnobservedSentinel
          if (setM) lv.addTrainedM(share, sessionDesc, observed = obs)
          else lv.addTrainedU(share, sessionDesc, observed = obs)
        }
      }
      c.copy(levels = newLevels)
    }
    settings.copy(comparisons = updated)
  }

  /**
   * Estimate m probabilities from a ground-truth label column: pairs
   * blocked on label equality are true matches; each level's m is its share
   * of non-null gammas among them.
   */
  def estimateMFromLabelColumn(inputs: Seq[(String, DataFrame)],
      settings: LinkSettings, labelColumn: String): LinkSettings = {
    val concat = VerticalConcat(inputs, settings)
    val mSettings = settings.copy(
      blockingRules = Seq(BlockingRule.blockOn(labelColumn)))
    val pairs = Blocking.blockedIdPairs(concat, mSettings)
    val cv = ComparisonVectors.compute(pairs,
      TermFrequency.joinAll(concat, settings.tfColumns), mSettings,
      broadcastRecords = ComparisonVectors.recordsBroadcastOk(concat))
    applyLevelProbabilities(settings, gammaCounts(cv, settings), setM = true,
      sessionDesc = s"estimate m from label column $labelColumn")
  }

  /**
   * Estimate m from a pairwise labels TABLE (`m_from_labels.py:26-102`):
   * the labelled pairs are taken as true matches (match_probability 1), so
   * each level's m is its share of non-null gammas among them.
   *
   * @param labels frame with `<uid>_l`, `<uid>_r` (and the composite parts
   *               when linking multiple frames) — see [[operators.Labels]]
   */
  def estimateMFromPairwiseLabels(inputs: Seq[(String, DataFrame)],
      settings: LinkSettings, labels: DataFrame): LinkSettings = {
    val concat = VerticalConcat(inputs, settings)
    val pairs = Labels.idPairs(labels, settings)
    val cv = ComparisonVectors.compute(pairs,
      TermFrequency.joinAll(concat, settings.tfColumns), settings,
      broadcastRecords = ComparisonVectors.recordsBroadcastOk(concat))
    applyLevelProbabilities(settings, gammaCounts(cv, settings), setM = true,
      sessionDesc = "estimate m from pairwise labels")
  }

  /**
   * λ from deterministic high-precision rules + assumed recall
   * (`linker_components/training.py:35-161`):
   * λ = (observed_pairs / recall) / possible_pairs.
   */
  def estimateLambdaFromDeterministicRules(inputs: Seq[(String, DataFrame)],
      settings: LinkSettings, rules: Seq[BlockingRule],
      recall: Double): LinkSettings = {
    require(recall > 0 && recall <= 1, "recall must be in (0,1]")
    val concat = VerticalConcat(inputs, settings)
    val detSettings = settings.copy(blockingRules = rules)
    val observed = Blocking.blockedIdPairs(concat, detSettings).count()
    val n = concat.count().toDouble
    val possible = settings.linkType match {
      case LinkType.DedupeOnly | LinkType.LinkAndDedupe => n * (n - 1) / 2.0
      case LinkType.LinkOnly =>
        val sizes = inputs.map(_._2.count().toDouble)
        sizes.combinations(2).map(p => p.head * p.last).sum
    }
    val lam = math.min(1.0, (observed / recall) / possible)
    settings.copy(probabilityTwoRandomRecordsMatch = math.max(lam, Model.ProbFloor))
  }

  /** Default m/u for untrained levels (reference heuristic shape,
    * `comparison_level.py:97-130`: match weights interpolated from +10 for
    * the most-similar level down to -5 for ELSE over a uniform u). */
  def withDefaultMU(settings: LinkSettings): LinkSettings = {
    val updated = settings.comparisons.map { c =>
      val n = c.activeLevels.size
      def targetWeight(g: Int): Double =
        if (n <= 1) 0.0 else -5.0 + 15.0 * g / (n - 1)
      // realise each level's target weight symmetrically: m ~ 2^(w/2),
      // u ~ 2^(-w/2), both normalised to valid distributions — ratios keep
      // the interpolated ordering with strongly positive exact-match weight
      val ms = (0 until n).map(g => math.pow(2.0, targetWeight(g) / 2))
      val us = (0 until n).map(g => math.pow(2.0, -targetWeight(g) / 2))
      val (mSum, uSum) = (ms.sum, us.sum)
      val newLevels = c.levels.map { lv =>
        if (lv.isNull) lv
        else {
          val g = c.activeLevelsWithGamma.collectFirst {
            case (l2, gg) if l2 == lv => gg }.get
          val withM = if (lv.m.isDefined) lv else lv.withM(ms(g) / mSum)
          if (withM.u.isDefined) withM else withM.withU(us(g) / uSum)
        }
      }
      c.copy(levels = newLevels)
    }
    settings.copy(comparisons = updated)
  }

  // ------------------------------------------------------------------ EM

  /** One gamma pattern and its pair count. `tfTerms(j)` is the j-th active
    * TF comparison's `log2(effective term frequency)` for this pattern
    * (NaN when the pattern is not at that comparison's TF level or the
    * value is null); TF-aware EM groups by (gammas, tf terms) so the
    * agreement-pattern shrink survives — cardinality is bounded by the TF
    * column's vocabulary, never the pair count (the reference's
    * `estimate_without_term_frequencies=False` default re-predicts every
    * PAIR per iteration instead, `expectation_maximisation.py:49-63`).
    * The E-step recombines each term with the CURRENT u of its level, so
    * free-u runs stay faithful to the reference's per-iteration re-predict. */
  case class Pattern(gammas: Array[Int], count: Long,
      tfTerms: Array[Double] = Array.empty)

  /** Driver-side constants of one active TF comparison inside EM: its
    * index in the active array and adjustment weight per TF-level gamma.
    * The j-th spec pairs with `Pattern.tfTerms(j)`. */
  case class TfSpec(activeIdx: Int, weightByGamma: Map[Int, Double])

  /** Converged driver-side EM state. */
  case class EMCore(m: Array[Map[Int, Double]], u: Array[Map[Int, Double]],
      lambda: Double, iterations: Int, converged: Boolean, history: Seq[Double],
      // per-iteration trajectories, index 0 = initial values — the same
      // records the reference keeps (`em_training_session.py`
      // `_lambda_history_records` / `_iteration_history_records`) and
      // asserts against splink2's published traces
      lambdaHistory: Seq[Double] = Nil,
      mHistory: Seq[Array[Map[Int, Double]]] = Nil,
      uHistory: Seq[Array[Map[Int, Double]]] = Nil)

  /**
   * The EM fixed-point iteration over agreement patterns (pure driver math;
   * semantics of `expectation_maximisation.py:225-311`):
   * E-step p(pattern) = λ·Πm / (λ·Πm + (1-λ)·Πu) with null gammas (-1)
   * contributing factor 1; M-step re-estimates each level's share weighted
   * by p (m) / 1-p (u), and λ as the weighted match fraction. Convergence =
   * max |param change| < tolerance (`settings.py:116-122`).
   */
  def emCore(patterns: Seq[Pattern], mInit: Array[Map[Int, Double]],
      uInit: Array[Map[Int, Double]], lambdaInit: Double, fixU: Boolean,
      maxIterations: Int, tolerance: Double,
      tfSpecs: Seq[TfSpec] = Nil, fixM: Boolean = false,
      fixLambda: Boolean = false): EMCore = {
    val nComp = mInit.length
    var m = mInit
    var u = uInit
    var lambda = lambdaInit
    val history = scala.collection.mutable.ArrayBuffer.empty[Double]
    val lambdaHistory = scala.collection.mutable.ArrayBuffer(lambdaInit)
    val mHistory = scala.collection.mutable.ArrayBuffer(mInit)
    val uHistory = scala.collection.mutable.ArrayBuffer(uInit)
    var iter = 0
    var converged = false
    while (iter < maxIterations && !converged) {
      iter += 1
      val scored = patterns.map { p =>
        var pm = lambda
        var pu = 1 - lambda
        var i = 0
        while (i < p.gammas.length) {
          val g = p.gammas(i)
          if (g >= 0) {
            pm *= math.max(m(i).getOrElse(g, Model.UnobservedSentinel), Model.ProbFloor)
            pu *= math.max(u(i).getOrElse(g, Model.UnobservedSentinel), Model.ProbFloor)
          }
          i += 1
        }
        // TF adjustment multiplies the match odds, recomputed from the
        // CURRENT u of the level (reference re-predicts per iteration):
        // adj = w * (log2(u_level) - log2(tf_effective))
        var j = 0
        while (j < tfSpecs.size) {
          val spec = tfSpecs(j)
          val g = p.gammas(spec.activeIdx)
          if (j < p.tfTerms.length && !p.tfTerms(j).isNaN &&
              spec.weightByGamma.contains(g)) {
            val uCur = math.max(
              u(spec.activeIdx).getOrElse(g, Model.UnobservedSentinel),
              Model.ProbFloor)
            val adj = spec.weightByGamma(g) *
              (math.log(uCur) / math.log(2.0) - p.tfTerms(j))
            pm *= math.pow(2.0, adj)
          }
          j += 1
        }
        (p, pm / (pm + pu))
      }
      def reestimate(weight: (Double, Long) => Double, init: Array[Map[Int, Double]]) =
        Array.tabulate(nComp) { i =>
          val byGamma = scala.collection.mutable.Map.empty[Int, Double]
          var denom = 0.0
          scored.foreach { case (p, prob) =>
            val g = p.gammas(i)
            if (g >= 0) {
              val w = weight(prob, p.count)
              byGamma(g) = byGamma.getOrElse(g, 0.0) + w
              denom += w
            }
          }
          init(i).keys.map(g => g -> (if (denom == 0) Model.UnobservedSentinel
            else math.max(byGamma.getOrElse(g, 0.0) / denom, 0.0))).toMap
        }
      val newM = if (fixM) m else reestimate((p, n) => p * n, m)
      val newU = if (fixU) u else reestimate((p, n) => (1 - p) * n, u)
      val totalN = patterns.map(_.count).sum.toDouble
      val newLambda =
        if (fixLambda) lambda
        else scored.map { case (p, prob) => prob * p.count }.sum / totalN
      val deltas =
        (for (i <- 0 until nComp; g <- m(i).keys)
          yield math.abs(newM(i)(g) - m(i)(g))) ++
        (for (i <- 0 until nComp; g <- u(i).keys)
          yield math.abs(newU(i)(g) - u(i)(g))) :+
        math.abs(newLambda - lambda)
      val maxDelta = deltas.max
      history += maxDelta
      m = newM; u = newU; lambda = newLambda
      lambdaHistory += lambda
      mHistory += m
      uHistory += u
      if (maxDelta < tolerance) converged = true
    }
    EMCore(m, u, lambda, iter, converged, history.toSeq,
      lambdaHistory.toSeq, mHistory.toSeq, uHistory.toSeq)
  }

  /**
   * The same EM fixed-point as [[emCore]], but with the E-step and M-step
   * executed ON THE CLUSTER over a persisted agreement-pattern frame, so
   * training survives a TF vocabulary too large to collect (the pattern
   * count is bounded by the TF column's cardinality, which at 100 TB can
   * be hundreds of millions). Per iteration: ONE Spark job evaluates the
   * E-step probability as a codegen'd column expression (chained `when`
   * lookups over the current driver-side m/u tables — no UDF) and reduces
   * every per-level numerator/denominator plus λ in a single global
   * aggregate; only that one row is collected. Arithmetic mirrors
   * [[emCore]] term for term (same floors, sentinel defaults, TF
   * recombination with the iteration's current u), so both paths converge
   * to identical parameters up to float summation order.
   *
   * @param patternDf persisted frame with the gamma columns, the
   *                  `__tft{j}` TF-term columns and a `n` pair count
   */
  def emCoreDistributed(patternDf: DataFrame, gammaColNames: Seq[String],
      tfColNames: Seq[String], mInit: Array[Map[Int, Double]],
      uInit: Array[Map[Int, Double]], lambdaInit: Double, fixU: Boolean,
      maxIterations: Int, tolerance: Double, tfSpecs: Seq[TfSpec] = Nil,
      fixM: Boolean = false, fixLambda: Boolean = false): EMCore = {
    import org.apache.spark.sql.Column
    val nComp = mInit.length
    var m = mInit
    var u = uInit
    var lambda = lambdaInit
    val history = scala.collection.mutable.ArrayBuffer.empty[Double]
    val lambdaHistory = scala.collection.mutable.ArrayBuffer(lambdaInit)
    val mHistory = scala.collection.mutable.ArrayBuffer(mInit)
    val uHistory = scala.collection.mutable.ArrayBuffer(uInit)
    var iter = 0
    var converged = false
    while (iter < maxIterations && !converged) {
      iter += 1
      // E-step column: p = pm / (pm + pu), factors in the same order as
      // emCore (gamma lookups first, then TF adjustments)
      def lookup(g: Column, tbl: Map[Int, Double]): Column = {
        val default = lit(math.max(Model.UnobservedSentinel, Model.ProbFloor))
        tbl.toSeq.sortBy(_._1).foldLeft(default: Column) {
          case (acc, (k, v)) =>
            when(g === lit(k), lit(math.max(v, Model.ProbFloor))).otherwise(acc)
        }
      }
      var pm: Column = lit(lambda)
      var pu: Column = lit(1 - lambda)
      for (i <- 0 until nComp) {
        val g = col(gammaColNames(i))
        pm = pm * when(g >= 0, lookup(g, m(i))).otherwise(lit(1.0))
        pu = pu * when(g >= 0, lookup(g, u(i))).otherwise(lit(1.0))
      }
      for (j <- tfSpecs.indices) {
        val spec = tfSpecs(j)
        val g = col(gammaColNames(spec.activeIdx))
        val tft = col(tfColNames(j))
        val adj = spec.weightByGamma.toSeq.sortBy(_._1)
          .foldLeft(lit(1.0): Column) { case (acc, (gv, w)) =>
            val uCur = math.max(
              u(spec.activeIdx).getOrElse(gv, Model.UnobservedSentinel),
              Model.ProbFloor)
            val log2u = math.log(uCur) / math.log(2.0)
            when(g === lit(gv) && !isnan(tft),
              pow(lit(2.0), lit(w) * (lit(log2u) - tft))).otherwise(acc)
          }
        pm = pm * adj
      }
      val p = pm / (pm + pu)
      val nCol = col("n").cast("double")
      // one global aggregate: λ numerator, total n, and for every
      // comparison the per-gamma numerators plus the g>=0 denominators
      val aggs = scala.collection.mutable.ArrayBuffer[Column](
        sum(col("__p") * nCol).as("__pn"), sum(nCol).as("__tot"))
      for (i <- 0 until nComp) {
        val g = col(gammaColNames(i))
        aggs += sum(when(g >= 0, col("__p") * nCol).otherwise(lit(0.0)))
          .as(s"__md_$i")
        aggs += sum(when(g >= 0, (lit(1.0) - col("__p")) * nCol)
          .otherwise(lit(0.0))).as(s"__ud_$i")
        for (gv <- m(i).keys.toSeq.sorted) {
          aggs += sum(when(g === lit(gv), col("__p") * nCol)
            .otherwise(lit(0.0))).as(s"__mn_${i}_$gv")
          aggs += sum(when(g === lit(gv), (lit(1.0) - col("__p")) * nCol)
            .otherwise(lit(0.0))).as(s"__un_${i}_$gv")
        }
      }
      val row = patternDf.withColumn("__p", p)
        .agg(aggs.head, aggs.tail.toSeq: _*).collect()(0)
      def d(name: String): Double =
        if (row.isNullAt(row.fieldIndex(name))) 0.0
        else row.getDouble(row.fieldIndex(name))
      val newM = if (fixM) m else Array.tabulate(nComp) { i =>
        val denom = d(s"__md_$i")
        m(i).keys.map(g => g -> (if (denom == 0) Model.UnobservedSentinel
          else math.max(d(s"__mn_${i}_$g") / denom, 0.0))).toMap
      }
      val newU = if (fixU) u else Array.tabulate(nComp) { i =>
        val denom = d(s"__ud_$i")
        u(i).keys.map(g => g -> (if (denom == 0) Model.UnobservedSentinel
          else math.max(d(s"__un_${i}_$g") / denom, 0.0))).toMap
      }
      val newLambda = if (fixLambda) lambda else d("__pn") / d("__tot")
      val deltas =
        (for (i <- 0 until nComp; g <- m(i).keys)
          yield math.abs(newM(i)(g) - m(i)(g))) ++
        (for (i <- 0 until nComp; g <- u(i).keys)
          yield math.abs(newU(i)(g) - u(i)(g))) :+
        math.abs(newLambda - lambda)
      val maxDelta = deltas.max
      history += maxDelta
      m = newM; u = newU; lambda = newLambda
      lambdaHistory += lambda
      mHistory += m
      uHistory += u
      if (maxDelta < tolerance) converged = true
    }
    EMCore(m, u, lambda, iter, converged, history.toSeq,
      lambdaHistory.toSeq, mHistory.toSeq, uHistory.toSeq)
  }

  /** Result of one EM training session.
    * @param trainedLambda λ of the BLOCKED pair population the session saw
    * @param trainedLambdaGlobal λ mapped back to the full population by
    *        reversing the deactivated comparisons' exact-match Bayes
    *        factors (`linker.py:383-457`) */
  case class EMResult(settings: LinkSettings, iterations: Int,
      converged: Boolean, history: Seq[Double],
      trainedLambda: Double, trainedLambdaGlobal: Double,
      deactivated: Seq[String],
      // session trajectories (index 0 = initial): λ per iteration, m per
      // (active comparison, gamma) per iteration, active comparison names
      lambdaHistory: Seq[Double] = Nil,
      mHistory: Seq[Array[Map[Int, Double]]] = Nil,
      uHistory: Seq[Array[Map[Int, Double]]] = Nil,
      activeComparisons: Seq[String] = Nil)

  private def prob2odds(p: Double): Double = {
    val c = math.min(math.max(p, 1e-12), 1 - 1e-12)
    c / (1 - c)
  }
  private def odds2prob(o: Double): Double = o / (1 + o)

  /** Bayes factor of a comparison's most-similar (exact) level — blocked
    * pairs agree on the blocked columns, so the session prior is the
    * global prior times these factors (`em_training_session.py:136-163`). */
  private def exactBayesFactor(c: Comparison): Double = {
    val top = c.activeLevelsWithGamma.maxBy(_._2)._1
    math.pow(2.0, top.matchWeight)
  }

  /**
   * EM over pairs blocked on `trainingRule`. Comparisons whose input
   * columns appear in the rule are deactivated for the session (their
   * gammas are fixed by construction, `em_training_session.py:136-163`);
   * their m/u stay untouched. Trained m (and u unless `fixU`) of active
   * comparisons are merged back into the returned settings.
   */
  def expectationMaximisation(inputs: Seq[(String, DataFrame)],
      settings: LinkSettings, trainingRule: BlockingRule,
      fixU: Boolean = true, maxIterations: Int = 25,
      tolerance: Double = 1e-4, maxPairs: Option[Long] = None,
      withTermFrequencies: Boolean = false, fixM: Boolean = false,
      fixLambda: Boolean = false): EMResult = {
    val concatFull = VerticalConcat(inputs, settings)
    // pair-cap sampling (`em_sampling.py:64-236`): probe a record fraction
    // q, estimate total pairs p_hat = count/q^2; when above the cap keep
    // a sqrt(max_pairs/p_hat) fraction of records on both sides.
    val concat = maxPairs match {
      case None => concatFull
      case Some(cap) =>
        val q = 0.1
        val uidStr = col(settings.uniqueIdColumn).cast("string")
        val probe = concatFull.filter(TextOps.hashSample(uidStr, q))
        val probePairs = Blocking.blockedIdPairs(probe,
          settings.copy(blockingRules = Seq(trainingRule))).count()
        val estimated = probePairs / (q * q)
        if (estimated <= cap) concatFull
        else concatFull.filter(TextOps.hashSample(uidStr,
          math.sqrt(cap / estimated)))
    }
    val ruleCols = Blocking.ruleColumns(trainingRule).toSet
    val (deactivated, active) = settings.comparisons.partition(
      c => c.inputColumns.exists(ruleCols.contains))

    val emSettings = settings.copy(blockingRules = Seq(trainingRule),
      comparisons = settings.comparisons)
    val pairs = Blocking.blockedIdPairs(concat, emSettings)
    // the EM's per-iteration input: at the flagship scale the pair frame
    // dwarfs the records, so the record joins broadcast by the same size
    // decision as predict's (measured on the possibly-sampled concat plan,
    // whose file-source stats are real; the sample filter only shrinks it)
    val cv = ComparisonVectors.compute(pairs,
      TermFrequency.joinAll(concat, settings.tfColumns), emSettings,
      broadcastRecords = ComparisonVectors.recordsBroadcastOk(concat))

    // agreement-pattern shrink: |pairs| rows -> |patterns| rows. With term
    // frequencies (reference default) the key extends by each TF
    // comparison's log2(tf) term, so patterns stay a groupBy shrink
    // (cardinality bounded by TF vocabulary) and the E-step can recombine
    // the term with the iteration's current u — never a per-pair pull.
    val gammaCols = active.map(_.gammaColumnName)
    val tfComparisons =
      if (withTermFrequencies)
        active.zipWithIndex.filter(_._1.hasTfLevels)
      else Nil
    val tfSpecs = tfComparisons.map { case (c, i) =>
      TfSpec(i, c.tfWeightsByGamma) }
    val keyCols = gammaCols.map(col) ++
      tfComparisons.zipWithIndex.map { case ((c, _), j) =>
        c.tfTermColumn.as(s"__tft$j") }
    val tfColNames = tfComparisons.indices.map(j => s"__tft$j")
    val patternDf = cv.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n")).persist()
    // the pattern count is bounded by gamma-combination x TF-vocabulary
    // cardinality; at 100 TB a high-cardinality TF column can push it past
    // what the driver can hold, so above the cap the EM loop runs
    // distributed and only per-level aggregates ever reach the driver
    val spark = cv.sparkSession
    val maxPatterns =
      spark.conf.get("spark.graft.em.maxPatterns", "2000000").toLong
    val nPatterns = patternDf.count()
    val collectPatterns = nPatterns <= maxPatterns
    val patterns: Array[Pattern] =
      if (collectPatterns)
        patternDf.collect().map { r =>
          Pattern(gammaCols.indices.map(i => r.getInt(i)).toArray,
            r.getLong(keyCols.size),
            tfComparisons.indices.map(j =>
              r.getDouble(gammaCols.size + j)).toArray)
        }
      else Array.empty

    // driver-side parameter tables
    val mInit = active.map { c =>
      c.activeLevelsWithGamma.map { case (lv, g) =>
        g -> lv.m.getOrElse(1.0 / c.activeLevels.size) }.toMap
    }.toArray
    val uInit = active.map { c =>
      c.activeLevelsWithGamma.map { case (lv, g) =>
        g -> lv.u.getOrElse(1.0 / c.activeLevels.size) }.toMap
    }.toArray
    // session prior = global prior odds x exact-level Bayes factor of each
    // deactivated comparison (the blocked population is enriched in matches)
    val blockingBf = deactivated.map(exactBayesFactor).product
    val lambdaInit = math.min(math.max(
      odds2prob(prob2odds(settings.probabilityTwoRandomRecordsMatch) * blockingBf),
      1e-8), 1 - 1e-8)
    val core =
      try {
        if (collectPatterns)
          emCore(patterns.toSeq, mInit, uInit, lambdaInit, fixU,
            maxIterations, tolerance, tfSpecs, fixM, fixLambda)
        else
          emCoreDistributed(patternDf, gammaCols, tfColNames, mInit, uInit,
            lambdaInit, fixU, maxIterations, tolerance, tfSpecs, fixM, fixLambda)
      } catch {
        case e: Throwable => patternDf.unpersist(); throw e
      }
    val (m, u, lambda) = (core.m, core.u, core.lambda)
    val (iter, converged, history) = (core.iterations, core.converged, core.history)

    // merge trained params back into the full settings: each session is
    // RECORDED and the live value becomes the median across sessions
    // (`linker.py:459-467`) — a second EM session refines, never overwrites
    val sessionDesc = s"EM, blocked on ${trainingRule.describe}"
    // gammas this session actually saw: levels absent from every agreement
    // pattern record an observed=false session (excluded from the median),
    // mirroring LEVEL_NOT_OBSERVED_TEXT (`em_training_session.py:336-353`)
    val seenGammas: Array[Set[Int]] =
      if (collectPatterns)
        Array.tabulate(active.size) { i =>
          patterns.iterator.filter(p => p.count > 0 && p.gammas(i) >= 0)
            .map(_.gammas(i)).toSet
        }
      else {
        // one tiny aggregate: the distinct non-null gammas each active
        // comparison actually saw (collect_set skips nulls from the when)
        val row = patternDf.where(col("n") > 0)
          .agg(collect_set(when(col(gammaCols.head) >= 0,
              col(gammaCols.head))).as("s0"),
            gammaCols.toIndexedSeq.zipWithIndex.drop(1).map { case (g, i) =>
              collect_set(when(col(g) >= 0, col(g))).as(s"s$i") }: _*)
          .collect()(0)
        Array.tabulate(active.size)(i => row.getSeq[Int](i).toSet)
      }
    patternDf.unpersist()
    val trainedComparisons = settings.comparisons.map { c =>
      active.indexWhere(_.outputColumnName == c.outputColumnName) match {
        case -1 => c
        case i =>
          val newLevels = c.levels.map { lv =>
            if (lv.isNull) lv
            else {
              val g = c.activeLevelsWithGamma.collectFirst {
                case (l2, gg) if l2 == lv => gg }.get
              val obs = seenGammas(i).contains(g)
              val mv = if (obs) m(i)(g) else Model.UnobservedSentinel
              val uv = if (obs) u(i)(g) else Model.UnobservedSentinel
              // a FIXED parameter family records no trained session —
              // fixed values feeding the cross-session median would skew
              // it toward the initial guess (`fix_m_probabilities` /
              // `fix_u_probabilities`, training.py:235-237)
              val withM =
                if (fixM) lv else lv.addTrainedM(mv, sessionDesc, observed = obs)
              if (fixU) withM else withM.addTrainedU(uv, sessionDesc, observed = obs)
            }
          }
          c.copy(levels = newLevels)
      }
    }
    val lambdaGlobal = odds2prob(prob2odds(lambda) / blockingBf)
    EMResult(settings.copy(comparisons = trainedComparisons), iter, converged,
      history.toSeq, lambda, lambdaGlobal, deactivated.map(_.outputColumnName),
      core.lambdaHistory, core.mHistory, core.uHistory,
      active.map(_.outputColumnName))
  }
}
