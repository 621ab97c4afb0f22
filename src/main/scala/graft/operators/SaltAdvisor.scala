package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.BlockingRule.BlockOnRule

/**
 * Hot-key advisory for equi-blocking rules, wiring the blocking analysis
 * (`Evaluation.nLargestBlocks`, reference `blocking_analysis.py:725-780`)
 * into a concrete fix. The reference documents the failure mode —
 * "jobs cannot be split into a larger number of tasks than the cardinality
 * of the blocking rule" (`optimising_spark.md:78`) — and offers salting as
 * the remedy, but leaves finding the hot key and sizing the salt count to
 * the user. Here one aggregate over the input sizes both: the largest
 * block's row count against an even per-task share decides how many salted
 * sub-joins cap the skew.
 *
 * AQE's skew-join handles many cases at runtime; the explicit salt remains
 * the right tool when one key dominates so heavily that even a split
 * shuffle partition holds a quadratic pair blow-up, and it composes with
 * the blocking machinery (`Pipeline.scala:164-205`) at plan time.
 */
object SaltAdvisor {

  /** Advisory for one rule. `recommendedSalts == 1` means the rule's key
    * distribution needs no salting at the probed target. */
  case class Advice(rule: BlockOnRule, largestBlockRows: Long,
      totalRows: Long, recommendedSalts: Int) {
    /** The rule with the recommendation applied. */
    def applied: BlockOnRule = rule.copy(salts = recommendedSalts)
  }

  /**
   * Probe the rule's block-size distribution (ONE aggregate job over the
   * key projection) and size a salt count that caps any single sub-join's
   * left-row share of the hottest block at `targetRowsPerTask`.
   *
   * @param targetRowsPerTask cap for one task's left rows on the hottest
   *        key; 0 = an even share of the input (total / shuffle partitions)
   * @param maxSalts upper bound on the recommendation (each salt is one
   *        more unioned sub-join in the plan)
   */
  def advise(df: DataFrame, rule: BlockOnRule, targetRowsPerTask: Long = 0,
      maxSalts: Int = 64): Advice = {
    val keys = rule.exprs.zipWithIndex.map { case (e, i) =>
      expr(e).as(s"__k$i") }
    // null keys never match under equi-blocking (l.k = r.k is null-false),
    // so a mostly-null column must not read as a hot block — count only
    // rows where every key expression is non-null
    val nonNull = rule.exprs.indices
      .map(i => col(s"__k$i").isNotNull).reduce(_ && _)
    val stats = df.select(keys: _*)
      .filter(nonNull)
      .groupBy(rule.exprs.indices.map(i => col(s"__k$i")): _*)
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("largest"), sum(col("c")).as("total"))
      .head()
    val largest = Option(stats.get(0)).fold(0L)(_.asInstanceOf[Long])
    val total = Option(stats.get(1)).fold(0L)(_.asInstanceOf[Long])
    val target = if (targetRowsPerTask > 0) targetRowsPerTask
      else math.max(1L,
        total / df.sparkSession.sessionState.conf.numShufflePartitions)
    val salts = math.min(maxSalts.toLong,
      math.max(1L, math.ceil(largest.toDouble / target).toLong)).toInt
    Advice(rule, largest, total, salts)
  }

  /** Advise every equi rule in a rule set; non-equi rules pass through
    * unchanged (salting is an equi-join rewrite). */
  def adviseAll(df: DataFrame, rules: Seq[graft.model.BlockingRule],
      targetRowsPerTask: Long = 0, maxSalts: Int = 64): Seq[Advice] =
    rules.collect { case r: BlockOnRule =>
      advise(df, r, targetRowsPerTask, maxSalts) }
}
