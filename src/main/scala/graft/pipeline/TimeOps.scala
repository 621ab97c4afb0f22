package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Event-time operators for large fact tables: gap-based sessionization and
 * a scalable as-of (most-recent-prior) join. Both are single-shuffle plans
 * keyed on the entity id — the shapes that survive a 100 TB events table,
 * where a naive range join (`l JOIN r ON key AND r.t <= l.t` + windowed
 * max) would explode to |l|×|r| rows per key before pruning.
 */
object TimeOps {

  /**
   * Gap-based sessionization: a new session starts when the gap since the
   * entity's previous event exceeds `gap` (same unit as the ts column). One shuffle (by entity),
   * two window passes over the same sort order — Spark evaluates both in a
   * single sort within whole-stage codegen.
   *
   * @param tieCol deterministic order for same-timestamp events
   * @return input rows + `session_seq` (1-based per entity)
   */
  def sessionize(events: DataFrame, entityCol: String, tsCol: String,
      gap: Long, tieCol: String): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
    val cum = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(w)
    events
      .withColumn("__is_new",
        when(prev.isNull || col(tsCol) - prev > gap, 1).otherwise(0))
      .withColumn("session_seq", sum("__is_new").over(cum))
      .drop("__is_new")
  }

  /** Per-session aggregate over [[sessionize]] output: bounds, event count
    * and an integer-safe value sum (micros, oracle-portable). */
  def sessionStats(events: DataFrame, entityCol: String, tsCol: String,
      gap: Long, tieCol: String, valueCol: String): DataFrame =
    sessionize(events, entityCol, tsCol, gap, tieCol)
      .groupBy(col(entityCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        sum(floor(col(valueCol) * 1000000).cast("bigint"))
          .cast("bigint").as("sum_value_micros"))

  /**
   * As-of join: for every left row, the single most recent right row with
   * `right.time <= left.time` on the same key (DuckDB/kdb ASOF JOIN
   * semantics, `>=` inequality).
   *
   * Implementation is the union-merge shape, not a range join: tag both
   * inputs, sort each key's rows by (time, side) with right rows first at
   * equal times, and carry the latest right payload forward with
   * `last(ignoreNulls)` over the running window. One shuffle on the key,
   * O(n log n) in the partition — never the |l|×|r| blow-up of
   * `JOIN ON key AND r.t <= l.t` + max-window pruning. Right payloads ride
   * in ONE struct so a null field inside a right row is carried faithfully
   * (per-column `last(v, ignoreNulls)` would skip it and resurrect an
   * older value).
   *
   * @param rightCols right payload columns, emitted nullable on no-match
   */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightCols.map(col): _*)
    // SQL-join null semantics: a null key or time never matches. The
    // window would otherwise group null keys into one partition and sort
    // null times first — right rows with null key/time are dropped, left
    // rows with null key/time pass through unmatched.
    val rSide = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        (col(rightKey).as("__k") +: col(rightTime).as("__t") +:
          lit(0).as("__side") +: payload.as("__rv") +:
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val lSide = left.select(
      (col(leftKey).as("__k") +: col(leftTime).as("__t") +:
        lit(1).as("__side") +:
        lit(null).cast(rSide.schema("__rv").dataType).as("__rv") +:
        leftCols.map(col)): _*)
    // deterministic tie-break among right rows sharing (key, time): order
    // by the payload struct itself when its type is orderable, so the
    // carried row is the max payload — otherwise output would depend on
    // shuffle arrival order for non-unique right frames. Non-orderable
    // payloads (maps) keep the documented (key,time)-uniqueness requirement.
    val rvOrderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(rSide.schema("__rv").dataType)
    val ordering =
      if (rvOrderable) Seq(col("__t"), col("__side"), col("__rv"))
      else Seq(col("__t"), col("__side"))
    val w = Window.partitionBy("__k").orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rSide.unionByName(lSide)
      .withColumn("__carried",
        when(col("__k").isNotNull && col("__t").isNotNull,
          last(col("__rv"), ignoreNulls = true).over(w)))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__carried").getField(c).as(c)): _*)
  }
}
