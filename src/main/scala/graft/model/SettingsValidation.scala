package graft.model

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute

/** Raised at `Linker` construction when settings reference columns the
  * input dataframes do not have. */
class InvalidColumnsException(message: String)
  extends IllegalArgumentException(message)

/**
 * Construction-time settings validation (reference
 * `splink/internals/settings_validation/log_invalid_columns.py` and
 * `settings_validation_log_strings.py`): typo'd columns in blocking rules,
 * comparison levels, or simple settings fields fail up front with the
 * reference's error framing ("Missing column(s) from input dataframe(s)",
 * "Invalid table names provided", "Invalid table suffixes provided"),
 * instead of surfacing as a raw AnalysisException from deep inside the
 * first query. The reference logs these as warnings; here they raise,
 * because a Spark job on 100 TB is too expensive to launch against a
 * settings typo.
 */
object SettingsValidation {

  private val MissingPrefix = "Missing column(s) from input dataframe(s): "
  private val BadTablePrefix =
    "Invalid table names provided (only `l.` and `r.` are valid): "
  private val BadSuffixPrefix =
    "Invalid table suffixes provided (only `_l` and `_r` are valid): "

  private def backticked(cols: Iterable[String]): String =
    cols.toSeq.distinct.sorted.map(c => s"`$c`").mkString(", ")

  private def banner(title: String): Seq[String] = Seq(
    "======================================", title,
    "======================================", "")

  def validate(inputs: Seq[(String, DataFrame)],
      settings: LinkSettings): Unit = {
    // schema-only reads (no Spark job); matching is case-insensitive like
    // the default Spark resolver
    val inputCols: Set[String] =
      inputs.flatMap(_._2.columns).map(_.toLowerCase).toSet
    // columns the engine itself synthesises before conditions evaluate
    val synthesised: Set[String] =
      Set(settings.sourceDatasetColumn.toLowerCase, "__join_key", "match_key")
    def exists(c: String): Boolean =
      inputCols(c.toLowerCase) || synthesised(c.toLowerCase)

    val sections = scala.collection.mutable.ArrayBuffer.empty[String]

    // --- simple settings columns (check_for_missing_settings_column) ----
    def settingSection(id: String, cols: Seq[String]): Unit = {
      val miss = cols.filterNot(exists)
      if (miss.nonEmpty)
        sections += (banner(s"Setting: `$id`") :+
          s"       - $MissingPrefix${backticked(miss)}" :+ "").mkString("\n")
    }
    settingSection("unique_id_column_name", Seq(settings.uniqueIdColumn))
    settingSection("additional_columns_to_retain",
      settings.additionalColumnsToRetain)

    // --- blocking rules -------------------------------------------------
    // columns must carry an `l.`/`r.` table alias and exist in the inputs
    val brFindings = settings.blockingRules.flatMap { rule =>
      val attrs = rule.conditionExpression.collect {
        case a: UnresolvedAttribute => a
      }
      val badTable = attrs.collect {
        case a if a.nameParts.size < 2 ||
            !Seq("l", "r").contains(a.nameParts.head.toLowerCase) => a.name
      }
      val miss = attrs.collect {
        case a if a.nameParts.size >= 2 &&
            Seq("l", "r").contains(a.nameParts.head.toLowerCase) &&
            !exists(a.nameParts.last) => a.nameParts.last
      }
      val lines = Seq(
        if (miss.nonEmpty) Some(s"       - $MissingPrefix${backticked(miss)}")
        else None,
        if (badTable.nonEmpty)
          Some(s"       - $BadTablePrefix${backticked(badTable)}")
        else None).flatten
      if (lines.isEmpty) None
      else Some((s"    SQL: `${rule.describe}`" +: lines :+ "").mkString("\n"))
    }
    if (brFindings.nonEmpty)
      sections += (banner("Invalid Columns(s) in Blocking Rule(s)") ++
        brFindings).mkString("\n")

    // --- comparison levels ---------------------------------------------
    // level conditions run on the pairwise frame, so columns must end in
    // `_l`/`_r` (tf_-prefixed references resolve against the tf columns the
    // engine joins on)
    val clFindings = settings.comparisons.flatMap { cmp =>
      val perLevel = cmp.levels.filterNot(_.isElse).flatMap { lv =>
        val attrs = GraftSqlBridge.parseExpression(lv.sqlCondition).collect {
          case a: UnresolvedAttribute => a.name
        }
        val (suffixed, bare) = attrs.partition(n =>
          n.toLowerCase.endsWith("_l") || n.toLowerCase.endsWith("_r"))
        val miss = suffixed.map(_.dropRight(2))
          .map(n => if (n.toLowerCase.startsWith("tf_")) n.drop(3) else n)
          .filterNot(exists)
        val lines = Seq(
          if (miss.nonEmpty) Some(s"       - $MissingPrefix${backticked(miss)}")
          else None,
          if (bare.nonEmpty)
            Some(s"       - $BadSuffixPrefix${backticked(bare)}")
          else None).flatten
        if (lines.isEmpty) None
        else Some((s"    SQL: `${lv.sqlCondition}`" +: lines :+ "")
          .mkString("\n"))
      }
      if (perLevel.isEmpty) None
      else Some((Seq(s"Comparison: ${cmp.outputColumnName}",
        "--------------------------------------") ++ perLevel).mkString("\n"))
    }
    if (clFindings.nonEmpty)
      sections += (banner("Invalid Columns(s) in Comparison(s)") ++
        clFindings).mkString("\n")

    if (sections.nonEmpty)
      throw new InvalidColumnsException(
        ("Errors were identified in your settings. Please review the " +
          "following and amend your settings dictionary:\n\n" +
          sections.mkString("\n")).trim)
  }
}
