package graft.model

/**
 * Typed, chainable column-expression builder — the reference's
 * `ColumnExpression` (`splink/internals/column_expression.py:23-367`):
 * a base column plus lazy transforms (lower, substring, cast, regex
 * extract, nullif, try-parse date/timestamp, first/last array element),
 * rendered as Spark SQL for either the bare column or its `_l`/`_r`
 * pairwise variants.
 *
 * Example:
 * {{{
 *   val pc = ColExpr("postcode").lower.regexExtract("^[a-z]+")
 *   BlockingRule.blockOn(pc.sql)
 *   LevelLibrary.custom("area match", s"${pc.sqlL} = ${pc.sqlR}")
 * }}}
 */
case class ColExpr(base: String, transforms: Seq[ColExpr.Transform] = Nil) {
  import ColExpr._

  private def add(t: Transform): ColExpr = copy(transforms = transforms :+ t)

  def lower: ColExpr = add(Lower)
  def substr(start: Int, len: Int): ColExpr = add(Substr(start, len))
  def castToString: ColExpr = add(CastToString)
  /** Empty extract -> NULL, mirroring the reference's NULLIF wrap
    * (`dialects.py:208-214, 238-249`). */
  def regexExtract(pattern: String, group: Int = 0): ColExpr =
    add(RegexExtract(pattern, group))
  def nullif(value: String): ColExpr = add(NullIf(value))
  def tryParseDate(format: String = "yyyy-MM-dd"): ColExpr = add(TryParseDate(format))
  def tryParseTimestamp(format: String = "yyyy-MM-dd HH:mm:ss"): ColExpr =
    add(TryParseTimestamp(format))
  def firstArrayElement: ColExpr = add(ArrayElement(1))
  def lastArrayElement: ColExpr = add(ArrayElement(-1))

  /** Escape for a Spark SQL single-quoted literal: backslashes double
    * (Spark treats backslash as an escape inside string literals), then
    * quotes. */
  private def q(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  private def render(baseSql: String): String =
    transforms.foldLeft(baseSql) { (acc, t) =>
      t match {
        case Lower => s"lower($acc)"
        case Substr(s, l) => s"substring($acc, $s, $l)"
        case CastToString => s"CAST($acc AS STRING)"
        case RegexExtract(p, g) =>
          s"nullif(regexp_extract($acc, '${q(p)}', $g), '')"
        case NullIf(v) => s"nullif($acc, '${q(v)}')"
        case TryParseDate(f) => s"to_date(try_to_timestamp($acc, '$f'))"
        case TryParseTimestamp(f) => s"try_to_timestamp($acc, '$f')"
        case ArrayElement(i) => s"element_at($acc, $i)"
      }
    }

  /** SQL over the bare input column (blocking rules, TF tables). */
  def sql: String = render(base)
  /** SQL over the pairwise `_l` / `_r` columns (comparison levels). */
  def sqlL: String = render(Cols.l(base))
  def sqlR: String = render(Cols.r(base))

  def column: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(sql)
}

object ColExpr {
  sealed trait Transform
  case object Lower extends Transform
  case class Substr(start: Int, len: Int) extends Transform
  case object CastToString extends Transform
  case class RegexExtract(pattern: String, group: Int) extends Transform
  case class NullIf(value: String) extends Transform
  case class TryParseDate(format: String) extends Transform
  case class TryParseTimestamp(format: String) extends Transform
  case class ArrayElement(index: Int) extends Transform
}
