package graft.model

import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/**
 * Model (de)serialisation — the reference persists trained models as
 * `model.json` (`settings.py:568-595`, loaded via `Linker(df, "model.json")`
 * `linker.py:103-108`). Field names follow the reference's settings schema
 * so models are human-comparable; blocking rules round-trip either as
 * `{"block_on": [exprs]}` (equi fast path) or `{"blocking_rule": sql}`.
 */
object SettingsJson {

  def toJson(s: LinkSettings): String = {
    val rules = s.blockingRules.map {
      case BlockingRule.BlockOnRule(exprs, salts, explode) =>
        ("block_on" -> exprs) ~ ("salting_partitions" -> salts) ~
          ("arrays_to_explode" -> explode)
      case r: BlockingRule.CustomBlockingRule =>
        ("blocking_rule" -> r.sql) ~ ("arrays_to_explode" -> r.arraysToExplode)
      case other =>
        ("blocking_rule" -> other.describe) ~
          ("arrays_to_explode" -> other.arraysToExplode)
    }
    def trained(hist: Seq[TrainedValue]): List[JValue] = hist.toList.map { tv =>
      ("probability" -> tv.probability) ~ ("description" -> tv.description) ~
        ("observed" -> tv.observed): JValue
    }
    val comparisons = s.comparisons.map { c =>
      ("output_column_name" -> c.outputColumnName) ~
        ("comparison_levels" -> c.levels.map { lv =>
          ("sql_condition" -> lv.sqlCondition) ~
            ("label_for_charts" -> lv.label) ~
            ("is_null_level" -> lv.isNull) ~
            ("m_probability" -> lv.m) ~
            ("u_probability" -> lv.u) ~
            ("tf_adjustment_column" -> lv.tfColumn) ~
            ("tf_adjustment_weight" -> lv.tfAdjustmentWeight) ~
            ("tf_minimum_u_value" -> lv.tfMinimumUValue) ~
            ("fix_m_probability" -> lv.fixMProbability) ~
            ("fix_u_probability" -> lv.fixUProbability) ~
            ("trained_m_probabilities" -> trained(lv.trainedM)) ~
            ("trained_u_probabilities" -> trained(lv.trainedU))
        })
    }
    val json =
      ("link_type" -> LinkType.asString(s.linkType)) ~
        ("probability_two_random_records_match" -> s.probabilityTwoRandomRecordsMatch) ~
        ("unique_id_column_name" -> s.uniqueIdColumn) ~
        ("source_dataset_column_name" -> s.sourceDatasetColumn) ~
        ("retain_matching_columns" -> s.retainMatchingColumns) ~
        ("retain_intermediate_calculation_columns" -> s.retainIntermediateCalculations) ~
        ("additional_columns_to_retain" -> s.additionalColumnsToRetain) ~
        ("em_convergence" -> s.emConvergence) ~
        ("max_iterations" -> s.maxIterations) ~
        ("blocking_rules_to_generate_predictions" -> rules) ~
        ("comparisons" -> comparisons)
    JsonMethods.pretty(JsonMethods.render(json))
  }

  def fromJson(text: String): LinkSettings = {
    implicit val formats: Formats = DefaultFormats
    val j = JsonMethods.parse(text)
    def str(f: JValue, default: String): String =
      f match { case JString(v) => v; case _ => default }
    def dbl(f: JValue, default: Double): Double = f match {
      case JDouble(v) => v; case JInt(v) => v.toDouble
      case JDecimal(v) => v.toDouble; case _ => default
    }
    def bool(f: JValue, default: Boolean): Boolean =
      f match { case JBool(v) => v; case _ => default }
    def optDbl(f: JValue): Option[Double] = f match {
      case JDouble(v) => Some(v); case JInt(v) => Some(v.toDouble)
      case JDecimal(v) => Some(v.toDouble); case _ => None
    }
    def strSeq(f: JValue): Seq[String] = f match {
      case JArray(vs) => vs.collect { case JString(v) => v }
      case _ => Nil
    }

    // dialect of the stored SQL fragments: a model.json written by the
    // reference carries `sql_dialect` (settings.py:568-595) and its
    // conditions/rules are pre-dialected strings; duckdb fragments are
    // translated to Spark SQL on load (DialectSql) so reference-trained
    // models predict here unchanged
    val dialect = str(j \ "sql_dialect", "spark")
    def tr(sql: String, d: String = dialect): String = DialectSql.toSpark(sql, d)

    val rules = (j \ "blocking_rules_to_generate_predictions") match {
      case JArray(vs) => vs.map { rv =>
        val explode = strSeq(rv \ "arrays_to_explode")
        (rv \ "block_on") match {
          case JArray(_) =>
            BlockingRule.BlockOnRule(strSeq(rv \ "block_on"),
              (rv \ "salting_partitions") match {
                case JInt(v) => v.toInt; case _ => 1
              }, explode)
          case _ => rv match {
            case JString(sql) => BlockingRule.CustomBlockingRule(tr(sql))
            case _ => BlockingRule.CustomBlockingRule(
              tr(str(rv \ "blocking_rule", "1=1"),
                str(rv \ "sql_dialect", dialect)), explode)
          }
        }
      }
      case _ => Nil
    }
    def trained(f: JValue): Seq[TrainedValue] = f match {
      case JArray(ts) => ts.map { tv =>
        TrainedValue(dbl(tv \ "probability", 0.0), str(tv \ "description", ""),
          bool(tv \ "observed", default = true))
      }
      case _ => Nil
    }
    val comparisons = (j \ "comparisons") match {
      case JArray(vs) => vs.map { cv =>
        val levels = (cv \ "comparison_levels") match {
          case JArray(ls) => ls.map { lv =>
            val rawCond = str(lv \ "sql_condition", "ELSE")
            ComparisonLevel(
              label = str(lv \ "label_for_charts", ""),
              sqlCondition =
                if (rawCond.trim.equalsIgnoreCase("ELSE")) rawCond
                else tr(rawCond),
              isNull = bool(lv \ "is_null_level", default = false),
              m = optDbl(lv \ "m_probability"),
              u = optDbl(lv \ "u_probability"),
              tfColumn = (lv \ "tf_adjustment_column") match {
                case JString(v) => Some(v); case _ => None
              },
              tfAdjustmentWeight = dbl(lv \ "tf_adjustment_weight", 1.0),
              tfMinimumUValue = dbl(lv \ "tf_minimum_u_value", 0.0),
              fixMProbability = bool(lv \ "fix_m_probability", default = false),
              fixUProbability = bool(lv \ "fix_u_probability", default = false),
              trainedM = trained(lv \ "trained_m_probabilities"),
              trainedU = trained(lv \ "trained_u_probabilities"))
          }
          case _ => Nil
        }
        Comparison(str(cv \ "output_column_name", "comparison"), levels)
      }
      case _ => Nil
    }
    LinkSettings(
      linkType = LinkType.fromString(str(j \ "link_type", "dedupe_only")),
      blockingRules = rules,
      comparisons = comparisons,
      probabilityTwoRandomRecordsMatch =
        dbl(j \ "probability_two_random_records_match", 1e-4),
      uniqueIdColumn = str(j \ "unique_id_column_name", "unique_id"),
      sourceDatasetColumn = str(j \ "source_dataset_column_name", "source_dataset"),
      retainMatchingColumns = bool(j \ "retain_matching_columns", default = true),
      retainIntermediateCalculations =
        bool(j \ "retain_intermediate_calculation_columns", default = false),
      additionalColumnsToRetain = strSeq(j \ "additional_columns_to_retain"),
      emConvergence = dbl(j \ "em_convergence", 1e-4),
      maxIterations = dbl(j \ "max_iterations", 25).toInt)
  }

  def save(s: LinkSettings, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), toJson(s))

  def load(path: String): LinkSettings =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
