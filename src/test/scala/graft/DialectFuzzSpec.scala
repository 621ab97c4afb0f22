package graft

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.model._

/** Property-fuzz of the reference-model ingestion path: random
  * level/comparison trees rendered the way the reference's DuckDB backend
  * stores them (`dialects.py:208-518` spellings: double-quoted
  * identifiers, TEXT/VARCHAR casts, jaro_winkler_similarity /
  * jaro_similarity / jaccard, try_strptime + epoch, list_* array
  * functions, 1-based bracket indexing) must load, round-trip through
  * toJson/fromJson, and predict IDENTICALLY to a natively-built Spark
  * twin of the same semantics. The shipped model files are swept in
  * SplinkParitySpec; this spec covers the combinatorial space between
  * them. */
class DialectFuzzSpec extends SparkSpec {
  import spark.implicits._

  /** One level template: the duckdb-dialect rendering and its native
    * Spark twin. */
  private case class LevelTpl(duck: String, native: String)

  // --- template pools per column family ---------------------------------
  private def nameLevels(t: Double, k: Int): Seq[LevelTpl] = Seq(
    LevelTpl("\"name_l\" = \"name_r\"", "name_l = name_r"),
    LevelTpl(s"""jaro_winkler_similarity("name_l", "name_r") >= $t""",
      s"jaro_winkler(name_l, name_r) >= $t"),
    LevelTpl(s"""jaro_similarity("name_l", "name_r") >= $t""",
      s"jaro_sim(name_l, name_r) >= $t"),
    LevelTpl(s"""jaccard("name_l", "name_r") >= $t""",
      s"jaccard_chars(name_l, name_r) >= $t"),
    LevelTpl(s"""levenshtein("name_l", "name_r") <= $k""",
      s"levenshtein(name_l, name_r) <= $k"),
    LevelTpl(s"""damerau_levenshtein("name_l", "name_r") <= $k""",
      s"damerau_levenshtein(name_l, name_r) <= $k"))

  private def amountLevels: Seq[LevelTpl] = Seq(
    LevelTpl("CAST(\"amount_l\" AS TEXT) = CAST(\"amount_r\" AS TEXT)",
      "CAST(amount_l AS STRING) = CAST(amount_r AS STRING)"),
    LevelTpl("\"amount_l\"::TEXT = \"amount_r\"::TEXT",
      "amount_l::STRING = amount_r::STRING"),
    LevelTpl("\"amount_l\"::VARCHAR = \"amount_r\"::VARCHAR",
      "amount_l::STRING = amount_r::STRING"))

  private def dobLevels(days: Int): Seq[LevelTpl] = Seq(
    LevelTpl(
      "try_strptime(\"dob_l\", '%Y-%m-%d') = try_strptime(\"dob_r\", '%Y-%m-%d')",
      "try_to_timestamp(dob_l, 'yyyy-MM-dd') = try_to_timestamp(dob_r, 'yyyy-MM-dd')"),
    LevelTpl(
      "abs(epoch(try_strptime(\"dob_l\", '%Y-%m-%d')) - " +
        s"epoch(try_strptime(\"dob_r\", '%Y-%m-%d'))) <= ${days * 86400}",
      "abs(unix_timestamp(try_to_timestamp(dob_l, 'yyyy-MM-dd')) - " +
        s"unix_timestamp(try_to_timestamp(dob_r, 'yyyy-MM-dd'))) <= ${days * 86400}"))

  private def tagsLevels(n: Int): Seq[LevelTpl] = Seq(
    LevelTpl(s"""array_length(list_intersect("tags_l", "tags_r")) >= $n""",
      s"size(array_intersect(tags_l, tags_r)) >= $n"),
    LevelTpl("\"tags_l\"[1] = \"tags_r\"[1]",
      "element_at(tags_l, 1) = element_at(tags_r, 1)"),
    LevelTpl("list_max(\"tags_l\") = list_max(\"tags_r\")",
      "array_max(tags_l) = array_max(tags_r)"))

  private case class FamilySpec(col: String, nullDuck: String,
      nullNative: String, pool: Seq[LevelTpl])

  private def families(t: Double, k: Int, days: Int, n: Int) = Seq(
    FamilySpec("name", "\"name_l\" IS NULL OR \"name_r\" IS NULL",
      "name_l IS NULL OR name_r IS NULL", nameLevels(t, k)),
    FamilySpec("amount", "\"amount_l\" IS NULL OR \"amount_r\" IS NULL",
      "amount_l IS NULL OR amount_r IS NULL", amountLevels),
    FamilySpec("dob", "\"dob_l\" IS NULL OR \"dob_r\" IS NULL",
      "dob_l IS NULL OR dob_r IS NULL", dobLevels(days)),
    FamilySpec("tags", "\"tags_l\" IS NULL OR \"tags_r\" IS NULL",
      "tags_l IS NULL OR tags_r IS NULL", tagsLevels(n)))

  /** A generated model: the duckdb-dialect JSON and the native twin. */
  private case class GenModel(json: String, twin: LinkSettings)

  private val modelGen: Gen[GenModel] = for {
    t <- Gen.oneOf(0.7, 0.8, 0.88, 0.92)
    k <- Gen.oneOf(1, 2, 3)
    days <- Gen.oneOf(30, 365)
    n <- Gen.oneOf(1, 2)
    fams <- Gen.someOf(families(t, k, days, n)).suchThat(_.nonEmpty)
    picks <- Gen.sequence[Seq[Seq[LevelTpl]], Seq[LevelTpl]](
      fams.map(f => Gen.someOf(f.pool).suchThat(_.nonEmpty)
        .map(_.toSeq.sortBy(f.pool.indexOf))))
    lambda <- Gen.oneOf(0.001, 0.01, 0.2)
    mu <- Gen.listOfN(64, Gen.chooseNum(0.01, 0.99))
  } yield {
    val muIter = Iterator.continually(mu).flatten
      .map(x => BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    val comparisons = fams.toSeq.zip(picks).map { case (fam, levels) =>
      val withProbs = levels.map(l => (l, muIter.next(), muIter.next()))
      val elseM = muIter.next()
      val elseU = muIter.next()
      val duckLevels: List[JValue] =
        (("sql_condition" -> fam.nullDuck) ~
          ("label_for_charts" -> "null") ~ ("is_null_level" -> true)) ::
        withProbs.toList.map { case (l, m, u) =>
          ("sql_condition" -> l.duck) ~ ("label_for_charts" -> l.duck) ~
            ("m_probability" -> m) ~ ("u_probability" -> u): JValue
        } ::: List(
          ("sql_condition" -> "ELSE") ~ ("label_for_charts" -> "else") ~
            ("m_probability" -> elseM) ~ ("u_probability" -> elseU): JValue)
      val duck: JValue = ("output_column_name" -> fam.col) ~
        ("comparison_levels" -> duckLevels)
      val native = Comparison(fam.col,
        ComparisonLevel("null", fam.nullNative, isNull = true) +:
          withProbs.map { case (l, m, u) =>
            ComparisonLevel(l.native, l.native, m = Some(m), u = Some(u))
          } :+ ComparisonLevel("else", "ELSE",
            m = Some(elseM), u = Some(elseU)))
      (duck, native)
    }
    val json = JsonMethods.pretty(JsonMethods.render(
      ("link_type" -> "dedupe_only") ~
        ("sql_dialect" -> "duckdb") ~
        ("probability_two_random_records_match" -> lambda) ~
        ("blocking_rules_to_generate_predictions" ->
          List(("blocking_rule" -> "l.\"city\" = r.\"city\"") ~
            ("sql_dialect" -> "duckdb"): JValue)) ~
        ("comparisons" -> comparisons.map(_._1))))
    val twin = LinkSettings(
      linkType = LinkType.DedupeOnly,
      blockingRules = Seq(BlockingRule.CustomBlockingRule("l.city = r.city")),
      comparisons = comparisons.map(_._2),
      probabilityTwoRandomRecordsMatch = lambda)
    GenModel(json, twin)
  }

  /** 40 rows engineered so every template family distinguishes: similar
    * and dissimilar names, equal/unequal amounts, valid/invalid/missing
    * dates, overlapping tag arrays, a handful of nulls everywhere. */
  private lazy val records = {
    val rnd = new scala.util.Random(42)
    val baseNames = Seq("jonathan", "christine", "elizabeth", "muhammad")
    val rows = (0 until 40).map { i =>
      val base = baseNames(i % baseNames.length)
      val name = rnd.nextInt(5) match {
        case 0 => null
        case 1 => base
        case 2 => base.updated(1 + rnd.nextInt(base.length - 1),
          ('a' + rnd.nextInt(26)).toChar) // 1 substitution
        case 3 => base.drop(1) // 1 deletion
        case _ => rnd.shuffle(baseNames).head
      }
      val amount =
        if (rnd.nextInt(6) == 0) null
        else java.lang.Double.valueOf((rnd.nextInt(4) * 125).toDouble)
      val dob = rnd.nextInt(6) match {
        case 0 => null
        case 1 => "not-a-date"
        case _ => f"19${70 + rnd.nextInt(3)}%d-0${1 + rnd.nextInt(9)}%d-15"
      }
      val tags = if (rnd.nextInt(7) == 0) null
        else rnd.shuffle(Seq("red", "green", "blue", "gold"))
          .take(1 + rnd.nextInt(3))
      (i.toLong, name, s"city${i % 3}", amount, dob, tags)
    }
    rows.toDF("unique_id", "name", "city", "amount", "dob", "tags")
      .persist()
  }

  private def score(s: LinkSettings): Set[(Long, Long, Double)] =
    new Linker(records, s).predict()
      .select(col("unique_id_l"), col("unique_id_r"),
        round(col("match_weight"), 9).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("100 generated duckdb-dialect models load, round-trip, and " +
      "predict identically to their natively-built twins") {
    val params = Gen.Parameters.default
    var checked = 0
    var seed = Seed(20260814L)
    var distinctShapes = Set.empty[Int]
    while (checked < 100) {
      modelGen.apply(params, seed) match {
        case Some(gm) =>
          val loaded = SettingsJson.fromJson(gm.json)
          // structural round-trip: our own serialisation must reproduce
          // the loaded settings exactly (case-class equality)
          val roundTripped = SettingsJson.fromJson(SettingsJson.toJson(loaded))
          assert(roundTripped == loaded,
            s"model #$checked failed toJson/fromJson round-trip")
          // semantic equality: identical scored pairs to the native twin
          val got = score(loaded)
          val want = score(gm.twin)
          assert(got.nonEmpty, s"model #$checked scored no pairs")
          assert(got == want,
            s"model #$checked diverges from its native twin; " +
              s"json:\n${gm.json.take(2000)}\n" +
              s"only-loaded: ${(got -- want).take(3)}; " +
              s"only-twin: ${(want -- got).take(3)}")
          distinctShapes += gm.json.hashCode
          checked += 1
        case None => // generator retry (suchThat miss)
      }
      seed = seed.next
    }
    assert(distinctShapes.size > 50,
      "the generator must actually explore the space, not repeat one model")
  }
}
