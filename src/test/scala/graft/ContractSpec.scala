package graft

/** Driver-contract invariants: every declared query must carry a DuckDB
  * oracle (a missing entry silently downgrades the driver's check to
  * rows-only), and names must be unique and well-formed. */
class ContractSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("every query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q -- o == Set.empty, s"queries without oracle: ${q -- o}")
    assert(o -- q == Set.empty, s"oracles without query: ${o -- q}")
  }

  test("query iteration order is insertion-stable (deterministic bench order)") {
    // hash-ordered Maps reshuffle bench execution order whenever a query is
    // added, turning round-over-round per-query deltas into ordering noise
    assert(SparkEntry.queries.isInstanceOf[scala.collection.immutable.ListMap[_, _]])
    assert(SparkEntry.oracleSql.isInstanceOf[scala.collection.immutable.ListMap[_, _]])
    assert(SparkEntry.queries.keys.toSeq == SparkEntry.queries.keys.toSeq)
    // the first entry written in the source must come back first
    assert(SparkEntry.queries.keys.head == "q1_agg")
  }

  test("every query executes fully codegen'd (whole-stage fallback disabled)") {
    // a silent Janino failure runs the stage interpreted with correct
    // results — this sweep turns any such regression into a hard failure
    val spark = SparkSpec.session
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      SparkEntry.queries.foreach { case (name, fn) =>
        try {
          val n = fn(spark, "/root/testdata/sf0.001").count()
          assert(n >= 0)
        } catch {
          case e: Throwable =>
            fail(s"$name failed with codegen fallback disabled: " +
              e.getMessage.take(300))
        }
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("every registered SQL function evaluates through the SQL surface") {
    val spark = SparkSpec.session
    graft.functions.funcs.registerAll(spark)
    val probes = Map(
      "jaro_sim" -> "jaro_sim('martha', 'marhta')",
      "jaro_winkler" -> "jaro_winkler('martha', 'marhta')",
      "damerau_levenshtein" -> "damerau_levenshtein('ab', 'ba')",
      "levenshtein_lte" -> "levenshtein_lte('kitten', 'sitting', 3)",
      "damerau_levenshtein_lte" -> "damerau_levenshtein_lte('ab', 'ba', 1)",
      "jaccard_sim" -> "jaccard_sim('abc', 'abd')",
      "dmetaphone" -> "dmetaphone('smith')",
      "metaphone" -> "metaphone('smith')",
      "dmetaphone_alt" -> "dmetaphone_alt('smith')",
      "qgram_tokenise" -> "qgram_tokenise('abcd', 2)",
      "simhash64" -> "simhash64(array('ab', 'cd'))",
      "intersect_sorted_longs" ->
        "intersect_sorted_longs(array(1L, 2L, 3L), array(2L, 3L, 4L))",
      "winnow_fingerprints" -> "winnow_fingerprints('abcdefgh', 3, 4)",
      "char_shingles" -> "char_shingles('abcdef', 3)",
      "hashed_shingles" -> "hashed_shingles('abcdef', 3)",
      "hashed_tokens" -> "hashed_tokens('a b c')",
      "word_ngram_hashes" -> "word_ngram_hashes('a b c d', 3)",
      "token_window_hashes" -> "token_window_hashes('a b c d', 3)",
      "token_tf" -> "token_tf('a b a')",
      "jaccard_sorted_longs" ->
        "jaccard_sorted_longs(array(1L, 2L), array(2L, 3L))",
      "text_stats" -> "text_stats('the quick brown fox')",
      "token_count" -> "token_count('the quick brown fox')",
      "cosine_sim" ->
        "cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D))",
      "compression_ratio" -> "compression_ratio('aaaaaaaaaaaaaaaa')",
      "dot_product" -> "dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))",
      "l2_sq" -> "l2_sq(array(0.0D, 0.0D), array(3.0D, 4.0D))",
      // reference Spark-jar alias names (case-insensitive lookup)
      "jaccard" -> "jaccard('night', 'nacht')",
      "dmetaphonealt" -> "DmetaphoneAlt('smith')",
      "jaccard_chars" -> "jaccard_chars('night', 'nacht')",
      // minimal valid 2x2 24-bit BMP (gradient pixels)
      "ahash64" -> ("ahash64(unhex('424D460000000000000036000000280000000" +
        "200000002000000010018000000000010000000130B0000130B00000000000000" +
        "0000000A141EC8D2DC000028323C5A646E0000'))"),
      "dhash64" -> ("dhash64(unhex('424D460000000000000036000000280000000" +
        "200000002000000010018000000000010000000130B0000130B00000000000000" +
        "0000000A141EC8D2DC000028323C5A646E0000'))"))
    // the probe map must cover the shared table exactly — a new kernel
    // without a probe (or vice versa) fails here
    assert(probes.keySet ==
      graft.functions.funcs.sqlFunctions.map(_._1).toSet)
    probes.foreach { case (name, sql) =>
      val row = spark.sql(s"SELECT $sql").collect()
      assert(row.length == 1 && !row(0).isNullAt(0), s"$name returned null")
    }
  }

  test("oracle SQL references only driver-registered tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // crude FROM/JOIN scan: every bare identifier after FROM/JOIN is either
    // a registered table or a CTE defined in the same statement
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val ctes = "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([a-z0-9_, ]*\\))?\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val refs = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- tables -- ctes
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }

  test("fused shingles_minhash equals the separate kernels, value for value") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq("The quick  brown fox", "", "ab", "aaaaaaaaaa",
      "MiXeD Case  WITH   runs of space", "exactly8ch").toDF("t")
    val got = texts.select(
        graft.functions.funcs.shingles_minhash(col("t"), 8, 32).as("sm"),
        graft.functions.funcs.hashed_shingles(col("t"), 8).as("toks"),
        graft.functions.funcs.minhash_sig(col("t"), 8, 32).as("sig"))
      .select(col("sm.toks").as("ft"), col("sm.sig").as("fs"),
        col("toks"), col("sig"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](2))
      assert(r.getSeq[Long](1) == r.getSeq[Long](3))
    }
  }
}
