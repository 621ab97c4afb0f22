package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the string-similarity functions the
 * reference ships as a Spark UDF jar (reference:
 * `splink/internals/spark/jar_location.py:40-63`). Implemented as
 * `BinaryExpression`s with `doGenCode` calling the static kernels in
 * [[StringSim]] / [[Phonetics]], so they participate in whole-stage codegen
 * (a plain Scala UDF would break the codegen span and add serde cost —
 * matters in the comparison-vector hot path at 100TB).
 */
abstract class StringPairExpression extends BinaryExpression with Serializable {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got (${left.dataType}, ${right.dataType})")
  }
  /** Fully-qualified static method taking two CharSequences. Inputs pass
    * through `StringSim.cs` — a zero-copy view for ASCII strings, a String
    * materialisation only for multi-byte UTF-8 (saves two allocations per
    * comparison in the scoring hot path). */
  protected def staticMethod: String
  protected def compute(a: CharSequence, b: CharSequence): Any
  override def nullSafeEval(a: Any, b: Any): Any =
    compute(StringSim.cs(a.asInstanceOf[UTF8String]),
      StringSim.cs(b.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"$staticMethod(graft.functions.StringSim.cs($a), graft.functions.StringSim.cs($b))")
}

case class JaroSim(left: Expression, right: Expression) extends StringPairExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_sim"
  protected def staticMethod = "" // unused: U8 entry point below
  protected def compute(a: CharSequence, b: CharSequence): Any = StringSim.jaro(a, b)
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroU8(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StringSim.jaroU8($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroSim =
    copy(left = l, right = r)
}

case class JaroWinklerSim(left: Expression, right: Expression) extends StringPairExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  protected def staticMethod = "" // unused: U8 entry point below
  protected def compute(a: CharSequence, b: CharSequence): Any = StringSim.jaroWinkler(a, b)
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinklerU8(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSim.jaroWinklerU8($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSim =
    copy(left = l, right = r)
}

case class DamerauLevenshtein(left: Expression, right: Expression) extends StringPairExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"
  protected def staticMethod = "graft.functions.StringSim.damerauLevenshtein"
  protected def compute(a: CharSequence, b: CharSequence): Any = StringSim.damerauLevenshtein(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshtein =
    copy(left = l, right = r)
}

/** `levenshtein(l, r) <= bound` as ONE banded early-exit kernel (see
  * [[StringSim.levenshteinWithin]]): the bounded predicate is what
  * comparison levels actually ask, and deciding it costs O(n*bound)
  * instead of the built-in's full O(n*m) matrix — the dominant term of
  * the gamma hot path at 100M+ pairs. The byte-equality fast path skips
  * the DP entirely for exact matches. `bound` is a Scala field, not a
  * child: levels always use a literal threshold, and keeping the arity
  * binary reuses the standard null-intolerant codegen. */
case class LevenshteinLte(left: Expression, right: Expression, bound: Int)
    extends StringPairExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "levenshtein_lte"
  protected def staticMethod = "" // unused: doGenCode overridden
  protected def compute(a: CharSequence, b: CharSequence): Any =
    StringSim.levenshteinWithin(a, b, bound)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (bound < 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a non-negative bound, got $bound")
    else super.checkInputDataTypes()
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.levenshteinWithinU8(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], bound)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSim.levenshteinWithinU8($a, $b, $bound)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LevenshteinLte =
    copy(left = l, right = r)
}

/** `damerau_levenshtein(l, r) <= bound` as ONE banded bounded kernel (see
  * [[StringSim.damerauLevenshteinWithin]]) — the same shape as
  * [[LevenshteinLte]] for the transposition-aware levels: the bounded
  * predicate is what `ll.damerauLevenshtein` levels actually ask, and the
  * band does O(n*bound) work instead of the full O(n*m) alphabet-mapped
  * matrix of [[DamerauLevenshtein]]. */
case class DamerauLevenshteinLte(left: Expression, right: Expression, bound: Int)
    extends StringPairExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "damerau_levenshtein_lte"
  protected def staticMethod = "" // unused: doGenCode overridden
  protected def compute(a: CharSequence, b: CharSequence): Any =
    StringSim.damerauLevenshteinWithin(a, b, bound)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (bound < 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a non-negative bound, got $bound")
    else super.checkInputDataTypes()
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.damerauLevenshteinWithinU8(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], bound)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSim.damerauLevenshteinWithinU8($a, $b, $bound)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshteinLte =
    copy(left = l, right = r)
}

/** Char-bigram Jaccard, matching the reference jar's `jaccard` UDF surface. */
case class JaccardSim(left: Expression, right: Expression) extends StringPairExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"
  protected def staticMethod = "" // unused: U8 entry point below
  protected def compute(a: CharSequence, b: CharSequence): Any = StringSim.jaccardQgram(a.toString, b.toString, 2)
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaccardQgramU8(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], 2)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.StringSim.jaccardQgramU8($a, $b, 2)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

/** Character-SET Jaccard (q=1), matching DuckDB's built-in `jaccard` —
  * the function duckdb-dialect model.json conditions reference. One
  * deviation: DuckDB errors on empty input; a distributed scan must not
  * throw, so empty-vs-nonempty is 0.0 (both-empty 1.0). */
case class JaccardChars(left: Expression, right: Expression) extends StringPairExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_chars"
  protected def staticMethod = "" // unused: U8 entry point below
  protected def compute(a: CharSequence, b: CharSequence): Any = StringSim.jaccardQgram(a.toString, b.toString, 1)
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaccardQgramU8(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], 1)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.StringSim.jaccardQgramU8($a, $b, 1)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardChars =
    copy(left = l, right = r)
}

abstract class StringUnaryExpression extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType}")
  }
  protected def staticCall(arg: String): String
  protected def compute(s: String): String
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(compute(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"org.apache.spark.unsafe.types.UTF8String.fromString(${staticCall(s"$v.toString()")})")
}

case class DMetaphone(child: Expression) extends StringUnaryExpression {
  override def prettyName: String = "dmetaphone"
  protected def staticCall(arg: String) = s"graft.functions.Phonetics.doubleMetaphone($arg)"
  protected def compute(s: String): String = Phonetics.doubleMetaphone(s)
  override protected def withNewChildInternal(c: Expression): DMetaphone = copy(child = c)
}

case class DMetaphoneAlt(child: Expression) extends StringUnaryExpression {
  override def prettyName: String = "dmetaphone_alt"
  protected def staticCall(arg: String) = s"graft.functions.Phonetics.doubleMetaphoneAlt($arg)"
  protected def compute(s: String): String = Phonetics.doubleMetaphoneAlt(s)
  override protected def withNewChildInternal(c: Expression): DMetaphoneAlt = copy(child = c)
}

case class Metaphone(child: Expression) extends StringUnaryExpression {
  override def prettyName: String = "metaphone"
  protected def staticCall(arg: String) = s"graft.functions.Phonetics.metaphone($arg)"
  protected def compute(s: String): String = Phonetics.metaphone(s)
  override protected def withNewChildInternal(c: Expression): Metaphone = copy(child = c)
}

case class SoundexCode(child: Expression) extends StringUnaryExpression {
  override def prettyName: String = "soundex_graft"
  protected def staticCall(arg: String) = s"graft.functions.Phonetics.soundex($arg)"
  protected def compute(s: String): String = Phonetics.soundex(s)
  override protected def withNewChildInternal(c: Expression): SoundexCode = copy(child = c)
}

case class QgramTokenise(child: Expression, q: Int) extends StringUnaryExpression {
  override def prettyName: String = "qgram_tokenise"
  protected def staticCall(arg: String) = s"graft.functions.StringSim.qgramTokenise($arg, $q)"
  protected def compute(s: String): String = StringSim.qgramTokenise(s, q)
  override protected def withNewChildInternal(c: Expression): QgramTokenise = copy(child = c)
}

/** Column-level API, mirroring `org.apache.spark.sql.functions`. */
/** Perceptual image hashes as native expressions over binary payloads:
  * `ahash64`/`dhash64` return the 64-bit signature for decodable PNG/BMP
  * bytes and NULL otherwise. The pixel decode is inherently scalar JVM
  * work (`graft.pipeline.Codecs` — same compilation unit, so the
  * functions->pipeline reference is fine); the expressions stay inside
  * whole-stage codegen via a static call, no UDF serde. */
abstract class ImageHashExpression extends UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${child.dataType}")
  protected def staticMethod: String
  protected def kernel(b: Array[Byte]): java.lang.Long
  override def nullSafeEval(b: Any): Any = {
    val r = kernel(b.asInstanceOf[Array[Byte]])
    if (r == null) null else r.longValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val boxed = ctx.freshName("hash")
      s"""java.lang.Long $boxed = $staticMethod($b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }""".stripMargin
    })
}

case class AHash64(child: Expression) extends ImageHashExpression {
  override def prettyName: String = "ahash64"
  protected def staticMethod = "graft.pipeline.Codecs.aHash64OrNull"
  protected def kernel(b: Array[Byte]): java.lang.Long =
    graft.pipeline.Codecs.aHash64OrNull(b)
  override protected def withNewChildInternal(c: Expression): AHash64 =
    copy(child = c)
}

case class DHash64(child: Expression) extends ImageHashExpression {
  override def prettyName: String = "dhash64"
  protected def staticMethod = "graft.pipeline.Codecs.dHash64OrNull"
  protected def kernel(b: Array[Byte]): java.lang.Long =
    graft.pipeline.Codecs.dHash64OrNull(b)
  override protected def withNewChildInternal(c: Expression): DHash64 =
    copy(child = c)
}

object funcs {
  import org.apache.spark.sql.functions._

  private def expr(e: Expression): Column = GraftSqlBridge.column(e)
  private def ex(c: Column): Expression = GraftSqlBridge.expression(c)

  def jaro_sim(l: Column, r: Column): Column = expr(JaroSim(ex(l), ex(r)))
  def jaro_winkler(l: Column, r: Column): Column = expr(JaroWinklerSim(ex(l), ex(r)))
  def damerau_levenshtein(l: Column, r: Column): Column = expr(DamerauLevenshtein(ex(l), ex(r)))
  def levenshtein_lte(l: Column, r: Column, d: Int): Column =
    expr(LevenshteinLte(ex(l), ex(r), d))
  def damerau_levenshtein_lte(l: Column, r: Column, d: Int): Column =
    expr(DamerauLevenshteinLte(ex(l), ex(r), d))
  def jaccard_sim(l: Column, r: Column): Column = expr(JaccardSim(ex(l), ex(r)))
  def jaccard_chars(l: Column, r: Column): Column = expr(JaccardChars(ex(l), ex(r)))
  def metaphone(c: Column): Column = expr(Metaphone(ex(c)))
  def dmetaphone(c: Column): Column = expr(DMetaphone(ex(c)))
  def dmetaphone_alt(c: Column): Column = expr(DMetaphoneAlt(ex(c)))
  def soundex_code(c: Column): Column = expr(SoundexCode(ex(c)))
  def qgram_tokenise(c: Column, q: Int): Column = expr(QgramTokenise(ex(c), q))
  def simhash64(c: Column): Column = expr(SimHash64(ex(c)))
  def char_shingles(c: Column, q: Int): Column = expr(CharShingles(ex(c), q))
  def hashed_shingles(c: Column, q: Int): Column = expr(HashedShingles(ex(c), q))
  def hashed_tokens(c: Column): Column = expr(HashedTokens(ex(c)))
  def word_ngram_hashes(c: Column, n: Int): Column =
    expr(WordNgramHashes(ex(c), n))
  def token_window_hashes(c: Column, k: Int): Column =
    expr(TokenWindowHashes(ex(c), k))
  def token_tf(c: Column): Column = expr(TokenTf(ex(c)))
  def jaccard_sorted_longs(l: Column, r: Column): Column =
    expr(SortedLongArrayJaccard(ex(l), ex(r)))
  def intersect_sorted_longs(l: Column, r: Column): Column =
    expr(SortedLongArrayIntersectCount(ex(l), ex(r)))
  def winnow_fingerprints(c: Column, q: Int, w: Int): Column =
    expr(WinnowFingerprints(ex(c), q, w))
  def minhash_sig(c: Column, q: Int, k: Int): Column = expr(MinHashSig(ex(c), q, k))
  def shingles_minhash(c: Column, q: Int, k: Int): Column =
    expr(ShinglesMinhash(ex(c), q, k))
  def cosine_sim(l: Column, r: Column): Column = expr(CosineSim(ex(l), ex(r)))
  def compression_ratio(c: Column): Column = expr(CompressionRatio(ex(c)))
  def dot_product(l: Column, r: Column): Column = expr(DotProduct(ex(l), ex(r)))
  def l2_sq(l: Column, r: Column): Column = expr(SquaredL2(ex(l), ex(r)))
  def hyperplane_sigs(c: Column, planes: Array[Array[Array[Double]]]): Column =
    expr(HyperplaneSignatures(ex(c), planes))
  def ahash64(c: Column): Column = expr(AHash64(ex(c)))
  def dhash64(c: Column): Column = expr(DHash64(ex(c)))

  /** Cosine similarity of two float/double array columns via higher-order
    * built-ins — exactly the formula the reference emits for Spark
    * (reference: `splink/internals/dialects.py:409-427`). Stays fully
    * codegen'd; no UDF. */
  def cosine_similarity(l: Column, r: Column): Column = {
    val dot = aggregate(zip_with(l, r, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val n1 = sqrt(aggregate(l, lit(0.0), (acc, x) => acc + x * x))
    val n2 = sqrt(aggregate(r, lit(0.0), (acc, x) => acc + x * x))
    dot / (n1 * n2)
  }

  /** Extract an Int literal argument for a SQL-registered function, with
    * a typed ANALYSIS error instead of a raw ClassCastException/NPE when
    * the argument is not a foldable integral literal (e.g. `'3'`, `3.5`,
    * or a column reference). */
  private def intLitArg(fn: String, es: Seq[Expression], pos: Int,
      sig: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    def bad(): Nothing = org.apache.spark.sql.GraftSqlBridge.analysisError(
      s"$fn expects $sig; argument ${pos + 1} must be an integer literal, " +
        s"got ${es(pos).sql}")
    es(pos) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Short, ShortType) => v.toInt
      case Literal(v: Byte, ByteType) => v.toInt
      case Literal(v: Long, LongType) if v.isValidInt => v.toInt
      case _ => bad()
    }
  }

  /** The single SQL-name -> expression-builder table shared by
    * [[registerAll]] and `graft.GraftExtensions` — one list, no drift. */
  val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "jaro_sim" -> (es => JaroSim(es(0), es(1))),
    "jaro_winkler" -> (es => JaroWinklerSim(es(0), es(1))),
    "damerau_levenshtein" -> (es => DamerauLevenshtein(es(0), es(1))),
    "levenshtein_lte" -> (es => LevenshteinLte(es(0), es(1),
      intLitArg("levenshtein_lte", es, 2, "(string, string, int literal)"))),
    "damerau_levenshtein_lte" -> (es => DamerauLevenshteinLte(es(0), es(1),
      intLitArg("damerau_levenshtein_lte", es, 2,
        "(string, string, int literal)"))),
    "jaccard_sim" -> (es => JaccardSim(es(0), es(1))),
    "metaphone" -> (es => Metaphone(es(0))),
    "dmetaphone" -> (es => DMetaphone(es(0))),
    "dmetaphone_alt" -> (es => DMetaphoneAlt(es(0))),
    "qgram_tokenise" -> (es => QgramTokenise(es(0),
      intLitArg("qgram_tokenise", es, 1, "(string, int literal)"))),
    "simhash64" -> (es => SimHash64(es(0))),
    "char_shingles" -> (es => CharShingles(es(0),
      intLitArg("char_shingles", es, 1, "(string, int literal)"))),
    "hashed_shingles" -> (es => HashedShingles(es(0),
      intLitArg("hashed_shingles", es, 1, "(string, int literal)"))),
    "hashed_tokens" -> (es => HashedTokens(es(0))),
    "word_ngram_hashes" -> (es => WordNgramHashes(es(0),
      intLitArg("word_ngram_hashes", es, 1, "(string, int literal)"))),
    "token_window_hashes" -> (es => TokenWindowHashes(es(0),
      intLitArg("token_window_hashes", es, 1, "(string, int literal)"))),
    "token_tf" -> (es => TokenTf(es(0))),
    "jaccard_sorted_longs" -> (es => SortedLongArrayJaccard(es(0), es(1))),
    "intersect_sorted_longs" -> (es => SortedLongArrayIntersectCount(es(0), es(1))),
    "winnow_fingerprints" -> (es => WinnowFingerprints(es(0),
      intLitArg("winnow_fingerprints", es, 1, "(string, int literal, int literal)"),
      intLitArg("winnow_fingerprints", es, 2, "(string, int literal, int literal)"))),
    "text_stats" -> (es => TextStats(es(0))),
    "token_count" -> (es => TokenCount(es(0))),
    "cosine_sim" -> (es => CosineSim(es(0), es(1))),
    "compression_ratio" -> (es => CompressionRatio(es(0))),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "l2_sq" -> (es => SquaredL2(es(0), es(1))),
    "ahash64" -> (es => AHash64(es(0))),
    "dhash64" -> (es => DHash64(es(0))),
    // aliases matching the names the reference's Spark jar registers
    // (`spark/jar_location.py:41-61`) so a model.json saved from the
    // reference's SPARK backend resolves unchanged. Spark lowercases
    // function lookups, hence "dmetaphonealt" for `DmetaphoneAlt(...)`;
    // `Dmetaphone(...)` already resolves to "dmetaphone" above.
    "jaccard" -> (es => JaccardSim(es(0), es(1))),
    "dmetaphonealt" -> (es => DMetaphoneAlt(es(0))),
    // DuckDB's jaccard is character-SET based (q=1), unlike the jar's
    // bigram jaccard — duckdb model.json conditions translate to this
    "jaccard_chars" -> (es => JaccardChars(es(0), es(1))))

  /** Register SQL-callable names (used by CustomLevel/CustomRule raw-SQL
    * passthrough, mirroring the reference's
    * `spark.udf.registerJavaFunction` setup, `spark/database_api.py:175-199`). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    sqlFunctions.foreach { case (name, builder) =>
      r.registerFunction(FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder)
    }
  }
}
