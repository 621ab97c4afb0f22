package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass cosine kernel over Catalyst array data. Accumulation is
  * left-to-right double adds — the same fold order (and therefore the same
  * IEEE result, bit for bit) as the `aggregate(zip_with(...))` formula the
  * reference emits for Spark (`splink/internals/dialects.py:409-427`),
  * which Spark evaluates through interpreted higher-order functions. The
  * native kernel keeps the ANN/dedupe re-rank loop inside whole-stage
  * codegen: one virtual call per row instead of four lambda closures per
  * element. */
object CosineKernel {
  /** @param fa / fb element width flags: true = float32, false = float64.
    * Null (poisoned) when lengths differ or any element is null —
    * matching zip_with's null-extension + aggregate's null-absorption. */
  def cosine(a: ArrayData, b: ArrayData, fa: Boolean, fb: Boolean): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** cosine similarity of two array<float|double> columns -> double. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim requires (array<float|double>, array<float|double>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineKernel.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (fa, fb) = (isFloat(left), isFloat(right))
    // kernel may return null past the null-intolerant gate (length
    // mismatch / null element), so route through a boxed local
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Object kr = graft.functions.CosineKernel.cosine($a, $b, $fa, $fb);
         |if (kr == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((Double) kr).doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}
