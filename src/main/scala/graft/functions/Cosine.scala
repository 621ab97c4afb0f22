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

  /** Plain dot product — the LSH hyperplane-signature inner loop. */
  def dot(a: ArrayData, b: ArrayData, fa: Boolean, fb: Boolean): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  /** Squared L2 distance — the IVF cell-assignment inner loop. */
  def l2sq(a: ArrayData, b: ArrayData, fa: Boolean, fb: Boolean): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    s
  }
}

/** Shared shape for the binary float/double-array -> double kernels. */
abstract class ArrayPairDoubleExpression extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // the kernel returns null on length mismatch / null elements even when
  // both inputs are non-null, so the expression is ALWAYS nullable — with
  // non-nullable children the default would make codegen emit the isNull
  // slot as the literal `false`, and the assignment in doGenCode would be
  // invalid Java (silent interpreted fallback for the whole stage)
  override def nullable: Boolean = true
  /** Kernel entry point, e.g. "cosine" — static method on CosineKernel. */
  protected def kernel: String

  protected def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float|double>, array<float|double>), got $other")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (fa, fb) = (isFloat(left), isFloat(right))
    // kernel may return null past the null-intolerant gate (length
    // mismatch / null element), so route through a boxed local.
    // freshName, NOT a fixed identifier: several instances of this
    // expression can land in ONE generated function (e.g. the argmax over
    // N seed cosines), and a fixed local name makes Janino reject the
    // whole stage (silent interpreted fallback).
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val kr = ctx.freshName("kernelResult")
      s"""
         |Object $kr = graft.functions.CosineKernel.$kernel($a, $b, $fa, $fb);
         |if ($kr == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((Double) $kr).doubleValue();
         |}
       """.stripMargin
    })
  }
}

/** cosine similarity of two array<float|double> columns -> double. */
case class CosineSim(left: Expression, right: Expression)
    extends ArrayPairDoubleExpression {
  override def prettyName: String = "cosine_sim"
  override protected def kernel: String = "cosine"
  override def nullSafeEval(a: Any, b: Any): Any =
    CosineKernel.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** dot product of two array<float|double> columns -> double. */
case class DotProduct(left: Expression, right: Expression)
    extends ArrayPairDoubleExpression {
  override def prettyName: String = "dot_product"
  override protected def kernel: String = "dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    CosineKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** squared L2 distance of two array<float|double> columns -> double. */
case class SquaredL2(left: Expression, right: Expression)
    extends ArrayPairDoubleExpression {
  override def prettyName: String = "l2_sq"
  override protected def kernel: String = "l2sq"
  override def nullSafeEval(a: Any, b: Any): Any =
    CosineKernel.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SquaredL2 =
    copy(left = l, right = r)
}
