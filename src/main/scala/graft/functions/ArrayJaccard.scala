package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

object ArrayJaccardKernel {
  /** Jaccard of two SORTED distinct long arrays via linear merge — no
    * boxing, no per-call hash sets (Spark's `array_intersect` is an
    * interpreted expression with boxed elements). */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 && m == 0) return 1.0
    if (n == 0 || m == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter)
  }

  /** Intersection SIZE of two sorted distinct long arrays (same linear
    * merge) — feeds asymmetric containment |A∩B|/|A|, which jaccard alone
    * cannot express. */
  def intersectCountSorted(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }
}

/** intersection size of two sorted array<bigint> columns -> bigint. */
case class SortedLongArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "intersect_sorted_longs"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"intersect_sorted_longs requires (array<bigint>, array<bigint>), got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayJaccardKernel.intersectCountSorted(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ArrayJaccardKernel.intersectCountSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongArrayIntersectCount =
    copy(left = l, right = r)
}

/** jaccard of two sorted array<bigint> columns -> double. */
case class SortedLongArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaccard_sorted_longs"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaccard_sorted_longs requires (array<bigint>, array<bigint>), got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayJaccardKernel.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ArrayJaccardKernel.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongArrayJaccard =
    copy(left = l, right = r)
}
