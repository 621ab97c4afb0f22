package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused hyperplane-LSH signature kernel: all `tables` signatures of `bits`
  * bits each in ONE pass over the vector. Bit b of table t is set iff the
  * left-to-right double dot product of the vector with plane (t, b) is
  * strictly positive — the identical fold order (and therefore identical
  * IEEE bits) as one [[CosineKernel.dot]] call per plane, which is what the
  * unfused `when(dot_product(v, plane) > 0, 1L << b)` column chain evaluated.
  * Fusing matters: the unfused form re-reads the vector through ArrayData
  * accessors once per plane (tables x bits x dim accessor calls per row);
  * here the vector is unpacked to a primitive array once and the inner loop
  * is pure double math.
  */
object HyperplaneKernel {
  /** @return one signature long per table. Mirrors the unfused nulls: a
    *  null element or a dim/plane length mismatch made every per-plane dot
    *  null, and `when(null > 0, bit)` contributed 0 — so such vectors get
    *  all-zero signatures, never a null result. */
  def signatures(a: ArrayData, planes: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](planes.length)
    var hasNull = false
    val v = new Array[Double](n)
    var i = 0
    while (i < n && !hasNull) {
      if (a.isNullAt(i)) hasNull = true
      else v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    if (!hasNull) {
      var t = 0
      while (t < planes.length) {
        val tp = planes(t)
        var sig = 0L
        var b = 0
        while (b < tp.length) {
          val p = tp(b)
          if (p.length == n) {
            var dot = 0.0
            var j = 0
            while (j < n) { dot += v(j) * p(j); j += 1 }
            if (dot > 0) sig |= (1L << b)
          }
          b += 1
        }
        out(t) = sig
        t += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** array<float|double> -> array<long>: element t = table-t hyperplane
  * signature. The plane tensor rides along as a constructor constant
  * (driver-generated, seeded) — it is not data. Null input vector -> null
  * (callers explode the result, so null vectors simply produce no
  * candidate buckets). */
case class HyperplaneSignatures(child: Expression,
    planes: Array[Array[Array[Double]]])
    extends UnaryExpression with Serializable {
  override def prettyName: String = "hyperplane_sigs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    HyperplaneKernel.signatures(v.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][][]")
    val f = isFloat
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.HyperplaneKernel.signatures($a, $planesRef, $f);"
    })
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSignatures =
    copy(child = c)
}
