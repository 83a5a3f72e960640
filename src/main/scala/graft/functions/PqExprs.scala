package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** Product-quantization primitives (Jégou/Douze/Schmid, TPAMI'11) — the
  * memory-bound scale path for similarity search: a d-dim float vector
  * (4d bytes) compresses to `m` one-byte codes (32× at d=64, m=8), and
  * query scoring becomes `m` table lookups per row (ADC — asymmetric
  * distance computation) instead of d multiplies against raw floats that
  * wouldn't fit in cluster memory at 100 TB.
  */

/** Encode: nearest codebook entry per subspace (euclidean), one byte per
  * subspace. Codebooks ride into generated code via `addReferenceObj`.
  * `codebooks(j)(c)` is the c-th centroid of subspace j (dsub floats).
  */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.length <= 256),
    "PQ codebooks: at most 256 codes per subspace (one byte)")

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode expects array<float|double>, got $other")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pq_encode"

  protected override def nullSafeEval(input: Any): Any =
    PqEncodeExpr.compute(input.asInstanceOf[ArrayData], codebooks, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqEncodeExpr.compute($c, $cb, $isFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeExpr {
  def compute(arr: ArrayData, codebooks: Array[Array[Array[Float]]],
              isFloat: Boolean): Array[Byte] = {
    val m = codebooks.length
    val out = new Array[Byte](m)
    var j = 0
    var off = 0
    while (j < m) {
      val cb = codebooks(j)
      val dsub = cb(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val idx = off + i
          val x =
            if (idx >= arr.numElements() || arr.isNullAt(idx)) 0.0
            else if (isFloat) arr.getFloat(idx).toDouble else arr.getDouble(idx)
          val diff = x - cent(i)
          d2 += diff * diff
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(j) = (best & 0xff).toByte
      off += dsub
      j += 1
    }
    out
  }

  def pqEncode(v: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(PqEncodeExpr(GraftBridge.expression(v), codebooks))
}

/** ADC lookup-sum: `Σ_j lut[j·256 + code_j]` — with a per-query lut of
  * subspace dot products this approximates dot(query, reconstructed(x));
  * with the codebook-norm lut it yields |x̂|². The lut may be a per-row
  * column (broadcast-joined from the query side) or a literal.
  */
case class AdcLookupExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(FloatType, _) | ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_adc_lookup expects (binary codes, array<float|double> lut), got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc_lookup"

  private def lutIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(a: Any, b: Any): Any =
    AdcLookupExpr.compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData], lutIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.AdcLookupExpr.compute($a, $b, $lutIsFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AdcLookupExpr {
  def compute(codes: Array[Byte], lut: ArrayData, lutIsFloat: Boolean): Double = {
    var s = 0.0
    var j = 0
    while (j < codes.length) {
      val idx = j * 256 + (codes(j) & 0xff)
      if (idx < lut.numElements() && !lut.isNullAt(idx))
        s += (if (lutIsFloat) lut.getFloat(idx).toDouble else lut.getDouble(idx))
      j += 1
    }
    s
  }

  def adcLookup(codes: Column, lut: Column): Column =
    GraftBridge.column(AdcLookupExpr(
      GraftBridge.expression(codes), GraftBridge.expression(lut)))
}
