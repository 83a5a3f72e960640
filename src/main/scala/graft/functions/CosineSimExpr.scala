package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity between two embedding arrays — one fused pass
  * computing dot(a,b), dot(a,a), dot(b,b) instead of three interpreted
  * `aggregate(zip_with(...))` chains (which also re-walk each array twice
  * for the norms). Bit-compatible with the HOF formulation
  * (`VectorOps.cosineRef`): float products round to float before the
  * double accumulation, accumulation is sequential left-to-right, a null
  * element or length mismatch yields null (zip_with null-pad poisoning).
  *
  * This sits in the hot loop of every similarity operator: brute-force
  * scoring (Q×N evaluations) and the exact verification of LSH candidate
  * pairs.
  *
  * "Bit-compatible" above holds for non-degenerate inputs (at least one
  * non-zero element on each side, no NaN elements) — the domain every
  * similarity operator here feeds it. Outside that domain:
  *
  * Known divergence from the HOF formulation: a genuinely-computed NaN —
  * an all-zero (or empty) vector gives 0/0 — maps to SQL null here (NaN is
  * this expression's null sentinel) while the HOF chain emits NaN. Filters
  * like `sim >= t` agree either way (NaN comparisons are false, null rows
  * drop); only the emitted value differs, and zero/NaN vectors are outside
  * the similarity operators' documented domain.
  */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  private def elemType(e: Expression) = e.dataType.asInstanceOf[ArrayType].elementType
  private def ok(e: Expression) = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right) && elemType(left) == elemType(right))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine_sim expects two array<float> or two array<double>, " +
        s"got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine_sim"

  private def isFloat: Boolean = elemType(left) == FloatType

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val r = CosineSimExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat)
    // same NaN→null mapping as the codegen path (constant folding and the
    // fallback interpreter go through here)
    if (java.lang.Double.isNaN(r)) null else java.lang.Double.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // compute() signals null via NaN (a genuine NaN input also yields NaN,
    // which the HOF formulation propagates as NaN ≠ null — but NaN inputs
    // are outside the operators' domain and documented as such)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |double r = graft.functions.CosineSimExpr.compute($a, $b, $isFloat);
         |if (Double.isNaN(r)) { ${ev.isNull} = true; } else { ${ev.value} = r; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {

  /** Fused dot + norms; NaN encodes SQL null (length mismatch / null elem). */
  def compute(a: ArrayData, b: ArrayData, isFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n) return Double.NaN
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      if (isFloat) {
        val x = a.getFloat(i)
        val y = b.getFloat(i)
        // float products first — bit parity with zip_with(x*y) on floats
        dot += (x * y).toDouble
        na += (x * x).toDouble
        nb += (y * y).toDouble
      } else {
        val x = a.getDouble(i)
        val y = b.getDouble(i)
        dot += x * y
        na += x * x
        nb += y * y
      }
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column API. */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine_sim"),
    new ExpressionInfo(classOf[CosineSimExpr].getName, "graft_cosine_sim"),
    (children: Seq[Expression]) => CosineSimExpr(children(0), children(1)),
  )
}
