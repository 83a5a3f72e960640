package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over whitespace tokens — a custom Catalyst
  * expression with `doGenCode` (one static call in generated code; no
  * interpreted higher-order functions, no per-token object allocation).
  *
  * Semantics are EXACTLY `TextOps.simhash` (the composed-functions version):
  * tokens = `split(text, " ")` with Spark's limit=-1 semantics (consecutive
  * and trailing separators yield empty tokens), token hash = xxhash64(bytes,
  * seed 42) like Spark's `xxhash64`, bit i of the result = 1 iff the sum of
  * (hash>>i & 1 ? +1 : −1) votes over tokens is positive.
  *
  * Measured ~40× over the HOF formulation on 5k docs: the HOF builds a
  * 64-element vote array object per token per row in interpreted mode.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  protected override def nullSafeEval(input: Any): Any =
    SimHash64Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Expr {
  private final val Seed = 42L

  /** Single pass over the UTF-8 bytes; 0x20 never occurs inside a multi-byte
    * UTF-8 sequence, so byte-level splitting is exact.
    */
  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes()
    val votes = new Array[Int](64)
    var tokenStart = 0
    var i = 0
    while (i <= n) {
      val atEnd = i == n
      if (atEnd || org.apache.spark.unsafe.Platform.getByte(base, offset + i) == 0x20) {
        val h = XXH64.hashUnsafeBytes(base, offset + tokenStart, i - tokenStart, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        tokenStart = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column API. */
  def simhash64(c: Column): Column =
    GraftBridge.column(SimHash64Expr(GraftBridge.expression(c)))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash64"),
    new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash64"),
    (children: Seq[Expression]) => SimHash64Expr(children.head),
  )
}

/** SparkSessionExtensions hook: registers graft's native functions so
  * `spark.sql("SELECT graft_simhash64(text) ...")` works —
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(SimHash64Expr.registration)
    ext.injectFunction(CosineSketchExpr.registration)
    ext.injectFunction(LangIdExpr.registration)
    ext.injectFunction(CosineSimExpr.registration)
    ext.injectFunction(WinnowExpr.registration)
    ext.injectFunction(QualityStatsExpr.registration)
    ext.injectFunction(MinHashSigExpr.registration)
  }
}

/** Direct registry hook for an already-built session (tests, Bench). */
object GraftFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(SimHash64Expr.registration, CosineSketchExpr.registration,
      LangIdExpr.registration, CosineSimExpr.registration,
      WinnowExpr.registration, QualityStatsExpr.registration,
      MinHashSigExpr.registration).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
