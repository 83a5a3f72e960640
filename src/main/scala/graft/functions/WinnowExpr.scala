package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints over a Rabin–Karp ROLLING hash
  * (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS algorithm): hash every
  * k-gram of Unicode code points with a polynomial rolling hash
  * (base 257 mod 2³¹−1, one add/mul per character instead of per gram),
  * slide a window of `w` consecutive gram hashes, and keep the minimum of
  * each window. Guarantee: two documents sharing any substring of at least
  * w+k−1 characters share at least one fingerprint — the property that
  * makes this the standard local-similarity / plagiarism sketch for
  * training-data pipelines.
  *
  * Returns the sorted distinct fingerprint array (empty when the text has
  * fewer than k+w−1 code points). Native expression with `doGenCode`: one
  * pass over the UTF-8 bytes, inline code-point decode, no interpreted
  * higher-order functions. The polynomial's value per gram equals the
  * naive per-gram evaluation, so a relational engine can replicate it
  * exactly without implementing the rolling optimization.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 2 && w >= 1, s"need k ≥ 2, w ≥ 1; got k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  protected override def nullSafeEval(input: Any): Any =
    WinnowExpr.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowExpr.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpr {
  private final val Mod = 2147483647L // 2^31 − 1
  private final val Base = 257L

  def compute(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    // inline UTF-8 → code points (matches unicode()/codePoints semantics)
    val bytes = s.getBytes
    val n = bytes.length
    val cps = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      val b0 = bytes(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if (b0 < 0xe0) { cp = b0 & 0x1f; len = 2 }
      else if (b0 < 0xf0) { cp = b0 & 0x0f; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var j = 1
      while (j < len && i + j < n) { cp = (cp << 6) | (bytes(i + j) & 0x3f); j += 1 }
      cps(m) = cp
      m += 1
      i += len
    }
    if (m < k + w - 1) return new GenericArrayData(Array.empty[Long])

    // rolling k-gram hashes: h' = ((h − cp_out·B^(k−1))·B + cp_in) mod p
    var bk1 = 1L
    var e = 0
    while (e < k - 1) { bk1 = bk1 * Base % Mod; e += 1 }
    val numGrams = m - k + 1
    val hashes = new Array[Long](numGrams)
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + cps(i)) % Mod; i += 1 }
    hashes(0) = h
    var g = 1
    while (g < numGrams) {
      h = ((h - cps(g - 1) * bk1 % Mod + Mod) % Mod * Base + cps(g + k - 1)) % Mod
      hashes(g) = h
      g += 1
    }

    // winnow: min per window of w gram hashes; distinct + sorted output
    val numWins = numGrams - w + 1
    val sel = new Array[Long](numWins)
    var wi = 0
    while (wi < numWins) {
      var mn = Long.MaxValue
      var j = 0
      while (j < w) { if (hashes(wi + j) < mn) mn = hashes(wi + j); j += 1 }
      sel(wi) = mn
      wi += 1
    }
    java.util.Arrays.sort(sel)
    var distinct = 0
    var p = 0
    while (p < numWins) {
      if (p == 0 || sel(p) != sel(p - 1)) { sel(distinct) = sel(p); distinct += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sel, distinct))
  }

  /** Column API. */
  def winnow(c: Column, k: Int = 5, w: Int = 4): Column =
    GraftBridge.column(WinnowExpr(GraftBridge.expression(c), k, w))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_winnow"),
    new ExpressionInfo(classOf[WinnowExpr].getName, "graft_winnow"),
    (children: Seq[Expression]) => {
      def intLit(e: Expression): Int = e match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_winnow: k/w must be integer literals, got $other")
      }
      children match {
        case Seq(t)       => WinnowExpr(t, 5, 4)
        case Seq(t, a, b) => WinnowExpr(t, intLit(a), intLit(b))
        case _ => throw new IllegalArgumentException("graft_winnow(text[, k, w])")
      }
    },
  )
}
