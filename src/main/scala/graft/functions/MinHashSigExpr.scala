package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature — one pass over the UTF-8 bytes, BIT-IDENTICAL
  * to the relational formulation
  * `explode(array_distinct(shingles)) → groupBy → min(xxhash64(s, i))`
  * (`TextOps.minhashOfShingles`; parity asserted in OpsSpec) but with none
  * of its costs: no shingle-string allocation, no explode to docs×shingles
  * rows, no 32-way hash aggregation shuffle.
  *
  * Three exploited identities:
  *  1. a k-word shingle of a space-tokenized text IS a substring of the
  *     original text (tokens joined by single spaces) — so each shingle
  *     hashes straight out of the input buffer, zero copies;
  *  2. `xxhash64(s, i)` = `hashInt(i, hashUnsafeBytes(s, seed=42))` — the
  *     expensive byte hash runs ONCE per shingle, then each of the
  *     `numHashes` permutations is a cheap int mix (the relational form
  *     re-hashes the bytes per permutation: 32× the byte traffic);
  *  3. `array_distinct` before the min-aggregation is a no-op for min —
  *     duplicate shingles never change a minimum.
  *
  * Returns null for texts with fewer than k tokens (the relational form
  * produces zero exploded rows — the doc drops out of the signature set).
  */
case class MinHashSigExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  require(k >= 1 && numHashes >= 1)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[UTF8String], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashSigExpr.compute($c, $k, $numHashes);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {

  private val SEED = 42L // functions.xxhash64 default seed

  /** Null when the text has fewer than k tokens. */
  def compute(s: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes()
    // token boundaries: tokens are the runs between 0x20 bytes (split-on-
    // space semantics — empty tokens count). starts(i) = first byte of
    // token i; ends(i) = one past its last byte.
    var tokenCount = 1
    var i = 0
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, offset + i) == 0x20) tokenCount += 1
      i += 1
    }
    if (tokenCount < k) return null
    val starts = new Array[Int](tokenCount)
    val ends = new Array[Int](tokenCount)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, offset + i) == 0x20) {
        ends(t) = i
        t += 1
        starts(t) = i + 1
      }
      i += 1
    }
    ends(t) = n
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var sh = 0
    val last = tokenCount - k
    while (sh <= last) {
      val from = starts(sh)
      val len = ends(sh + k - 1) - from
      // shingle = tokens sh..sh+k-1 joined by the single spaces already in
      // the buffer = the substring [from, from+len)
      val h0 = XXH64.hashUnsafeBytes(base, offset + from, len, SEED)
      var p = 0
      while (p < numHashes) {
        val v = XXH64.hashInt(p, h0)
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      sh += 1
    }
    new GenericArrayData(sig)
  }

  /** Column API. */
  def minhashSig(c: Column, k: Int, numHashes: Int): Column =
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(c), k, numHashes))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash"),
    (children: Seq[Expression]) => MinHashSigExpr(children.head,
      children(1).eval().asInstanceOf[Int], children(2).eval().asInstanceOf[Int]),
  )
}
