package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text-quality statistics — ONE linear pass over the UTF-8 bytes
  * instead of the six full-text regex passes of the relational formulation
  * (`TextOps.qualityFeaturesRef`: 4× `regexp_replace` + 2× regex split —
  * at 100 TB that is six scans of every byte where one suffices). Bit-for-
  * bit parity with the reference formulation is asserted in OpsSpec.
  *
  * Semantics (identical to the relational columns and the DuckDB oracle):
  *  - n_chars_q   = character count (`length`, code points — UTF-8 lead bytes)
  *  - n_tokens    = `size(split(text, " "))` = space count + 1 (empties kept)
  *  - n_digits    = count of [0-9] chars
  *  - n_punct     = count of chars outside [A-Za-z0-9 ] (multi-byte chars
  *                  count once — they are outside the ASCII class)
  *  - n_upper     = count of [A-Z] chars
  *  - n_stopwords = tokens (split on " ", ASCII-lowercased) that equal one of
  *                  `TextOps.stopwords`; markers are ASCII-only so ASCII
  *                  lowercasing equals `lower()` for any token that can match
  *  - n_subwords  = maximal [A-Za-z0-9]+ runs + maximal runs of chars outside
  *                  [A-Za-z0-9 ] (the BPE-ish `subwordCount`)
  *  - mean_token_len_x100 = (n_chars - n_spaces) * 100 div n_tokens
  *                  (floor division on exact integer counts)
  *
  * Stopword matching is allocation-free: every stopword is ≤ 8 bytes, so a
  * token packs into a Long (ASCII A–Z lowercased in place) and resolves via
  * binary search in a static sorted table — same trick as [[LangIdExpr]].
  */
case class QualityStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_quality_stats expects a string argument, got ${child.dataType}")

  override def dataType: DataType = QualityStatsExpr.schema
  override def prettyName: String = "graft_quality_stats"

  protected override def nullSafeEval(input: Any): Any =
    QualityStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityStatsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualityStatsExpr {

  val fieldNames: Seq[String] = Seq("n_chars_q", "n_tokens", "n_digits",
    "n_punct", "n_upper", "n_stopwords", "n_subwords", "mean_token_len_x100")

  val schema: StructType = StructType(fieldNames.map(StructField(_, LongType, nullable = false)))

  /** token → packed little-endian Long key (all stopwords ≤ 8 bytes). */
  private def pack(bytes: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < bytes.length) { v |= (bytes(i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  private val stopKeys: Array[Long] = {
    val ks = graft.ops.TextOps.stopwords.map { w =>
      val b = w.getBytes("UTF-8")
      require(b.length <= 8, s"stopword too long: $w")
      pack(b)
    }.toArray
    java.util.Arrays.sort(ks)
    ks
  }

  def compute(s: UTF8String): InternalRow = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes()
    var nChars = 0L
    var nSpaces = 0L
    var nDigits = 0L
    var nPunct = 0L
    var nUpper = 0L
    var nStop = 0L
    var nRuns = 0L // alnum runs + non-alnum-non-space runs
    var inAlnum = false
    var inOther = false
    var key = 0L
    var tokenLen = 0
    var fits = true
    var i = 0
    while (i <= n) {
      // sentinel space at the end flushes the final token
      val b: Byte =
        if (i == n) 0x20 else org.apache.spark.unsafe.Platform.getByte(base, offset + i)
      if (b == 0x20) {
        if (i < n) { nSpaces += 1; nChars += 1 }
        if (fits && tokenLen > 0) {
          var lo = 0
          var hi = stopKeys.length - 1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            val mk = stopKeys(mid)
            if (mk == key) { nStop += 1; lo = hi + 1 }
            else if (java.lang.Long.compareUnsigned(mk, key) < 0) lo = mid + 1
            else hi = mid - 1
          }
        }
        key = 0L
        tokenLen = 0
        fits = true
        inAlnum = false
        inOther = false
      } else {
        val isLead = (b & 0xC0) != 0x80 // ASCII or UTF-8 lead byte = one char
        val isDigit = b >= '0' && b <= '9'
        val isUpper = b >= 'A' && b <= 'Z'
        val isAlnum = isDigit || isUpper || (b >= 'a' && b <= 'z')
        if (isLead) {
          nChars += 1
          if (isDigit) nDigits += 1
          if (isUpper) nUpper += 1
          if (!isAlnum) nPunct += 1
        }
        if (isAlnum) {
          if (!inAlnum) nRuns += 1
          inAlnum = true; inOther = false
        } else {
          if (!inOther) nRuns += 1
          inOther = true; inAlnum = false
        }
        val lb: Long = if (isUpper) (b | 0x20).toLong else b & 0xffL
        if (tokenLen < 8) key |= lb << (8 * tokenLen) else fits = false
        tokenLen += 1
      }
      i += 1
    }
    val nTokens = nSpaces + 1
    val mean = (nChars - nSpaces) * 100L / nTokens
    new GenericInternalRow(Array[Any](
      nChars, nTokens, nDigits, nPunct, nUpper, nStop, nRuns, mean))
  }

  /** Column API: one struct column with all eight statistics. */
  def qualityStats(c: Column): Column =
    GraftBridge.column(QualityStatsExpr(GraftBridge.expression(c)))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_quality_stats"),
    new ExpressionInfo(classOf[QualityStatsExpr].getName, "graft_quality_stats"),
    (children: Seq[Expression]) => QualityStatsExpr(children.head),
  )
}
