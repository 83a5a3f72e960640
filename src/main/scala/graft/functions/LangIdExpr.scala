package graft.functions

import graft.ops.TextOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native language-ID — one pass over the UTF-8 bytes instead of five
  * interpreted `array_intersect` passes over a distinct-token array (the
  * `TextOps.langGuess` reference formulation, which this reproduces bit for
  * bit: distinct marker hits per language, winner = max(hits·8 + rank),
  * zero hits → "und").
  *
  * Marker matching is allocation-free: every marker is ≤ 8 UTF-8 bytes, so
  * tokens pack into a Long (ASCII A–Z lowercased in place — the marker set
  * contains only lowercase ASCII and CJK, for which this equals full
  * lowercasing) and resolve via binary search in a static sorted table.
  * Distinctness comes free: a hit sets a per-language marker bit, so
  * repeated tokens count once — exactly `array_distinct` ∩ markers.
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_langid expects a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_langid"

  protected override def nullSafeEval(input: Any): Any =
    LangIdExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdExpr {

  // rank order identical to TextOps.langGuess: sorted language keys
  private val langs: Array[String] = TextOps.langMarkers.keys.toArray.sorted
  private val langUtf8: Array[UTF8String] = langs.map(UTF8String.fromString)
  private val und = UTF8String.fromString("und")

  /** marker → packed little-endian Long key (all markers ≤ 8 bytes). */
  private def pack(bytes: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < bytes.length) { v |= (bytes(i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  // sorted marker keys with parallel (langIdx, markerBit) payloads; a marker
  // string appearing in several languages (e.g. "la", "de") carries several
  // payload entries at consecutive positions
  private val (markerKeys: Array[Long], markerPayloads: Array[Array[Int]]) = {
    val m = scala.collection.mutable.Map.empty[Long, List[Int]]
    langs.zipWithIndex.foreach { case (lang, li) =>
      TextOps.langMarkers(lang).zipWithIndex.foreach { case (w, wi) =>
        val b = w.getBytes("UTF-8")
        require(b.length <= 8, s"marker too long: $w")
        val k = pack(b)
        m.update(k, (li << 16 | wi) :: m.getOrElse(k, Nil))
      }
    }
    val sorted = m.toArray.sortBy(_._1)
    (sorted.map(_._1), sorted.map(_._2.toArray))
  }

  def compute(s: UTF8String): UTF8String = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes()
    val hitBits = new Array[Int](langs.length) // ≤ 7 markers per language
    var tokenStart = 0
    var key = 0L
    var tokenLen = 0
    var fits = true
    var i = 0
    while (i <= n) {
      val b: Byte =
        if (i == n) 0x20 else org.apache.spark.unsafe.Platform.getByte(base, offset + i)
      if (b == 0x20) {
        if (fits && tokenLen > 0) {
          // binary search the packed token
          var lo = 0
          var hi = markerKeys.length - 1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            val mk = markerKeys(mid)
            if (mk == key) {
              val ps = markerPayloads(mid)
              var p = 0
              while (p < ps.length) {
                hitBits(ps(p) >> 16) |= 1 << (ps(p) & 0xffff)
                p += 1
              }
              lo = hi + 1 // found → exit
            } else if (java.lang.Long.compareUnsigned(mk, key) < 0) lo = mid + 1
            else hi = mid - 1
          }
        }
        tokenStart = i + 1
        key = 0L
        tokenLen = 0
        fits = true
      } else {
        // lowercase ASCII letters in place; other bytes verbatim
        val lb: Long = if (b >= 'A' && b <= 'Z') (b | 0x20).toLong else b & 0xffL
        if (tokenLen < 8) key |= lb << (8 * tokenLen) else fits = false
        tokenLen += 1
      }
      i += 1
    }
    var best = -1 // hits*8 + rank, like the GREATEST encoding
    var bestLang = -1
    var li = 0
    while (li < langs.length) {
      val score = java.lang.Integer.bitCount(hitBits(li)) * 8 + li
      if (score > best) { best = score; bestLang = li }
      li += 1
    }
    if (best >= 8) langUtf8(bestLang) else und
  }

  /** Column API. */
  def langid(c: Column): Column =
    GraftBridge.column(LangIdExpr(GraftBridge.expression(c)))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_langid"),
    new ExpressionInfo(classOf[LangIdExpr].getName, "graft_langid"),
    (children: Seq[Expression]) => LangIdExpr(children.head),
  )
}
