package graft.ops

import graft.functions.QualityStatsExpr
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure (no Spark) properties of the fused quality-stats expression: the
  * single-pass byte-level scan must agree with a straightforward JVM
  * reference implementing the relational spec (Java regex / split — the
  * same semantics the DuckDB oracle uses) on arbitrary Unicode input,
  * including the adversarial cases: multi-byte chars, supplementary-plane
  * emoji (surrogate pairs under regex, single code points under UTF-8),
  * the Kelvin sign K and dotted İ (the only-ish code points whose Unicode
  * lowercase lands in/near ASCII), combining marks, and runs of every
  * character class.
  */
object QualityProps extends Properties("QualityStats") {

  private def ref(text: String): Seq[Long] = {
    val cps = text.codePoints().toArray
    val nChars = cps.length.toLong
    val tokens = text.split(" ", -1)
    val nTokens = tokens.length.toLong
    val nDigits = cps.count(cp => cp >= '0' && cp <= '9').toLong
    val nUpper = cps.count(cp => cp >= 'A' && cp <= 'Z').toLong
    val isAlnum = (cp: Int) => (cp >= '0' && cp <= '9') ||
      (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
    val nPunct = cps.count(cp => !isAlnum(cp) && cp != ' ').toLong
    val nStop = tokens.count(t => TextOps.stopwords.contains(t.toLowerCase)).toLong
    val nSub = text.split("[^A-Za-z0-9]+", -1).count(_.nonEmpty).toLong +
      text.split("[A-Za-z0-9 ]+", -1).count(_.nonEmpty).toLong
    val nSpaces = nTokens - 1
    val mean = (nChars - nSpaces) * 100L / nTokens
    Seq(nChars, nTokens, nDigits, nPunct, nUpper, nStop, nSub, mean)
  }

  private def native(text: String): Seq[Long] = {
    val r = QualityStatsExpr.compute(UTF8String.fromString(text))
      .asInstanceOf[InternalRow]
    (0 until 8).map(r.getLong)
  }

  private val atoms: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf(TextOps.stopwords),
    Gen.oneOf(TextOps.stopwords).map(_.toUpperCase),
    Gen.oneOf("的", "是", "了", "é", "ß", "İ", "K", "😀", "á",
      "!!!", "..", ";#@", "  ", "", "x9", "1234", "\t", "ＡＢ"),
  )

  private val texts: Gen[String] =
    Gen.listOf(atoms).map(_.mkString(" "))

  property("single-pass scan equals the regex reference on arbitrary unicode") =
    forAll(texts) { text => native(text) == ref(text) }

  property("agrees on atoms joined WITHOUT separators (runs span atom joints)") =
    forAll(Gen.listOf(atoms)) { parts =>
      val text = parts.mkString
      native(text) == ref(text)
    }
}
