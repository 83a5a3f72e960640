package graft.ops

import graft.functions.WinnowExpr
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure (no Spark) properties of the winnowing fingerprint expression. */
object TextProps extends Properties("Winnow") {

  private val K = 5
  private val W = 4

  private def fps(text: String): Set[Long] = {
    val arr = WinnowExpr.compute(UTF8String.fromString(text), K, W)
    (0 until arr.numElements()).map(arr.getLong).toSet
  }

  private def randText(seed: Long, len: Int): String = {
    var s = seed
    val sb = new StringBuilder
    (0 until len).foreach { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      sb += ('a' + ((s >>> 33) % 26)).toChar
    }
    sb.toString
  }

  property("shared-substring guarantee: any common run of ≥ w+k−1 chars shares a fingerprint") =
    forAll(Gen.long, Gen.choose(K + W - 1, 40)) { (seed, sharedLen) =>
      val shared = randText(seed, sharedLen)
      val a = randText(seed + 1, 20) + shared + randText(seed + 2, 20)
      val b = randText(seed + 3, 20) + shared + randText(seed + 4, 20)
      (fps(a) intersect fps(b)).nonEmpty
    }

  property("rolling hash equals naive per-gram polynomial") =
    forAll(Gen.long, Gen.choose(K + W - 1, 60)) { (seed, len) =>
      val text = randText(seed, len)
      val cps = text.codePoints().toArray
      def naive(i: Int): Long =
        (i until i + K).foldLeft(0L)((h, j) => (h * 257 + cps(j)) % 2147483647L)
      val grams = (0 to cps.length - K).map(naive)
      val expected = (0 to grams.length - W).map(j => grams.slice(j, j + W).min).toSet
      fps(text) == expected
    }

  property("fingerprints are invariant under position shift (prefix padding)") =
    forAll(Gen.long) { seed =>
      val doc = randText(seed, 30)
      val shifted = randText(seed + 9, 15) + doc
      // every fingerprint of the original doc's interior survives in the
      // shifted copy (windows fully inside the shared suffix)
      (fps(doc) intersect fps(shifted)).nonEmpty
    }
}

/** Pure properties of the native MinHash signature vs a naive reference
  * (explicit shingle strings + the same xxhash64(shingle, perm) chain).
  */
object MinHashProps extends Properties("MinHashSig") {
  import graft.functions.MinHashSigExpr
  import org.apache.spark.sql.catalyst.expressions.XXH64

  private val K = 3
  private val H = 16

  private def refSig(text: String): Option[Seq[Long]] = {
    val tokens = text.split(" ", -1)
    if (tokens.length < K) return None
    val shingles = (0 to tokens.length - K).map(i => tokens.slice(i, i + K).mkString(" "))
    Some((0 until H).map { p =>
      shingles.map { sh =>
        val u = UTF8String.fromString(sh)
        XXH64.hashInt(p, XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L))
      }.min
    })
  }

  private def natSig(text: String): Option[Seq[Long]] = {
    val arr = MinHashSigExpr.compute(UTF8String.fromString(text), K, H)
    if (arr == null) None else Some((0 until arr.numElements()).map(arr.getLong))
  }

  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(5)),
    Gen.const(""),             // empty tokens from consecutive spaces
    Gen.oneOf("的", "é", "😀", "x", "1"),
  )

  property("native signature equals the naive shingle-string reference") =
    forAll(Gen.listOf(tokenGen)) { tokens =>
      val text = tokens.mkString(" ")
      natSig(text) == refSig(text)
    }

  property("texts with fewer than k tokens have no signature") =
    forAll(Gen.listOfN(K - 1, tokenGen)) { tokens =>
      natSig(tokens.mkString(" ")).isEmpty
    }
}
