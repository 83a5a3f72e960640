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
