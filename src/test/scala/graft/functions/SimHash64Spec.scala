package graft.functions

import graft.SparkSpec
import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** The native expression must agree bit-for-bit with the plain-Scala
  * reference SimHash (same tokenization, same splitmix64∘FNV-1a token hash
  * over code points, same vote rule — `TextOps.simhashReference`, the
  * independently-written formulation), survive codegen, and register as a
  * SQL function. The third implementation is the d06 DuckDB oracle SQL in
  * SparkEntry, which the driver gate checks against the expression.
  */
class SimHash64Spec extends SparkSpec {
  import spark.implicits._

  private val base20 = (1 to 20).map(i => s"token$i").mkString(" ")
  private val texts = Seq(
    base20,
    base20,                                    // identical → identical hash
    base20.replace("token7", "tokenX"),        // 1-of-20 tokens changed → close
    (1 to 20).map(i => s"other$i").mkString(" "), // all different → far
    "single",
    "double  space", // empty token between the two spaces
    "trailing space ",
    "",
  ).zipWithIndex.map(_.swap)

  test("native expression == plain-Scala reference on every fixture") {
    val df = texts.toDF("id", "t")
    val native = df.orderBy("id")
      .select(SimHash64Expr.simhash64($"t")).as[Long].collect()
    texts.sortBy(_._1).map(_._2).zip(native).foreach { case (t, h) =>
      assert(TextOps.simhashReference(t) == h, s"mismatch for '$t'")
    }
    // non-ASCII: the expression's UTF-8 byte-walk must agree with the
    // reference's codePoints() stream on 2-, 3- and 4-byte sequences
    val uni = Seq("café au lait", "héllo wörld", "日本語 テキスト", "emoji 😀 here")
    val uniNative = uni.toDF("t").select(SimHash64Expr.simhash64($"t"))
      .as[Long].collect()
    uni.zip(uniNative).foreach { case (t, h) =>
      assert(TextOps.simhashReference(t) == h, s"unicode mismatch for '$t'")
    }
  }

  test("identical texts collide; near-dups are hamming-close") {
    val h = texts.toDF("id", "t")
      .select(SimHash64Expr.simhash64($"t")).as[Long].collect()
    assert(h(0) == h(1))
    assert(java.lang.Long.bitCount(h(0) ^ h(2)) <= 16, "near-dup should be close")
    assert(java.lang.Long.bitCount(h(0) ^ h(3)) > 10, "different should be far")
  }

  test("registers as SQL function via GraftFunctions/extensions") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_simhash64('the quick brown fox') AS h").as[Long].collect().head
    val viaCol = Seq("the quick brown fox").toDF("t")
      .select(SimHash64Expr.simhash64($"t")).as[Long].collect().head
    assert(viaSql == viaCol)
  }

  test("invalid UTF-8 (truncated multi-byte tail) is hashed in-bounds, never dropped") {
    import org.apache.spark.unsafe.types.UTF8String
    // UTF8String is not validated (CAST(binary AS STRING) wraps raw bytes):
    // a dangling lead byte at the end must not read past the buffer, and
    // the token containing it must still vote (the pre-fix walk jumped
    // i past n, skipping the end-of-input flush — last token lost)
    def h(bytes: Array[Byte]): Long =
      SimHash64Expr.compute(UTF8String.fromBytes(bytes))
    val okPrefix = "alpha ".getBytes("UTF-8")
    val dangling2 = okPrefix :+ 0xC3.toByte               // 2-byte lead, no tail
    val dangling3 = okPrefix ++ Array(0xE2.toByte, 0x82.toByte) // 3-byte, one tail
    val dangling4 = okPrefix :+ 0xF0.toByte               // 4-byte lead alone
    // terminates, deterministic
    assert(h(dangling2) == h(dangling2))
    assert(h(dangling3) == h(dangling3))
    assert(h(dangling4) == h(dangling4))
    // the dangling token CONTRIBUTES: differs from the same text whose last
    // token is empty (what silently dropping the tail would collapse to)
    assert(h(dangling2) != h(okPrefix),
      "truncated trailing sequence must not be silently dropped")
    // valid text is untouched by the bounds clamp
    assert(h("alpha beta".getBytes("UTF-8")) ==
      TextOps.simhashReference("alpha beta"))
  }

  test("invalid lead byte mid-buffer never swallows a token boundary") {
    import org.apache.spark.unsafe.types.UTF8String
    def h(bytes: Array[Byte]): Long =
      SimHash64Expr.compute(UTF8String.fromBytes(bytes))
    // "a<0xC3> b": the dangling 2-byte lead is followed by ' ' — only a
    // genuine continuation byte (0b10xxxxxx) may be consumed, so the space
    // stays a split point and the lead decodes alone to cp 0xC3 & 0x1f =
    // 0x03. The byte-equivalent VALID input with the same code points per
    // token ([0x61,0x03] | [0x62]) must therefore hash identically; the
    // pre-fix decoder absorbed the space as a continuation byte and merged
    // the two tokens into one.
    val invalid = Array(0x61, 0xC3, 0x20, 0x62).map(_.toByte)
    val sameCps = Array(0x61, 0x03, 0x20, 0x62).map(_.toByte)
    assert(h(invalid) == h(sameCps),
      "space after a dangling lead must remain a token boundary")
    // and it must NOT equal the single-token merge (boundary swallowed)
    val merged = Array(0x61, 0x03, 0x62).map(_.toByte)
    assert(h(invalid) != h(merged))
  }

  test("whole-stage codegen path evaluates (no interpreted fallback errors)") {
    val n = spark.range(2000).select(concat(lit("tok word "), $"id".cast("string")).as("t"))
    val distinctHashes = n.select(SimHash64Expr.simhash64($"t")).distinct().count()
    assert(distinctHashes > 1000)
  }
}
