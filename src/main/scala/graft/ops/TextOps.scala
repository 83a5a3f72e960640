package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators for large-scale training-data
  * pipelines, built entirely from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs): tokenization, quality scoring, language-ID heuristic,
  * fingerprinting, exact dedup, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale notes:
  *  - everything per-row is a narrow map — no shuffle until the
  *    dedup/band-join stage;
  *  - LSH candidate generation shuffles on (band, bandHash) — cardinality
  *    ~ docs × bands, with hot buckets bounded by band width;
  *  - exact dedup groups on a 128-bit fingerprint, not the full text, so
  *    shuffle payload stays small at 100 TB (text travels only if the
  *    caller keeps it).
  */
object TextOps {

  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word shingles (n-grams joined by space). Pure expression: for k-shingles
    * over w words produces max(w-k+1, 0) shingles.
    */
  def shingles(text: Column, k: Int): Column = {
    val ws = tokens(text)
    when(size(ws) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(ws) - k),
        i => concat_ws(" ", slice(ws, i + 1, lit(k)))))
  }

  /** BPE-ish sub-word token count: words + digit runs + punctuation islands.
    * Regex split keeps it deterministic and engine-portable.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "[^A-Za-z0-9]+"), w => length(w) > 0)) +
      size(filter(split(text, "[A-Za-z0-9 ]+"), w => length(w) > 0))

  /** English stopwords for the quality-scoring stopword ratio. */
  val stopwords: Seq[String] = Seq(
    "the", "and", "of", "to", "a", "in", "is", "it", "for", "on", "with")

  /** Quality features: length, token stats, punctuation/digit/upper/stopword
    * counts and a BPE-ish subword count, as exact integer counts (ratios
    * left to the caller to avoid float nondeterminism across engines).
    * One fused linear scan per row (native [[graft.functions.QualityStatsExpr]];
    * the struct is codegen'd, so ProjectExec's subexpression elimination
    * computes it once for all eight extracted fields). Bit-parity with the
    * relational formulation [[qualityFeaturesRef]] is asserted in OpsSpec.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val qs = graft.functions.QualityStatsExpr.qualityStats(col(textCol))
    graft.functions.QualityStatsExpr.fieldNames.foldLeft(df) { (acc, f) =>
      acc.withColumn(f, qs.getField(f))
    }
  }

  /** The relational reference formulation of [[qualityFeatures]] — 4 regex
    * replaces + 2 regex splits over the full text per row. Kept as the
    * engine-portable semantics donor (it mirrors the DuckDB oracle SQL) and
    * for the parity test; the fused expression is the production path.
    */
  def qualityFeaturesRef(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val sw = array(stopwords.map(lit): _*)
    df.withColumn("n_chars_q", length(t))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_digits", length(t) - length(regexp_replace(t, "[0-9]", "")))
      .withColumn("n_punct", length(t) - length(regexp_replace(t, "[^A-Za-z0-9 ]", "")))
      .withColumn("n_upper", length(t) - length(regexp_replace(t, "[A-Z]", "")))
      .withColumn("n_stopwords",
        size(filter(tokens(lower(t)), x => array_contains(sw, x))))
      .withColumn("n_subwords", subwordCount(t))
      .withColumn("mean_token_len_x100",
        // floor division (matches SQL `//`); Spark `/` is double division and
        // a straight cast would truncate where DuckDB's CAST rounds
        when(col("n_tokens") > 0,
          floor(((length(t) - (col("n_tokens") - 1)) * 100) / col("n_tokens")).cast("long"))
          .otherwise(lit(0L)))
  }

  /** Language-ID heuristic: marker-word hit counts per language, winner by
    * (hits desc, language asc). Deterministic; replace marker lists with
    * n-gram profiles for production accuracy.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "la", "de", "que", "los", "es"),
    "zh" -> Seq("的", "是", "了", "在", "我"),
  )

  /** Distinct marker-word hits for one language. */
  def langHits(text: Column, lang: String): Column =
    size(array_intersect(array_distinct(tokens(lower(text))),
      array(langMarkers(lang).map(lit): _*))).cast("long")

  /** Winner = language with max (hits, rank) — encoded arithmetically as
    * hits*8 + rank so the exact same logic is one GREATEST in ANSI SQL
    * (rank order: de=0, en=1, es=2, fr=3, zh=4; ties → higher rank; zero
    * hits everywhere → "und").
    */
  def langGuess(text: Column): Column = {
    val ranked = langMarkers.keys.toSeq.sorted.zipWithIndex
    val scores = ranked.map { case (lang, r) => langHits(text, lang) * 8 + r }
    val best = greatest(scores: _*)
    val byRank = ranked.foldLeft(lit("und")) { case (acc, (lang, r)) =>
      when(best >= 8 && pmod(best, lit(8)) === r, lit(lang)).otherwise(acc)
    }
    byRank
  }

  /** 128-bit content fingerprint (md5 — stable across engines, so exact
    * dedup is oracle-checkable), plus 64-bit xxhash for cheap grouping.
    */
  def fingerprint(text: Column): Column = md5(text)

  /** Exact dedup: keep the lowest id per distinct content. Groups on the
    * md5 fingerprint so the shuffle carries (16B hash, id), not documents.
    */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy("fp").agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: `numHashes` permutations via seeded xxhash64 over
    * k-shingles. Returns array<bigint> of length numHashes (empty-shingle
    * docs get Long.MaxValue sentinels).
    */
  def minhash(text: Column, k: Int = 3, numHashes: Int = 32): Column =
    minhashOfShingles(shingles(text, k), numHashes)

  /** MinHash from an ALREADY MATERIALIZED shingle column. Callers should
    * project the shingle array into a column first: higher-order functions
    * run interpreted, and an inline shingle expression would be re-evaluated
    * once per hash seed (32× the shingling cost).
    */
  def minhashOfShingles(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), seed =>
      coalesce(
        array_min(transform(sh, s => xxhash64(s, seed))),
        lit(Long.MaxValue)))

  /** Candidate pairs from LSH band buckets: group the (id, band, bandHash)
    * rows by bucket, expand unordered id pairs bucket-locally from the
    * sorted id list, and dedup pairs found in several bands. ONE pass over
    * the banded rows and ONE shuffle of (band, hash, id); `a < b` holds by
    * construction from the sorted list, and the strict filter drops same-id
    * pairs exactly like a self-join's `l.id < r.id` would. Only suitable
    * for SPARSE bucket spaces (wide hashes — MinHash band hashes, cosine
    * sketches): for dense bucket spaces a codegen'd self-join wins (see
    * simhashNearDups, measured 4× either way at r7). Shared by
    * [[minhashNearDups]] and [[graft.ops.VectorOps.cosineNearDups]].
    */
  private[ops] def bandBucketPairs(banded: DataFrame, idCol: String,
                                   bandCol: String, hashCol: String): DataFrame =
    banded
      .groupBy(col(bandCol), col(hashCol))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))), y =>
          struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") < col("b"))
      .distinct()

  /** LSH banding: split the signature into `bands` bands and hash each —
    * docs sharing any band hash become candidate near-dup pairs.
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        xxhash64(concat_ws("_",
          transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), _.cast("string"))),
        ).as("bhash")))

  /** Relational reference of the native MinHash signature (explode the
    * distinct shingles, then one min-aggregate per permutation of
    * `xxhash64(shingle, permutation)`) — the semantics donor for
    * [[graft.functions.MinHashSigExpr]]; bit-parity asserted in OpsSpec.
    */
  def minhashSigsRef(df: DataFrame, idCol: String, textCol: String,
                     k: Int, numHashes: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(array_distinct(shingles(col(textCol), k))).as("s"))
      .groupBy("doc_id")
      .agg(array((0 until numHashes).map(i => min(xxhash64(col("s"), lit(i)))): _*).as("sig"))

  /** Near-duplicate candidate pairs via MinHash + LSH, verified with exact
    * shingle Jaccard. One shuffle on (band, bandHash); self-join within
    * buckets; `idCol` ordering dedups the pair space.
    */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 32, bands: Int = 8,
      jaccardThreshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    // Signatures via the native one-pass expression (MinHashSigExpr):
    // bit-identical to the explode + numHashes-min-aggregates formulation
    // `sigsRef` (parity-asserted in OpsSpec) with no explode to
    // docs×shingles rows, no hash-agg shuffle, one byte-hash per shingle
    // instead of numHashes. Docs with <k tokens have no shingles, can't be
    // near-dups, and drop out (null signature) — dropped HERE by the
    // explode (a null band array generates no rows) rather than by an
    // isnotnull filter: the filter form is pushed below the projection and
    // re-evaluates the whole signature expression per row (2× the scan
    // stage — measured in the r7 before-plan, Filter(4)/Project(5)).
    // Optimization history: the ORIGINAL nested-HOF formulation was
    // 510 s on 5k docs (interpreted lambdas re-shingling per seed), the
    // explode+agg rewrite ~5 s, the native expression ~2× again, and the
    // r7 single-eval + bucket-group candidate stage ~2× once more.
    val sigs = df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        graft.functions.MinHashSigExpr.minhashSig(col(textCol), k, numHashes).as("sig"))
    // candidate generation carries only (doc_id, band, bhash) — the shingle
    // sets are attached AFTER the pair space is deduped, so the band
    // aggregation and distinct shuffle ids, not documents. `when` keeps the
    // generator multiply-referencing `sig`, so CollapseProject leaves the
    // signature projection intact (single evaluation per row).
    val banded = sigs
      .select(col("doc_id"), explode(when(col("sig").isNotNull,
        lshBands(col("sig"), bands, rowsPerBand))).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.bhash"))
    // Bucket-group pair expansion instead of a band self-join: ONE pass
    // over the corpus (the self-join planned both sides as independent
    // scans — signatures were computed twice) and ONE shuffle of
    // (band, bhash, doc_id). Bucket size is bounded by LSH band width —
    // the same assumption the join relied on (a bucket of m docs produced
    // m² probe rows there, m(m-1)/2 here).
    val candidates = bandBucketPairs(banded, "doc_id", "band", "bhash")
      // the candidate id-pair table feeds THREE consumers (both sides of
      // the verify join and the pair-id semi-join) — cached so the corpus
      // scan + signature + band aggregation run once, not once per
      // consumer. Tiny payload: two id columns.
      .cache()
    // exact-verification shingle sets are computed ONLY for docs that
    // appear in a candidate pair (left-semi on the pair ids BEFORE the
    // shingle projection): at corpus scale candidates are a sliver of the
    // table, and shingling is the expensive interpreted step
    val pairIds = candidates.select(col("a").as("doc_id"))
      .unionByName(candidates.select(col("b").as("doc_id"))).distinct()
    val sets = df.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .join(pairIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), array_distinct(shingles(col("__t"), k)).as("sh"))
      // cached: consumed by BOTH attach joins below — without it the
      // semi-join + shingling subtree is planned twice (r7 before-plan
      // Exchanges 23/35 vs 45/57), shuffling full document text twice;
      // the cache also gives the planner real size stats, so the attach
      // joins broadcast the (small) sets side instead of sort-merging
      .cache()
    candidates
      .join(sets.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(sets.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("uni", size(array_union(col("sha"), col("shb"))))
      .filter(col("uni") > 0 && col("inter") >= col("uni") * jaccardThreshold)
      // inter/uni kept in the output: exact integer shingle counts let
      // callers derive engine-portable fixed-point jaccard (integer DIV —
      // float division then floor can disagree with SQL `//` by 1 ulp)
      .select(col("a"), col("b"), col("inter").cast("long").as("inter"),
        col("uni").cast("long").as("uni"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
  }

  /** Reference SimHash — the independently-reviewable second implementation
    * of `SimHash64Expr` (SimHash64Spec pins the two bit-for-bit on every
    * fixture). Deliberately the NAIVE formulation over JVM strings and
    * streams, sharing no code with the expression's unsafe byte-walk:
    * tokens via `String.split(" ", -1)` (Spark's split semantics — empty
    * tokens kept), token hash = splitmix64(FNV-1a-64 over code points),
    * vote per bit, sign of the vote = the output bit. Driver-side only —
    * the distributed path is the codegen'd expression.
    */
  def simhashReference(text: String): Long = {
    // constants verbatim from the published specs (FNV-1a 64; splitmix64
    // finalizer, Steele/Lea/Flood OOPSLA 2014) — intentionally restated
    // here rather than shared, so this implementation reviews standalone
    def fnv1a(tok: String): Long = {
      var acc = 0xcbf29ce484222325L
      tok.codePoints().forEach(cp => acc = (acc ^ cp.toLong) * 0x100000001b3L)
      acc
    }
    def splitmix64(v: Long): Long = {
      var z = v
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val votes = new Array[Long](64)
    text.split(" ", -1).foreach { tok =>
      val h = splitmix64(fnv1a(tok))
      (0 until 64).foreach(b => votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1))
    }
    (0 until 64).foldLeft(0L)((out, b) => if (votes(b) > 0) out | (1L << b) else out)
  }

  /** Hamming distance between two simhashes — bit_count(xor). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs via Hamming-LSH banding: the 64-bit
    * simhash splits into 8 byte-bands and candidates share at least one
    * band. DETERMINISTIC recall guarantee (pigeonhole): a pair within
    * `maxHamming ≤ 7` differing bits can spoil at most 7 of the 8 bands,
    * so every true pair is a candidate. Exact verify = bit_count(xor).
    * Shuffles carry (id, simhash, band, byte) — 4 small fixed-width
    * columns, never documents; bucket space is 8 × 2^8 with real corpora
    * spreading across byte values (raise to 16-bit bands via `bandBits`
    * for billion-doc corpora).
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3, bandBits: Int = 8): DataFrame = {
    require(64 % bandBits == 0, "bandBits must divide 64")
    val bands = 64 / bandBits
    require(maxHamming < bands, s"pigeonhole needs maxHamming < $bands bands")
    val mask = (1L << bandBits) - 1
    // single projection computes the simhash ONCE per row (the former
    // self-join planned both sides as independent scans, and the join-key
    // isnotnull constraint re-evaluated simhash64 below the projection —
    // 2× per scan side, r7 before-plan Filter(2)/Project(3)); a null hash
    // (null text) generates no band rows, matching the join's null-key drop
    val s = df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("id"),
        graft.functions.SimHash64Expr.simhash64(col(textCol)).as("h"))
    val banded = s.select(col("id"), col("h"),
      posexplode(when(col("h").isNotNull, array((0 until bands).map(b =>
        call_function("shiftright", col("h"), lit(b * bandBits)).bitwiseAND(lit(mask))): _*))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bval"))
    // The pair stage stays a codegen'd self-join here (unlike
    // minhashNearDups' bucket-group expansion): simhash bands are only
    // `bandBits` wide, so buckets are DENSE (corpus/2^bandBits docs each)
    // and an interpreted in-bucket pair expansion loses badly to the hash
    // join (measured 4× worse on the r7 fixture). The cache makes the
    // corpus scan + simhash run once for both join sides. The hamming
    // filter runs BEFORE the distinct, so the dedup shuffle carries only
    // true near-pairs (≤ maxHamming) instead of every bucket collision —
    // filter-then-distinct ≡ distinct-then-filter for a deterministic
    // row-local predicate.
    val b = banded.cache()
    b.alias("l")
      .join(b.alias("r"),
        col("l.band") === col("r.band") && col("l.bval") === col("r.bval") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        hamming(col("l.h"), col("r.h")).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .select("a", "b", "hamming")
  }
}
