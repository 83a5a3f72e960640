package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>) — no UDFs,
  * native codegen'd expressions in every hot loop (CosineSimExpr,
  * NearestCellsExpr, PqEncodeExpr/AdcLookupExpr, CosineSketchExpr).
  *
  * Four paths, by scale regime:
  *  - brute-force top-k: broadcast the (small) query set against the corpus;
  *    one pass, no shuffle of the corpus, O(Q×N) fused cosines — the
  *    correctness baseline (exactly oracle-able);
  *  - IVF top-k: deterministic spherical k-means cells; queries probe only
  *    `nprobe` cells — at 100 TB the probe reads nprobe/numCells of the
  *    data, and cell is a pruning/partition key;
  *  - PQ top-k: 32× compressed codes + ADC lookup scoring — the
  *    memory-bound regime where raw vectors no longer fit cluster RAM;
  *  - cosine near-dup pairs: banded sign-sketch LSH with id-only candidate
  *    shuffles and exact fused-cosine verification.
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Reference (composed-functions) formulation — interpreted HOFs; kept as
    * the parity baseline for the native expression.
    */
  def cosineRef(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine similarity — native fused expression (one pass, codegen'd);
    * bit-compatible with cosineRef (see CosineSimExpr).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimExpr.cosineSim(a, b)

  /** Brute-force cosine top-k. `queries` must be small (broadcast side). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** IVF coarse quantizer: unit-norm centroids from deterministic spherical
    * k-means (k-means++ seeding + Lloyd iterations) over a bounded,
    * hash-chosen sample — the driver-side cost is O(sample · cells · iters)
    * floats regardless of corpus size, and the result is replay-stable (no
    * wall-clock randomness anywhere).
    */
  final case class IvfModel(centroids: Array[Array[Float]]) {
    def numCells: Int = centroids.length
  }

  def trainIvf(corpus: DataFrame, idCol: String, vecCol: String, numCells: Int,
               sampleSize: Int = 4096, iters: Int = 8): IvfModel = {
    val sample = deterministicSample(corpus, idCol, vecCol, sampleSize)
      .map(normalize).filter(_ != null)
    require(sample.nonEmpty, "trainIvf: empty corpus")
    IvfModel(kmeans(sample, math.min(numCells, sample.length), iters, spherical = true))
  }

  /** Closed-form coarse quantizer: cell c = the unit-normalized embedding of
    * row `ids(c)` — no training loop, so an external system (the driver's
    * DuckDB oracle) can recompute the ENTIRE IVF inference path from the raw
    * table. Production indexes use [[trainIvf]] (recall asserted in OpsSpec);
    * the inference code under test — assignCells/ivfTopK/NearestCellsExpr —
    * is identical under either model.
    */
  def ivfModelFromIds(corpus: DataFrame, idCol: String, vecCol: String,
                      ids: Seq[Long]): IvfModel = {
    val byId = fetchVectors(corpus, idCol, vecCol, ids)
    IvfModel(ids.toArray.map { id =>
      val n = normalize(byId(id))
      require(n != null, s"ivfModelFromIds: zero vector at id $id")
      n
    })
  }

  /** Closed-form PQ codebooks: code c of subspace j = the j-th subvector of
    * row `ids(c)` — same rationale as [[ivfModelFromIds]]: the driver oracle
    * recomputes encode + ADC scoring relationally; [[trainPq]] (k-means
    * codebooks, recall-asserted) remains the production path.
    */
  def pqModelFromIds(corpus: DataFrame, idCol: String, vecCol: String,
                     ids: Seq[Long], m: Int): PqModel = {
    val byId = fetchVectors(corpus, idCol, vecCol, ids)
    val dim = byId(ids.head).length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dsub = dim / m
    val books = (0 until m).map { j =>
      ids.toArray.map(id =>
        java.util.Arrays.copyOfRange(byId(id), j * dsub, (j + 1) * dsub))
    }.toArray
    PqModel(books)
  }

  /** Bounded metadata fetch (|ids| rows) for the closed-form models. */
  private def fetchVectors(corpus: DataFrame, idCol: String, vecCol: String,
                           ids: Seq[Long]): Map[Long, Array[Float]] = {
    val byId = corpus
      .filter(col(idCol).cast("long").isin(ids: _*))
      .select(col(idCol).cast("long"), col(vecCol))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    ids.foreach(id => require(byId.contains(id), s"model id $id not in corpus"))
    byId
  }

  /** Deterministic uniform sample: the sampleSize lowest xxhash64(id) rows. */
  private def deterministicSample(corpus: DataFrame, idCol: String,
                                  vecCol: String, sampleSize: Int): Array[Array[Float]] =
    corpus.select(col(vecCol).as("v"), xxhash64(col(idCol)).as("h"))
      .orderBy(col("h").asc).limit(sampleSize)
      .select("v").collect()
      .map(_.getSeq[Float](0).toArray)

  /** Deterministic k-means: k-means++ seeding by an LCG (the spec forbids
    * wall-clock/java.util.Random seeds) + Lloyd iterations. `spherical`
    * renormalizes recentered means (cosine clustering); empty cells keep
    * their previous centroid.
    */
  private def kmeans(sample: Array[Array[Float]], k: Int, iters: Int,
                     spherical: Boolean): Array[Array[Float]] = {
    var rng = 0x5DEECE66DL
    def nextDouble(): Double = {
      rng = rng * 6364136223846793005L + 1442695040888963407L
      (rng >>> 11).toDouble / (1L << 53).toDouble
    }
    def dist2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val centers = new Array[Array[Float]](k)
    centers(0) = sample((nextDouble() * sample.length).toInt)
    val d2 = sample.map(dist2(_, centers(0)))
    var ci = 1
    while (ci < k) {
      val total = d2.sum
      var pick = nextDouble() * total
      var idx = 0
      while (idx < sample.length - 1 && pick > d2(idx)) { pick -= d2(idx); idx += 1 }
      centers(ci) = sample(idx)
      var i = 0
      while (i < sample.length) {
        val d = dist2(sample(i), centers(ci))
        if (d < d2(i)) d2(i) = d
        i += 1
      }
      ci += 1
    }
    val dim = sample.head.length
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { p =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          val d = dist2(p, centers(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          val m = new Array[Float](dim)
          var i = 0
          while (i < dim) { m(i) = (sums(c)(i) / counts(c)).toFloat; i += 1 }
          if (spherical) {
            val n = normalize(m)
            if (n != null) centers(c) = n
          } else centers(c) = m
        }
        c += 1
      }
    }
    centers
  }

  private def normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    if (s == 0.0) null
    else {
      val inv = 1.0 / math.sqrt(s)
      val out = new Array[Float](v.length)
      i = 0
      while (i < v.length) { out(i) = (v(i) * inv).toFloat; i += 1 }
      out
    }
  }

  /** Corpus + `cell` column: nearest centroid via the codegen'd
    * NearestCellsExpr (a narrow map — cell is then the partition/prune key).
    */
  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
                  model: IvfModel): DataFrame =
    corpus.withColumn("cell", element_at(
      graft.functions.NearestCellsExpr.nearestCells(col(vecCol), model.centroids, 1), 1))

  /** IVF top-k: each query probes its `nprobe` nearest cells — at scale the
    * scan reads nprobe/numCells of the corpus instead of all of it (cell is
    * a pruning key). Approximate; recall grows with nprobe (see the OpsSpec
    * recall assertion on planted clusters).
    */
  def ivfTopK(corpusWithCells: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, model: IvfModel,
              k: Int, nprobe: Int = 2): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qcell", explode(
        graft.functions.NearestCellsExpr.nearestCells(col("qv"), model.centroids, nprobe)))
    val c = corpusWithCells.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("cell"))
    val scored = c.join(broadcast(q),
        col("cell") === col("qcell") && col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Product quantization — the MEMORY-bound scale path: at 100 TB the raw
    * float vectors don't fit cluster RAM; PQ compresses each to `m` bytes
    * (32× at d=64, m=8) and queries score rows with m table lookups (ADC).
    * Codebooks come from deterministic per-subspace k-means on a bounded
    * hash-chosen sample; everything downstream is codegen'd expressions.
    */
  final case class PqModel(codebooks: Array[Array[Array[Float]]]) {
    def m: Int = codebooks.length
    def dsub: Int = codebooks(0)(0).length
  }

  def trainPq(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int = 8, codes: Int = 256,
              sampleSize: Int = 4096, iters: Int = 8): PqModel = {
    val sample = deterministicSample(corpus, idCol, vecCol, sampleSize)
    require(sample.nonEmpty, "trainPq: empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dsub = dim / m
    val books = (0 until m).map { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      kmeans(sub, math.min(codes, sub.length), iters, spherical = false)
    }.toArray
    PqModel(books)
  }

  /** Corpus + `pq` codes column (binary, m bytes) — a narrow codegen'd map. */
  def pqEncode(corpus: DataFrame, vecCol: String, model: PqModel): DataFrame =
    corpus.withColumn("pq",
      graft.functions.PqEncodeExpr.pqEncode(col(vecCol), model.codebooks))

  /** Approximate cosine top-k over PQ codes (ADC): per query, a lookup
    * table of subspace dot products rides the broadcast join; per corpus
    * row the score is m lookups + a division by the reconstructed norm
    * (query-independent, also an ADC lookup). The raw vectors are never
    * read at query time.
    */
  def pqTopK(encodedCorpus: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, model: PqModel, k: Int): DataFrame = {
    val m = model.m
    val dsub = model.dsub
    // query-side LUTs are driver-built: Q × m × 256 subspace dots, double
    // accumulation (float32 products are exact in double, so an external
    // recomputation over the same float inputs reproduces these bits)
    val qRows = queries.select(col(idCol), col(vecCol)).collect().map { r =>
      val qid = r.get(0)
      val qv = r.getSeq[Float](1).toArray
      val lut = new Array[Double](m * 256)
      var j = 0
      while (j < m) {
        val cb = model.codebooks(j)
        var c = 0
        while (c < cb.length) {
          var s = 0.0
          var i = 0
          while (i < dsub) { s += qv(j * dsub + i).toDouble * cb(c)(i); i += 1 }
          lut(j * 256 + c) = s
          c += 1
        }
        j += 1
      }
      (qid, qv, lut.toSeq)
    }
    val spark = encodedCorpus.sparkSession
    import spark.implicits._
    val qDf = qRows.toSeq.map { case (qid, _, lut) => (qid.toString, lut) }
      .toDF("__qid_str", "__lut")
    val q = queries.select(col(idCol).as("query_id"))
      .withColumn("__qid_str", col("query_id").cast("string"))
      .join(broadcast(qDf), Seq("__qid_str")).drop("__qid_str")
    // |x̂|² lut is query-independent: norms of the codebook entries
    val normLut: Array[Double] = {
      val a = new Array[Double](m * 256)
      var j = 0
      while (j < m) {
        val cb = model.codebooks(j)
        var c = 0
        while (c < cb.length) {
          var s = 0.0
          var i = 0
          while (i < dsub) { s += cb(c)(i).toDouble * cb(c)(i); i += 1 }
          a(j * 256 + c) = s
          c += 1
        }
        j += 1
      }
      a
    }
    val scored = encodedCorpus.select(col(idCol).as("neighbor_id"), col("pq"))
      .withColumn("__xnorm",
        sqrt(graft.functions.AdcLookupExpr.adcLookup(col("pq"), lit(normLut))))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        graft.functions.AdcLookupExpr.adcLookup(col("pq"), col("__lut")) / col("__xnorm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold via
    * banded random-hyperplane LSH (the native `CosineSketchExpr`, codegen'd):
    * a pair is a candidate iff it agrees on every sign bit of some band —
    * the same AND-within-band / OR-over-bands amplification as the MinHash
    * path, so bucket cardinality is 2^bitsPerBand per band (not a fixed 256)
    * and grows with the corpus by raising bitsPerBand.
    *
    * Shuffle discipline (100 TB shape): the band self-join and the pair
    * dedup carry only (id, band, bandHash) / (a, b) — vectors are attached
    * AFTER the candidate pair space is deduped, and the exact cosine verify
    * runs only on candidates.
    */
  def cosineNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, bands: Int = 8, bitsPerBand: Int = 16): DataFrame = {
    // cached: consumed by the sketch pass AND both vector-attach joins —
    // without it the corpus subtree (for e03 a union with a derived-planted
    // arm) is scanned three times (r7); the cache also hands the planner
    // real sizes so the attach joins pick sides on facts. Lifetime is
    // caller-scoped (like `candidates` below — Spark offers no
    // unpersist-on-consume); at corpus scale MEMORY_AND_DISK degrades to a
    // disk-backed materialized intermediate, still one scan of the source
    // — drop the cache (re-scan per join) only if local disk is the
    // tighter resource
    val s = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .filter(col("id").isNotNull)
      .cache()
    val banded = s.select(col("id"),
      posexplode(graft.functions.CosineSketchExpr.sketch(col("v"), bands, bitsPerBand)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bhash"))
    // bucket-group pair expansion instead of a band self-join (r7, same
    // rationale as TextOps.minhashNearDups — shared helper): ONE pass
    // computes each sketch, ONE shuffle of (band, bhash, id);
    // 2^bitsPerBand keeps buckets sparse, so in-bucket expansion from the
    // sorted id list stays tiny.
    val candidates = TextOps.bandBucketPairs(banded, "id", "band", "bhash")
    candidates
      .join(s.select(col("id").as("a"), col("v").as("va")), Seq("a"))
      .join(s.select(col("id").as("b"), col("v").as("vb")), Seq("b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }
}
