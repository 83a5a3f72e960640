package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>), pure Catalyst
  * expressions (`zip_with` + `aggregate` dot products — codegen'd, no UDF).
  *
  * Two paths:
  *  - brute-force top-k: broadcast the (small) query set against the corpus;
  *    one pass, no shuffle of the corpus, O(Q×N) dots distributed over
  *    corpus partitions — the correctness baseline;
  *  - IVF (inverted-file) top-k: k-means-less variant with deterministic
  *    seed centroids; corpus is pre-assigned to cells (narrow map), the
  *    query probes only `nprobe` nearest cells — at 100 TB the probe reads
  *    cells/nprobe of the data instead of all of it, and cell assignment
  *    is a partition key so the scan prunes.
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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

  /** Deterministic IVF cells: centroids = the first `numCells` corpus
    * vectors by id (a stand-in for k-means — deterministic, seedless).
    * Returns corpus + `cell` column.
    */
  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
                  numCells: Int): DataFrame = {
    val centroids = corpus.orderBy(col(idCol).asc).limit(numCells)
      .select(col(idCol), col(vecCol)).collect()
      .map(r => (r.get(0), r.getSeq[Float](1)))
    val centroidArr = array(centroids.zipWithIndex.map { case ((_, v), i) =>
      struct(lit(i).as("cell"), array(v.map(lit): _*).cast("array<float>").as("cv"))
    }: _*)
    corpus.withColumn("__cands", centroidArr)
      .withColumn("cell",
        aggregate(col("__cands"),
          struct(lit(-1).as("cell"), lit(Double.MinValue).as("best")),
          (acc, cand) => {
            val s = cosine(cand.getField("cv"), col(vecCol))
            when(s > acc.getField("best"),
              struct(cand.getField("cell").as("cell"), s.as("best")))
              .otherwise(acc)
          }).getField("cell"))
      .drop("__cands")
  }

  /** IVF top-k: probe only the query's own cell (+ next-nearest cells when
    * nprobe > 1). Approximate; recall grows with nprobe.
    */
  def ivfTopK(corpusWithCells: DataFrame, queriesWithCells: DataFrame,
              idCol: String, vecCol: String, k: Int, nprobe: Int = 1): DataFrame = {
    val q = queriesWithCells.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"), col("cell").as("qcell"))
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
    val s = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val banded = s.select(col("id"),
      posexplode(graft.functions.CosineSketchExpr.sketch(col("v"), bands, bitsPerBand)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bhash"))
    val candidates = banded.alias("l")
      .join(banded.alias("r"),
        col("l.band") === col("r.band") && col("l.bhash") === col("r.bhash") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()
    candidates
      .join(s.select(col("id").as("a"), col("v").as("va")), Seq("a"))
      .join(s.select(col("id").as("b"), col("v").as("vb")), Seq("b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }
}
