package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic checks for the operators the driver can only rows-only-check:
  * planted near-duplicates must be found (and unrelated docs must not),
  * IVF must agree with brute force on easy queries, multimodal features
  * must be the deterministic function of the bytes.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"

  test("minhash LSH finds planted near-duplicates and skips unrelated docs") {
    val docs = Seq(
      (0L, base),
      (1L, base.replace("delta", "changed")),          // ~85% shingle overlap
      (2L, base),                                      // exact duplicate of 0
      (3L, (1 to 20).map(i => s"word$i").mkString(" ")), // unrelated
      (4L, (1 to 20).map(i => s"token$i").mkString(" ")), // unrelated
    ).toDF("doc_id", "text")
    val pairs = TextOps.minhashNearDups(docs, "doc_id", "text",
        k = 3, numHashes = 32, bands = 4, jaccardThreshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L)), s"exact dup must be found: $pairs")
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L)),
      s"near dup must be found: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L),
      s"unrelated docs must not pair: $pairs")
  }

  test("connected components: chains collapse to one cluster, min id canonical") {
    import graft.ops.GraphOps
    // chain 1-2-3-4 (transitive), pair (10,11), singleton 99 via dedupByPairs
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val comps = GraphOps.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L),
      s"got $comps")
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("doc_id")
    val dedup = GraphOps.dedupByPairs(docs, pairs, "doc_id")
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(dedup.filter(_._2).keySet == Set(1L, 10L, 99L), s"survivors: $dedup")
  }

  test("connected components: 200-node chain converges logarithmically; exhaustion throws") {
    import graft.ops.GraphOps
    // worst-case topology for label propagation: one chain, diameter 199
    // (template-drift near-dup clusters look like this: A≈B≈C≈…)
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    // pointer jumping ⇒ ~log2(199)+2 ≈ 10 rounds; 12 gives slack while still
    // proving the fix (plain propagation needs 199 and used to return split
    // labels silently)
    val comps = GraphOps.connectedComponents(chain, maxIter = 12)
      .as[(Long, Long)].collect().toMap
    assert(comps.size == 200 && comps.values.forall(_ == 0L),
      s"chain must collapse to component 0: ${comps.filter(_._2 != 0L)}")
    // too few rounds must THROW, not silently return split components
    val ex = intercept[IllegalStateException] {
      GraphOps.connectedComponents(chain, maxIter = 3).count()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("simhash Hamming-LSH join finds planted near-dups (pigeonhole recall)") {
    val docs = Seq(
      (0L, base),
      (1L, base.replace("delta", "changed")), // near-dup of 0
      (2L, base),                             // exact dup of 0
      (3L, (1 to 20).map(i => s"unrelated$i").mkString(" ")),
    ).toDF("doc_id", "text")
    val pairs = TextOps.simhashNearDups(docs, "doc_id", "text", maxHamming = 8 - 1)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L)), s"exact dup (hamming 0) must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc must not pair: $pairs")
    // exact dup hamming is 0
    val h = TextOps.simhashNearDups(docs, "doc_id", "text", maxHamming = 7)
      .filter($"a" === 0L && $"b" === 2L).select("hamming").as[Int].collect()
    assert(h.toSeq == Seq(0))
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    val h = Seq(base, base.replace("delta", "changed"),
        (1 to 20).map(i => s"word$i").mkString(" "))
      .toDF("t").select(graft.functions.SimHash64Expr.simhash64($"t"))
      .as[Long].collect()
    val near = java.lang.Long.bitCount(h(0) ^ h(1))
    val far = java.lang.Long.bitCount(h(0) ^ h(2))
    assert(near < far, s"near=$near far=$far")
  }

  test("IVF top-k precision: every hit is a genuine brute-force neighbor") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = VectorOps.trainIvf(emb, "vec_id", "embedding", numCells = 4)
    val cells = VectorOps.assignCells(emb, "vec_id", "embedding", model)
    val queries = emb.filter($"vec_id" < 2)
    val ivf = VectorOps.ivfTopK(cells, queries, "vec_id", "embedding", model, k = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val brute = VectorOps.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 50)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    val bruteMap = brute.map(r => (r._1, r._2) -> r._3).toMap
    assert(ivf.nonEmpty)
    ivf.foreach { case (q, n, _) =>
      assert(bruteMap.contains((q, n)), s"IVF produced non-neighbor ($q,$n)")
    }
  }

  test("IVF recall ≥ 0.9 vs brute force on planted clusters") {
    // 8 well-separated unit centers (from orthogonal-ish seeds), 40 points
    // each with small deterministic noise — k-means must find the clusters
    // and nprobe=2 must recover ≥90% of true top-10 neighbors
    def lcg(seed: Long): Iterator[Double] = Iterator.iterate(
      seed * 6364136223846793005L + 1442695040888963407L)(
      s => s * 6364136223846793005L + 1442695040888963407L)
      .map(s => (s >>> 11).toDouble / (1L << 53).toDouble)
    val dim = 32
    val centers = (0 until 8).map { c =>
      val r = lcg(c + 1)
      Array.fill(dim)((r.next() - 0.5).toFloat)
    }
    val points = (0 until 8).flatMap { c =>
      val r = lcg(1000 + c)
      (0 until 40).map { i =>
        val v = centers(c).zipWithIndex.map { case (x, _) =>
          (x + (r.next() - 0.5) * 0.05).toFloat }
        (c * 1000L + i, v.toSeq)
      }
    }
    val corpus = points.toDF("vec_id", "embedding")
    val model = VectorOps.trainIvf(corpus, "vec_id", "embedding", numCells = 8,
      sampleSize = 320)
    val cells = VectorOps.assignCells(corpus, "vec_id", "embedding", model)
    val queries = corpus.filter($"vec_id".isin(0L, 1000L, 2000L, 3000L))
    val k = 10
    val ivf = VectorOps.ivfTopK(cells, queries, "vec_id", "embedding", model,
        k = k, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = VectorOps.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.9, f"IVF recall $recall%.3f < 0.9")
  }

  test("PQ top-k recall ≥ 0.8 vs brute force on planted clusters") {
    def lcg(seed: Long): Iterator[Double] = Iterator.iterate(
      seed * 6364136223846793005L + 1442695040888963407L)(
      s => s * 6364136223846793005L + 1442695040888963407L)
      .map(s => (s >>> 11).toDouble / (1L << 53).toDouble)
    val dim = 32
    val centers = (0 until 8).map { c =>
      val r = lcg(c + 1); Array.fill(dim)((r.next() - 0.5).toFloat)
    }
    val points = (0 until 8).flatMap { c =>
      val r = lcg(1000 + c)
      (0 until 40).map { i =>
        (c * 1000L + i, centers(c).map(x => (x + (r.next() - 0.5) * 0.05).toFloat).toSeq)
      }
    }
    val corpus = points.toDF("vec_id", "embedding")
    val model = VectorOps.trainPq(corpus, "vec_id", "embedding", m = 8, sampleSize = 320)
    val enc = VectorOps.pqEncode(corpus, "embedding", model)
    val queries = corpus.filter($"vec_id".isin(0L, 1000L, 2000L, 3000L))
    val k = 10
    val pq = VectorOps.pqTopK(enc, queries, "vec_id", "embedding", model, k = k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = VectorOps.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = k)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.count(pq.contains).toDouble / brute.size
    assert(recall >= 0.8, f"PQ recall $recall%.3f < 0.8")
  }

  test("trainIvf / trainPq are replay-deterministic (bit-identical retrain)") {
    // The property the retired e02/e04 VALUES pins actually guarded for the
    // CDC engine: the seeded models must be a pure function of the corpus —
    // no wall-clock/random/partition-order dependence — so replaying a
    // pipeline retrains the exact same model.
    def lcg(seed: Long): Iterator[Double] = Iterator.iterate(
      seed * 6364136223846793005L + 1442695040888963407L)(
      s => s * 6364136223846793005L + 1442695040888963407L)
      .map(s => (s >>> 11).toDouble / (1L << 53).toDouble)
    val points = (0 until 200).map { i =>
      val r = lcg(i + 7)
      (i.toLong, Seq.fill(32)((r.next() - 0.5).toFloat))
    }
    val corpus1 = points.toDF("vec_id", "embedding")
    val corpus2 = points.reverse.toDF("vec_id", "embedding").repartition(7)
    val ivf1 = VectorOps.trainIvf(corpus1, "vec_id", "embedding", numCells = 8, sampleSize = 150)
    val ivf2 = VectorOps.trainIvf(corpus2, "vec_id", "embedding", numCells = 8, sampleSize = 150)
    assert(ivf1.centroids.map(_.toSeq).toSeq == ivf2.centroids.map(_.toSeq).toSeq,
      "IVF centroids must be bit-identical across retrains/partitionings")
    val pq1 = VectorOps.trainPq(corpus1, "vec_id", "embedding", m = 8, sampleSize = 150)
    val pq2 = VectorOps.trainPq(corpus2, "vec_id", "embedding", m = 8, sampleSize = 150)
    assert(pq1.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      pq2.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "PQ codebooks must be bit-identical across retrains/partitionings")
  }

  test("closed-form models (ivfModelFromIds / pqModelFromIds) match their spec") {
    // The r6 driver queries e02/e04 run inference under models an external
    // system can recompute: cells = normalized rows, codes = raw subvectors.
    def lcg2(seed: Long): Iterator[Double] = Iterator.iterate(
      seed * 6364136223846793005L + 1442695040888963407L)(
      s => s * 6364136223846793005L + 1442695040888963407L)
      .map(s => (s >>> 11).toDouble / (1L << 53).toDouble)
    val points = (0 until 20).map { i =>
      val r = lcg2(i + 3)
      (i.toLong, Seq.fill(16)((r.next() - 0.5).toFloat))
    }
    val corpus = points.toDF("vec_id", "embedding")
    val ivf = VectorOps.ivfModelFromIds(corpus, "vec_id", "embedding", Seq(2L, 5L))
    assert(ivf.numCells == 2)
    ivf.centroids.zip(Seq(2, 5)).foreach { case (c, id) =>
      val raw = points(id)._2
      val inv = 1.0 / math.sqrt(raw.map(x => x.toDouble * x).sum)
      assert(c.toSeq == raw.map(x => (x * inv).toFloat),
        s"cell for id $id must be the normalized row")
    }
    val pq = VectorOps.pqModelFromIds(corpus, "vec_id", "embedding", Seq(0L, 1L, 2L), m = 4)
    assert(pq.m == 4 && pq.dsub == 4)
    assert(pq.codebooks(1)(2).toSeq == points(2)._2.slice(4, 8),
      "code 2 of subspace 1 must be subvector 1 of row 2")
  }

  test("cosineNearDups finds planted near-identical vectors and skips the rest") {
    // 40 quasi-random base vectors (deterministic LCG), plus near-duplicates
    // of the first 5 (one coordinate nudged) — pairs (i, 1000+i) must be
    // found, and nothing else: random 16-dim vectors are far from cosine 0.95
    def vec(seed: Long): Seq[Float] = {
      var s = seed * 6364136223846793005L + 1442695040888963407L
      (0 until 16).map { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 33).toFloat / (1L << 31).toFloat) - 0.5f
      }
    }
    val bases = (0L until 40L).map(i => (i, vec(i)))
    val planted = (0L until 5L).map(i => (1000L + i, vec(i).updated(0, vec(i)(0) + 0.02f)))
    val corpus = (bases ++ planted).toDF("vec_id", "embedding")
    val pairs = VectorOps.cosineNearDups(corpus, "vec_id", "embedding", threshold = 0.95)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == (0L until 5L).map(i => (i, 1000L + i)).toSet, s"got $pairs")
  }

  test("cosine sketch: near-identical vectors share every band; codegen = interpreted") {
    import graft.functions.CosineSketchExpr
    val a = (0 until 32).map(i => math.sin(i * 1.7).toFloat)
    val b = a.updated(3, a(3) + 0.01f)
    val c = (0 until 32).map(i => math.cos(i * 2.3).toFloat)
    val df = Seq(Tuple1(a), Tuple1(b), Tuple1(c)).toDF("v")
    val rows = df.select(CosineSketchExpr.sketch($"v", 8, 16)).as[Seq[Long]].collect()
    assert(rows(0) == rows(1), "near-identical vectors must share all bands")
    assert(rows(0) != rows(2), "unrelated vectors must differ somewhere")
    // interpreted eval (nullSafeEval) agrees with the codegen'd path
    graft.functions.GraftFunctions.register(spark)
    val viaSql = df.selectExpr("graft_cosine_sketch(v, 8, 16)").as[Seq[Long]].collect()
    assert(viaSql.toSeq == rows.toSeq)
  }

  test("cosine of identical vectors is 1; orthogonal is 0") {
    val df = Seq(
      (Seq(1f, 0f, 0f), Seq(1f, 0f, 0f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
    ).toDF("a", "b")
    val sims = df.select(VectorOps.cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(sims(0) - 1.0) < 1e-9)
    assert(math.abs(sims(1)) < 1e-9)
  }

  test("native cosine is bit-identical to the HOF formulation on the fixture") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.select($"vec_id".as("i"), $"embedding".as("a"))
      .join(emb.select($"vec_id".as("j"), $"embedding".as("b")),
        $"i" < $"j" && $"j" < 40)
    val diff = pairs.select(
        VectorOps.cosine($"a", $"b").as("nat"),
        VectorOps.cosineRef($"a", $"b").as("hof"))
      .filter($"nat" =!= $"hof") // exact equality — same float op order
    assert(diff.isEmpty, s"divergent: ${diff.take(3).mkString}")
    // null poisoning parity: length mismatch → null both ways
    val odd = Seq((Seq(1f, 2f), Seq(1f, 2f, 3f))).toDF("a", "b")
    val r = odd.select(VectorOps.cosine($"a", $"b"),
      VectorOps.cosineRef($"a", $"b")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("winnowing fingerprints satisfy the shared-substring guarantee") {
    import graft.functions.WinnowExpr
    // any shared substring of ≥ w+k−1 = 8 chars must share a fingerprint
    val common = "a very distinctive shared passage of text"
    val docs = Seq(
      (1L, s"prefix one $common and a different tail"),
      (2L, s"$common with another ending entirely"),
      (3L, "totally unrelated content with nothing in common at all"),
    ).toDF("doc_id", "text")
    val fps = docs.select($"doc_id", WinnowExpr.winnow($"text", 5, 4).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert((fps(1L).toSet intersect fps(2L).toSet).nonEmpty,
      "shared passage must share a fingerprint")
    assert((fps(1L).toSet intersect fps(3L).toSet).isEmpty,
      "unrelated docs should not collide on this fixture")
    // arrays are sorted, distinct, and deterministic
    assert(fps(1L) == fps(1L).distinct.sorted)
    // short texts (< k+w−1 code points) fingerprint to empty, not error
    val short = Seq((9L, "abcdefg")).toDF("doc_id", "text")
      .select(WinnowExpr.winnow($"text", 5, 4)).as[Seq[Long]].collect().head
    assert(short.isEmpty)
    // SQL registration + interpreted path agree with codegen
    graft.functions.GraftFunctions.register(spark)
    val viaSql = docs.selectExpr("doc_id", "graft_winnow(text, 5, 4) AS fps")
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaSql == fps)
  }

  test("multimodal features are the deterministic function of the bytes") {
    // the null payload must take the zero row, not NPE the task — same
    // contract as the real decoders
    val nullRow = MultimodalOps.extractFeatures(
      Seq((9L, null: Array[Byte])).toDF("doc_id", "payload"),
      "doc_id", "payload").collect().head
    assert(nullRow.getAs[Long]("n_bytes") == 0L &&
      nullRow.getAs[Long]("n_frames") == 0L)
    val docs = Seq((1L, "abcd" * 600)).toDF("doc_id", "text") // 2400 bytes
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val row = MultimodalOps.extractFeatures(docs, "doc_id", "payload").collect().head
    assert(row.getAs[Long]("n_bytes") == 2400L)
    assert(row.getAs[Long]("n_frames") == 3L) // ceil(2400/1024)
    val expectedMean = ("abcd".map(_.toInt).sum * 600L) / 2400L
    assert(row.getAs[Long]("mean_byte") == expectedMean)
    val feat = row.getSeq[Float](row.fieldIndex("feature"))
    assert(feat.length == 8)
    assert(math.abs(feat.sum - 1.0f) < 1e-5, "histogram must sum to 1")
  }

  test("imageio decode round-trips deterministic PNGs to exact pixel sums") {
    val ids = Seq(0L, 5L, 13L, 64L).toDF("doc_id")
    val got = MultimodalOps.decodeImages(
        MultimodalOps.renderTestImages(ids, "doc_id"), "doc_id", "payload")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (d <- Seq(0L, 5L, 13L, 64L)) {
      val w = (8 + d % 5).toInt
      val h = (6 + d % 7).toInt
      // closed-form oracle, recomputed independently of the codec
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sr += (31 * d + 7 * x + 13 * y) % 256
        sg += (17 * d + 5 * x + 3 * y) % 256
        sb += (7 * d + 11 * x + 2 * y) % 256
      }
      val r = got(d)
      assert(r.getAs[String]("format") == "png")
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("channels") == 3)
      assert(r.getSeq[Long](r.fieldIndex("chan_sum")) == Seq(sr, sg, sb),
        s"doc $d pixel sums diverge from the closed form")
      assert(r.getAs[Long]("n_bytes") > 0)
    }
  }

  test("imageio decode handles JPEG and never throws on unknown payloads") {
    // JPEG: lossy, so only the container/dims/channel-count are pinned
    val img = new java.awt.image.BufferedImage(9, 7,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val rows = Seq(
      (1L, out.toByteArray),
      (2L, "not an image at all".getBytes("UTF-8")),
      (3L, Array.emptyByteArray),
      // PNG magic but truncated body — the corrupt-payload fallback
      (4L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)),
      (5L, null: Array[Byte]), // NULL payload — must not NPE the task
    ).toDF("doc_id", "payload")
    val got = MultimodalOps.decodeImages(rows, "doc_id", "payload")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[String]("format") == "jpeg")
    assert(got(1L).getAs[Int]("width") == 9 && got(1L).getAs[Int]("height") == 7)
    assert(got(1L).getAs[Int]("channels") == 3)
    assert(got(2L).getAs[String]("format") == "unknown")
    assert(got(2L).getAs[Int]("width") == -1)
    assert(got(2L).getAs[Long]("n_bytes") == 19L)
    assert(got(3L).getAs[String]("format") == "unknown")
    assert(got(4L).getAs[String]("format") == "unknown",
      "corrupt PNG must fall back, not throw")
    assert(got(5L).getAs[String]("format") == "unknown" &&
      got(5L).getAs[Long]("n_bytes") == 0L,
      "null payload must take the fallback row")
  }

  test("sampled audio decode round-trips deterministic WAVs to exact sums") {
    val ids = Seq(0L, 1L, 7L, 33L, 64L).toDF("doc_id")
    val got = MultimodalOps.decodeAudio(
        MultimodalOps.renderTestWavs(ids, "doc_id"), "doc_id", "payload")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (d <- Seq(0L, 1L, 7L, 33L, 64L)) {
      val ch = (1 + d % 2).toInt
      val n = (64 + d % 33).toInt
      // closed-form oracle, recomputed independently of the codec
      val sums = Array.tabulate(ch)(c =>
        (0 until n).map(i => MultimodalOps.testWavSample(d, i, c).toLong).sum)
      val r = got(d)
      assert(r.getAs[String]("format") == "wav")
      assert(r.getAs[Int]("channels") == ch)
      assert(r.getAs[Int]("sample_rate") == 8000)
      assert(r.getAs[Long]("n_frames") == n.toLong)
      assert(r.getSeq[Long](r.fieldIndex("chan_sum")) == sums.toSeq,
        s"doc $d sample sums diverge from the closed form")
      assert(r.getAs[Long]("n_bytes") > (n * ch * 2).toLong) // payload + header
    }
  }

  test("audio decode handles 8-bit PCM and never throws on bad payloads") {
    // 8-bit unsigned PCM: a different sample layout through the same reader
    val pcm8 = Array.tabulate(40)(i => ((i * 37 + 11) % 256).toByte)
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm8), fmt8, 40L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val rows = Seq(
      (1L, out.toByteArray),
      (2L, "definitely not audio".getBytes("UTF-8")),
      // RIFF/WAVE magic but a truncated body — the corrupt-payload fallback
      (3L, "RIFF    WAVE".getBytes("ISO-8859-1")),
      (4L, null: Array[Byte]),
    ).toDF("doc_id", "payload")
    // ULAW: reports bits=8 through the same reader, but its code bytes are
    // NOT linear PCM — must take the fallback, never be summed as samples
    val ulawOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm8),
        new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false),
        40L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, ulawOut)
    val rows2 = rows.unionByName(Seq((5L, ulawOut.toByteArray)).toDF("doc_id", "payload"))
    val got = MultimodalOps.decodeAudio(rows2, "doc_id", "payload")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[String]("format") == "wav")
    assert(got(1L).getAs[Int]("channels") == 1)
    assert(got(1L).getAs[Long]("n_frames") == 40L)
    assert(got(1L).getSeq[Long](got(1L).fieldIndex("chan_sum")) ==
      Seq(pcm8.map(b => (b & 0xff).toLong).sum))
    assert(got(2L).getAs[String]("format") == "unknown" &&
      got(2L).getAs[Int]("channels") == -1)
    assert(got(3L).getAs[String]("format") == "unknown",
      "corrupt WAV must fall back, not throw")
    assert(got(4L).getAs[String]("format") == "unknown" &&
      got(4L).getAs[Long]("n_bytes") == 0L)
    assert(got(5L).getAs[String]("format") == "unknown",
      "non-PCM (ULAW) WAV must fall back, not sum code bytes as PCM")
  }

  test("language marker hits drive the guess; no hits → und") {
    val rows = Seq(
      "the cat and the dog in a house",   // en markers
      "der hund und die katze ist nicht", // de markers
      "xyzzy plugh qwerty",               // nothing
    ).toDF("t").select(TextOps.langGuess($"t")).as[String].collect()
    assert(rows(0) == "en")
    assert(rows(1) == "de")
    assert(rows(2) == "und")
  }

  test("native langid equals the HOF formulation on fixture + edge cases") {
    import graft.functions.LangIdExpr
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .unionByName(Seq(
        "", " ", "  the  ", "THE AND OF", "la de est les", "el la de que",
        "的 是 了", "the the the the", "der the le el 的",
        "nicht nicht ist und das die der",
      ).toDF("text"))
    val diff = docs
      .select(TextOps.langGuess($"text").as("hof"), LangIdExpr.langid($"text").as("nat"))
      .filter($"hof" =!= $"nat")
    assert(diff.isEmpty, s"divergent rows: ${diff.collect().mkString(", ")}")
    // the SQL-registered function resolves too
    graft.functions.GraftFunctions.register(spark)
    val one = Seq("der hund und die katze ist nicht").toDF("text")
      .selectExpr("graft_langid(text)").as[String].collect().head
    assert(one == "de")
  }

  test("native minhash signature is bit-identical to the explode+agg formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
      .unionByName(Seq(
        (9001L, "one two three four five"),
        (9002L, "a b"),                     // < k tokens → no signature
        (9003L, "x  y z"),                  // empty token from double space
        (9004L, "solo tok tok tok"),        // duplicate shingles
        (9005L, "的 是 了 在 我"),
      ).toDF("doc_id", "text"))
    val nat = docs.select($"doc_id",
      graft.functions.MinHashSigExpr.minhashSig($"text", 3, 32).as("sig"))
      .filter($"sig".isNotNull)
    val ref = TextOps.minhashSigsRef(docs, "doc_id", "text", k = 3, numHashes = 32)
    val joined = nat.alias("n").join(ref.alias("r"), Seq("doc_id"), "full_outer")
      .select($"doc_id", $"n.sig".as("ns"), $"r.sig".as("rs"))
    val diff = joined.filter($"ns".isNull || $"rs".isNull || $"ns" =!= $"rs")
    assert(diff.isEmpty, s"divergent: ${diff.take(3).mkString(", ")}")
    // the <k-token doc must be absent from BOTH
    assert(joined.filter($"doc_id" === 9002L).isEmpty)
  }

  test("fused quality stats equal the relational formulation on fixture + edge cases") {
    val fields = graft.functions.QualityStatsExpr.fieldNames
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .unionByName(Seq(
        "", " ", "   ", "the", "THE", "The And OF", "a", "A",
        "abc123 !!! x9", "的是了 the 在", "word, and. with; on!",
        "multibytechars 的的的", "tab\tis not a space", "trailing space ",
        " leading", "double  space", "1234567890", "éclair café the",
        "supercalifragilistic the on expialidocious",
      ).toDF("text"))
    val nat = TextOps.qualityFeatures(docs, "text")
      .select(fields.map(f => col(f).cast("long").as(f)): _*)
    val ref = TextOps.qualityFeaturesRef(docs, "text")
      .select(fields.map(f => col(f).cast("long").as(f)): _*)
    val diff = nat.exceptAll(ref).unionByName(ref.exceptAll(nat))
    assert(diff.isEmpty, s"divergent rows: ${diff.take(5).mkString(", ")}")
  }
}
