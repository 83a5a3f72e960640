package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions — the "would this survive 100×" checks:
  * filters reach the parquet scan, projections prune the read schema, small
  * dims broadcast, the session fold is a single shuffle.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // use sparkPlan (pre-AQE): AdaptiveSparkPlanExec hides leaves until final
  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no file scan in plan"))

  test("q01: null-encoding projection prunes columns and pushes the IN filter") {
    val df = SparkEntry.queries("q01_scan_project")(spark, sf)
    val scan = scanOf(df)
    val read = scan.requiredSchema.fieldNames.toSet
    assert(read == Set("event_id", "user_id", "event_type", "value"),
      s"read schema should prune to used columns, got $read")
    assert(scan.metadata("PushedFilters").contains("In(event_type"),
      s"IN filter should push to parquet: ${scan.metadata("PushedFilters")}")
  }

  test("m03/m04: decode queries prune the documents scan to doc_id and push the range filter") {
    for (q <- Seq("m03_img_decode", "m04_audio_decode")) {
      val scan = scanOf(SparkEntry.queries(q)(spark, sf))
      val read = scan.requiredSchema.fieldNames.toSet
      assert(read == Set("doc_id"),
        s"$q should read ONLY doc_id (payloads are rendered, text never scanned), got $read")
      assert(scan.metadata("PushedFilters").contains("LessThan(doc_id,256)"),
        s"$q doc_id<256 should push to parquet: ${scan.metadata("PushedFilters")}")
    }
  }

  test("q02: range predicate pushes down to the scan") {
    val df = SparkEntry.queries("q02_filter_window")(spark, sf)
    val pushed = scanOf(df).metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(ts") && pushed.contains("LessThan(ts"),
      s"ts range should push down: $pushed")
  }

  test("q08: dimension chain uses broadcast joins, never sort-merge") {
    val plan = SparkEntry.queries("q08_dim_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q09: fact join prunes lineitem read schema to the 2 used columns") {
    val df = SparkEntry.queries("q09_fact_join")(spark, sf)
    val scans = df.queryExecution.sparkPlan.collectLeaves()
      .collect { case s: FileSourceScanExec => s }
    val lineitemScan = scans.find(_.requiredSchema.fieldNames.contains("l_orderkey"))
      .getOrElse(fail("no lineitem scan"))
    assert(lineitemScan.requiredSchema.fieldNames.toSet == Set("l_orderkey", "l_quantity"))
  }

  test("session classify plan: exactly one shuffle (the groupByKey)") {
    import spark.implicits._
    val cfg = graft.cdc.GenConfig(numConversations = 10)
    val events = graft.cdc.ChangeLogGen.generate(spark, cfg)
    val plan = graft.cdc.CdcPipeline.classify(events, 0L)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles in:\n$plan")
  }

  test("session classify shuffle carries SlimEvent rows — path/lang/op never cross the wire") {
    import spark.implicits._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val cfg = graft.cdc.GenConfig(numConversations = 10)
    val events = graft.cdc.ChangeLogGen.generate(spark, cfg)
    // exchanges are inserted by EnsureRequirements and AQE hides them until
    // execution — build this one plan with AQE off to inspect the exchange
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exchange = graft.cdc.CdcPipeline.classify(events, 0L)
        .queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }
      assert(exchange.size == 1)
      // what crosses the wire is the exchange child's output row
      val carried = exchange.head.child.output.map(_.name).toSet
      assert(!carried.exists(Set("path", "lang", "op")),
        s"classify shuffle must not carry unused event columns: $carried")
      assert(carried.exists(_.startsWith("content")), s"sanity: $carried")
    } finally spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
  }

  test("mi01: the ordered group-by reuses ONE shuffle for window + aggregate") {
    // exchanges are inserted by EnsureRequirements → inspect executedPlan
    val plan = SparkEntry.queries("mi01_mi_transfers")(spark, sf)
      .queryExecution.executedPlan.toString
    // one exchange builds the arrival-order seq (by user), ONE more feeds
    // both the conversation window and the aggregate — 3 would mean the
    // window and the group-by each shuffled
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 2,
      s"window and agg must share the conversation hash: $shuffles in\n$plan")
    assert(plan.contains("partial_"), "aggregation must have a map-side partial phase")
  }

  test("e03: candidate generation dedups on ids only; vectors attach after") {
    val plan = SparkEntry.queries("e03_cos_dups")(spark, sf)
      .queryExecution.sparkPlan.toString
    // the pair-dedup aggregate must run over bare (a, b) ids — if an
    // embedding column reached it, the shuffle would carry vectors
    val dedup = plan.linesIterator
      .find(l => l.contains("HashAggregate(keys=[a#") && l.contains("b#"))
      .getOrElse(fail(s"no pair-dedup aggregate in:\n$plan"))
    assert(!dedup.contains("embedding") && !dedup.contains(", v#"),
      s"pair dedup must not carry vectors: $dedup")
    // exact cosine verification exists (the join filter on the threshold)
    assert(plan.contains(">= 0.95"), "exact verify filter missing")
  }

  test("e02: IVF probes via broadcast and computes top-k partially before the shuffle") {
    val plan = SparkEntry.queries("e02_ann_ivf")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "query side must broadcast")
    assert(!plan.contains("SortMergeJoin"))
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"rank-limit must push a partial top-k below the shuffle:\n$plan")
  }

  test("key filters push through merge-on-read resolution to the parquet scan") {
    import spark.implicits._
    val day = 24L * 3600 * 1000000L
    val eng = new graft.cdc.CdcEngine(
      java.nio.file.Files.createTempDirectory("planspec-mor").toString,
      numBuckets = 4, cutoffMicros = 14 * day)
    val log = graft.cdc.ChangeLogGen.generate(spark,
      graft.cdc.GenConfig(numConversations = 30, epochs = 2))
    (0L to 1L).foreach(e => eng.applyEpoch(spark, log.filter(_.epoch == e), e))
    // multi-file buckets exist (two epochs) → the resolution window is live;
    // a point filter on the key must still reach the file scan
    val df = eng.currentTransfers(spark).filter(col("repo") === "repo-0000000001")
    val scans = df.queryExecution.sparkPlan.collectLeaves()
      .collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      val pushed = s.metadata("PushedFilters")
      assert(pushed.contains("EqualTo(repo"),
        s"key predicate must push below the resolution window: $pushed")
    }
  }

  test("whole-stage codegen covers the scan-side of q03 aggregation") {
    val df = SparkEntry.queries("q03_session_agg")(spark, sf)
    df.collect() // finalize the adaptive plan so codegen stages are visible
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("codegen id"), s"no codegen span in:\n$plan")
  }

  test("d02: the fused quality-stats struct is computed ONCE for all 8 fields") {
    // CollapseProject inlines the struct expression into every extracted
    // field at the logical level; whole-stage codegen's common-subexpression
    // elimination must collapse them back to a single compute() call per
    // row — otherwise the one-pass expression silently runs 8 passes
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.ops.TextOps.qualityFeatures(docs, "text")
      .select(graft.functions.QualityStatsExpr.fieldNames.map(col): _*)
    val code = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    val calls = "QualityStatsExpr\\.compute".r.findAllIn(code).length
    assert(calls == 1, s"expected exactly one compute() call site, got $calls")
  }

  test("partitionProbes invert HashPartitioning: pmod(murmur3(x,42),n) == index") {
    for (n <- Seq(1, 2, 3, 4, 8, 16, 32, 64, 100)) {
      val p = graft.cdc.CdcPipeline.partitionProbes(n)
      assert(p.size == n)
      p.zipWithIndex.foreach { case (x, b) =>
        assert(java.lang.Math.floorMod(
          org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(x, 42), n) == b,
          s"probe $x for bucket $b of $n") }
    }
  }

  test("aligned fold shuffle places each bucket in exactly its own partition") {
    // validates the seed-42 assumption against the REAL repartition
    // machinery: hash-keying on the bucket value directly leaves ~1/e of
    // partitions empty (straggler tail on the parallel leg); the probe key
    // must give a perfect 1:1 bucket→partition placement
    val n = 16
    val probes = graft.cdc.CdcPipeline.partitionProbes(n)
    val df = spark.range(0, 4000).toDF("id")
      .withColumn("__b", pmod(xxhash64(col("id")), lit(n)).cast("int"))
      .repartition(n, element_at(typedLit(probes), col("__b") + lit(1)))
    val per = df.groupBy(spark_partition_id().as("p"))
      .agg(countDistinct(col("__b")).as("nb")).collect()
    assert(per.length == n, s"expected $n non-empty partitions: ${per.length}")
    assert(per.forall(_.getLong(1) == 1L),
      s"every partition must hold exactly one bucket: ${per.mkString(",")}")
  }
}
