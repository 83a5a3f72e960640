package graft.streaming

import graft.SparkSpec
import graft.cdc._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming tail → lake commits: micro-batches land as epoch manifests and
  * the final table equals one-shot batch classification.
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private val day = 24L * 3600 * 1000000L

  test("foreachBatch ingest commits per-batch manifests; final state == batch classify") {
    implicit val sqlCtx = spark.sqlContext
    val cfg = GenConfig(numConversations = 80, hotConversations = 1,
      hotFragments = 16, redeliveryPermille = 50, epochs = 3)
    val all = (0L until 80L).flatMap(ChangeLogGen.eventsOf(cfg, _))

    val engine = new CdcEngine(tmpDir("stream-lake"), numBuckets = 8,
      cutoffMicros = 14 * day)
    val source = MemoryStream[ChangeEvent]
    val query = StreamingIngest.start(engine, source.toDS(), tmpDir("ckpt"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      (0 to 2).foreach { e =>
        source.addData(all.filter(_.epoch == e))
        query.processAllAvailable()
      }
    } finally query.stop()

    val m = engine.transfers.latestManifest().get
    assert(m.epoch == 2, s"expected 3 batch commits, last manifest ${m.epoch}")

    val streamed = engine.currentTransfers(spark)
      .select("repo", "row_sha256").as[(String, String)].collect().toMap
    val batch = CdcPipeline.withRowSha(
        CdcPipeline.classify(all.toDS(), 14 * day).toDF())
      .select("repo", "row_sha256").as[(String, String)].collect().toMap
    assert(streamed == batch)
  }

  test("misaligned micro-batches: a session split across applies stays durable") {
    // All events carry source epoch 0, but arrive across three applies —
    // exactly what a streaming foreachBatch produces when micro-batch
    // boundaries don't follow the source's epoch stamps. Without re-stamping
    // inside applyEpoch, the second half of the split session is classified
    // but never persisted to state, and the epoch-2 redelivery re-classifies
    // from incomplete state, overwriting the correct transfer row.
    val cfg = GenConfig(numConversations = 6, hotConversations = 0,
      hotFragments = 0, epochs = 1)
    val all = (0L until 6L).flatMap(ChangeLogGen.eventsOf(cfg, _))
    val targetRepo = all.head.repo
    val target = all.filter(_.repo == targetRepo).sortBy(_.offset)
    assert(target.size >= 4, "fixture session must have enough events to split")
    val others = all.filterNot(_.repo == targetRepo)
    val (h1, h2) = target.splitAt(target.size / 2)

    val engine = new CdcEngine(tmpDir("misaligned"), numBuckets = 4,
      cutoffMicros = 14 * day)
    engine.applyEpoch(spark, (others ++ h1).toDS(), 0L)
    engine.applyEpoch(spark, h2.toDS(), 1L) // same source stamp, later batch
    engine.applyEpoch(spark, h1.take(1).toDS(), 2L) // pure redelivery re-touch

    val streamed = engine.currentTransfers(spark)
      .select("repo", "row_sha256").as[(String, String)].collect().toMap
    val batch = CdcPipeline.withRowSha(
        CdcPipeline.classify(all.toDS(), 14 * day).toDF())
      .select("repo", "row_sha256").as[(String, String)].collect().toMap
    assert(streamed == batch,
      "split-session transfer must match the one-shot batch oracle")
  }

  test("kill-and-restart from the query checkpoint resumes, not redoes") {
    val cfg = GenConfig(numConversations = 80, hotConversations = 1,
      hotFragments = 16, redeliveryPermille = 50, epochs = 4)
    val log = ChangeLogGen.generate(spark, cfg).cache()
    val srcDir = tmpDir("restart-src")
    val cp = tmpDir("restart-cp")
    val engine = new CdcEngine(tmpDir("restart-wh"), numBuckets = 8,
      cutoffMicros = 14 * day)
    def arrive(e: Long): Unit =
      log.filter(_.epoch == e).toDF().write.mode("append").parquet(srcDir)
    def tail() = spark.readStream
      .schema(spark.emptyDataset[ChangeEvent].schema)
      .option("maxFilesPerTrigger", 2) // several micro-batches per run
      .parquet(srcDir)
      .as[ChangeEvent]

    arrive(0L); arrive(1L)
    val q1 = StreamingIngest.start(engine, tail(), cp)
    q1.processAllAvailable(); q1.stop() // the kill
    val atKill = engine.committedThrough()
    assert(atKill.nonEmpty)

    // more of the log lands while the query is down; the restart (same
    // checkpoint, same warehouse) picks up ONLY the new files and batchIds
    // continue past the committed horizon
    arrive(2L); arrive(3L)
    val q2 = StreamingIngest.start(engine, tail(), cp)
    q2.processAllAvailable(); q2.stop()
    assert(engine.committedThrough().get > atKill.get)

    // file-sized micro-batches ≠ the source's epoch stamps, across a
    // restart — the final table must still equal one-shot classification
    val streamed = engine.currentTransfers(spark)
      .select("repo", "row_sha256").as[(String, String)].collect().toMap
    val batch = CdcPipeline.withRowSha(
        CdcPipeline.classify(log, 14 * day).toDF())
      .select("repo", "row_sha256").as[(String, String)].collect().toMap
    assert(streamed == batch)
    log.unpersist()
  }

  test("a mid-stream dim refresh lands between micro-batches and survives restart") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val cfg = GenConfig(numConversations = 60, hotConversations = 0,
      hotFragments = 0, redeliveryPermille = 30, epochs = 3)
    val log = ChangeLogGen.generate(spark, cfg).cache()
    val months = Seq(201911, 201912)
    def baseDim = Enrichment.generateDim(spark, numAsids = 997, yearMonths = months)
    val targets = CdcPipeline.classify(log.filter(col("epoch") === 0L), 14 * day)
      .select("requestingPracticeAsid").distinct().as[String]
      .collect().sorted.take(2).toSeq
    val delta = targets.map(a => Enrichment.OrgDimRow(a, s"O-$a-upd",
      s"Practice $a (refreshed)", "S900", "SICBL 900", 201912)).toDF()

    val wh = tmpDir("stream-dim-wh")
    val srcDir = tmpDir("stream-dim-src")
    val cp = tmpDir("stream-dim-cp")
    def arrive(e: Long): Unit =
      log.filter(col("epoch") === e).write.mode("append").parquet(srcDir)
    def tail() = spark.readStream
      .schema(spark.emptyDataset[ChangeEvent].schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(srcDir)
      .as[ChangeEvent]
    val counters =
      Set("duplicatesDropped", "danglingAcks", "unknownPurpose", "negativeSla")
    def rowMap(df: DataFrame): Map[String, String] = {
      val cols = df.columns.filterNot(counters).sorted.map(col)
      df.select(col("repo"), to_json(struct(cols.toIndexedSeq: _*)).as("j"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    }

    val engine = new CdcEngine(wh, numBuckets = 8,
      cutoffMicros = 14 * day, dim = Some(baseDim))
    val queue = new StreamingIngest.DimUpdateQueue
    arrive(0L)
    // a CONTINUOUS trigger — the refresh must land while the query runs
    // (AvailableNow would terminate after draining epoch 0)
    val q1 = StreamingIngest.start(engine, tail(), cp,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      dimUpdates = Some(queue))
    q1.processAllAvailable()
    // the refresh is offered while the query RUNS — no stop/start; the next
    // micro-batch drains it, enriches with the new dim, and carries the
    // retro-correction of the rows committed before the refresh
    queue.offer(1L, delta)
    arrive(1L)
    q1.processAllAvailable(); q1.stop()
    assert(engine.dimlog.get.latestManifest().get.epoch == 1L,
      "dim update must be committed on the dimlog chain mid-stream")
    val refreshedNames = engine.currentEnriched(spark)
      .filter(col("requestingPracticeAsid").isin(targets: _*))
      .select("requesting_practice_name").distinct().as[String].collect().toSet
    assert(refreshedNames.nonEmpty &&
      refreshedNames.forall(_.endsWith("(refreshed)")),
      s"both pre- and post-refresh rows must enrich with the new dim: $refreshedNames")

    // restart: new engine over the same warehouse (dim state rebuilt from
    // the dimlog, no re-offer), new query on the same checkpoint
    val resumed = new CdcEngine(wh, numBuckets = 8,
      cutoffMicros = 14 * day, dim = Some(baseDim))
    arrive(2L)
    val q2 = StreamingIngest.start(resumed, tail(), cp)
    q2.processAllAvailable(); q2.stop()

    // oracle: the batch flavour with the refresh at the same feed position
    val beng = new CdcEngine(tmpDir("stream-dim-batch"), numBuckets = 8,
      cutoffMicros = 14 * day, dim = Some(baseDim))
    beng.applyEpoch(spark, log.filter(col("epoch") === 0L), 0L)
    beng.applyDimUpdate(spark, delta, 1L)
    (1L to 2L).foreach(e => beng.applyEpoch(spark, log.filter(col("epoch") === e), e))
    assert(rowMap(resumed.currentEnriched(spark)) ==
      rowMap(beng.currentEnriched(spark)),
      "streamed + mid-stream refresh must equal the batch flavour")
    log.unpersist()
  }

  test("a fully-committed epoch replays as a manifest-stat no-op") {
    val cfg = GenConfig(numConversations = 20, hotConversations = 0,
      hotFragments = 0, epochs = 2)
    val all = (0L until 20L).flatMap(ChangeLogGen.eventsOf(cfg, _))
    val engine = new CdcEngine(tmpDir("fastpath"), numBuckets = 4,
      cutoffMicros = 14 * day)
    engine.applyEpoch(spark, all.filter(_.epoch == 0L).toDS(), 0L)
    val before = engine.transfers.latestManifest().get
    // a checkpoint replay redelivers batchId 0 — the fast path returns the
    // committed manifest without running the fold (the epoch id determines
    // batch content per the StreamingIngest contract, so even a DIFFERENT
    // payload must not re-apply)
    val replayed = engine.applyEpoch(spark, all.filter(_.epoch == 1L).toDS(), 0L)
    assert(replayed == before)
    assert(engine.transfers.latestManifest().get == before)
    assert(engine.committedThrough().contains(0L))
  }

  test("an idle trigger's empty batch commits an empty epoch harmlessly") {
    val cfg = GenConfig(numConversations = 20, hotConversations = 0,
      hotFragments = 0, epochs = 1)
    val all = (0L until 20L).flatMap(ChangeLogGen.eventsOf(cfg, _))
    val engine = new CdcEngine(tmpDir("emptybatch"), numBuckets = 4,
      cutoffMicros = 14 * day)
    engine.applyEpoch(spark, all.toDS(), 0L)
    val before = engine.currentTransfers(spark)
      .select("repo", "row_sha256").as[(String, String)].collect().toMap
    engine.applyEpoch(spark, spark.emptyDataset[ChangeEvent], 1L)
    assert(engine.committedThrough().contains(1L))
    val after = engine.currentTransfers(spark)
      .select("repo", "row_sha256").as[(String, String)].collect().toMap
    assert(after == before)
  }

  test("an offer no micro-batch drained survives shutdown via flushAfterStop") {
    import org.apache.spark.sql.functions.col
    // durability boundary: offer is a mailbox drop — a query stopped (or
    // never triggered, on a quiet stream) before the next batch leaves the
    // delta in memory. The shutdown path is pending-check + flushAfterStop,
    // which must commit to the dimlog; a re-flush of the same version must
    // stay a guarded no-op.
    val cfg = GenConfig(numConversations = 30, hotConversations = 0,
      hotFragments = 0, epochs = 1)
    val log = ChangeLogGen.generate(spark, cfg).cache()
    val baseDim = Enrichment.generateDim(spark, numAsids = 997,
      yearMonths = Seq(201911, 201912))
    val target = CdcPipeline.classify(log, 14 * day)
      .select("requestingPracticeAsid").as[String].collect().min
    val delta = Seq(Enrichment.OrgDimRow(target, s"O-$target-upd",
      s"Practice $target (refreshed)", "S900", "SICBL 900", 201912)).toDF()

    val engine = new CdcEngine(tmpDir("flush-wh"), numBuckets = 4,
      cutoffMicros = 14 * day, dim = Some(baseDim))
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[ChangeEvent]
    val queue = new StreamingIngest.DimUpdateQueue
    val query = StreamingIngest.start(engine, source.toDS(), tmpDir("flush-cp"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      dimUpdates = Some(queue))
    source.addData(log.as[ChangeEvent].collect().toSeq)
    query.processAllAvailable()
    // offered while running, but the query stops before any further batch
    queue.offer(1L, delta)
    query.stop()
    assert(queue.pending == 1, "undrained offer must be visible to shutdown")
    assert(queue.flushAfterStop(spark, engine) == Seq(1L))
    assert(queue.pending == 0)
    assert(engine.dimlog.get.latestManifest().get.epoch == 1L,
      "flushAfterStop must commit on the dimlog chain")
    // no subsequent ingest epoch to ride — land the retro-correction
    // out-of-band (the documented end-of-feed flow)
    assert(engine.flushDimUpdates(spark, epoch = 100L) > 0)
    val names = engine.currentEnriched(spark)
      .filter(col("requestingPracticeAsid") === target)
      .select("requesting_practice_name").distinct().as[String].collect().toSet
    assert(names == Set(s"Practice $target (refreshed)"), names.toString)
    // replaying the same version after restart stays a no-op
    val resumed = new CdcEngine(engine.warehouse, numBuckets = 4,
      cutoffMicros = 14 * day, dim = Some(baseDim))
    val q2 = new StreamingIngest.DimUpdateQueue
    q2.offer(1L, delta)
    assert(q2.flushAfterStop(spark, resumed) == Seq(1L))
    assert(resumed.dimlog.get.latestManifest().get.epoch == 1L)
    log.unpersist()
  }
}
