package graft.jobs

import graft.SparkSpec
import graft.cdc.{CdcEngine, CdcPipeline, ChangeLogGen, GenConfig}
import graft.sources.ChangeLogSource
import org.apache.spark.sql.functions._

/** End-to-end spec for the CDC engine's spark-submit front door: gzip-CSV
  * change log in → warehouse out, resume across restarts, batch oracle.
  */
class CdcIngestJobSpec extends SparkSpec {
  import spark.implicits._

  private val day = 24L * 3600 * 1000000L
  private val cfg = GenConfig(numConversations = 150, hotConversations = 1,
    hotFragments = 32, redeliveryPermille = 30, epochs = 4)

  test("ingest job: full run, idempotent re-run, and resume after partial run") {
    val logDir = tmpDir("ingest-log")
    val wh = tmpDir("ingest-wh") + "/w"
    val log = ChangeLogGen.generate(spark, cfg)
    ChangeLogSource.writeCsv(log, logDir)
    val env = Map("GRAFT_CDC_INPUT" -> logDir, "GRAFT_WAREHOUSE" -> wh,
      "GRAFT_BUCKETS" -> "8", "GRAFT_CUTOFF_DAYS" -> "14")

    val r1 = CdcIngestJob.run(spark, env)
    assert(r1.appliedEpochs == 4 && r1.lastEpoch == 3L)
    val eng = new CdcEngine(wh, numBuckets = 8, cutoffMicros = 14 * day)
    assert(eng.committedThrough().contains(3L))

    // matches the one-shot batch classification of the same log
    def shaMap(e: CdcEngine) = e.currentTransfers(spark)
      .select("repo", "row_sha256").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val want = CdcPipeline.withRowSha(
        CdcPipeline.classify(log, 14 * day).toDF())
      .select("repo", "row_sha256").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shaMap(eng) == want)

    // re-run = pure no-op (applied 0 epochs, heads unchanged)
    val head = eng.transfers.latestManifest().get
    val r2 = CdcIngestJob.run(spark, env)
    assert(r2.appliedEpochs == 0)
    assert(new CdcEngine(wh, numBuckets = 8, cutoffMicros = 14 * day)
      .transfers.latestManifest().get == head)

    // resume: a fresh warehouse ingested from a HALF log, then the full log
    val wh2 = tmpDir("ingest-wh2") + "/w"
    val halfDir = tmpDir("ingest-log-half")
    ChangeLogSource.writeCsv(log.filter(_.epoch <= 1L), halfDir)
    CdcIngestJob.run(spark, env.updated("GRAFT_CDC_INPUT", halfDir)
      .updated("GRAFT_WAREHOUSE", wh2))
    val r3 = CdcIngestJob.run(spark, env.updated("GRAFT_WAREHOUSE", wh2))
    assert(r3.appliedEpochs == 2, "only the tail epochs re-apply")
    assert(shaMap(new CdcEngine(wh2, numBuckets = 8,
      cutoffMicros = 14 * day)) == want)
  }

  test("a dim refresh through the front door retro-corrects and survives restart") {
    val logDir = tmpDir("upd-log")
    val halfDir = tmpDir("upd-log-half")
    val wh = tmpDir("upd-wh") + "/w"
    val log = ChangeLogGen.generate(spark, cfg)
    ChangeLogSource.writeCsv(log, logDir)
    ChangeLogSource.writeCsv(log.filter(_.epoch <= 1L), halfDir)
    val dimPath = tmpDir("upd-dim") + "/dim"
    val baseDim = graft.cdc.Enrichment.generateDim(spark, numAsids = 997,
      yearMonths = Seq(201911, 201912))
    baseDim.write.parquet(dimPath)
    val env = Map("GRAFT_WAREHOUSE" -> wh, "GRAFT_BUCKETS" -> "8",
      "GRAFT_DIM_PATH" -> dimPath)

    // run 1: half the log, seed dim
    CdcIngestJob.run(spark, env.updated("GRAFT_CDC_INPUT", halfDir))

    // a refreshed 201912 snapshot for an asid present in epoch-0/1 rows
    val asid = graft.cdc.CdcPipeline.classify(log.filter(_.epoch <= 1L), 14 * day)
      .select("requestingPracticeAsid").distinct().as[String].collect().min
    val delta = Seq(graft.cdc.Enrichment.OrgDimRow(asid, "O-upd",
      "Practice (front-door refresh)", "S9", "SB9", 201912)).toDF()
    val deltaPath = tmpDir("upd-delta") + "/delta"
    delta.write.parquet(deltaPath)

    // run 2: full log + the refresh — a DIFFERENT job process (fresh engine)
    val r2 = CdcIngestJob.run(spark, env.updated("GRAFT_CDC_INPUT", logDir)
      .updated("GRAFT_DIM_UPDATE", deltaPath)
      .updated("GRAFT_DIM_UPDATE_VERSION", "1"))
    assert(r2.appliedEpochs == 2, "only the tail epochs re-apply")

    val eng = new CdcEngine(wh, numBuckets = 8, cutoffMicros = 14 * day,
      dim = Some(baseDim))
    // the retro-correction rode the first tail epoch
    assert(eng.enriched.get.manifestAt(2L).get.lineage("reEnriched") > 0)
    assert(eng.dimlog.get.manifestAt(1L).get.kind == "dim-update")
    val names = eng.currentEnriched(spark)
      .filter(col("requestingPracticeAsid") === asid)
      .select("requesting_practice_name").distinct().as[String].collect().toSet
    assert(names == Set("Practice (front-door refresh)"),
      s"every row of $asid must carry the refreshed name, got $names")

    // run 3 (idempotent replay of the same env): nothing changes
    val head = eng.enriched.get.latestManifest().get
    val r3 = CdcIngestJob.run(spark, env.updated("GRAFT_CDC_INPUT", logDir)
      .updated("GRAFT_DIM_UPDATE", deltaPath)
      .updated("GRAFT_DIM_UPDATE_VERSION", "1"))
    assert(r3.appliedEpochs == 0)
    assert(new CdcEngine(wh, numBuckets = 8, cutoffMicros = 14 * day,
      dim = Some(baseDim)).enriched.get.latestManifest().get == head)
  }

  test("GRAFT_STRICT_ODS without GRAFT_DIM_PATH fails fast, not silently non-strict") {
    val ex = intercept[IllegalArgumentException] {
      CdcIngestJob.run(spark, Map(
        "GRAFT_CDC_INPUT" -> tmpDir("strict-nodim-log"),
        "GRAFT_WAREHOUSE" -> (tmpDir("strict-nodim-wh") + "/w"),
        "GRAFT_STRICT_ODS" -> "true"))
    }
    assert(ex.getMessage.contains("GRAFT_DIM_PATH"))
  }

  test("ingest job with a dim maintains the enriched table") {
    val logDir = tmpDir("ingest-log-dim")
    val wh = tmpDir("ingest-wh-dim") + "/w"
    val log = ChangeLogGen.generate(spark, cfg)
    ChangeLogSource.writeCsv(log, logDir)
    val dimPath = tmpDir("ingest-dim") + "/dim"
    graft.cdc.Enrichment.generateDim(spark, numAsids = 997,
      yearMonths = Seq(201911, 201912)).write.parquet(dimPath)

    CdcIngestJob.run(spark, Map("GRAFT_CDC_INPUT" -> logDir,
      "GRAFT_WAREHOUSE" -> wh, "GRAFT_BUCKETS" -> "8",
      "GRAFT_DIM_PATH" -> dimPath))
    val eng = new CdcEngine(wh, numBuckets = 8, cutoffMicros = 14 * day,
      dim = Some(spark.read.parquet(dimPath)))
    val enriched = eng.currentEnriched(spark)
    assert(enriched.count() > 0)
    assert(enriched.columns.contains("requesting_practice_name"))
    assert(eng.transfers.latestManifest().get
      .lineage.contains("missingDimMonthTransfers"))
  }
}
