package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Resume-from-checkpoint across process boundaries (a NEW engine instance
  * over an existing warehouse continues the epoch chain), and the S7
  * daily-partitioned export.
  */
class ResumeAndExportSpec extends SparkSpec {
  import spark.implicits._

  private val day = 24L * 3600 * 1000000L
  private val cfg = GenConfig(numConversations = 150, hotConversations = 1,
    hotFragments = 32, redeliveryPermille = 40, epochs = 4)
  private lazy val log = ChangeLogGen.generate(spark, cfg).cache()

  test("a fresh engine instance resumes an existing warehouse mid-chain") {
    val dir = tmpDir("resume")
    val first = new CdcEngine(dir, numBuckets = 8, cutoffMicros = 14 * day)
    (0L to 1L).foreach(e => first.applyEpoch(spark, log.filter(_.epoch == e), e))
    // "restart": new instance, same warehouse — also re-applies epoch 1
    // (simulating an at-least-once upstream) before continuing
    val resumed = new CdcEngine(dir, numBuckets = 8, cutoffMicros = 14 * day)
    (1L to 3L).foreach(e => resumed.applyEpoch(spark, log.filter(_.epoch == e), e))

    val oneShot = new CdcEngine(tmpDir("oneshot"), numBuckets = 8, cutoffMicros = 14 * day)
    (0L to 3L).foreach(e => oneShot.applyEpoch(spark, log.filter(_.epoch == e), e))

    def sha(e: CdcEngine) = e.currentTransfers(spark)
      .select("repo", "row_sha256").as[(String, String)].collect().toMap
    assert(sha(resumed) == sha(oneShot))
    assert(resumed.transfers.latestManifest().get.epoch == 3)
  }

  test("daily-partitioned export writes one dir per request day (S7)") {
    val transfers = CdcPipeline.classify(log, 14 * day).toDF()
    val out = tmpDir("daily")
    Export.exportDaily(transfers, out)
    val dayDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("date_requested_day=")).map(_.getName).sorted
    assert(dayDirs.nonEmpty)
    assert(dayDirs.head == "date_requested_day=2020-01-01")
    val back = spark.read.parquet(out)
    assert(back.count() == transfers.count())
    // day column matches the P2 assignment rule (day of date_requested)
    val bad = back.filter(
      date_format(timestamp_micros(col("dateRequestedMicros")), "yyyy-MM-dd")
        =!= col("date_requested_day")).count()
    assert(bad == 0)
  }
}
