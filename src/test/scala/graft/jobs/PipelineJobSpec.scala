package graft.jobs

import graft.SparkSpec
import graft.cdc.{ChangeEvent, MessageParser}
import graft.classifier.{Interactions, SpineMessage}
import java.time.LocalDate

/** The env front door: paired-date validation, defaults, and an end-to-end
  * spine run from CSV input to daily parquet export (reference
  * `pipeline/config.py:76-92` + `main.py:21-34` behavior).
  */
class PipelineJobSpec extends SparkSpec {
  import spark.implicits._

  test("config: dates must come paired; defaults mirror the reference") {
    val today = LocalDate.of(2020, 1, 20)
    val both = PipelineConfig.fromEnv(Map(
      "GRAFT_START_DATE" -> "2019-12-02", "GRAFT_END_DATE" -> "2019-12-05",
      "GRAFT_CUTOFF_DAYS" -> "7",
      "GRAFT_INPUT" -> "/in", "GRAFT_OUTPUT" -> "/out"), today)
    assert(both.window.start == LocalDate.of(2019, 12, 2))
    assert(both.window.cutoffDays == 7)

    val defaulted = PipelineConfig.fromEnv(
      Map("GRAFT_INPUT" -> "/in", "GRAFT_OUTPUT" -> "/out"), today)
    // reference default: the single day at today − cutoff − 1
    assert(defaulted.window.days == Seq(today.minusDays(14 + 1)))

    intercept[IllegalArgumentException] {
      PipelineConfig.fromEnv(Map("GRAFT_START_DATE" -> "2019-12-02",
        "GRAFT_INPUT" -> "/in", "GRAFT_OUTPUT" -> "/out"), today)
    }
    intercept[IllegalArgumentException] {
      PipelineConfig.fromEnv(Map.empty, today) // GRAFT_INPUT missing
    }

    // cutoff 0 is VALID and means "no cutoff filtering"
    // (test_config_environment_variables.py:85-109 + transfer_service.py:158-161)
    val zero = PipelineConfig.fromEnv(Map("GRAFT_CUTOFF_DAYS" -> "0",
      "GRAFT_INPUT" -> "/in", "GRAFT_OUTPUT" -> "/out"), today)
    assert(zero.window.cutoffDays == 0 && zero.window.cutoffMicros == 0L)
    assert(zero.window.overflowDays.isEmpty)

    // GRAFT_INPUT_BASE: day files resolved from the window through the
    // reference's v3 URI scheme, window days PLUS overflow (cutoff) days
    val resolved = PipelineConfig.fromEnv(Map(
      "GRAFT_START_DATE" -> "2019-12-02", "GRAFT_END_DATE" -> "2019-12-03",
      "GRAFT_CUTOFF_DAYS" -> "1",
      "GRAFT_INPUT_BASE" -> "base", "GRAFT_OUTPUT" -> "/out"), today)
    assert(resolved.inputPaths == Seq(
      "base/v3/2019/12/02/2019-12-02_spine_messages.csv.gz",
      "base/v3/2019/12/03/2019-12-03_spine_messages.csv.gz"))
  }

  test("spine run: CSV in, daily parquet out, row count returned") {
    val t0 = 1575288000000000L // 2019-12-02 12:00 UTC
    val day = 24L * 3600 * 1000000L
    def ev(conv: String, guid: String, interaction: String, ts: Long,
           ref: Option[String], off: Long) =
      ChangeEvent(conv, "p", guid, "csv",
        MessageParser.format(SpineMessage(ts, conv, guid, interaction,
          "asid-1", "asid-2", ref, None, None, None)),
        offset = off, op = "insert", tsMicros = ts, epoch = 0L)
    val events = Seq(
      ev("cA", "a1", Interactions.EhrRequestStarted, t0, None, 1L),
      ev("cA", "a2", Interactions.EhrRequestCompleted, t0 + 60000000L, None, 2L),
      ev("cA", "a3", Interactions.ApplicationAck, t0 + 120000000L, Some("a2"), 3L),
      ev("cB", "b1", Interactions.EhrRequestStarted, t0 + day, None, 4L),
      // outside [start, end) — excluded by the window filter
      ev("cC", "c1", Interactions.EhrRequestStarted, t0 + 10 * day, None, 5L),
    )
    val in = tmpDir("job-in"); val out = tmpDir("job-out")
    graft.sources.ChangeLogSource.writeCsv(events.toDS(), in)

    val cfg = PipelineConfig.fromEnv(Map(
      "GRAFT_START_DATE" -> "2019-12-02", "GRAFT_END_DATE" -> "2019-12-05",
      "GRAFT_INPUT" -> in, "GRAFT_OUTPUT" -> out), LocalDate.of(2020, 1, 20))
    val n = TransferPipelineJob.run(spark, cfg)
    assert(n == 2L)
    val days = spark.read.parquet(out).select("date_requested_day")
      .distinct().as[String].collect().sorted.toSeq
    assert(days == Seq("2019-12-02", "2019-12-03"))

    // with GRAFT_DIM_PATH the export carries enrichment columns
    val dimPath = tmpDir("job-dim")
    graft.cdc.Enrichment.generateDim(spark, numAsids = 30, yearMonths = Seq(201912))
      .write.mode("overwrite").parquet(dimPath)
    val out2 = tmpDir("job-out-enriched")
    val cfg2 = cfg.copy(outputDir = out2, dimPath = Some(dimPath))
    assert(TransferPipelineJob.run(spark, cfg2) == 2L)
    val enriched = spark.read.parquet(out2)
    assert(enriched.columns.contains("requesting_practice_ods_code"))
    val a1 = enriched.filter($"requestingPracticeAsid" === "asid-1")
      .select("requesting_practice_ods_code").as[String].collect()
    assert(a1.forall(_ == "O00001-201912"), s"got ${a1.toSeq}")
  }
}
