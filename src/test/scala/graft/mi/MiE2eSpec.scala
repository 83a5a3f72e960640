package graft.mi

import graft.SparkSpec
import graft.jobs.{PipelineConfig, TransferPipelineJob}
import org.apache.spark.sql.Row

/** Port of the reference's DISABLED MI e2e
  * (`tests/e2e/test_transfer_classifier.py:277-422`, commented out
  * upstream): the full env-driven front door — window → v1/yyyy/mm/dd
  * prefix resolution → JSON scan in arrival order → fold → parquet — over
  * the reference's own checked-in input fixtures
  * (`src/test/resources/mi_events`, see its README), asserted against the
  * reference test's expected MiTransfer list, transcribed below verbatim
  * (field names mapped to this engine's snake_case output schema).
  */
class MiE2eSpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(ts: String, tpe: String, id: String)

  // tests/e2e/test_transfer_classifier.py:299-417 — `expected`, verbatim
  private val expected = Seq(
    (
      "3333-1111-1111-1111",
      Seq(
        Ev("2022-02-23T14:00:12", "EHR_GENERATED", "3333-1111-1111-1111-ehrGenerated"),
        Ev("2022-02-23T14:00:12", "EHR_INTEGRATED", "3333-1111-1111-1111-ehrIntegrated"),
        Ev("2022-02-23T14:00:12", "EHR_REQUESTED", "3333-1111-1111-1111-ehrRequested"),
        Ev("2022-02-23T14:00:12", "EHR_SENT", "3333-1111-1111-1111-ehrSent"),
        Ev("2022-02-23T14:00:12", "EHR_VALIDATED", "3333-1111-1111-1111-ehrValidated"),
        Ev("2022-02-23T14:00:12", "ERROR", "3333-1111-1111-1111"),
        Ev("2022-02-23T14:00:12", "PDS_GENERAL_UPDATE", "3333-1111-1111-1111-pdsGeneralUpdate"),
        Ev("2022-02-23T14:00:12", "PDS_TRACE", "3333-1111-1111-1111-pdsTrace"),
        Ev("2022-02-23T14:00:12", "REGISTRATION_STARTED", "3333-1111-1111-1111-registrationStarted"),
        Ev("2022-02-23T14:00:12", "SDS_LOOKUP", "3333-1111-1111-1111-sdsLookup"),
      ),
      Some("supplierOne"), Some("ABC1234"),
      Some("supplierOne"), Some("XYZ4567"),
      Some(false),
    ),
    (
      "123e4567-slow-12d3-a456-426614174000",
      Seq(
        Ev("2022-01-02T00:00:00", "EHR_INTEGRATED", "004510ef-f16f-3b49-9a85-5d51b8f4aa28"),
        Ev("2022-01-05T00:00:00", "EHR_READY_TO_INTEGRATE", "5275d522-b421-3fc3-9972-b7207097469d"),
        Ev("2022-01-02T00:00:00", "ERROR", "0ed87835-6049-3bfb-8494-d51c10f58bd5"),
        Ev("2022-01-02T00:00:00", "MIGRATE_DOCUMENT_REQUEST", "326259d6-33f0-38e0-8d52-366837fe4328"),
        Ev("2022-01-02T00:00:00", "MIGRATE_DOCUMENT_RESPONSE", "b6f128e0-03cb-3735-973b-90674c1817cb"),
        Ev("2022-01-02T00:00:00", "MIGRATE_STRUCTURED_RECORD_REQUEST", "76823f10-5d19-3a44-9d6e-cb91a38e79da"),
        Ev("2022-01-02T00:00:00", "MIGRATE_STRUCTURED_RECORD_RESPONSE", "0b52991d-eb40-3111-9746-a15eaada7129"),
      ),
      Some("SUPPLIER_SYSTEM"), Some("ABC1234"),
      Some("SUPPLIER_SYSTEM"), Some("XYZ4567"),
      Some(true),
    ),
    (
      "33333333-12d3-12d3-a456-426614174000",
      Seq(Ev("2022-04-03T09:00:00", "INTERNAL_TRANSFER", "c8dc0b5f-785b-3afe-b63b-c166d8249ba9")),
      Some("SUPPLIER_SYSTEM"), Some("ABC1234"),
      None, Some("XYZ4567"),
      None,
    ),
  )

  test("env-driven MI run over the reference fixtures matches its expected transfers") {
    val base = getClass.getResource("/mi_events").getPath
    val out = tmpDir("mi-e2e-out")
    // the reference e2e's env: window 2019-12-02 → 2019-12-03, cutoff 0,
    // CLASSIFY_MI_EVENTS=True; the fixtures live under v1/2019/12/02, so
    // the run must reach them through window→prefix resolution alone
    val cfg = PipelineConfig.fromEnv(Map(
      "GRAFT_START_DATE" -> "2019-12-02",
      "GRAFT_END_DATE" -> "2019-12-03",
      "GRAFT_CUTOFF_DAYS" -> "0",
      "GRAFT_CLASSIFY_MI" -> "true",
      "GRAFT_MI_INPUT_BASE" -> base,
      "GRAFT_MI_OUTPUT" -> out,
    ))
    assert(cfg.miInputs == Seq(s"$base/v1/2019/12/02"),
      s"cutoff 0 windows resolve exactly the reference's upload prefix: ${cfg.miInputs}")
    val n = TransferPipelineJob.run(spark, cfg)
    assert(n == 3)

    val got = spark.read.parquet(out).collect().map { r =>
      val evs = r.getSeq[Row](r.fieldIndex("events")).map(e => Ev(
        e.getAs[String]("event_generated_datetime"),
        e.getAs[String]("event_type"),
        e.getAs[String]("event_id")))
      (r.getAs[String]("conversation_id"), evs,
        Option(r.getAs[String]("requesting_supplier")),
        Option(r.getAs[String]("requesting_ods_code")),
        Option(r.getAs[String]("sending_supplier")),
        Option(r.getAs[String]("sending_ods_code")),
        Option(r.get(r.fieldIndex("slow_transfer"))).map(_.asInstanceOf[Boolean]))
    }.sortBy(_._1)
    assert(got.toSeq == expected.sortBy(_._1),
      s"MI e2e output diverges from the reference's expected transfers")
  }

  test("GRAFT_MI_INPUT (engine-native ndjson, many events per file) keeps every event") {
    // regression: routing the legacy ndjson contract through the
    // reference-format multiLine read would silently keep only the FIRST
    // event of each file — the format must follow the env key, not a probe
    val dir = tmpDir("mi-ndjson")
    MiGen.generate(spark, 10).coalesce(2).write.mode("overwrite").text(dir)
    val out = tmpDir("mi-ndjson-out")
    val cfg = PipelineConfig.fromEnv(Map(
      "GRAFT_START_DATE" -> "2019-12-02",
      "GRAFT_END_DATE" -> "2019-12-03",
      "GRAFT_CUTOFF_DAYS" -> "0",
      "GRAFT_CLASSIFY_MI" -> "true",
      "GRAFT_MI_INPUT" -> dir,
      "GRAFT_MI_OUTPUT" -> out,
    ))
    assert(!cfg.miReferenceFormat)
    val n = TransferPipelineJob.run(spark, cfg)
    assert(n == 10, s"expected one transfer per conversation, got $n")
    val evCount = spark.read.parquet(out)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("events"))).count()
    val expectedEvents =
      MiPipeline.parseEvents(MiGen.generate(spark, 10), "json").count()
    assert(evCount == expectedEvents,
      s"every ndjson line must survive the scan: $evCount != $expectedEvents")
  }
}
