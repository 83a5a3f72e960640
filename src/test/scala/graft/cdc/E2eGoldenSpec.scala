package graft.cdc

import graft.SparkSpec
import graft.lake.LakeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The executable spec: a multi-day CSV fixture (including BST-suffixed
  * wall-clock rows and an overflow-day late ack) replayed through the full
  * surface — gzip-CSV scan → reporting-window filter → classify → dimension
  * enrichment → daily-partitioned export — and diffed against checked-in
  * golden JSON per day, plus an exact manifest-metadata assertion. The Scala
  * analogue of the reference's e2e harness
  * (`tests/e2e/test_transfer_classifier.py:220-273`: golden daily parquet
  * column dicts + exact S3 metadata maps).
  *
  * Regenerate goldens with `GRAFT_REGEN_GOLDEN=1 sbt "testOnly *E2eGoldenSpec"`
  * and review the diff.
  */
class E2eGoldenSpec extends SparkSpec {
  import spark.implicits._

  private val goldenDir = "src/test/resources/e2e"
  private val day = 24L * 3600 * 1000000L

  /** content CSV layout (MessageParser):
    * _time,conversationID,GUID,interactionID,messageSender,messageRecipient,messageRef,jdiEvent,toSystem,fromSystem
    */
  private def line(time: String, conv: String, guid: String, interaction: String,
                   sender: String, recipient: String, ref: String = "NotProvided",
                   jdi: String = "NONE", toSys: String = "SysB",
                   fromSys: String = "SysA"): String =
    s"$time,$conv,$guid,$interaction,$sender,$recipient,$ref,$jdi,$toSys,$fromSys"

  private def fixture: Seq[ChangeEvent] = {
    import graft.classifier.Interactions._
    val rows = Seq(
      // conv A, 2019-12-02, BST wall-clock (golden must show UTC 18:02:29.985),
      // integrated cleanly (final ack, no error) → Integrated on time
      line("2019-12-02 19:02:29.985 BST", "convA", "a1", EhrRequestStarted, "asid-1", "asid-2"),
      line("2019-12-02 19:10:00.000 BST", "convA", "a2", EhrRequestCompleted, "asid-2", "asid-1"),
      line("2019-12-03 10:00:00.000 UTC", "convA", "a3", ApplicationAck, "asid-1", "asid-2", ref = "a2"),
      // conv B, 2019-12-03, ack carries error 30 → Technical failure / Final error
      line("2019-12-03 08:00:00.000", "convB", "b1", EhrRequestStarted, "asid-3", "asid-4"),
      line("2019-12-03 08:05:00.000", "convB", "b2", EhrRequestCompleted, "asid-4", "asid-3"),
      line("2019-12-03 09:00:00.000", "convB", "b3", ApplicationAck, "asid-3", "asid-4", ref = "b2", jdi = "30"),
      // conv C, 2019-12-04, final ack lands on an OVERFLOW day (2019-12-06,
      // past window end but inside cutoff) → Integrated on time
      line("2019-12-04 12:00:00.000", "convC", "c1", EhrRequestStarted, "asid-5", "asid-6"),
      line("2019-12-04 12:30:00.000", "convC", "c2", EhrRequestCompleted, "asid-6", "asid-5"),
      line("2019-12-06 12:00:00.000", "convC", "c3", ApplicationAck, "asid-5", "asid-6", ref = "c2"),
      // conv D starts OUTSIDE the window (2019-12-06) → excluded by the
      // day filter even though its messages are scanned
      line("2019-12-06 09:00:00.000", "convD", "d1", EhrRequestStarted, "asid-1", "asid-2"),
    )
    rows.zipWithIndex.map { case (content, i) =>
      val time = MessageParser.parseTimeMicros(content.split(",")(0))
      ChangeEvent(
        repo = content.split(",")(1), path = "p", commit = content.split(",")(2),
        lang = "csv", content = content,
        offset = i.toLong, op = "insert", tsMicros = time, epoch = 0L)
    }
  }

  private def canonicalJson(df: DataFrame): String = {
    val cols = df.columns.sorted.map(col)
    df.select(cols: _*).orderBy("conversationId")
      .toJSON.collect().mkString("[\n", ",\n", "\n]") + "\n"
  }

  test("multi-day replay matches the golden daily outputs and manifest metadata") {
    val window = ReportingWindow(
      java.time.LocalDate.of(2019, 12, 2), java.time.LocalDate.of(2019, 12, 5),
      cutoffDays = 14)

    // S1/S2 round trip: write the change log as gzip CSV, read it back
    val logDir = tmpDir("e2e-log")
    ChangeLogSourceFixture.roundTrip(spark, fixture, logDir)
    val events = graft.sources.ChangeLogSource.readCsv(spark, logDir)

    val transfers = CdcPipeline.classify(events, window.cutoffMicros).toDF()
      .filter(col("dateRequestedMicros") >= lit(window.startMicros) &&
        col("dateRequestedMicros") < lit(window.endMicros))
    val dim = Enrichment.generateDim(spark, numAsids = 997, yearMonths = Seq(201911, 201912))
    val enriched = Enrichment.enrich(transfers, dim)
      .withColumn("date_requested",
        date_format(timestamp_micros(col("dateRequestedMicros")),
          "yyyy-MM-dd'T'HH:mm:ss.SSS"))
      .withColumn("date_completed",
        date_format(timestamp_micros(col("dateCompletedMicros")),
          "yyyy-MM-dd'T'HH:mm:ss.SSS"))
      .select("conversationId", "date_requested", "date_completed", "status",
        "failureReason", "slaDurationSeconds", "senderErrorCodes",
        "finalErrorCodes", "intermediateErrorCodes",
        "requestingPracticeAsid", "sendingPracticeAsid",
        "requesting_practice_ods_code", "requesting_practice_name",
        "requesting_practice_sicbl_ods_code",
        "sending_practice_ods_code", "sending_practice_sicbl_name")

    val outDir = tmpDir("e2e-out")
    Export.exportDaily(enriched.withColumn("dateRequestedMicros",
      unix_micros(to_timestamp(col("date_requested"), "yyyy-MM-dd'T'HH:mm:ss.SSS"))), outDir)

    val regen = sys.env.get("GRAFT_REGEN_GOLDEN").contains("1")
    val expectedDays = Seq("2019-12-02", "2019-12-03", "2019-12-04")
    val exported = spark.read.parquet(outDir)
    val seenDays = exported.select("date_requested_day").distinct()
      .as[String].collect().sorted.toSeq
    assert(seenDays == expectedDays, s"exported day partitions: $seenDays")

    expectedDays.foreach { d =>
      val got = canonicalJson(
        exported.filter(col("date_requested_day") === d).drop("date_requested_day", "dateRequestedMicros"))
      val goldenPath = Paths.get(s"$goldenDir/$d-transfers.json")
      if (regen) {
        Files.createDirectories(goldenPath.getParent)
        Files.writeString(goldenPath, got)
      } else {
        assert(Files.exists(goldenPath), s"missing golden $goldenPath — " +
          "run with GRAFT_REGEN_GOLDEN=1 to create")
        val want = Files.readString(goldenPath)
        assert(got == want, s"day $d diverges from golden:\n$got")
      }
    }
    assert(!regen, "goldens regenerated — rerun without GRAFT_REGEN_GOLDEN")

    // exact metadata-map parity: the reference asserts every output file's
    // full S3 metadata dict (tests/e2e/test_transfer_classifier.py:259-267,
    // values from spine_runner.py:39-47) — assert the engine manifest's
    // complete map the same way
    val eng = new CdcEngine(tmpDir("e2e-lake"), numBuckets = 4,
      cutoffMicros = window.cutoffMicros,
      window = Some(window), odsMetadataMonth = Some(201912),
      dimMonths = Some(Set(201911, 201912)))
    eng.applyEpoch(spark, events, 0L)
    val m = eng.transfers.latestManifest().get
    assert(m.metadata == Map(
      "cutoff-days" -> "14",
      "build-tag" -> "graft-cdc-v1",
      "start-datetime" -> "2019-12-02T00:00:00+00:00",
      "end-datetime" -> "2019-12-05T00:00:00+00:00",
      "ods-metadata-month" -> "2019-12"))
    // dim snapshots exist for every request month → zero missing-dim rows
    assert(m.lineage.get("missingDimMonthTransfers").contains(0L), s"${m.lineage}")

    // both the request month AND its previous month lacking a dim snapshot
    // is the case where the reference raises OdsMetadataNotFound
    // (organisation_metadata_monthly.py:26-34) — the engine surfaces it as
    // a lineage counter instead of null-padding silently
    val engMiss = new CdcEngine(tmpDir("e2e-lake-miss"), numBuckets = 4,
      cutoffMicros = window.cutoffMicros,
      window = Some(window), odsMetadataMonth = Some(201910),
      dimMonths = Some(Set(201909, 201910)))
    engMiss.applyEpoch(spark, events, 0L)
    val mm = engMiss.transfers.latestManifest().get
    // every classified transfer in the fixture is requested in 2019-12
    assert(mm.lineage.get("missingDimMonthTransfers").exists(_ >= 3L),
      s"${mm.lineage}")
  }

  test("isoUtc matches python isoformat() including fractional seconds") {
    // python renders the microsecond part only when nonzero — a
    // non-midnight-aligned window must stamp identically to the reference
    assert(CdcEngine.isoUtc(1575244800000000L) == "2019-12-02T00:00:00+00:00")
    assert(CdcEngine.isoUtc(1575244800123456L) ==
      "2019-12-02T00:00:00.123456+00:00")
    assert(CdcEngine.isoUtc(1575244800000001L) ==
      "2019-12-02T00:00:00.000001+00:00")
  }
}

/** Writes the fixture through the gzip-CSV sink so the test exercises the
  * real file round trip (quoting of comma-bearing content included).
  */
object ChangeLogSourceFixture {
  def roundTrip(spark: org.apache.spark.sql.SparkSession,
                events: Seq[ChangeEvent], dir: String): Unit = {
    import spark.implicits._
    graft.sources.ChangeLogSource.writeCsv(events.toDS(), dir)
  }
}
