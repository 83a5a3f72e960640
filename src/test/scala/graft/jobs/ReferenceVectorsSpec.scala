package graft.jobs

import graft.SparkSpec
import graft.model.ReferenceModel
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import java.time.LocalDate

/** The reference's OWN published e2e vectors, replayed byte-faithfully:
  * its checked-in spine-message CSVs (gzipped into the v3 bucket layout its
  * resolver expects) and monthly organisationMetadata.json files drive this
  * engine's env front door end to end, and every daily output is compared
  * against the reference's own `expected_outputs/…-transferParquet.json`
  * (`tests/e2e/test_transfer_classifier.py:220-273` — START 2019-12-02,
  * END 2020-01-04, cutoff 14). The independent model (`ReferenceModel`)
  * then reproduces the same vectors, closing the triangle: engine ↔
  * reference goldens, model ↔ reference goldens, engine ↔ model
  * (ReferenceModelSpec / EquivalenceProps).
  */
class ReferenceVectorsSpec extends SparkSpec {

  private val refDir =
    Paths.get("/root/reference/tests/e2e/test_transfer_classifier")
  private val start = LocalDate.of(2019, 12, 2)
  private val end = LocalDate.of(2020, 1, 4) // exclusive
  private val cutoffDays = 14
  private val dataDays = Set("2019-12-02", "2019-12-03", "2019-12-05",
    "2019-12-20", "2019-12-30", "2019-12-31", "2020-01-02")

  private def windowDays: Seq[LocalDate] =
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(_.isBefore(end)).toSeq

  /** python `isoformat()` naive rendering: fraction only when nonzero. */
  private def isoNaive(micros: Long): String = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      math.floorDiv(micros, 1000000L),
      (math.floorMod(micros, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    val base = ldt.format(java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
    val frac = math.floorMod(micros, 1000000L)
    if (frac == 0L) base else f"$base.$frac%06d"
  }

  private def fmtList(xs: Seq[Any]): String =
    xs.map(x => if (x == null) "null" else x.toString).mkString("[", ",", "]")

  /** The reference's columnar JSON → row maps (all values stringified). */
  private def expectedRows(day: String): Seq[Map[String, String]] = {
    val p = refDir.resolve(s"expected_outputs/$day-transferParquet.json")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(p))
    val cols = root.fieldNames()
    val colNames = Iterator.continually(cols)
      .takeWhile(_.hasNext).map(_.next()).toVector
    val n = root.get(colNames.head).size()
    (0 until n).map { i =>
      colNames.map { c =>
        val v = root.get(c).get(i)
        val s =
          if (v == null || v.isNull) "null"
          else if (v.isArray)
            fmtList((0 until v.size()).map(j =>
              if (v.get(j).isNull) null else v.get(j).asInt: Any))
          else v.asText()
        c -> s
      }.toMap
    }
  }

  /** Gzip one CSV into the v3 layout the reference's resolver reads. */
  private def gzipTo(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst.getParent)
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(dst))
    try out.write(Files.readAllBytes(src)) finally out.close()
  }

  private def buildV3Layout(base: Path): Unit = {
    val days = Iterator.iterate(LocalDate.of(2019, 12, 1))(_.plusDays(1))
      .takeWhile(!_.isAfter(LocalDate.of(2020, 1, 18))).toSeq
    days.foreach { d =>
      val name = f"${d.getYear}-${d.getMonthValue}%02d-${d.getDayOfMonth}%02d"
      val src0 = refDir.resolve(s"inputs/$name-spine_messages.csv")
      val src = if (Files.exists(src0)) src0
        else refDir.resolve("inputs/template-spine_messages.csv")
      gzipTo(src, base.resolve(
        f"v3/${d.getYear}/${d.getMonthValue}%02d/${d.getDayOfMonth}%02d/" +
          s"${name}_spine_messages.csv.gz"))
    }
  }

  private def dimPaths: String = Seq("2019-12", "2020-01")
    .map(m => refDir.resolve(s"inputs/organisation_metadata/$m-organisationMetadata.json"))
    .mkString(",")

  /** Engine/model-agnostic normalized row: the reference's 22 columns. */
  private def normalized(
      conversationId: String, dateRequested: Long, dateCompleted: Option[Long],
      lastSender: Option[Long], sla: Option[Long], status: String,
      failureReason: Option[String], senderErrs: Seq[Any], finalErrs: Seq[Any],
      interErrs: Seq[Any], reqAsid: String, sndAsid: String,
      reqSupplier: Option[String], sndSupplier: Option[String],
      reqOds: Option[String], reqName: Option[String], reqSicblOds: Option[String],
      reqSicblName: Option[String], sndOds: Option[String], sndName: Option[String],
      sndSicblOds: Option[String], sndSicblName: Option[String]): Map[String, String] =
    Map(
      "conversation_id" -> conversationId,
      "date_requested" -> isoNaive(dateRequested),
      "date_completed" -> dateCompleted.map(isoNaive).getOrElse("null"),
      "last_sender_message_timestamp" -> lastSender.map(isoNaive).getOrElse("null"),
      "sla_duration" -> sla.map(_.toString).getOrElse("null"),
      "status" -> status,
      "failure_reason" -> failureReason.getOrElse("null"),
      "sender_error_codes" -> fmtList(senderErrs),
      "final_error_codes" -> fmtList(finalErrs),
      "intermediate_error_codes" -> fmtList(interErrs),
      "requesting_practice_asid" -> reqAsid,
      "sending_practice_asid" -> sndAsid,
      "requesting_supplier" -> reqSupplier.getOrElse("null"),
      "sending_supplier" -> sndSupplier.getOrElse("null"),
      "requesting_practice_ods_code" -> reqOds.getOrElse("null"),
      "requesting_practice_name" -> reqName.getOrElse("null"),
      "requesting_practice_sicbl_ods_code" -> reqSicblOds.getOrElse("null"),
      "requesting_practice_sicbl_name" -> reqSicblName.getOrElse("null"),
      "sending_practice_ods_code" -> sndOds.getOrElse("null"),
      "sending_practice_name" -> sndName.getOrElse("null"),
      "sending_practice_sicbl_ods_code" -> sndSicblOds.getOrElse("null"),
      "sending_practice_sicbl_name" -> sndSicblName.getOrElse("null"),
    )

  private def sortRows(rows: Seq[Map[String, String]]): Seq[Map[String, String]] =
    rows.sortBy(_("conversation_id"))

  test("engine reproduces the reference's published e2e vectors end to end") {
    assume(Files.isDirectory(refDir), s"reference fixture not present at $refDir")
    val inBase = tmpDir("ref-vectors-in")
    val outDir = tmpDir("ref-vectors-out")
    buildV3Layout(Paths.get(inBase))

    val cfg = PipelineConfig.fromEnv(Map(
      "GRAFT_START_DATE" -> start.toString,
      "GRAFT_END_DATE" -> end.toString,
      "GRAFT_CUTOFF_DAYS" -> cutoffDays.toString,
      "GRAFT_INPUT_BASE" -> inBase,
      "GRAFT_INPUT_FORMAT" -> "spine-csv",
      "GRAFT_OUTPUT" -> outDir,
      "GRAFT_DIM_PATH" -> dimPaths,
    ))
    TransferPipelineJob.run(spark, cfg)

    val exported = spark.read.parquet(outDir).collect().map { r =>
      def os(c: String) = Option(r.getAs[String](c))
      def ol(c: String) = { val i = r.fieldIndex(c); if (r.isNullAt(i)) None else Some(r.getLong(i)) }
      def arr(c: String) = r.getSeq[Any](r.fieldIndex(c))
      // partition-column type inference reads the day back as a DATE
      (r.getAs[Any]("date_requested_day").toString, normalized(
        r.getAs[String]("conversationId"), r.getAs[Long]("dateRequestedMicros"),
        ol("dateCompletedMicros"), ol("lastSenderMessageTimestampMicros"),
        ol("slaDurationSeconds"), r.getAs[String]("status"), os("failureReason"),
        arr("senderErrorCodes"), arr("finalErrorCodes"), arr("intermediateErrorCodes"),
        r.getAs[String]("requestingPracticeAsid"), r.getAs[String]("sendingPracticeAsid"),
        os("requestingSupplier"), os("sendingSupplier"),
        os("requesting_practice_ods_code"), os("requesting_practice_name"),
        os("requesting_practice_sicbl_ods_code"), os("requesting_practice_sicbl_name"),
        os("sending_practice_ods_code"), os("sending_practice_name"),
        os("sending_practice_sicbl_ods_code"), os("sending_practice_sicbl_name")))
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

    windowDays.foreach { d =>
      val day = d.toString
      val want = if (dataDays(day)) sortRows(expectedRows(day)) else Seq.empty
      val got = sortRows(exported.getOrElse(day, Seq.empty))
      assert(got == want,
        s"day $day diverges from the reference vectors:\n got: $got\nwant: $want")
    }
  }

  test("the independent model reproduces the same reference vectors") {
    assume(Files.isDirectory(refDir), s"reference fixture not present at $refDir")
    val inBase = tmpDir("ref-vectors-model-in")
    buildV3Layout(Paths.get(inBase))
    val window = graft.cdc.ReportingWindow(start, end, cutoffDays)
    val paths = graft.cdc.UriResolver.spineMessages(inBase, window.scanDays)
    val events = graft.sources.SpineCsvSource.read(spark, paths: _*)
      .collect().toVector
    val dim = Seq("2019-12", "2020-01").flatMap(m => ReferenceModel.odsDimRows(
      Files.readString(refDir.resolve(
        s"inputs/organisation_metadata/$m-organisationMetadata.json"))))

    val recs = ReferenceModel.classifyLog(events, window.cutoffMicros)
      .filter(r => r.dateRequestedMicros >= window.startMicros &&
        r.dateRequestedMicros < window.endMicros)
    val rows = ReferenceModel.enrich(recs, dim).map { e =>
      val r = e.rec
      val day = java.time.LocalDateTime.ofEpochSecond(
        math.floorDiv(r.dateRequestedMicros, 1000000L), 0,
        java.time.ZoneOffset.UTC).toLocalDate.toString
      (day, normalized(
        r.conversationId, r.dateRequestedMicros, r.dateCompletedMicros,
        r.lastSenderMessageTimestampMicros, r.slaDurationSeconds, r.status,
        r.failureReason, r.senderErrorCodes.map(_.map(Int.box).orNull),
        r.finalErrorCodes.map(_.map(Int.box).orNull),
        r.intermediateErrorCodes.map(Int.box),
        r.requestingPracticeAsid, r.sendingPracticeAsid,
        r.requestingSupplier, r.sendingSupplier,
        e.requesting.odsCode, e.requesting.name, e.requesting.sicblOdsCode,
        e.requesting.sicblName, e.sending.odsCode, e.sending.name,
        e.sending.sicblOdsCode, e.sending.sicblName))
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    windowDays.foreach { d =>
      val day = d.toString
      val want = if (dataDays(day)) sortRows(expectedRows(day)) else Seq.empty
      val got = sortRows(rows.getOrElse(day, Seq.empty))
      assert(got == want,
        s"day $day: model diverges from the reference vectors:\n got: $got\nwant: $want")
    }
  }
}
