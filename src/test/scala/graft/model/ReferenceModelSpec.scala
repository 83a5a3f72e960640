package graft.model

import graft.SparkSpec
import graft.cdc.{CdcPipeline, ChangeLogGen, Enrichment, GenConfig}
import graft.model.{ModelOracles => MO}
import org.apache.spark.sql.functions._

/** Engine ⇔ independent-model equivalence: the Spark engine and the
  * pure-Scala reference model (`ReferenceModel`, transliterated from the
  * reference Python, sharing only input fixtures) must agree bit-for-bit on
  * every c-family driver query — the golden pins the driver gate uses are
  * generated from the MODEL, so this suite is what keeps the engine honest
  * against them.
  */
class ReferenceModelSpec extends SparkSpec {

  private def engineClassified(cfg: GenConfig) =
    CdcPipeline.withRowSha(CdcPipeline.classify(
      ChangeLogGen.generate(spark, cfg), MO.CutoffMicros).toDF())

  /** Canonical per-row JSON from the engine side — the exact expression
    * row_sha256 hashes (same sorted-column struct).
    */
  private def engineJson(cfg: GenConfig): Map[String, String] = {
    val df = CdcPipeline.classify(
      ChangeLogGen.generate(spark, cfg), MO.CutoffMicros).toDF()
    val excluded = Set("duplicatesDropped", "danglingAcks", "unknownPurpose", "negativeSla")
    val cols = df.columns.filterNot(excluded).sorted.toIndexedSeq.map(col)
    df.select(col("repo"), to_json(struct(cols: _*)).as("j"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("model row JSON matches the engine's to_json byte for byte") {
    val cfg = GenConfig(numConversations = 60, hotConversations = 2, hotFragments = 16)
    val engine = engineJson(cfg)
    val model = ReferenceModel
      .classifyLog(MO.eventsOf(cfg), MO.CutoffMicros)
      .map(r => r.repo -> ReferenceModel.rowJson(r)).toMap
    assert(engine.keySet === model.keySet)
    val diffs = engine.keysIterator
      .filter(k => engine(k) != model(k)).toVector.sorted
    assert(diffs.isEmpty,
      s"\n${diffs.take(3).map(k => s"$k\n  engine: ${engine(k)}\n  model:  ${model(k)}").mkString("\n")}")
  }

  test("c01: engine rows equal the model pin rows") {
    val engine = engineClassified(MO.ClassifyCfg)
      .select("repo", "status", "failureReason", "slaDurationSeconds",
        "eventCount", "minOffset", "maxOffset", "row_sha256")
      .collect().map(_.toSeq).toVector
    val model = MO.c01.rows.map(_.toVector)
    assert(engine.map(_.toVector).sortBy(_.mkString("|")) ===
      model.sortBy(_.mkString("|")))
  }

  test("c02: engine enriched rows equal the model pin rows") {
    val engine = graft.SparkEntry.queries("c02_cdc_enriched")(spark, "")
      .collect().map(_.toSeq.toVector).toVector
    val model = MO.c02.rows.map(_.toVector)
    assert(engine.sortBy(_.mkString("|")) === model.sortBy(_.mkString("|")))
  }

  test("c03/c04/c05: engine aggregates equal the model pins") {
    val c03 = graft.SparkEntry.queries("c03_outcome_dist")(spark, "")
      .collect().map(_.toSeq.toVector).toVector
    assert(c03.sortBy(_.mkString("|")) ===
      MO.c03.rows.map(_.toVector).sortBy(_.mkString("|")))

    val c04 = graft.SparkEntry.queries("c04_cdc_checksum")(spark, "")
      .collect().map(_.toSeq.toVector).toVector
    assert(c04 === MO.c04.rows.map(_.toVector))

    val c05 = graft.SparkEntry.queries("c05_enrich_dist")(spark, "")
      .collect().map(_.toSeq.toVector).toVector
    assert(c05.sortBy(_.mkString("|")) ===
      MO.c05.rows.map(_.toVector).sortBy(_.mkString("|")))
  }

  test("row JSON escaping matches Jackson for control chars and quotes") {
    import spark.implicits._
    // a record whose strings exercise every escape class Jackson special-
    // cases (short escapes, \"/\\, and bare U+0001/U+000B) — the fixtures never
    // produce these, so lock the contract explicitly
    val rec = ReferenceModel.Rec(
      repo = "r\t1", conversationId = "c\"x\\y\n",
      slaDurationSeconds = Some(3L),
      requestingPracticeAsid = "a\u0001b\u000bc", sendingPracticeAsid = "s\r\f\b",
      requestingSupplier = Some("Sys\tOne"), sendingSupplier = None,
      senderErrorCodes = Vector(None, Some(12)), finalErrorCodes = Vector(),
      intermediateErrorCodes = Vector(7), status = "S", failureReason = None,
      dateRequestedMicros = 5L, dateCompletedMicros = None,
      lastSenderMessageTimestampMicros = Some(9L),
      eventCount = 1L, minOffset = 0L, maxOffset = 0L)
    val df = Seq((rec.repo, rec.conversationId, rec.slaDurationSeconds,
      rec.requestingPracticeAsid, rec.sendingPracticeAsid,
      rec.requestingSupplier, rec.sendingSupplier,
      rec.senderErrorCodes, rec.finalErrorCodes, rec.intermediateErrorCodes,
      rec.status, rec.failureReason, rec.dateRequestedMicros,
      rec.dateCompletedMicros, rec.lastSenderMessageTimestampMicros,
      rec.eventCount, rec.minOffset, rec.maxOffset))
      .toDF("repo", "conversationId", "slaDurationSeconds",
        "requestingPracticeAsid", "sendingPracticeAsid", "requestingSupplier",
        "sendingSupplier", "senderErrorCodes", "finalErrorCodes",
        "intermediateErrorCodes", "status", "failureReason",
        "dateRequestedMicros", "dateCompletedMicros",
        "lastSenderMessageTimestampMicros", "eventCount", "minOffset",
        "maxOffset")
    val cols = df.columns.sorted.toIndexedSeq.map(col)
    val engine = df.select(to_json(struct(cols: _*))).collect().head.getString(0)
    assert(engine === ReferenceModel.rowJson(rec))
  }

  test("redelivery-heavy multi-epoch alternate config agrees end to end") {
    val cfg = GenConfig(numConversations = 120, seed = 7L, hotConversations = 3,
      hotFragments = 40, redeliveryPermille = 200, epochs = 3)
    val engine = engineClassified(cfg)
      .select("repo", "row_sha256").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val model = ReferenceModel.classifyLog(MO.eventsOf(cfg), MO.CutoffMicros)
      .map(r => r.repo -> r.rowSha).toMap
    assert(engine === model)
  }

  test("enrichment fallback edges agree: all-fallback and all-miss dims") {
    val cfg = GenConfig(numConversations = 40, hotConversations = 1, hotFragments = 8)
    val transfers = CdcPipeline.classify(
      ChangeLogGen.generate(spark, cfg), MO.CutoffMicros).toDF()
    val recs = ReferenceModel.classifyLog(MO.eventsOf(cfg), MO.CutoffMicros)
    // request months are all 202001: a 201912-only dim resolves purely via
    // the one-month fallback; a 201911-only dim must null-pad everything
    for (months <- Seq(Seq(201912), Seq(201911))) {
      val dimRows = Enrichment.dimRows(97, months)
      val engine = Enrichment.enrich(transfers,
          Enrichment.generateDim(spark, 97, months))
        .select("repo", "requesting_practice_ods_code", "requesting_practice_name",
          "sending_practice_sicbl_ods_code", "sending_practice_sicbl_name")
        .collect().map(r => r.getString(0) ->
          (r.getString(1), r.getString(2), r.getString(3), r.getString(4))).toMap
      val model = ReferenceModel.enrich(recs, dimRows).map { e =>
        e.rec.repo -> (e.requesting.odsCode.orNull, e.requesting.name.orNull,
          e.sending.sicblOdsCode.orNull, e.sending.sicblName.orNull)
      }.toMap
      assert(engine === model, s"months=$months")
    }
  }
}
