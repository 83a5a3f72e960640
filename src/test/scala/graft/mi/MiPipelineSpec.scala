package graft.mi

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MI-branch semantics (mi_service.py fold) + the JSON scan path. */
class MiPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = MiPipeline.parseEvents(MiGen.generate(spark, 50), "json")
  private lazy val transfers = MiPipeline.toMiTransfers(events).cache()

  test("JSON parse: nested payload fields are typed and reachable") {
    val e3 = events.filter($"eventType" === "EHR_SENT" && $"conversationId" === "mi-conv-00000001")
    val row = e3.select(
      col("payload.ehr.ehrTotalSizeBytes"),
      col("payload.ehr.degrade").getItem(0).getField("code").getField("coding")
        .getItem(0).getField("code"),
      col("payload.ehr.attachment").getItem(0).getField("mimeType")).collect().head
    assert(row.getLong(0) == 1001L)
    assert(row.getString(1) == "1.2.3")
    assert(row.getString(2) == "application/pdf")
  }

  test("json files round-trip through readEvents (S5 prefix scan)") {
    val dir = tmpDir("mi-json")
    MiGen.generate(spark, 10).coalesce(1).write.mode("overwrite").text(dir)
    val read = MiPipeline.readEvents(spark, dir)
    assert(read.count() == events.filter($"conversationId" < "mi-conv-00000010").count())
    assert(read.filter($"payload.ehr.ehrTotalSizeBytes".isNotNull).count() == 10)
  }

  test("supplier deduction: first event's reporter requests, second's sends") {
    val t = transfers.filter($"conversation_id" === "mi-conv-00000002").collect().head
    assert(t.getAs[String]("requesting_supplier") == "EMIS Web") // conv 2: even
    assert(t.getAs[String]("sending_supplier") == "EMIS Web")    // conv 2 % 3 != 0
    val t3 = transfers.filter($"conversation_id" === "mi-conv-00000003").collect().head
    assert(t3.getAs[String]("requesting_supplier") == "SystemOne")
    assert(t3.getAs[String]("sending_supplier") == "Vision")
  }

  test("ODS codes resolve via find-first over arrival order") {
    val t = transfers.filter($"conversation_id" === "mi-conv-00000001").collect().head
    assert(t.getAs[String]("requesting_ods_code") == "R00001") // first non-null: event 2
    assert(t.getAs[String]("sending_ods_code") == "S00001")    // first non-null: event 3
  }

  test("slow_transfer: >1 day true, same-day false, never-validated null") {
    val rows = transfers.select("conversation_id", "slow_transfer").collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Boolean])).toMap
    assert(rows("mi-conv-00000005").contains(true))   // slow (5 % 5 == 0)
    assert(rows("mi-conv-00000001").contains(false))  // on time
    assert(rows("mi-conv-00000007").isEmpty)          // never validated → null
  }

  test("events list is complete and in arrival order") {
    val t = transfers.filter($"conversation_id" === "mi-conv-00000001").collect().head
    val evs = t.getSeq[org.apache.spark.sql.Row](t.fieldIndex("events"))
    assert(evs.map(_.getAs[String]("event_type")) ==
      Seq("REGISTRATION_STARTED", "EHR_REQUESTED", "EHR_SENT", "EHR_VALIDATED", "EHR_INTEGRATED"))
    assert(evs.map(_.getAs[String]("event_id")) == (1 to 5).map(i => s"mi-conv-00000001-e$i"))
  }

  test("BST datetimes normalize: generated timestamps are tz-consistent") {
    // conv 3 event 1: (3+1)%4==0 → BST-suffixed; parseTz must subtract 1h so
    // the event lands at the same UTC instant as the UTC-suffixed variant
    val parsed = events.filter($"conversationId" === "mi-conv-00000003" && $"seq" === 1)
      .select(MiPipeline.parseTz(col("eventGeneratedDateTime"))).collect().head.getTimestamp(0)
    assert(parsed.toInstant.toString == "2023-03-01T08:03:01Z")
  }
}
