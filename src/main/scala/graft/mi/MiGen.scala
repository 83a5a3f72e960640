package graft.mi

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic MI-event JSON generator (wire-format camelCase, nested
  * payloads) — the fixture source for the MI branch. Pure function of
  * (conversation index, event index); BST suffixes on ~1/4 of datetimes.
  */
object MiGen {
  private def ts(convIdx: Long, i: Int, plusDays: Int = 0): String = {
    val base = java.time.LocalDateTime.of(2023, 3, 1, 8, 0, 0)
      .plusMinutes(convIdx % 10000).plusSeconds(i.toLong).plusDays(plusDays.toLong)
    val s = base.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    if ((convIdx + i) % 4 == 0) {
      val bst = base.plusHours(1)
      bst.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")) + " BST"
    } else s + " UTC"
  }

  /** One conversation's JSON event lines. Slow transfers: every 5th
    * conversation validates 2 days after request; every 7th never validates
    * (slow_transfer = null).
    */
  def conversationEvents(convIdx: Long): Seq[String] = {
    val conv = f"mi-conv-$convIdx%08d"
    val reqSupplier = if (convIdx % 2 == 0) "EMIS Web" else "SystemOne"
    val sndSupplier = if (convIdx % 3 == 0) "Vision" else "EMIS Web"
    val reqOds = f"R$convIdx%05d"
    val sndOds = f"S$convIdx%05d"
    val slow = convIdx % 5 == 0
    val neverValidated = convIdx % 7 == 0

    def ev(i: Int, etype: String, supplier: String, payload: String, plusDays: Int = 0) =
      s"""{"conversationId":"$conv","eventId":"$conv-e$i","eventType":"$etype",""" +
        s""""transferProtocol":"GP2GP","eventGeneratedDateTime":"${ts(convIdx, i, plusDays)}",""" +
        s""""reportingSystemSupplier":"$supplier","reportingPracticeOdsCode":"$reqOds",""" +
        s""""transferEventDateTime":"${ts(convIdx, i, plusDays)}","seq":$i,"payload":$payload}"""

    val registrationP =
      s"""{"registration":{"registrationType":"NEW","requestingPracticeOdsCode":null,"sendingPracticeOdsCode":null}}"""
    val requestedP =
      s"""{"registration":{"registrationType":"NEW","requestingPracticeOdsCode":"$reqOds","sendingPracticeOdsCode":null}}"""
    val ehrP =
      s"""{"registration":{"sendingPracticeOdsCode":"$sndOds"},"ehr":{"ehrTotalSizeBytes":${1000 + convIdx % 5000},""" +
        s""""ehrStructuredSizeBytes":${500 + convIdx % 2000},""" +
        s""""degrade":[{"type":"MEDICATION","metadata":"degraded","code":{"coding":[{"code":"1.2.3","system":"SNOMED"}]}}],""" +
        s""""attachment":[{"attachmentId":"a1","clinicalType":"SCANNED_DOCUMENT","mimeType":"application/pdf","sizeBytes":"3084322"}],""" +
        s""""placeholder":[],"unsupportedDataItem":[],"error":[]}}"""
    val integrationP =
      s"""{"integration":{"integrationStatus":"INTEGRATED","reason":"ok"}}"""

    val base = Seq(
      ev(1, "REGISTRATION_STARTED", reqSupplier, registrationP),
      ev(2, "EHR_REQUESTED", sndSupplier, requestedP),
      ev(3, "EHR_SENT", sndSupplier, ehrP),
    )
    val validated =
      if (neverValidated) Seq.empty
      else Seq(ev(4, "EHR_VALIDATED", sndSupplier, "{}", plusDays = if (slow) 2 else 0))
    val integrated =
      if (neverValidated) Seq.empty
      else Seq(ev(5, "EHR_INTEGRATED", reqSupplier, integrationP, plusDays = if (slow) 2 else 0))
    base ++ validated ++ integrated
  }

  /** Distributed, parallelism-independent generator of raw JSON lines. */
  def generate(spark: SparkSession, numConversations: Long): DataFrame = {
    import spark.implicits._
    spark.range(0L, numConversations)
      .flatMap(conversationEvents(_)).toDF("json")
  }
}
