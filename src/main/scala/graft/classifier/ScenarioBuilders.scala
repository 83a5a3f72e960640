package graft.classifier

/** Deterministic port of the reference scenario corpus —
  * `tests/builders/test_cases.py` (GP2GPTestCase fluent builder, :17-129,
  * and the ~28 named scenarios below it). Reference uses random times/ids;
  * here everything is seeded off a monotonic per-case counter so goldens
  * are stable.
  */
object Times {
  val base: Long   = 1577836800000000L // 2020-01-01T00:00:00Z in micros
  val second: Long = 1000000L
  val minute: Long = 60L * second
  val hour: Long   = 60L * minute
  val day: Long    = 24L * hour
}

final class GP2GPCase(
    val conversationId: String = "conv-1",
    val requestingAsid: String = "123456789012",
    val sendingAsid: String = "987654321098",
    val requestingSystem: String = "SystemOne",
    val sendingSystem: String = "Vision",
) {
  import Times._
  private val msgs = Vector.newBuilder[SpineMessage]
  private var seq = 0
  private def tick(): Long = { seq += 1; base + seq * minute }
  private var guidSeq = 0
  private def aGuid(): String = { guidSeq += 1; s"$conversationId-g$guidSeq" }

  /** test_cases.py:26-40 — request guid == conversation id */
  def withRequest(time: Long = -1): GP2GPCase = {
    msgs += SpineMessage(if (time >= 0) time else tick(), conversationId, conversationId,
      Interactions.EhrRequestStarted, requestingAsid, sendingAsid, None, None,
      Some(requestingSystem), Some(sendingSystem))
    this
  }

  /** test_cases.py:42-58 */
  def withSenderAck(messageRef: String, time: Long = -1, errorCode: Option[Int] = None): GP2GPCase = {
    msgs += SpineMessage(if (time >= 0) time else tick(), conversationId, aGuid(),
      Interactions.ApplicationAck, sendingAsid, requestingAsid, Some(messageRef), errorCode,
      Some(sendingSystem), Some(requestingSystem))
    this
  }

  /** test_cases.py:60-75 */
  def withRequesterAck(messageRef: String, time: Long = -1, errorCode: Option[Int] = None): GP2GPCase = {
    msgs += SpineMessage(if (time >= 0) time else tick(), conversationId, aGuid(),
      Interactions.ApplicationAck, requestingAsid, sendingAsid, Some(messageRef), errorCode,
      Some(requestingSystem), Some(sendingSystem))
    this
  }

  /** test_cases.py:77-92 */
  def withCoreEhr(guid: String = null, time: Long = -1): GP2GPCase = {
    msgs += SpineMessage(if (time >= 0) time else tick(), conversationId,
      Option(guid).getOrElse(aGuid()), Interactions.EhrRequestCompleted,
      sendingAsid, requestingAsid, None, None, Some(sendingSystem), Some(requestingSystem))
    this
  }

  /** test_cases.py:94-109 — continue sent BY the requester */
  def withCopcContinue(time: Long = -1): GP2GPCase = {
    msgs += SpineMessage(if (time >= 0) time else tick(), conversationId, aGuid(),
      Interactions.CommonPointToPoint, requestingAsid, sendingAsid, None, None,
      Some(requestingSystem), Some(sendingSystem))
    this
  }

  /** test_cases.py:111-126 — fragment sent BY the sender */
  def withCopcFragment(guid: String = null, time: Long = -1): GP2GPCase = {
    msgs += SpineMessage(if (time >= 0) time else tick(), conversationId,
      Option(guid).getOrElse(aGuid()), Interactions.CommonPointToPoint,
      sendingAsid, requestingAsid, None, None, Some(sendingSystem), Some(requestingSystem))
    this
  }

  def build(): Vector[SpineMessage] = msgs.result()
}

/** Named scenarios — exact message shapes of test_cases.py:132-937, times
  * made deterministic (increasing per builder call unless pinned).
  */
object Scenarios {
  import Times._
  private val Dup = Some(ErrorCodes.Duplicate)
  private val Sup = Some(ErrorCodes.Suppressed)
  private def c() = new GP2GPCase()
  private def cid = "conv-1"

  /** test_cases.py:132 */
  def requestMade: Vector[SpineMessage] = c().withRequest().build()

  /** test_cases.py:152 */
  def requestAcknowledgedSuccessfully: Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid).build()

  /** test_cases.py:169 */
  def requestAcknowledgedWithError(code: Int = 19): Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid, errorCode = Some(code)).build()

  /** test_cases.py:183 */
  def coreEhrSent: Vector[SpineMessage] = {
    val reqComplete = base + day
    c().withRequest()
      .withSenderAck(cid, time = reqComplete - hour)
      .withCoreEhr(time = reqComplete).build()
  }

  /** test_cases.py:201 */
  def coreEhrSentWithSenderError(code: Int = 99): Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid, errorCode = Some(code)).withCoreEhr().build()

  /** test_cases.py:218 */
  def acknowledgedDuplicateAndWaitingForIntegration: Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid)
      .withCoreEhr(guid = "ehr").withCoreEhr(guid = "dup-ehr")
      .withRequesterAck("dup-ehr", errorCode = Dup).build()

  /** test_cases.py:241 */
  def onlyAcknowledgedDuplicates: Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid)
      .withCoreEhr(guid = "ehr").withCoreEhr(guid = "dup-ehr")
      .withRequesterAck("dup-ehr", errorCode = Dup)
      .withRequesterAck("ehr", errorCode = Dup).build()

  /** test_cases.py:264 */
  def unacknowledgedDuplicateWithCopcsAndWaitingForIntegration: Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid)
      .withCoreEhr(guid = "ehr").withCoreEhr(guid = "dup-ehr")
      .withCopcContinue()
      .withCopcFragment(guid = "f1").withCopcFragment(guid = "f2")
      .withRequesterAck("f1")
      .withRequesterAck("dup-ehr", errorCode = Dup).build()

  /** test_cases.py:294 — ehr ack one day after core ehr */
  def ehrIntegratedSuccessfully(
      reqCompleteTime: Long = base + hour,
      ehrAckTime: Long = base + hour + day): Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid)
      .withCoreEhr(guid = "ehr", time = reqCompleteTime)
      .withRequesterAck("ehr", time = ehrAckTime).build()

  /** test_cases.py:313 — integrated after 9 days */
  def ehrIntegratedLate: Vector[SpineMessage] =
    ehrIntegratedSuccessfully(base + hour, base + hour + 9 * day)

  /** test_cases.py:333 */
  def ehrSuppressed: Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid)
      .withCoreEhr(guid = "ehr", time = base + hour)
      .withRequesterAck("ehr", time = base + hour + day, errorCode = Sup).build()

  /** test_cases.py:355 */
  def ehrIntegrationFailed(code: Int = 28): Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid)
      .withCoreEhr(guid = "ehr")
      .withRequesterAck("ehr", errorCode = Some(code)).build()

  /** test_cases.py:377 — ack referencing a nonexistent message */
  def ehrMissingMessageForAnAcknowledgement: Vector[SpineMessage] =
    c().withRequest().withSenderAck("no-such-guid").build()

  /** test_cases.py:394 */
  def ehrIntegratedAfterDuplicate: Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid)
      .withCoreEhr(guid = "ehr", time = base + hour).withCoreEhr(guid = "dup-ehr")
      .withRequesterAck("dup-ehr", errorCode = Dup)
      .withRequesterAck("ehr", time = base + hour + day).build()

  /** test_cases.py:421 */
  def integrationFailedAfterDuplicate(code: Int = 11): Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid)
      .withCoreEhr(guid = "ehr", time = base + hour).withCoreEhr(guid = "dup-ehr")
      .withRequesterAck("dup-ehr", errorCode = Dup)
      .withRequesterAck("ehr", time = base + hour + day, errorCode = Some(code)).build()

  /** test_cases.py:451 */
  def firstEhrIntegratedAfterSecondEhrFailed(code: Int = 11): Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid)
      .withCoreEhr(guid = "ehr1", time = base + hour).withCoreEhr(guid = "ehr2")
      .withRequesterAck("ehr2", errorCode = Some(code))
      .withRequesterAck("ehr1", time = base + hour + day).build()

  /** test_cases.py:477 */
  def firstEhrIntegratedBeforeSecondEhrFailed(code: Int = 11): Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid)
      .withCoreEhr(guid = "ehr1", time = base + hour).withCoreEhr(guid = "ehr2")
      .withRequesterAck("ehr1", time = base + hour + day)
      .withRequesterAck("ehr2", errorCode = Some(code)).build()

  /** test_cases.py:503 */
  def secondEhrIntegratedAfterFirstEhrFailed(code: Int = 11): Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid)
      .withCoreEhr(guid = "ehr1").withCoreEhr(guid = "ehr2", time = base + hour)
      .withRequesterAck("ehr1", errorCode = Some(code))
      .withRequesterAck("ehr2", time = base + hour + day).build()

  /** test_cases.py:529 */
  def secondEhrIntegratedBeforeFirstEhrFailed(code: Int = 11): Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid)
      .withCoreEhr(guid = "ehr1").withCoreEhr(guid = "ehr2", time = base + hour)
      .withRequesterAck("ehr2", time = base + hour + day)
      .withRequesterAck("ehr1", errorCode = Some(code)).build()

  /** test_cases.py:555 — third EHR copy re-sent after integration, replacing
    * the first duplicate's map entry (dict-overwrite semantics).
    */
  def ehrIntegratedWithDuplicateHavingSecondSenderAckAfterIntegration: Vector[SpineMessage] = {
    val reqComplete = base + 4 * hour
    val ehrAck      = reqComplete // ehr_ack_time defaults to req_complete_time
    c().withRequest()
      .withSenderAck(cid, time = ehrAck - hour)
      .withCoreEhr(guid = "dup-ehr", time = reqComplete - hour)
      .withCoreEhr(guid = "ehr", time = reqComplete)
      .withRequesterAck("dup-ehr", errorCode = Dup)
      .withRequesterAck("ehr", time = ehrAck)
      .withCoreEhr(guid = "dup-ehr", time = ehrAck + hour).build()
  }

  /** test_cases.py:590 */
  def multipleIntegrationFailures(codes: Seq[Int] = Seq(99, 28, 21)): Vector[SpineMessage] = {
    var t = c().withRequest().withSenderAck(cid)
    val guids = codes.indices.map(i => s"ehr$i")
    guids.foreach(g => t = t.withCoreEhr(guid = g))
    codes.zip(guids).foreach { case (code, g) =>
      t = t.withRequesterAck(g, errorCode = Some(code))
    }
    t.build()
  }

  /** test_cases.py:617 */
  def copcContinueSent: Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid).withCoreEhr().withCopcContinue().build()

  /** test_cases.py:636 */
  def copcFragmentFailure(code: Int = 30): Vector[SpineMessage] = {
    val fragTime = base + 4 * hour
    c().withRequest()
      .withSenderAck(cid, time = fragTime - 2 * hour)
      .withCoreEhr(time = fragTime - hour)
      .withCopcContinue()
      .withCopcFragment(guid = "frag", time = fragTime)
      .withRequesterAck("frag", errorCode = Some(code)).build()
  }

  /** test_cases.py:662 */
  def copcFragmentFailureAndMissingCopcFragmentAck(code: Int = 30): Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid).withCoreEhr().withCopcContinue()
      .withCopcFragment(guid = "frag")
      .withRequesterAck("frag", errorCode = Some(code))
      .withCopcFragment().build()

  /** test_cases.py:687 */
  def successfulIntegrationWithCopcFragments: Vector[SpineMessage] = {
    val reqComplete = base + hour
    c().withRequest().withSenderAck(cid)
      .withCoreEhr(guid = "ehr", time = reqComplete)
      .withCopcContinue()
      .withCopcFragment(guid = "f1").withCopcFragment(guid = "f2")
      .withRequesterAck("f1").withRequesterAck("f2")
      .withCopcFragment(guid = "f3").withRequesterAck("f3")
      .withRequesterAck("ehr", time = reqComplete + day).build()
  }

  /** test_cases.py:719 */
  def pendingIntegrationWithCopcFragments: Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid).withCoreEhr(guid = "ehr").withCopcContinue()
      .withCopcFragment().withCopcFragment().withCopcFragment().build()

  /** test_cases.py:742 */
  def pendingIntegrationWithAckedCopcFragments: Vector[SpineMessage] =
    c().withRequest().withSenderAck(cid).withCoreEhr(guid = "ehr").withCopcContinue()
      .withCopcFragment(guid = "f1").withCopcFragment(guid = "f2")
      .withRequesterAck("f1").withRequesterAck("f2")
      .withCopcFragment(guid = "f3").withRequesterAck("f3").build()

  /** test_cases.py:771 */
  def copcFragmentFailures(codes: Seq[Int] = Seq(20, 29, 30)): Vector[SpineMessage] = {
    var t = c().withRequest().withSenderAck(cid).withCoreEhr().withCopcContinue()
    val guids = codes.indices.map(i => s"f$i")
    guids.foreach(g => t = t.withCopcFragment(guid = g))
    codes.zip(guids).foreach { case (code, g) =>
      t = t.withRequesterAck(g, errorCode = Some(code))
    }
    t.build()
  }

  /** test_cases.py:800 — three EHRs; second gets duplicate ack + `ehrAckCode`
    * ack; first a duplicate ack; third no ack.
    */
  private def concludedWithConflictingAcksAndDuplicateEhrs(
      ehrAckCode: Option[Int]): Vector[SpineMessage] = {
    val reqComplete = base + hour
    val ehrAck      = reqComplete + 4 * hour
    c().withRequest().withSenderAck(cid)
      .withCoreEhr(guid = "ehr1")
      .withCoreEhr(guid = "ehr2", time = reqComplete)
      .withCoreEhr(guid = "ehr3")
      .withRequesterAck("ehr2", errorCode = Dup)
      .withRequesterAck("ehr2", errorCode = ehrAckCode, time = ehrAck)
      .withRequesterAck("ehr1", errorCode = Dup).build()
  }

  /** test_cases.py:826 */
  def ehrIntegratedWithConflictingAcksAndDuplicateEhrs: Vector[SpineMessage] =
    concludedWithConflictingAcksAndDuplicateEhrs(None)

  /** test_cases.py:835 */
  def ehrSuppressedWithConflictingAcksAndDuplicateEhrs: Vector[SpineMessage] =
    concludedWithConflictingAcksAndDuplicateEhrs(Sup)

  /** test_cases.py:846 */
  def integrationFailedWithConflictingAcksAndDuplicateEhrs(code: Int = 11): Vector[SpineMessage] =
    concludedWithConflictingAcksAndDuplicateEhrs(Some(code))

  /** test_cases.py:856 — one EHR, several conflicting acks */
  private def concludedWithConflictingAcks(
      codesAndTimes: Seq[(Option[Int], Long)]): Vector[SpineMessage] = {
    val reqComplete = base + hour
    var t = c().withRequest().withSenderAck(cid).withCoreEhr(guid = "ehr", time = reqComplete)
    codesAndTimes.foreach { case (code, time) =>
      t = t.withRequesterAck("ehr", errorCode = code, time = time)
    }
    t.build()
  }

  /** test_cases.py:880 */
  def ehrIntegratedWithConflictingDuplicateAndConflictingErrorAck: Vector[SpineMessage] = {
    val reqComplete = base + hour
    concludedWithConflictingAcks(Seq(
      (Some(11), reqComplete + hour), (Dup, reqComplete + 2 * hour),
      (None, reqComplete + 4 * hour)))
  }

  /** test_cases.py:900 */
  def ehrSuppressedWithConflictingDuplicateAndConflictingErrorAck: Vector[SpineMessage] = {
    val reqComplete = base + hour
    concludedWithConflictingAcks(Seq(
      (Some(11), reqComplete + hour), (Dup, reqComplete + 2 * hour),
      (Sup, reqComplete + 4 * hour)))
  }

  /** test_cases.py:920 */
  def multipleSenderAcknowledgements(codes: Seq[Option[Int]]): Vector[SpineMessage] = {
    var t = c().withRequest()
    codes.foreach(code => t = t.withSenderAck(cid, errorCode = code))
    t.build()
  }
}
