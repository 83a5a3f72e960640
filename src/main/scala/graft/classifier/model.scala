package graft.classifier

/** Spine message event — the typed fact row of the engine.
  *
  * Semantics donor: reference `src/prmdata/domain/spine/message.py:23-48`
  * (`Message(NamedTuple)`). Times are epoch MICROSECONDS UTC (the reference
  * stores `pa.timestamp("us")`, `pipeline/arrow.py:68-74`); keeping a Long
  * in flight avoids timezone hazards and is codegen/encoder friendly.
  */
final case class SpineMessage(
    timeMicros: Long,
    conversationId: String,
    guid: String,
    interactionId: String,
    fromPartyAsid: String,
    toPartyAsid: String,
    messageRef: Option[String],
    errorCode: Option[Int],
    fromSystem: Option[String],
    toSystem: Option[String],
) {
  // reference message.py:35-48
  def isEhrRequestStarted: Boolean  = interactionId == Interactions.EhrRequestStarted
  def isEhrRequestCompleted: Boolean = interactionId == Interactions.EhrRequestCompleted
  def isAcknowledgement: Boolean    = interactionId == Interactions.ApplicationAck
  def isCopc: Boolean               = interactionId == Interactions.CommonPointToPoint
}

/** Interaction-id constants — reference `message.py:9-12`. */
object Interactions {
  val EhrRequestStarted   = "urn:nhs:names:services:gp2gp/RCMR_IN010000UK05"
  val EhrRequestCompleted = "urn:nhs:names:services:gp2gp/RCMR_IN030000UK06"
  val ApplicationAck      = "urn:nhs:names:services:gp2gp/MCCI_IN010000UK13"
  val CommonPointToPoint  = "urn:nhs:names:services:gp2gp/COPC_IN000001UK01"
}

/** Sentinel error codes — reference `message.py:14-16`. */
object ErrorCodes {
  val Suppressed  = 15
  val Duplicate   = 12
  val FatalSender: Set[Int] = Set(6, 7, 10, 14, 23, 24, 99, 30)
}

/** A message paired with its acknowledgements —
  * reference `gp2gp_conversation.py:15-35` (`AcknowledgedMessage`).
  */
final case class AckedMessage(
    message: SpineMessage,
    acknowledgements: Vector[SpineMessage],
) {
  def hasAcknowledgements: Boolean = acknowledgements.nonEmpty
  def fromAsid: String             = message.fromPartyAsid
  def toAsid: String               = message.toPartyAsid
  def isSentBy(asid: String): Boolean = message.fromPartyAsid == asid
}

/** Transfer status enum display values — reference `transfer_outcome.py:9-14`. */
object TransferStatus {
  val IntegratedOnTime    = "Integrated on time"
  val TechnicalFailure    = "Technical failure"
  val ProcessFailure      = "Process failure"
  val UnclassifiedFailure = "Unclassified failure"
}

/** Failure-reason enum display values — reference `transfer_outcome.py:16-26`. */
object FailureReason {
  val IntegratedLate                     = "Integrated late"
  val FinalError                         = "Final error"
  val TransferredNotIntegrated           = "Transferred, not integrated"
  val RequestNotAcknowledged             = "Request not acknowledged"
  val CoreEhrNotSent                     = "Core extract not sent"
  val FatalSenderError                   = "Contains fatal sender error"
  val CopcNotSent                        = "COPC(s) not sent"
  val CopcNotAcknowledged                = "COPC(s) not acknowledged"
  val TransferredNotIntegratedWithError  = "Transferred, not integrated, with error"
  val AmbiguousCopcs                     = "Ambiguous COPC messages"
}

/** Classified output fact row — reference `transfer.py:18-45` (`Transfer`),
  * flattened as the reference's own sink does (`pipeline/arrow.py:33-75`).
  * Practice (ods/sicbl) enrichment columns are added downstream by a
  * broadcast dimension join (reference `transfer_service.py:98-126`), not here.
  * Error-code lists keep interior nulls (reference golden `[[null]]` —
  * `expected_outputs/2019-12-02-transferParquet.json:12`), hence Seq[Option[Int]].
  */
final case class Transfer(
    conversationId: String,
    slaDurationSeconds: Option[Long],
    requestingPracticeAsid: String,
    sendingPracticeAsid: String,
    requestingSupplier: Option[String],
    sendingSupplier: Option[String],
    senderErrorCodes: Seq[Option[Int]],
    finalErrorCodes: Seq[Option[Int]],
    intermediateErrorCodes: Seq[Int],
    status: String,
    failureReason: Option[String],
    dateRequestedMicros: Long,
    dateCompletedMicros: Option[Long],
    lastSenderMessageTimestampMicros: Option[Long],
)
