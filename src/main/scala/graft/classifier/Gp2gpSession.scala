package graft.classifier

import scala.collection.mutable

/** A parsed per-conversation event session, exposing the predicates the
  * outcome state machine consumes.
  *
  * Semantics donor: reference `src/prmdata/domain/spine/gp2gp_conversation.py:73-321`
  * (`Gp2gpConversation`). Pure Scala — no Spark dependency — so it runs inside
  * a typed `mapGroups`/`flatMapGroupsWithState` fold and is unit-testable
  * against the ported scenario corpus.
  *
  * Construction returns None when the first message is not an
  * EHR-request-started (reference raises `ConversationMissingStart`,
  * `gp2gp_conversation.py:79-81`; service drops silently,
  * `transfer_service.py:79-87`).
  */
final class Gp2gpSession private (
    val messages: Vector[SpineMessage],
    val requestStarted: AckedMessage,
    val requestCompleted: Vector[AckedMessage],
    val copcContinue: Vector[SpineMessage],
    val copcFragments: Vector[AckedMessage],
) {
  import Gp2gpSession._

  // effective EHR selection — gp2gp_conversation.py:290-321
  val effective: Option[(SpineMessage, SpineMessage)] =
    findEffectiveRequestCompleted(requestCompleted)
  private def effectiveEhr: Option[SpineMessage]    = effective.map(_._1)
  private def effectiveEhrAck: Option[SpineMessage] = effective.map(_._2)

  def conversationId: String        = requestStarted.message.conversationId
  def sendingPracticeAsid: String   = requestStarted.toAsid
  def requestingPracticeAsid: String = requestStarted.fromAsid
  def requestingSupplier: Option[String] = requestStarted.message.fromSystem
  def sendingSupplier: Option[String]    = requestStarted.message.toSystem
  def dateRequestedMicros: Long     = requestStarted.message.timeMicros

  /** gp2gp_conversation.py:117-123 — all acks of all EHRs, nulls KEPT. */
  def finalErrorCodes: Vector[Option[Int]] =
    for (m <- requestCompleted; ack <- m.acknowledgements) yield ack.errorCode

  /** gp2gp_conversation.py:125 — acks of the request, nulls KEPT. */
  def senderErrorCodes: Vector[Option[Int]] =
    requestStarted.acknowledgements.map(_.errorCode)

  /** gp2gp_conversation.py:127-133 — acks of fragments, nulls DROPPED. */
  def intermediateErrorCodes: Vector[Int] =
    for (m <- copcFragments; ack <- m.acknowledgements; code <- ack.errorCode) yield code

  // sender messages — gp2gp_conversation.py:131-160
  private val senderMessages: Vector[SpineMessage] =
    messages.filter(_.fromPartyAsid == sendingPracticeAsid)

  def lastSenderMessageTimestampMicros: Option[Long] = {
    if (senderMessages.isEmpty) None
    else if (isIntegrated) {
      val bound = effectiveFinalAcknowledgementTimeMicros.get
      val inWindow = senderMessages.collect { case m if m.timeMicros <= bound => m.timeMicros }
      if (inWindow.isEmpty) None else Some(inWindow.max)
    } else Some(senderMessages.map(_.timeMicros).max)
  }

  def isIntegrated: Boolean =
    effectiveEhrAck.exists(integratedOrSuppressed)

  def hasConcludedWithFailure: Boolean =
    effectiveEhrAck.exists(ack => !integratedOrSuppressed(ack))

  def isMissingFinalAck: Boolean = effectiveEhrAck.isEmpty

  def isMissingRequestAcknowledged: Boolean = !requestStarted.hasAcknowledgements

  def isMissingCoreEhr: Boolean = requestCompleted.isEmpty

  def isMissingCopc: Boolean = copcContinue.nonEmpty && copcFragments.isEmpty

  def isMissingCopcAck: Boolean = copcFragments.exists(!_.hasAcknowledgements)

  def containsCopcError: Boolean =
    copcFragments.exists(_.acknowledgements.exists(_.errorCode.isDefined))

  def containsFatalSenderErrorCode: Boolean =
    requestStarted.acknowledgements.exists(_.errorCode.exists(ErrorCodes.FatalSender.contains))

  def containsCoreEhrWithSenderError: Boolean =
    !isMissingCoreEhr && requestStarted.acknowledgements.exists(_.errorCode.isDefined)

  def effectiveRequestCompletedTimeMicros: Option[Long] = effectiveEhr.map(_.timeMicros)

  def effectiveFinalAcknowledgementTimeMicros: Option[Long] = effectiveEhrAck.map(_.timeMicros)

  def containsCopcFragments: Boolean = copcContinue.nonEmpty || copcFragments.nonEmpty

  /** gp2gp_conversation.py:212-218 */
  def containsUnacknowledgedDuplicateEhrAndCopcFragments: Boolean =
    countDuplicateErrors > 0 && containsCopcFragments && !allEhrAcknowledged

  /** gp2gp_conversation.py:220-221 */
  def containsOnlyDuplicateEhr: Boolean = allEhrAcknowledged && allEhrAcksAreDuplicates

  private def allEhrAcknowledged: Boolean = requestCompleted.forall(_.hasAcknowledgements)

  private def allEhrAcksAreDuplicates: Boolean =
    requestCompleted.forall(_.acknowledgements.forall(_.errorCode.contains(ErrorCodes.Duplicate)))

  private def countDuplicateErrors: Int =
    finalErrorCodes.count(_.contains(ErrorCodes.Duplicate))
}

object Gp2gpSession {

  /** Observability hooks (reference probes): dangling acks and
    * unknown-purpose messages (`gp2gp_conversation.py:51-70`) and
    * negative-SLA clamps (`transfer_service.py:176-178`) are counted, not
    * logged row-wise — the fold surfaces them per session and the engine
    * sums them into manifest lineage.
    */
  final class Counters {
    var danglingAcks: Long   = 0
    var unknownPurpose: Long = 0
    var negativeSla: Long    = 0
  }
  private val noopCounters = new Counters

  /** Parse a time-sorted message list into a session; None ⇔ missing start. */
  def parse(messages: Vector[SpineMessage], counters: Counters = noopCounters): Option[Gp2gpSession] = {
    if (messages.isEmpty || !messages.head.isEhrRequestStarted) return None

    val acked = pairMessagesWithAcks(messages, counters)

    // group by type — gp2gp_conversation.py:253-280
    val requestStarted  = acked.head
    val requestingAsid  = requestStarted.fromAsid
    val sendingAsid     = requestStarted.toAsid
    val requestCompleted = Vector.newBuilder[AckedMessage]
    val copcContinue     = Vector.newBuilder[SpineMessage]
    val copcFragments    = Vector.newBuilder[AckedMessage]
    acked.iterator.drop(1).foreach { am =>
      if (am.message.isEhrRequestCompleted) requestCompleted += am
      else if (am.message.isCopc && am.isSentBy(requestingAsid)) copcContinue += am.message
      else if (am.message.isCopc && am.isSentBy(sendingAsid)) copcFragments += am
      else counters.unknownPurpose += 1
    }

    Some(new Gp2gpSession(messages, requestStarted, requestCompleted.result(),
      copcContinue.result(), copcFragments.result()))
  }

  /** In-session ack-pairing hash join — gp2gp_conversation.py:237-251.
    * LinkedHashMap reproduces Python dict semantics: re-putting an existing
    * guid replaces the value but keeps the ORIGINAL insertion position;
    * dangling acks (no message with that guid yet) are dropped with a count.
    */
  private def pairMessagesWithAcks(
      messages: Vector[SpineMessage], counters: Counters): Vector[AckedMessage] = {
    val byGuid = mutable.LinkedHashMap.empty[String, (SpineMessage, mutable.ArrayBuffer[SpineMessage])]
    messages.foreach { m =>
      if (m.isAcknowledgement) {
        m.messageRef.flatMap(byGuid.get) match {
          case Some((_, acks)) => acks += m
          case None            => counters.danglingAcks += 1
        }
      } else {
        byGuid.get(m.guid) match {
          case Some(_) => byGuid.update(m.guid, (m, mutable.ArrayBuffer.empty[SpineMessage]))
          case None    => byGuid.put(m.guid, (m, mutable.ArrayBuffer.empty[SpineMessage]))
        }
      }
    }
    byGuid.valuesIterator.map { case (m, acks) => AckedMessage(m, acks.toVector) }.toVector
  }

  /** integrated-or-suppressed predicate — gp2gp_conversation.py:283-287 */
  def integratedOrSuppressed(ack: SpineMessage): Boolean =
    ack.errorCode.isEmpty || ack.errorCode.contains(ErrorCodes.Suppressed)

  /** Effective-EHR find-first — gp2gp_conversation.py:290-321:
    * first (ehr, ack) pair whose ack is integrated-or-suppressed;
    * else first pair whose ack error != duplicate(12); else none.
    * Nested iteration order: request-completed list order, then ack list order.
    */
  def findEffectiveRequestCompleted(
      requestCompleted: Vector[AckedMessage]): Option[(SpineMessage, SpineMessage)] = {
    def findWhere(p: SpineMessage => Boolean): Option[(SpineMessage, SpineMessage)] =
      requestCompleted.iterator
        .flatMap(rc => rc.acknowledgements.iterator.filter(p).map(ack => (rc.message, ack)))
        .nextOption()
    findWhere(integratedOrSuppressed)
      .orElse(findWhere(ack => !ack.errorCode.contains(ErrorCodes.Duplicate)))
  }
}
