package graft.vis

import graft.classifier.{Interactions, SpineMessage}

/** ASCII sequence-diagram formatter for a GP2GP conversation — port of the
  * reference's `gp2gpvis/visualiser.py` (RowMessage/ConversationFormatter):
  * the requester|sender ladder with centred arrow labels, short guids,
  * ack-target resolution ("of Core EHR 'abcde'", "of non existent
  * message!"), the error-code glossary line, and the optional meta header.
  * Byte-parity with the python output is pinned in VisualiserSpec goldens.
  */
object ConversationVisualiser {
  private val PaddingWidth = 9
  private val Padding = " " * PaddingWidth
  private val HeaderPadding = " " * (PaddingWidth - 4)
  private val ArrowWidth = 56
  private val CentralWidth = ArrowWidth + 6
  private val InteractionHeader =
    HeaderPadding + "Requester" + (" " * ArrowWidth) + "Sender"
  private val SpacingLine = Padding + "|" + (" " * CentralWidth) + "|"
  private val GuidChars = 5

  private val InteractionNames = Map(
    Interactions.EhrRequestStarted -> "GP2GP request",
    Interactions.EhrRequestCompleted -> "Core EHR",
    Interactions.ApplicationAck -> "Acknowledgement",
    Interactions.CommonPointToPoint -> "COPC",
  )

  /** visualiser.py:47-72 — the error-code glossary. */
  private val ErrorMessages = Map(
    6 -> "Not at surgery", 7 -> "GP2GP disabled", 9 -> "Unexpected EHR",
    10 -> "Failed to generate", 11 -> "Failed to integrate",
    12 -> "Duplicate EHR", 13 -> "Config issue", 14 -> "Req not LM compliant",
    15 -> "ABA suppressed", 17 -> "ABA wrong patient", 18 -> "Req malformed",
    19 -> "Unauthorised req", 20 -> "Spine error", 21 -> "Extract malformed",
    23 -> "Sender not LM compliant", 24 -> "SDS lookup", 25 -> "Timeout",
    26 -> "Filed as attachment", 28 -> "Wrong patient", 29 -> "LM reassembly",
    30 -> "LM general failure", 31 -> "Missing LM", 99 -> "Unexpected",
  )

  /** python `f"{s:f^w}"`: centred, the RIGHT side takes the odd fill char. */
  private def center(s: String, w: Int, fill: Char): String =
    if (s.length >= w) s
    else {
      val left = (w - s.length) / 2
      (fill.toString * left) + s + (fill.toString * (w - s.length - left))
    }

  def format(messagesIn: Seq[SpineMessage], minimal: Boolean = false,
             sortMessages: Boolean = true): String = {
    // the reference sorts by SECOND-truncated timestamps (RowMessage splits
    // off the fractional part before fromisoformat, visualiser.py:30-36), so
    // same-second messages keep their input order — sortBy is stable, so
    // truncating here reproduces that tie-break exactly
    val messages =
      if (sortMessages) messagesIn.sortBy(_.timeMicros / 1000000L) else messagesIn
    val first = messages.head
    if (first.interactionId != Interactions.EhrRequestStarted)
      throw new IllegalArgumentException("First message was not a GP2GP request")
    val byGuid = messages.map(m => m.guid -> m).toMap
    val conversationId = first.conversationId
    val requestingAsid = first.fromPartyAsid

    def description(m: SpineMessage): String = {
      val base = s"(${m.guid.take(GuidChars)}) ${InteractionNames(m.interactionId)}"
      if (m.interactionId != Interactions.ApplicationAck) base
      else m.messageRef.flatMap(byGuid.get) match {
        case None => base + " of non existent message!"
        case Some(acked) =>
          base + s" of ${InteractionNames(acked.interactionId)} " +
            s"'${m.messageRef.get.take(GuidChars)}'"
      }
    }

    def timestamp(m: SpineMessage): String =
      java.time.LocalDateTime.ofEpochSecond(
          m.timeMicros / 1000000L, 0, java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yy-MM-dd HH:mm:ss"))

    def messageLines(m: SpineMessage): Seq[String] = {
      if (m.conversationId != conversationId)
        throw new IllegalArgumentException(
          s"${m.guid} not from conversation: $conversationId")
      val content = center(s" ${description(m)} ", ArrowWidth, '-')
      val arrow =
        if (m.fromPartyAsid == requestingAsid) s"$Padding| --$content-> |"
        else s"$Padding| <-$content-- |"
      val line = if (minimal) arrow else arrow + s"   ${timestamp(m)}"
      val errorLine =
        if (m.interactionId == Interactions.ApplicationAck && m.errorCode.isDefined) {
          val c = m.errorCode.get
          val desc = s"Error code: $c (${ErrorMessages.getOrElse(c, "???")})"
          Seq(s"$Padding|${center(desc, CentralWidth, ' ')}|")
        } else Seq.empty
      Seq(SpacingLine, line) ++ errorLine
    }

    val meta =
      if (minimal) Seq.empty
      else Seq(
        s"GP2GP Conversation: $conversationId",
        s"Requester: ${first.fromPartyAsid} (${first.fromSystem.getOrElse("None")})",
        s"Sender: ${first.toPartyAsid} (${first.toSystem.getOrElse("None")})",
        "")
    (meta ++ Seq(InteractionHeader) ++ messages.flatMap(messageLines)).mkString("\n")
  }
}
