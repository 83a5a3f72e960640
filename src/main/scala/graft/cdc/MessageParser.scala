package graft.cdc

import graft.classifier.SpineMessage
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoField
import java.time.{LocalDateTime, ZoneOffset}

/** Schema-on-read parse of a change event's `content` payload into a typed
  * SpineMessage — the port of the reference's CSV scan+parse (S1/S3/P1/P6):
  *
  *  - CSV row shape and column conventions: reference
  *    `src/prmdata/domain/spine/message.py:61-87` and the e2e input header
  *    `tests/e2e/.../template-spine_messages.csv:1`
  *  - tz-aware timestamp parse with a {BST:+1h, UTC:0} suffix map:
  *    `message.py:62-68` (goldens show BST→UTC normalization)
  *  - null encodings: `jdiEvent == "NONE"/"" → null`, `messageRef ==
  *    "NotProvided"/"" → null` (`message.py:51-58`)
  *  - fail-fast on a malformed row (`message.py:80-86`,
  *    FailedToConstructMessagesFromSplunkItemsError)
  *
  * `content` is one CSV line:
  * `_time,conversationID,GUID,interactionID,messageSender,messageRecipient,messageRef,jdiEvent,toSystem,fromSystem`
  * with `_time` like `2019-12-02 19:02:29.985 BST`.
  */
object MessageParser {

  final class MalformedChangeEventError(msg: String, cause: Throwable = null)
      extends RuntimeException(msg, cause)

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss[.SSSSSS][.SSS]")

  /** Parse `"2019-12-02 19:02:29.985 BST"` → epoch micros UTC.
    * BST is UTC+1 (reference timezone_info map, message.py:63-64).
    */
  def parseTimeMicros(raw: String): Long = {
    val lastSpace = raw.lastIndexOf(' ')
    val (dt, tz) =
      if (lastSpace > 0 && raw.substring(lastSpace + 1).forall(_.isLetter))
        (raw.substring(0, lastSpace), raw.substring(lastSpace + 1))
      else (raw, "UTC")
    val offsetSeconds = tz match {
      case "BST" => 3600L
      case "UTC" => 0L
      case other => throw new MalformedChangeEventError(s"unknown timezone suffix: $other")
    }
    val ldt = LocalDateTime.parse(dt, fmt)
    val utcMicros = ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L +
      ldt.get(ChronoField.MICRO_OF_SECOND)
    utcMicros - offsetSeconds * 1000000L
  }

  def formatTime(micros: Long, tz: String = "UTC"): String = {
    val shift = if (tz == "BST") 3600000000L else 0L
    val ldt = LocalDateTime.ofEpochSecond(
      (micros + shift) / 1000000L, ((micros + shift) % 1000000L).toInt * 1000, ZoneOffset.UTC)
    val base = ldt.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
    s"$base $tz"
  }

  /** `"NONE"`/empty → null int, else int — message.py:51-53 */
  def parseErrorCode(raw: String): Option[Int] =
    if (raw == null || raw.isEmpty || raw == "NONE") None
    else
      try Some(raw.toInt)
      catch {
        case e: NumberFormatException =>
          throw new MalformedChangeEventError(s"bad error code: $raw", e)
      }

  /** `"NotProvided"`/empty → null — message.py:56-58 */
  def parseMessageRef(raw: String): Option[String] =
    if (raw == null || raw.isEmpty || raw == "NotProvided") None else Some(raw)

  private def opt(raw: String): Option[String] =
    if (raw == null || raw.isEmpty) None else Some(raw)

  /** Parse one content line. Fail-fast like the reference: a malformed row
    * aborts the job rather than being silently skipped.
    */
  def parse(content: String): SpineMessage = {
    val f = content.split(",", -1)
    if (f.length != 10)
      throw new MalformedChangeEventError(
        s"expected 10 CSV fields, got ${f.length}: $content")
    try
      SpineMessage(
        timeMicros = parseTimeMicros(f(0)),
        conversationId = f(1),
        guid = f(2),
        interactionId = f(3),
        fromPartyAsid = f(4),
        toPartyAsid = f(5),
        messageRef = parseMessageRef(f(6)),
        errorCode = parseErrorCode(f(7)),
        toSystem = opt(f(8)),
        fromSystem = opt(f(9)),
      )
    catch {
      case e: MalformedChangeEventError => throw e
      case e: Exception =>
        throw new MalformedChangeEventError(
          s"failed to construct message from change event with GUID ${f(2)} and time ${f(0)}", e)
    }
  }

  /** Inverse of parse — used by the deterministic generator. */
  def format(m: SpineMessage, tz: String = "UTC"): String = {
    val ref = m.messageRef.getOrElse("NotProvided")
    val err = m.errorCode.map(_.toString).getOrElse("NONE")
    Seq(
      formatTime(m.timeMicros, tz), m.conversationId, m.guid, m.interactionId,
      m.fromPartyAsid, m.toPartyAsid, ref, err,
      m.toSystem.getOrElse(""), m.fromSystem.getOrElse(""),
    ).mkString(",")
  }
}
