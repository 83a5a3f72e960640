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
    *
    * Hot path of the per-event parse: a zero-allocation fixed-layout scan
    * (`yyyy-MM-dd HH:mm:ss[.f{1,6}][ TZ]`) with a DateTimeFormatter
    * fallback for anything else — ~20× the formatter's throughput, which
    * directly bounds classify events/sec.
    */
  def parseTimeMicros(raw: String): Long = {
    val fast = parseFast(raw)
    if (fast != Long.MinValue) fast else parseSlow(raw)
  }

  /** Hinnant days-from-civil — allocation-free date → epoch days. */
  private def epochDays(y: Int, m: Int, d: Int): Long = {
    val yy = if (m <= 2) y - 1 else y
    val era = (if (yy >= 0) yy else yy - 399) / 400
    val yoe = yy - era * 400
    val doy = (153 * (if (m > 2) m - 3 else m + 9) + 2) / 5 + d - 1
    val doe = yoe * 365L + yoe / 4 - yoe / 100 + doy
    era * 146097L + doe - 719468L
  }

  private def parseFast(s: String): Long = {
    val n = s.length
    if (n < 19) return Long.MinValue
    def dig(i: Int): Int = { val c = s.charAt(i) - '0'; if (c < 0 || c > 9) return -1; c }
    def num2(i: Int): Int = { val a = dig(i); val b = dig(i + 1); if (a < 0 || b < 0) -1 else a * 10 + b }
    if (s.charAt(4) != '-' || s.charAt(7) != '-' || s.charAt(10) != ' ' ||
      s.charAt(13) != ':' || s.charAt(16) != ':') return Long.MinValue
    val y = {
      val a = dig(0); val b = dig(1); val c = dig(2); val d = dig(3)
      if (a < 0 || b < 0 || c < 0 || d < 0) return Long.MinValue
      a * 1000 + b * 100 + c * 10 + d
    }
    val mo = num2(5); val da = num2(8); val h = num2(11); val mi = num2(14); val se = num2(17)
    if (mo < 1 || mo > 12 || da < 1 || da > 31 || h < 0 || h > 23 ||
      mi < 0 || se < 0 || mi > 59 || se > 59) return Long.MinValue
    var i = 19
    var frac = 0L
    if (i < n && s.charAt(i) == '.') {
      i += 1
      var scale = 100000L
      var digits = 0
      while (i < n && digits < 6 && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
        frac += (s.charAt(i) - '0') * scale; scale /= 10; i += 1; digits += 1
      }
      if (digits == 0) return Long.MinValue
    }
    var offsetMicros = 0L
    if (i < n) {
      if (s.charAt(i) != ' ') return Long.MinValue
      val tz = s.substring(i + 1)
      if (tz == "BST") offsetMicros = 3600L * 1000000L
      else if (tz == "UTC") offsetMicros = 0L
      else return Long.MinValue
    }
    val secs = epochDays(y, mo, da) * 86400L + h * 3600L + mi * 60L + se
    secs * 1000000L + frac - offsetMicros
  }

  private def parseSlow(raw: String): Long = {
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

  /** Intern the four interaction-id constants: saves one string allocation
    * per event and enables reference-equality downstream.
    */
  private def internInteraction(s: String): String = {
    import graft.classifier.Interactions._
    if (s == EhrRequestStarted) EhrRequestStarted
    else if (s == ApplicationAck) ApplicationAck
    else if (s == EhrRequestCompleted) EhrRequestCompleted
    else if (s == CommonPointToPoint) CommonPointToPoint
    else s
  }

  /** Parse one content line. Fail-fast like the reference: a malformed row
    * aborts the job rather than being silently skipped. Hot path: manual
    * comma scan (no split array), interned interaction ids.
    */
  def parse(content: String): SpineMessage = {
    // locate the 9 separators in one scan
    val sep = new Array[Int](9)
    var found = 0
    var i = 0
    val n = content.length
    while (i < n && found < 9) {
      if (content.charAt(i) == ',') { sep(found) = i; found += 1 }
      i += 1
    }
    if (found != 9 || content.indexOf(',', sep(8) + 1) >= 0)
      throw new MalformedChangeEventError(s"expected 10 CSV fields: $content")
    def field(k: Int): String = {
      val start = if (k == 0) 0 else sep(k - 1) + 1
      val end = if (k == 9) n else sep(k)
      content.substring(start, end)
    }
    try
      SpineMessage(
        timeMicros = parseTimeMicros(field(0)),
        conversationId = field(1),
        guid = field(2),
        interactionId = internInteraction(field(3)),
        fromPartyAsid = field(4),
        toPartyAsid = field(5),
        messageRef = parseMessageRef(field(6)),
        errorCode = parseErrorCode(field(7)),
        // the reference null-encodes ONLY messageRef/jdiEvent; the system
        // columns pass through verbatim — an empty CSV field stays "" (the
        // reference goldens show "" suppliers, not null:
        // message.py:76-77 `item.get(...)` over a DictReader row)
        toSystem = Some(field(8)),
        fromSystem = Some(field(9)),
      )
    catch {
      case e: MalformedChangeEventError => throw e
      case e: Exception =>
        throw new MalformedChangeEventError(
          s"failed to construct message from change event with GUID ${field(2)} and time ${field(0)}", e)
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
