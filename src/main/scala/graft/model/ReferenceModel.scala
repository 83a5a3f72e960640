package graft.model

import graft.cdc.ChangeEvent
import graft.cdc.Enrichment.OrgDimRow

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{LocalDateTime, ZoneOffset}
import scala.collection.mutable

/** An INDEPENDENT, pure-Scala model of the classify/enrich pipeline,
  * transliterated directly from the reference Python — NOT from this
  * engine's Spark implementation. It exists to generate the driver-gate
  * golden oracles (`graft.goldens.Goldens`, via `GoldenGen`) from a second
  * implementation, so a semantic bug in the engine cannot survive a golden
  * regeneration: the pins come from here, the driver compares the engine
  * against them, and `ReferenceModelSpec` holds the two implementations
  * bit-for-bit equal on top.
  *
  * Independence discipline: the ONLY engine types consumed are the input
  * fixture rows (`ChangeEvent`, `OrgDimRow`) — the shared test INPUT. All
  * processing (CSV parse, ack pairing, outcome tree, SLA, as-of dim lookup,
  * row hashing) is re-derived here from the reference sources:
  *  - message parse/null encodings: `src/prmdata/domain/spine/message.py:51-87`
  *  - ack pairing + session predicates: `spine/gp2gp_conversation.py:73-321`
  *  - outcome decision tree: `gp2gp/transfer_outcome.py:44-105`
  *  - cutoff, SLA, practice lookup: `gp2gp/transfer_service.py:98-181`
  *  - SLA second rounding (Python round, half-even): `gp2gp/transfer.py:31-36`
  *  - monthly lookup with one-month fallback:
  *    `ods_portal/organisation_metadata_monthly.py:26-34`,
  *    `ods_portal/organisation_lookup.py:14-45`
  * The CDC-layer conventions the reference has no analogue for (dedup by
  * event id keeping the first-seen = min (offset, epoch) copy; the
  * (eventTs, offset) pre-sort; the row-sha canonical JSON) are re-derived
  * from their documented contracts in SURVEY.md / the engine scaladoc, not
  * from the engine code.
  *
  * Deliberately single-threaded driver-side Scala over in-memory Vectors:
  * it is an ORACLE for the small seeded fixtures, not an execution engine.
  */
object ReferenceModel {

  // ---------------------------------------------------------------- parse

  /** The reference Message tuple — `message.py:23-33`. */
  final case class Msg(
      timeMicros: Long,
      conversationId: String,
      guid: String,
      interactionId: String,
      fromAsid: String,
      toAsid: String,
      messageRef: Option[String],
      errorCode: Option[Int],
      fromSystem: Option[String],
      toSystem: Option[String],
  )

  private val EhrRequestStarted   = "urn:nhs:names:services:gp2gp/RCMR_IN010000UK05"
  private val EhrRequestCompleted = "urn:nhs:names:services:gp2gp/RCMR_IN030000UK06"
  private val ApplicationAck      = "urn:nhs:names:services:gp2gp/MCCI_IN010000UK13"
  private val CommonPointToPoint  = "urn:nhs:names:services:gp2gp/COPC_IN000001UK01"

  private val ErrorSuppressed = 15
  private val DuplicateError  = 12
  private val FatalSenderErrors = Set(6, 7, 10, 14, 23, 24, 99, 30)

  private val timeFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss[.SSSSSS][.SSS]")

  /** `"2019-12-02 19:02:29.985000 BST"` → epoch micros UTC, via java.time
    * (the engine uses a hand-rolled scanner — deliberately NOT reused).
    * tzinfos map {BST: +1h, UTC: 0} — `message.py:62-63`.
    */
  def parseTimeMicros(raw: String): Long = {
    val lastSpace = raw.lastIndexOf(' ')
    val (dt, offSecs) =
      if (lastSpace > 0 && raw.substring(lastSpace + 1).forall(_.isLetter)) {
        val tz = raw.substring(lastSpace + 1)
        val off = tz match {
          case "BST" => 3600L
          case "UTC" => 0L
          case other => sys.error(s"model: unknown timezone suffix $other")
        }
        (raw.substring(0, lastSpace), off)
      } else (raw, 0L)
    val ldt = LocalDateTime.parse(dt, timeFmt)
    ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L +
      ldt.getNano / 1000L - offSecs * 1000000L
  }

  /** One CSV content line → Msg. Field layout is the e2e template header:
    * `_time,conversationID,GUID,interactionID,messageSender,messageRecipient,
    * messageRef,jdiEvent,toSystem,fromSystem`. Null encodings per
    * `message.py:51-58` (falsy/"NONE" error, falsy/"NotProvided" ref).
    */
  def parseMsg(line: String): Msg = {
    val f = line.split(",", -1)
    require(f.length == 10, s"model: expected 10 CSV fields, got ${f.length}: $line")
    Msg(
      timeMicros = parseTimeMicros(f(0)),
      conversationId = f(1),
      guid = f(2),
      interactionId = f(3),
      fromAsid = f(4),
      toAsid = f(5),
      messageRef = if (f(6).isEmpty || f(6) == "NotProvided") None else Some(f(6)),
      errorCode = if (f(7).isEmpty || f(7) == "NONE") None else Some(f(7).toInt),
      // systems pass through verbatim — "" stays "" (message.py:76-77)
      toSystem = Some(f(8)),
      fromSystem = Some(f(9)),
    )
  }

  // ---------------------------------------------------------- sessionize

  /** `AcknowledgedMessage` — `gp2gp_conversation.py:15-35`. */
  final case class Acked(msg: Msg, acks: Vector[Msg])

  /** Python-dict ack pairing — `gp2gp_conversation.py:237-251`: iterate in
    * time order; acks append to the entry keyed by their messageRef
    * (dangling acks dropped); a non-ack re-using a guid REPLACES the entry
    * (fresh empty ack list) but keeps the original insertion position
    * (Python 3.7 dict semantics).
    */
  def pairWithAcks(msgs: Seq[Msg]): Vector[Acked] = {
    val order = mutable.ArrayBuffer.empty[String]
    val entries = mutable.HashMap.empty[String, (Msg, mutable.ArrayBuffer[Msg])]
    msgs.foreach { m =>
      if (m.interactionId == ApplicationAck) {
        m.messageRef.foreach(ref => entries.get(ref).foreach(_._2 += m))
      } else {
        if (!entries.contains(m.guid)) order += m.guid
        entries.update(m.guid, (m, mutable.ArrayBuffer.empty[Msg]))
      }
    }
    order.iterator.map { g =>
      val (m, acks) = entries(g); Acked(m, acks.toVector)
    }.toVector
  }

  /** The parsed session — message grouping per `gp2gp_conversation.py:253-280`
    * plus every predicate the outcome tree consumes (`:102-235`). Returns
    * None when the first message is not an EHR request (the service drops
    * such conversations — `transfer_service.py:79-87`).
    */
  final case class Session(
      requestStarted: Acked,
      requestCompleted: Vector[Acked],
      copcContinue: Vector[Msg],
      copcFragments: Vector[Acked],
      allMessages: Vector[Msg],
  ) {
    def requestingAsid: String = requestStarted.msg.fromAsid
    def sendingAsid: String    = requestStarted.msg.toAsid

    // effective EHR find-first — gp2gp_conversation.py:290-321
    val effective: Option[(Msg, Msg)] = {
      def find(p: Msg => Boolean): Option[(Msg, Msg)] =
        requestCompleted.iterator
          .flatMap(rc => rc.acks.iterator.filter(p).map(a => (rc.msg, a)))
          .nextOption()
      def integratedOrSuppressed(a: Msg): Boolean =
        a.errorCode.isEmpty || a.errorCode.contains(ErrorSuppressed)
      find(integratedOrSuppressed)
        .orElse(find(a => !a.errorCode.contains(DuplicateError)))
    }
    private def effAck: Option[Msg] = effective.map(_._2)

    def isIntegrated: Boolean = effAck.exists(a =>
      a.errorCode.isEmpty || a.errorCode.contains(ErrorSuppressed))
    def hasConcludedWithFailure: Boolean = effAck.exists(a =>
      !(a.errorCode.isEmpty || a.errorCode.contains(ErrorSuppressed)))
    def finalErrorCodes: Vector[Option[Int]] =
      for (m <- requestCompleted; a <- m.acks) yield a.errorCode
    def senderErrorCodes: Vector[Option[Int]] = requestStarted.acks.map(_.errorCode)
    def intermediateErrorCodes: Vector[Int] =
      for (m <- copcFragments; a <- m.acks; c <- a.errorCode) yield c
    def containsCopcFragments: Boolean =
      copcContinue.nonEmpty || copcFragments.nonEmpty
    def containsUnackedDupEhrAndCopc: Boolean = {
      val dupes = finalErrorCodes.count(_.contains(DuplicateError)) > 0
      dupes && containsCopcFragments && !requestCompleted.forall(_.acks.nonEmpty)
    }
    def containsCopcError: Boolean =
      copcFragments.exists(_.acks.exists(_.errorCode.isDefined))
    def isMissingCopc: Boolean = copcContinue.nonEmpty && copcFragments.isEmpty
    def isMissingCopcAck: Boolean = copcFragments.exists(_.acks.isEmpty)
    def containsFatalSenderError: Boolean =
      requestStarted.acks.exists(_.errorCode.exists(FatalSenderErrors.contains))
    def isMissingRequestAcknowledged: Boolean = requestStarted.acks.isEmpty
    def isMissingCoreEhr: Boolean = requestCompleted.isEmpty
    def containsCoreEhrWithSenderError: Boolean =
      !isMissingCoreEhr && requestStarted.acks.exists(_.errorCode.isDefined)

    def effectiveRequestCompletedMicros: Option[Long] = effective.map(_._1.timeMicros)
    def effectiveFinalAckMicros: Option[Long]         = effective.map(_._2.timeMicros)

    /** `gp2gp_conversation.py:146-160`; the empty-window case returns None
      * (the Python would raise on max([]) — the engine chose None; the
      * seeded fixtures never produce it).
      */
    def lastSenderMessageMicros: Option[Long] = {
      val sender = allMessages.filter(_.fromAsid == sendingAsid)
      if (sender.isEmpty) None
      else if (isIntegrated) {
        val bound = effectiveFinalAckMicros.get
        val w = sender.collect { case m if m.timeMicros <= bound => m.timeMicros }
        if (w.isEmpty) None else Some(w.max)
      } else Some(sender.map(_.timeMicros).max)
    }
  }

  def parseSession(msgs: Vector[Msg]): Option[Session] = {
    if (msgs.isEmpty || msgs.head.interactionId != EhrRequestStarted) return None
    val acked = pairWithAcks(msgs)
    val head = acked.head
    val (reqAsid, sndAsid) = (head.msg.fromAsid, head.msg.toAsid)
    val rc = Vector.newBuilder[Acked]
    val cc = Vector.newBuilder[Msg]
    val cf = Vector.newBuilder[Acked]
    acked.drop(1).foreach { am =>
      if (am.msg.interactionId == EhrRequestCompleted) rc += am
      else if (am.msg.interactionId == CommonPointToPoint && am.msg.fromAsid == reqAsid)
        cc += am.msg
      else if (am.msg.interactionId == CommonPointToPoint && am.msg.fromAsid == sndAsid)
        cf += am
      // else: unknown purpose — logged by the reference, not material here
    }
    Some(Session(head, rc.result(), cc.result(), cf.result(), msgs))
  }

  // ------------------------------------------------------------- outcome

  private val EightDaysMicros = 8L * 24 * 3600 * 1000000L

  /** Decision tree — exact transliteration of `transfer_outcome.py:44-105`. */
  def assignOutcome(s: Session, slaMicros: Option[Long]): (String, Option[String]) = {
    if (s.isIntegrated) {
      if (slaMicros.exists(_ <= EightDaysMicros)) ("Integrated on time", None)
      else ("Process failure", Some("Integrated late"))
    } else if (s.hasConcludedWithFailure) ("Technical failure", Some("Final error"))
    else if (s.containsCopcFragments) {
      if (s.containsUnackedDupEhrAndCopc)
        ("Unclassified failure", Some("Ambiguous COPC messages"))
      else if (s.containsCopcError && !s.isMissingCopcAck)
        ("Unclassified failure", Some("Transferred, not integrated, with error"))
      else if (s.isMissingCopc) ("Technical failure", Some("COPC(s) not sent"))
      else if (s.isMissingCopcAck) ("Technical failure", Some("COPC(s) not acknowledged"))
      else ("Process failure", Some("Transferred, not integrated"))
    } else if (s.containsFatalSenderError)
      ("Technical failure", Some("Contains fatal sender error"))
    else if (s.isMissingRequestAcknowledged)
      ("Technical failure", Some("Request not acknowledged"))
    else if (s.isMissingCoreEhr) ("Technical failure", Some("Core extract not sent"))
    else if (s.containsCoreEhrWithSenderError)
      ("Unclassified failure", Some("Transferred, not integrated, with error"))
    else ("Process failure", Some("Transferred, not integrated"))
  }

  // ------------------------------------------------------------ pipeline

  /** Classified record — the reference Transfer (`transfer.py:18-45`)
    * flattened, plus the CDC lineage columns the engine's contract adds.
    */
  final case class Rec(
      repo: String,
      conversationId: String,
      slaDurationSeconds: Option[Long],
      requestingPracticeAsid: String,
      sendingPracticeAsid: String,
      requestingSupplier: Option[String],
      sendingSupplier: Option[String],
      senderErrorCodes: Vector[Option[Int]],
      finalErrorCodes: Vector[Option[Int]],
      intermediateErrorCodes: Vector[Int],
      status: String,
      failureReason: Option[String],
      dateRequestedMicros: Long,
      dateCompletedMicros: Option[Long],
      lastSenderMessageTimestampMicros: Option[Long],
      eventCount: Long,
      minOffset: Long,
      maxOffset: Long,
  ) {
    def rowSha: String = sha256Hex(rowJson(this))
  }

  /** Whole-log classification: group by conversation, dedup redelivered
    * event ids keeping the FIRST-SEEN copy (min (offset, epoch) — the
    * engine contract's replay-idempotence rule), order by (eventTs, offset),
    * parse, stable-sort by message time (`transfer_service.py:62`), apply
    * the inclusive cutoff (`transfer_service.py:158-164`), drop sessions
    * missing their start, classify.
    */
  def classifyLog(events: Seq[ChangeEvent], cutoffMicros: Long): Vector[Rec] = {
    val byRepo = events.groupBy(_.repo)
    byRepo.keysIterator.toVector.sorted.flatMap { repo =>
      val deduped = byRepo(repo)
        .groupBy(_.commit)
        .valuesIterator
        .map(_.minBy(e => (e.offset, e.epoch)))
        .toVector
        .sortBy(e => (e.tsMicros, e.offset))
      val msgs = deduped.map(e => parseMsg(e.content))
      val sorted = msgs.sortBy(_.timeMicros) // stable: Vector sortBy is TimSort
      val filtered =
        if (cutoffMicros == 0L || sorted.isEmpty) sorted
        else sorted.filter(_.timeMicros - sorted.head.timeMicros <= cutoffMicros)
      parseSession(filtered).map { s =>
        // SLA — transfer_service.py:167-181 (clamped ≥0, UNROUNDED for the
        // 8-day test); seconds rounding is Python round() = half-even
        // (transfer.py:31-36)
        val slaMicros = s.effectiveFinalAckMicros.map(ack =>
          math.max(0L, ack - s.effectiveRequestCompletedMicros.get))
        val (status, reason) = assignOutcome(s, slaMicros)
        Rec(
          repo = repo,
          conversationId = s.requestStarted.msg.conversationId,
          slaDurationSeconds = slaMicros.map(m => math.rint(m / 1e6).toLong),
          requestingPracticeAsid = s.requestingAsid,
          sendingPracticeAsid = s.sendingAsid,
          requestingSupplier = s.requestStarted.msg.fromSystem,
          sendingSupplier = s.requestStarted.msg.toSystem,
          senderErrorCodes = s.senderErrorCodes,
          finalErrorCodes = s.finalErrorCodes,
          intermediateErrorCodes = s.intermediateErrorCodes,
          status = status,
          failureReason = reason,
          dateRequestedMicros = s.requestStarted.msg.timeMicros,
          dateCompletedMicros = s.effectiveFinalAckMicros,
          lastSenderMessageTimestampMicros = s.lastSenderMessageMicros,
          eventCount = deduped.length.toLong,
          minOffset = deduped.iterator.map(_.offset).min,
          maxOffset = deduped.iterator.map(_.offset).max,
        )
      }
    }
  }

  // ---------------------------------------------------------- enrichment

  /** Practice metadata resolved for one role, or all-null on miss. */
  final case class Practice(
      odsCode: Option[String],
      name: Option[String],
      sicblOdsCode: Option[String],
      sicblName: Option[String],
  )
  private val NullPractice = Practice(None, None, None, None)

  /** As-of monthly lookup with the reference's WHOLE-MONTH fallback
    * (`organisation_metadata_monthly.py:26-34`): the request month's
    * lookup when that month has a snapshot at all, else the previous
    * month's lookup; the resolved month is then probed per asid with
    * null-pad on miss (`transfer_service.py:105-114`,
    * `organisation_lookup.py:14-45`) — an asid absent from a PRESENT
    * month does not fall back individually.
    */
  final class DimLookup(rows: Seq[OrgDimRow]) {
    private val byMonth: Map[Int, Map[String, OrgDimRow]] =
      rows.groupBy(_.yearMonth).view
        .mapValues(_.map(r => r.asid -> r).toMap) // .toMap = last wins
        .toMap
    private def prev(ym: Int): Int = if (ym % 100 == 1) ym - 89 else ym - 1
    def resolve(asid: String, ym: Int): Practice =
      byMonth.get(ym).orElse(byMonth.get(prev(ym))).flatMap(_.get(asid)) match {
        // Option(…), not Some(…): a practice with no sicbl mapping carries
        // null sicbl fields (organisation_lookup.py `.get` → None)
        case Some(r) => Practice(Option(r.odsCode), Option(r.name),
          Option(r.sicblOdsCode), Option(r.sicblName))
        case None => NullPractice
      }
  }

  /** Parse one monthly `organisationMetadata.json` (the reference's native
    * dim format) into flat dim rows — transliterated from
    * `organisation_lookup.py:14-30`: one row per (asid, month) via each
    * practice's asids list; duplicate asids / practice-ods across entries:
    * LAST entry wins (dict-comprehension overwrite); sicbl fields null when
    * no sicbl lists the practice.
    */
  def odsDimRows(json: String): Seq[OrgDimRow] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val ym = root.get("year").asInt * 100 + root.get("month").asInt
    val sicblByPractice = scala.collection.mutable.HashMap.empty[String, (String, String)]
    root.get("sicbls").forEach { s =>
      s.get("practices").forEach { p =>
        sicblByPractice.update(p.asText, (s.get("ods_code").asText, s.get("name").asText))
      }
    }
    val byAsid = scala.collection.mutable.LinkedHashMap.empty[String, (String, String)]
    root.get("practices").forEach { p =>
      p.get("asids").forEach { a =>
        byAsid.update(a.asText, (p.get("ods_code").asText, p.get("name").asText))
      }
    }
    byAsid.iterator.map { case (asid, (ods, name)) =>
      val sicbl = sicblByPractice.get(ods)
      OrgDimRow(asid, ods, name,
        sicbl.map(_._1).orNull, sicbl.map(_._2).orNull, ym)
    }.toSeq
  }

  def requestYearMonth(micros: Long): Int = {
    val d = LocalDateTime.ofEpochSecond(
      math.floorDiv(micros, 1000000L), 0, ZoneOffset.UTC)
    d.getYear * 100 + d.getMonthValue
  }

  final case class Enriched(rec: Rec, requesting: Practice, sending: Practice)

  def enrich(recs: Seq[Rec], dim: Seq[OrgDimRow]): Vector[Enriched] = {
    val lookup = new DimLookup(dim)
    recs.iterator.map { r =>
      val ym = requestYearMonth(r.dateRequestedMicros)
      Enriched(r,
        lookup.resolve(r.requestingPracticeAsid, ym),
        lookup.resolve(r.sendingPracticeAsid, ym))
    }.toVector
  }

  // ------------------------------------------------------------- row sha

  /** Canonical row JSON reproducing Spark's `to_json(struct(cols.sorted))`
    * rendering (the engine's documented row_sha256 contract): fields in
    * name-sorted order, null fields OMITTED (Spark's default
    * ignoreNullFields), array elements keep interior nulls, compact
    * separators, standard JSON string escaping.
    */
  def rowJson(r: Rec): String = {
    val sb = new StringBuilder(256)
    sb.append('{')
    var first = true
    def key(name: String): Unit = {
      if (!first) sb.append(','); first = false
      sb.append('"').append(name).append("\":")
    }
    def str(name: String, v: String): Unit = { key(name); jsonStr(sb, v) }
    def strOpt(name: String, v: Option[String]): Unit = v.foreach(str(name, _))
    def num(name: String, v: Long): Unit = { key(name); sb.append(v) }
    def numOpt(name: String, v: Option[Long]): Unit = v.foreach(num(name, _))
    def arr(name: String, v: Seq[Option[Int]]): Unit = {
      key(name); sb.append('[')
      var f = true
      v.foreach { e =>
        if (!f) sb.append(','); f = false
        e match { case Some(i) => sb.append(i); case None => sb.append("null") }
      }
      sb.append(']')
    }
    // name-sorted TransferRecord columns minus the sha-excluded counters
    str("conversationId", r.conversationId)
    numOpt("dateCompletedMicros", r.dateCompletedMicros)
    num("dateRequestedMicros", r.dateRequestedMicros)
    num("eventCount", r.eventCount)
    strOpt("failureReason", r.failureReason)
    arr("finalErrorCodes", r.finalErrorCodes)
    arr("intermediateErrorCodes", r.intermediateErrorCodes.map(Some(_)))
    numOpt("lastSenderMessageTimestampMicros", r.lastSenderMessageTimestampMicros)
    num("maxOffset", r.maxOffset)
    num("minOffset", r.minOffset)
    str("repo", r.repo)
    str("requestingPracticeAsid", r.requestingPracticeAsid)
    strOpt("requestingSupplier", r.requestingSupplier)
    arr("senderErrorCodes", r.senderErrorCodes) // "sender…" < "sending…"
    str("sendingPracticeAsid", r.sendingPracticeAsid)
    strOpt("sendingSupplier", r.sendingSupplier)
    numOpt("slaDurationSeconds", r.slaDurationSeconds)
    str("status", r.status)
    sb.append('}')
    sb.toString
  }

  private def jsonStr(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      // Jackson (Spark's to_json) uses the short escapes where they exist
      case '\b' => sb.append("\\b")
      case '\t' => sb.append("\\t")
      case '\n' => sb.append("\\n")
      case '\f' => sb.append("\\f")
      case '\r' => sb.append("\\r")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04X") // Jackson: uppercase hex
      case c    => sb.append(c)
    }
    sb.append('"')
  }

  def sha256Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  /** Whole-table checksum: sha256 over the ascending-sorted row shas,
    * concatenated — the engine's replay invariant, recomputed here.
    */
  def tableSha(recs: Seq[Rec]): String =
    sha256Hex(recs.map(_.rowSha).sorted.mkString)
}
