package graft.cdc

import graft.classifier.{Interactions, SpineMessage}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic, seeded, distributed change-log generator (FIXTURES.md §1/§6).
  *
  * Every row is a pure function of (seed, conversation index, message index):
  * `spark.range(N).flatMap` — so the SAME log is produced at any parallelism
  * (local[8] vs local[32] scaling runs see identical input) and any re-run
  * (replay determinism). No wall clock, no partition-id dependence.
  *
  * Knobs mirror the reference test corpus shapes:
  *  - scenario mix over the outcome families (tests/builders/test_cases.py)
  *  - `hotConversations` mega-keys with `hotFragments` COPC fragments each
  *    (Zipf-ish skew for the groupByKey / merge-shuffle salting story)
  *  - `redeliveryPermille` duplicate event-id re-emission (idempotence fixture)
  *  - ~1/5 of messages carry BST-suffixed timestamps (tz-parse fixture)
  */
final case class GenConfig(
    numConversations: Long,
    seed: Long = 42L,
    hotConversations: Int = 2,
    hotFragments: Int = 512,
    redeliveryPermille: Int = 20,
    epochs: Int = 4,
)

object ChangeLogGen {
  import graft.classifier.Interactions._

  // splitmix64 — public-domain mixing constants
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d9b149bb1c780fL
    z ^ (z >>> 31)
  }
  private def rng(seed: Long, conv: Long, salt: Long): Long =
    mix64(mix64(seed ^ mix64(conv)) ^ salt)
  private def pct(seed: Long, conv: Long, salt: Long, mod: Int): Int =
    (math.abs(rng(seed, conv, salt)) % mod).toInt

  private val baseMicros = 1577836800000000L // 2020-01-01T00:00Z
  private val minute     = 60L * 1000000L
  private val hour       = 60L * minute
  private val day        = 24L * hour

  /** Messages of conversation `conv` — one of ten deterministic scenario
    * shapes spanning all four outcome statuses.
    */
  def conversationMessages(cfg: GenConfig, conv: Long): Vector[SpineMessage] = {
    val convId  = f"repo-$conv%010d"
    val reqAsid = s"asid-${pct(cfg.seed, conv, 1, 997)}"
    val sndAsid = s"asid-${pct(cfg.seed, conv, 2, 997)}"
    val reqSys  = Seq("EMIS Web", "SystemOne", "Vision").apply(pct(cfg.seed, conv, 3, 3))
    val sndSys  = Seq("EMIS Web", "SystemOne", "Vision").apply(pct(cfg.seed, conv, 4, 3))
    val start   = baseMicros + conv * minute

    var guidSeq = 0
    def guid(): String = { guidSeq += 1; f"$convId-m$guidSeq%04d" }
    val out = Vector.newBuilder[SpineMessage]
    def add(t: Long, g: String, kind: String, from: String, to: String,
            ref: Option[String] = None, err: Option[Int] = None): Unit =
      out += SpineMessage(t, convId, g, kind, from, to, ref, err,
        if (from == reqAsid) Some(reqSys) else Some(sndSys),
        if (from == reqAsid) Some(sndSys) else Some(reqSys))

    def request(): Unit = add(start, convId, EhrRequestStarted, reqAsid, sndAsid)
    def senderAck(dt: Long, err: Option[Int] = None): Unit =
      add(start + dt, guid(), ApplicationAck, sndAsid, reqAsid, Some(convId), err)
    def coreEhr(dt: Long): String = {
      val g = guid(); add(start + dt, g, EhrRequestCompleted, sndAsid, reqAsid); g
    }
    def reqAck(dt: Long, ref: String, err: Option[Int] = None): Unit =
      add(start + dt, guid(), ApplicationAck, reqAsid, sndAsid, Some(ref), err)
    def copcContinue(dt: Long): Unit =
      add(start + dt, guid(), CommonPointToPoint, reqAsid, sndAsid)
    def copcFragment(dt: Long): String = {
      val g = guid(); add(start + dt, g, CommonPointToPoint, sndAsid, reqAsid); g
    }

    val isHot = conv < cfg.hotConversations
    val kind  = if (isHot) 100 else pct(cfg.seed, conv, 5, 100)
    val ackDelayHours = 1 + pct(cfg.seed, conv, 6, 20) // 1..20h for on-time cases

    kind match {
      case k if k < 45 => // integrated on time
        request(); senderAck(minute)
        val ehr = coreEhr(2 * minute); reqAck(2 * minute + ackDelayHours * hour, ehr)
      case k if k < 55 => // integrated late (9-12 days)
        request(); senderAck(minute)
        val ehr = coreEhr(2 * minute)
        reqAck(2 * minute + (9 + pct(cfg.seed, conv, 7, 4)) * day, ehr)
      case k if k < 65 => // final error
        request(); senderAck(minute)
        val ehr = coreEhr(2 * minute)
        reqAck(3 * minute, ehr, Some(Seq(11, 28, 21).apply(pct(cfg.seed, conv, 8, 3))))
      case k if k < 70 => // request only
        request()
      case k if k < 73 => // request acked, no EHR (maybe fatal error)
        request(); senderAck(minute,
          if (pct(cfg.seed, conv, 9, 2) == 0) None else Some(99))
      case k if k < 75 => // non-fatal sender error but EHR still sent
        // → UNCLASSIFIED "Transferred, not integrated, with error"
        request(); senderAck(minute, Some(19)); coreEhr(2 * minute)
      case k if k < 82 => // core sent, never integrated
        request(); senderAck(minute); coreEhr(2 * minute)
      case k if k < 88 => // copc continue sent, fragments never arrive
        request(); senderAck(minute); coreEhr(2 * minute); copcContinue(3 * minute)
      case k if k < 94 => // integrated with copc fragments
        request(); senderAck(minute)
        val ehr = coreEhr(2 * minute); copcContinue(3 * minute)
        val frags = (0 until 1 + pct(cfg.seed, conv, 10, 3))
          .map(i => copcFragment((4 + i) * minute))
        frags.zipWithIndex.foreach { case (f, i) => reqAck((8 + i) * minute, f) }
        reqAck(ackDelayHours * hour, ehr)
      case k if k < 97 => // duplicate EHR then integrated
        request(); senderAck(minute)
        val ehr = coreEhr(2 * minute); val dup = coreEhr(3 * minute)
        reqAck(4 * minute, dup, Some(12)); reqAck(ackDelayHours * hour, ehr)
      case k if k < 100 => // late ack beyond 14d cutoff → degrades to core-sent
        request(); senderAck(minute)
        val ehr = coreEhr(2 * minute); reqAck(20 * day, ehr)
      case _ => // hot mega-key: huge fragment fan-out, pending integration
        request(); senderAck(minute)
        coreEhr(2 * minute); copcContinue(3 * minute)
        (0 until cfg.hotFragments).foreach { i =>
          val f = copcFragment(4 * minute + i * 1000L)
          reqAck(4 * minute + i * 1000L + 500L, f)
        }
    }
    out.result()
  }

  /** Language tag derives deterministically from the interaction kind
    * (SURVEY.md §1.3: event kind recoverable from `lang`).
    */
  def langOf(interactionId: String): String = interactionId match {
    case Interactions.EhrRequestStarted   => "scala"
    case Interactions.EhrRequestCompleted => "java"
    case Interactions.ApplicationAck      => "python"
    case _                                => "go"
  }

  /** Encode one message as a change event. Offsets: each conversation owns a
    * contiguous slot sized for the largest scenario, so offsets are globally
    * unique and monotone within a conversation; redelivered copies land in
    * the upper half of the slot.
    */
  def slotSize(cfg: GenConfig): Long = 2L * (cfg.hotFragments * 2L + 16L)

  def eventsOf(cfg: GenConfig, conv: Long): Seq[ChangeEvent] = {
    val msgs = conversationMessages(cfg, conv)
    val slot = slotSize(cfg)
    val maxOffset = cfg.numConversations * slot
    val epochSpan = math.max(1L, maxOffset / cfg.epochs)
    msgs.zipWithIndex.flatMap { case (m, i) =>
      val offset = conv * slot + i
      val tz = if (pct(cfg.seed, conv, 20 + i, 5) == 0) "BST" else "UTC"
      def ev(off: Long) = ChangeEvent(
        repo = m.conversationId,
        path = s"src/${langOf(m.interactionId)}/${m.guid}.txt",
        commit = m.guid,
        lang = langOf(m.interactionId),
        content = MessageParser.format(m, tz),
        offset = off, op = "insert",
        tsMicros = baseMicros + off * 1000L,
        epoch = math.min(cfg.epochs - 1L, off / epochSpan),
      )
      val redelivered = pct(cfg.seed, conv, 40 + i, 1000) < cfg.redeliveryPermille
      if (redelivered) Seq(ev(offset), ev(conv * slot + slot / 2 + i))
      else Seq(ev(offset))
    }
  }

  /** The distributed generator — deterministic at any parallelism. Slices
    * 4× the core count so hot conversations don't straggle a whole task,
    * capped at the conversation count: tiny fixture logs (the c-family
    * oracle configs run 200-300 conversations) otherwise schedule ~128
    * near-empty tasks per action, pure fixed cost (r7; row values are a
    * pure function of the conversation index, so the slice count never
    * changes the generated set).
    */
  def generate(spark: SparkSession, cfg: GenConfig): Dataset[ChangeEvent] = {
    import spark.implicits._
    val slices = math.max(1L, math.min(cfg.numConversations,
      spark.sparkContext.defaultParallelism * 4L)).toInt
    spark.range(0L, cfg.numConversations, 1L, slices)
      .flatMap(conv => eventsOf(cfg, conv))
  }
}
