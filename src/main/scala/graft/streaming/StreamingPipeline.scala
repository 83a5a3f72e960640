package graft.streaming

import graft.cdc.{CdcPipeline, ChangeEvent, MessageParser, TransferRecord}
import graft.classifier.SpineMessage
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming flavour of the CDC pipeline: the change log arrives
  * as a stream of inserts; per-session state (the event-id dedup map) lives
  * in the state store, and every trigger re-emits the affected sessions'
  * classified rows (Update mode ≙ MERGE upsert downstream).
  *
  * The fold is the SAME pure function as the batch path
  * (CdcPipeline.classifyGroup) — batch/stream parity by construction.
  *
  * State is BOUNDED (the 100×-keys requirement): the input carries a
  * watermark (allowed lateness defaults to the cutoff itself — the
  * reference's lateness model, which reads `cutoff` days past the window
  * end, `reporting_window.py:20-23`), and each session arms an event-time
  * timeout at `session_start + cutoff`. Once the watermark passes that
  * horizon the session is EVICTED: the cutoff filter (P3,
  * `transfer_service.py:158-164`) guarantees no later event can change the
  * classified output, so the final emitted row is already correct. Events
  * arriving after eviction are either dropped as late (older than the
  * watermark) or — if they form a start-less fragment — classify to nothing;
  * only a brand-new request-start past the horizon opens a fresh session,
  * which mirrors the reference assigning such a conversation to a later
  * reporting window.
  */
object StreamingPipeline {

  /** One deduped, ALREADY-PARSED session event in state: the fixed-width
    * SpineMessage plus the dedup/order key (commit, offset, epoch, eventTs).
    * Raw `content` payloads are parsed once on arrival and never stored —
    * per-session state stays small no matter how large the wire messages
    * are (the state store is the scarce resource at 100× keys).
    */
  final case class StoredMsg(commit: String, offset: Long, epoch: Long,
                             eventTs: Long, msg: SpineMessage)

  /** Per-key state: the deduped parsed-event buffer (first-seen offset wins). */
  final case class SessionState(msgs: Seq[StoredMsg], emittedCount: Long)

  def classifyStream(
      events: Dataset[ChangeEvent],
      cutoffMicros: Long,
      /** Max out-of-order arrival tolerated before events count as late;
        * None ⇒ the cutoff itself (reference lateness model).
        */
      watermarkDelay: Option[String] = None,
  ): Dataset[TransferRecord] = {
    import events.sparkSession.implicits._
    val delay = watermarkDelay.getOrElse(s"${cutoffMicros / 1000000L} seconds")
    val withTs = events
      .withColumn("__evt_ts", timestamp_micros(col("tsMicros")))
      .withWatermark("__evt_ts", delay)
      .as[ChangeEvent]
    withTs
      .groupByKey(_.repo)
      .flatMapGroupsWithState[SessionState, TransferRecord](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (repo: String, incoming: Iterator[ChangeEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed session_start + cutoff: the classified row is
            // final (P3 drops anything later) — evict the session's state
            state.remove()
            Iterator.empty
          } else {
            val prior = if (state.exists) state.get.msgs else Seq.empty[StoredMsg]
            // dedup against prior state: first-seen (min offset, then min
            // epoch) wins — idempotent under redelivery, same rule as the
            // batch state table. Incoming events are parsed HERE, once, and
            // only the parsed form enters state. `changed` tracks whether
            // anything new landed, replacing a full vector compare.
            val byCommit = scala.collection.mutable.LinkedHashMap.empty[String, StoredMsg]
            prior.foreach(s => byCommit.update(s.commit, s))
            var changed = false
            incoming.foreach { e =>
              val keep = byCommit.get(e.commit) match {
                case Some(prev) =>
                  e.offset < prev.offset ||
                    (e.offset == prev.offset && e.epoch < prev.epoch)
                case None => true
              }
              if (keep) {
                byCommit.update(e.commit, StoredMsg(e.commit, e.offset, e.epoch,
                  e.tsMicros, MessageParser.parse(e.content)))
                changed = true
              }
            }
            if (!changed) Iterator.empty // pure redelivery: no re-emit
            else {
              val merged = byCommit.values.toVector
              state.update(SessionState(merged,
                (if (state.exists) state.get.emittedCount else 0L) + 1L))
              val startMicros = merged.iterator.map(_.eventTs).min
              val horizonMs = startMicros / 1000L + cutoffMicros / 1000L + 1L
              state.setTimeoutTimestamp(
                math.max(horizonMs, state.getCurrentWatermarkMs() + 1L))
              // same (eventTs, offset) pre-order as the batch fold, then the
              // shared classify tail — batch/stream parity by construction
              val ordered = merged.sortBy(s => (s.eventTs, s.offset))
              CdcPipeline.classifyParsed(repo, ordered.map(_.msg), cutoffMicros,
                eventCount = merged.size.toLong, dupes = 0L,
                minOff = merged.iterator.map(_.offset).min,
                maxOff = merged.iterator.map(_.offset).max).iterator
            }
          }
      }
  }
}
