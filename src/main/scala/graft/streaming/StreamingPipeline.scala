package graft.streaming

import graft.cdc.{CdcPipeline, ChangeEvent, TransferRecord}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming flavour of the CDC pipeline: the change log arrives
  * as a stream of inserts; per-session state (the event-id dedup map) lives
  * in the state store, and every trigger re-emits the affected sessions'
  * classified rows (Update mode ≙ MERGE upsert downstream).
  *
  * The fold is the SAME pure function as the batch path
  * (CdcPipeline.classifyGroup) — batch/stream parity by construction. The
  * session-cutoff model (drop events > cutoff after session start —
  * reference reporting-window semantics, `reporting_window.py:9-72` +
  * `transfer_service.py:158-164`) is enforced inside the classifier, so
  * late events mutate state but can never change the classified output; an
  * optional event-time timeout (cutoff past session start) lets state be
  * evicted once the watermark passes.
  */
object StreamingPipeline {

  /** Per-key state: the deduped event buffer (first-seen offset wins). */
  final case class SessionState(events: Seq[ChangeEvent], emittedCount: Long)

  def classifyStream(
      events: Dataset[ChangeEvent],
      cutoffMicros: Long,
  ): Dataset[TransferRecord] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.repo)
      .flatMapGroupsWithState[SessionState, TransferRecord](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (repo: String, incoming: Iterator[ChangeEvent], state: GroupState[SessionState]) =>
          val prior = if (state.exists) state.get.events else Seq.empty[ChangeEvent]
          // dedup against prior state: first-seen offset wins (idempotent
          // under redelivery, same rule as the batch state table)
          val byCommit = scala.collection.mutable.LinkedHashMap.empty[String, ChangeEvent]
          prior.foreach(e => byCommit.update(e.commit, e))
          incoming.foreach { e =>
            byCommit.get(e.commit) match {
              case Some(prev) =>
                if (e.offset < prev.offset ||
                    (e.offset == prev.offset && e.epoch < prev.epoch))
                  byCommit.update(e.commit, e)
              case None => byCommit.update(e.commit, e)
            }
          }
          val merged = byCommit.values.toVector
          if (merged == prior) Iterator.empty // pure redelivery: no re-emit
          else {
            state.update(SessionState(merged,
              (if (state.exists) state.get.emittedCount else 0L) + 1L))
            CdcPipeline.classifyGroup(repo, merged.iterator, cutoffMicros).iterator
          }
      }
  }
}
