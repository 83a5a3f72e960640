package graft.streaming

import graft.cdc.{CdcEngine, ChangeEvent}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Streaming tail → lake: the continuous flavour of the engine. Each
  * micro-batch is committed to the SAME lake tables through the SAME
  * epoch-manifest protocol (epoch = batchId), so exactly-once holds across
  * restarts: Structured Streaming replays an uncommitted batchId after a
  * crash, and `applyEpoch` is idempotent per epoch — the manifest either
  * exists (skip) or is recomputed deterministically.
  *
  * This is `foreachBatch` + the batch engine rather than
  * flatMapGroupsWithState + a custom streaming sink: the lake needs
  * table-level transactional commits (manifest per batch), which per-row
  * sinks can't express, and reusing the batch path keeps stream/batch
  * semantics identical by construction (StreamingPipelineSpec separately
  * proves the flatMapGroupsWithState state-store flavour agrees).
  */
object StreamingIngest {

  /** Mid-stream dimension-refresh mailbox: a long-running ingest query has
    * no natural between-batch hook, so callers `offer` versioned dim
    * deltas here and the `foreachBatch` closure drains them — in offer
    * order — BEFORE applying the next micro-batch. That batch then (a)
    * enriches with the refreshed dim and (b) carries the retro-correction
    * of already-committed rows in its enriched commit (`pendingReEnrich`),
    * exactly like the batch flavour's `applyDimUpdate` + next epoch.
    * Versions must be monotonic across offers (the dimlog contract); a
    * crash between the dimlog commit and the next batch replays safely —
    * the update is durable on its own manifest chain, and re-offering an
    * already-committed version is a guarded no-op.
    *
    * DURABILITY BOUNDARY: `offer` is a mailbox drop, not a commit — an
    * offered delta becomes durable only when a subsequent micro-batch
    * runs. A query that stops (or never fires a trigger on a quiet
    * stream) leaves offered deltas in process memory. Callers shutting
    * down must therefore `flushAfterStop` once the query has terminated
    * (the engine is single-writer: while the query runs, the foreachBatch
    * thread is the only legal `applyDimUpdate` caller), or re-offer after
    * restart — both are safe, the dimlog version guard makes replays
    * no-ops.
    */
  final class DimUpdateQueue {
    private val q =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, DataFrame)]()
    def offer(version: Long, delta: DataFrame): Unit = q.add((version, delta))
    /** Offers not yet drained by a micro-batch (check before stopping). */
    def pending: Int = q.size()
    /** Commit any undrained offers directly — call ONLY after the owning
      * query has terminated (single-writer rule). Returns versions applied.
      */
    def flushAfterStop(spark: org.apache.spark.sql.SparkSession,
                       engine: CdcEngine): Seq[Long] =
      applyAll(spark, engine)
    /** Apply-then-dequeue, head first: an offer leaves the mailbox only
      * AFTER its applyDimUpdate returns. A failure mid-apply keeps the
      * failing offer AND everything behind it queued (`pending` stays
      * honest), so a restarted caller re-flushes the undelivered tail
      * instead of silently losing it — drain-then-apply dropped every
      * later offer when an earlier one threw.
      */
    private[streaming] def applyAll(spark: org.apache.spark.sql.SparkSession,
                                    engine: CdcEngine): Seq[Long] = {
      val applied = Seq.newBuilder[Long]
      var head = q.peek()
      while (head != null) {
        val (version, delta) = head
        engine.applyDimUpdate(spark, delta, version) // throws → head stays queued
        q.poll()
        applied += version
        head = q.peek()
      }
      applied.result()
    }
  }

  def start(
      engine: CdcEngine,
      stream: Dataset[ChangeEvent],
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      dimUpdates: Option[DimUpdateQueue] = None,
  ): StreamingQuery = {
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[ChangeEvent], batchId: Long) =>
        // pending dim refreshes land first, on the micro-batch boundary:
        // the engine is single-writer, and foreachBatch is its only writer
        // thread while the query runs, so this is the one safe point
        dimUpdates.foreach(_.applyAll(batch.sparkSession, engine))
        engine.applyEpoch(batch.sparkSession, batch, batchId)
        ()
      }
      .start()
  }
}
