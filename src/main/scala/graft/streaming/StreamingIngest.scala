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

  def start(
      engine: CdcEngine,
      stream: Dataset[ChangeEvent],
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
  ): StreamingQuery = {
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[ChangeEvent], batchId: Long) =>
        engine.applyEpoch(batch.sparkSession, batch, batchId)
        ()
      }
      .start()
  }
}
