package graft.cdc

import graft.classifier.{SpineMessage, TransferClassifier}
import graft.lake.{LakeTable, Manifest}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Classified output fact row MERGE'd into the lake, keyed by `repo`
  * (= conversation). Carries the reference Transfer columns
  * (`pipeline/arrow.py:33-75`) plus per-key lineage (event counts, offset
  * bounds, dedup drops) — the `_lineage`-style metrics the north_star asks
  * to emit per partition.
  */
final case class TransferRecord(
    repo: String,
    conversationId: String,
    slaDurationSeconds: Option[Long],
    requestingPracticeAsid: String,
    sendingPracticeAsid: String,
    requestingSupplier: Option[String],
    sendingSupplier: Option[String],
    senderErrorCodes: Seq[Option[Int]],
    finalErrorCodes: Seq[Option[Int]],
    intermediateErrorCodes: Seq[Int],
    status: String,
    failureReason: Option[String],
    dateRequestedMicros: Long,
    dateCompletedMicros: Option[Long],
    lastSenderMessageTimestampMicros: Option[Long],
    eventCount: Long,
    duplicatesDropped: Long,
    minOffset: Long,
    maxOffset: Long,
)

object CdcPipeline {

  /** The central sessionize-and-classify fold: one shuffle (groupByKey on the
    * session key), then a single in-memory pass per key —
    * dedup by event id keeping the FIRST-seen offset (idempotence under
    * redelivery), schema-on-read parse, stable (time, offset) sort, cutoff,
    * state machine. Mirrors reference `transfer_service.py:55-96` with the
    * defaultdict group-by replaced by a real distributed shuffle.
    */
  def classify(events: Dataset[ChangeEvent], cutoffMicros: Long): Dataset[TransferRecord] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.repo).flatMapGroups { (repo, it) =>
      classifyGroup(repo, it, cutoffMicros).iterator
    }
  }

  /** Per-key fold, shared by the batch path above and the streaming
    * flatMapGroupsWithState path.
    */
  def classifyGroup(
      repo: String, events: Iterator[ChangeEvent], cutoffMicros: Long): Option[TransferRecord] = {
    // dedup by commit (event id), keep min offset — replay/redelivery idempotence
    val byCommit = mutable.HashMap.empty[String, ChangeEvent]
    var dupes = 0L
    events.foreach { e =>
      byCommit.get(e.commit) match {
        case Some(prev) =>
          dupes += 1
          if (e.offset < prev.offset) byCommit.update(e.commit, e)
        case None => byCommit.update(e.commit, e)
      }
    }
    if (byCommit.isEmpty) return None
    val deduped = byCommit.values.toArray
    java.util.Arrays.sort(deduped, Ordering.by((e: ChangeEvent) => (e.tsMicros, e.offset)))
    var minOff = Long.MaxValue
    var maxOff = Long.MinValue
    val msgs = Vector.newBuilder[SpineMessage]
    deduped.foreach { e =>
      if (e.offset < minOff) minOff = e.offset
      if (e.offset > maxOff) maxOff = e.offset
      msgs += MessageParser.parse(e.content)
    }
    // pre-sort by (time, offset): classify()'s stable time sort then keeps
    // the offset tiebreak — a deterministic total order, replay-safe
    val ordered = msgs.result().sortBy(_.timeMicros)
    TransferClassifier.classify(ordered, cutoffMicros).map { t =>
      TransferRecord(
        repo = repo,
        conversationId = t.conversationId,
        slaDurationSeconds = t.slaDurationSeconds,
        requestingPracticeAsid = t.requestingPracticeAsid,
        sendingPracticeAsid = t.sendingPracticeAsid,
        requestingSupplier = t.requestingSupplier,
        sendingSupplier = t.sendingSupplier,
        senderErrorCodes = t.senderErrorCodes,
        finalErrorCodes = t.finalErrorCodes,
        intermediateErrorCodes = t.intermediateErrorCodes,
        status = t.status,
        failureReason = t.failureReason,
        dateRequestedMicros = t.dateRequestedMicros,
        dateCompletedMicros = t.dateCompletedMicros,
        lastSenderMessageTimestampMicros = t.lastSenderMessageTimestampMicros,
        eventCount = deduped.length.toLong,
        duplicatesDropped = dupes,
        minOffset = minOff,
        maxOffset = maxOff,
      )
    }
  }

  /** Canonical per-row hash of the classified output — the replay invariant:
    * two table states are identical iff the (key → row_sha256) maps match.
    * `to_json(struct(...))` is deterministic given fixed column order.
    * `duplicatesDropped` is excluded: it is an observability counter that
    * depends on where redelivered copies were dropped (in-batch vs in-state
    * insert-ignore), not on the semantic session state.
    */
  def withRowSha(df: DataFrame): DataFrame = {
    val dataCols = df.columns
      .filterNot(c => c == "row_sha256" || c == "duplicatesDropped")
      .sorted.map(col)
    df.withColumn("row_sha256", sha2(to_json(struct(dataCols: _*)), 256))
  }
}

/** The incremental CDC engine: tails the change log epoch by epoch and
  * maintains two lake tables —
  *
  *  - `state`:     the deduped event buffer per session key (merge identity
  *                 (repo, commit), bucketed by repo, insert-ignore so the
  *                 first-seen offset of a redelivered event is durable);
  *  - `transfers`: the classified output (merge identity repo, upsert).
  *
  * An epoch apply touches only the buckets its batch's repos hash into:
  * state read + both MERGEs are pruned by bucket, so commit cost scales with
  * the batch, not the table — the property that keeps this viable at 10^10
  * events. Exactly-once: both MERGEs are keyed by the epoch number; a re-run
  * of an already-committed epoch is a no-op, and replay from any checkpoint
  * reproduces identical table state (verified via row_sha256 equality).
  */
final class CdcEngine(
    val warehouse: String,
    val numBuckets: Int,
    val cutoffMicros: Long,
) {
  val state = new LakeTable(s"$warehouse/state", numBuckets,
    keyColumns = Seq("repo", "commit"), bucketColumns = Seq("repo"))
  val transfers = new LakeTable(s"$warehouse/transfers", numBuckets,
    keyColumns = Seq("repo"))

  /** Apply one epoch of change events. Returns the transfers-table manifest. */
  def applyEpoch(spark: SparkSession, newEvents: Dataset[ChangeEvent], epoch: Long): Manifest = {
    import spark.implicits._

    // in-batch dedup by (repo, commit) keeping min offset — one row per key
    // before the MERGE so upsert version logic is deterministic
    val deduped = newEvents
      .groupByKey(e => (e.repo, e.commit))
      .reduceGroups((a, b) => if (a.offset <= b.offset) a else b)
      .map(_._2)

    val dedupedDf = deduped.toDF().cache()
    try {
      // one pass: batch stats + touched buckets (state and transfers hash the
      // same repo column, so the touched set is shared by both merges)
      val stats = dedupedDf
        .agg(
          count(lit(1)), coalesce(min("offset"), lit(0L)), coalesce(max("offset"), lit(0L)),
          collect_set(state.bucketCol))
        .collect()(0)
      val batchRows = stats.getLong(0)
      val touched = stats.getSeq[Int](3).toSet

      // prior events of the affected repos only (bucket-pruned + key semi-join)
      val priorState = state.snapshot(spark, buckets = Some(touched))
      val affectedRepos = dedupedDf.select("repo").distinct()
      val priorEvents =
        if (priorState.columns.isEmpty) spark.emptyDataset[ChangeEvent].toDF()
        else priorState.join(affectedRepos, Seq("repo"), "left_semi")
          .select(dedupedDf.columns.map(col): _*)

      val allEvents = priorEvents.unionByName(dedupedDf).as[ChangeEvent]
      val classified = CdcPipeline.classify(allEvents, cutoffMicros)
      val upserts = CdcPipeline.withRowSha(classified.toDF())

      val lineage = Map(
        "epoch" -> epoch,
        "batchRows" -> batchRows,
        "minOffset" -> stats.getLong(1),
        "maxOffset" -> stats.getLong(2),
      )
      val meta = Map(
        "cutoff-days" -> (cutoffMicros / (24L * 3600 * 1000000L)).toString,
        "build-tag" -> "graft-cdc-v1",
      )

      // state first, then transfers: a crash in between re-runs the epoch —
      // state merge is already committed ⇒ skipped; transfers recomputed
      // identically from identical state (determinism = exactly-once)
      // state is insert-ignore → append-only commit (anti-join drops known
      // event ids; no bucket rewrite — write cost is O(batch))
      state.appendNew(
        dedupedDf.withColumn("content_sha256", sha2(col("content"), 256)),
        epoch, metadata = meta, lineage = lineage, touchedBuckets = Some(touched))
      transfers.merge(upserts, epoch,
        metadata = meta, lineage = lineage, touchedBuckets = Some(touched))
    } finally dedupedDf.unpersist()
  }

  /** Replay the full change log from scratch into a fresh warehouse dir and
    * return that engine — used to assert byte-identical final state.
    */
  def currentTransfers(spark: SparkSession): DataFrame =
    LakeTable.readSnapshot(transfers, spark)
}
