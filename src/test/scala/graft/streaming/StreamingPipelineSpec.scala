package graft.streaming

import graft.SparkSpec
import graft.cdc.{CdcPipeline, ChangeLogGen, GenConfig}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Batch/stream parity: feeding the change log through the streaming path in
  * multiple triggers ends at the same classified state as one-shot batch
  * classification; redelivered events don't re-emit.
  */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val day = 24L * 3600 * 1000000L

  test("flatMapGroupsWithState stream equals batch classification") {
    implicit val sqlCtx = spark.sqlContext
    val cfg = GenConfig(numConversations = 60, hotConversations = 1,
      hotFragments = 16, redeliveryPermille = 80, epochs = 3)
    val all = (0L until 60L).flatMap(ChangeLogGen.eventsOf(cfg, _))

    val source = MemoryStream[graft.cdc.ChangeEvent]
    val result = StreamingPipeline.classifyStream(source.toDS(), 14 * day)
    val query = result.writeStream
      .format("memory").queryName("transfers_stream")
      .outputMode(OutputMode.Update())
      .start()
    try {
      // three triggers = three epochs, plus a pure-redelivery fourth trigger
      (0 to 2).foreach { e =>
        source.addData(all.filter(_.epoch == e))
        query.processAllAvailable()
      }
      val countAfter3 = spark.table("transfers_stream").count()
      source.addData(all.filter(_.epoch == 0L)) // redeliver epoch 0 verbatim
      query.processAllAvailable()
      val countAfter4 = spark.table("transfers_stream").count()
      assert(countAfter4 == countAfter3, "pure redelivery must not re-emit")

      // Update mode: the final emission per key is the one classified from
      // the largest state — eventCount grows monotonically with each re-emit
      val streamed = spark.table("transfers_stream")
        .collect()
        .groupBy(_.getAs[String]("repo"))
        .map { case (_, rows) =>
          rows.maxBy(r => (r.getAs[Long]("eventCount"), r.getAs[Long]("maxOffset"))) }
        .toSeq
      val streamedDf = spark.createDataFrame(
        spark.sparkContext.parallelize(streamed), spark.table("transfers_stream").schema)
      val streamedSha = CdcPipeline.withRowSha(streamedDf)
        .select("repo", "row_sha256").as[(String, String)].collect().toMap

      val batchSha = CdcPipeline.withRowSha(
          CdcPipeline.classify(all.toDS(), 14 * day).toDF())
        .select("repo", "row_sha256").as[(String, String)].collect().toMap

      assert(streamedSha == batchSha)
    } finally query.stop()
  }
}
