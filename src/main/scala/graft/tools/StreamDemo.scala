package graft.tools

import graft.cdc._
import graft.sources.ChangeLogSource
import graft.streaming.StreamingIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end streaming drive: the change log lands as gzip-CSV files in a
  * watched directory (the binlog tail), a file-source stream ingests them
  * micro-batch by micro-batch into the lake, and the final table is checked
  * against one-shot batch classification.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("stream-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val day = 24L * 3600 * 1000000L
    val cfg = GenConfig(numConversations = 400, hotConversations = 1,
      hotFragments = 64, redeliveryPermille = 30, epochs = 3)
    val log = ChangeLogGen.generate(spark, cfg).cache()

    val inDir = java.nio.file.Files.createTempDirectory("tail-in").toString
    // the "binlog writer": one csv.gz drop per epoch
    (0L until 3L).foreach { e =>
      ChangeLogSource.writeCsv(log.filter(_.epoch == e), s"$inDir/drop-$e")
    }

    val engine = new CdcEngine(
      java.nio.file.Files.createTempDirectory("stream-wh").toString,
      numBuckets = 16, cutoffMicros = 14 * day)
    val stream = spark.readStream
      .schema(ChangeLogSource.csvSchema)
      .option("header", "true")
      .option("maxFilesPerTrigger", "4")
      .csv(s"$inDir/drop-*")
      .as[ChangeEvent]
    val q = StreamingIngest.start(engine,
      stream, java.nio.file.Files.createTempDirectory("ckpt").toString,
      trigger = Trigger.AvailableNow())
    q.awaitTermination()

    val streamed = engine.currentTransfers(spark)
    val batch = CdcPipeline.withRowSha(CdcPipeline.classify(log, 14 * day).toDF())
    val diff = streamed.select("repo", "row_sha256")
      .exceptAll(batch.select("repo", "row_sha256")).count() +
      batch.select("repo", "row_sha256")
        .exceptAll(streamed.select("repo", "row_sha256")).count()
    println(s"stream batches committed: ${engine.transfers.latestManifest().get.epoch + 1}")
    println(s"rows: ${streamed.count()}  sha diffs vs batch: $diff (expect 0)")
    streamed.groupBy("status").count().orderBy(desc("count")).show(false)
    spark.stop()
    if (diff != 0) sys.exit(1)
  }
}
