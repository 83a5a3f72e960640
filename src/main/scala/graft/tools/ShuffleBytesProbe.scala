package graft.tools

import graft.cdc.{CdcPipeline, ChangeLogGen, GenConfig}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Exact shuffle-byte A/B for the classify sessionize exchange: the slim
  * projection (what `CdcPipeline.classify` ships) vs shuffling the full
  * `ChangeEvent`. Bytes are deterministic — the honest metric on a noisy
  * box where wall-clock comparisons drown in host contention.
  */
object ShuffleBytesProbe {
  def main(args: Array[String]): Unit = {
    val conversations = sys.env.getOrElse("SPARK_GRAFT_CDC_CONV", "200000").toLong
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val bytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          bytes.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val day = 24L * 3600 * 1000000L
    val cfg = GenConfig(numConversations = conversations,
      hotConversations = 4, hotFragments = 4096, epochs = 4)
    def run(label: String)(job: => Unit): Long = {
      bytes.set(0L); job
      org.apache.spark.sql.graftbridge.GraftBridge
        .drainListenerBus(spark.sparkContext) // deterministic listener drain
      val b = bytes.get()
      println(f"$label%-14s shuffle bytes written: $b%,d")
      b
    }
    val events = ChangeLogGen.generate(spark, cfg)
    val slim = run("slim (classify)") {
      CdcPipeline.classify(events, 14 * day)
        .write.mode("overwrite").format("noop").save()
    }
    val fat = run("full ChangeEvent") {
      events.groupByKey(_.repo).flatMapGroups { (repo, it) =>
        CdcPipeline.classifyGroup(repo, it.map(_.slim), 14 * day).iterator
      }.write.mode("overwrite").format("noop").save()
    }
    println(f"reduction: ${100.0 * (fat - slim) / fat}%.1f%%")
    spark.stop()
  }
}
