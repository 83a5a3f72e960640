package graft.tools

import graft.cdc.{CdcEngine, ChangeLogGen, GenConfig}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Where does an incremental epoch's wall-clock go? Applies the benchmark's
  * change log epoch by epoch with a job listener attached and prints every
  * Spark job's duration and first stage name — the evidence base for
  * attacking per-epoch fixed costs (the term that dominates small batches).
  *
  * `SPARK_GRAFT_CDC_CONV` scales the log (default: the driver benchmark's
  * 100k conversations ≈ 448k events over 4 epochs).
  */
object ApplyProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val conversations = sys.env.getOrElse("SPARK_GRAFT_CDC_CONV", "100000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String, Long)]()
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    val scanBytes = new java.util.concurrent.atomic.AtomicLong()
    // per-job EXECUTOR CPU ns (sum over tasks, via the stage→job map): the
    // noise-resistant metric on this shared box — wall-clock swings with
    // disk/neighbor contention, task CPU doesn't
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val jobCpu = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.headOption.map(_.name)).getOrElse("?")
        jobs.put(js.jobId, (js.time, desc.take(90)))
        jobCpu.put(js.jobId, new java.util.concurrent.atomic.AtomicLong())
        js.stageInfos.foreach(si => stageJob.put(si.stageId, js.jobId))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, desc) =>
          done.add((je.jobId, je.time - t0, desc,
            Option(jobCpu.remove(je.jobId)).map(_.get()).getOrElse(0L)))
        }
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          shuffleBytes.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
          scanBytes.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
          Option(stageJob.get(te.stageId)).map(jobCpu.get).filter(_ != null)
            .foreach(_.addAndGet(te.taskMetrics.executorCpuTime))
        }
    })

    val day = 24L * 3600 * 1000000L
    // SPARK_GRAFT_EPOCHS=1 = the north-scale-shaped single batch, matching
    // ScalingBench's config for like-for-like phase attribution
    val epochs = sys.env.getOrElse("SPARK_GRAFT_EPOCHS", "4").toInt
    val cfg = GenConfig(numConversations = conversations,
      hotConversations = 4, hotFragments = 4096, epochs = epochs)
    val log = ChangeLogGen.generate(spark, cfg)
      .repartition(spark.sparkContext.defaultParallelism).cache()
    println(s"events: ${log.count()}")
    // per-epoch batch caches, exactly like the benchmarks: feeding epochs
    // by filtering the full mixed cache would charge every epoch the whole
    // log's bytes (a harness artifact, not engine cost)
    val byEpoch = (0L until cfg.epochs.toLong).map(e =>
      e -> log.where(org.apache.spark.sql.functions.col("epoch") === e).cache())
    byEpoch.foreach(_._2.count())
    log.unpersist()

    val wh = java.nio.file.Files.createTempDirectory("profile-cdc").toString
    val eng = new CdcEngine(wh, numBuckets = 32, cutoffMicros = 14 * day)
    byEpoch.foreach { case (e, batch) =>
      done.clear(); shuffleBytes.set(0L); scanBytes.set(0L)
      val t0 = System.nanoTime()
      eng.applyEpoch(spark, batch, e)
      val wall = (System.nanoTime() - t0) / 1e9
      // drain after the epoch: listener events are async — block until the
      // bus has delivered every onTaskEnd before reading the job table
      org.apache.spark.sql.graftbridge.GraftBridge
        .drainListenerBus(spark.sparkContext)
      val rows = done.iterator()
      println(f"---- epoch $e: wall $wall%.2fs ----")
      var sum = 0L
      var cpuSum = 0L
      while (rows.hasNext) {
        val (id, ms, desc, cpuNs) = rows.next()
        sum += ms
        cpuSum += cpuNs
        println(f"  job $id%3d  ${ms / 1000.0}%6.2fs wall  ${cpuNs / 1e9}%6.2fs cpu  $desc")
      }
      println(f"  (job wall sum ${sum / 1000.0}%.2fs vs epoch wall $wall%.2fs — gap = driver-side; task cpu sum ${cpuSum / 1e9}%.2fs)")
      println(f"  shuffle bytes written ${shuffleBytes.get()}%,d  input bytes read ${scanBytes.get()}%,d")
    }
    spark.stop()
  }
}
