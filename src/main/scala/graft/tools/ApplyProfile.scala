package graft.tools

import graft.cdc._
import org.apache.spark.sql.functions._

/** Phase-level profile of the REAL engine apply path — where does an epoch
  * go. Mirrors CdcEngine.applyEpoch phase by phase (stats agg, prior-state
  * read+semi-join, fused fold+cache, state appendNew, transfers mergeDelta)
  * so regressions can be localized. Epoch 0 is the bulk load; later epochs
  * show the incremental steady state.
  */
object ApplyProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val conversations = sys.env.getOrElse("SPARK_GRAFT_CDC_CONV", "500000").toLong
    val epochs = sys.env.getOrElse("SPARK_GRAFT_EPOCHS", "4").toInt
    val spark = graft.Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val day = 24L * 3600 * 1000000L
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val cfg = GenConfig(numConversations = conversations,
      hotConversations = 4, hotFragments = 4096, epochs = epochs)
    val log = ChangeLogGen.generate(spark, cfg).repartition(cpus.toInt * 2).cache()
    val n = t("generate+cache")(log.count())
    println(s"[profile] events: $n over $epochs epochs")

    val wh = java.nio.file.Files.createTempDirectory("prof").toString
    val eng = new CdcEngine(wh, numBuckets = 32, cutoffMicros = 14 * day)

    (0L until epochs.toLong).foreach { epoch =>
      println(s"[profile] === epoch $epoch ===")
      val rawEvents = log.filter(_.epoch == epoch)
      val newEvents = rawEvents.withColumn("epoch", lit(epoch)).as[ChangeEvent]
      val stats = t(s"e$epoch stats-agg") {
        newEvents.toDF().agg(
          count(lit(1)), coalesce(min("offset"), lit(0L)),
          coalesce(max("offset"), lit(0L)), collect_set(eng.state.bucketCol))
          .collect()(0)
      }
      val batchRows = stats.getLong(0)
      val touched = stats.getSeq[Int](3).toSet
      val priorState = eng.state.snapshot(spark, buckets = Some(touched))
      val eventCols = spark.emptyDataset[ChangeEvent].columns
      val priorTouchedRows = eng.state.latestManifest()
        .map(_.files.filter(f => touched.contains(f.bucket)).map(_.rows).sum)
        .getOrElse(0L)
      val semiJoinWins = priorTouchedRows > 4L * math.max(batchRows, 1L)
      println(s"[profile] e$epoch batchRows=$batchRows priorRows=$priorTouchedRows semiJoin=$semiJoinWins")
      val priorEvents =
        if (priorState.columns.isEmpty) spark.emptyDataset[ChangeEvent]
        else {
          val pruned =
            if (semiJoinWins)
              priorState.join(newEvents.select("repo").distinct(), Seq("repo"), "left_semi")
            else priorState
          pruned.select(eventCols.map(col): _*).as[ChangeEvent]
        }
      val cutoff = 14 * day
      val out = priorEvents.union(newEvents)
        .groupByKey(_.repo)
        .flatMapGroups((repo, it) => CdcPipeline.applyGroup(repo, it, cutoff, epoch))
        .cache()
      val upserts = CdcPipeline.withRowSha(
        out.filter(_.transfer.isDefined).map(_.transfer.get).toDF())
      val freshEvents = out.filter(_.event.isDefined).map(_.event.get).toDF()
        .withColumn("content_sha256", sha2(col("content"), 256))
      t(s"e$epoch fold+cache (count)")(out.count())
      t(s"e$epoch appendNew")(
        eng.state.appendNew(freshEvents, epoch,
          touchedBuckets = Some(touched), assumeNew = true))
      t(s"e$epoch mergeDelta")(
        eng.transfers.mergeDelta(upserts, epoch, touchedBuckets = Some(touched)))
      out.unpersist()
    }
    println(s"[profile] warehouse: $wh")
    spark.stop()
  }
}
