package graft.tools

import graft.cdc._
import graft.lake.LakeTable
import org.apache.spark.sql.functions._

/** Phase-level profile of one epoch apply — where does the time go. */
object ApplyProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val conversations = sys.env.getOrElse("SPARK_GRAFT_CDC_CONV", "2000000").toLong
    val spark = graft.Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val day = 24L * 3600 * 1000000L
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val cfg = GenConfig(numConversations = conversations,
      hotConversations = 4, hotFragments = 4096, epochs = 1)
    val log = ChangeLogGen.generate(spark, cfg).repartition(cpus.toInt * 2).cache()
    val n = t("generate+cache")(log.count())
    println(s"[profile] events: $n")

    val wh = java.nio.file.Files.createTempDirectory("prof").toString
    val state = new LakeTable(s"$wh/state", 32, Seq("repo", "commit"), Seq("repo"))
    val transfers = new LakeTable(s"$wh/transfers", 32, Seq("repo"))

    val deduped = t("dedup-shuffle+cache") {
      val d = log.groupByKey(e => (e.repo, e.commit))
        .reduceGroups((a, b) => if (a.offset <= b.offset) a else b).map(_._2)
        .toDF().cache()
      d.count(); d
    }
    val touched = t("stats") {
      deduped.agg(collect_set(state.bucketCol)).collect()(0).getSeq[Int](0).toSet
    }
    val classified = t("classify+sha (compute only, noop write)") {
      val c = CdcPipeline.withRowSha(
        CdcPipeline.classify(deduped.as[ChangeEvent], 14 * day).toDF())
      c.write.mode("overwrite").format("noop").save(); c
    }
    t("transfers.merge")(transfers.merge(classified, 0L, touchedBuckets = Some(touched)))
    t("state.appendNew")(state.appendNew(
      deduped.withColumn("content_sha256", sha2(col("content"), 256)),
      0L, touchedBuckets = Some(touched)))
    spark.stop()
  }
}
