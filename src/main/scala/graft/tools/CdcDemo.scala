package graft.tools

import graft.cdc._
import graft.lake.LakeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end drive of the CDC engine: generate a deterministic change log,
  * tail it epoch by epoch into the lake, then replay from scratch and verify
  * byte-identical state via row_sha256 equality. Prints the outcome mix, the
  * last commit manifest, and the warehouse layout.
  */
object CdcDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("cdc-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val day = 24L * 3600 * 1000000L
    val cfg = GenConfig(numConversations = 500, hotConversations = 2,
      hotFragments = 256, redeliveryPermille = 30, epochs = 4)
    val log = ChangeLogGen.generate(spark, cfg).cache()
    println(s"change log: ${log.count()} events, " +
      s"${log.select("repo").distinct().count()} sessions")

    val dir = java.nio.file.Files.createTempDirectory("cdc-demo").toString
    val window = ReportingWindow(
      java.time.LocalDate.of(2019, 12, 1), java.time.LocalDate.of(2020, 1, 1), 14)
    val dim = Enrichment.generateDim(spark, numAsids = 997,
      yearMonths = Seq(201911, 201912))
    val eng = new CdcEngine(dir, numBuckets = 16, cutoffMicros = 14 * day,
      window = Some(window), odsMetadataMonth = Some(201912),
      dimMonths = Some(Set(201911, 201912)), dim = Some(dim))
    (0L until cfg.epochs.toLong).foreach { e =>
      val t0 = System.nanoTime()
      val m = eng.applyEpoch(spark, log.filter(_.epoch == e), e)
      // totalRows counts physical rows (merge-on-read keeps superseded
      // versions until compaction); show the resolved live count
      println(f"epoch $e: ${m.lineage("batchRows")} events → " +
        f"table ${eng.currentTransfers(spark).count()} live rows " +
        f"(${m.lineage("totalRows")} physical), schemaId ${m.schemaId}, " +
        f"${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    println("\noutcome mix:")
    eng.currentTransfers(spark)
      .groupBy("status", "failureReason").count()
      .orderBy(desc("count")).show(20, truncate = false)

    // replay from scratch → identical state
    val dir2 = java.nio.file.Files.createTempDirectory("cdc-replay").toString
    val eng2 = new CdcEngine(dir2, numBuckets = 16, cutoffMicros = 14 * day)
    val t0 = System.nanoTime()
    (0L until cfg.epochs.toLong).foreach(e =>
      eng2.applyEpoch(spark, log.filter(_.epoch == e), e))
    val replaySec = (System.nanoTime() - t0) / 1e9
    val a = eng.currentTransfers(spark).select("repo", "row_sha256")
    val b = eng2.currentTransfers(spark).select("repo", "row_sha256")
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(f"replay: $replaySec%.1fs, row_sha256 diffs = $diff (expect 0)")

    // incrementally-maintained enriched output (third lake table)
    val enr = eng.currentEnriched(spark)
    val resolved = enr.filter(col("requesting_practice_ods_code").isNotNull).count()
    println(f"\nenriched table: ${enr.count()} rows, $resolved with requesting practice resolved")

    println(s"\nwarehouse: $dir")
    val last = eng.transfers.latestManifest().get
    println(s"manifest metadata: ${last.metadata}")
    println(s"manifest lineage:  ${last.lineage}")
    println("\n_lineage table (per-partition write metrics, last 8):")
    eng.transfers.lineageTable(spark)
      .selectExpr("epoch", "bucket", "rows", "lineage['batchRows'] AS batch_rows",
        "lineage['duplicatesDropped'] AS dupes")
      .orderBy(desc("epoch"), col("bucket")).show(8, truncate = false)
    spark.stop()
    if (diff != 0) sys.exit(1)
  }
}
