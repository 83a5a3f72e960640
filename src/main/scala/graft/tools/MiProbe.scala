package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway r7 probe: which phase of mi01 costs what (guide §1). */
object MiProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val et = when(col("event_type") === "purchase", "EHR_REQUESTED")
      .when(col("event_type") === "error", "EHR_VALIDATED")
      .when(col("event_type") === "signup", "REGISTRATION_STARTED")
      .when(col("event_type") === "click", "EHR_SENT")
      .otherwise("PDS_TRACE")
    val dtStr = when(col("event_type") === "click",
        concat(date_format(col("ts") + expr("INTERVAL 1 HOUR"), "yyyy-MM-dd HH:mm:ss"),
          lit(" BST")))
      .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
    def rawDf: DataFrame = ev.select(to_json(struct(
      concat(lit("conv-"), col("user_id")).as("conversationId"),
      col("event_id").cast("string").as("eventId"),
      et.as("eventType"),
      dtStr.as("eventGeneratedDateTime"),
      concat(lit("sys-"), pmod(col("event_id"), lit(5))).as("reportingSystemSupplier"),
      dtStr.as("transferEventDateTime"),
      row_number().over(w).cast("long").as("seq"),
      when(col("event_type") === "signup", struct(struct(
        concat(lit("ODS-R-"), col("event_id")).as("requestingPracticeOdsCode"),
        concat(lit("ODS-S-"), col("event_id")).as("sendingPracticeOdsCode"))
        .as("registration"))).as("payload"))).as("j"))

    def timed(name: String)(f: => DataFrame): Unit = {
      f.write.mode("overwrite").format("noop").save() // warm
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[miprobe] $name median=${ts(1)}%.3f")
    }

    timed("1_raw_json")(rawDf)
    timed("2_parse")(graft.mi.MiPipeline.parseEvents(rawDf, "j"))
    timed("3_full")(graft.mi.MiPipeline.toMiTransfers(
      graft.mi.MiPipeline.parseEvents(rawDf, "j")))
    timed("4_fold_only") {
      // fold over pre-built columns without the json round-trip
      val direct = ev.select(
        concat(lit("conv-"), col("user_id")).as("conversationId"),
        col("event_id").cast("string").as("eventId"),
        et.as("eventType"),
        dtStr.as("eventGeneratedDateTime"),
        concat(lit("sys-"), pmod(col("event_id"), lit(5))).as("reportingSystemSupplier"),
        dtStr.as("transferEventDateTime"),
        row_number().over(w).cast("long").as("seq"),
        when(col("event_type") === "signup", struct(struct(
          concat(lit("ODS-R-"), col("event_id")).as("requestingPracticeOdsCode"),
          concat(lit("ODS-S-"), col("event_id")).as("sendingPracticeOdsCode"))
          .as("registration"))).as("payload"))
      graft.mi.MiPipeline.toMiTransfers(direct)
    }
    spark.stop()
  }
}
