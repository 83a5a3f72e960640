package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S7: daily-partitioned columnar output — the reference writes one parquet
  * per day in a driver loop (`spine_runner.py:28-54`, paths
  * `v11/cutoff-{c}/YYYY/MM/DD/...`, `s3_uri_resolver.py:77-87`); Spark-first
  * this is ONE `partitionBy(day)` write, with the day derived from
  * `date_requested` exactly like the reference's P2 day assignment.
  */
object Export {
  def withDay(transfers: DataFrame): DataFrame =
    transfers.withColumn("date_requested_day",
      date_format(timestamp_micros(col("dateRequestedMicros")), "yyyy-MM-dd"))

  def exportDaily(transfers: DataFrame, outDir: String): Unit =
    withDay(transfers)
      .repartition(col("date_requested_day"))
      .write.mode("overwrite")
      .partitionBy("date_requested_day")
      .parquet(outDir)
}
