package graft.sources

import graft.cdc.ChangeEvent
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-level change-log source/sink — the reference's gzip-CSV scan (S1:
  * stream → gunzip → DictReader, `utils/input_output/s3.py:34-53`) as a
  * native Spark CSV read (gzip transparent, header, explicit schema with
  * FAILFAST like the reference's fail-fast row construction), and the
  * multi-file path-set scan (S2, `s3_uri_resolver.py:33-51`) as one read
  * over many paths.
  */
object ChangeLogSource {

  val csvSchema: StructType = StructType(Seq(
    StructField("repo", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("commit", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("content", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("tsMicros", LongType, nullable = false),
    StructField("epoch", LongType, nullable = false),
  ))

  /** Write the log as gzip CSV (header row, quoted content field). */
  def writeCsv(events: Dataset[ChangeEvent], dir: String): Unit =
    events.toDF().write.mode("overwrite")
      .option("header", "true")
      .option("compression", "gzip")
      .csv(dir)

  /** S1+S2: one read over any number of paths; FAILFAST mirrors the
    * reference's abort-on-malformed-row behaviour.
    */
  def readCsv(spark: SparkSession, paths: String*): Dataset[ChangeEvent] = {
    import spark.implicits._
    spark.read
      .schema(csvSchema)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .csv(paths: _*)
      .as[ChangeEvent]
  }
}
