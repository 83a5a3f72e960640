package graft.tools

import graft.classifier._
import org.apache.spark.sql.SparkSession

/** Minimal end-to-end drive: Dataset[SpineMessage] → groupByKey(conversation)
  * → classify fold → show. Used to verify the classifier through the real
  * Spark surface (encoders, serialization, shuffle).
  */
object ClassifyDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("classify-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = 1577836800000000L
    val hour = 3600L * 1000000L
    val day  = 24 * hour
    def msg(conv: String, guid: String, t: Long, kind: String, from: String, to: String,
            ref: Option[String] = None, err: Option[Int] = None) =
      SpineMessage(t, conv, guid, kind, from, to, ref, err, Some("SysA"), Some("SysB"))

    import Interactions._
    val messages = Seq(
      // conv-ok: integrated on time
      msg("conv-ok", "conv-ok", base, EhrRequestStarted, "req", "snd"),
      msg("conv-ok", "ack1", base + 1, ApplicationAck, "snd", "req", ref = Some("conv-ok")),
      msg("conv-ok", "ehr1", base + hour, EhrRequestCompleted, "snd", "req"),
      msg("conv-ok", "ack2", base + hour + day, ApplicationAck, "req", "snd", ref = Some("ehr1")),
      // conv-late: integrated after 9 days
      msg("conv-late", "conv-late", base, EhrRequestStarted, "req", "snd"),
      msg("conv-late", "lack1", base + 1, ApplicationAck, "snd", "req", ref = Some("conv-late")),
      msg("conv-late", "lehr", base + hour, EhrRequestCompleted, "snd", "req"),
      msg("conv-late", "lack2", base + hour + 9 * day, ApplicationAck, "req", "snd", ref = Some("lehr")),
      // conv-fail: final error
      msg("conv-fail", "conv-fail", base, EhrRequestStarted, "req", "snd"),
      msg("conv-fail", "fack1", base + 1, ApplicationAck, "snd", "req", ref = Some("conv-fail")),
      msg("conv-fail", "fehr", base + hour, EhrRequestCompleted, "snd", "req"),
      msg("conv-fail", "fack2", base + 2 * hour, ApplicationAck, "req", "snd",
        ref = Some("fehr"), err = Some(28)),
      // conv-nostart: missing start — must be dropped
      msg("conv-nostart", "xehr", base, EhrRequestCompleted, "snd", "req"),
      // conv-cutoff: ack arrives past the 14-day cutoff → not integrated
      msg("conv-cutoff", "conv-cutoff", base, EhrRequestStarted, "req", "snd"),
      msg("conv-cutoff", "cack1", base + 1, ApplicationAck, "snd", "req", ref = Some("conv-cutoff")),
      msg("conv-cutoff", "cehr", base + hour, EhrRequestCompleted, "snd", "req"),
      msg("conv-cutoff", "cack2", base + 20 * day, ApplicationAck, "req", "snd", ref = Some("cehr")),
    )

    val cutoffMicros = 14 * day
    val transfers = spark.createDataset(messages)
      .groupByKey(_.conversationId)
      .flatMapGroups { (_, it) =>
        TransferClassifier.classify(it.toSeq, cutoffMicros).iterator
      }

    transfers.orderBy("conversationId")
      .select("conversationId", "status", "failureReason", "slaDurationSeconds")
      .show(20, truncate = false)
    spark.stop()
  }
}
