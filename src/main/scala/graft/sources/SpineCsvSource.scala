package graft.sources

import graft.cdc.ChangeEvent
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's NATIVE wire format: quoted, headered spine-message CSV
  * (`tests/e2e/.../template-spine_messages.csv:1`, read by stream → gunzip →
  * csv.DictReader in `utils/input_output/s3.py:34-53`) — as opposed to
  * `ChangeLogSource`, which reads this engine's own change-log envelope. A
  * reference user pointing this engine at their existing
  * `v3/yyyy/mm/dd/yyyy-mm-dd_spine_messages.csv.gz` buckets ingests through
  * here: each CSV row becomes one change event whose `content` is the raw
  * 10-field message line `MessageParser` parses downstream (schema-on-read,
  * same as every other ingest path).
  *
  * Envelope synthesis (the reference has no binlog envelope):
  *  - `repo` = conversationID (the session key), `commit` = a per-ROW unique
  *    id — NOT the GUID: the reference never dedups repeated GUIDs at
  *    ingest; a re-used GUID must reach the session parser's Python-dict
  *    re-put semantics (`gp2gp_conversation.py:237-251`), so GUID dedup
  *    here would change outcomes.
  *  - `offset` = fileDay · 2²⁰ + row index within the file (gzip CSVs are
  *    unsplittable, so a file's rows arrive in stream order inside their
  *    split; files can share a packed partition — the counter resets on the
  *    file boundary). Reproduces the reference's stream order as the
  *    deterministic tiebreak for equal-time messages.
  *  - `tsMicros` = offset (arrival order, not event time — event time lives
  *    in the payload and is parsed by the fold).
  */
object SpineCsvSource {

  val spineSchema: StructType = StructType(Seq(
    "_time", "conversationID", "GUID", "interactionID", "messageSender",
    "messageRecipient", "messageRef", "jdiEvent", "toSystem", "fromSystem",
  ).map(StructField(_, StringType, nullable = true)))

  private val fileDayRe = """(\d{4})-(\d{2})-(\d{2})_spine_messages""".r.unanchored

  /** Day ordinal from the v3 filename, for cross-file offset ordering;
    * files outside the naming scheme order by path hash (still
    * deterministic, just not calendar-ordered).
    */
  private def fileOrdinal(path: String): Long = path match {
    case fileDayRe(y, m, d) =>
      java.time.LocalDate.of(y.toInt, m.toInt, d.toInt).toEpochDay
    case _ => (path.hashCode.toLong & 0xffffffffL) + (1L << 33)
  }

  def read(spark: SparkSession, paths: String*): Dataset[ChangeEvent] = {
    import spark.implicits._
    val raw = spark.read
      .schema(spineSchema)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .csv(paths: _*)
      .select(col("_metadata.file_path").as("__file"), col("*"))
    raw.mapPartitions { rows =>
      var file: String = null
      var ordinal = 0L
      var idx = 0L
      rows.map { r =>
        val f = r.getString(0)
        if (f != file) { file = f; ordinal = fileOrdinal(f); idx = 0L }
        val fields = (1 to 10).map(i => Option(r.getString(i)).getOrElse(""))
        require(fields.forall(!_.contains(",")),
          s"spine CSV field containing a comma cannot round-trip the " +
            s"message line (reference fields never do): $fields")
        val offset = ordinal * (1L << 20) + idx
        idx += 1
        ChangeEvent(
          repo = fields(1), path = f, commit = s"$f#${idx - 1}",
          lang = "spine", content = fields.mkString(","),
          offset = offset, op = "insert", tsMicros = offset, epoch = 0L)
      }
    }
  }
}
