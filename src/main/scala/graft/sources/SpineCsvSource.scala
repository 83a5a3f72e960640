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
  *  - `offset` = fileOrdinal · 2³² + row index within the file, where a
  *    v3-dated file's ordinal is a pure function of its calendar day (so
  *    offsets are stable and globally ordered ACROSS separate reads — an
  *    incremental one-day-per-epoch caller keeps a deterministic total
  *    order; see `ordinals`). Gzip CSVs are unsplittable,
  *    so a file's rows arrive in stream order inside their one split
  *    (enforced: non-.gz inputs are rejected — a multi-split file would
  *    restart the row index per split); files can share a packed partition
  *    — the counter resets on the file boundary. Reproduces the
  *    reference's stream order as the deterministic tiebreak for
  *    equal-time messages.
  *  - `tsMicros` = offset (arrival order, not event time — event time lives
  *    in the payload and is parsed by the fold).
  */
object SpineCsvSource {

  val spineSchema: StructType = StructType(Seq(
    "_time", "conversationID", "GUID", "interactionID", "messageSender",
    "messageRecipient", "messageRef", "jdiEvent", "toSystem", "fromSystem",
  ).map(StructField(_, StringType, nullable = true)))

  private val fileDayRe = """(\d{4})-(\d{2})-(\d{2})_spine_messages""".r.unanchored

  /** Sort key for cross-file offset ordering: the v3 filename's date when
    * present (calendar order), else the path itself (lexicographic,
    * deterministic).
    */
  private def fileKey(path: String): (Long, String) = path match {
    case fileDayRe(y, m, d) =>
      (java.time.LocalDate.of(y.toInt, m.toInt, d.toInt).toEpochDay, path)
    case _ => (Long.MaxValue, path)
  }

  private val UndatedBase = 1L << 20

  /** File ordinals: v3-dated files get `epochDay·16 + same-day rank` — a
    * pure function of the calendar for the one-file-per-day layout, so
    * offsets stay STABLE AND ORDERED ACROSS SEPARATE read() CALLS (an
    * incremental caller reading one day per epoch still produces globally
    * ordered, collision-free offsets; multiple files for the SAME day are
    * ranked within the read only). Undated files rank after every dated
    * one, per read. Bounds keep `ordinal · 2³² + idx` far from Long
    * overflow (epochDay < 2¹⁶ ⇒ dated ordinals < 2²⁰ = UndatedBase).
    */
  private def ordinals(files: Seq[String]): Map[String, Long] = {
    val (dated, undated) = files.partition(fileDayRe.findFirstIn(_).isDefined)
    val datedOrds = dated.groupBy(f => fileKey(f)._1).toSeq.flatMap {
      case (day, fs) =>
        require(day < (1L << 16), s"file day $day out of ordinal range")
        require(fs.size <= 16, s"more than 16 spine files for one day: $fs")
        fs.sorted.zipWithIndex.map { case (f, i) => f -> (day * 16 + i) }
    }
    val undatedOrds = undated.sorted.zipWithIndex.map {
      case (f, i) => f -> (UndatedBase + i)
    }
    (datedOrds ++ undatedOrds).toMap
  }

  def read(spark: SparkSession, paths: String*): Dataset[ChangeEvent] = {
    import spark.implicits._
    val raw = spark.read
      .schema(spineSchema)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .csv(paths: _*)
      .select(col("_metadata.file_path").as("__file"), col("*"))
    // the distinct file list from the source's FILE INDEX (metadata only —
    // no data scan) → a dense, collision-free ordinal per file
    // (calendar-then-path order). Also the place to enforce the
    // unsplittability contract: per-file row indexing below is only stream
    // order because a gzip member never splits — feed an uncompressed
    // multi-split file through this and split 2 would restart idx at 0,
    // silently colliding commits into classify's dedup.
    val files = raw.inputFiles.toSeq
    files.filterNot(_.endsWith(".gz")) match {
      case Seq() =>
      case bad => throw new IllegalArgumentException(
        "SpineCsvSource requires gzip inputs (unsplittable ⇒ per-file " +
          s"stream order is well-defined); not .gz: ${bad.take(3).mkString(", ")}")
    }
    // key the map under BOTH URI renderings: inputFiles returns decoded
    // Path strings while the _metadata.file_path column is URI-ENCODED
    // (Spark builds it via Path.toUri.toString — a path with a space reads
    // back as %20), and Path normalization does not reconcile the two
    val ordBase = ordinals(files.map(f => new org.apache.hadoop.fs.Path(f).toString))
    val ordinalOf: Map[String, Long] = files.flatMap { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val o = ordBase(p.toString)
      Seq(p.toString -> o, p.toUri.toString -> o)
    }.toMap
    raw.mapPartitions { rows =>
      var file: String = null
      var ordinal = 0L
      var idx = 0L
      rows.map { r =>
        val f = r.getString(0)
        if (f != file) {
          file = f
          ordinal = ordinalOf.getOrElse(f,
            ordinalOf.getOrElse(new org.apache.hadoop.fs.Path(f).toString,
              sys.error(s"spine file $f missing from the read's file index")))
          idx = 0L
        }
        val fields = (1 to 10).map(i => Option(r.getString(i)).getOrElse(""))
        require(fields.forall(!_.contains(",")),
          s"spine CSV field containing a comma cannot round-trip the " +
            s"message line (reference fields never do): $fields")
        require(idx < (1L << 32), s"file $f exceeds 2^32 rows — offset packing overflow")
        val offset = ordinal * (1L << 32) + idx
        idx += 1
        ChangeEvent(
          repo = fields(1), path = f, commit = s"$f#${idx - 1}",
          lang = "spine", content = fields.mkString(","),
          offset = offset, op = "insert", tsMicros = offset, epoch = 0L)
      }
    }
  }
}
