package graft.mi

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The MI branch — the reference's secondary pipeline over deeply nested
  * JSON events (`MiRunner`): construct nested messages, group by
  * conversation in arrival order, fold to MiTransfer (supplier deduction,
  * find-first ODS codes, slow-transfer flag).
  *
  * Reference donors:
  *  - nested payload model: `src/prmdata/domain/mi/mi_message.py:27-126`
  *  - parse (camelCase .get chains, BST tz map): `mi_service.py:131-218`
  *  - ordered group-by: `mi_service.py:220-231`
  *  - fold: `mi_service.py:233-283` (requesting supplier = 1st event's
  *    reporter, sending = 2nd's; ODS = first non-null payload registration
  *    field IN ARRIVAL ORDER; slow = received − requested > 1 day using
  *    find-first over event types, `:111-129`)
  *  - JSON prefix scan: `utils/input_output/s3.py:111-126`
  *
  * Spark-first shape: this branch is fully relational — `from_json` with an
  * explicit nested schema (schema-on-read, S5), then ONE hash aggregation
  * with order-aware aggregates (`min_by` over an arrival sequence column);
  * no typed fold needed, whole path stays in Tungsten.
  */
object MiPipeline {

  val eventTypes: Seq[String] = Seq(
    "EHR_GENERATED", "EHR_INTEGRATED", "EHR_REQUESTED", "EHR_SENT",
    "EHR_VALIDATED", "ERROR", "PDS_GENERAL_UPDATE", "REGISTRATION_STARTED",
    "SDS_LOOKUP", "PDS_TRACE", "EHR_READY_TO_INTEGRATE",
    "MIGRATE_DOCUMENT_REQUEST", "MIGRATE_DOCUMENT_RESPONSE",
    "MIGRATE_STRUCTURED_RECORD_REQUEST", "MIGRATE_STRUCTURED_RECORD_RESPONSE",
    "INTERNAL_TRANSFER")

  /** Nested payload schema — `mi_message.py:27-113`, camelCase like the wire
    * format the reference parses.
    */
  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })
  private val statusReason = st("status" -> StringType, "reason" -> StringType)

  private val codingType = ArrayType(st("code" -> StringType, "system" -> StringType))
  private val degradeType = ArrayType(st(
    "type" -> StringType, "metadata" -> StringType,
    "code" -> st("coding" -> codingType)))
  private val attachmentType = ArrayType(st(
    "attachmentId" -> StringType, "clinicalType" -> StringType,
    "mimeType" -> StringType, "sizeBytes" -> StringType))
  private val placeholderType = ArrayType(st(
    "placeholderId" -> StringType, "attachmentId" -> StringType,
    "generatedBy" -> StringType, "reason" -> IntegerType,
    "originalMimeType" -> StringType))
  private val unsupportedType = ArrayType(st(
    "type" -> StringType, "uniqueIdentifier" -> StringType, "reason" -> StringType))
  private val errorType = ArrayType(st(
    "errorCode" -> IntegerType, "errorDescription" -> StringType))
  private val ehrType = st(
    "ehrTotalSizeBytes" -> LongType, "ehrStructuredSizeBytes" -> LongType,
    "degrade" -> degradeType, "attachment" -> attachmentType,
    "placeholder" -> placeholderType, "unsupportedDataItem" -> unsupportedType,
    "error" -> errorType)

  val payloadSchema: StructType = st(
    "registration" -> st(
      "registrationType" -> StringType,
      "requestingPracticeOdsCode" -> StringType,
      "sendingPracticeOdsCode" -> StringType),
    "integration" -> st("integrationStatus" -> StringType, "reason" -> StringType),
    "ehr" -> ehrType,
    "transferCompatibilityStatus" -> statusReason,
    "demographicTraceStatus" -> statusReason,
    "smartcardPresent" -> BooleanType,
    "structuredRecordMigration" -> statusReason,
    "documentMigration" -> statusReason,
  )

  val eventSchema: StructType = StructType(Seq(
    StructField("conversationId", StringType, nullable = false),
    StructField("eventId", StringType, nullable = false),
    StructField("eventType", StringType, nullable = false),
    StructField("transferProtocol", StringType),
    StructField("eventGeneratedDateTime", StringType),
    StructField("reportingSystemSupplier", StringType),
    StructField("reportingPracticeOdsCode", StringType),
    StructField("transferEventDateTime", StringType),
    StructField("seq", LongType, nullable = false), // arrival order
    StructField("payload", payloadSchema),
  ))

  /** BST/UTC-suffixed or ISO timestamp string → timestamp (µs). Mirrors the
    * spine parser's tz map for MI datetimes (`mi_service.py:132-147`).
    */
  def parseTz(c: Column): Column = {
    val trimmed = regexp_replace(c, " (BST|UTC)$", "")
    val shifted = when(c.endsWith(" BST"),
      to_timestamp(trimmed) - expr("INTERVAL 1 HOUR")).otherwise(to_timestamp(trimmed))
    shifted
  }

  /** JSON-lines scan with explicit schema (S5). */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(eventSchema).json(path)

  /** MI event scan with an EXPLICIT format, chosen by the caller (probing
    * the data for a format is both an extra full scan and wrong on mixed
    * feeds — the caller always knows which contract it resolved).
    *
    * `referenceFormat = true`: one (pretty-printed) JSON object per file,
    * the reference's S3 wire shape (`s3.py:111-126` json.loads's each
    * object body whole), which carries NO `seq` — every event is stamped
    * with row_number over (file path, in-file position), reproducing the
    * reference's prefix-listing order (lexicographic, pinned by its e2e).
    * The single global window is deliberate: the MI branch is the
    * reference's small side pipeline (per-day JSON event files), not the
    * 100-TB path — feeds at scale should ship an explicit `seq`.
    *
    * `referenceFormat = false`: engine-native ndjson (one event per line,
    * `readEvents` contract) with an explicit `seq` on every event — read
    * as-is; multiLine parsing here would silently keep only the FIRST
    * event of each file.
    */
  def readEventsArrival(spark: SparkSession, paths: Seq[String],
                        referenceFormat: Boolean = true): DataFrame =
    if (!referenceFormat) spark.read.schema(eventSchema).json(paths: _*)
    else {
      val raw = spark.read.schema(eventSchema).option("multiLine", true)
        .json(paths: _*)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("__file"), col("__pos"))
      raw.withColumn("__file", input_file_name())
        .withColumn("__pos", monotonically_increasing_id())
        .withColumn("seq", row_number().over(w).cast("long"))
        .drop("__file", "__pos")
    }

  /** Parse raw JSON strings (for embedded/streamed payloads). */
  def parseEvents(raw: DataFrame, jsonCol: String): DataFrame =
    raw.select(from_json(col(jsonCol), eventSchema).as("e")).select("e.*")

  /** The A8+A9 fold, fully relational: one groupBy(conversationId) with
    * order-aware aggregates over the arrival sequence.
    */
  def toMiTransfers(events: DataFrame): DataFrame = {
    val gen = parseTz(col("eventGeneratedDateTime"))
    val tev = parseTz(col("transferEventDateTime"))
    val reqOds = col("payload.registration.requestingPracticeOdsCode")
    val sndOds = col("payload.registration.sendingPracticeOdsCode")
    val isRequested = col("eventType").isin("EHR_REQUESTED", "MIGRATE_STRUCTURED_RECORD_REQUEST")
    val isReceived  = col("eventType").isin("EHR_VALIDATED", "EHR_READY_TO_INTEGRATE")

    // find-first-in-arrival-order as an aggregate: min over (seq, value)
    // structs — null-safe (rows failing the condition contribute null, which
    // min ignores) and single-pass
    def firstWhere(cond: Column, value: Column): Column =
      min(when(cond, struct(col("seq").as("o"), value.as("v")))).getField("v")

    // The 1st/2nd-arrival suppliers come out of the SAME sorted event list
    // the output already collects (elements 1 and 2 of the seq-sorted
    // array) instead of a row_number window: the window shared the agg's
    // shuffle but still cost a full Sort + Window pass per run, removed
    // here (r7, guide §2.4 — same key, one pass). The supplier rides the
    // collected struct AFTER (seq, s), so the sort order is unchanged for
    // every distinct (seq, s); element_at(_, 2) on a 1-element array is
    // null, exactly like the former `__rn = 2` min over no rows.
    events
      .withColumn("__gen", gen)
      .withColumn("__tev", tev)
      .groupBy(col("conversationId").as("conversation_id"))
      .agg(
        // events list in arrival order — summary like mi_transfer.EventSummary
        array_sort(collect_list(struct(col("seq"),
          struct(
            date_format(col("__gen"), "yyyy-MM-dd'T'HH:mm:ss").as("event_generated_datetime"),
            col("eventType").as("event_type"),
            col("eventId").as("event_id")).as("s"),
          col("reportingSystemSupplier").as("sup")))).as("__evs"),
        firstWhere(reqOds.isNotNull, reqOds).as("requesting_ods_code"),
        firstWhere(sndOds.isNotNull, sndOds).as("sending_ods_code"),
        firstWhere(isRequested, col("__tev")).as("__requested_at"),
        firstWhere(isReceived, col("__tev")).as("__received_at"))
      .select(
        col("conversation_id"),
        transform(col("__evs"), x => x.getField("s")).as("events"),
        // try_element_at, not element_at: ANSI mode (Spark 4 default)
        // makes element_at THROW out of bounds; try_ yields the null a
        // singleton conversation's missing 2nd event must produce
        try_element_at(col("__evs"), lit(1)).getField("sup").as("requesting_supplier"),
        // sending supplier = the 2nd event's reporter (null for singletons)
        try_element_at(col("__evs"), lit(2)).getField("sup").as("sending_supplier"),
        col("requesting_ods_code"), col("sending_ods_code"),
        when(col("__requested_at").isNull || col("__received_at").isNull, lit(null).cast("boolean"))
          .otherwise(unix_micros(col("__received_at")) - unix_micros(col("__requested_at"))
            > 24L * 3600 * 1000000L).as("slow_transfer"))
  }
}
