package graft.jobs

import graft.cdc.{CdcPipeline, Enrichment, Export, ReportingWindow}
import graft.sources.ChangeLogSource
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.time.LocalDate

/** The reference's front door re-expressed: an env-configured batch run —
  * window resolution (explicit start/end or the yesterday−cutoff default),
  * gzip-CSV scan, classify, optional dimension enrichment, daily-partitioned
  * export, optional MI branch. Donors: `pipeline/config.py:76-92` (env
  * parsing, paired-date validation, defaults) and `pipeline/main.py:21-34`
  * (runner selection via CLASSIFY_MI_EVENTS).
  *
  * Env surface (graft-prefixed analogues of the reference's variables):
  *   GRAFT_START_DATE / GRAFT_END_DATE  yyyy-MM-dd, both or neither
  *   GRAFT_CUTOFF_DAYS                  default 14
  *   GRAFT_INPUT                        change-log CSV dir(s), comma-separated
  *   GRAFT_INPUT_BASE                   alternative to GRAFT_INPUT: a base
  *                                      ("bucket") whose day files are
  *                                      resolved from the window via the
  *                                      reference's v3 URI scheme
  *                                      (window + overflow days —
  *                                      s3_uri_resolver.py:39-52)
  *   GRAFT_OUTPUT                       daily parquet export dir
  *   GRAFT_DIM_PATH                     optional org dimension: parquet dir
  *                                      OR comma-separated monthly
  *                                      organisationMetadata.json files
  *                                      (the reference's native format)
  *   GRAFT_STRICT_ODS=true              raise (reference OdsMetadataNotFound
  *                                      behaviour) when a window month and
  *                                      its previous month both lack a dim
  *                                      snapshot, instead of null-padding
  *   GRAFT_CLASSIFY_MI=true             run the MI branch instead
  *   GRAFT_MI_INPUT / GRAFT_MI_OUTPUT   MI JSON events dir(s), comma-
  *                                      separated → parquet dir
  *   GRAFT_MI_INPUT_BASE                alternative to GRAFT_MI_INPUT: a
  *                                      base whose v1/yyyy/mm/dd day
  *                                      prefixes are resolved from the
  *                                      window (s3_uri_resolver.py:89-104)
  */
final case class PipelineConfig(
    window: ReportingWindow,
    inputPaths: Seq[String],
    outputDir: String,
    dimPath: Option[String],
    strictOds: Boolean,
    classifyMi: Boolean,
    miInputs: Seq[String],
    miOutput: Option[String],
    /** true = the reference's wire shape (one JSON object per file, no seq,
      * arrival order stamped from the listing) — set when the inputs came
      * from GRAFT_MI_INPUT_BASE. false = engine-native ndjson with explicit
      * seq (GRAFT_MI_INPUT).
      */
    miReferenceFormat: Boolean = false,
    /** GRAFT_INPUT_FORMAT=spine-csv: inputs are the reference's NATIVE
      * quoted spine-message CSVs (SpineCsvSource) instead of this engine's
      * change-log envelope (ChangeLogSource).
      */
    spineNative: Boolean = false,
)

object PipelineConfig {
  def fromEnv(env: Map[String, String],
              today: LocalDate = LocalDate.now(java.time.ZoneOffset.UTC)): PipelineConfig = {
    val cutoff = env.get("GRAFT_CUTOFF_DAYS").map(_.toInt).getOrElse(14)
    val window = (env.get("GRAFT_START_DATE"), env.get("GRAFT_END_DATE")) match {
      case (Some(s), Some(e)) =>
        ReportingWindow(LocalDate.parse(s), LocalDate.parse(e), cutoff)
      case (None, None) => ReportingWindow.default(today, cutoff)
      case _ => throw new IllegalArgumentException(
        "GRAFT_START_DATE and GRAFT_END_DATE must be provided together " +
          "(reference config.py pairing rule)")
    }
    val classifyMi = env.get("GRAFT_CLASSIFY_MI").contains("true")
    env.get("GRAFT_INPUT_FORMAT").foreach(v => require(v == "spine-csv",
      s"unknown GRAFT_INPUT_FORMAT '$v' — supported: spine-csv " +
        "(omit for the engine's change-log envelope CSV)"))
    def required(k: String): String = env.getOrElse(k,
      throw new IllegalArgumentException(s"$k is required"))
    PipelineConfig(
      window = window,
      inputPaths =
        if (classifyMi) Seq.empty
        else env.get("GRAFT_INPUT_BASE") match {
          // the reference resolves its input URIs FROM the window (main.py →
          // TransferClassifierS3UriResolver.spine_messages)
          case Some(base) => graft.cdc.UriResolver.spineMessages(base, window.scanDays)
          case None =>
            required("GRAFT_INPUT").split(',').toSeq.map(_.trim).filter(_.nonEmpty)
        },
      outputDir = if (classifyMi) "" else required("GRAFT_OUTPUT"),
      dimPath = env.get("GRAFT_DIM_PATH"),
      strictOds = env.get("GRAFT_STRICT_ODS").contains("true"),
      classifyMi = classifyMi,
      miInputs = env.get("GRAFT_MI_INPUT_BASE") match {
        // window → day prefixes via the reference's v1 scheme, dates +
        // overflow dates like its resolver (s3_uri_resolver.py:89-104)
        case Some(base) => graft.cdc.UriResolver.miEvents(base, window.scanDays)
        case None => env.get("GRAFT_MI_INPUT").toSeq
          .flatMap(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      },
      miOutput = env.get("GRAFT_MI_OUTPUT"),
      miReferenceFormat = env.contains("GRAFT_MI_INPUT_BASE"),
      spineNative = env.get("GRAFT_INPUT_FORMAT").contains("spine-csv"),
    )
  }
}

object TransferPipelineJob {

  /** Spine branch: scan → classify → window filter → (enrich) → daily export. */
  def runSpine(spark: SparkSession, cfg: PipelineConfig): Long = {
    val events =
      if (cfg.spineNative) graft.sources.SpineCsvSource.read(spark, cfg.inputPaths: _*)
      else ChangeLogSource.readCsv(spark, cfg.inputPaths: _*)
    val w = cfg.window
    val classified = CdcPipeline.classify(events, w.cutoffMicros).toDF()
      .filter(col("dateRequestedMicros") >= lit(w.startMicros) &&
        col("dateRequestedMicros") < lit(w.endMicros))
    val enriched = cfg.dimPath match {
      case Some(p) =>
        // the reference's native dim format is monthly organisationMetadata
        // JSON (comma-separated month files); parquet stays the lake-native
        // alternative (shared rules: Enrichment.loadDim)
        val dim = Enrichment.loadDim(spark, p)
        // the reference RAISES when a window month and its previous month
        // both lack a dim snapshot (organisation_metadata_monthly.py:26-34);
        // GRAFT_STRICT_ODS reproduces the raise, the default surfaces the
        // condition loudly and null-pads
        val present = Enrichment.presentMonths(dim) // one job, shared below
        val missing = Enrichment.missingDimMonths(dim, w.months, Some(present))
        if (missing.nonEmpty && cfg.strictOds)
          throw new IllegalStateException(
            s"OdsMetadataNotFound: months ${missing.mkString(",")} have no dim " +
              "snapshot in {month, previous month} (GRAFT_STRICT_ODS=true)")
        if (missing.nonEmpty)
          println(s"[graft] MISSING_ODS_METADATA months=${missing.mkString(",")} " +
            "— affected transfers will be null-padded")
        Enrichment.enrich(classified, dim, presentMonthsHint = Some(present))
      case None    => classified
    }
    Export.exportDaily(enriched, cfg.outputDir)
    // the reference's one runtime metric: per-output row count log
    val n = spark.read.parquet(cfg.outputDir).count()
    println(s"[graft] TRANSFER_CLASSIFIER_ROW_COUNT total=$n -> ${cfg.outputDir}")
    n
  }

  /** MI branch (reference MiRunner): JSON events → ordered fold → parquet. */
  def runMi(spark: SparkSession, cfg: PipelineConfig): Long = {
    if (cfg.miInputs.isEmpty) throw new IllegalArgumentException(
      "GRAFT_MI_INPUT or GRAFT_MI_INPUT_BASE is required with GRAFT_CLASSIFY_MI")
    val out = cfg.miOutput.getOrElse(
      throw new IllegalArgumentException("GRAFT_MI_OUTPUT is required with GRAFT_CLASSIFY_MI"))
    // window-resolved day prefixes may not all exist (the reference reads
    // an S3 listing, where an empty prefix is just empty) — drop absent
    // dirs instead of failing the scan. ONLY for the GRAFT_MI_INPUT_BASE
    // contract: explicit GRAFT_MI_INPUT paths go to the reader untouched,
    // so globs still expand there and a mistyped dir fails loudly instead
    // of being silently skipped. Filesystem resolved per path (prefixes
    // may span schemes).
    val present =
      if (!cfg.miReferenceFormat) cfg.miInputs
      else cfg.miInputs.filter { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
      }
    if (present.isEmpty) throw new IllegalArgumentException(
      s"none of the MI input prefixes exist: ${cfg.miInputs.mkString(",")}")
    val transfers = graft.mi.MiPipeline.toMiTransfers(
      graft.mi.MiPipeline.readEventsArrival(spark, present,
        referenceFormat = cfg.miReferenceFormat))
    transfers.write.mode("overwrite").parquet(out)
    val n = spark.read.parquet(out).count()
    println(s"[graft] MI_TRANSFER_ROW_COUNT total=$n -> $out")
    n
  }

  def run(spark: SparkSession, cfg: PipelineConfig): Long =
    if (cfg.classifyMi) runMi(spark, cfg) else runSpine(spark, cfg)

  def main(args: Array[String]): Unit = {
    val cfg = PipelineConfig.fromEnv(sys.env)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, cfg) finally spark.stop()
  }
}
