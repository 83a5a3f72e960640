package graft.lake

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Commit manifest — the unit of exactly-once. One JSON file per epoch,
  * written atomically (tmp + rename); the newest contiguous manifest defines
  * the table. Reproduces (from scratch — no Iceberg jar in this environment)
  * the snapshot/manifest/schema-id/metadata model the north_star asks for,
  * and the reference's per-file user metadata (`cutoff-days`, `build-tag`,
  * `start/end-datetime` — `pipeline/spine_runner.py:39-54`,
  * `utils/input_output/s3.py:74-109`) as commit metadata.
  */
final case class FileEntry(
    path: String,      // relative to table root
    bucket: Int,
    rows: Long,
    epochAdded: Long,
    /** Min/max of the FIRST key column over this file set (string-keyed
      * tables only; None otherwise or for pre-bounds manifests). Spark's
      * min/max on StringType order by UTF8String binary comparison, and
      * readers prune with the same comparator — record-level pruning WITHIN
      * a bucket, so point lookups and merge-on-read resolution open only the
      * files whose key range can contain the probe. Bounds derived for
      * compaction rewrites (min-of-mins/max-of-maxs) are a superset of the
      * true range — safe to prune with, never to prove membership.
      */
    min0: Option[String] = None,
    max0: Option[String] = None,
    /** Leaf parquet data files of this entry's directory, with exact byte
      * sizes — recorded at commit time (ONE local listing of the
      * just-written dir, O(new files)) so reads plan from the manifest
      * alone: `ManifestFileIndex` hands Spark the exact (path, size) set and
      * no listing/stat round-trips happen per query — on an object store at
      * production scale, the per-query LIST calls are the metadata
      * bottleneck this removes (the Iceberg/Delta planning shape). Empty on
      * pre-r4 manifests → readers fall back to path listing.
      */
    leaves: Seq[LeafFile] = Seq.empty,
)

/** One leaf parquet file: name relative to its FileEntry dir + exact size. */
final case class LeafFile(name: String, bytes: Long)

/** Per-bucket write statistics: exact row count + first-key-column bounds. */
final case class BucketStats(rows: Long, min0: Option[String], max0: Option[String])
final case class Manifest(
    epoch: Long,
    parentEpoch: Long, // -1 for first
    schemaId: Int,
    schemaJson: String,
    keyColumns: Seq[String],
    numBuckets: Int,
    files: Seq[FileEntry],   // the COMPLETE live set (snapshot-style)
    metadata: Map[String, String],
    lineage: Map[String, Long], // e.g. minOffset/maxOffset/upsertRows/totalRows
    /** What produced this epoch: "write" (merge/mergeDelta/appendNew),
      * "compact", or "rebucket". Epoch ids are one shared number space per
      * table, so the skip-if-present guards use this to turn an id
      * COLLISION (an ingest epoch reusing a maintenance id, or vice versa)
      * into a loud error instead of a silent lost write. Absent in
      * pre-field manifests → renormalized to "write".
      */
    kind: String = "write",
)

/** A key-bucketed, copy-on-write, MERGE-upsert lake table over plain Parquet
  * + JSON manifests.
  *
  * Scale design (the part that must survive 100 TB / 1000 executors):
  *  - data is hash-bucketed on the merge key into `numBuckets` buckets
  *    (thousands on a real cluster); a MERGE only reads and rewrites the
  *    buckets its upsert batch touches — commit cost is O(touched data),
  *    not O(table);
  *  - the single merge shuffle is `repartition(numBuckets, bucketCol)`, and
  *    hot merge keys are pre-salted by the caller where state permits
  *    (SURVEY.md §4 skew row);
  *  - readers prune by bucket (and by manifest row counts) without listing
  *    the filesystem: the manifest is the only metadata round-trip;
  *  - schema evolution: each manifest carries a schemaId + schema JSON;
  *    upserts with new nullable columns bump the schemaId and old files are
  *    read through the merged schema (Parquet by-name resolution fills
  *    missing columns with null) — no rewrite of untouched buckets;
  *  - exactly-once: writing epoch N twice is a no-op (manifest N already
  *    present ⇒ skip), and a crash between data write and manifest rename
  *    leaves invisible orphans only.
  */
final class LakeTable(
    val root: String,
    val numBuckets: Int,
    val keyColumns: Seq[String],
    /** Columns the bucket hash uses — a prefix of (or equal to) the merge
      * identity; e.g. the sessions-state table merges on (repo, commit) but
      * buckets on repo so an epoch apply prunes to the touched repos' buckets.
      */
    val bucketColumns: Seq[String] = Seq.empty,
    /** Merge-on-read: `mergeDelta` commits write ONLY the upsert rows (a
      * per-epoch delta file per touched bucket) instead of copy-on-writing
      * the whole bucket; `snapshot` resolves last-writer-wins per key by the
      * per-row `__epoch` stamp, restricted to buckets that actually hold
      * more than one live file. Kills the COW write amplification: commit
      * cost is O(upserts), read cost is bounded by `compactThreshold`
      * (over-threshold buckets are compacted back to one file inside the
      * committing job). COW `merge` commits may interleave freely — they
      * physically resolve the buckets they rewrite.
      */
    val mergeOnRead: Boolean = false,
    /** Max live files per bucket before a commit compacts that bucket. The
      * EFFECTIVE threshold is jittered per bucket (threshold + bucket mod
      * threshold, i.e. in [threshold, 2·threshold)): without jitter every
      * bucket crosses the line in the SAME epoch and that commit pays a
      * full-table rewrite spike; jitter spreads compactions across epochs
      * deterministically (replay-stable).
      */
    val compactThreshold: Int = 8,
    /** Change-stream retention horizon, in epochs: compaction (inline or via
      * `compact()`) leaves files added within the last `changeRetention`
      * epochs untouched, so a `changesSince` consumer lagging by at most this
      * many epochs still sees every intermediate row version. Older versions
      * are resolved away by compaction (the change stream truncates to the
      * latest surviving version per key beyond the horizon) — the standard
      * lake-format trade; 0 = compact everything eligible.
      */
    val changeRetention: Int = 0,
) {
  private val bucketCols: Seq[String] = if (bucketColumns.nonEmpty) bucketColumns else keyColumns
  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  private def manifestDir: Path = Paths.get(root, "manifests")
  private def manifestPath(epoch: Long): Path = manifestDir.resolve(f"m$epoch%012d.json")

  /** Directory listing that CLOSES the stream (Files.list leaks an fd per
    * call otherwise — one engine commits two tables per micro-batch, so a
    * long-running streaming ingest would exhaust the limit).
    */
  private def listNames(dir: Path): Seq[String] = {
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString).toVector
    finally s.close()
  }

  private def committedEpochs(): Seq[Long] =
    if (!Files.isDirectory(manifestDir)) Seq.empty
    else listNames(manifestDir)
      .collect { case s if s.startsWith("m") && s.endsWith(".json") =>
        s.stripPrefix("m").stripSuffix(".json").toLong }

  def latestManifest(): Option[Manifest] = {
    val epochs = committedEpochs()
    if (epochs.isEmpty) None else manifestAt(epochs.max)
  }

  def manifestAt(epoch: Long): Option[Manifest] = {
    val p = manifestPath(epoch)
    if (!Files.exists(p)) None
    else {
      val m = mapper.readValue(Files.readAllBytes(p), classOf[Manifest])
      // Jackson erases Map[String, Long] values to Integer for small
      // numbers; renormalize so callers can unbox lineage counters. Pre-
      // bounds manifests (and absent Option fields generally) deserialize
      // to null, not None — renormalize those too.
      Some(m.copy(
        lineage = m.lineage.asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> v.asInstanceOf[Number].longValue },
        files = m.files.map(f => f.copy(
          min0 = if (f.min0 == null) None else f.min0,
          max0 = if (f.max0 == null) None else f.max0,
          leaves = if (f.leaves == null) Seq.empty else f.leaves)),
        kind = if (m.kind == null) "write" else m.kind))
    }
  }

  /** Did the table's FIRST commit already carry `field`? A column added by
    * later schema evolution reads as null from older files, so a caller
    * that needs the column PHYSICALLY present in every live file (e.g. the
    * engine's parsed-state fast path, which prunes the fallback column
    * away) must check the birth schema, not the current one.
    */
  def bornWith(field: String): Boolean = {
    val es = committedEpochs()
    es.nonEmpty && manifestAt(es.min).exists(m =>
      DataType.fromJson(m.schemaJson).asInstanceOf[StructType]
        .fieldNames.contains(field))
  }

  /** Time travel: newest manifest with epoch ≤ asOf. */
  def manifestAsOf(asOf: Long): Option[Manifest] = {
    val epochs = committedEpochs().filter(_ <= asOf)
    if (epochs.isEmpty) None else manifestAt(epochs.max)
  }

  /** Skip-if-present resolution: the already-committed manifest at `epoch`,
    * REQUIRED to be of the kind this caller would have written. Epoch ids
    * are one number space per table; a mismatch means an ingest id collided
    * with a maintenance id (or vice versa) — silently "skipping" would lose
    * the caller's write, so it throws instead.
    */
  private def committedAs(epoch: Long, expected: String): Manifest = {
    val m = manifestAt(epoch).get
    if (m.kind != expected)
      throw new IllegalStateException(
        s"epoch $epoch of $root is already a '${m.kind}' commit, not '$expected' — " +
          "ingest and maintenance epoch ids must be disjoint")
    m
  }

  /** The LIVE bucket count — manifests record it per epoch, so `rebucket`
    * can grow it as the table grows (bucket granularity must scale with
    * data for touched-fraction pruning to keep working).
    */
  def currentNumBuckets: Int = latestManifest().map(_.numBuckets).getOrElse(numBuckets)

  def bucketCol: Column =
    pmod(xxhash64(bucketCols.map(col): _*), lit(currentNumBuckets)).cast("int")

  private def bucketColFor(n: Int): Column =
    pmod(xxhash64(bucketCols.map(col): _*), lit(n)).cast("int")

  /** Salt for the merge shuffle: spreads one bucket's rows over several
    * tasks when a mega-key makes a bucket hot (north-star skew handling).
    * Hashes the FULL key so salted sub-partitions stay deterministic.
    */
  val saltFactor: Int = 4
  private def saltCol: Column = saltColFor(saltFactor)
  private def saltColFor(s: Int): Column =
    if (s <= 1) lit(0)
    else pmod(xxhash64((keyColumns.map(col) :+ lit("salt")): _*), lit(s)).cast("int")

  /** Salt rows-per-task threshold: a bucket smaller than this fits one
    * write task comfortably, so salting it only multiplies the file count
    * and the per-file fixed costs (open/footer/compressor init) — the term
    * that dominates small incremental epochs and erodes N→4N scaling.
    */
  private val saltRowsPerTask = 131072L

  /** Adaptive salt: full `saltFactor` only when the caller's per-bucket
    * stats show a bucket big enough to need spreading (or when no stats are
    * known — compaction/bulk paths keep the conservative default).
    */
  private def effectiveSalt(maxBucketRows: Option[Long]): Int =
    maxBucketRows match {
      case Some(rows) =>
        math.max(1L, math.min(saltFactor.toLong,
          (rows + saltRowsPerTask - 1) / saltRowsPerTask)).toInt
      case None => saltFactor
    }

  /** File-level key-bounds check with Spark's own string comparator
    * (UTF8String binary order — what min/max on StringType produced):
    * can this file contain first-key-column value `v`? Missing bounds ⇒ yes.
    */
  private def mayContain(f: FileEntry, v: String): Boolean = {
    val probe = org.apache.spark.unsafe.types.UTF8String.fromString(v)
    f.min0.forall(mn =>
      org.apache.spark.unsafe.types.UTF8String.fromString(mn).compareTo(probe) <= 0) &&
      f.max0.forall(mx =>
        org.apache.spark.unsafe.types.UTF8String.fromString(mx).compareTo(probe) >= 0)
  }

  /** Current snapshot as a DataFrame (bucket-pruned when `buckets` given).
    * Merge-on-read tables resolve last-writer-wins per key, but ONLY over
    * buckets holding >1 live file — freshly-compacted / single-commit
    * buckets read straight through with no window shuffle. `key0` prunes by
    * the per-file first-key-column bounds on top of bucket pruning (point
    * reads open only the files whose range can hold the key).
    *
    * key0 CONTRACT: the result is only correct for rows whose first key
    * column EQUALS key0 — every file that can hold a version of key0
    * survives pruning, but OTHER keys may resolve stale (their winning
    * version can live in a pruned file). Callers must filter to key0
    * downstream, as `lookup` does.
    */
  def snapshot(spark: SparkSession, asOf: Long = Long.MaxValue,
               buckets: Option[Set[Int]] = None,
               key0: Option[String] = None): DataFrame = {
    manifestAsOf(asOf) match {
      case None => spark.emptyDataFrame
      case Some(m) =>
        val schema = DataType.fromJson(m.schemaJson).asInstanceOf[StructType]
        val bucketLive = buckets.fold(m.files)(bs => m.files.filter(f => bs.contains(f.bucket)))
        val live = key0.fold(bucketLive)(v => bucketLive.filter(f => mayContain(f, v)))
        if (live.isEmpty) spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else if (!mergeOnRead) readEntries(spark, live, schema)
        else {
          val withEpoch = schema.add(StructField("__epoch", LongType, nullable = true))
          def read(fs: Seq[FileEntry]): DataFrame = readEntries(spark, fs, withEpoch)
          val byBucket = live.groupBy(_.bucket).values.toSeq
          val single = byBucket.filter(_.size == 1).flatten
          val multi = byBucket.filter(_.size > 1).flatten
          val parts = Seq(
            if (single.isEmpty) None else Some(read(single)),
            if (multi.isEmpty) None
            else Some(resolveLatest(read(multi))),
          ).flatten
          parts.reduce(_.unionByName(_)).drop("__epoch")
        }
    }
  }

  /** Per-bucket compaction threshold in [compactThreshold, 2·compactThreshold). */
  private def effectiveThreshold(bucket: Int): Int =
    compactThreshold + (bucket % compactThreshold)

  /** ONE aggregation job: per-bucket row counts + first-key-column bounds
    * (bounds only for string-keyed tables — same job either way).
    */
  private def bucketStatsOf(df: DataFrame): Map[Int, BucketStats] = {
    val k0 = keyColumns.head
    val stringKey = df.schema.fields
      .find(_.name == k0).exists(_.dataType == org.apache.spark.sql.types.StringType)
    if (stringKey)
      df.groupBy("__bucket")
        .agg(count(lit(1)).as("n"), min(k0).as("mn"), max(k0).as("mx"))
        .collect()
        .map(r => r.getInt(0) -> BucketStats(r.getLong(1), Option(r.getString(2)),
          Option(r.getString(3)))).toMap
    else
      df.groupBy("__bucket").agg(count(lit(1)).as("n")).collect()
        .map(r => r.getInt(0) -> BucketStats(r.getLong(1), None, None)).toMap
  }

  /** Leaf parquet files of a just-written bucket dir: the one local listing
    * per commit that lets every subsequent READ skip listing entirely
    * (see FileEntry.leaves).
    */
  private def leavesOf(pathRel: String): Seq[LeafFile] = {
    val dir = Paths.get(root, pathRel)
    if (!Files.isDirectory(dir)) Seq.empty
    else listNames(dir).filter(_.endsWith(".parquet")).sorted
      .map(n => LeafFile(n, Files.size(dir.resolve(n))))
  }

  private def entriesFor(dirRel: String, epoch: Long,
                         stats: Map[Int, BucketStats]): Seq[FileEntry] =
    stats.toSeq.sortBy(_._1).map { case (b, s) =>
      val p = s"$dirRel/__bucket=$b"
      FileEntry(p, b, s.rows, epoch, s.min0, s.max0, leavesOf(p))
    }

  /** Parquet read of a manifest file-entry set: manifest-planned (zero
    * listing — `ManifestFileIndex` over exact (path, size) pairs) when every
    * entry carries its leaf files; legacy path-listing read for pre-r4
    * manifests.
    */
  private def readEntries(spark: SparkSession, fs: Seq[FileEntry],
                          schema: StructType): DataFrame =
    if (fs.nonEmpty && fs.forall(_.leaves.nonEmpty))
      org.apache.spark.sql.graftbridge.ManifestRead.parquet(spark,
        fs.flatMap(f => f.leaves.map(l => (s"$root/${f.path}/${l.name}", l.bytes))),
        schema)
    else spark.read.schema(schema).parquet(fs.map(f => s"$root/${f.path}"): _*)

  /** Rewrite each over-threshold bucket's COMPACTABLE files (older than the
    * `changeRetention` horizon) into one file set. `resolve` = drop
    * superseded key versions (merge-on-read tables); append-only tables
    * concatenate. Row counts for the concat path come from the manifest (no
    * job); the resolve path recounts. Bounds are derived min-of-mins /
    * max-of-maxs — a superset of the true range after resolution, which is
    * safe for pruning. Returns the updated live-file list, or `files`
    * unchanged when nothing crosses its threshold.
    */
  private def compactOverfull(spark: SparkSession, files: Seq[FileEntry],
                              schema: StructType, epoch: Long,
                              resolve: Boolean): Seq[FileEntry] = {
    val horizon = epoch - changeRetention
    val overfull = files.groupBy(_.bucket).filter { case (b, fs) =>
      fs.count(_.epochAdded <= horizon) > effectiveThreshold(b)
    }.keySet
    if (overfull.isEmpty) return files
    val cInput = files.filter(f => overfull.contains(f.bucket) && f.epochAdded <= horizon)
    val cDirRel = f"data/e$epoch%012dc"
    val withEpochSchema = schema.add(StructField("__epoch", LongType, nullable = true))
    val raw = readEntries(spark, cInput, withEpochSchema)
    val rewritten = (if (resolve) resolveLatest(raw) else raw)
      .withColumn("__bucket", bucketCol)
    rewritten
      .repartition(math.max(1, math.min(currentNumBuckets, overfull.size)) * saltFactor,
        col("__bucket"), saltCol)
      .sortWithinPartitions((col("__bucket") +: keyColumns.map(col)): _*)
      .write.mode(SaveMode.Overwrite).option("compression", LakeTable.compression).partitionBy("__bucket")
      .parquet(s"$root/$cDirRel")
    val inByBucket = cInput.groupBy(_.bucket)
    val rowsByBucket: Map[Int, Long] =
      if (resolve) spark.read.parquet(s"$root/$cDirRel")
        .groupBy("__bucket").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      else inByBucket.map { case (b, fs) => b -> fs.map(_.rows).sum }
    // Derived bounds must use the SAME comparator that wrote them and that
    // mayContain prunes with — UTF8String byte order. Scala's String
    // ordering (UTF-16 code units) disagrees for supplementary characters
    // (a 4-byte UTF-8 sequence sorts above U+E000..U+FFFF in byte order but
    // below in UTF-16), so min/max under the wrong order can UNDER-cover
    // the true range and pruning would silently drop live rows.
    val utf8Order: Ordering[String] = (a: String, b: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
    val cEntries = rowsByBucket.toSeq.sortBy(_._1).map { case (b, rows) =>
      val ins = inByBucket(b)
      // derived bounds: only when every input carries bounds
      val mn = if (ins.forall(_.min0.isDefined)) Some(ins.flatMap(_.min0).min(utf8Order)) else None
      val mx = if (ins.forall(_.max0.isDefined)) Some(ins.flatMap(_.max0).max(utf8Order)) else None
      val p = s"$cDirRel/__bucket=$b"
      FileEntry(p, b, rows, epoch, mn, mx, leavesOf(p))
    }
    (files.filterNot(cInput.contains) ++ cEntries).sortBy(_.bucket)
  }

  /** Standalone maintenance compaction, committed as its OWN epoch — run it
    * BETWEEN ingest commits so those never pay the compaction rewrite
    * inline and epoch latency stays flat. No-op (returns the parent
    * manifest WITHOUT committing) when no bucket is over threshold.
    * Exactly-once like every commit.
    *
    * SINGLE-WRITER contract (same as every commit on this table): do not
    * run compact() truly concurrently with another commit — two committers
    * of DIFFERENT epochs would both extend the chain from the same parent,
    * and whichever lands second re-lists the first's superseded files.
    * "Off the ingest path" means interleaved between applies (or in the
    * scheduler slot applies otherwise idle in), not parallel with one.
    */
  def compact(spark: SparkSession, epoch: Long): Manifest = {
    if (Files.exists(manifestPath(epoch)))
      return committedAs(epoch, "compact")
    val parent = latestManifest().getOrElse(
      throw new IllegalStateException("compact requires an existing table"))
    require(parent.epoch < epoch, s"epoch $epoch not after ${parent.epoch}")
    val schema = DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]
    val files = compactOverfull(spark, parent.files, schema, epoch, resolve = mergeOnRead)
    if (files eq parent.files) return parent
    val manifest = Manifest(
      epoch = epoch,
      parentEpoch = parent.epoch,
      schemaId = parent.schemaId,
      schemaJson = parent.schemaJson,
      keyColumns = keyColumns,
      kind = "compact",
      numBuckets = parent.numBuckets,
      files = files,
      metadata = parent.metadata,
      lineage = Map("totalRows" -> files.map(_.rows).sum, "compaction" -> 1L),
    )
    writeManifestAtomically(manifest)
    manifest
  }

  /** Last-writer-wins per key: one row per key per epoch is guaranteed by
    * the one-commit-per-epoch manifest protocol, so (key, __epoch desc) has
    * no ties and the resolution is deterministic.
    */
  private def resolveLatest(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keyColumns.map(col): _*)
      .orderBy(col("__epoch").desc_nulls_last)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MERGE upsert: rows of `upserts` replace existing rows with the same
    * key. REQUIRES one row per key in `upserts` (the classify fold emits
    * exactly that) — which lets the merge be an anti-join (existing keys not
    * replaced) + union instead of a window row_number, saving a sort and a
    * shuffle per commit. Copy-on-write per touched bucket. Idempotent per
    * epoch.
    */
  def merge(upserts: DataFrame, epoch: Long,
            metadata: Map[String, String] = Map.empty,
            lineage: Map[String, Long] = Map.empty,
            /** Buckets the batch touches, when the caller already knows
              * (saves one collect job per merge).
              */
            touchedBuckets: Option[Set[Int]] = None): Manifest = {
    if (Files.exists(manifestPath(epoch)))
      return committedAs(epoch, "write") // exactly-once: epoch already committed

    val spark = upserts.sparkSession
    val parent = latestManifest()
    require(parent.forall(_.epoch < epoch), s"epoch $epoch not after ${parent.map(_.epoch)}")

    val (mergedSchema, schemaId) = evolveSchema(parent, upserts.schema)
    def conform(df: DataFrame): DataFrame = conformTo(mergedSchema)(df)

    val withBucket = conform(upserts).withColumn("__bucket", bucketCol)
    // buckets touched by this batch — tiny collect (≤ numBuckets ints)
    val touched = touchedBuckets.getOrElse(
      withBucket.select("__bucket").distinct()
        .collect().map(_.getInt(0)).toSet)

    val oldLive = parent.map(_.files).getOrElse(Seq.empty)
    val (rewritten, carried) = oldLive.partition(f => touched.contains(f.bucket))

    val epochDirRel = f"data/e$epoch%012d"
    val result: Map[Int, BucketStats] = if (touched.nonEmpty) {
      val existingKept =
        if (rewritten.isEmpty) None
        else {
          val parentSchema =
            DataType.fromJson(parent.get.schemaJson).asInstanceOf[StructType]
          // merge-on-read buckets may hold several VERSIONS per key — they
          // must be resolved before carrying, or the rewrite would persist
          // every version under one epoch stamp and snapshots would pick a
          // winner arbitrarily. Carried rows KEEP their original epoch so
          // changesSince never re-reports an unchanged row after a rewrite.
          val withEpochSchema =
            parentSchema.add(StructField("__epoch", LongType, nullable = true))
          val raw = readEntries(spark, rewritten, withEpochSchema)
          val existing = if (mergeOnRead) resolveLatest(raw) else raw
          Some(existing
            .select((mergedSchema.fields.toIndexedSeq.map(f =>
              if (existing.columns.contains(f.name)) col(f.name)
              else lit(null).cast(f.dataType).as(f.name)) :+ col("__epoch")): _*)
            .withColumn("__bucket", bucketCol)
            // existing rows whose key is replaced by this batch drop out
            .join(withBucket.select(keyColumns.map(col): _*), keyColumns, "left_anti"))
        }
      // upserts carry THIS epoch's stamp (legacy pre-stamp files read null
      // and keep null — they predate incremental reads anyway)
      val stamped = withBucket.withColumn("__epoch", lit(epoch))
      val mergedRows = existingKept.fold(stamped)(_.unionByName(stamped))
        // merge shuffle is SALTED: a hot bucket (mega-key skew) spreads over
        // `saltFactor` tasks, each writing its own file into the bucket dir
        .repartition(math.min(parent.map(_.numBuckets).getOrElse(numBuckets), touched.size) * saltFactor,
          col("__bucket"), saltCol)
        .sortWithinPartitions((col("__bucket") +: keyColumns.map(col)): _*)
      mergedRows.write.mode(SaveMode.Overwrite)
        .option("compression", LakeTable.compression)
        .partitionBy("__bucket")
        .parquet(s"$root/$epochDirRel")
      // per-bucket stats for the manifest: recomputed from the SAME
      // deterministic plan (callers cache the expensive upstream), which is
      // cheaper than re-reading the just-written files
      bucketStatsOf(mergedRows)
    } else Map.empty

    val newFiles = entriesFor(epochDirRel, epoch, result)
    val files = (carried ++ newFiles).sortBy(_.bucket)
    val manifest = Manifest(
      epoch = epoch,
      parentEpoch = parent.map(_.epoch).getOrElse(-1L),
      schemaId = schemaId,
      schemaJson = mergedSchema.json,
      keyColumns = keyColumns,
      numBuckets = parent.map(_.numBuckets).getOrElse(numBuckets),
      files = files,
      metadata = metadata,
      lineage = lineage ++ Map("totalRows" -> files.map(_.rows).sum),
    )
    writeManifestAtomically(manifest)
    manifest
  }

  /** Schema evolution: merged = parent schema ∪ upsert schema (by name);
    * new columns land nullable, schemaId bumps iff the schema changed. A
    * name shared with the table must keep the table's type: an upsert
    * column that merely UP-CASTS (int→long, float→double, non-null→null)
    * is accepted and cast by `conformTo`; anything else throws HERE — the
    * old behavior selected the mismatched column as-is, writing parquet
    * whose physical type contradicted the manifest schema, and the
    * corruption only surfaced at some later read far from its cause.
    */
  private def evolveSchema(parent: Option[Manifest],
                           upsertSchema: StructType): (StructType, Int) = {
    val mergedSchema = parent match {
      case None => upsertSchema
      case Some(p) =>
        val old = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
        val widened = old.fields.map { f =>
          upsertSchema.fields.find(_.name == f.name) match {
            case Some(u)
                // same structural type, different nullability flags: Spark's
                // file sources force READ-BACK schemas fully nullable
                // (asNullable in planning), so a read-rewrite upsert (dim
                // re-enrichment, future row-level maintenance) legitimately
                // claims more nullability than storage. Widening the stored
                // type is safe — every existing file reads correctly under
                // the more-nullable schema — while narrowing never happens.
                if u.dataType != f.dataType &&
                  org.apache.spark.sql.graftbridge.GraftBridge
                    .sameTypeIgnoreNullability(u.dataType, f.dataType) =>
              f.copy(dataType = org.apache.spark.sql.graftbridge.GraftBridge
                .asNullable(f.dataType))
            case Some(u) =>
              require(u.dataType == f.dataType ||
                  org.apache.spark.sql.catalyst.expressions.Cast
                    .canUpCast(u.dataType, f.dataType),
                s"column '${f.name}': upsert type ${u.dataType.simpleString} cannot " +
                  s"evolve table type ${f.dataType.simpleString} — stored column " +
                  "types are fixed; only upcast-compatible upserts are accepted")
              f
            case None => f
          }
        }
        val extra = upsertSchema.fields.filter(f => !old.fieldNames.contains(f.name))
        StructType(widened ++ extra.map(f => StructField(f.name, f.dataType, nullable = true)))
    }
    val schemaId = parent match {
      case Some(p) if p.schemaJson == mergedSchema.json => p.schemaId
      case Some(p)                                      => p.schemaId + 1
      case None                                         => 1
    }
    (mergedSchema, schemaId)
  }

  private def conformTo(schema: StructType)(df: DataFrame): DataFrame =
    df.select(schema.fields.toIndexedSeq.map { f =>
      if (!df.columns.contains(f.name)) lit(null).cast(f.dataType).as(f.name)
      else if (df.schema(f.name).dataType == f.dataType) col(f.name)
      // evolveSchema guaranteed this is an upcast — align the physical type
      // with the manifest schema before writing
      else col(f.name).cast(f.dataType).as(f.name)
    }: _*)

  /** Merge-on-read upsert: writes ONLY the upsert rows as a per-epoch delta
    * (one file set per touched bucket); existing rows with the same key stay
    * in older files and lose at read time to the higher `__epoch` stamp
    * (resolveLatest). Write amplification is O(upserts) — the property the
    * copy-on-write merge() can't give when hot buckets are touched every
    * epoch — at the cost of a read-side resolution that stays bounded:
    * any bucket exceeding `compactThreshold` live files is compacted back
    * to a single file set inside the committing job. Schema-evolution,
    * exactly-once and crash-atomicity rules are identical to merge().
    *
    * REQUIRES one row per key per commit (same contract as merge; the
    * classify fold emits exactly that): two versions of a key in ONE batch
    * share an `__epoch` stamp, and `resolveLatest` would break the tie by
    * partition read order — nondeterministic across replays.
    */
  def mergeDelta(upserts: DataFrame, epoch: Long,
                 metadata: Map[String, String] = Map.empty,
                 lineage: Map[String, Long] = Map.empty,
                 touchedBuckets: Option[Set[Int]] = None,
                 /** Per-bucket stats of `upserts` when the caller already
                   * computed them (must be exact — they become the manifest
                   * counts/bounds); saves one aggregation job per commit.
                   */
                 precomputedStats: Option[Map[Int, BucketStats]] = None,
                 /** false ⇒ skip inline compaction; the caller runs
                   * `compact()` as its own maintenance epochs so ingest
                   * commit latency stays flat.
                   */
                 compactInline: Boolean = true,
                 /** true ⇒ the caller guarantees `upserts`' PHYSICAL
                   * partitioning already co-locates each bucket's rows
                   * (the engine's fold shuffle keys on this table's
                   * bucketCol, and every projection in between is narrow)
                   * — the commit then writes with NO repartition of its
                   * own: zero additional shuffle, ~one file per touched
                   * bucket. Correctness does not depend on the contract
                   * (the manifest lists whatever files land under each
                   * bucket dir); a broken contract only multiplies files.
                   */
                 alignedInput: Boolean = false,
                 /** Manifest kind of this commit. Non-"write" callers (e.g.
                   * the engine's dim-update re-enrichment) stamp their own
                   * kind so an ingest epoch colliding with their id fails
                   * loudly instead of silently skipping (see committedAs).
                   */
                 kind: String = "write"): Manifest = {
    if (Files.exists(manifestPath(epoch)))
      return committedAs(epoch, kind)

    val spark = upserts.sparkSession
    val parent = latestManifest()
    require(parent.forall(_.epoch < epoch), s"epoch $epoch not after ${parent.map(_.epoch)}")

    val (mergedSchema, schemaId) = evolveSchema(parent, upserts.schema)
    val withBucket = conformTo(mergedSchema)(upserts)
      .withColumn("__bucket", bucketCol)
      .withColumn("__epoch", lit(epoch))
    val touched = touchedBuckets.getOrElse(
      withBucket.select("__bucket").distinct().collect().map(_.getInt(0)).toSet)

    val epochDirRel = f"data/e$epoch%012d"
    val stats: Map[Int, BucketStats] =
      if (touched.isEmpty) Map.empty
      else {
        val writeReady =
          if (alignedInput) withBucket // consume the fold's partitioning as-is
          else {
            val salt = effectiveSalt(precomputedStats.filter(_.nonEmpty)
              .map(_.values.map(_.rows).max))
            withBucket.repartition(
              math.max(1, math.min(parent.map(_.numBuckets).getOrElse(numBuckets), touched.size)) * salt,
              col("__bucket"), saltColFor(salt))
          }
        writeReady
          .sortWithinPartitions((col("__bucket") +: keyColumns.map(col)): _*)
          .write.mode(SaveMode.Overwrite).option("compression", LakeTable.compression).partitionBy("__bucket")
          .parquet(s"$root/$epochDirRel")
        // stats recomputed from the same deterministic plan (no read-back);
        // a bucket with zero rows leaves no dir and gets no entry
        precomputedStats.getOrElse(bucketStatsOf(withBucket))
      }
    var files = (parent.map(_.files).getOrElse(Seq.empty) ++
      entriesFor(epochDirRel, epoch, stats)).sortBy(_.bucket)

    // compact over-threshold buckets: read their compactable live files,
    // resolve the per-key winners, rewrite as one file set (per-row __epoch
    // preserved) — unless the caller runs compact() out of band
    if (compactInline)
      files = compactOverfull(spark, files, mergedSchema, epoch, resolve = true)

    val manifest = Manifest(
      epoch = epoch,
      parentEpoch = parent.map(_.epoch).getOrElse(-1L),
      schemaId = schemaId,
      schemaJson = mergedSchema.json,
      keyColumns = keyColumns,
      numBuckets = parent.map(_.numBuckets).getOrElse(numBuckets),
      files = files,
      metadata = metadata,
      // totalRows is PHYSICAL rows for a merge-on-read table (superseded
      // versions included until compaction)
      lineage = lineage ++ Map("totalRows" -> files.map(_.rows).sum),
      kind = kind,
    )
    writeManifestAtomically(manifest)
    manifest
  }

  /** Append-only commit for insert-ignore tables (e.g. the sessions-state
    * event buffer): rows whose key already exists are dropped via a
    * bucket-pruned LEFT ANTI join on the key columns only (column-pruned
    * read of prior files), and ONLY the new rows are written — untouched
    * files are carried, so write amplification is O(batch), never O(bucket).
    * Same exactly-once/atomicity rules as merge().
    */
  def appendNew(upserts: DataFrame, epoch: Long,
                metadata: Map[String, String] = Map.empty,
                lineage: Map[String, Long] = Map.empty,
                touchedBuckets: Option[Set[Int]] = None,
                /** true ⇒ caller guarantees no key already exists (e.g. the
                  * epoch fold only emits first-seen events) — skips the
                  * prior-keys anti-join read entirely.
                  */
                assumeNew: Boolean = false,
                /** Exact per-bucket stats of the rows that will be written
                  * (only valid with assumeNew — the anti-join may drop rows
                  * the caller can't see); saves one aggregation job.
                  */
                precomputedStats: Option[Map[Int, BucketStats]] = None,
                /** false ⇒ skip inline compaction (see mergeDelta). */
                compactInline: Boolean = true,
                /** Pre-bucket-partitioned input — see mergeDelta. Only
                  * meaningful with `assumeNew` (the anti-join path shuffles
                  * anyway, destroying the alignment).
                  */
                alignedInput: Boolean = false): Manifest = {
    if (Files.exists(manifestPath(epoch)))
      return committedAs(epoch, "write")

    val spark = upserts.sparkSession
    val parent = latestManifest()
    require(parent.forall(_.epoch < epoch), s"epoch $epoch not after ${parent.map(_.epoch)}")

    // schema evolution on the append path too (new change-event fields land
    // nullable; old files read through the merged schema with null fill) —
    // same rules as merge()/mergeDelta()
    val (mergedSchema, schemaId) = evolveSchema(parent, upserts.schema)
    val withBucket = conformTo(mergedSchema)(upserts).withColumn("__bucket", bucketCol)
      // row-level commit stamp: survives compaction, so changesSince stays
      // exact for append-only tables too
      .withColumn("__epoch", lit(epoch))
    val touched = touchedBuckets.getOrElse(
      withBucket.select("__bucket").distinct().collect().map(_.getInt(0)).toSet)

    val priorKeys = parent match {
      case _ if assumeNew => None
      case Some(p) =>
        val live = p.files.filter(f => touched.contains(f.bucket))
        if (live.isEmpty) None
        else Some(readEntries(spark, live,
            DataType.fromJson(p.schemaJson).asInstanceOf[StructType])
          .select(keyColumns.map(col): _*))
      case None => None
    }
    val fresh = priorKeys.fold(withBucket)(pk =>
      withBucket.join(pk, keyColumns, "left_anti"))

    val epochDirRel = f"data/e$epoch%012d"
    val stats: Map[Int, BucketStats] =
      if (touched.isEmpty) Map.empty
      else {
        val writeReady =
          if (alignedInput && assumeNew) fresh // fold partitioning as-is
          else {
            val salt = effectiveSalt(precomputedStats.filter(_ => assumeNew)
              .filter(_.nonEmpty).map(_.values.map(_.rows).max))
            fresh.repartition(
              math.max(1, math.min(parent.map(_.numBuckets).getOrElse(numBuckets), touched.size)) * salt,
              col("__bucket"), saltColFor(salt))
          }
        writeReady
          .sortWithinPartitions((col("__bucket") +: keyColumns.map(col)): _*)
          .write.mode(SaveMode.Overwrite).option("compression", LakeTable.compression).partitionBy("__bucket")
          .parquet(s"$root/$epochDirRel")
        // stats recomputed from the same deterministic plan (no read-back);
        // pure-redelivery batches count to nothing and add no entries
        precomputedStats.filter(_ => assumeNew).getOrElse(bucketStatsOf(fresh))
      }
    var files = (parent.map(_.files).getOrElse(Seq.empty) ++
      entriesFor(epochDirRel, epoch, stats)).sortBy(_.bucket)

    // append-only tables accumulate one file set per touching epoch per
    // bucket — after many epochs a bucket read would open thousands of
    // files. Compact over-threshold buckets by concatenation (rows are
    // unique by key already — no resolution needed), unless the caller
    // runs compact() out of band.
    if (compactInline)
      files = compactOverfull(spark, files, mergedSchema, epoch, resolve = false)

    val manifest = Manifest(
      epoch = epoch,
      parentEpoch = parent.map(_.epoch).getOrElse(-1L),
      schemaId = schemaId,
      schemaJson = mergedSchema.json,
      keyColumns = keyColumns,
      numBuckets = parent.map(_.numBuckets).getOrElse(numBuckets),
      files = files,
      metadata = metadata,
      lineage = lineage ++ Map("totalRows" -> files.map(_.rows).sum),
    )
    writeManifestAtomically(manifest)
    manifest
  }

  /** Point lookup — the O(one bucket) read primitive a CDC-maintained table
    * serves: the bucket id is computed DRIVER-SIDE by evaluating the same
    * Catalyst hash expression the writers use, so the read opens only that
    * bucket's files (manifest-pruned, no listing; within the bucket the
    * per-file key bounds prune further) and the key equality pushes into the
    * parquet scan, where the within-bucket key sort gives row-group min/max
    * pruning. Merge-on-read resolution applies as usual. `key` must bind
    * every bucket column (extra key columns just filter). The bucket id
    * targets the AS-OF manifest's bucket count, so time travel across a
    * rebucket resolves against the layout that was live then; each probe
    * value is cast to the table schema's column type before hashing (a
    * Scala Int probed at a LongType column would otherwise hash differently
    * and silently return empty).
    */
  def lookup(spark: SparkSession, key: Map[String, Any],
             asOf: Long = Long.MaxValue): DataFrame = {
    require(bucketCols.forall(key.contains),
      s"lookup must bind all bucket columns $bucketCols, got ${key.keySet}")
    manifestAsOf(asOf) match {
      case None => spark.emptyDataFrame
      case Some(m) =>
        val schema = DataType.fromJson(m.schemaJson).asInstanceOf[StructType]
        import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Pmod, XxHash64}
        val hash = XxHash64(bucketCols.map { c =>
          Cast(Literal(key(c)), schema(c).dataType)
        }, 42L) // functions.xxhash64 seed
        val bucket = Pmod(hash, Literal(m.numBuckets.toLong))
          .eval().asInstanceOf[Long].toInt
        val key0 = keyColumns.headOption
          .filter(k0 => key.contains(k0) &&
            schema(k0).dataType == org.apache.spark.sql.types.StringType)
          .map(k0 => key(k0).toString)
        key.foldLeft(snapshot(spark, asOf, buckets = Some(Set(bucket)), key0 = key0)) {
          case (df, (k, v)) => df.filter(col(k) === lit(v))
        }
    }
  }

  /** Incremental (CDC) read: every SURVIVING row version committed in
    * `(sinceEpoch, asOf]` — the change stream a downstream consumer tails
    * instead of re-reading snapshots. File pruning first (a file written at
    * epoch e only holds rows stamped ≤ e, so `epochAdded > since` is a
    * correct superset even across compaction rewrites), then the exact
    * row-level `__epoch` filter, which parquet min/max stats also prune.
    * Rows from files predating the per-row stamp (legacy) read as null and
    * are excluded. The result carries a `_commit_epoch` column.
    *
    * Compaction semantics: merge-on-read compaction resolves last-writer-
    * wins and physically DROPS superseded versions, so a consumer whose
    * `sinceEpoch` predates the last compaction sees only the latest
    * surviving version of each key, not every intermediate one (the
    * standard lake-format CDC trade). Set `changeRetention` > the maximum
    * consumer lag to keep intermediate versions readable. On a table with
    * no commits yet the change stream's schema is unknown — this returns a
    * zero-column empty DataFrame; gate on `latestManifest().isDefined`
    * before selecting columns.
    */
  def changesSince(spark: SparkSession, sinceEpoch: Long,
                   asOf: Long = Long.MaxValue): DataFrame = {
    manifestAsOf(asOf) match {
      case None => spark.emptyDataFrame
      case Some(m) =>
        val schema = DataType.fromJson(m.schemaJson).asInstanceOf[StructType]
        val withEpoch = schema.add(StructField("__epoch", LongType, nullable = true))
        val candidates = m.files.filter(_.epochAdded > sinceEpoch)
        if (candidates.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(schema.fields :+ StructField("_commit_epoch", LongType)))
        else readEntries(spark, candidates, withEpoch)
          .filter(col("__epoch") > sinceEpoch && col("__epoch") <= asOf)
          .withColumnRenamed("__epoch", "_commit_epoch")
    }
  }

  /** One `_lineage`-table row: a file set written by a commit, with the
    * commit's metadata and metric counters attached (north_star: "per-
    * partition lineage and offset/row-count metrics are emitted to a
    * _lineage table").
    */
  private[lake] case class LineageRow(
      epoch: Long, parentEpoch: Long, schemaId: Int, numBuckets: Int,
      bucket: Int, path: String, rows: Long,
      min0: Option[String], max0: Option[String],
      metadata: Map[String, String], lineage: Map[String, Long])

  /** The commit history as a queryable DataFrame — one row per file set
    * WRITTEN by each commit (per-partition grain), carrying that commit's
    * metadata map and lineage counters (offsets, row counts, observability
    * counters). Built driver-side from the JSON manifests: no data files
    * are opened.
    */
  def lineageTable(spark: SparkSession): DataFrame = {
    val rows = committedEpochs().sorted.flatMap(manifestAt).flatMap { m =>
      m.files.filter(_.epochAdded == m.epoch).map(f =>
        LineageRow(m.epoch, m.parentEpoch, m.schemaId, m.numBuckets,
          f.bucket, f.path, f.rows, f.min0, f.max0, m.metadata, m.lineage))
    }
    spark.createDataFrame(rows)
  }

  /** Bucket-count evolution — the maintenance operation for growing tables:
    * pruning works because a batch touches a small FRACTION of buckets, so
    * the bucket count must grow with the data (thousands at 100 TB, not the
    * handful a small table starts with). One full rewrite committed as a
    * normal epoch (exactly-once semantics apply); merge-on-read tables are
    * resolved during the rewrite, so the new layout starts compact. Later
    * commits and reads pick up the new count from the manifest
    * (`currentNumBuckets`). Point lookups hash with the AS-OF manifest's
    * bucket count, so time travel across a rebucket stays correct. NOTE:
    * the rewrite resolves merge-on-read tables regardless of
    * `changeRetention` — a `changesSince` consumer lagging past a rebucket
    * sees only surviving versions (schedule rebuckets behind the slowest
    * consumer, like any compaction).
    */
  def rebucket(spark: SparkSession, newNumBuckets: Int, epoch: Long): Manifest = {
    if (Files.exists(manifestPath(epoch)))
      return committedAs(epoch, "rebucket")
    val parent = latestManifest().getOrElse(
      throw new IllegalStateException("rebucket requires an existing table"))
    require(parent.epoch < epoch, s"epoch $epoch not after ${parent.epoch}")

    val schema = DataType.fromJson(parent.schemaJson).asInstanceOf[StructType]
    // ALWAYS carry the per-row commit stamp through the rewrite — dropping
    // it would break changesSince for append-only tables after a rebucket
    val withEpochSchema =
      schema.add(StructField("__epoch", LongType, nullable = true))
    val all = readEntries(spark, parent.files, withEpochSchema)
    val resolved = if (mergeOnRead) resolveLatest(all) else all
    val rewritten = resolved.withColumn("__bucket", bucketColFor(newNumBuckets))

    val dirRel = f"data/e$epoch%012dr"
    rewritten
      .repartition(newNumBuckets, col("__bucket"), saltCol)
      .sortWithinPartitions((col("__bucket") +: keyColumns.map(col)): _*)
      .write.mode(SaveMode.Overwrite).option("compression", LakeTable.compression).partitionBy("__bucket")
      .parquet(s"$root/$dirRel")
    val files = entriesFor(dirRel, epoch, bucketStatsOf(rewritten))
    val manifest = Manifest(
      epoch = epoch,
      parentEpoch = parent.epoch,
      schemaId = parent.schemaId,
      schemaJson = parent.schemaJson,
      keyColumns = keyColumns,
      numBuckets = newNumBuckets,
      files = files,
      kind = "rebucket",
      metadata = parent.metadata + ("rebucketed-from" -> parent.numBuckets.toString),
      lineage = Map("totalRows" -> files.map(_.rows).sum),
    )
    writeManifestAtomically(manifest)
    manifest
  }

  /** Publish via hard-link, not rename: POSIX rename (ATOMIC_MOVE) silently
    * REPLACES an existing target, so a racing duplicate-epoch committer
    * would overwrite the first commit — link(2) is equally atomic but fails
    * with EEXIST, making first-commit-wins real. Stale `.tmp` files from
    * crashed commits are swept first, but ONLY when old enough that no live
    * committer can still own them — two live committers of DIFFERENT epochs
    * (e.g. a maintenance compaction racing an apply) must not delete each
    * other's in-flight tmp. Concurrent committers of the SAME epoch still
    * must not run concurrently (they share the epoch's data directory with
    * SaveMode.Overwrite — the hard-link guard protects the manifest, not
    * the files it points to).
    */
  private[lake] def writeManifestAtomically(m: Manifest): Unit = {
    Files.createDirectories(manifestDir)
    val sweepBefore = System.currentTimeMillis() - LakeTable.tmpSweepAgeMs
    listNames(manifestDir).filter(_.endsWith(".tmp")).foreach { stale =>
      val p = manifestDir.resolve(stale)
      val oldEnough =
        try Files.getLastModifiedTime(p).toMillis < sweepBefore
        catch { case _: java.nio.file.NoSuchFileException => false }
      if (stale != s".m${m.epoch}.json.tmp" && oldEnough)
        Files.deleteIfExists(p)
    }
    // optimistic-concurrency guard (the Iceberg commit-CAS analogue): this
    // commit's file list was built against `parentEpoch`; if ANOTHER epoch
    // landed in (parentEpoch, epoch) meanwhile, publishing ours would
    // silently resurrect files that commit compacted/rewrote away. Detect
    // and THROW instead — the caller re-reads the new head and retries.
    // Checked before AND after the link: the pre-check catches the
    // practical interleave, the post-check (with rollback of our own just-
    // published manifest) closes the list→link window.
    def conflicts(): Seq[Long] =
      committedEpochs().filter(e => e > m.parentEpoch && e < m.epoch).sorted
    val pre = conflicts()
    if (pre.nonEmpty)
      throw new java.util.ConcurrentModificationException(
        s"commit of epoch ${m.epoch} was built against parent ${m.parentEpoch} " +
          s"but epochs ${pre.mkString(",")} have since committed — single " +
          "writer per table; rebuild the commit against the new head")
    val tmp = manifestDir.resolve(s".m${m.epoch}.json.tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(m))
    try Files.createLink(manifestPath(m.epoch), tmp)
    catch {
      // a concurrent committer won the race for this epoch: exactly-once
      // keeps the first commit (ours is identical by determinism)
      case _: java.nio.file.FileAlreadyExistsException => ()
    } finally Files.deleteIfExists(tmp)
    val post = conflicts()
    if (post.nonEmpty) {
      Files.deleteIfExists(manifestPath(m.epoch))
      throw new java.util.ConcurrentModificationException(
        s"commit of epoch ${m.epoch} raced epochs ${post.mkString(",")} " +
          "past its parent — rolled back; rebuild against the new head")
    }
  }
}

object LakeTable {
  /** Stale-tmp sweep horizon: a crashed commit's tmp is reclaimed after this
    * age; any live commit finishes far sooner.
    */
  val tmpSweepAgeMs: Long = 15L * 60 * 1000

  /** Parquet codec for every lake write: zstd trades CPU (which scales with
    * cores/executors) for bytes on the shared write path (disk here, object
    * store on a cluster) — the right side of the trade for an ingest-bound
    * table format, and it measurably improves thread-scaling on a
    * single-disk box (BENCH/BASELINE.md §2).
    */
  val compression: String = "zstd"

  /** A snapshot read that hides the internal bucket column. */
  def readSnapshot(t: LakeTable, spark: SparkSession, asOf: Long = Long.MaxValue): DataFrame = {
    val df = t.snapshot(spark, asOf)
    if (df.columns.contains("__bucket")) df.drop("__bucket") else df
  }
}
