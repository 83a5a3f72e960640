package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension enrichment — the reference's organisation lookup as Spark joins.
  *
  * Reference semantics donors:
  *  - J2 broadcast practice lookup: 4 hand-built hash maps asid→ods/name,
  *    ods→sicbl (`organisation_lookup.py:14-45`), probed per transfer with
  *    null-pad on miss (`transfer_service.py:98-126`);
  *  - J3 monthly version selection with previous-month fallback:
  *    `(year, month) → lookup`, falling back to the prior month when a
  *    month's snapshot is missing (`organisation_metadata_monthly.py:26-34`,
  *    `transfer_classifier.py:171-193`).
  *
  * Spark shape: the dim is tiny next to the fact table → effective-as-of
  * resolution happens on the DIM side (a window over months per asid), then
  * one broadcast equi-join per practice role. The fact table is never
  * shuffled for enrichment.
  */
object Enrichment {

  /** The monthly organisation dimension row. */
  final case class OrgDimRow(
      asid: String,
      odsCode: String,
      name: String,
      sicblOdsCode: String,
      sicblName: String,
      yearMonth: Int, // yyyymm
  )

  /** Deterministic dim generator: `numAsids` practices over the given
    * months; ~1/7 of asids are missing from each month after the first
    * (asid-absent-from-a-present-month → null-pad fixture; callers that
    * DROP a whole month exercise the month-level fallback), ~1/11 missing
    * everywhere (null-pad-on-miss fixture).
    */
  def generateDim(spark: SparkSession, numAsids: Int, yearMonths: Seq[Int]): DataFrame = {
    import spark.implicits._
    dimRows(numAsids, yearMonths).toDF()
  }

  /** The dim fixture rows themselves, Spark-free — shared with the
    * independent model oracle (`graft.model`), which consumes the same
    * INPUT fixture but resolves it with its own lookup logic.
    */
  def dimRows(numAsids: Int, yearMonths: Seq[Int]): Seq[OrgDimRow] =
    for {
      i <- 0 until numAsids
      if i % 11 != 10 // never present → join miss
      (ym, mi) <- yearMonths.zipWithIndex
      if mi == 0 || (i + mi) % 7 != 0 // gap months → previous-month fallback
    } yield OrgDimRow(
      asid = s"asid-$i",
      odsCode = f"O$i%05d-$ym",
      name = s"Practice $i (as of $ym)",
      sicblOdsCode = f"S${i % 50}%03d",
      sicblName = s"SICBL ${i % 50}",
      yearMonth = ym,
    )

  /** Read the reference's monthly ODS metadata JSON files
    * (`organisationMetadata.json` — one whole-file object per month,
    * `ods_portal/organisation_metadata.py:22-47`) into the flat
    * `OrgDimRow` dim this engine enriches with. Faithful to the
    * reference's lookup construction (`organisation_lookup.py:14-30`):
    *  - one row per (asid, month), via each practice's `asids` list;
    *  - sicbl resolved through the practice-ods → sicbl mapping, null when
    *    no sicbl lists the practice (the lookup's `.get` → None);
    *  - duplicate asids / practice-ods across entries: LAST entry wins
    *    (dict-comprehension overwrite order), reproduced via posexplode +
    *    last-position row_number.
    */
  def readOdsJson(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("generated_on", StringType),
      StructField("year", IntegerType),
      StructField("month", IntegerType),
      StructField("practices", ArrayType(StructType(Seq(
        StructField("ods_code", StringType),
        StructField("name", StringType),
        StructField("asids", ArrayType(StringType)))))),
      StructField("sicbls", ArrayType(StructType(Seq(
        StructField("ods_code", StringType),
        StructField("name", StringType),
        StructField("practices", ArrayType(StringType)))))),
    ))
    val raw = spark.read.option("multiLine", true).schema(schema).json(paths: _*)
    val ym = (col("year") * 100 + col("month")).cast("int").as("yearMonth")
    val practices = raw
      .select(ym, posexplode(col("practices")).as(Seq("ppos", "p")))
      .select(col("yearMonth"), col("ppos"), col("p.ods_code").as("odsCode"),
        col("p.name").as("name"), explode(col("p.asids")).as("asid"))
    val pw = Window.partitionBy("yearMonth", "asid").orderBy(col("ppos").desc)
    val pLast = practices.withColumn("rn", row_number().over(pw))
      .filter(col("rn") === 1).drop("rn", "ppos")
    val sicbls = raw
      .select(ym, posexplode(col("sicbls")).as(Seq("spos", "s")))
      .select(col("yearMonth"), col("spos"), col("s.ods_code").as("sicblOdsCode"),
        col("s.name").as("sicblName"), explode(col("s.practices")).as("odsCode"))
    val sw = Window.partitionBy("yearMonth", "odsCode").orderBy(col("spos").desc)
    val sLast = sicbls.withColumn("rn", row_number().over(sw))
      .filter(col("rn") === 1).drop("rn", "spos")
    pLast.join(sLast, Seq("yearMonth", "odsCode"), "left_outer")
      .select("asid", "odsCode", "name", "sicblOdsCode", "sicblName", "yearMonth")
  }

  /** Load a dim from a front-door path spec: comma-separated monthly
    * `organisationMetadata.json` files (the reference's native format) when
    * every path ends in .json, else a parquet read. Shared by both job
    * front doors so the format rules can't diverge.
    */
  def loadDim(spark: SparkSession, pathSpec: String): DataFrame = {
    val paths = pathSpec.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    if (paths.nonEmpty && paths.forall(_.endsWith(".json"))) readOdsJson(spark, paths)
    // parquet is the unvalidated path — dedup once at entry (see dedupDim)
    else dedupDim(spark.read.parquet(paths: _*))
  }

  /** Expand the dim to one EFFECTIVE row per (asid, query month), with the
    * reference's WHOLE-MONTH fallback (`organisation_metadata_monthly.py:
    * 26-34`): a query month resolves to its own snapshot when ANY row of
    * that month exists, else to the previous month's snapshot as a whole;
    * an asid absent from the resolved month null-pads — it does NOT fall
    * back individually (the reference probes exactly one month's lookup,
    * `transfer_service.py:105-114`; its e2e vectors pin this: an asid
    * present in 2019-12 but dropped from 2020-01 enriches January
    * transfers as null). A month with neither snapshot yields no rows
    * (null-pad; the reference raises — `missingDimMonths` surfaces it).
    * Runs on the dim only (one tiny distinct-months job on a
    * broadcast-small input) — broadcastable output.
    */
  def effectiveAsOf(dim: DataFrame, queryMonths: Seq[Int],
                    presentMonthsHint: Option[Set[Int]] = None): DataFrame = {
    import dim.sparkSession.implicits._
    val months = queryMonths.distinct.sorted
    val present = presentMonthsHint.getOrElse(presentMonths(dim))
    def prev(ym: Int): Int = if (ym % 100 == 1) ym - 89 else ym - 1
    val mapping = months.flatMap { qm =>
      if (present(qm)) Some((qm, qm))
      else if (present(prev(qm))) Some((qm, prev(qm)))
      else None
    }
    val mapDf = mapping.toDF("__qm", "__src")
    // CONTRACT: `dim` is (asid, yearMonth)-unique — readOdsJson dedups
    // last-entry-wins, loadDim/the CDC engine run dedupDim on unvalidated
    // parquet/seed dims at ENTRY (once), and applyDimUpdate validates its
    // deltas — so this per-call primitive stays window-free on the
    // per-epoch hot path
    dim.join(broadcast(mapDf), col("yearMonth") === col("__src"))
      .drop("yearMonth", "__src")
      .withColumnRenamed("__qm", "yearMonth")
  }

  /** Deterministic within-month dedup for UNVALIDATED dims (caller-supplied
    * seed / parquet): duplicate (asid, yearMonth) rows would fan every
    * matching transfer out into duplicate enriched rows. Max-struct pick
    * over the value columns — stable, no tie nondeterminism. Run ONCE where
    * such a dim enters (loadDim, the engine seed), not per enrich call.
    */
  def dedupDim(dim: DataFrame): DataFrame = {
    val valueCols = dim.columns.filterNot(Set("asid", "yearMonth")).sorted
    val w = Window.partitionBy("asid", "yearMonth")
      .orderBy(struct(valueCols.map(col).toIndexedSeq: _*).desc)
    dim.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distinct dim months — the one tiny collect job `effectiveAsOf` /
    * `missingDimMonths` need; callers that already track presence (the CDC
    * engine) or call both (the batch front door) pass it as the hint
    * instead of paying it per call.
    */
  def presentMonths(dim: DataFrame): Set[Int] = {
    import dim.sparkSession.implicits._
    dim.select(col("yearMonth").cast("int")).distinct().as[Int].collect().toSet
  }

  /** Query months with NO dim snapshot in {month, previous month} — the case
    * where the reference raises OdsMetadataNotFound
    * (`organisation_metadata_monthly.py:26-34`). Callers decide the policy:
    * the job front door logs + counts, the engine lands a lineage counter.
    */
  def missingDimMonths(dim: DataFrame, queryMonths: Seq[Int],
                       presentMonthsHint: Option[Set[Int]] = None): Seq[Int] = {
    val present = presentMonthsHint.getOrElse(presentMonths(dim))
    def prev(ym: Int): Int = if (ym % 100 == 1) ym - 89 else ym - 1
    queryMonths.distinct.sorted.filterNot(ym => present(ym) || present(prev(ym)))
  }

  private def roleCols(prefix: String) = Seq(
    col("odsCode").as(s"${prefix}_practice_ods_code"),
    col("name").as(s"${prefix}_practice_name"),
    col("sicblOdsCode").as(s"${prefix}_practice_sicbl_ods_code"),
    col("sicblName").as(s"${prefix}_practice_sicbl_name"),
  )

  /** Enrich classified transfers with requesting/sending practice metadata,
    * as-of the transfer's request month, null-padded on miss. Two broadcast
    * joins; zero shuffles of the transfers side.
    */
  def enrich(transfers: DataFrame, dim: DataFrame,
             /** The distinct request months of `transfers`, when the caller
               * already knows them (the CDC engine's epoch summary computes
               * them in its one summary job) — saves a per-call distinct
               * collect job. Must COVER every request month present (a
               * superset is safe: extra months only add unmatched dim rows
               * to the broadcast; a missing month would null-pad its rows).
               */
             monthsHint: Option[Seq[Int]] = None,
             /** Distinct dim months, when the caller already knows them —
               * saves `effectiveAsOf`'s per-call presence job (see
               * `presentMonths`).
               */
             presentMonthsHint: Option[Set[Int]] = None): DataFrame = {
    val spark = transfers.sparkSession
    import spark.implicits._
    // With no months hint, the resolvable query months are derived from the
    // DIM alone (r7): a query month resolves iff it or its previous month
    // has a snapshot, so {m, next(m) | m ∈ present} COVERS every month any
    // transfer could resolve — unresolvable months contribute no eff rows
    // either way (null-pad), and extra months only add unmatched broadcast
    // rows. The former formulation collected distinct months FROM THE
    // TRANSFERS, which executed the caller's whole upstream plan once extra
    // per enrich call (measured: c02/c05 ran generate+classify twice).
    val present = presentMonthsHint.getOrElse(presentMonths(dim))
    val months = monthsHint.getOrElse {
      def next(ym: Int): Int = if (ym % 100 == 12) ym + 89 else ym + 1
      (present ++ present.map(next)).toSeq
    }
    // Schema-stable even for an empty/month-less input: callers union
    // enriched frames from different epochs (the CDC engine's pending
    // retro-correction rides a later epoch's commit), so a months-empty
    // frame must still CARRY the enrichment columns, null-padded — exactly
    // what the joins below would produce for it.
    if (months.isEmpty)
      return Seq("requesting", "sending").flatMap(p => Seq(
        s"${p}_practice_ods_code", s"${p}_practice_name",
        s"${p}_practice_sicbl_ods_code", s"${p}_practice_sicbl_name"))
        .foldLeft(transfers)((df, n) => df.withColumn(n, lit(null).cast("string")))
    val eff = effectiveAsOf(dim, months, Some(present))
    val reqDim = eff.select(
      (col("asid").as("__req_asid") +: col("yearMonth").as("__ym_r") +:
        roleCols("requesting")): _*)
    val sndDim = eff.select(
      (col("asid").as("__snd_asid") +: col("yearMonth").as("__ym_s") +:
        roleCols("sending")): _*)
    transfers
      .withColumn("__ym",
        (year(timestamp_micros(col("dateRequestedMicros"))) * 100 +
          month(timestamp_micros(col("dateRequestedMicros")))).cast("int"))
      .join(broadcast(reqDim),
        col("requestingPracticeAsid") === col("__req_asid") &&
          col("__ym") === col("__ym_r"), "left_outer")
      .join(broadcast(sndDim),
        col("sendingPracticeAsid") === col("__snd_asid") &&
          col("__ym") === col("__ym_s"), "left_outer")
      .drop("__req_asid", "__ym_r", "__snd_asid", "__ym_s", "__ym")
  }
}
