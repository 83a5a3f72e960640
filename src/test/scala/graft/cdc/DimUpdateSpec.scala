package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimension-refresh semantics (`CdcEngine.applyDimUpdate`): a dim-snapshot
  * delta must (1) re-enrich only the already-committed rows it can affect,
  * (2) govern every subsequent epoch's enrichment, (3) replay/idempote like
  * any other commit, (4) never collide silently with ingest epoch ids, and
  * (5) heal a strictDimMonths abort so the SAME ingest epoch id can retry.
  *
  * Reference behaviour donor: the reference reloads org metadata per run
  * (`transfer_classifier.py:171-193`), so an ODS refresh there retroactively
  * changes the next run's output for the whole window; the CDC-native
  * equivalent is an O(changed) retro-correction plus new-dim-for-new-epochs.
  *
  * Epoch-id convention exercised here: dim-update ids share each table's
  * monotonic number space, so they interleave with ingest ids (0,1 → update
  * 2 → 3,4), exactly like maintenance epochs.
  */
class DimUpdateSpec extends SparkSpec {
  import spark.implicits._

  private val day = 24L * 3600 * 1000000L
  private val cfg = GenConfig(numConversations = 200, hotConversations = 2,
    hotFragments = 64, redeliveryPermille = 50, epochs = 4)
  private lazy val log = ChangeLogGen.generate(spark, cfg).cache()

  private val baseMonths = Seq(201911, 201912)
  private def baseDim: DataFrame =
    Enrichment.generateDim(spark, numAsids = 997, yearMonths = baseMonths)

  /** Two asids guaranteed present in epoch-0/1 transfers (derived from the
    * log, deterministically) — the delta must provably touch committed rows.
    */
  private lazy val targetAsids: Seq[String] =
    CdcPipeline.classify(log.filter(_.epoch <= 1L), 14 * day)
      .select("requestingPracticeAsid").distinct().as[String]
      .collect().sorted.take(2).toSeq

  /** Changed snapshots: new names for the target asids at 201912 (rewrites
    * the fallback rows January-2020 transfers resolve to) plus a brand-new
    * 202001 snapshot for the first (overrides its previous-month fallback).
    */
  private lazy val delta: DataFrame = (
    targetAsids.map(a => Enrichment.OrgDimRow(a, s"O-$a-upd",
      s"Practice $a (refreshed)", "S900", "SICBL 900", 201912)) :+
      Enrichment.OrgDimRow(targetAsids.head, s"O-${targetAsids.head}-202001",
        s"Practice ${targetAsids.head} (as of 202001)", "S901", "SICBL 901", 202001)
  ).toDF()

  private def foldDelta(dim: DataFrame, d: DataFrame): DataFrame =
    dim.join(d.select("asid", "yearMonth").distinct(),
      Seq("asid", "yearMonth"), "left_anti").unionByName(d)

  // semantic row comparison: everything except the batching-dependent
  // observability counters (excluded from row_sha256 for the same reason)
  private val counters =
    Set("duplicatesDropped", "danglingAcks", "unknownPurpose", "negativeSla")
  private def rowMap(df: DataFrame): Map[String, String] = {
    val cols = df.columns.filterNot(counters).sorted.map(col)
    df.select(col("repo"), to_json(struct(cols.toIndexedSeq: _*)).as("j"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  private def batchEnrich(events: org.apache.spark.sql.Dataset[ChangeEvent],
                          dim: DataFrame): DataFrame =
    Enrichment.enrich(
      CdcPipeline.withRowSha(CdcPipeline.classify(events, 14 * day).toDF()), dim)

  test("dim update retro-corrects committed rows and governs later epochs") {
    val eng = new CdcEngine(tmpDir("dimupd"), numBuckets = 8,
      cutoffMicros = 14 * day, dim = Some(baseDim))
    (0L to 1L).foreach(e => eng.applyEpoch(spark, log.filter(_.epoch == e), e))

    val preUpdate = rowMap(eng.currentEnriched(spark))
    val n = eng.applyDimUpdate(spark, delta, epoch = 2L)
    assert(n > 0, "the delta's asids appear in the log — some rows must re-enrich")

    val newDim = foldDelta(baseDim, delta)
    val afterRetro = rowMap(eng.currentEnriched(spark))
    assert(afterRetro == rowMap(batchEnrich(log.filter(_.epoch <= 1L), newDim)),
      "retro-correction must equal one-shot enrichment with the refreshed dim")
    assert(afterRetro != preUpdate, "the refreshed names must be visible")

    // subsequent epochs enrich with the refreshed dim (ingest ids continue
    // after the update's id — shared monotonic number space)
    (2L to 3L).foreach(e => eng.applyEpoch(spark, log.filter(_.epoch == e), e + 1L))
    assert(rowMap(eng.currentEnriched(spark)) == rowMap(batchEnrich(log, newDim)),
      "epochs after the update must use the refreshed dim")

    // O(affected): the re-enrichment commit wrote only delta-adjacent rows
    val m = eng.enriched.get.manifestAt(2L).get
    assert(m.kind == "dim-update")
    assert(m.lineage("reEnriched") == n && n < preUpdate.size,
      s"re-enriched $n of ${preUpdate.size} rows — must be the affected subset")
  }

  test("dim update is idempotent and replays to identical state") {
    def run(dir: String): CdcEngine = {
      val eng = new CdcEngine(dir, numBuckets = 8,
        cutoffMicros = 14 * day, dim = Some(baseDim))
      (0L to 1L).foreach(e => eng.applyEpoch(spark, log.filter(_.epoch == e), e))
      eng.applyDimUpdate(spark, delta, epoch = 2L)
      (2L to 3L).foreach(e => eng.applyEpoch(spark, log.filter(_.epoch == e), e + 1L))
      eng
    }
    val a = run(tmpDir("dimreplay-a"))
    val b = run(tmpDir("dimreplay-b"))
    assert(rowMap(a.currentEnriched(spark)) == rowMap(b.currentEnriched(spark)),
      "independent replays of the same feed must converge")

    // re-running the committed dim-update epoch skips the write
    val head = a.enriched.get.latestManifest().get
    val again = a.applyDimUpdate(spark, delta, epoch = 2L)
    assert(again == a.enriched.get.manifestAt(2L).get.lineage("reEnriched"))
    assert(a.enriched.get.latestManifest().get == head, "no new commit on replay")
  }

  test("ingest epoch reusing a dim-update id aborts BEFORE any table commits") {
    val eng = new CdcEngine(tmpDir("dimcollide"), numBuckets = 8,
      cutoffMicros = 14 * day, dim = Some(baseDim))
    eng.applyEpoch(spark, log.filter(_.epoch == 0L), 0L)
    eng.applyDimUpdate(spark, delta, epoch = 1L)

    // the round-3 hazard: without the pre-flight, state's appendNew future
    // could commit the batch under the contested id before the enriched
    // commit throws — a later retry under a corrected id would then see no
    // fresh events and silently never write the transfers. The abort must
    // leave EVERY chain untouched at the contested id.
    intercept[IllegalArgumentException] {
      eng.applyEpoch(spark, log.filter(_.epoch == 1L), 1L)
    }
    assert(eng.state.manifestAt(1L).isEmpty, "state must not commit on abort")
    assert(eng.transfers.manifestAt(1L).isEmpty)

    // the corrected id then applies the SAME batch completely
    eng.applyEpoch(spark, log.filter(_.epoch == 1L), 2L)
    assert(eng.committedThrough().contains(2L))
    assert(rowMap(eng.currentEnriched(spark)) ==
      rowMap(batchEnrich(log.filter(_.epoch <= 1L), foldDelta(baseDim, delta))),
      "post-retry state must equal the batch oracle — nothing lost")

    // and the reverse collision: a dim update reusing an ingest id throws
    intercept[IllegalArgumentException] {
      eng.applyDimUpdate(spark, delta, epoch = 2L)
    }
  }

  test("ingest below a high-parked dim-update id aborts with NOTHING committed") {
    // the round-4 review finding: a dim-update parked at a HIGH id on the
    // enriched chain (with transfers non-empty, so a manifest really lands)
    // must not let a later, lower-numbered ingest epoch half-commit
    // state+transfers and then fail the enriched future — that divergence
    // is unhealable. The head-ordering pre-flight aborts side-effect-free.
    val eng = new CdcEngine(tmpDir("dimpark"), numBuckets = 8,
      cutoffMicros = 14 * day, dim = Some(baseDim))
    eng.applyEpoch(spark, log.filter(_.epoch == 0L), 0L)
    val n = eng.applyDimUpdate(spark, delta, epoch = 1000L)
    assert(n > 0, "the parked update must really commit a manifest")

    intercept[IllegalArgumentException] {
      eng.applyEpoch(spark, log.filter(_.epoch == 1L), 1L) // below head 1000
    }
    assert(eng.state.manifestAt(1L).isEmpty && eng.transfers.manifestAt(1L).isEmpty,
      "no chain may advance on the abort")

    // and a dim update below its own chain head is rejected the same way
    intercept[IllegalArgumentException] {
      eng.applyDimUpdate(spark, delta, epoch = 500L)
    }
  }

  test("an aborted dim update leaves the active dim and months untouched") {
    val eng = new CdcEngine(tmpDir("dimabort"), numBuckets = 8,
      cutoffMicros = 14 * day, dim = Some(baseDim),
      dimMonths = Some(baseMonths.toSet))
    eng.applyEpoch(spark, log.filter(_.epoch == 0L), 0L)
    val monthsBefore = eng.currentDimMonths
    val dimBefore = eng.currentDim.get
    intercept[IllegalArgumentException] {
      eng.applyDimUpdate(spark, delta, epoch = 0L) // collides with ingest id
    }
    assert(eng.currentDimMonths == monthsBefore,
      "strict coverage must not gain months from an aborted update")
    assert(eng.currentDim.get eq dimBefore,
      "the active dim must be the exact pre-abort instance")
  }

  test("strictDimMonths aborts side-effect-free and heals via dim refresh") {
    // January 2020 transfers: month 202001, previous 201912 — declare
    // NEITHER so every classified transfer is a missing-dim row
    val eng = new CdcEngine(tmpDir("strict"), numBuckets = 8,
      cutoffMicros = 14 * day,
      dim = Some(Enrichment.generateDim(spark, 997, Seq(201911))),
      dimMonths = Some(Set(201911)), strictDimMonths = true)
    val ex = intercept[IllegalStateException] {
      eng.applyEpoch(spark, log.filter(_.epoch == 0L), 0L)
    }
    assert(ex.getMessage.contains("OdsMetadataNotFound"))
    assert(eng.state.manifestAt(0L).isEmpty && eng.transfers.manifestAt(0L).isEmpty,
      "the strict abort must precede every commit")

    // refresh the dim with a 201912 snapshot month → coverage now includes
    // the fallback month of 202001, and the SAME epoch id retries cleanly.
    // (the update epoch here uses an id ABOVE the ingest range — nothing
    // has committed yet, so any id works; ingest then starts at 0)
    eng.applyDimUpdate(spark,
      Seq(Enrichment.OrgDimRow("asid-1", "O1", "P1", "S1", "SB1", 201912)).toDF(),
      epoch = 100L)
    eng.applyEpoch(spark, log.filter(_.epoch == 0L), 0L)
    assert(eng.committedThrough().contains(0L))
    assert(eng.transfers.manifestAt(0L).get
      .lineage.get("missingDimMonthTransfers").contains(0L))
  }

  test("strictDimMonths without dimMonths is rejected at construction") {
    intercept[IllegalArgumentException] {
      new CdcEngine(tmpDir("strict-bad"), numBuckets = 4,
        cutoffMicros = 14 * day, strictDimMonths = true)
    }
  }
}
