package graft.cdc

import graft.SparkSpec
import java.time.LocalDate

/** Literal-path parity with the reference's URI resolver
  * (`tests/unit/pipeline/input_output/test_s3_uri_resolver.py`) and the
  * reference-layout daily export.
  */
class UriResolverSpec extends SparkSpec {
  import spark.implicits._

  test("paths match the reference resolver byte-for-byte") {
    // test_s3_uri_resolver.py:30-34 — spine messages, zero-padded
    assert(UriResolver.spineMessages("b",
      Seq(LocalDate.of(2020, 12, 30), LocalDate.of(2021, 1, 3))) == Seq(
      "b/v3/2020/12/30/2020-12-30_spine_messages.csv.gz",
      "b/v3/2021/01/03/2021-01-03_spine_messages.csv.gz"))
    // :57-58 — ODS metadata months are UN-padded (python f-string of ints)
    assert(UriResolver.odsMetadata("b", Seq(202012, 202101)) == Seq(
      "b/v5/2020/12/organisationMetadata.json",
      "b/v5/2021/1/organisationMetadata.json"))
    // :78-81 — daily transfers parquet
    assert(UriResolver.gp2gpTransfers("b", LocalDate.of(2021, 1, 3), 2) ==
      "b/v11/cutoff-2/2021/01/03/2021-01-03-transfers.parquet")
    assert(UriResolver.miEvents("b", Seq(LocalDate.of(2021, 1, 3))) ==
      Seq("b/v1/2021/01/03"))
  }

  test("reference-layout export writes one parquet per day at the literal path") {
    val rows = Seq(
      ("r1", 1577923200000000L, "INTEGRATED_ON_TIME"), // 2020-01-02
      ("r2", 1577923200000000L + 3600000000L, "TECHNICAL_FAILURE"),
      ("r3", 1578009600000000L, "INTEGRATED_ON_TIME"), // 2020-01-03
    ).toDF("repo", "dateRequestedMicros", "status")
    val base = tmpDir("ref-layout")
    val written = Export.exportDailyReferenceLayout(rows, base, cutoffDays = 14)
    assert(written.keySet == Set("2020-01-02", "2020-01-03"))
    assert(written("2020-01-02") ==
      s"$base/v11/cutoff-14/2020/01/02/2020-01-02-transfers.parquet")
    val day2 = spark.read.parquet(written("2020-01-02"))
    assert(day2.count() == 2 && !day2.columns.contains("date_requested_day"))
    // ONE parquet FILE OBJECT at the literal path (not a Spark directory) —
    // single-object consumers of the reference layout do a plain GET
    assert(java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(written("2020-01-03"))))
    assert(spark.read.parquet(written("2020-01-03")).count() == 1)
  }
}
