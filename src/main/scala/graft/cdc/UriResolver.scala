package graft.cdc

import java.time.LocalDate

/** The reference's storage-layout contract, ported literally —
  * `pipeline/s3_uri_resolver.py` (versioned prefixes, zero-padded date
  * paths for spine/transfers/MI, UN-padded `year/month` for ODS metadata —
  * a python f-string of ints). Paths are returned relative to a caller
  * base ("bucket"); the engine's own lake layout stays Hive-partitioned
  * (semantically equivalent, golden-diffed), this resolver exists for
  * drop-in compatibility with consumers of the reference's tree.
  */
object UriResolver {
  val SpineMessagesVersion = "v3"
  val OdsMetadataVersion = "v5"
  val MiEventsVersion = "v1"
  val TransfersParquetVersion = "v11"

  private def pad(n: Int): String = f"$n%02d"
  private def ymd(d: LocalDate): (String, String, String) =
    (d.getYear.toString, pad(d.getMonthValue), pad(d.getDayOfMonth))

  /** `s3_uri_resolver.py:42-52` — one gzip CSV per window+overflow day. */
  def spineMessages(base: String, days: Seq[LocalDate]): Seq[String] =
    days.map { d =>
      val (y, m, dd) = ymd(d)
      s"$base/$SpineMessagesVersion/$y/$m/$dd/$y-$m-${dd}_spine_messages.csv.gz"
    }

  /** `s3_uri_resolver.py:54-66` — yyyymm ints, NO zero padding (f-string). */
  def odsMetadata(base: String, yearMonths: Seq[Int]): Seq[String] =
    yearMonths.distinct.map(ym =>
      s"$base/$OdsMetadataVersion/${ym / 100}/${ym % 100}/organisationMetadata.json")

  /** `s3_uri_resolver.py:80-91` — the daily transfers parquet. */
  def gp2gpTransfers(base: String, day: LocalDate, cutoffDays: Int): String = {
    val (y, m, dd) = ymd(day)
    s"$base/$TransfersParquetVersion/cutoff-$cutoffDays/$y/$m/$dd/$y-$m-$dd-transfers.parquet"
  }

  /** `s3_uri_resolver.py:93-104` — MI event day prefixes. */
  def miEvents(base: String, days: Seq[LocalDate]): Seq[String] =
    days.map { d =>
      val (y, m, dd) = ymd(d)
      s"$base/$MiEventsVersion/$y/$m/$dd"
    }
}
