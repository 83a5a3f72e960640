package graft.cdc

import java.time.{LocalDate, ZoneOffset}

/** The reporting window — the reference's logical partition spec
  * (`src/prmdata/domain/reporting_window.py:9-72`): a midnight-aligned
  * `[start, end)` day list plus `cutoff` overflow days past the end, so
  * late-arriving events of in-window sessions are scanned (then P3 drops
  * anything past the cutoff). Defaults mirror `:42-66`: when no dates are
  * given, the window is the single day `today − cutoff − 1`.
  *
  * In the engine this drives static partition pruning: day list → the set
  * of change-log offset/date partitions to scan; overflow days → the extra
  * read past the window end.
  */
final case class ReportingWindow(start: LocalDate, end: LocalDate, cutoffDays: Int) {
  require(!end.isBefore(start), s"end $end before start $start")

  /** Days inside the window — one output partition each (S7). */
  def days: Seq[LocalDate] =
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(_.isBefore(end)).toSeq

  /** Overflow days [end, end + cutoff) read for late messages. */
  def overflowDays: Seq[LocalDate] =
    Iterator.iterate(end)(_.plusDays(1))
      .takeWhile(_.isBefore(end.plusDays(cutoffDays.toLong))).toSeq

  /** All days to scan. */
  def scanDays: Seq[LocalDate] = days ++ overflowDays

  /** Distinct (year, month) pairs of the window days in first-seen order —
    * the reference's ordered month dedup (`s3_uri_resolver.py:53-56`, A7);
    * drives which monthly dim snapshots to load.
    */
  def months: Seq[Int] = days.map(d => d.getYear * 100 + d.getMonthValue).distinct

  def startMicros: Long = start.atStartOfDay.toEpochSecond(ZoneOffset.UTC) * 1000000L
  def endMicros: Long   = end.atStartOfDay.toEpochSecond(ZoneOffset.UTC) * 1000000L
  def cutoffMicros: Long = cutoffDays * 24L * 3600 * 1000000L

  /** P2: does a session (keyed by its first-message time) belong to the
    * window?
    */
  def containsDateRequested(micros: Long): Boolean =
    micros >= startMicros && micros < endMicros
}

object ReportingWindow {
  /** Default window when no dates are configured — the single day
    * `today − cutoff − 1` (reporting_window.py:42-66).
    */
  def default(today: LocalDate, cutoffDays: Int): ReportingWindow = {
    val day = today.minusDays(cutoffDays.toLong + 1L)
    ReportingWindow(day, day.plusDays(1), cutoffDays)
  }
}
