package graft.cdc

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference reporting-window tests (day list, overflow days,
  * defaults — reporting_window.py) and the ordered month dedup (A7).
  */
class ReportingWindowSpec extends AnyFunSuite {
  test("day list covers [start, end), overflow adds cutoff days past end") {
    val w = ReportingWindow(LocalDate.of(2019, 12, 30), LocalDate.of(2020, 1, 2), 2)
    assert(w.days == Seq(
      LocalDate.of(2019, 12, 30), LocalDate.of(2019, 12, 31), LocalDate.of(2020, 1, 1)))
    assert(w.overflowDays == Seq(LocalDate.of(2020, 1, 2), LocalDate.of(2020, 1, 3)))
    assert(w.scanDays.size == 5)
  }

  test("months dedup preserves first-seen order across the year boundary") {
    val w = ReportingWindow(LocalDate.of(2019, 12, 30), LocalDate.of(2020, 1, 2), 0)
    assert(w.months == Seq(201912, 202001))
    assert(w.overflowDays.isEmpty) // cutoff 0 → no overflow
  }

  test("default window is the single day today − cutoff − 1") {
    val w = ReportingWindow.default(LocalDate.of(2020, 1, 20), 14)
    assert(w.days == Seq(LocalDate.of(2020, 1, 5)))
    assert(w.end == LocalDate.of(2020, 1, 6))
  }

  test("containsDateRequested is inclusive-start exclusive-end (P2)") {
    val w = ReportingWindow(LocalDate.of(2020, 1, 1), LocalDate.of(2020, 1, 2), 14)
    assert(w.containsDateRequested(w.startMicros))
    assert(w.containsDateRequested(w.endMicros - 1))
    assert(!w.containsDateRequested(w.endMicros))
    assert(!w.containsDateRequested(w.startMicros - 1))
  }
}
