package graft

import java.time.{LocalDate, LocalDateTime}
import org.scalatest.funsuite.AnyFunSuite
import graft.crawl.Cadence

/** ST2 cadence policy ≡ the reference's cron semantics
  * (service/ScheduledCrawlerService.java:35-126, application.yml
  * crawler.scheduled defaults) for a fixed clock sequence. */
class CadenceSpec extends AnyFunSuite {

  // Mon 2026-03-02 00:00 → Mon 2026-03-09 00:00 (exclusive start,
  // inclusive end — one full week containing one Sunday, 2026-03-08)
  private val from = LocalDateTime.of(2026, 3, 2, 0, 0)
  private val to = LocalDateTime.of(2026, 3, 9, 0, 0)
  private lazy val ts = Cadence.triggersBetween(from, to)

  test("daily at 06:00: last-7-days window ending yesterday, not forced") {
    val daily = ts.filter(_.kind == Cadence.Kind.Daily)
    assert(daily.map(_.at) ==
      (2 to 8).map(d => LocalDateTime.of(2026, 3, d, 6, 0)))
    daily.foreach { t =>
      assert(!t.force)
      val yesterday = t.at.toLocalDate.minusDays(1)
      assert(t.dates == (6 to 0 by -1).map(yesterday.minusDays(_)))
      assert(t.dates.size == 7 && t.dates.last == yesterday)
    }
  }

  test("weekly Sunday 02:00: last-30-days window, forced") {
    val weekly = ts.filter(_.kind == Cadence.Kind.Weekly)
    assert(weekly.map(_.at) == Seq(LocalDateTime.of(2026, 3, 8, 2, 0)))
    val t = weekly.head
    assert(t.force)
    assert(t.dates.size == 30)
    assert(t.dates.last == LocalDate.of(2026, 3, 7)) // yesterday
    assert(t.dates.head == LocalDate.of(2026, 2, 6)) // yesterday − 29
    assert(t.dates == t.dates.sorted) // ascending, as the reference's loop
  }

  test("retry sweep every 6 hours") {
    val retry = ts.filter(_.kind == Cadence.Kind.Retry)
    assert(retry.size == 7 * 4)
    assert(retry.forall(t => Seq(0, 6, 12, 18).contains(t.at.getHour)))
    assert(retry.forall(t => t.dates.isEmpty && !t.force))
  }

  test("interval boundaries: (from, to] — exclusive start, inclusive end") {
    // a trigger exactly AT `from` does not fire; one exactly at `to` does
    val atFrom = Cadence.triggersBetween(
      LocalDateTime.of(2026, 3, 2, 6, 0), LocalDateTime.of(2026, 3, 3, 6, 0))
    assert(atFrom.count(_.kind == Cadence.Kind.Daily) == 1)
    assert(atFrom.filter(_.kind == Cadence.Kind.Daily).head.at ==
      LocalDateTime.of(2026, 3, 3, 6, 0))
    // total order is deterministic even where retry(06:00) meets daily(06:00)
    assert(ts == ts.sortBy(t => (t.at, t.kind)))
  }

  test("epoch mapping drops pre-origin dates and dedups ascending") {
    val t = ts.find(_.kind == Cadence.Kind.Weekly).get
    val origin = LocalDate.of(2026, 3, 1)
    val (epochs, force) = Cadence.epochPlan(t, origin)
    assert(force)
    // window is Feb 6 .. Mar 7; only Mar 1..Mar 7 are ≥ origin → epochs 0..6
    assert(epochs == (0 to 6))
    val (allEpochs, _) = Cadence.epochPlan(t, LocalDate.of(2026, 2, 6))
    assert(allEpochs == (0 to 29))
  }
}
