package graft.crawl

import java.time.{DayOfWeek, LocalDate, LocalDateTime}

/** ST2 scheduled-cadence policy — the deterministic mapping from a clock
  * interval to crawl triggers that the reference's cron jobs produce
  * (service/ScheduledCrawlerService.java:35-126; defaults from
  * application.yml `crawler.scheduled`):
  *
  *  - **daily** at 06:00: crawl dates [today−daysBack .. today−1]
  *    (endDate = yesterday, startDate = endDate − (daysBack−1)),
  *    forceUpdate = false;
  *  - **weekly** Sunday at 02:00: dates [today−30 .. today−1] (endDate =
  *    yesterday, 30 days), forceUpdate = true;
  *  - **retry** at 00/06/12/18:00: one retry sweep of FAILED documents
  *    (no dates — the engine's retry queue re-enqueue, J6/U6).
  *
  * The reference evaluates `LocalDate.now()` at fire time; here the fire
  * instant IS the clock (pure function of the interval), so the schedule
  * is reproducible — the engine-wide no-wall-clock rule (SURVEY.md §7.5.1).
  * Epoch mapping: the engine's crawl epoch is the date analogue
  * (SURVEY.md §3.3), so each trigger date maps to `epochOf(date)` relative
  * to a caller-fixed origin.
  */
object Cadence {

  object Kind {
    val Daily = "DAILY"
    val Weekly = "WEEKLY"
    val Retry = "RETRY"
  }

  /** One fired cron job: crawl `dates` (oldest first, as the reference's
    * ascending date loop) with the given force flag. Retry triggers carry
    * no dates. */
  final case class Trigger(at: LocalDateTime, kind: String,
      dates: Seq[LocalDate], force: Boolean)

  private def datesEndingYesterday(fireDay: LocalDate, n: Int): Seq[LocalDate] = {
    val end = fireDay.minusDays(1)
    val start = end.minusDays(n - 1L)
    Iterator.iterate(start)(_.plusDays(1)).takeWhile(!_.isAfter(end)).toSeq
  }

  /** Every trigger with `from < at <= to`, ordered by (at, kind) — a
    * deterministic total order even when retry and daily coincide at
    * 06:00. */
  def triggersBetween(from: LocalDateTime, to: LocalDateTime,
      daysBack: Int = 7): Seq[Trigger] = {
    require(!to.isBefore(from), s"empty clock interval $from..$to")
    val days = Iterator.iterate(from.toLocalDate)(_.plusDays(1))
      .takeWhile(!_.isAfter(to.toLocalDate)).toSeq
    val fired = days.flatMap { d =>
      val daily = Trigger(d.atTime(6, 0), Kind.Daily,
        datesEndingYesterday(d, daysBack), force = false)
      val weekly =
        if (d.getDayOfWeek == DayOfWeek.SUNDAY)
          Seq(Trigger(d.atTime(2, 0), Kind.Weekly,
            datesEndingYesterday(d, 30), force = true))
        else Nil
      val retries = Seq(0, 6, 12, 18).map(h =>
        Trigger(d.atTime(h, 0), Kind.Retry, Nil, force = false))
      (daily +: weekly) ++ retries
    }
    fired.filter(t => t.at.isAfter(from) && !t.at.isAfter(to))
      .sortBy(t => (t.at, t.kind))
  }

  /** Map a trigger's dates onto engine crawl epochs relative to `origin`
    * (epoch 0's date): the distinct, ascending epoch list this trigger
    * re-enqueues, with its force flag. Dates before the origin have no
    * epoch and are dropped. */
  def epochPlan(t: Trigger, origin: LocalDate): (Seq[Int], Boolean) = {
    val epochs = t.dates
      .map(d => java.time.temporal.ChronoUnit.DAYS.between(origin, d))
      .filter(_ >= 0).map(_.toInt).distinct.sorted
    (epochs, t.force)
  }
}
