package graft

import java.time.LocalDate
import graft.crawl.Discovery

/** S5/U3: HEAD-probe discovery — binary-search earliest (driver, log₂
  * probes) and the distributed probe stage. */
class DiscoverySpec extends SparkSpec {
  import spark.implicits._

  private val seed = 42L
  private val horizon = LocalDate.of(2025, 12, 31)
  private val lo = LocalDate.of(2019, 1, 1)

  test("binary search finds the exact earliest available date") {
    val (got, _) = Discovery.binarySearchEarliest(lo, horizon,
      d => Discovery.availableOn(d, seed, horizon))
    // reference answer by linear scan
    val linear = Iterator.iterate(lo)(_.plusDays(1))
      .takeWhile(!_.isAfter(horizon))
      .find(d => Discovery.availableOn(d, seed, horizon))
    assert(got == linear)
    assert(got.contains(Discovery.earliestFor(seed)))
  }

  test("binary search uses O(log n) probes, not a scan") {
    var maxProbes = 0
    for (s <- 0L until 25L) {
      val (got, probes) = Discovery.binarySearchEarliest(lo, horizon,
        d => Discovery.availableOn(d, s, horizon))
      assert(got.contains(Discovery.earliestFor(s)), s"seed $s")
      maxProbes = math.max(maxProbes, probes)
    }
    val range = horizon.toEpochDay - lo.toEpochDay + 1
    val bound = (math.log(range.toDouble) / math.log(2)).ceil.toInt + 2
    assert(maxProbes <= bound, s"$maxProbes probes > log2 bound $bound")
  }

  test("empty / fully-unavailable ranges return None") {
    assert(Discovery.binarySearchEarliest(horizon, lo, _ => true)._1.isEmpty)
    val before = Discovery.earliestFor(seed).minusDays(100)
    val (none, probes) = Discovery.binarySearchEarliest(lo, before,
      d => Discovery.availableOn(d, seed, horizon))
    assert(none.isEmpty && probes == 1, "one probe decides an empty window")
  }

  test("scan-back finds the latest available date with the probe count of the walk") {
    // availability window is [earliestFor(seed), horizon]; from a `today`
    // 3 days past the horizon, the first hit is the horizon itself at
    // probe #3 (today−1, today−2 unavailable, today−3 = horizon)
    val today = horizon.plusDays(3)
    val (got, probes, found) = Discovery.scanBackLatest(today,
      d => Discovery.availableOn(d, seed, horizon))
    assert(found && got == horizon)
    assert(probes == 3, s"expected exactly 3 probes, used $probes")
  }

  test("scan-back exhausting the window returns the reference fallback (today − 7, found=false)") {
    val today = horizon.plusDays(100) // whole 30-day window unavailable
    val (got, probes, found) = Discovery.scanBackLatest(today,
      d => Discovery.availableOn(d, seed, horizon))
    assert(!found && got == today.minusDays(7))
    assert(probes == 30, "the walk must stop at maxDaysBack")
  }

  test("discoverBounds bounds the range from BOTH ends (scan-back + binary search)") {
    val today = horizon.plusDays(1)
    val (bounds, probes) = Discovery.discoverBounds(lo, today,
      d => Discovery.availableOn(d, seed, horizon))
    assert(bounds.contains((Discovery.earliestFor(seed), horizon)))
    val range = horizon.toEpochDay - lo.toEpochDay + 1
    val bound = 1 + (math.log(range.toDouble) / math.log(2)).ceil.toInt + 2
    assert(probes <= bound, s"$probes probes > scan-back+log2 bound $bound")
  }

  test("c18 discovery-bounds rows carry the exact per-seed bounds and probe budget") {
    val rows = graft.readside.CrawlQueries.c18DiscoveryBounds(spark, sf("sf0.001"))
      .collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val s = r.getLong(0)
      val expEarliest = Discovery.earliestFor(s)
      assert(r.getString(1) == expEarliest.toString, s"seed $s earliest")
      assert(r.getString(2) == "2025-12-31", s"seed $s latest must be the horizon")
      val expDays = LocalDate.of(2025, 12, 31).toEpochDay - expEarliest.toEpochDay + 1
      assert(r.getLong(4) == expDays, s"seed $s crawlable days")
      // probes: scan-back ≤ 4 (staggered clock) + log₂ binary search
      assert(r.getLong(3) <= 4 + 14, s"seed $s probe budget ${r.getLong(3)}")
    }
  }

  test("distributed probe stage matches the scalar predicate row-for-row") {
    val earliest = Discovery.earliestFor(seed)
    val start = earliest.minusDays(10)
    val end = earliest.plusDays(20)
    val rows = Discovery.probeRange(spark, start, end, seed, horizon)
      .as[(java.sql.Date, Boolean)].collect().toMap
    assert(rows.size == 31)
    rows.foreach { case (d, avail) =>
      assert(avail == Discovery.availableOn(d.toLocalDate, seed, horizon), s"$d")
    }
  }
}
