package graft.crawl

import scala.collection.mutable
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Single-threaded, reference-faithful crawl simulator — the equivalence
  * oracle (SURVEY.md §5 test strategy (2)): it re-implements the
  * reference's sequential §3.1 semantics in plain Scala, independently of
  * Spark (its own canonicalization/regex/hash calls), and produces the
  * URL-seen membership set, per-host crawl-order traces, and per-URL
  * statuses that the engine must match byte-identically under the same
  * seed list and politeness budget.
  *
  * Semantics simulated, in reference order:
  *  - entries processed in (epoch asc, sitemap position, entry position)
  *    order (service/CrawlerOrchestrationService.java:59-76);
  *  - robots admission (deny-by-default; /private disallow);
  *  - duplicate within the run skipped via the just-updated store
  *    (service/CrawlerOrchestrationService.java:112-117);
  *  - seen ⇔ stored with terminal success ∧ ¬forceUpdate (same lines);
  *  - per-host budget per epoch: first `budget` eligible entries fetch,
  *    the rest carry to the next epoch (W1 re-expression of the
  *    1-req/s-per-host sleep);
  *  - FAILED rows retry next epoch
  *    (repository/JpaLegalDocumentRepository.java:75-76), REJECTED is
  *    terminal.
  */
object Simulator {

  case class Entry(url: String, host: String, sitemapSeq: Long,
      entrySeq: Long, discoveredEpoch: Int)

  case class Fetched(epoch: Int, host: String, slot: Int, urlHash: Long,
      status: String)

  case class Result(
      seen: Set[Long],
      // per (epoch, host): url_hashes in slot order
      traces: Map[(Int, String), Vector[Long]],
      statuses: Map[(Int, Long), String],
      deniedPerEpoch: Map[Int, Long],
      dupPerEpoch: Map[Int, Long],
      seenSkippedPerEpoch: Map[Int, Long],
      deferredPerEpoch: Map[Int, Long])

  // independent re-implementations of the engine's column expressions
  def canonicalize(url: String): String = url.replaceAll("\\s+", "")
  def xxh64(s: String): Long = XXH64.hashUTF8String(UTF8String.fromString(s), 42L)
  def urlHash(url: String): Long = xxh64(canonicalize(url))
  private val DocIdRe = "docid=([A-Z0-9]+)".r
  def docid(canon: String): String =
    DocIdRe.findFirstMatchIn(canon).map(_.group(1)).getOrElse("")
  private val PathRe = "^https?://[^/]+(/[^?]*)".r
  def path(canon: String): String =
    PathRe.findFirstMatchIn(canon).map(_.group(1)).getOrElse("")

  def run(entriesByEpoch: Map[Int, Seq[Entry]], epochs: Int,
      budgetPerHost: Int, rules: Map[String, RobotsRule],
      forceUpdate: Boolean = false): Result = {
    val seen = mutable.Set.empty[Long]
    val traces = mutable.Map.empty[(Int, String), Vector[Long]]
    val statuses = mutable.Map.empty[(Int, Long), String]
    val denied = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val dups = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val seenSkipped = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val deferredCount = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    var carryDeferred = Vector.empty[Entry]
    var carryRetry = Vector.empty[Entry]

    for (epoch <- 0 until epochs) {
      val fresh = entriesByEpoch.getOrElse(epoch, Seq.empty)
      val candidates = (fresh ++ carryDeferred ++ carryRetry)
        .sortBy(e => (e.discoveredEpoch, e.sitemapSeq, e.entrySeq))
      carryDeferred = Vector.empty
      carryRetry = Vector.empty
      val processedThisEpoch = mutable.Set.empty[Long]
      val hostCount = mutable.Map.empty[String, Int].withDefaultValue(0)
      val nextDeferred = mutable.ArrayBuffer.empty[Entry]
      val nextRetry = mutable.ArrayBuffer.empty[Entry]

      for (e <- candidates) {
        val canon = canonicalize(e.url)
        val h = xxh64(canon)
        if (processedThisEpoch.contains(h)) {
          dups(epoch) += 1 // intra-epoch duplicate: first occurrence won
        } else {
          processedThisEpoch += h
          if (seen.contains(h) && !forceUpdate) {
            seenSkipped(epoch) += 1
          } else if (!Robots.allows(rules.get(e.host), path(canon))) {
            denied(epoch) += 1
          } else if (hostCount(e.host) < budgetPerHost) {
            val slot = hostCount(e.host) + 1
            hostCount(e.host) = slot
            val status = Outcomes.of(h, epoch)
            traces((epoch, e.host)) =
              traces.getOrElse((epoch, e.host), Vector.empty) :+ h
            statuses((epoch, h)) = status
            status match {
              case Status.Processed => seen += h
              case Status.Failed => nextRetry += e
              case Status.Rejected => () // terminal
            }
          } else {
            nextDeferred += e
            deferredCount(epoch) += 1
          }
        }
      }
      carryDeferred = nextDeferred.toVector
      carryRetry = nextRetry.toVector
    }
    Result(seen.toSet, traces.toMap, statuses.toMap, denied.toMap,
      dups.toMap, seenSkipped.toMap, deferredCount.toMap)
  }
}
