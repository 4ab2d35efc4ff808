package graft.crawl

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-host politeness scheduling as window-ranked priority queues
  * (SURVEY.md §2.5 W1). The reference serializes fetches per host with
  * `Thread.sleep(rateLimitMs)` (service/SitemapCrawlerService.java:82,
  * service/DocumentDownloadService.java:87); at cluster scale wall-clock
  * sleeps become per-epoch row budgets: rank each host's candidates in
  * reference order and admit the first `budgetPerHost` per epoch —
  * *order* semantics preserved, throughput decoupled from sleeps
  * (SURVEY.md §7.5.6).
  *
  * Ordering key = (discovered_epoch, sitemap_seq, entry_seq): exactly the
  * reference's crawl order (date asc → sitemap position → entry position,
  * service/CrawlerOrchestrationService.java:59-76) — deferred/retry rows
  * keep their original keys, so they are naturally first in line next
  * epoch.
  *
  * Skew: before the per-host window (which must see each host's rows in
  * one place), a map-side partial top-k keeps only the `budgetPerHost`
  * earliest rows per host *per input partition* — the top-k analogue of a
  * map-side combine. A Zipf mega-host then ships ≤ budget×partitions rows
  * into the window instead of its full frontier share.
  */
object Politeness {

  private val orderCols = Seq("discovered_epoch", "sitemap_seq", "entry_seq")

  /** (admitted with slots, deferred) under a per-host, per-epoch budget. */
  def admit(candidates: Dataset[KeyedUrl], budgetPerHost: Int)
      : (Dataset[AdmittedUrl], Dataset[KeyedUrl]) = {
    val spark = candidates.sparkSession
    import spark.implicits._

    implicit val ordKey: Ordering[KeyedUrl] = Ordering.by(
      (k: KeyedUrl) => (k.discovered_epoch, k.sitemap_seq, k.entry_seq))

    // phase 1: map-side partial top-k per host (largest-on-top heap of
    // the `budget` smallest order keys)
    val partial = candidates.mapPartitions { rows =>
      val heaps = scala.collection.mutable.Map
        .empty[String, scala.collection.mutable.PriorityQueue[KeyedUrl]]
      rows.foreach { r =>
        val h = heaps.getOrElseUpdate(r.host,
          scala.collection.mutable.PriorityQueue.empty[KeyedUrl])
        if (h.size < budgetPerHost) h.enqueue(r)
        else if (ordKey.lt(r, h.head)) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }

    // phase 2: exact per-host ranking window over the survivors
    val w = Window.partitionBy(col("host"))
      .orderBy(orderCols.map(col): _*)
    val admitted = partial.toDF()
      .withColumn("slot", row_number().over(w))
      .filter(col("slot") <= budgetPerHost)
      .select(col("url_canon"), col("url_hash"), col("docid"), col("court"),
        col("host"), col("host_bucket"), col("path"), col("sitemap_seq"),
        col("entry_seq"), col("discovered_epoch"), col("lastmod"), col("slot"))
      .as[AdmittedUrl]

    // deferred = candidates beyond the budget (kept for the next epoch)
    val deferred = candidates
      .join(admitted.select("url_hash"), Seq("url_hash"), "left_anti")
      .as[KeyedUrl]
    (admitted, deferred)
  }

  /** Row states emitted by the fused host stage. */
  object Sched {
    val Admitted = "ADMITTED"
    val Deferred = "DEFERRED"
    val Denied = "DENIED"
  }

  /** Fused per-host stage: robots admission + politeness ranking + budget
    * in ONE shuffle — repartition by host, sort within partitions by the
    * reference order, then a streamed per-host run-length pass assigning
    * slots under the budget with broadcast robots rules (the north rule's
    * "Catalyst-friendly mapGroups stage", expressed as
    * repartition+sortWithinPartitions+mapPartitions so the sort is the
    * shuffle's sort, groups never materialize, and the mega-host costs one
    * task's time, never one task's memory).
    *
    * Output: (row, state, slot): ADMITTED (slot 1..budget), DEFERRED
    * (carried to the next epoch), DENIED (robots; terminal). */
  def schedule(unseen: Dataset[KeyedUrl], rules: Map[String, RobotsRule],
      budgetPerHost: Int): Dataset[(KeyedUrl, String, Int)] = {
    val spark = unseen.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(rules)
    unseen
      .repartition(col("host"))
      .sortWithinPartitions(col("host"), col("discovered_epoch"),
        col("sitemap_seq"), col("entry_seq"))
      .mapPartitions { rows =>
        var currentHost: String = null
        var rule: Option[RobotsRule] = None
        var slot = 0
        rows.map { r =>
          if (r.host != currentHost) {
            currentHost = r.host
            rule = bc.value.get(r.host)
            slot = 0
          }
          if (!Robots.allows(rule, r.path)) (r, Sched.Denied, 0)
          else if (slot < budgetPerHost) { slot += 1; (r, Sched.Admitted, slot) }
          else (r, Sched.Deferred, 0)
        }
      }
  }

  /** First-occurrence-per-URL within an epoch's candidate set — the
    * sequential reference loop skips a duplicate because the first
    * occurrence was already saved moments earlier
    * (service/CrawlerOrchestrationService.java:112-117); in set-parallel
    * form that is: keep the earliest (discovered_epoch, sitemap_seq,
    * entry_seq) row per url_hash. */
  def dedupWithinEpoch(candidates: Dataset[KeyedUrl]): Dataset[KeyedUrl] = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("url_hash"))
      .orderBy(orderCols.map(col): _*)
    candidates.toDF()
      .withColumn("rn__", row_number().over(w))
      .filter(col("rn__") === 1)
      .drop("rn__")
      .as[KeyedUrl]
  }
}
