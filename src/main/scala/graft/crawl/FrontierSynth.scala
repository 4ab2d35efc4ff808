package graft.crawl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.UrlFunctions

/** Deterministic seeded frontier generator — the synthetic stand-in for the
  * reference's sitemap-index → sitemap → url expansion
  * (service/SitemapCrawlerService.java:57-169). Pure column expressions
  * over `spark.range(n)`: no data movement, no RNG state, generation is
  * embarrassingly parallel and identical at any partitioning — which is
  * what lets the same generator drive a 10^10-row frontier on a cluster.
  *
  * Fixture properties (FIXTURES.md §1):
  *  - Zipf-ish host skew (log-uniform over `numHosts`, so host 0 is hot);
  *  - ~20% of rows duplicate an earlier row's URL (dedup fixture): rows
  *    with `id >= 0.8n` re-draw their identity from the GLOBAL id-domain
  *    `[0, 0.8·(epochOffset+n))` — spanning all earlier epochs — so an
  *    epoch-1+ dup row can hit an epoch-0 identity and exercise the
  *    URL-seen skip / forceUpdate / delete-re-crawl paths end-to-end
  *    (an epoch-local domain leaves the cross-epoch seen store unhit);
  *  - ~5% of URLs carry injected whitespace noise (canonicalization
  *    fixture) — noise position varies but canonical form is identical;
  *  - 1/8 of the dup-class rows are MIRRORS: same docid + host under a
  *    second path (/jportal/mirror) — a distinct URL serving the same
  *    document (image content is docid-keyed), the cross-URL
  *    content-dedup fixture (c14);
  *  - ~3% of URLs live under a /private/ path (robots fixture);
  *  - docid prefixes cycle {KARE,KORE,KSRE,WBRE,JURE} (court-map fixture,
  *    JURE → UNKNOWN);
  *  - `sitemap_seq`/`entry_seq` = position indices (1000 entries per
  *    sitemap) — they define the reference crawl order.
  */
object FrontierSynth {

  val UrlsPerSitemap = 1000L

  /** Generate `n` frontier rows for `epoch`, deterministically from `seed`.
    * Row ids are globally unique across epochs via `epochOffset`.
    *
    * Epoch-varying values (`epoch`, `epochOffset`, `dupDomain`) enter the
    * plan as [[graft.expressions.ParamLit]] bound parameters, not literals:
    * every epoch's frontier plan then generates byte-identical code and the
    * whole-stage-codegen cache hits instead of recompiling per epoch. */
  def frontier(spark: SparkSession, n: Long, numHosts: Int, seed: Long,
      epoch: Int, epochOffset: Long = 0L): DataFrame = {
    import graft.expressions.ParamLit
    val freshPerEpoch = math.max(1L, (n * 4) / 5)
    val dupDomain = math.max(1L, ((epochOffset + n) * 4) / 5)
    val pOffset = ParamLit.long(epochOffset)
    spark.range(n)
      .select((col("id") + pOffset).as("frontier_seq"), col("id"))
      // identity key: last 20% of each slice re-draw from the global
      // domain (duplicate fixture, cross-epoch); the rest are fresh
      .withColumn("doc_key",
        when(col("id") >= freshPerEpoch,
          pmod(xxhash64(lit(seed), lit(7L), col("id") + pOffset),
            ParamLit.long(dupDomain)))
          .otherwise(col("id") + pOffset))
      .withColumn("r1", xxhash64(lit(seed), col("doc_key")))
      .withColumn("r2", xxhash64(lit(seed + 1), col("doc_key")))
      .withColumn("r3", xxhash64(lit(seed + 2), col("frontier_seq"))) // per-row, not per-key: noise
      // Zipf-ish host: log-uniform index over [0, numHosts)
      .withColumn("u", pmod(col("r1"), lit(1000003L)).cast("double") / 1000003.0)
      .withColumn("host_idx",
        least(floor(pow(lit(numHosts.toDouble), col("u"))) - 1.0, lit((numHosts - 1).toDouble))
          .cast("long"))
      // r06: concat/lpad instead of format_string — java.util.Formatter
      // re-parses the format per ROW and was ~19% of busy executor
      // samples in the 32-core crawl profile; lpad/concat are codegen
      // string ops. Byte-identical: %04d pads to AT LEAST 4 (never
      // truncates), hence the >9999 guard mirroring Formatter semantics.
      .withColumn("host", concat(lit("h"),
        when(col("host_idx") > 9999L, col("host_idx").cast("string"))
          .otherwise(lpad(col("host_idx").cast("string"), 4, "0")),
        lit(".courts.example")))
      .withColumn("prefix", element_at(
        array(lit("KARE"), lit("KORE"), lit("KSRE"), lit("WBRE"), lit("JURE")),
        (pmod(col("r1"), lit(5L)) + 1).cast("int")))
      .withColumn("docnum", pmod(col("r2"), lit(10000000L)))
      // mirror fixture: 1/8 of the dup-class rows (per-ROW r3 draw, so the
      // same doc_key re-drawn elsewhere stays a plain URL-dup) republish
      // their document under a second path — same host, same docid,
      // DIFFERENT canonical URL. These are what give the crawled corpus
      // true cross-URL duplicate images (the content is keyed by docid,
      // Outcomes.contentKey): the c14 phash near-dup query and any content
      // dedup over the payload table have real work to do.
      .withColumn("is_mirror",
        col("id") >= freshPerEpoch && pmod(col("r3"), lit(8L)) === 0)
      .withColumn("path",
        when(pmod(col("r2"), lit(31L)) === 0, lit("/private/docs"))
          .otherwise(when(col("is_mirror"), lit("/jportal/mirror"))
            .otherwise(lit("/jportal/docs"))))
      // docnum ∈ [0, 10⁷) by construction (pmod), so lpad(…, 7, "0") is
      // exactly %07d here — no truncation case exists
      .withColumn("url_clean", concat(
        lit("https://"), col("host"), col("path"), lit("/?quelle=jlink&docid="),
        col("prefix"), lpad(col("docnum").cast("string"), 7, "0"),
        lit("&psml=bsjrsprod.psml&max=true")))
      // whitespace-noise fixture: ~5% of ROWS get a tab+newline injected
      .withColumn("url",
        when(pmod(col("r3"), lit(20L)) === 0,
          regexp_replace(col("url_clean"), "&psml", "\t\n&psml"))
          .otherwise(col("url_clean")))
      .withColumn("sitemap_seq", (col("frontier_seq") / UrlsPerSitemap).cast("long"))
      .withColumn("entry_seq", pmod(col("frontier_seq"), lit(UrlsPerSitemap)))
      .withColumn("lastmod",
        timestamp_add("DAY", pmod(col("r1"), lit(365L)),
          to_timestamp(lit("2025-01-01 00:00:00"))))
      .withColumn("discovered_epoch", graft.expressions.ParamLit.int(epoch))
      .select("frontier_seq", "url", "host", "sitemap_seq", "entry_seq",
        "lastmod", "discovered_epoch")
  }

  /** Canonicalize + key a frontier (P3-P6): the columns every downstream
    * stage joins/partitions on. `buckets` = salted host-bucket count. */
  def key(frontier: DataFrame, buckets: Int): Dataset[KeyedUrl] = {
    val spark = frontier.sparkSession
    import spark.implicits._
    frontier
      .withColumn("url_canon", UrlFunctions.canonicalizeUrl(col("url")))
      .withColumn("url_hash", UrlFunctions.urlHash(col("url")))
      .withColumn("docid", UrlFunctions.extractDocId(col("url_canon")))
      .withColumn("court", UrlFunctions.courtOf(col("docid")))
      .withColumn("host_bucket", UrlFunctions.hostBucket(col("host"), buckets))
      .withColumn("path", regexp_extract(col("url_canon"), "^https?://[^/]+(/[^?]*)", 1))
      .select($"url_canon", $"url_hash", $"docid", $"court", $"host",
        $"host_bucket", $"path", $"sitemap_seq", $"entry_seq",
        $"discovered_epoch", $"lastmod")
      .as[KeyedUrl]
  }
}
