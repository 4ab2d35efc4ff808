package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for the training-data pipeline: token counting,
  * language-ID (stopword n-gram heuristic), quality scoring, and document
  * fingerprinting. All except the fingerprint are pure built-in expression
  * trees, deliberately written with DuckDB-mirrorable semantics so every
  * query has a SQL oracle; the fingerprint uses the native codegen
  * expression [[graft.expressions.GraftFunctions.rollingFingerprint]].
  *
  * Reference analogues: full-text assembly + cleaning
  * (service/HtmlContentExtractionService.java:148-189), content analysis
  * (service/XmlValidationService.java:320-334).
  */
object TextFunctions {

  /** Whitespace token count; blank → 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword-count estimate: letter runs, digits, and individual
    * punctuation marks each count as one token. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  // Stopword inventories for the n-gram language heuristic. Kept tiny and
  // high-frequency so the regex stays cheap at 100 TB scan scale.
  val EnStop = Seq("the", "and", "of", "to", "is", "in", "that", "with", "for", "was")
  val DeStop = Seq("der", "die", "das", "und", "ist", "nicht", "von", "mit", "für", "den")
  val FrStop = Seq("le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des")

  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(text),
      lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  /** Language-ID by stopword evidence; ties / no evidence → "unknown".
    * Priority on exact ties: en > de > fr (deterministic). */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, EnStop)
    val de = stopwordHits(text, DeStop)
    val fr = stopwordHits(text, FrStop)
    when(text.isNull, lit("unknown"))
      .when(en === 0 && de === 0 && fr === 0, lit("unknown"))
      .when(en >= de && en >= fr, lit("en"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Quality score in [0,1]: alpha-char ratio, punctuation penalty,
    * stopword evidence, and a length sanity term. Deterministic double,
    * rounded to 4 decimals so the DuckDB oracle hashes identically. */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?|#@*]", "")).cast("double")
    val toks = tokenCount(text).cast("double")
    val stops = (stopwordHits(text, EnStop) + stopwordHits(text, DeStop) +
      stopwordHits(text, FrStop)).cast("double")
    val alphaRatio = when(len === 0, 0.0).otherwise(alpha / len)
    val punctPenalty = when(len === 0, 1.0).otherwise(least(punct * 10.0 / len, lit(1.0)))
    val stopRatio = when(toks === 0, 0.0).otherwise(least(stops * 4.0 / toks, lit(1.0)))
    val lenOk = when(len >= 200 && len <= 20000, 1.0)
      .when(len >= 50, 0.5).otherwise(0.0)
    round(alphaRatio * 0.35 + (lit(1.0) - punctPenalty) * 0.15 +
      stopRatio * 0.3 + lenOk * 0.2, 4)
  }

  /** [[qualityScore]] scaled to ×10⁴ integer space with explicit half-up
    * rounding (`floor(x·10⁴ + 0.5)`) instead of `round(double, 4)`:
    * `round` is half-up in Spark but build-dependent in DuckDB, so a score
    * sitting on a 5th-decimal ulp boundary flips the 4th decimal between
    * engines (observed: spark=0.5388 vs oracle=0.5387). `floor` on the
    * identical IEEE double is bit-deterministic in both. The double itself
    * is identical because both sides compute the same formula in the same
    * operation order. */
  def qualityScoreX1e4(text: Column): Column = {
    val len = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?|#@*]", "")).cast("double")
    val toks = tokenCount(text).cast("double")
    val stops = (stopwordHits(text, EnStop) + stopwordHits(text, DeStop) +
      stopwordHits(text, FrStop)).cast("double")
    val alphaTerm = when(len === 0, 0.0).otherwise(alpha / len * 0.35)
    val punctTerm = when(len === 0, 0.0)
      .otherwise((lit(1.0) - least(punct * 10.0 / len, lit(1.0))) * 0.15)
    val stopTerm = when(toks === 0, 0.0)
      .otherwise(least(stops * 4.0 / toks, lit(1.0)) * 0.3)
    val lenTerm = when(len >= 200 && len <= 20000, 0.2)
      .when(len >= 50, 0.1).otherwise(0.0)
    floor((alphaTerm + punctTerm + stopTerm + lenTerm) * 10000.0 + 0.5)
      .cast("bigint")
  }

  /** Shift-tolerant 64-bit content fingerprint (native codegen expr). */
  def fingerprint(text: Column, window: Int = 16): Column =
    graft.expressions.GraftFunctions.rollingFingerprint(text, window)
}
