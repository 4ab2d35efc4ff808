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

  // Stopword inventories for the n-gram language heuristic. Kept tiny and
  // high-frequency so the scan stays cheap at 100 TB scale.
  val EnStop = Seq("the", "and", "of", "to", "is", "in", "that", "with", "for", "was")
  val DeStop = Seq("der", "die", "das", "und", "ist", "nicht", "von", "mit", "für", "den")
  val FrStop = Seq("le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des")

  // r06: every count below comes from ONE fused native pass
  // (ExprOps.textStats — [n_chars, n_alpha, n_punct, n_toks, n_bpe,
  // en, de, fr]) instead of ~9 interpreted regex traversals per row;
  // identical expression trees across the derived columns collapse to a
  // single evaluation under whole-stage-codegen subexpression
  // elimination. The double arithmetic and null behavior below are
  // UNCHANGED — the kernel only replaces the integer counting, each
  // count proven equal to its regex form (see the kernel's scaladoc;
  // FunctionsSpec pins the whole family against the declarative chains
  // on corpus + hostile rows).
  private def stats(text: Column): Column =
    graft.expressions.GraftFunctions.textStats(text, EnStop, DeStop, FrStop)

  /** The stats array as an explicit column, for query shapes that derive
    * SEVERAL of the functions below from one text column: project this
    * ONCE (`withColumn("st__", textStatsCol(...))`) and use the
    * `...FromStats` variants against it. This matters because the
    * derived CASE expressions reference the array from conditional
    * branches, which whole-stage-codegen subexpression elimination does
    * NOT extract — inlined, the kernel would run once per REFERENCE
    * (measured: q40 2.3× slower) — while CollapseProject keeps a
    * non-cheap multi-referenced projection in its own Project, so the
    * named column pins exactly one evaluation per row. The instance is
    * `pinned` (plan-shape non-determinism, see TextStatsExpr) so a
    * FILTER on the derived columns cannot be pushed below the
    * projection with the kernel inlined per reference. */
  def textStatsCol(text: Column): Column =
    graft.expressions.GraftFunctions.textStats(text, EnStop, DeStop, FrStop,
      pinned = true)

  /** Whitespace token count; blank → 0. */
  def tokenCount(text: Column): Column = tokenCountFromStats(stats(text))

  def tokenCountFromStats(st: Column): Column =
    element_at(st, 4).cast("int")

  /** BPE-ish subword-count estimate: letter runs, digits, and individual
    * punctuation marks each count as one token. */
  def bpeTokenCount(text: Column): Column = bpeTokenCountFromStats(stats(text))

  def bpeTokenCountFromStats(st: Column): Column =
    element_at(st, 5).cast("int")

  /** Generic stopword-hit count (regex form — kept for ad-hoc
    * inventories; the fixed en/de/fr inventories go through the fused
    * native pass instead). */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(text),
      lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  /** Language-ID by stopword evidence; ties / no evidence → "unknown".
    * Priority on exact ties: en > de > fr (deterministic). */
  def langId(text: Column): Column = langIdFromStats(text, stats(text))

  def langIdFromStats(text: Column, st: Column): Column = {
    val en = element_at(st, 6)
    val de = element_at(st, 7)
    val fr = element_at(st, 8)
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
    val st = stats(text)
    val len = element_at(st, 1).cast("double")
    // (single-function call sites only — multi-function shapes go
    // through textStatsCol + the FromStats variants, see above)
    val alpha = element_at(st, 2).cast("double")
    val punct = element_at(st, 3).cast("double")
    val toks = element_at(st, 4).cast("double")
    val stops = (element_at(st, 6) + element_at(st, 7) + element_at(st, 8))
      .cast("double")
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
    * operation order (the r06 kernel swap changed only where the INTEGER
    * counts come from, not one double op). */
  def qualityScoreX1e4(text: Column): Column =
    qualityScoreX1e4FromStats(stats(text))

  def qualityScoreX1e4FromStats(st: Column): Column = {
    val len = element_at(st, 1).cast("double")
    val alpha = element_at(st, 2).cast("double")
    val punct = element_at(st, 3).cast("double")
    val toks = element_at(st, 4).cast("double")
    val stops = (element_at(st, 6) + element_at(st, 7) + element_at(st, 8))
      .cast("double")
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
