package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType}
import graft.expressions._

/** SQL surface for the native expressions (SURVEY.md §2.10): makes every
  * graft codegen `Expression` callable from `spark.sql(...)` — the
  * reference exposes its operations over an HTTP query API
  * (controller/CrawlerController.java); our engine's equivalent "external
  * query surface" is ANSI SQL against the same registered functions the
  * Column API uses, so a SQL-only client needs no Scala at all.
  *
  * Two entry points, one registration list:
  *  - cluster-wide / spark-submit:
  *      `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (applied to every new session at build time);
  *  - an already-running session: `GraftExtensions.register(spark)`.
  *
  * Optional-literal arguments (shingle width, SRP bit count, seed) must be
  * foldable integer literals — they parameterize generated code, so a
  * column-valued argument is rejected at analysis time, not at runtime.
  */
object GraftExtensions {

  private def intLit(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType)   => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got: $other")
  }

  private def longLit(e: Expression, fn: String, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType)   => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got: $other")
  }

  private def boolLit(e: Expression, fn: String, what: String): Boolean = e match {
    case Literal(v: Boolean, BooleanType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a boolean literal, got: $other")
  }

  private def strLit(e: Expression, fn: String, what: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      s.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a string literal, got: $other")
  }

  private def arity(fn: String, got: Int, want: String): Nothing =
    throw new IllegalArgumentException(s"$fn expects $want arguments, got $got")

  private def desc(name: String, clazz: Class[_], usage: String)
      : ExpressionInfo =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  /** The full function list: (identifier, info, builder). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (FunctionIdentifier("graft_simhash64"),
      desc("graft_simhash64", classOf[SimHash64Expr],
        "graft_simhash64(text) - 64-bit SimHash over whitespace tokens (near-dup blocking key)."),
      (args: Seq[Expression]) => args match {
        case Seq(c) => SimHash64Expr(c)
        case as     => arity("graft_simhash64", as.size, "1")
      }),
    (FunctionIdentifier("graft_rolling_fingerprint"),
      desc("graft_rolling_fingerprint", classOf[RollingFingerprintExpr],
        "graft_rolling_fingerprint(text[, k]) - min Rabin-Karp hash over k-byte windows (default k=16)."),
      (args: Seq[Expression]) => args match {
        case Seq(c)    => RollingFingerprintExpr(c, 16)
        case Seq(c, k) => RollingFingerprintExpr(c,
          intLit(k, "graft_rolling_fingerprint", "k"))
        case as        => arity("graft_rolling_fingerprint", as.size, "1 or 2")
      }),
    (FunctionIdentifier("graft_cosine_sim"),
      desc("graft_cosine_sim", classOf[CosineSimExpr],
        "graft_cosine_sim(a, b) - cosine similarity of two array<float> embeddings."),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => CosineSimExpr(a, b)
        case as        => arity("graft_cosine_sim", as.size, "2")
      }),
    (FunctionIdentifier("graft_srp_bucket"),
      desc("graft_srp_bucket", classOf[SrpBucketExpr],
        "graft_srp_bucket(vec[, nBits[, seed]]) - signed-random-projection LSH bucket (default 8 bits, seed 42)."),
      (args: Seq[Expression]) => args match {
        case Seq(v)          => SrpBucketExpr(v, 8, 42L)
        case Seq(v, b)       => SrpBucketExpr(v,
          intLit(b, "graft_srp_bucket", "nBits"), 42L)
        case Seq(v, b, s)    => SrpBucketExpr(v,
          intLit(b, "graft_srp_bucket", "nBits"),
          longLit(s, "graft_srp_bucket", "seed"))
        case as              => arity("graft_srp_bucket", as.size, "1 to 3")
      }),
    (FunctionIdentifier("graft_shingle_hashes64"),
      desc("graft_shingle_hashes64", classOf[ShingleHashes64Expr],
        "graft_shingle_hashes64(text[, k]) - distinct 64-bit hashes of the k-byte shingles of normalized text (default k=5)."),
      (args: Seq[Expression]) => args match {
        case Seq(c)    => ShingleHashes64Expr(c, 5)
        case Seq(c, k) => ShingleHashes64Expr(c,
          intLit(k, "graft_shingle_hashes64", "k"))
        case as        => arity("graft_shingle_hashes64", as.size, "1 or 2")
      }),
    (FunctionIdentifier("graft_word_ngram_hashes64"),
      desc("graft_word_ngram_hashes64", classOf[WordNgramHashes64Expr],
        "graft_word_ngram_hashes64(text[, n]) - distinct 64-bit hashes of word n-grams (default n=3)."),
      (args: Seq[Expression]) => args match {
        case Seq(c)    => WordNgramHashes64Expr(c, 3)
        case Seq(c, n) => WordNgramHashes64Expr(c,
          intLit(n, "graft_word_ngram_hashes64", "n"))
        case as        => arity("graft_word_ngram_hashes64", as.size, "1 or 2")
      }),
    (FunctionIdentifier("graft_word_ngram_hash_seq"),
      desc("graft_word_ngram_hash_seq", classOf[WordNgramHashSeqExpr],
        "graft_word_ngram_hash_seq(text, n) - positional (all-occurrence) 64-bit hashes of word n-grams."),
      (args: Seq[Expression]) => args match {
        case Seq(c, n) => WordNgramHashSeqExpr(c,
          intLit(n, "graft_word_ngram_hash_seq", "n"))
        case as        => arity("graft_word_ngram_hash_seq", as.size, "2")
      }),
    (FunctionIdentifier("graft_word_ngrams"),
      desc("graft_word_ngrams", classOf[WordNgramsExpr],
        "graft_word_ngrams(text, n[, lowercase]) - positional (all-occurrence) word n-grams as strings (default lowercase=true)."),
      (args: Seq[Expression]) => args match {
        case Seq(c, n) => WordNgramsExpr(c,
          intLit(n, "graft_word_ngrams", "n"), lowercase = true)
        case Seq(c, n, lc) => WordNgramsExpr(c,
          intLit(n, "graft_word_ngrams", "n"),
          boolLit(lc, "graft_word_ngrams", "lowercase"))
        case as        => arity("graft_word_ngrams", as.size, "2 or 3")
      }),
    (FunctionIdentifier("graft_ngram_max_count"),
      desc("graft_ngram_max_count", classOf[NgramMaxCountExpr],
        "graft_ngram_max_count(text[, n]) - max occurrence count of any word n-gram (repetition signal; default n=2)."),
      (args: Seq[Expression]) => args match {
        case Seq(c)    => NgramMaxCountExpr(c, 2)
        case Seq(c, n) => NgramMaxCountExpr(c,
          intLit(n, "graft_ngram_max_count", "n"))
        case as        => arity("graft_ngram_max_count", as.size, "1 or 2")
      }),
    (FunctionIdentifier("graft_text_stats"),
      desc("graft_text_stats", classOf[TextStatsExpr],
        "graft_text_stats(text) - [n_chars, n_alpha, n_punct, n_toks, n_bpe, en_hits, de_hits, fr_hits] in one native pass (fixed en/de/fr stopword inventories)."),
      (args: Seq[Expression]) => args match {
        case Seq(c) => TextStatsExpr(c,
          graft.functions.TextFunctions.EnStop,
          graft.functions.TextFunctions.DeStop,
          graft.functions.TextFunctions.FrStop)
        case as     => arity("graft_text_stats", as.size, "1")
      }),
    (FunctionIdentifier("graft_term_freqs"),
      desc("graft_term_freqs", classOf[TermFreqsExpr],
        "graft_term_freqs(text, term, ...) - [n_tokens, count(term_1), ...] in one tokenize pass (BM25 per-row stats)."),
      (args: Seq[Expression]) => args match {
        case c +: ts if ts.nonEmpty => TermFreqsExpr(c,
          ts.map(strLit(_, "graft_term_freqs", "term")))
        case as => arity("graft_term_freqs", as.size, "2 or more")
      }))

  /** Register every graft function on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions` entry point (must be a zero-arg class). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}
