package graft

import graft.functions.QuerySanitizer
import graft.readside.Queries

/** Search-string sanitization (reference
  * SolrDocumentRepository.java:447-451 escape,
  * CrawlerController.java:248-251 quote): adversarial inputs against the
  * boundary, reference-parity of the two encoders, and the contract that
  * clean inputs leave q17/q46 byte-identical to the fixed-term forms. */
class SanitizerSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("escapeValue matches the reference's Solr special escaping") {
    // the exact regex class from SolrDocumentRepository.java:449
    val ref = "([\\\\+\\-!\\(\\){}\\[\\]^\"~*?:/])".r
    for (v <- Seq("a+b-c", "x:(y)*z?", "{[\"~]}", "plain", "back\\slash", "a/b")) {
      val expect = ref.replaceAllIn(v, m => "\\\\" + java.util.regex.Matcher.quoteReplacement(m.group(1)))
      assert(QuerySanitizer.escapeValue(v) == expect, s"'$v'")
    }
    assert(QuerySanitizer.escapeValue(null) == "")
  }

  test("quoteValue matches the reference's controller quoting") {
    assert(QuerySanitizer.quoteValue(null) == "\"\"")
    assert(QuerySanitizer.quoteValue("abc") == "\"abc\"")
    assert(QuerySanitizer.quoteValue("say \"hi\"") == "\"say \\\"hi\\\"\"")
  }

  test("searchTerms kills the hostile classes: null/blank/empty terms/dups/overlong") {
    assert(QuerySanitizer.searchTerms(null) == Nil)
    assert(QuerySanitizer.searchTerms("") == Nil)
    assert(QuerySanitizer.searchTerms("   \t\n  ") == Nil)
    // empty-after-unquote tokens never become contains("") wildcards
    assert(QuerySanitizer.searchTerms("\"\" spark \"\"") == Seq("spark"))
    assert(QuerySanitizer.searchTerms("SPARK Spark spark") == Seq("spark"))
    assert(QuerySanitizer.searchTerms((1 to 50).map(i => s"t$i").mkString(" ")).size == 8)
    // a lone backslash token drops; escapes recover the literal term
    assert(QuerySanitizer.searchTerms("\\ spa\\+rk") == Seq("spa+rk"))
  }

  test("searchTerms inverts the reference encoders (escape then quote round-trips)") {
    val q = "Spark JOIN"
    val wire = QuerySanitizer.quoteValue(QuerySanitizer.escapeValue(q))
    assert(QuerySanitizer.searchTerms(wire) == Seq("spark", "join"))
    // hostile composite: quoted phrase + specials + noise
    assert(QuerySanitizer.searchTerms("  \"spark\"   j\\*oin   +  ") ==
      Seq("spark", "j*oin", "+"))
    // terms ENDING in an escaped backslash: the wire form `"foo\\"` ends
    // in backslash-backslash-quote — an EVEN backslash run, so the quote
    // is the controller's wrapper and must strip, recovering foo\ (the
    // single-char lookbehind misread it as an escaped quote → foo")
    val bs = QuerySanitizer.quoteValue(QuerySanitizer.escapeValue("foo\\"))
    assert(QuerySanitizer.searchTerms(bs) == Seq("foo\\"))
    // and an ODD run (escaped quote literal) still keeps the quote
    assert(QuerySanitizer.searchTerms("bar\\\"") == Seq("bar\""))
  }

  test("q17: sanitized hostile spelling of the clean query returns identical rows") {
    val clean = Queries.q17Search(spark, dir).collect().toSeq
    val hostile = Queries.q17SearchFor(spark, dir, "  \"SPARK\"  \"\" jo\\in  spark ")
      .collect().toSeq
    assert(hostile == clean)
    // no searchable terms → zero rows, never contains("")-match-all
    assert(Queries.q17SearchFor(spark, dir, " \"\"  \\ ").count() == 0)
  }

  test("q46: sanitized hostile spelling of the clean query returns identical rows") {
    val clean = Queries.q46Bm25Search(spark, dir).collect().toSeq
    val hostile = Queries.q46Bm25SearchFor(spark, dir,
      "\"spark\" WINDOW window vec\\tor").collect().toSeq
    assert(hostile == clean)
    intercept[IllegalArgumentException] {
      Queries.q46Bm25SearchFor(spark, dir, "  \"\" ")
    }
  }
}
