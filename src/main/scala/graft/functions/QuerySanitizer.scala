package graft.functions

/** Search-string sanitization — the hostile-user-query boundary in front
  * of the search surface (q17 contains-search, q46 BM25).
  *
  * The reference sanitizes at two layers:
  *  - repository/SolrDocumentRepository.java:447-451 backslash-escapes
  *    the Solr specials `\ + - ! ( ) { } [ ] ^ " ~ * ? : /` so terms
  *    reach the query parser literally ([[escapeValue]]);
  *  - controller/CrawlerController.java:248-251 wraps the whole user
  *    query in double quotes with inner-quote escaping ([[quoteValue]]).
  *
  * Our engine-side consumers (`Column.contains`, the TermFreqs kernel)
  * are LITERAL — there is no query parser to protect — so the boundary
  * inverts those transport encodings instead: [[searchTerms]] accepts a
  * raw (possibly reference-escaped, possibly hostile) query string and
  * recovers clean literal terms, killing the classes that do hurt a
  * literal engine: null/empty/whitespace-only queries, empty terms
  * (`contains("")` matches EVERYTHING), unbounded term lists, duplicate
  * terms (double-counted BM25 contributions).
  */
object QuerySanitizer {

  /** The reference's Solr special set (SolrDocumentRepository.java:449). */
  private val Specials = "\\+-!(){}[]^\"~*?:/".toSet

  /** Reference parity: backslash-escape every Solr special; null → "". */
  def escapeValue(value: String): String =
    if (value == null) ""
    else value.flatMap(c => if (Specials(c)) s"\\$c" else c.toString)

  /** Reference parity: quote the whole query, escaping inner quotes;
    * null → the empty quoted string (CrawlerController.java:248-251). */
  def quoteValue(value: String): String =
    if (value == null) "\"\""
    else "\"" + value.replace("\"", "\\\"") + "\""

  /** Hostile query string → clean literal search terms: lowercase,
    * whitespace-tokenize, strip wrapping quotes and undo
    * [[escapeValue]]-style backslash escapes (both are transport
    * artifacts — the literal engine wants the bare term), drop empties,
    * dedup keeping first occurrence, cap at `maxTerms`. Inverse of the
    * two reference encoders, so `searchTerms(quoteValue(escapeValue(q)))`
    * recovers q's terms. */
  def searchTerms(raw: String, maxTerms: Int = 8): Seq[String] = {
    if (raw == null) return Nil
    raw.toLowerCase
      .split("\\s+").iterator
      .map { tok0 =>
        var t = tok0
        // wrapping quotes — stripped per SIDE: the controller quotes the
        // whole phrase, so after whitespace tokenization the first/last
        // tokens carry unbalanced quotes; a backslash-escaped quote (a
        // literal in the user's query) is kept for the unescape below
        var a = 0
        while (a < t.length && t.charAt(a) == '"') a += 1
        var b = t.length
        // the closing quote is REAL (a controller wrapper, strip it) iff
        // the run of backslashes before it has even length — an odd run
        // means the quote itself is escaped (a user literal, keep it).
        // Checking only one previous char broke the inverse property for
        // terms ending in an escaped backslash: escapeValue("foo\\") puts
        // `"foo\\"` on the wire, whose closing quote follows TWO
        // backslashes (an escaped backslash, not an escaped quote).
        def closingQuoteAt(pos: Int): Boolean = {
          if (pos <= a || t.charAt(pos - 1) != '"') return false
          var k = pos - 2
          while (k >= a && t.charAt(k) == '\\') k -= 1
          (pos - 2 - k) % 2 == 0
        }
        while (closingQuoteAt(b)) b -= 1
        t = t.substring(a, b)
        // backslash-escapes: \x → x (a trailing lone backslash drops)
        val sb = new StringBuilder(t.length)
        var i = 0
        while (i < t.length) {
          if (t.charAt(i) == '\\' && i + 1 < t.length) { sb += t.charAt(i + 1); i += 2 }
          else if (t.charAt(i) == '\\') i += 1
          else { sb += t.charAt(i); i += 1 }
        }
        sb.result()
      }
      .filter(_.nonEmpty)
      .distinct.take(maxTerms).toSeq
  }
}
