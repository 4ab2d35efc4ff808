package graft.expressions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernels referenced from generated (whole-stage codegen) Java as
  * `graft.expressions.ExprOps$.MODULE$.<fn>(...)`. Pure, allocation-light,
  * deterministic — safe at any parallelism.
  */
object ExprOps {

  /** FNV-1a 64-bit over UTF-8 bytes — the per-token hash for simhash. */
  def fnv64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash over whitespace tokens of `text`.
    * Each token hashed with FNV-64; per-bit vote; sign → bit.
    * Empty/blank text → 0L. */
  def simhash64(text: UTF8String): Long = {
    val bytes = text.getBytes
    val votes = new Array[Int](64)
    var i = 0
    val n = bytes.length
    var any = false
    while (i < n) {
      // skip whitespace
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        any = true
        val h = fnv64(bytes, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    if (!any) return 0L
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r' || b == '\f' || b == 0x0b

  /** Power-of-2 open-addressing capacity for `n` entries at ≤0.5 load.
    * Computed in Long: `n * 2` overflows Int for n > 2^30 (a ~2 GB
    * single-char-token document is within UTF8String's limit), which
    * left cap at 4 and spun the probe loop forever. Clamped at 2^30
    * slots — beyond that the 8 GB table allocation fails loudly
    * (OutOfMemoryError) instead of looping. */
  @inline private def tableCap(n: Int): Int = {
    val need = math.min(n.toLong * 2, 1L << 30)
    var cap = 4L
    while (cap < need) cap <<= 1
    cap.toInt
  }

  /** Loud failure when an open-addressing table saturates: at the 2^30
    * clamp with > 2^30 DISTINCT entries the linear-probe insert loop
    * would otherwise spin forever once load factor hits 1.0 — and on a
    * 30 GB+ heap the 8 GB allocation succeeds, so the allocation failure
    * the clamp comment used to rely on never fires. Checked after every
    * NEW insert, so the throw is guaranteed regardless of heap size. */
  @inline private def checkTableFull(cnt: Int, cap: Int): Unit =
    if (cnt >= cap)
      throw new IllegalStateException(
        s"open-addressing table saturated: $cnt distinct entries at capacity $cap " +
          "(input has more distinct windows/grams than the 2^30-slot clamp)")

  /** Document fingerprint: minimum of Rabin-Karp rolling hashes over all
    * `k`-byte windows (winnowing with a single global window — a compact,
    * shift-tolerant content fingerprint). Text shorter than k hashes whole. */
  def rollingFingerprint(text: UTF8String, k: Int): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val kk = if (n < k) n else k
    val B = 1000000007L
    // precompute B^(kk-1)
    var pow = 1L
    var j = 1
    while (j < kk) { pow *= B; j += 1 }
    var h = 0L
    var i = 0
    while (i < kk) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    var min = mix(h)
    i = kk
    while (i < n) {
      h = (h - (bytes(i - kk) & 0xffL) * pow) * B + (bytes(i) & 0xffL)
      val m = mix(h)
      if (java.lang.Long.compareUnsigned(m, min) < 0) min = m
      i += 1
    }
    min
  }

  /** xorshift-style finalizer so rolling-hash structure doesn't leak. */
  @inline def mix(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Distinct 64-bit FNV hashes of the k-BYTE shingles of the normalized
    * text (lowercased, ASCII whitespace runs collapsed to one space) —
    * the hashed form of `SimilarityFunctions.charShingles`: shingle
    * EQUALITY is all MinHash/Jaccard ever needs, and 8-byte hashes ship
    * through the explode/shuffle instead of k-char strings (collisions
    * at 64 bits are nil at any corpus size). Shorter-than-k text hashes
    * whole; output order = first occurrence (deterministic). */
  def shingleHashes(text: UTF8String, k: Int): ArrayData = {
    val lower = text.toLowerCase.getBytes
    val buf = new Array[Byte](lower.length)
    var m = 0
    var i = 0
    var inWs = false
    while (i < lower.length) {
      val b = lower(i)
      if (isWs(b)) {
        if (!inWs) { buf(m) = ' '; m += 1 }
        inWs = true
      } else { buf(m) = b; m += 1; inWs = false }
      i += 1
    }
    if (m < k)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array(fnv64(buf, 0, m)))
    val nWin = m - k + 1
    val cap = tableCap(nWin)
    val table = new Array[Long](cap) // open addressing; 0 = empty slot
    val out = new Array[Long](nWin)
    var cnt = 0
    i = 0
    while (i < nWin) {
      var h = fnv64(buf, i, i + k)
      if (h == 0L) h = 1L
      var idx = (mix(h) & (cap - 1)).toInt
      var seen = false
      while (!seen && table(idx) != 0L) {
        if (table(idx) == h) seen = true
        else idx = (idx + 1) & (cap - 1)
      }
      if (!seen) { table(idx) = h; out(cnt) = h; cnt += 1; checkTableFull(cnt, cap) }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, cnt))
  }

  /** Distinct 64-bit FNV hashes of the word n-grams of the normalized
    * text (lowercased, ASCII whitespace runs collapsed to single spaces) —
    * the hashed form of `SimilarityFunctions.wordNgrams`: each hash
    * covers the byte span of n consecutive tokens INCLUDING the single
    * separating spaces, which equals hashing the `concat_ws(" ", ...)`
    * string form. Fewer than n tokens → whole text hashes as one gram.
    * Output order = first occurrence. */
  def wordNgramHashes(text: UTF8String, n: Int): ArrayData = {
    val lower = text.toLowerCase.getBytes
    // normalize: collapse ws runs to ' ', drop leading/trailing ws
    val buf = new Array[Byte](lower.length)
    var m = 0
    var i = 0
    var inWs = true // leading ws dropped
    while (i < lower.length) {
      val b = lower(i)
      if (isWs(b)) { if (!inWs && m > 0) { buf(m) = ' '; m += 1 }; inWs = true }
      else { buf(m) = b; m += 1; inWs = false }
      i += 1
    }
    if (m > 0 && buf(m - 1) == ' ') m -= 1 // trailing collapsed ws
    // token start offsets
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    i = 0
    while (i < m) { if (buf(i) == ' ') starts += i + 1; i += 1 }
    val nTok = if (m == 0) 0 else starts.length
    if (nTok < n)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array(fnv64(buf, 0, m)))
    val nGrams = nTok - n + 1
    val cap = tableCap(nGrams)
    val table = new Array[Long](cap)
    val out = new Array[Long](nGrams)
    var cnt = 0
    i = 0
    while (i < nGrams) {
      val from = starts(i)
      val until = if (i + n < nTok) starts(i + n) - 1 else m // excl. trailing space
      var h = fnv64(buf, from, until)
      if (h == 0L) h = 1L
      var idx = (mix(h) & (cap - 1)).toInt
      var seen = false
      while (!seen && table(idx) != 0L) {
        if (table(idx) == h) seen = true
        else idx = (idx + 1) & (cap - 1)
      }
      if (!seen) { table(idx) = h; out(cnt) = h; cnt += 1; checkTableFull(cnt, cap) }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, cnt))
  }

  /** ALL word n-gram hashes of the normalized text in POSITIONAL order
    * (index i = the gram starting at token i) — the positional sibling of
    * [[wordNgramHashes]]: same normalization, same byte spans (n tokens
    * including single separating spaces), same FNV-1a, but occurrences are
    * KEPT (duplicates not collapsed) so `posexplode` recovers (position,
    * gram) pairs. Fewer than n tokens (or empty text) → EMPTY array: a
    * doc too short to hold one window contributes no spans to
    * substring-duplication analysis (q65); whole-short-doc identity is
    * exact dedup's job (q24).
    *
    * Shared caveat (ADVICE r05): [[wordNgramHashes]]/[[shingleHashes]]
    * remap an FNV hash of exactly 0 to 1 (0 is their open-addressing
    * empty-slot sentinel); this positional form and the DuckDB FNV
    * `list_reduce` oracles (q72/q77) do NOT. A token whose FNV-64 hash is
    * exactly 0 would therefore diverge between the two families — the
    * same astronomically-unlikely single-point event class as the
    * documented q24 192-bit collision argument (P[h=0] = 2⁻⁶⁴ per
    * distinct gram). Kept asymmetric deliberately: the remap cannot be
    * added here or to the oracle SQL without changing frozen oracle
    * results, and removing it from the distinct-form would break its
    * sentinel. */
  def wordNgramHashSeq(text: UTF8String, n: Int): ArrayData = {
    val lower = text.toLowerCase.getBytes
    val buf = new Array[Byte](lower.length)
    var m = 0
    var i = 0
    var inWs = true // leading ws dropped
    while (i < lower.length) {
      val b = lower(i)
      if (isWs(b)) { if (!inWs && m > 0) { buf(m) = ' '; m += 1 }; inWs = true }
      else { buf(m) = b; m += 1; inWs = false }
      i += 1
    }
    if (m > 0 && buf(m - 1) == ' ') m -= 1 // trailing collapsed ws
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    i = 0
    while (i < m) { if (buf(i) == ' ') starts += i + 1; i += 1 }
    val nTok = if (m == 0) 0 else starts.length
    if (nTok < n)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val nGrams = nTok - n + 1
    val out = new Array[Long](nGrams)
    i = 0
    while (i < nGrams) {
      val from = starts(i)
      val until = if (i + n < nTok) starts(i + n) - 1 else m
      out(i) = fnv64(buf, from, until)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** All word n-grams of the normalized text as STRINGS in positional
    * order — the string-valued sibling of [[wordNgramHashSeq]]: identical
    * normalization (ASCII-\s runs collapsed to one 0x20, leading/trailing
    * runs dropped, `lowercase` via UTF8String.toLowerCase — the same
    * lowering Spark's `lower()` performs) and identical byte spans
    * (n tokens incl. single separating spaces), occurrences KEPT.
    * Emits row-for-row what the declarative chain
    * `explode(filter(split(trim(regexp_replace([lower(]text[)], "\\s+",
    * " ")), " "), x -> x != ""))` (n = 1) / its zip_with-sliced n-gram
    * build (n > 1) emits: Java's `\s` is exactly the 6 ASCII bytes
    * [[isWs]] tests, those bytes never occur inside a multi-byte UTF-8
    * sequence (continuation bytes are ≥ 0x80), and no Unicode lowering
    * maps a non-whitespace char onto ASCII whitespace — so byte-level
    * scanning of the lowered text is exact, with zero regex/String
    * churn and no interpreted higher-order functions (the measured
    * per-row cost of the q56/q66/q74-class text operators, r06).
    * Fewer than n tokens (or empty text) → EMPTY array (the
    * [[wordNgramHashSeq]] convention). NULL text → NULL via the
    * expression's null-safety: adoption sites that relied on
    * `normToks`'s null→[] coercion must coalesce explicitly. */
  def wordNgrams(text: UTF8String, n: Int, lowercase: Boolean): ArrayData = {
    val src = (if (lowercase) text.toLowerCase else text).getBytes
    val buf = new Array[Byte](src.length)
    var m = 0
    var i = 0
    var inWs = true // leading ws dropped
    while (i < src.length) {
      val b = src(i)
      if (isWs(b)) { if (!inWs && m > 0) { buf(m) = ' '; m += 1 }; inWs = true }
      else { buf(m) = b; m += 1; inWs = false }
      i += 1
    }
    if (m > 0 && buf(m - 1) == ' ') m -= 1 // trailing collapsed ws
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    i = 0
    while (i < m) { if (buf(i) == ' ') starts += i + 1; i += 1 }
    val nTok = if (m == 0) 0 else starts.length
    if (nTok < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val nGrams = nTok - n + 1
    val out = new Array[Any](nGrams)
    i = 0
    while (i < nGrams) {
      val from = starts(i)
      val until = if (i + n < nTok) starts(i + n) - 1 else m
      // fromBytes shares `buf` (no copy); buf is never mutated after this
      out(i) = UTF8String.fromBytes(buf, from, until - from)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Max occurrence count of any word n-gram in the normalized text
    * (same tokenization as [[wordNgramHashes]]) — the Gopher/C4-style
    * repetition signal: a doc whose most common 2-gram covers a large
    * fraction of it is boilerplate/spam. Counts OCCURRENCES (not the
    * distinct set); fewer than n tokens → the whole text is one gram,
    * count 1. Collisions of the 64-bit gram hash could only ever
    * overcount, and at 64 bits are nil at any document length. */
  def ngramMaxCount(text: UTF8String, n: Int): Long = {
    val lower = text.toLowerCase.getBytes
    val buf = new Array[Byte](lower.length)
    var m = 0
    var i = 0
    var inWs = true // leading ws dropped
    while (i < lower.length) {
      val b = lower(i)
      if (isWs(b)) { if (!inWs && m > 0) { buf(m) = ' '; m += 1 }; inWs = true }
      else { buf(m) = b; m += 1; inWs = false }
      i += 1
    }
    if (m > 0 && buf(m - 1) == ' ') m -= 1
    val starts = scala.collection.mutable.ArrayBuffer[Int](0)
    i = 0
    while (i < m) { if (buf(i) == ' ') starts += i + 1; i += 1 }
    val nTok = if (m == 0) 0 else starts.length
    if (nTok < n) return 1L
    val nGrams = nTok - n + 1
    val cap = tableCap(nGrams)
    val table = new Array[Long](cap) // open addressing; 0 = empty slot
    val counts = new Array[Long](cap)
    var filled = 0
    var best = 0L
    i = 0
    while (i < nGrams) {
      val from = starts(i)
      val until = if (i + n < nTok) starts(i + n) - 1 else m
      var h = fnv64(buf, from, until)
      if (h == 0L) h = 1L
      var idx = (mix(h) & (cap - 1)).toInt
      while (table(idx) != 0L && table(idx) != h) idx = (idx + 1) & (cap - 1)
      if (table(idx) == 0L) { filled += 1; checkTableFull(filled, cap) }
      table(idx) = h
      counts(idx) += 1L
      if (counts(idx) > best) best = counts(idx)
      i += 1
    }
    best
  }

  /** Decode the UTF-8 code point whose LEAD byte is at `i` (malformed /
    * truncated sequences yield U+FFFD, which is not a letter/digit —
    * boundary-neutral, matching the replacement the JVM decoder would
    * produce). */
  private def codePointAt(bytes: Array[Byte], i: Int): Int = {
    val b0 = bytes(i) & 0xff
    if (b0 < 0x80) b0
    else if ((b0 & 0xe0) == 0xc0 && i + 1 < bytes.length)
      ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f)
    else if ((b0 & 0xf0) == 0xe0 && i + 2 < bytes.length)
      ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
    else if ((b0 & 0xf8) == 0xf0 && i + 3 < bytes.length)
      ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
        ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
    else 0xFFFD
  }

  /** Java-regex `\b` word-char test for the code point ENDING just
    * before byte offset `p` (walks back over continuation bytes). NOTE
    * the JDK quirk the FunctionsSpec pin nails down: `\b`'s word class
    * is `'_' || Character.isLetterOrDigit` — UNICODE letters/digits are
    * word chars — even though `\w` itself is ASCII-only without
    * UNICODE_CHARACTER_CLASS ('é' blocks a boundary; NBSP does not). */
  private def isBoundWordBefore(bytes: Array[Byte], p: Int): Boolean = {
    var s = p - 1
    while (s > 0 && (bytes(s) & 0xc0) == 0x80) s -= 1
    val cp = codePointAt(bytes, s)
    cp == '_' || Character.isLetterOrDigit(cp)
  }

  /** [[isBoundWordBefore]]'s right-side twin: the code point STARTING at
    * byte offset `q`. */
  private def isBoundWordAt(bytes: Array[Byte], q: Int): Boolean = {
    val cp = codePointAt(bytes, q)
    cp == '_' || Character.isLetterOrDigit(cp)
  }

  /** Non-overlapping count of `\b(w1|...|wk)\b` matches of the (already
    * lowercased) byte string — the Java-regex semantics of
    * `regexp_extract_all` replicated byte-for-byte: alternatives tried in
    * ORDER at each position, `\b` per the Unicode-letter word class
    * above (so multi-byte chars INSIDE a pattern literal like "für"
    * match, while "éthe" does NOT match `\bthe\b` — 'é' is a word char),
    * a match resumes the scan at its end, a failed position advances by
    * one byte (safe: every word starts with an ASCII letter, and UTF-8
    * continuation bytes can never equal one, so byte-grain advance
    * visits no extra match positions vs the engine's char-grain
    * advance). */
  private def stopScan(bytes: Array[Byte], words: Array[Array[Byte]]): Long = {
    val n = bytes.length
    var cnt = 0L
    var p = 0
    while (p < n) {
      var matched = 0
      var wi = 0
      while (matched == 0 && wi < words.length) {
        val w = words(wi)
        if (p + w.length <= n && bytes(p) == w(0)) {
          var k = 1
          while (k < w.length && bytes(p + k) == w(k)) k += 1
          if (k == w.length &&
              (p == 0 || !isBoundWordBefore(bytes, p)) &&
              (p + k == n || !isBoundWordAt(bytes, p + k)))
            matched = w.length
        }
        wi += 1
      }
      if (matched > 0) { cnt += 1; p += matched } else p += 1
    }
    cnt
  }

  /** One fused pass over the text computing every per-row count the
    * TextFunctions quality/langid family needs, as
    * `[n_chars, n_alpha, n_punct, n_toks, n_bpe, en_hits, de_hits,
    * fr_hits]` — the codegen replacement for ~9 regex traversals per row
    * (3× `\b(...)\b` stopword scans ×2 call sites via codegen CSE, 2
    * char-class regexp_replace length probes, one `\s+` split, one
    * 3-alternative regexp_extract_all). Each count replicates the exact
    * built-in semantics it replaces:
    *  - n_chars = length(text): code points (count of non-continuation
    *    bytes — Spark's UTF8String.numChars);
    *  - n_alpha / n_punct = length(regexp_replace(text, "[^A-Za-z]" /
    *    "[^.,;:!?|#@*]", "")): ASCII-class member counts (single-byte,
    *    never inside a UTF-8 sequence);
    *  - n_toks = size(split(trim(text), "\\s+")) with blank→0: trim
    *    strips 0x20 ONLY; Java split with limit -1 keeps leading AND
    *    trailing empty segments, so the count is (whitespace runs
    *    within the space-trimmed span) + 1, and 0 when that span is
    *    empty (the declarative form's `when` wrapper);
    *  - n_bpe = size(regexp_extract_all(text,
    *    "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]", 0)): letter runs count 1,
    *    each digit 1, each non-alnum non-\s CODE POINT 1 (Java regex
    *    classes match by code point — a 4-byte emoji is one token);
    *  - en/de/fr = [[stopScan]] over toLowerCase(text) (the same
    *    lowering `lower()` performs).
    * Null-safety is the expression's (null text → null array). */
  def textStats(text: UTF8String, en: Array[Array[Byte]],
      de: Array[Array[Byte]], fr: Array[Array[Byte]]): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    var chars = 0L; var alpha = 0L; var punct = 0L
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b & 0xc0) != 0x80) chars += 1
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha += 1
      else if (b == '.' || b == ',' || b == ';' || b == ':' || b == '!' ||
               b == '?' || b == '|' || b == '#' || b == '@' || b == '*') punct += 1
      i += 1
    }
    // n_toks: space-trim bounds, then whitespace-run count + 1
    var s = 0; var e = n
    while (s < n && bytes(s) == ' ') s += 1
    while (e > s && bytes(e - 1) == ' ') e -= 1
    var toks = 0L
    if (e > s) {
      var runs = 0L; var prevWs = false
      var j = s
      while (j < e) {
        val w = isWs(bytes(j))
        if (w && !prevWs) runs += 1
        prevWs = w
        j += 1
      }
      toks = runs + 1
    }
    var bpe = 0L
    i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
        bpe += 1; i += 1
        while (i < n && ((bytes(i) >= 'A' && bytes(i) <= 'Z') ||
            (bytes(i) >= 'a' && bytes(i) <= 'z'))) i += 1
      } else if (b >= '0' && b <= '9') { bpe += 1; i += 1 }
      else if (isWs(b)) i += 1
      else if ((b & 0x80) == 0) { bpe += 1; i += 1 }
      else { bpe += 1; i += UTF8String.numBytesForFirstByte(b) }
    }
    val low = text.toLowerCase.getBytes
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      Array(chars, alpha, punct, toks, bpe,
        stopScan(low, en), stopScan(low, de), stopScan(low, fr)))
  }

  /** One-pass whitespace tokenize + multi-term frequency count over the
    * LOWERCASED text: returns `[n_tokens, count(term_0), …, count(term_k)]`
    * as longs. A token is a maximal non-whitespace run; term match is byte
    * equality against the (pre-lowercased) term bytes. Semantically equal
    * to `size(array_remove(split(norm, " "), ""))` plus one
    * `size − size(array_remove(…, term))` per term, but ONE traversal of
    * the text instead of 1 + k array materializations/scans — the BM25
    * per-row hot loop. */
  def termFreqs(text: UTF8String, terms: Array[Array[Byte]]): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    val k = terms.length
    val out = new Array[Long](k + 1)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        out(0) += 1
        val len = i - start
        var t = 0
        while (t < k) {
          val tb = terms(t)
          if (tb.length == len) {
            var j = 0
            while (j < len && tb(j) == bytes(start + j)) j += 1
            if (j == len) out(t + 1) += 1
          }
          t += 1
        }
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Sign-random-projection LSH bucket for a float embedding: `nBits`
    * deterministic hash-derived hyperplanes; sign bits packed to a long.
    * plane(b, i) = centered hash of (seed, b, i) in [-0.5, 0.5). */
  /** All `tables` SRP buckets of `vec` (table t seeded `baseSeed + t`). */
  def srpBuckets(vec: ArrayData, nBits: Int, tables: Int, baseSeed: Long): ArrayData = {
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      out(t) = srpBucket(vec, nBits, baseSeed + t)
      t += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  def srpBucket(vec: ArrayData, nBits: Int, seed: Long): Long = {
    val n = vec.numElements()
    var out = 0L
    var b = 0
    while (b < nBits) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val h = mix(seed ^ (b.toLong << 32) ^ i.toLong)
        val u = java.lang.Long.remainderUnsigned(h, 1000003L).toDouble / 1000003.0 - 0.5
        proj += vec.getFloat(i).toDouble * u
        i += 1
      }
      if (proj > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Cosine similarity between two float arrays, accumulated in double.
    * Null-element-free arrays assumed (our embedding columns). Length
    * mismatch → uses common prefix; zero norm → 0.0. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Argmin centroid id by integer squared L2 distance — the q79 Lloyd
    * assignment hot loop as straight compiled long arithmetic. Exactly
    * replicates the declarative
    * `array_min(transform(cands, c -> struct(Σ(q−c)², cid))).cid` form it
    * replaces (r06, guide §4 — the nested higher-order functions fall out
    * of whole-stage codegen and were the measured per-row cost): distance
    * folded over the common prefix of q and the centroid (zip_with
    * semantics at equal dims), ties on distance break to the SMALLER cid
    * (struct ordering). Same 2⁶³ wraparound semantics as Spark's long
    * multiply — identical on any input, not just the quantized fixture. */
  def intL2ArgMin(q: ArrayData, cids: Array[Long], vecs: Array[Array[Long]]): Long = {
    var bestD = Long.MaxValue
    var bestC = Long.MaxValue
    var j = 0
    while (j < vecs.length) {
      val v = vecs(j)
      val n = math.min(q.numElements(), v.length)
      var d = 0L
      var i = 0
      while (i < n) {
        val t = q.getLong(i) - v(i)
        d += t * t
        i += 1
      }
      val c = cids(j)
      if (d < bestD || (d == bestD && c < bestC)) { bestD = d; bestC = c }
      j += 1
    }
    bestC
  }
}
