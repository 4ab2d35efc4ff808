package graft.readside

/** Generator for q31's DuckDB oracle: replicates the engine's rolling-hash
  * document fingerprint (ExprOps.rollingFingerprint — min over all 16-byte
  * windows of the Rabin-Karp hash, murmur-finalized) BIT-FOR-BIT in staged
  * HUGEINT SQL, the `LshOracleSql` discipline.
  *
  * Exactness argument:
  *  - the engine folds RAW UTF-8 bytes; the corpus is all-ASCII (validated
  *    per scale: length(text) = octet_length(encode(text))), so
  *    `ascii(substr(s, i, 1))` IS byte i;
  *  - the fold h·B + b runs mod 2^64 where B = 1000000007 < 2^32: the
  *    HUGEINT product stays < 2^94, no limb split needed. The engine's
  *    rolling form (subtract the outgoing byte · B^(k-1), multiply, add)
  *    is algebraically the same polynomial mod 2^64 — Long wraparound is
  *    exactly mod-2^64 arithmetic, so recomputing each window's fold from
  *    scratch yields the identical 64-bit value;
  *  - the murmur finalizer (ExprOps.mix) uses the 32-bit-limb mul64;
  *  - per-doc min compares UNSIGNED (Long.compareUnsigned in the engine ⇔
  *    HUGEINT min over [0, 2^64));
  *  - texts shorter than 16 bytes hash whole (kk = LEAST(n, 16), single
  *    window); empty texts fingerprint to 0.
  */
private object FingerprintOracleSql {
  import XxhSqlOps.{mul64, xor64, shr, M64s}

  // murmur3 finalizer constants (ExprOps.mix)
  private val Pa = BigInt("FF51AFD7ED558CCD", 16)
  private val Pb = BigInt("C4CEB9FE1A85EC53", 16)
  private val B = 1000000007L
  private val K = 16

  val sql: String = {
    // 16 fold stages: h_j = (h_{j-1}·B + byte_{p+j-1}) mod 2^64, gated on
    // kk >= j so sub-16-byte texts fold only their own length
    val foldCtes = (1 to K).map { j =>
      val step = s"((h${j - 1} * $B + ascii(substr(s, p + ${j - 1}, 1))) % $M64s)"
      s"fh$j AS (SELECT doc_id, s, kk, p, " +
        s"CASE WHEN kk >= $j THEN $step ELSE h${j - 1} END AS h$j FROM fh${j - 1})"
    }
    // murmur finalizer on each window hash
    val x1 = xor64(s"h$K", shr(s"h$K", 33))
    val x2 = mul64("x1", Pa)
    val x3 = xor64("x2", shr("x2", 33))
    val x4 = mul64("x3", Pb)
    val x5 = xor64("x4", shr("x4", 33))
    s"""
      WITH d AS (
        SELECT doc_id, text AS s, octet_length(encode(text)) AS n
        FROM documents WHERE text IS NOT NULL),
      w AS (
        SELECT doc_id, s, LEAST(n, $K) AS kk,
               CAST(unnest(range(1, n - LEAST(n, $K) + 2)) AS INT) AS p
        FROM d WHERE n > 0),
      fh0 AS (SELECT doc_id, s, kk, p, 0::HUGEINT AS h0 FROM w),
      ${foldCtes.mkString(",\n      ")},
      mx1 AS (SELECT doc_id, $x1 AS x1 FROM fh$K),
      mx2 AS (SELECT doc_id, $x2 AS x2 FROM mx1),
      mx3 AS (SELECT doc_id, $x3 AS x3 FROM mx2),
      mx4 AS (SELECT doc_id, $x4 AS x4 FROM mx3),
      mx5 AS (SELECT doc_id, $x5 AS x5 FROM mx4),
      perdoc AS (
        SELECT doc_id,
               CASE WHEN min(x5) >= 9223372036854775808::HUGEINT
                    THEN CAST(min(x5) - $M64s AS BIGINT)
                    ELSE CAST(min(x5) AS BIGINT) END AS fp
        FROM mx5 GROUP BY doc_id
        UNION ALL
        SELECT doc_id, 0::BIGINT AS fp FROM d WHERE n = 0)
      SELECT fp, count(*) AS n, min(doc_id) AS keep_id
      FROM perdoc
      GROUP BY fp HAVING count(*) >= 2
      ORDER BY keep_id"""
  }
}
