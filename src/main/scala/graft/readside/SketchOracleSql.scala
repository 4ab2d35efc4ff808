package graft.readside

/** Generator for q77's DuckDB oracle: the count-min sketch rebuilt
  * RELATIONALLY at vocabulary grain — per-token FNV-1a hashes (the q72
  * character fold, ≡ the engine's byte fold on ASCII), the validated
  * two-argument xxhash64 chain (hash(h) with seed 42, then hash(r) with
  * that running hash as seed — the `ShuffleOracleSql` q62 machinery) for
  * the d row hashes, bucket = low-10-bits (2⁶⁴ ≡ 0 mod w, so unsigned
  * HUGEINT mod ≡ Spark's signed pmod), SUM of vocabulary counts per
  * (row, bucket) cell, and MIN over the d cells per probe token. The
  * exact side groups by HASH (the engine counts occurrences of h, so two
  * FNV-colliding tokens would share a combined count on both sides). */
private object SketchOracleSql {
  import XxhSqlOps._

  val q77Sql: String = {
    val fnvOffset = BigInt("CBF29CE484222325", 16)
    val fnvPrime = BigInt("100000001B3", 16)
    val fold = mul64(xor64("h", "b"), fnvPrime)
    // chain A: hl = xxh64(h, seed 42); chain B: hr = xxh64(r, seed hl)
    val (cA, lastA) = chain("rows0", Seq("tok", "cnt", "h", "rh"),
      hashLongStages("h", "42", "hl", "a"), "ca")
    val (cB, lastB) = chain(lastA, Seq("tok", "cnt", "h", "rh", "hl"),
      hashLongStages("rh", "hl", "hr", "b"), "cb")
    s"""
      WITH toks AS (
        SELECT doc_id,
               CASE WHEN text IS NULL
                         OR trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) = ''
                    THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(
                           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
               END AS t
        FROM documents),
      g AS (SELECT unnest(t) AS tok FROM toks),
      vc AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY tok),
      hv AS (
        SELECT tok, cnt,
               list_reduce(
                 list_prepend(CAST($fnvOffset AS HUGEINT),
                   list_transform(range(1, length(tok) + 1),
                     i -> CAST(ord(substr(tok, i, 1)) AS HUGEINT))),
                 (h, b) -> $fold) AS h
        FROM vc),
      rows0 AS (SELECT tok, cnt, h, CAST(unnest([0, 1, 2, 3]) AS HUGEINT) AS rh
                FROM hv),
      $cA,
      $cB,
      bkt AS (SELECT tok, cnt, h, rh, (hr % 1024) AS bk FROM $lastB),
      sk AS (SELECT rh, bk, CAST(sum(cnt) AS BIGINT) AS cell
             FROM bkt GROUP BY rh, bk),
      hcnt AS (SELECT h, CAST(sum(cnt) AS BIGINT) AS exact_n
               FROM hv GROUP BY h),
      ptok AS (
        SELECT DISTINCT unnest(t) AS tok
        FROM toks WHERE doc_id % 17 = 0),
      est AS (
        SELECT p.tok, min(s.cell) AS est_n
        FROM ptok p
        JOIN bkt k ON k.tok = p.tok
        JOIN sk s ON s.rh = k.rh AND s.bk = k.bk
        GROUP BY p.tok),
      ex AS (
        SELECT p.tok, c.exact_n
        FROM ptok p
        JOIN hv v ON v.tok = p.tok
        JOIN hcnt c ON c.h = v.h)
      SELECT e.tok, x.exact_n, e.est_n
      FROM est e JOIN ex x ON x.tok = e.tok
      ORDER BY e.tok"""
  }
}
