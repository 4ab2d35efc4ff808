package graft.readside

/** Generators for the q62/q63 DuckDB oracles.
  *
  * q62 needs Spark's TWO-argument `xxhash64(doc_id, salt)` replicated
  * bit-for-bit: Spark folds multi-column hashes by feeding each value
  * through a full XXH64-of-8-bytes pass whose SEED is the running hash
  * (seed 42 → hash(doc_id) → that hash seeds hash(salt)). The single-value
  * stage list is identical to [[SemOracleSql]]/`LshOracleSql`'s validated
  * chain; the second pass only swaps the constant seed base
  * `(42 + P5 + 8)` for the column expression `(hl + P5 + 8) mod 2⁶⁴`.
  *
  * q63 reuses the q59 bucket chain (xxhash64(doc_id) + Spark-pmod) for the
  * history/incoming split and then states the verdict relationally over
  * `text` — exactly the grouping the engine's 192-bit fingerprint induces
  * (q24's exactness argument).
  */
private object ShuffleOracleSql {
  import XxhSqlOps._

  /** q62's oracle: xxhash64(doc_id, 7) = XXH64(7, seed = XXH64(doc_id,
    * seed = 42)), signed; Spark-pmod shard; per-shard rank by (hash,
    * doc_id). */
  val q62Sql: String = {
    // first chain over doc_id (constant seed 42), then a CTE introducing
    // the salt value, then the second chain seeded by the carried `hl`
    val (c1, last1) = chain("ids", Seq("doc_id", "h"),
      hashLongStages("h", "42", "hl", "a"), "sa")
    val (c2, last2) = chain("salted", Seq("doc_id", "hl", "h2"),
      hashLongStages("h2", "hl", "hl2", "b"), "sb")
    s"""
      WITH ids AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS h FROM documents),
      $c1,
      salted AS (SELECT doc_id, hl, CAST(7 AS HUGEINT) AS h2 FROM $last1),
      $c2,
      hsigned AS (
        SELECT doc_id,
               hl2 - CASE WHEN hl2 >= ${BigInt(1) << 63} THEN $M64s
                          ELSE 0::HUGEINT END AS hs
        FROM $last2),
      sharded AS (
        SELECT doc_id, hs, CAST(((hs % 16) + 16) % 16 AS BIGINT) AS shard
        FROM hsigned)
      SELECT doc_id, shard,
             row_number() OVER (PARTITION BY shard ORDER BY hs, doc_id) AS pos
      FROM sharded
      ORDER BY shard, pos"""
  }

  /** q63's oracle: q59 bucket chain for the history/incoming split, then
    * the verdict stated over raw text (the fingerprint-induced grouping). */
  val q63Sql: String = {
    val (c1, last1) = chain("ids", Seq("doc_id", "h"),
      hashLongStages("h", "42", "hl", "a"), "sa")
    s"""
      WITH ids AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS h FROM documents),
      $c1,
      b AS (
        SELECT doc_id,
               ((((hl - CASE WHEN hl >= ${BigInt(1) << 63} THEN $M64s
                             ELSE 0::HUGEINT END) % 100) + 100) % 100) AS bucket
        FROM $last1),
      docs AS (
        SELECT d.doc_id, d.text, b.bucket
        FROM documents d JOIN b ON b.doc_id = d.doc_id),
      hist AS (SELECT DISTINCT text FROM docs WHERE bucket < 90),
      inc AS (SELECT doc_id, text FROM docs WHERE bucket >= 90),
      frst AS (SELECT text, min(doc_id) AS first_id FROM inc GROUP BY text)
      SELECT i.doc_id,
             CASE WHEN h.text IS NOT NULL THEN 'dup_history'
                  WHEN i.doc_id > f.first_id THEN 'dup_incoming'
                  ELSE 'novel' END AS verdict
      FROM inc i
      LEFT JOIN hist h ON h.text = i.text
      JOIN frst f ON f.text = i.text
      ORDER BY i.doc_id"""
  }
}
