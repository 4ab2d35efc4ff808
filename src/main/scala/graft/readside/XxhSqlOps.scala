package graft.readside

/** The ONE copy of the HUGEINT 64-bit-arithmetic SQL generators every
  * oracle file needs: unsigned-mod-2⁶⁴ multiply (32-bit-limb trick),
  * xor/rotl/add/shift, the one-CTE-per-stage `chain` builder, and the
  * Spark-exact XXH64-of-one-8-byte-value stage list (seed either the
  * constant 42 or a carried running-hash column — Spark's multi-argument
  * `xxhash64` folds values left-to-right with the running hash as seed).
  * Validated bit-exact against Spark 4.1.2 by every value-gated oracle
  * that hashes (q27/q30/q51/q58/q59/q62/q68/q71/q77/q79…); previously
  * duplicated per oracle file, now shared so a fix lands once. */
private[readside] object XxhSqlOps {
  val M64s = "18446744073709551616::HUGEINT"
  val M32 = BigInt(1) << 32
  val M64 = BigInt(1) << 64
  val P1 = BigInt("9E3779B185EBCA87", 16)
  val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  val P3 = BigInt("165667B19E3779F9", 16)
  val P4 = BigInt("85EBCA77C2B2AE63", 16)
  val P5 = BigInt("27D4EB2F165667C5", 16)

  /** a·b mod 2⁶⁴ with a a HUGEINT SQL expression, b a constant. */
  def mul64(a: String, b: BigInt): String = {
    val bl = b % M32; val bh = b / M32
    s"((($a) % 4294967296 * $bl + " +
      s"((($a) % 4294967296 * $bh + ($a) // 4294967296 * $bl) % 4294967296) * 4294967296) % $M64s)"
  }
  def xor64(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"
  def rotl(a: String, n: Int): String =
    s"((($a) * ${BigInt(1) << n} % $M64s) + (($a) // ${BigInt(1) << (64 - n)}))"
  def addc(a: String, c: BigInt): String =
    s"((($a) + ${c % M64}) % $M64s)"
  def shr(col: String, n: Int): String = s"(($col) // ${BigInt(1) << n})"

  /** One CTE per hash stage, constant expression size (q27 discipline):
    * each (name, expr) pair becomes `<prefix><i> AS (SELECT <cols so
    * far>, expr AS name FROM <previous>)`. Returns (joined CTE text,
    * last CTE name). */
  def chain(base: String, baseCols: Seq[String],
      stages: Seq[(String, String)], prefix: String): (String, String) = {
    var prev = base
    val cols = scala.collection.mutable.ArrayBuffer(baseCols: _*)
    val ctes = stages.zipWithIndex.map { case ((name, expr), i) =>
      val cte = s"$prefix$i"
      val out = s"$cte AS (SELECT ${cols.mkString(", ")}, $expr AS $name FROM $prev)"
      prev = cte; cols += name
      out
    }
    (ctes.mkString(",\n      "), prev)
  }

  /** XXH64 of one 8-byte value in column `in`, with the seed given as an
    * SQL expression (the constant "42" for the first value of a Spark
    * `xxhash64` call, the carried running-hash column for later ones);
    * emits the result as column `out`. Intermediate stage names carry
    * `tag` so two chains can coexist in one query. */
  def hashLongStages(in: String, seedExpr: String, out: String,
      tag: String): Seq[(String, String)] = Seq(
    s"b$tag" -> addc(seedExpr, P5 + 8),
    s"t1$tag" -> mul64(in, P2),
    s"t2$tag" -> rotl(s"t1$tag", 31),
    s"t3$tag" -> mul64(s"t2$tag", P1),
    s"t4$tag" -> xor64(s"b$tag", s"t3$tag"),
    s"t5$tag" -> rotl(s"t4$tag", 27),
    s"t6$tag" -> addc(mul64(s"t5$tag", P1), P4),
    s"u1$tag" -> xor64(s"t6$tag", shr(s"t6$tag", 33)),
    s"u2$tag" -> mul64(s"u1$tag", P2),
    s"u3$tag" -> xor64(s"u2$tag", shr(s"u2$tag", 29)),
    s"u4$tag" -> mul64(s"u3$tag", P3),
    out -> xor64(s"u4$tag", shr(s"u4$tag", 32)))
}
