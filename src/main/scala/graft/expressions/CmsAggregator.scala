package graft.expressions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** CMS buffer: the d×w counter matrix, row-major (cell (r, b) at
  * r·w + b) — mutable in place, merged by elementwise addition. */
case class CmsBuf(var cells: Array[Long])

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * first-class Spark aggregate — the §2.10 mergeable-sketch family
  * member for FREQUENCY estimation (the point-query sibling of q72's
  * KMV distinct-count): d hash rows × w buckets of counters; every
  * input increments one bucket per row; a point query reads the MINIMUM
  * over its d buckets, an overestimate that is never an underestimate
  * (est ≥ exact always; E[err] ≤ stream/w per row).
  *
  * Scale shape: the classic 2-phase aggregation contract — `reduce`
  * does d array increments, `merge` adds two d·w matrices — so one
  * fixed-size matrix per partition crosses the exchange, never the
  * token stream; build cost is a map-side pass. Deterministic for the
  * fixed hash: rows hash with Spark's own xxhash64 chain
  * (`XXH64.hashLong(r, XXH64.hashLong(h, 42))` ≡ the Column expression
  * `xxhash64(h, lit(r))`), so the sketch content is identical on every
  * run, partitioning, and cluster size — ORACLE-CHECKABLE, and the
  * probe side can recompute buckets declaratively with the built-in
  * `xxhash64` (no UDF on the query path). */
class CmsAggregator(d: Int, w: Int) extends Aggregator[Long, CmsBuf, Array[Long]] {
  require(d >= 1 && w >= 2, s"CMS needs d >= 1, w >= 2; got d=$d w=$w")

  override def zero: CmsBuf = CmsBuf(new Array[Long](d * w))

  override def reduce(b: CmsBuf, h: Long): CmsBuf = {
    var r = 0
    while (r < d) {
      b.cells(r * w + CmsAggregator.bucket(h, r, w)) += 1L
      r += 1
    }
    b
  }

  override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
    var i = 0
    while (i < a.cells.length) { a.cells(i) += b.cells(i); i += 1 }
    a
  }

  override def finish(b: CmsBuf): Array[Long] = b.cells

  override def bufferEncoder: Encoder[CmsBuf] = Encoders.kryo[CmsBuf]
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CmsAggregator {
  /** Row-r bucket of key h: Spark's chained xxhash64(h, r) (seed 42 →
    * hash(h) seeds hash(r)), then pmod — bit-identical to the Column
    * form `pmod(xxhash64(col, lit(r)), lit(w))`. */
  def bucket(h: Long, r: Int, w: Int): Int = {
    val hr = XXH64.hashLong(r.toLong, XXH64.hashLong(h, 42L))
    (((hr % w) + w) % w).toInt
  }

  /** Column aggregate: CMS matrix (row-major d×w) of a LongType hash
    * column. */
  def cmsAgg(c: Column, d: Int = 4, w: Int = 1024): Column =
    udaf(new CmsAggregator(d, w), Encoders.scalaLong).apply(c)
}
