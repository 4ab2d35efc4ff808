package graft.expressions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV buffer: the k smallest DISTINCT keys seen so far, stored
  * sign-flipped (h ^ Long.MinValue) so unsigned order is plain signed
  * order, always sorted ascending in arr[0, n). */
case class KmvBuf(var arr: Array[Long], var n: Int)

/** KMV (k-minimum-values) distinct-count sketch as a first-class Spark
  * aggregate (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07) — the
  * §2.10 mergeable-sketch family member for COUNT(DISTINCT …):
  * keep the k smallest distinct 64-bit hash values; if the k-th
  * smallest (as unsigned) is u, the stream had ≈ (k−1)·2⁶⁴/u distinct
  * values. Exact when fewer than k distinct values exist.
  *
  * Scale shape: the classic 2-phase aggregation contract — `reduce`
  * binary-search-inserts into a bounded sorted array (O(log k) probe,
  * O(k) shift, k elements total), `merge` folds one partial into
  * another — so per-partition partials of ≤k longs cross the exchange,
  * never the hashed stream. Deterministic for a fixed hash function:
  * the same rows give the same sketch on every run, cluster size, and
  * partitioning (insertion order never matters for a set-of-minima),
  * which is what makes the estimate ORACLE-CHECKABLE, unlike RNG-based
  * sampling sketches. */
class KmvAggregator(k: Int) extends Aggregator[Long, KmvBuf, Array[Long]] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: KmvBuf = KmvBuf(new Array[Long](k), 0)

  private def insert(b: KmvBuf, h: Long): Unit = {
    val x = h ^ Long.MinValue
    var lo = 0
    var hi = b.n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b.arr(mid) < x) lo = mid + 1 else hi = mid
    }
    if (lo < b.n && b.arr(lo) == x) return // already present
    if (b.n == k && lo == k) return // above the current k-th minimum
    val keep = math.min(b.n, k - 1) // the k-th slot falls off when full
    System.arraycopy(b.arr, lo, b.arr, lo + 1, keep - lo)
    b.arr(lo) = x
    if (b.n < k) b.n += 1
  }

  override def reduce(b: KmvBuf, h: Long): KmvBuf = { insert(b, h); b }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
    var i = 0
    while (i < b.n) { insert(a, b.arr(i) ^ Long.MinValue); i += 1 }
    a
  }

  /** Ascending unsigned-order distinct minima, raw (unflipped) values. */
  override def finish(b: KmvBuf): Array[Long] = {
    val out = new Array[Long](b.n)
    var i = 0
    while (i < b.n) { out(i) = b.arr(i) ^ Long.MinValue; i += 1 }
    out
  }

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object KmvAggregator {
  /** Column aggregate: KMV sketch of a LongType hash column. */
  def kmvAgg(c: Column, k: Int = 256): Column =
    udaf(new KmvAggregator(k), Encoders.scalaLong).apply(c)
}
