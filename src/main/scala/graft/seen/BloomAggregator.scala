package graft.seen

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bloom segments as a first-class Spark aggregate function — the classic
  * 2-phase (partial per partition → merge) aggregation contract
  * (SURVEY.md §2.10): `reduce` builds per-partition partials, `merge`
  * ORs them, `finish` serializes. Usable as
  * `df.groupBy("host_bucket").agg(bloom_agg(col("url_hash")))`.
  *
  * [[SeenSet.bloomSegments]] (repartition + mapPartitions) remains the
  * default path because it bounds live filters to one partition's buckets;
  * the UDAF is the idiomatic-aggregation alternative, equal output, and
  * lets Catalyst fold the partial aggregation into the scan stage.
  */
class BloomAggregator(expectedItems: Long, fpp: Double)
    extends Aggregator[Long, LongBloom, Array[Byte]] {
  override def zero: LongBloom = LongBloom.create(expectedItems, fpp)
  override def reduce(b: LongBloom, key: Long): LongBloom = { b.put(key); b }
  override def merge(a: LongBloom, b: LongBloom): LongBloom = a.union(b)
  override def finish(b: LongBloom): Array[Byte] = b.serialize()
  override def bufferEncoder: Encoder[LongBloom] = Encoders.kryo[LongBloom]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomAggregator {
  /** Column aggregate: bloom of a LongType column. */
  def bloomAgg(c: Column, expectedItems: Long = 1 << 16,
      fpp: Double = 0.01): Column =
    udaf(new BloomAggregator(expectedItems, fpp), Encoders.scalaLong).apply(c)
}
