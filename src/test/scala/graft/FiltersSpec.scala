package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.seen.{CuckooFilter, LongBloom}

class FiltersSpec extends AnyFunSuite {

  test("bloom: zero false negatives (property, 30 seeded samples)") {
    val gen = Gen.listOf(Gen.long)
    (0 until 30).foreach { i =>
      val keys = gen.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse(Nil)
      val f = LongBloom.create(math.max(keys.size, 16), 0.01)
      keys.foreach(f.put)
      assert(keys.forall(f.mightContain), s"false negative at seed $i")
    }
  }

  test("bloom: fpp near target at design load") {
    val n = 100000
    val f = LongBloom.create(n, 0.01)
    (0 until n).foreach(i => f.put(i.toLong * 2654435761L + 17))
    val probes = (0 until 100000).map(i => -1L - i * 40503L)
    val fp = probes.count(f.mightContain)
    assert(fp < 2500, s"fpp too high: $fp / 100000") // 2.5% ceiling vs 1% target
  }

  test("bloom: union(OR) merge equals building from the union of keys") {
    val a = LongBloom.create(1000, 0.01)
    val b = LongBloom.create(1000, 0.01)
    val ka = (0 until 500).map(i => i.toLong * 31 + 1)
    val kb = (0 until 500).map(i => i.toLong * 37 + 2)
    ka.foreach(a.put); kb.foreach(b.put)
    val merged = LongBloom.deserialize(a.serialize()).union(b)
    assert((ka ++ kb).forall(merged.mightContain))
  }

  test("bloom: serialize/deserialize round-trip") {
    val f = LongBloom.create(1000, 0.01)
    val keys = (0 until 1000).map(i => i.toLong * 104729 - 55)
    keys.foreach(f.put)
    val g = LongBloom.deserialize(f.serialize())
    assert(keys.forall(g.mightContain))
    assert(g.numBits == f.numBits && g.numHashes == f.numHashes)
  }

  test("bloom: 10^10-frontier sizing arithmetic stays task-sized per bucket") {
    // the north-rule design point: 10^10 URLs sharded over 4096
    // host_buckets at fpp 0.01 → each bucket's segment must be a small,
    // independently loadable unit (one per task in the cogrouped two-tier
    // probe; broadcast only when the WHOLE store fits). Pin the formula:
    // m = -n ln(fpp)/ln(2)^2 ≈ 9.585 bits/key at 0.01.
    val buckets = 4096
    val perBucket = 10000000000L / buckets // ≈ 2.44M keys
    val f = graft.seen.LongBloom.create(perBucket, 0.01)
    val bytes = f.serialize().length.toLong
    assert(bytes < 8L * 1024 * 1024,
      s"segment is $bytes B — no longer task-sized at the design point")
    assert(bytes > perBucket, "suspiciously small — fpp math broken")
    // k near the optimum (m/n ln2 ≈ 6.64 → 7 hashes)
    assert(f.numHashes >= 5 && f.numHashes <= 9, s"k=${f.numHashes}")
    // total store ≈ buckets × segment ≈ 12 GB: NOT broadcastable — the
    // cogrouped per-bucket variant (SeenSet.unseenTwoTier) must exist for
    // this regime; this assert documents the threshold arithmetic.
    assert(bytes * buckets.toLong > 8L * 1024 * 1024 * 1024)
  }

  test("cuckoo: insert/contains, no false negatives at 90% load") {
    val n = 10000
    val f = CuckooFilter.create(n)
    val keys = (0 until n).map(i => i.toLong * 6364136223846793005L + 1442695040888963407L)
    val inserted = keys.filter(f.insert)
    assert(inserted.size == n, "insertions failed below design load")
    assert(inserted.forall(f.contains))
  }

  test("cuckoo: deletes are honored (the bloom can't do this)") {
    val f = CuckooFilter.create(1000)
    val keys = (0 until 1000).map(i => i.toLong * 2862933555777941757L + 3037000493L)
    keys.foreach(f.insert)
    val (del, keep) = keys.splitAt(500)
    del.foreach(k => assert(f.delete(k)))
    assert(keep.forall(f.contains))
    // deleted keys may still false-positive, but the rate must collapse
    val resurrect = del.count(f.contains)
    assert(resurrect < 25, s"deletes not honored: $resurrect/500 still present")
    assert(f.size == 500)
  }

  test("cuckoo: retry semantics — delete makes a URL re-crawlable") {
    val f = CuckooFilter.create(100)
    val h = 0x1234567890abcdefL
    assert(f.insert(h))
    assert(f.contains(h)) // seen → would be skipped
    assert(f.delete(h)) // FAILED after 1h → eligible again
    assert(!f.contains(h) || { f.insert(h); true })
  }
}
