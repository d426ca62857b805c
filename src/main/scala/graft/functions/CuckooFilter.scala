package graft.functions

import java.nio.ByteBuffer

import graft.core.Hashes

/** Cuckoo filter over 64-bit keys (Fan et al., "Cuckoo Filter: Practically
  * Better Than Bloom", CoNEXT 2014 — public). The URL-seen accelerator
  * alternative named by the north star ("Bloom/cuckoo"): same no-false-
  * negative routing contract as the bloom path, plus DELETE support (bloom
  * cannot forget — a crawler that retires URLs, e.g. robots revocations or
  * recrawl windows, needs deletion).
  *
  * Layout: `numBuckets` buckets × 4 slots × 16-bit fingerprints (0 = empty).
  * Alternate index i2 = i1 XOR (h(fp) mod n) — recoverable from (i, fp)
  * alone, which is what makes same-shape filters MERGEABLE by re-inserting
  * stored fingerprints (the property the broadcast-merged seen structure
  * needs). numBuckets is a power of two.
  *
  * Serializable to bytes (driver broadcast + snapshot persistence).
  */
final class CuckooFilter private (val numBuckets: Int, val table: Array[Short])
    extends Serializable {

  import CuckooFilter._

  /** Count of keys that could NOT be placed (filter over-full). A non-zero
    * value means `mightContain` can return false negatives for the dropped
    * keys — the "filter-clear ⇒ definitely new" contract is void and the
    * caller must rebuild at higher capacity (CrawlRound does). Carried through
    * serialization and accumulated by merge so a drop anywhere in a
    * distributed build is visible in the final filter. */
  private var failedCount: Long = 0L
  def failedInserts: Long = failedCount

  private def bucketOf(h: Long): Int = (mixH(h) & (numBuckets - 1)).toInt
  private def altBucket(i: Int, fp: Short): Int =
    (i ^ (mixH(fp.toLong & 0xffffL) & (numBuckets - 1))).toInt

  private def fingerprint(h: Long): Short = {
    val f = (Hashes.mix(0x5bd1e995L, h) & 0xffffL).toInt
    (if (f == 0) 1 else f).toShort // 0 is the empty marker
  }

  private def slot(i: Int, s: Int): Int = i * SlotsPerBucket + s

  private def tryInsertAt(i: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(slot(i, s)) == 0) { table(slot(i, s)) = fp; return true }
      s += 1
    }
    false
  }

  /** Insert by key. False when the filter is over-full (caller should size
    * capacity with headroom, as with bloom expectedItems). */
  def put(h: Long): Boolean = {
    val fp = fingerprint(h)
    val i1 = bucketOf(h)
    putFp(i1, fp)
  }

  /** Insert a (bucket, fingerprint) pair — the merge primitive. */
  def putFp(i0: Int, fp0: Short): Boolean = {
    if (tryInsertAt(i0, fp0) || tryInsertAt(altBucket(i0, fp0), fp0)) return true
    // cuckoo kicking
    var i = i0
    var fp = fp0
    var kicks = 0
    var seed = mixH(i0.toLong ^ (fp0.toLong << 17))
    while (kicks < MaxKicks) {
      val s = (seed & (SlotsPerBucket - 1)).toInt
      seed = mixH(seed)
      val victim = table(slot(i, s))
      table(slot(i, s)) = fp
      fp = victim
      i = altBucket(i, fp)
      if (tryInsertAt(i, fp)) return true
      kicks += 1
    }
    failedCount += 1
    false
  }

  def mightContain(h: Long): Boolean = {
    val fp = fingerprint(h)
    val i1 = bucketOf(h)
    val i2 = altBucket(i1, fp)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(slot(i1, s)) == fp || table(slot(i2, s)) == fp) return true
      s += 1
    }
    false
  }

  /** Delete one copy of the key's fingerprint — the operation bloom lacks. */
  def remove(h: Long): Boolean = {
    val fp = fingerprint(h)
    val i1 = bucketOf(h)
    val i2 = altBucket(i1, fp)
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(slot(i1, s)) == fp) { table(slot(i1, s)) = 0; return true }
      if (table(slot(i2, s)) == fp) { table(slot(i2, s)) = 0; return true }
      s += 1
    }
    false
  }

  /** Merge another same-shape filter by re-inserting its stored
    * fingerprints. Returns count of entries that could not be placed. */
  def mergeInPlace(other: CuckooFilter): Long = {
    require(other.numBuckets == numBuckets, "cuckoo merge requires same shape")
    failedCount += other.failedCount // drops already suffered by the other side
    var failed = 0L
    var i = 0
    while (i < other.numBuckets) {
      var s = 0
      while (s < SlotsPerBucket) {
        val fp = other.table(other.slot(i, s))
        if (fp != 0 && !putFp(i, fp)) failed += 1 // putFp bumps failedCount
        s += 1
      }
      i += 1
    }
    failed
  }

  def occupied: Long = {
    var n = 0L; var i = 0
    while (i < table.length) { if (table(i) != 0) n += 1; i += 1 }
    n
  }

  def serialized: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + table.length * 2 + 8)
    bb.putInt(numBuckets)
    table.foreach(bb.putShort)
    bb.putLong(failedCount)
    bb.array()
  }
}

object CuckooFilter {
  final val SlotsPerBucket = 4
  final val MaxKicks = 500

  private def mixH(h: Long): Long = Hashes.mix(0x9e3779b97f4a7c15L, h)

  /** Size for `expectedItems` at ~95% max load (4-slot buckets).
    * Hard-capped at 2^28 buckets (2^30 slots ≈ 2 GB of fingerprints):
    * beyond that the bucket math would overflow Int (an unguarded loop here
    * previously wrapped negative and spun forever on the regrow/recovery
    * path). Past the cap, fail loudly — a filter that size must be sharded
    * (CrawlConfig.filterShards), not grown in one table. */
  def create(expectedItems: Long): CuckooFilter = {
    val minBuckets = math.max(expectedItems / (SlotsPerBucket * 95L / 100L), 4L)
    require(minBuckets <= (1L << 28),
      s"cuckoo filter for $expectedItems items needs > 2^28 buckets — " +
        "shard the URL-seen filter (CrawlConfig.filterShards) instead")
    var n = 4L
    while (n < minBuckets) n <<= 1
    new CuckooFilter(n.toInt, new Array[Short]((n * SlotsPerBucket).toInt))
  }

  /** Exact-shape constructor: mergeInPlace requires identical numBuckets, so
    * a delta built against an existing (possibly regrown) filter must pin its
    * bucket count rather than re-derive it from expectedItems. */
  def createWithBuckets(numBuckets: Int): CuckooFilter = {
    require(numBuckets >= 4 && Integer.bitCount(numBuckets) == 1,
      s"numBuckets must be a power of two >= 4, got $numBuckets")
    new CuckooFilter(numBuckets, new Array[Short](numBuckets * SlotsPerBucket))
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val table = new Array[Short](n * SlotsPerBucket)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort; i += 1 }
    val cf = new CuckooFilter(n, table)
    // trailing failed-insert counter; absent in pre-counter snapshots
    if (bb.remaining() >= 8) cf.failedCount = bb.getLong
    cf
  }
}
