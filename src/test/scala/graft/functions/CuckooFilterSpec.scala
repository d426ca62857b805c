package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.Hashes

class CuckooFilterSpec extends AnyFunSuite {

  private def keys(seed: Long, n: Int): Seq[Long] =
    (0 until n).map(i => Hashes.mix(seed, i.toLong))

  test("zero false negatives over the whole inserted set") {
    val cf = CuckooFilter.create(20000)
    val ks = keys(1L, 10000)
    ks.foreach(k => assert(cf.put(k), s"insert failed at load ${cf.occupied}"))
    ks.foreach(k => assert(cf.mightContain(k)))
  }

  test("false positive rate is small") {
    val cf = CuckooFilter.create(20000)
    keys(2L, 10000).foreach(cf.put)
    val probes = keys(999L, 20000)
    val fp = probes.count(cf.mightContain)
    // 16-bit fingerprints, 2 buckets × 4 slots: fpp ≈ 8/2^16 ≈ 0.00012
    assert(fp < 40, s"false positives: $fp / 20000")
  }

  test("delete works and bloom-style merge preserves membership") {
    val cf = CuckooFilter.create(4096)
    val ks = keys(3L, 1000)
    ks.foreach(cf.put)
    ks.take(100).foreach(k => assert(cf.remove(k)))
    // removed keys gone (fingerprints are unique enough at this load)
    val stillThere = ks.take(100).count(cf.mightContain)
    assert(stillThere < 5, s"$stillThere of 100 removed keys still present")
    ks.drop(100).foreach(k => assert(cf.mightContain(k)))

    val a = CuckooFilter.create(8192)
    val b = CuckooFilter.create(8192)
    keys(4L, 2000).foreach(a.put)
    keys(5L, 2000).foreach(b.put)
    assert(a.mergeInPlace(b) === 0L)
    (keys(4L, 2000) ++ keys(5L, 2000)).foreach(k => assert(a.mightContain(k)))
  }

  test("serialization round-trips") {
    val cf = CuckooFilter.create(2048)
    val ks = keys(6L, 500)
    ks.foreach(cf.put)
    val back = CuckooFilter.deserialize(cf.serialized)
    assert(back.numBuckets === cf.numBuckets)
    ks.foreach(k => assert(back.mightContain(k)))
  }

  test("failedInserts counts drops, survives serialization, accumulates on merge") {
    // overfill far past capacity: put MUST start returning false and the
    // counter must equal the number of false returns (no silent loss)
    val cf = CuckooFilter.create(256)
    val ks = keys(10L, 5000)
    val failed = ks.count(k => !cf.put(k))
    assert(failed > 0, "expected an overfull filter to reject inserts")
    assert(cf.failedInserts === failed.toLong)

    val back = CuckooFilter.deserialize(cf.serialized)
    assert(back.failedInserts === failed.toLong)

    // merge propagates the other side's drops into the target's counter
    val clean = CuckooFilter.create(256)
    keys(11L, 100).foreach(clean.put)
    assert(clean.failedInserts === 0L)
    clean.mergeInPlace(CuckooFilter.deserialize(cf.serialized))
    assert(clean.failedInserts >= failed.toLong)
  }

  test("a healthy filter reports zero failedInserts") {
    val cf = CuckooFilter.create(20000)
    keys(12L, 10000).foreach(k => assert(cf.put(k)))
    assert(cf.failedInserts === 0L)
    assert(CuckooFilter.deserialize(cf.serialized).failedInserts === 0L)
  }

  test("bloom_agg aggregate: grouped distributed build is readFrom/putLong-compatible") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ks = keys(20L, 4000)
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(2000, 0.01)
    val shards = ks.toDF("h").repartition(8)
      .withColumn("shard", pmod($"h", lit(4L)).cast("int"))
      .groupBy($"shard")
      .agg(org.apache.spark.sql.graftexpr.BloomAgg($"h", 2000, numBits).as("b"))
      .as[(Int, Array[Byte])].collect().toMap
    assert(shards.size === 4)
    val filters = shards.view.mapValues(b =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(b))).toMap
    // no false negatives within each key's shard
    ks.foreach { k =>
      val s = math.floorMod(k, 4L).toInt
      assert(filters(s).mightContainLong(k), s"lost $k in shard $s")
    }
    // merge compatibility with a filter of the same (expectedItems, numBits)
    val extra = org.apache.spark.util.sketch.BloomFilter.create(2000, numBits)
    extra.putLong(123456789L)
    filters(0).mergeInPlace(extra)
    assert(filters(0).mightContainLong(123456789L))
  }

  test("cuckoo_agg aggregate: distributed build equals local build semantics") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val ks = keys(7L, 5000)
    val bytes = ks.toDF("h").repartition(8)
      .select(org.apache.spark.sql.graftexpr.CuckooAgg($"h", 20000L).as("cf"))
      .head().getAs[Array[Byte]](0)
    val cf = CuckooFilter.deserialize(bytes)
    ks.foreach(k => assert(cf.mightContain(k), s"lost $k"))
    val fp = keys(888L, 10000).count(cf.mightContain)
    assert(fp < 30, s"fp=$fp")
  }
}
