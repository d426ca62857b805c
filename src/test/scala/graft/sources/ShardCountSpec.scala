package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** filterShardsExist must match the shard count EXACTLY: probing n' != n
  * shards with pmod(h, n') routing silently produces false negatives for
  * seen URLs, so a count mismatch must route the round to the exact
  * anti-join cold path instead. */
class ShardCountSpec extends AnyFunSuite {

  test("filterShardsExist rejects both smaller and larger configured counts") {
    val store = new SnapshotStore(SparkTestSession.spark,
      graft.SparkTestSession.tempDir("shardcount"))
    val pending = store.begin(0)
    (0 until 8).foreach(i => pending.writeFilterShard(i, Array[Byte](1, 2, 3)))
    pending.commit("""{"round":-1}""")
    assert(store.filterShardsExist(0, 8)) // exact count → true
    assert(!store.filterShardsExist(0, 4)) // resumed with fewer shards → cold path
    assert(!store.filterShardsExist(0, 16)) // resumed with more shards → cold path
  }
}
