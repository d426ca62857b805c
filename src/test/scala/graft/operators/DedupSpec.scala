package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // corpus with planted exact + near duplicates
  val base = "the quick brown fox jumps over the lazy dog and keeps running through the green field today"
  lazy val docs = Seq(
    (0L, base),
    (1L, base), // exact dup of 0
    (2L, base.replace("dog", "cat")), // near dup of 0
    (3L, "spark datasets shuffle partitions and broadcast joins across the executor fleet"),
    (4L, "completely unrelated text about cooking pasta with tomatoes and basil leaves"),
    (5L, "yet another very different document mentioning telescopes galaxies and orbital mechanics"))
    .toDF("doc_id", "text")

  test("exact dedup: groups exact copies, keeps min doc_id") {
    val r = Dedup.exact(docs).collect()
    assert(r.length === 5) // 6 docs, one exact pair
    val dupRow = r.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dupRow.getAs[Long]("keep_doc_id") === 0L)
    assert(Dedup.exactKeep(docs).count() === 5)
    assert(Dedup.exactKeep(docs).select("doc_id").as[Long].collect().toSet
      === Set(0L, 2L, 3L, 4L, 5L))
  }

  test("incremental minhash: equals from-scratch pairs restricted to the new batch") {
    val existing = docs.filter($"doc_id" <= 3L)
    val batch = docs.filter($"doc_id" >= 4L)
      // planted near-dup of existing doc 0 arriving in the new batch
      .union(Seq((6L, base.replace("fox", "wolf"))).toDF("doc_id", "text"))
    val allDocs = existing.union(batch)
    val idx = Dedup.minHashIndex(existing).persist()
    val inc = Dedup.minHashPairsIncremental(idx, batch, threshold = 0.5)
      .select($"doc_a", $"doc_b", $"est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val newIds = Set(4L, 5L, 6L)
    val full = Dedup.minHashPairs(allDocs, threshold = 0.5)
      .select($"doc_a", $"doc_b", $"est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
      .filter(p => newIds.contains(p._1) || newIds.contains(p._2))
    assert(inc === full)
    // the planted near-dup is caught against the OLD corpus
    assert(inc.exists { case (a, b, _) => a == 0L && b == 6L })
    // and no old-old pair leaks into the incremental result
    assert(inc.forall { case (a, b, _) => newIds.contains(a) || newIds.contains(b) })
    idx.unpersist()
  }

  test("near-dup groups: connected components resolve to min-id keepers") {
    // components: chain 1-2-3-4 (one group), pair 10-11, star 20-(21,22,23)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (20L, 22L), (20L, 23L))
      .toDF("doc_a", "doc_b")
    val groups = Dedup.nearDupGroups(pairs).as[(Long, Long)].collect().toMap
    assert(groups === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
    // keeper selection over a corpus containing paired + unpaired docs
    val corpus = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L, 21L, 22L, 23L, 99L))
      .map(i => (i, s"text $i")).toDF("doc_id", "text")
    val kept = Dedup.nearDupKeep(corpus, pairs).select("doc_id")
      .as[Long].collect().toSet
    assert(kept === Set(1L, 10L, 20L, 99L)) // one keeper per group + unpaired
  }

  test("near-dup groups: a 60-node chain converges (path shortcutting)") {
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val groups = Dedup.nearDupGroups(chain).as[(Long, Long)].collect().toMap
    assert(groups.size === 60 && groups.values.forall(_ == 0L))
  }

  test("near-dup groups: end-to-end over minhash pairs of the planted corpus") {
    val pairs = Dedup.minHashPairs(docs, threshold = 0.5)
    val groups = Dedup.nearDupGroups(pairs).as[(Long, Long)].collect().toMap
    // docs 0,1,2 are one near-dup family -> all label 0
    assert(groups.keySet.subsetOf(Set(0L, 1L, 2L)))
    assert(groups.values.forall(_ == 0L))
    assert(Dedup.nearDupKeep(docs, pairs).count() === docs.count() - (groups.size - 1))
  }

  test("minhash LSH: finds exact and near duplicates, no false pairs") {
    val pairs = Dedup.minHashPairs(docs, threshold = 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(pairs.forall { case (a, b) => Set(a, b).subsetOf(Set(0L, 1L, 2L)) },
      s"false positives: $pairs")
  }

  test("minhash report: one row per doc, zero-candidate docs included") {
    val r = Dedup.minHashReport(docs, threshold = 0.5)
    assert(r.count() === 6)
    val none = r.filter($"n_candidates" === 0).select($"doc_id").as[Long].collect().toSet
    assert(none === Set(3L, 4L, 5L))
    val best01 = r.filter($"doc_id" === 0L).select($"best_est_jaccard").as[Double].head()
    assert(best01 === 1.0)
  }

  test("jaccard verify: exact similarity confirms candidates") {
    val v = Dedup.jaccardVerify(docs, threshold = 0.5)
      .select($"doc_a", $"doc_b", $"jaccard").as[(Long, Long, Double)].collect()
    val m = v.map { case (a, b, j) => (a, b) -> j }.toMap
    assert(m((0L, 1L)) === 1.0)
    assert(m.keySet.forall { case (a, b) => Set(a, b).subsetOf(Set(0L, 1L, 2L)) })
  }

  test("simhash: near-dups bucket together within hamming 3..8") {
    val pairs = Dedup.simHashPairs(docs, maxHamming = 8)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.forall { case (a, b) => Set(a, b).subsetOf(Set(0L, 1L, 2L)) })
    val idx = Dedup.simHashIndex(docs)
    assert(idx.count() === 6)
    assert(idx.columns.toSet === Set("doc_id", "simhash", "block0", "block1", "block2", "block3"))
  }

  test("bit_count hamming on the pair path equals the scalar reference") {
    // the pair verify uses codegen bit_count(a^b); TextAnalysis.hamming is
    // the scalar-side reference — pin their equality over adversarial longs
    val rnd = new scala.util.Random(42)
    val samples = Seq((0L, 0L), (-1L, 0L), (Long.MinValue, Long.MaxValue)) ++
      (0 until 200).map(_ => (rnd.nextLong(), rnd.nextLong()))
    val got = samples.toDF("x", "y")
      .select(bit_count($"x".bitwiseXOR($"y")).cast("int"))
      .as[Int].collect().toSeq
    assert(got === samples.map { case (x, y) => graft.functions.TextAnalysis.hamming(x, y) })
  }

  test("bucket cap bounds pair explosion on degenerate corpora") {
    val same = (0L until 100L).map(i => (i, base)).toDF("doc_id", "text")
    val n = Dedup.minHashPairs(same, threshold = 0.5, maxBucket = 10).count()
    // capped buckets: ≤ C(10,2) pairs per band instead of C(100,2)
    assert(n <= 45)
    assert(n > 0)
  }
}
