package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkDocs(rows: Seq[(Long, String, String, String)]) =
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  lazy val docs = mkDocs(Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s0"),
    (1L, "one two three four five six seven eight nine ten eleven twelve", "en", "s1"),
    (2L, "kurz", "de", "s0"), // shorter than any shingle
    (3L, ("tok " * 120).trim, "de", "s2"), // 479 chars -> multiple chunks
    (4L, "uno dos tres cuatro cinco seis siete ocho nueve diez", "es", "s1")))

  test("chunkFixed: chunks tile the text (reassembly at stride boundaries)") {
    val chunksOf3 = Curation.chunkFixed(docs.filter($"doc_id" === 3L), 200, 150)
      .orderBy("chunk_idx").collect()
    assert(chunksOf3.length === math.ceil(479.0 / 150).toInt + (if (479 % 150 == 0) 1 else 0))
    chunksOf3.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("chunk_idx") === i.toLong)
      assert(r.getAs[Long]("chunk_start") === 1L + i * 150L)
      assert(r.getAs[Long]("chunk_len") <= 200L)
    }
    // stride-prefix reassembly: first `stride` chars of each chunk, then the
    // tail of the last chunk, reconstructs the document exactly
    val text = docs.filter($"doc_id" === 3L).select("text").as[String].head()
    val rebuilt = chunksOf3.map { r =>
      val start = r.getAs[Long]("chunk_start").toInt
      text.substring(start - 1, math.min(start - 1 + 150, text.length))
    }.mkString
    assert(rebuilt === text)
    // short doc -> exactly one chunk covering the whole text
    val one = Curation.chunkFixed(docs.filter($"doc_id" === 2L), 200, 150).collect()
    assert(one.length === 1 && one.head.getAs[Long]("chunk_len") === 4L)
  }

  test("chunkFixed: a zero-length document emits exactly one empty chunk") {
    // pinned behavior (and what the registered DuckDB oracle now mirrors via
    // greatest(n_chars, 1)): an empty doc still anchors one chunk row, so
    // chunk accounting covers every input doc
    val empty = mkDocs(Seq((9L, "", "en", "s0")))
    val rows = Curation.chunkFixed(empty, 200, 150).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("chunk_idx") === 0L)
    assert(r.getAs[Long]("chunk_start") === 1L)
    assert(r.getAs[Long]("chunk_len") === 0L)
    // sha256 of the empty string
    assert(r.getAs[String]("chunk_sha256") ===
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  test("chunkFixed: sha256 matches a locally computed digest") {
    val r = Curation.chunkFixed(docs.filter($"doc_id" === 0L), 200, 150).collect().head
    val expect = graft.core.Hashes.sha256Hex(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    assert(r.getAs[String]("chunk_sha256") === expect)
  }

  test("hashSample: deterministic, content-keyed (duplicates share fate)") {
    val dup = mkDocs(Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "sX")))
    val all = docs.union(dup)
    val s1 = Curation.hashSample(all, "0123456789abcdef") // every nibble
    assert(s1.count() === all.count()) // full nibble set keeps everything
    val s2 = Curation.hashSample(all, "012").select("doc_id").as[Long].collect().toSet
    val s3 = Curation.hashSample(all, "012").select("doc_id").as[Long].collect().toSet
    assert(s2 === s3) // reproducible
    // doc 0 and its exact copy 10 land on the same side of the split
    assert(s2.contains(0L) === s2.contains(10L))
    // complementary prefixes partition the corpus
    val rest = Curation.hashSample(all, "3456789abcdef").select("doc_id").as[Long].collect().toSet
    assert((s2 ++ rest) === all.select("doc_id").as[Long].collect().toSet)
    assert((s2 & rest).isEmpty)
  }

  test("quotaPerGroup: two-phase salted result equals the naive window") {
    val many = mkDocs((0L until 200L).map(i =>
      (i, s"document number $i body", if (i % 3 == 0) "en" else "de", s"s${i % 7}")))
    val got = Curation.quotaPerGroup(many, k = 10, salts = 4)
      .select("doc_id", "lang", "rn").as[(Long, String, Long)].collect().toSet
    val naive = many
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"lang").orderBy($"doc_id")))
      .filter($"rn" <= 10).select($"doc_id", $"lang", $"rn".cast("long"))
      .as[(Long, String, Long)].collect().toSet
    assert(got === naive)
    assert(got.groupBy(_._2).forall(_._2.size == 10))
    // picks the k SMALLEST doc_ids per group
    assert(got.filter(_._2 == "en").map(_._1).max === 27L) // en = 0,3,...,27
  }

  test("corpusStats: buckets partition the corpus; totals reconcile") {
    val st = Curation.corpusStats(docs, bucketWidth = 100).collect()
    assert(st.map(_.getAs[Long]("n_docs")).sum === docs.count())
    assert(st.map(_.getAs[Long]("total_chars")).sum ===
      docs.agg(sum($"n_chars")).as[Long].head())
    val de0 = st.find(r => r.getAs[String]("lang") == "de" && r.getAs[Long]("len_bucket") == 0L).get
    assert(de0.getAs[Long]("n_docs") === 1L) // only doc 2 (4 chars)
  }

  test("shingleHashes: count = tokens - n + 1 distinct; short docs drop out") {
    val sh = Curation.shingleHashes(docs, 4)
    val byDoc = sh.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(byDoc(0L) === 7L) // 10 tokens -> 7 4-gram shingles, all distinct
    assert(!byDoc.contains(2L)) // 1 token < n -> no shingles
    assert(byDoc(3L) === 1L) // "tok tok tok tok" repeated -> 1 distinct shingle
  }

  test("exportShards: layout deterministic across input partitioning; no doc lost") {
    val many = mkDocs((0L until 300L).map(i =>
      (i, s"doc body $i", "en", s"s${i % 5}")))
    val dir1 = graft.SparkTestSession.tempDir("shards1")
    val dir2 = graft.SparkTestSession.tempDir("shards2")
    val m1 = Curation.exportShards(many, dir1, nShards = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    // same corpus arriving with a different physical partitioning
    val m2 = Curation.exportShards(many.repartition(17), dir2, nShards = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(m1 === m2, "shard manifest depends on input partitioning")
    assert(m1.toSeq.map(_._2).sum === 300L)
    assert(m1.map(_._1) === (0L until 8L).toSet)
    // every doc present exactly once across the exported files
    val readBack = spark.read.parquet(dir1).select("doc_id").as[Long].collect()
    assert(readBack.length === 300 && readBack.toSet.size === 300)
    // hash balance: no shard more than 2x the ideal size on 300 docs
    assert(m1.map(_._2).max <= 2 * (300 / 8 + 1))
  }

  test("decontaminate: planted benchmark overlap flagged with exact count") {
    val corpus = mkDocs(Seq(
      (0L, "clean document with totally original content about spark shuffles", "en", "s0"),
      (1L, "the quick brown fox jumps over the lazy dog tonight", "en", "s1"),
      (2L, "another clean unrelated piece of text goes right here", "en", "s2")))
    val bench = mkDocs(Seq(
      (100L, "benchmark question the quick brown fox jumps over what", "en", "b")))
    val flagged = Curation.decontaminate(corpus, bench, n = 4)
      .as[(Long, Long)].collect().toMap
    // shared 4-gram window: "the quick brown fox", "quick brown fox jumps",
    // "brown fox jumps over" -> 3 overlapping shingles in doc 1 only
    assert(flagged === Map(1L -> 3L))
  }
}
