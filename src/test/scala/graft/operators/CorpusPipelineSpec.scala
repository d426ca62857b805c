package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.{Hashes, SyntheticWeb, TextExtract, LinkExtract}
import graft.plans.Model.FetchResult

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Synthetic crawled pages straight from the deterministic web (plus two
    * planted exact duplicates so the exact-dedup stage has work). */
  private def mkPages(n: Int): Seq[FetchResult] = {
    val base = (0 until n).map { i =>
      val u = SyntheticWeb.urlFor(Hashes.mix(31L, i.toLong))
      val f = SyntheticWeb.fetch(u)
      val text = if (f.status == 200) TextExtract.extract(f.html) else ""
      FetchResult(u, Hashes.xxh64(u), i.toLong, i.toLong,
        graft.core.UrlCanon.hostOf(u), 5, 0L, i.toLong, 0L, f.status, text,
        "", if (f.status == 200) LinkExtract.extract(f.html, u) else Vector.empty, 0)
    }
    val ok = base.filter(_.status == 200)
    // exact dups of the first two 200s under new urls/doc_ids
    base ++ ok.take(2).zipWithIndex.map { case (p, j) =>
      p.copy(url = s"http://dup$j.example/copy", url_hash = 1000000L + j,
        url_hash_hi = 1000000L + j, url_hash_lo = 1000000L + j)
    }
  }

  test("pipeline: stage monotonicity, distinct output, planted dups removed") {
    val pages = spark.createDataset(mkPages(120))
    val out = Files.createTempDirectory("corpus-pipe").toString
    val (manifest, r) = CorpusPipeline.run(pages, out,
      CorpusPipeline.Config(minTokens = 5, minQuality = 0.0,
        nearDupThreshold = 0.9, nShards = 4))
    assert(r.n_pages >= r.n_docs && r.n_docs >= r.n_after_quality)
    assert(r.n_after_quality >= r.n_after_exact)
    assert(r.n_after_exact >= r.n_after_neardup)
    assert(r.n_after_neardup >= r.n_after_quota)
    // both planted exact dups die in the exact stage
    assert(r.n_after_exact <= r.n_after_quality - 2)
    val m = manifest.orderBy("shard").collect()
    assert(m.map(_.getAs[Long]("n_docs")).sum === r.n_after_quota)
    // exported corpus has no duplicate texts and no duplicate doc_ids
    val exported = spark.read.parquet(out)
    assert(exported.count() === r.n_after_quota)
    assert(exported.select("doc_id").distinct().count() === r.n_after_quota)
    assert(exported.select("text").distinct().count() === r.n_after_quota)
  }

  test("pipeline: manifest digest is deterministic under input repartitioning") {
    val pages = spark.createDataset(mkPages(80))
    def digests(parts: Int): Map[Long, (Long, Long)] = {
      val out = Files.createTempDirectory(s"corpus-det-$parts").toString
      val (manifest, _) = CorpusPipeline.run(pages.repartition(parts), out,
        CorpusPipeline.Config(minTokens = 5, minQuality = 0.0, nShards = 4))
      manifest.select($"shard", $"n_docs", $"id_digest")
        .as[(Long, Long, Long)].collect()
        .map { case (s, n, d) => s -> ((n, d)) }.toMap
    }
    assert(digests(2) === digests(11))
  }

  test("pipeline: per-lang quota caps every language group") {
    val pages = spark.createDataset(mkPages(120))
    val out = Files.createTempDirectory("corpus-quota").toString
    val (_, r) = CorpusPipeline.run(pages, out,
      CorpusPipeline.Config(minTokens = 5, minQuality = 0.0,
        quotaPerLang = 10, nShards = 2))
    val exported = spark.read.parquet(out)
    val over = exported.groupBy($"lang").count().filter($"count" > 10)
    assert(over.count() === 0)
    assert(r.n_after_quota === exported.count())
  }
}
