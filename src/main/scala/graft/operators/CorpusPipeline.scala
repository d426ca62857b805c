package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.plans.Model.FetchResult

/** End-to-end training-corpus build — the composition a user of this library
  * actually runs over crawled pages:
  *
  *   pages (status 200)
  *     → documents (doc_id = url_hash; fused text profile: lang/quality/
  *       tokens/fingerprint in one kernel)                       [narrow]
  *     → quality gate (min tokens, min quality score)            [narrow]
  *     → exact-dup keeper (content hash, min doc_id survives)    [1 shuffle]
  *     → near-dup keeper (MinHash → banded LSH → connected
  *       components → keeper)                          [bucket join + CC]
  *     → per-lang quota (two-phase salted rank)                  [windows]
  *     → deterministic sharded export + audited manifest  [1 shuffle + write]
  *
  * Every stage is an operator with its own oracle/spec (Dedup, Curation,
  * TextAnalysis); this object only composes them and reports per-stage
  * survivor counts. The composition invariants — stage monotonicity, output
  * distinctness, manifest determinism under input repartitioning — are
  * pinned in CorpusPipelineSpec.
  *
  * Scale shape: the narrow stages pipeline inside the page scan; the wide
  * stages are the operators' own audited shuffles. The report's per-stage
  * counts cost one action per stage over persisted intermediates — a corpus
  * build is a batch job where that observability is worth the extra jobs
  * (each count materializes a cache the next stage reads anyway). */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 20,
      minQuality: Double = 0.3,
      nearDupThreshold: Double = 0.7,
      quotaPerLang: Int = Int.MaxValue,
      nShards: Int = 8)

  final case class Report(
      n_pages: Long,
      n_docs: Long,
      n_after_quality: Long,
      n_after_exact: Long,
      n_after_neardup: Long,
      n_after_quota: Long,
      n_shards: Int)

  /** Crawled pages → the documents shape every curation/dedup operator
    * consumes: (doc_id, url, text, lang, source, n_chars, n_tokens,
    * quality). doc_id = url_hash (unique per canonical url within a crawl —
    * the 64-bit ordering key; content identity stays 128-bit upstream). */
  def documentsOf(pages: Dataset[FetchResult]): DataFrame = {
    val profileU = udf((t: String) => graft.functions.TextAnalysis.profile(t))
    pages.filter(col("status") === 200)
      .select(col("url_hash").as("doc_id"), col("url"), col("text"),
        col("host").as("source"), profileU(col("text")).as("p"))
      .select(col("doc_id"), col("url"), col("text"), col("source"),
        col("p.lang_pred").as("lang"),
        length(col("text")).cast("long").as("n_chars"),
        col("p.n_tokens").as("n_tokens"), col("p.quality").as("quality"))
  }

  /** Run the full build; writes shards under `outPath`, returns
    * (per-shard manifest, per-stage report). */
  def run(pages: Dataset[FetchResult], outPath: String,
      cfg: Config = Config()): (DataFrame, Report) = {
    val docs = documentsOf(pages).persist()
    val nPages = pages.filter(col("status") === 200).count()
    val nDocs = docs.count()

    val gated = docs.filter(col("n_tokens") >= cfg.minTokens &&
      col("quality") >= cfg.minQuality).persist()
    val nGated = gated.count()

    val exactKept = Dedup.exactKeep(gated).persist()
    val nExact = exactKept.count()

    val pairs = Dedup.minHashPairs(exactKept.select(col("doc_id"), col("text")),
      cfg.nearDupThreshold)
    val nearKept = Dedup.nearDupKeep(exactKept, pairs).persist()
    val nNear = nearKept.count()

    val quota =
      if (cfg.quotaPerLang == Int.MaxValue) nearKept
      else nearKept.join(
        Curation.quotaPerGroup(nearKept, cfg.quotaPerLang).select(col("doc_id")),
        Seq("doc_id"))
    val quotaP = quota.persist()
    val nQuota = quotaP.count()

    val manifest = Curation.exportShards(
      quotaP.select(col("doc_id"), col("url"), col("text"), col("lang"),
        col("source"), col("n_chars")),
      outPath, cfg.nShards)

    Seq(docs, gated, exactKept, nearKept, quotaP).foreach(_.unpersist(false))
    (manifest,
      Report(nPages, nDocs, nGated, nExact, nNear, nQuota, cfg.nShards))
  }
}
