package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: fixed-window
  * chunking, deterministic content-hash sampling, per-group quota
  * enforcement, corpus composition stats, and benchmark decontamination.
  * All operate on a documents-shaped DataFrame
  * (doc_id: long, text: string, lang: string, source: string, n_chars: long).
  *
  * Scale design (100 TB corpus):
  *  - chunking / sampling / shingling are NARROW ops — pure per-row
  *    projections and filters, zero shuffle; they pipeline inside the scan
  *    stage and stay in whole-stage codegen (built-in functions only).
  *  - decontamination broadcasts the BENCHMARK shingle set (benchmark suites
  *    are MBs; the corpus is the big side) so the corpus is never shuffled —
  *    one narrow semi-join pass over 100 TB.
  *  - quota sampling is two-phase (salted pre-rank, then per-group rank) so
  *    a handful of giant language groups cannot serialize into single
  *    reducers — same idiom as the crawler's hot-host top-k
  *    (CrawlRound, SURVEY.md §4.3).
  */
object Curation {

  /** Fixed-size character chunking with overlap: windows of `chunkSize`
    * chars starting every `stride` chars (overlap = chunkSize - stride).
    * Start positions are 1, 1+stride, ... up to the text length, so the
    * final chunk may be short (it still anchors trailing text).
    * Emits (doc_id, chunk_idx, chunk_start, chunk_len, chunk_sha256).
    *
    * Narrow: sequence + posexplode + substring, no shuffle; rows multiply
    * by ~len/stride which is the point (chunks are the training unit). */
  def chunkFixed(docs: DataFrame, chunkSize: Int = 200, stride: Int = 150): DataFrame = {
    require(stride > 0 && chunkSize >= stride, s"need 0 < stride <= chunkSize")
    val len = coalesce(col("n_chars"), length(col("text"))).cast("long")
    docs
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(1L), greatest(len, lit(1L)), lit(stride.toLong)))
          .as(Seq("chunk_idx", "chunk_start")))
      .withColumn("chunk", expr(s"substring(text, chunk_start, $chunkSize)"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_start"),
        length(col("chunk")).cast("long").as("chunk_len"),
        sha2(col("chunk"), 256).as("chunk_sha256"))
  }

  /** Deterministic content-hash Bernoulli sample: keep a doc iff the first
    * hex nibble of sha256(text) falls in `hexPrefixes` (default "012" =
    * 3/16 ≈ 18.75%). Unlike rand()-based sampling this is reproducible
    * across runs, cluster sizes, and engines, and co-samples exact
    * duplicates (same text ⇒ same fate) — the property a held-out split
    * needs. Narrow filter, no shuffle. */
  def hashSample(docs: DataFrame, hexPrefixes: String = "012"): DataFrame = {
    val nibbles = hexPrefixes.map(_.toString)
    docs.filter(substring(sha2(col("text"), 256), 1, 1).isin(nibbles: _*))
  }

  /** Per-group quota: the `k` smallest `ord` values per `group` (default:
    * first k doc_ids per lang — deterministic corpus-balancing quota).
    * Two-phase against group skew: phase 1 ranks within (group, salt) and
    * keeps ≤ k per salt cell, cutting each group to ≤ k·salts rows; phase 2
    * ranks the survivors within the group. A 40-TB "en" group costs
    * `salts` parallel partial ranks instead of one reducer. */
  def quotaPerGroup(docs: DataFrame, k: Int, groupCol: String = "lang",
      ordCol: String = "doc_id", salts: Int = 32): DataFrame = {
    val salt = pmod(xxhash64(col(ordCol)), lit(salts))
    val pre = Window.partitionBy(col(groupCol), salt).orderBy(col(ordCol))
    val fin = Window.partitionBy(col(groupCol)).orderBy(col(ordCol))
    docs.select(col("doc_id"), col(groupCol), col(ordCol))
      .withColumn("prn", row_number().over(pre)).filter(col("prn") <= k).drop("prn")
      .withColumn("rn", row_number().over(fin)).filter(col("rn") <= k)
      .select(col("doc_id"), col(groupCol), col("rn").cast("long").as("rn"))
  }

  /** Corpus composition stats: per (lang, floor(n_chars/bucketWidth)) —
    * doc count, total chars, distinct sources. Partial-aggregating groupBy;
    * the histogram form a curation dashboard reads. */
  def corpusStats(docs: DataFrame, bucketWidth: Int = 100): DataFrame =
    docs.groupBy(col("lang"),
        floor(col("n_chars").cast("double") / bucketWidth).cast("long").as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        countDistinct(col("source")).as("n_sources"))

  /** Deterministic training-shard export: writes the corpus under
    * `path/shard=K/` for K in [0, nShards), shard = pmod(xxhash64(doc_id)),
    * each shard sorted by doc_id — assignment depends only on doc_id, so
    * the layout is stable across runs, input partitioning, and cluster
    * sizes (the property a resumable training job needs to map shards to
    * workers). Returns the per-shard manifest
    * (shard, n_docs, n_chars, id_digest) — id_digest is an order-insensitive
    * xor fold of doc_id hashes, so two exports can be compared without
    * reading data files.
    *
    * Scale: one hash shuffle on the shard key, then a partitioned write;
    * shard sizes are balanced by hash uniformity; nShards chosen as
    * corpus_bytes / target_shard_bytes (e.g. ~1 GB shards). The manifest is
    * DELIBERATELY computed by re-reading the written files — a second full
    * scan — so it attests what is actually on disk (the artifact a training
    * job consumes), not what the writer intended; skip the returned manifest
    * if that audit pass is not worth the IO. */
  def exportShards(docs: DataFrame, path: String, nShards: Int): DataFrame = {
    require(nShards >= 1, "need at least one shard")
    val sharded = docs
      .withColumn("shard", pmod(xxhash64(col("doc_id")), lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
    sharded.sparkSession.read.parquet(path)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("n_chars"),
        expr("bit_xor(xxhash64(doc_id))").as("id_digest"))
  }

  /** Distinct word-shingle sha256 hashes per doc: tokens = split on single
    * space (the normative tokenizer for cross-engine parity), shingle =
    * `n` consecutive tokens joined by one space. Docs shorter than n tokens
    * produce no shingles. Narrow (split + slice + explode). */
  def shingleHashes(docs: DataFrame, n: Int, dedup: Boolean = true): DataFrame = {
    require(n >= 2, "shingle size must be >= 2")
    val toks = split(col("text"), " ")
    val starts = when(size(toks) >= n,
      sequence(lit(1), size(toks) - lit(n - 1))).otherwise(expr("array()"))
    val raw = docs.select(col("doc_id"), toks.as("toks"), explode(starts).as("i"))
      .select(col("doc_id"),
        sha2(array_join(slice(col("toks"), col("i"), lit(n)), " "), 256).as("h"))
    if (dedup) raw.distinct() else raw
  }

  /** Benchmark decontamination: flag corpus docs sharing ≥1 word-shingle
    * with the benchmark set; emits (doc_id, n_hit_shingles) for flagged
    * docs (anti-join the result against the corpus to decontaminate).
    * Real pipelines use n≈10–13; the registered sf0.01 query uses n=4 so
    * the synthetic corpus yields a non-degenerate answer.
    *
    * The benchmark shingle set is broadcast — benchmark suites are MBs
    * against a 100 TB corpus — so this is one narrow pass over the corpus
    * with no shuffle until the tiny per-doc count aggregation. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: Int = 13): DataFrame = {
    val bench = broadcast(shingleHashes(benchmark, n).select(col("h")))
    // corpus shingles stay UN-deduped into the broadcast join (a distinct
    // there would shuffle the whole corpus shingle stream); per-doc repeats
    // are collapsed by countDistinct over the tiny post-join hit set
    shingleHashes(corpus, n, dedup = false)
      .join(bench, "h")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("h")).as("n_hit_shingles"))
  }
}
