package graft.plans

/** Typed row models for the crawl engine (SURVEY.md §1.1, FIXTURES.md §2).
  *
  * Field names are snake_case on purpose: the case-class `Encoder` field names
  * become the parquet column names, and snapshot/resume stability requires the
  * on-disk schema to be pinned (SURVEY.md §1.3). All timestamps are epoch millis
  * (UTC) carried as Long — plain integer arithmetic beats timestamp types in the
  * hot path and avoids timezone ambiguity across engines.
  */
object Model {

  /** Common-Crawl-style page row — the `input_hint` shape (BASELINE.json:15). */
  final case class PageRow(
      url: String,
      warc_ts: java.sql.Timestamp,
      html: Array[Byte],
      text: String,
      lang: String)

  /** One frontier entry. `url_hash` = xxhash64(url, seed 42) — ordering + bloom
    * key; `(url_hash_hi, url_hash_lo)` = murmur3_128(url) — the exact dedup key
    * (64-bit would collide with certainty at 10^10 URLs; 128-bit p≈3e-19). */
  final case class FrontierEntry(
      url: String,
      url_hash: Long,
      url_hash_hi: Long,
      url_hash_lo: Long,
      host: String,
      priority: Int,
      next_fetch_ts: Long,
      discovered_round: Int,
      retries: Int)

  /** Exact URL-seen row. The url string is kept so the "final URL-seen set"
    * invariant (BASELINE.json north_rule) is checkable as a set of canonical
    * URLs, not just hashes. */
  final case class SeenUrl(
      url_hash_hi: Long,
      url_hash_lo: Long,
      url: String,
      first_seen_round: Int)

  /** Per-host robots rules (RFC 9309 semantics via graft.core.Robots). */
  final case class RobotsEntry(
      host: String,
      fetched_ts: Long,
      crawl_delay_ms: Long,
      allow: Seq[String],
      disallow: Seq[String])

  /** A politeness-gated fetch scheduled for this round. `host_rank` is the
    * 1-based per-host rank; `fetch_ts = round_ts + (host_rank-1)*crawl_delay`
    * (SURVEY.md §8.5). `seq` is the 0-based global round sequence over the
    * gated rows ordered by (priority DESC, next_fetch_ts ASC, url_hash ASC)
    * (SURVEY.md §8.3). */
  final case class FetchTask(
      url: String,
      url_hash: Long,
      url_hash_hi: Long,
      url_hash_lo: Long,
      host: String,
      priority: Int,
      next_fetch_ts: Long,
      discovered_round: Int,
      retries: Int,
      host_rank: Int,
      seq: Long,
      fetch_ts: Long)

  /** Fetch + parse output. html is NOT carried past this stage — the text and
    * links are extracted executor-locally and the fat bytes never shuffle
    * (SURVEY.md §4.2 "never shuffle html"). */
  final case class FetchResult(
      url: String,
      url_hash: Long,
      url_hash_hi: Long,
      url_hash_lo: Long,
      host: String,
      priority: Int,
      next_fetch_ts: Long,
      seq: Long,
      fetch_ts: Long,
      status: Int,
      text: String,
      text_sha256: String,
      links: Seq[String],
      round: Int)

  /** Per-partition lineage counters written beside each snapshot (north_star:
    * "per-partition lineage rows and fetch/parse counters"). */
  final case class LineageRow(
      round: Int,
      stage: String,
      partition_id: Int,
      rows_in: Long,
      rows_out: Long,
      errors: Long,
      wall_ms: Long)

  /** Deterministic round metrics — persisted in the manifest; wall-clock-free
    * so manifests byte-compare across identical runs (SURVEY.md §5.4). */
  final case class RoundMetrics(
      round: Int,
      due: Long,
      robots_denied: Long,
      gated: Long,
      deferred: Long,
      fetched: Long,
      fetch_errors: Long,
      links_extracted: Long,
      links_deduped: Long,
      new_urls: Long,
      frontier_size: Long,
      seen_size: Long)

  /** Crawl configuration (FIXTURES.md §3 budget.json). All knobs pinned —
    * they are part of the normative spec the goldens lock. */
  final case class CrawlConfig(
      hostBudget: Int = 4,
      crawlDelayDefaultMs: Long = 1000L,
      roundCap: Int = 500,
      seedPriority: Int = 5,
      roundIntervalMs: Long = 3600L * 1000,
      baseTs: Long = 1704067200000L, // 2024-01-01T00:00:00Z
      hotHostThreshold: Int = 100000,
      saltBuckets: Int = 16,
      // every k-th snapshot also writes the full URL-seen set repartitioned
      // by hash (compaction) so reads stay O(1 base + few deltas)
      compactSeenEvery: Int = 8,
      useBloom: Boolean = true,
      // "bloom" (built-in BloomFilter) or "cuckoo" (graft CuckooFilter —
      // deletable, custom TypedImperativeAggregate); useBloom=false → exact
      // anti-join only. Both route identically: filter-clear ⇒ definitely new.
      filterKind: String = "bloom",
      bloomExpectedItems: Long = 1L << 20,
      bloomFpp: Double = 0.01,
      // "fused" (default): robots rules are computed in the gate projection
      // itself, memoized per executor (the Mercator cache moved executor-
      // side) — NO driver robots structure and, crucially, NO dedicated
      // robots job: the pre-fetch phase loses one whole job barrier, a
      // measured ~0.7–1 s CONSTANT at every core count (pure non-scaling
      // fraction of the round). "map": rules compiled driver-side from one
      // distinct-hosts pass and broadcast as a host→Rules map — the classic
      // driver-resident robots cache, right up to broadcastable host counts.
      // "join": robots bodies ride a broadcast-joined (host, body) table
      // with executor-side memoized parsing — the ≳10^7-distinct-hosts/round
      // form. All three produce the identical crawl (equivalence-tested).
      robotsForm: String = "fused",
      // true (default): EVERY host goes through the two-phase salted top-k
      // (salt = pmod(url_hash, saltBuckets), a codegen column — no UDF, no
      // broadcast map). The phase-1 keep-proof makes salting semantics-
      // neutral for any host, so hot-host DETECTION (a per-host count
      // collect — one more pre-fetch job barrier) is unnecessary. false:
      // only hosts whose due count exceeds hotHostThreshold are salted,
      // which requires the counts pass ("map"/"join" forms only — the fused
      // form has no counts job, so saltAllHosts=false disables salting).
      saltAllHosts: Boolean = true,
      // tasks-per-core multiplier for the fetch stage (sequenced's range
      // partition count = shuffle.partitions × fetchWaves): >1 packs
      // stragglers across waves, 1 = one task per core. Output is identical
      // at any value (the global sequence is partition-count-independent).
      fetchWaves: Int = 1,
      // 0 (default): one broadcast URL-seen filter — right up to broadcast
      // size (~10^8-10^9 keys). >0 (bloom kind only): the filter is SHARDED
      // by pmod(url_hash, n); candidates route to their shard's partition
      // and probe a partition-local filter — per-executor memory is
      // O(total/n), the 10^10-URL form (a 1%-fpp bloom over 10^10 keys is
      // ~12 GB — unbroadcastable whole). Identical crawl output (the exact
      // anti-join backstop is unchanged; equivalence-tested).
      filterShards: Int = 0,
      // opt-in adaptive politeness: a host whose fetch-error rate in the
      // PREVIOUS round exceeded backoffErrorRate gets half the host budget
      // this round (floor 1) — the standard crawler reaction to failing /
      // throttling hosts. Off by default: the goldens pin the fixed-budget
      // behavior, and with the threshold never exceeded the crawl is
      // byte-identical (equivalence-tested).
      adaptiveBackoff: Boolean = false,
      backoffErrorRate: Double = 0.5,
      // opt-in log-structured frontier: non-compaction snapshots write only
      // this round's CHURN (deferred + new upserts, fetched/denied removals)
      // as `frontier_delta/`; every compactFrontierEvery-th snapshot
      // rewrites the full range-ordered table. At the 10^10-row design
      // point this turns the per-round O(frontier) range shuffle+rewrite
      // into O(churn), paid back by a bloom-routed merge-on-read
      // (SnapshotStore.loadFrontier). Identical crawl output
      // (equivalence-tested).
      frontierDeltas: Boolean = false,
      compactFrontierEvery: Int = 8,
      // 0 (default): compaction on the fixed compactFrontierEvery cadence.
      // > 0: CHURN-DRIVEN cadence — keep writing deltas while the
      // accumulated delta rows since the last full base stay under
      // ratio × base-frontier-size, then compact. DeltaBench measured the
      // delta layout's cost concentrating in chain-growth + compaction
      // rounds, so the right cadence tracks churn, not round count: a
      // low-churn steady state compacts rarely; a churn spike compacts
      // before the merge-on-read chain gets expensive. Decided from
      // manifests — zero extra jobs. Identical crawl output either way
      // (layout never affects semantics; equivalence-tested).
      compactFrontierChurnRatio: Double = 0.0,
      // J1 exact-dedup join form for filter-routed SUSPECTS (the bloom/
      // cuckoo/shard hits — a small set by construction). "scan" (default):
      // broadcast the suspect keys, semi-join to find the actual hits, then
      // broadcast-anti — the seen table is SCANNED (2-column projection),
      // never shuffled; per-round cost vs the unbounded seen set falls from
      // O(seen) shuffle to O(seen) narrow scan. "shuffle": the plain
      // left-anti SMJ/SHJ — the form to pick when suspect cardinality
      // outgrows broadcast reach (≳10^7/round, i.e. the same regime as the
      // sharded filter). Unfiltered probes (useBloom=false, shard cold
      // path) always use the shuffle form. Identical crawl output
      // (equivalence-tested).
      seenJoin: String = "scan") {
    // fail-loudly contract (CrawlMain scaladoc): a typo'd enum value must
    // never silently select a default code path — the forms are output-
    // equivalent, so a silent fallback would run (and measure) a different
    // implementation than the one the caller asked for
    require(Set("fused", "map", "join").contains(robotsForm),
      s"robotsForm must be one of fused|map|join, got '$robotsForm'")
    require(Set("bloom", "cuckoo").contains(filterKind),
      s"filterKind must be one of bloom|cuckoo, got '$filterKind'")
    require(Set("scan", "shuffle").contains(seenJoin),
      s"seenJoin must be one of scan|shuffle, got '$seenJoin'")
  }

  /** round_ts(k) — rounds tick on a fixed cadence so deferred entries
    * (next_fetch_ts = round_ts + budget*delay) come due by the next round. */
  def roundTs(cfg: CrawlConfig, round: Int): Long =
    cfg.baseTs + round.toLong * cfg.roundIntervalMs
}
