package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{lit, pmod}

import graft.core.{Hashes, SyntheticWeb}
import graft.plans.Model._
import graft.sources.SnapshotStore

/** Distributed synthetic-frontier generator (SURVEY.md §7 M7: "frontier
  * generator at sf-bench"). Builds snapshot 0 with N deterministic URLs drawn
  * from the zipfian SyntheticWeb universe — entirely executor-side
  * (`spark.range` → typed map), no driver-side collection, so the same code
  * generates the 10^10-URL design-point frontier on a real cluster. */
object FrontierGen {

  /** `spreadRounds = 0` (default): every URL is due at round 0 — the growth
    * phase. `spreadRounds = R > 0`: next_fetch_ts is hash-spread uniformly
    * over rounds 0..R-1, so each round dequeues ~n/R URLs out of an n-row
    * frontier — the STEADY-STATE shape (churn ≪ frontier) the log-structured
    * delta layout targets; used by tools.DeltaBench to measure it. */
  def init(spark: SparkSession, store: SnapshotStore, n: Long,
      cfg: CrawlConfig, seed: Long = 777L, spreadRounds: Int = 0): Long = {
    import spark.implicits._
    val t0 = roundTs(cfg, 0)
    val interval = cfg.roundIntervalMs
    val spread = spreadRounds
    val entries = spark.range(n).map { i =>
      val u = SyntheticWeb.urlFor(Hashes.mix(seed, i))
      val h = Hashes.xxh64(u)
      val prio = math.floorMod(Hashes.mix(h, 55), 10L).toInt
      val due =
        if (spread <= 0) t0
        else t0 + math.floorMod(Hashes.mix(h, 77), spread.toLong) * interval
      CrawlRound.entryFor(u, prio, due, 0)
    }.dropDuplicates("url_hash_hi", "url_hash_lo").persist()

    val pending = store.begin(0)
    CrawlRound.writeFrontier(entries, pending.frontierPath)
    entries.map(e => SeenUrl(e.url_hash_hi, e.url_hash_lo, e.url, 0))
      .write.parquet(pending.seenDeltaPath)
    spark.emptyDataset[FetchResult].write.parquet(pending.pagesPath)
    spark.emptyDataset[LineageRow].write.parquet(pending.lineagePath)
    // coalesce: each partition yields a partial filter of the full bit-array
    // size, so aggregate fan-in is serialized megabytes per partition.
    // Honors cfg.filterKind — a cuckoo-configured crawl must find a cuckoo
    // file at round 0, or it would pay the cold-path rebuild immediately.
    if (cfg.filterKind == "cuckoo") {
      val cf = CrawlRound.cuckooOfUrls(entries.toDF(), cfg.bloomExpectedItems)
      pending.writeCuckoo(cf)
    } else if (cfg.filterShards > 0) {
      // sharded config: one distributed per-shard aggregation (never the
      // monolithic expectedItems-sized filter); shapes match the lifecycle's
      // BloomAgg deltas (CrawlRound.shardSizing)
      val n = cfg.filterShards
      val (perShard, numBits) = CrawlRound.shardSizing(spark, cfg)
      // each task writes its shard(s) straight into the staging dir — shard
      // bytes never pass through the driver (a collect here would hold the
      // whole ≈total-filter-size map at once; see CrawlRound.writeFilter)
      val outDir = pending.filterShardsDir
      entries.toDF()
        .withColumn("shard", pmod($"url_hash", lit(n.toLong)).cast("int"))
        .groupBy($"shard")
        .agg(org.apache.spark.sql.graftexpr.BloomAgg($"url_hash", perShard,
          numBits).as("bytes"))
        .repartition(n, $"shard")
        .as[(Int, Array[Byte])]
        .foreachPartition { (it: Iterator[(Int, Array[Byte])]) =>
          it.foreach { case (i, bytes) =>
            graft.sources.SnapshotStore.writeShardFile(outDir, i, bytes) }
        }
      // empty shards (no url hashed into them): one filter in flight at a time
      (0 until n).foreach { i =>
        if (!java.nio.file.Files.exists(
            java.nio.file.Paths.get(outDir, s"shard-$i.bin"))) {
          val bf = org.apache.spark.util.sketch.BloomFilter.create(perShard, numBits)
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          pending.writeFilterShard(i, bos.toByteArray)
        }
      }
    } else {
      pending.writeBloom(entries.select($"url_hash").coalesce(4).stat
        .bloomFilter("url_hash", cfg.bloomExpectedItems, cfg.bloomFpp))
    }
    val nRows = entries.count()
    pending.commit(CrawlRound.manifestJson(
      RoundMetrics(-1, 0, 0, 0, 0, 0, 0, 0, 0, nRows, nRows, nRows), cfg))
    entries.unpersist(blocking = false)
    nRows
  }
}
