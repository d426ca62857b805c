package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.SyntheticWeb
import graft.plans.Model.CrawlConfig
import graft.sources.SnapshotStore

/** Log-structured frontier (CrawlConfig.frontierDeltas): non-compaction
  * snapshots persist only the round's churn; loadFrontier merges base +
  * deltas on read. These tests pin equivalence with the full layout —
  * including across a compaction boundary — and resumability mid-chain. */
class FrontierDeltaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rounds = 5
  private val baseCfg = CrawlConfig(roundCap = 300)
  private val deltaCfg = baseCfg.copy(frontierDeltas = true, compactFrontierEvery = 3)

  private def crawl(cfg: CrawlConfig, tag: String): SnapshotStore = {
    val store = new SnapshotStore(spark, SparkTestSession.tempDir(tag))
    Crawler.run(spark, store, SyntheticWeb.seeds(12), rounds, cfg)
    store
  }

  private def frontierSet(st: SnapshotStore, k: Int): Set[(String, Int, Long, Int, Int)] =
    st.loadFrontier(k).toDF()
      .select($"url", $"priority", $"next_fetch_ts", $"discovered_round", $"retries")
      .as[(String, Int, Long, Int, Int)].collect().toSet

  test("delta layout reproduces the identical crawl and identical frontiers per round") {
    val full = crawl(baseCfg, "fdelta-full")
    val delta = crawl(deltaCfg, "fdelta-log")
    // snapshot layout is actually log-structured: snapshots 1,2 and 4,5 carry
    // deltas only; snapshot 3 (and 0) carry the full base
    import java.nio.file.{Files, Paths}
    (1 to rounds).foreach { k =>
      val isCompaction = k % 3 == 0
      assert(Files.exists(Paths.get(delta.frontierPath(k))) === isCompaction,
        s"snapshot $k full-frontier presence wrong")
      assert(Files.exists(Paths.get(delta.frontierDeltaPath(k))) === !isCompaction,
        s"snapshot $k delta presence wrong")
    }
    // identical judged artifacts
    assert(Crawler.ordering(spark, full).collect().toSeq ===
      Crawler.ordering(spark, delta).collect().toSeq)
    assert(Crawler.seenDigest(spark, full) === Crawler.seenDigest(spark, delta))
    // identical reconstructed frontier at EVERY snapshot
    (0 to rounds).foreach { k =>
      assert(frontierSet(full, k) === frontierSet(delta, k), s"frontier $k differs")
    }
  }

  test("a hole in the delta chain fails loudly instead of reconstructing wrong") {
    val store = crawl(deltaCfg, "fdelta-hole")
    // snapshot 4 carries a delta (3 is the compaction base); removing it
    // breaks the chain for any read at >= 4
    import java.nio.file.{Files, Paths}
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(rm) finally s.close()
      }
      Files.deleteIfExists(p)
    }
    rm(Paths.get(store.frontierDeltaPath(4)))
    val e = intercept[IllegalStateException](store.loadFrontier(5).count())
    assert(e.getMessage.contains("chain broken"))
  }

  test("churn-driven compaction cadence reproduces the identical crawl") {
    val full = crawl(baseCfg, "fdelta-churn-full")
    // tiny ratio: the growth-phase crawl's churn ≈ frontier size, so the
    // ratio trips quickly and compactions actually occur inside the window
    // (the fixed cadence is disabled via a huge modulus — only churn decides)
    val churnCfg = baseCfg.copy(frontierDeltas = true,
      compactFrontierEvery = Int.MaxValue, compactFrontierChurnRatio = 0.5)
    val churn = crawl(churnCfg, "fdelta-churn-log")
    // identical judged artifacts + identical reconstructed frontiers: the
    // cadence changes WHERE full bases land, never what the frontier is
    assert(Crawler.ordering(spark, full).collect().toSeq ===
      Crawler.ordering(spark, churn).collect().toSeq)
    assert(Crawler.seenDigest(spark, full) === Crawler.seenDigest(spark, churn))
    (0 to rounds).foreach { k =>
      assert(frontierSet(full, k) === frontierSet(churn, k), s"frontier $k differs")
    }
    import java.nio.file.{Files, Paths}
    val fullSnapshots = (1 to rounds)
      .filter(k => Files.exists(Paths.get(churn.frontierPath(k))))
    // the ratio must actually trigger at least one compaction AND at least
    // one delta round in this window, else the test pins nothing
    assert(fullSnapshots.nonEmpty, "churn ratio never triggered a compaction")
    assert(fullSnapshots.size < rounds, "every round compacted — ratio never deferred")
    // cadence is churn-driven: each compaction snapshot c was preceded by a
    // chain whose accumulated churn crossed ratio × base — verified
    // indirectly by determinism (re-run lands the same cadence)
    val churn2 = crawl(churnCfg, "fdelta-churn-log2")
    val fullSnapshots2 = (1 to rounds)
      .filter(k => Files.exists(Paths.get(churn2.frontierPath(k))))
    assert(fullSnapshots === fullSnapshots2, "cadence not deterministic")
  }

  test("resume mid-delta-chain from a fresh store handle is identical") {
    val a = new SnapshotStore(spark, SparkTestSession.tempDir("fdelta-resume-a"))
    Crawler.run(spark, a, SyntheticWeb.seeds(12), rounds, deltaCfg)
    // interrupt after round 2 (inside a delta chain: base at 0, deltas 1-2)
    val bDir = SparkTestSession.tempDir("fdelta-resume-b")
    val b1 = new SnapshotStore(spark, bDir)
    Crawler.run(spark, b1, SyntheticWeb.seeds(12), 2, deltaCfg)
    val b2 = new SnapshotStore(spark, bDir) // fresh handle, resumes at HEAD=2
    Crawler.run(spark, b2, SyntheticWeb.seeds(12), rounds, deltaCfg)
    assert(Crawler.ordering(spark, a).collect().toSeq ===
      Crawler.ordering(spark, b2).collect().toSeq)
    assert(Crawler.seenDigest(spark, a) === Crawler.seenDigest(spark, b2))
    assert(frontierSet(a, rounds) === frontierSet(b2, rounds))
  }
}
