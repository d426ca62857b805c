package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.{SyntheticWeb, UrlCanon}
import graft.plans.Model._
import graft.sources.SnapshotStore

/** End-to-end crawl invariants (SURVEY.md §5.2–§5.5): politeness, robots,
  * dedup-exactness, determinism, resume, bloom-vs-exact equivalence, salting. */
class CrawlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val cfg = CrawlConfig(hostBudget = 4, crawlDelayDefaultMs = 1000L,
    roundCap = 500, seedPriority = 5)
  val seeds = SyntheticWeb.seeds(20)
  val Rounds = 5

  /** The shared golden crawl — run once, inspected by several tests. */
  lazy val store: SnapshotStore = {
    val s = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-golden"))
    Crawler.run(spark, s, seeds, Rounds, cfg)
    s
  }

  test("crawl progresses: fetches pages, grows seen + frontier") {
    val k = store.head.get
    assert(k === Rounds)
    val pages = store.loadAllPages(k)
    assert(pages.count() > 100)
    val m = store.manifest(k).get
    assert(m.contains("\"seen_size\""))
    assert(Crawler.seenSet(spark, store).count() > pages.count())
  }

  test("politeness: per-host per-round fetches ≤ budget, spaced by crawl-delay (W4)") {
    val k = store.head.get
    val pages = store.loadAllPages(k).persist()
    val perHost = pages.groupBy($"round", $"host").count()
    assert(perHost.filter($"count" > cfg.hostBudget).count() === 0)
    // adjacent same-host fetch_ts gaps within a round == the host's crawl delay
    val gaps = pages
      .withColumn("prev", lag($"fetch_ts", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"round", $"host").orderBy($"fetch_ts")))
      .filter($"prev".isNotNull)
      .select($"host", ($"fetch_ts" - $"prev").as("gap")).as[(String, Long)]
      .collect()
    gaps.foreach { case (host, gap) =>
      val delay = SyntheticWeb.robotsFor(host).crawlDelayMs
      assert(gap === delay, s"host $host gap $gap != delay $delay")
    }
    pages.unpersist()
  }

  test("robots: no fetched url is disallowed for its host") {
    val k = store.head.get
    val urls = store.loadAllPages(k).select($"url").as[String].collect()
    urls.foreach { u =>
      val rules = SyntheticWeb.robotsFor(UrlCanon.hostOf(u))
      assert(rules.allowed(UrlCanon.pathOf(u)), s"disallowed url fetched: $u")
    }
    assert(urls.nonEmpty)
  }

  test("dedup exactness: no url fetched twice; fetched ⊆ seen; seen is distinct") {
    val k = store.head.get
    val pages = store.loadAllPages(k)
    assert(pages.groupBy($"url").count().filter($"count" > 1).count() === 0)
    val seen = Crawler.seenSet(spark, store)
    assert(seen.groupBy($"url_hash_hi", $"url_hash_lo").count()
      .filter($"count" > 1).count() === 0)
    assert(pages.select($"url").except(seen.select($"url")).count() === 0)
  }

  test("frontier never contains a url twice and all entries are canonical") {
    val k = store.head.get
    val fr = store.loadFrontier(k).persist()
    assert(fr.groupBy($"url_hash_hi", $"url_hash_lo").count()
      .filter($"count" > 1).count() === 0)
    val urls = fr.select($"url").as[String].take(200)
    urls.foreach(u => assert(UrlCanon.canonical(u).contains(u), s"non-canonical: $u"))
    fr.unpersist()
  }

  test("global round sequence is dense, 0-based, ordered by (priority desc, ts, hash)") {
    val k = store.head.get
    (0 until Rounds).foreach { r =>
      val rows = store.loadPages(r + 1)
        .select($"seq", $"priority", $"next_fetch_ts", $"url_hash")
        .as[(Long, Int, Long, Long)].collect().sortBy(_._1)
      assert(rows.map(_._1).toSeq === rows.indices.map(_.toLong))
      rows.sliding(2).foreach {
        case Array((_, p1, t1, h1), (_, p2, t2, h2)) =>
          assert(p1 > p2 || (p1 == p2 && (t1 < t2 || (t1 == t2 && h1 < h2))),
            s"order violated in round $r")
        case _ =>
      }
    }
  }

  test("determinism: a second identical crawl reproduces ordering, digest, manifests") {
    val store2 = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-det"))
    Crawler.run(spark, store2, seeds, Rounds, cfg)
    assert(Crawler.seenDigest(spark, store2) === Crawler.seenDigest(spark, store))
    val o1 = Crawler.ordering(spark, store).as[(Int, Long, String)].collect().toSeq
    val o2 = Crawler.ordering(spark, store2).as[(Int, Long, String)].collect().toSeq
    assert(o1 === o2)
    (0 to Rounds).foreach(k => assert(store.manifest(k) === store2.manifest(k)))
  }

  test("resume: interrupt after round 2, resume in a fresh store handle → identical") {
    val dir = SparkTestSession.tempDir("crawl-resume")
    val s1 = new SnapshotStore(spark, dir)
    Crawler.run(spark, s1, seeds, 2, cfg) // rounds 0,1 committed
    assert(s1.head.get === 2)
    val s2 = new SnapshotStore(spark, dir) // "new session"
    Crawler.run(spark, s2, seeds, Rounds, cfg) // resume 2..4
    assert(Crawler.seenDigest(spark, s2) === Crawler.seenDigest(spark, store))
    val o1 = Crawler.ordering(spark, store).as[(Int, Long, String)].collect().toSeq
    val o2 = Crawler.ordering(spark, s2).as[(Int, Long, String)].collect().toSeq
    assert(o1 === o2)
  }

  test("bloom routing is exact: useBloom=false produces the identical crawl") {
    val s = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-nobloom"))
    Crawler.run(spark, s, seeds, 3, cfg.copy(useBloom = false))
    val sB = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-bloom"))
    Crawler.run(spark, sB, seeds, 3, cfg.copy(useBloom = true))
    assert(Crawler.seenDigest(spark, s) === Crawler.seenDigest(spark, sB))
    val o1 = Crawler.ordering(spark, s).as[(Int, Long, String)].collect().toSeq
    val o2 = Crawler.ordering(spark, sB).as[(Int, Long, String)].collect().toSeq
    assert(o1 === o2)
  }

  test("cuckoo seen-filter produces the identical crawl to bloom and exact") {
    val s = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-cuckoo"))
    Crawler.run(spark, s, seeds, 3, cfg.copy(filterKind = "cuckoo"))
    val sB = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-bloom2"))
    Crawler.run(spark, sB, seeds, 3, cfg)
    assert(Crawler.seenDigest(spark, s) === Crawler.seenDigest(spark, sB))
    val o1 = Crawler.ordering(spark, s).as[(Int, Long, String)].collect().toSeq
    val o2 = Crawler.ordering(spark, sB).as[(Int, Long, String)].collect().toSeq
    assert(o1 === o2)
  }

  test("manifest sizes reconcile with actual table counts every round") {
    // the arithmetically-derived manifest fields must equal the real table
    // sizes — this is the check that caught the union-renumbered
    // TaskContext.getPartitionId() row-loss bug (see assignGlobalSeq)
    (1 to Rounds).foreach { i =>
      val m = store.manifest(i).get
      def field(f: String): Long =
        ("\"" + f + "\":(-?\\d+)").r.findFirstMatchIn(m).get.group(1).toLong
      assert(field("frontier_size") === store.loadFrontier(i).count(),
        s"frontier_size round $i")
      assert(field("seen_size") === store.loadSeen(i).count(),
        s"seen_size round $i")
    }
  }

  test("cold path: lost filter file is rebuilt distributed, crawl stays identical") {
    // bloom and cuckoo variants: crawl 2 rounds, delete the filter file from
    // the head snapshot (simulates a lost/corrupt sidecar), resume to the end.
    // The rebuild must come from the exact seen set — digests and ordering
    // match the uninterrupted crawl bit-for-bit.
    for ((kind, file) <- Seq("bloom" -> "bloom.bin", "cuckoo" -> "cuckoo.bin")) {
      val dir = SparkTestSession.tempDir(s"crawl-coldpath-$kind")
      val s1 = new SnapshotStore(spark, dir)
      val c = cfg.copy(filterKind = kind)
      Crawler.run(spark, s1, seeds, 2, c)
      val lost = java.nio.file.Paths.get(dir, s"snapshot-${s1.head.get}", file)
      assert(java.nio.file.Files.deleteIfExists(lost), s"no $file to delete")
      Crawler.run(spark, s1, seeds, Rounds, c) // resumes through the cold path
      assert(Crawler.seenDigest(spark, s1) === Crawler.seenDigest(spark, store),
        s"$kind cold-path digest")
      val o1 = Crawler.ordering(spark, s1).as[(Int, Long, String)].collect().toSeq
      val o2 = Crawler.ordering(spark, store).as[(Int, Long, String)].collect().toSeq
      assert(o1 === o2, s"$kind cold-path ordering")
    }
  }

  test("cuckoo over-capacity regrows instead of dropping keys (exactness holds)") {
    // a filter sized for ~64 items over a crawl that sees thousands: without
    // the regrow path this would silently drop keys and re-crawl URLs
    val s = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-tinycuckoo"))
    Crawler.run(spark, s, seeds, 3, cfg.copy(filterKind = "cuckoo",
      bloomExpectedItems = 64L))
    val sB = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-bigbloom"))
    Crawler.run(spark, sB, seeds, 3, cfg)
    assert(Crawler.seenDigest(spark, s) === Crawler.seenDigest(spark, sB))
    // the persisted filter must have regrown to hold the whole seen set
    val cf = s.loadCuckoo(s.head.get).get
    assert(cf.failedInserts === 0L, "persisted filter carries dropped keys")
  }

  test("sharded URL-seen filter produces the identical crawl to the broadcast form") {
    // 5 shards over the default bloom kind; includes the cold round-0 path
    // (snapshot 0 carries only the monolithic init filter, so round 0 probes
    // via the exact anti-join and the lifecycle writes the first shard set)
    val s = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-shardedbloom"))
    Crawler.run(spark, s, seeds, 4, cfg.copy(filterShards = 5))
    val sB = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-monobloom"))
    Crawler.run(spark, sB, seeds, 4, cfg)
    assert(Crawler.seenDigest(spark, s) === Crawler.seenDigest(spark, sB))
    val o1 = Crawler.ordering(spark, s).as[(Int, Long, String)].collect().toSeq
    val o2 = Crawler.ordering(spark, sB).as[(Int, Long, String)].collect().toSeq
    assert(o1 === o2)
    (0 to 4).foreach(k => assert(s.manifest(k) === sB.manifest(k)))
    // the shard files really exist and carry the whole seen set across shards
    assert(s.filterShardsExist(s.head.get, 5))
  }

  test("robots forms: fused (default), map, and join produce the identical crawl") {
    val sF = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-robotsfused"))
    Crawler.run(spark, sF, seeds, 3, cfg) // default robotsForm = "fused"
    val sM = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-robotsmap"))
    Crawler.run(spark, sM, seeds, 3, cfg.copy(robotsForm = "map"))
    val sJ = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-robotsjoin"))
    Crawler.run(spark, sJ, seeds, 3, cfg.copy(robotsForm = "join"))
    val oF = Crawler.ordering(spark, sF).as[(Int, Long, String)].collect().toSeq
    for (s <- Seq(sM, sJ)) {
      assert(Crawler.seenDigest(spark, s) === Crawler.seenDigest(spark, sF))
      val o = Crawler.ordering(spark, s).as[(Int, Long, String)].collect().toSeq
      assert(o === oF)
      (0 to 3).foreach(k => assert(s.manifest(k) === sF.manifest(k)))
    }
  }

  test("invariant report: six checks, zero violations on the golden crawl") {
    val rep = Crawler.invariantReport(spark, store).orderBy($"check_idx").collect()
    assert(rep.length === 6)
    assert(rep.forall(_.getAs[Long]("n_violations") === 0L),
      rep.map(r => s"${r.get(1)}=${r.get(2)}").mkString(", "))
  }

  test("invariant report runs as ONE action at any snapshot count") {
    // r06: the per-snapshot manifest cross-check used to run 2 driver-side
    // count() actions per committed snapshot (O(rounds) serial actions at a
    // long-horizon store); all six checks now aggregate as branches of one
    // union plan behind a single collect. Lock the SQL-execution count so
    // the O(rounds) loop cannot silently return. (Job count is not the lock:
    // with AQE on, one action legitimately materializes one job per shuffle
    // stage — those schedule concurrently inside the one execution.)
    val st = store // force the lazy golden-crawl fixture BEFORE counting
    st.head
    val execs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execs.incrementAndGet()
        case _ => ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Crawler.invariantReport(spark, st)
      // the listener bus is async: wait for the first event, then a settle
      // window to catch any unexpected extra executions
      val deadline = System.nanoTime() + 5000000000L
      while (execs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(500)
      assert(execs.get() === 1, s"expected 1 SQL execution, saw ${execs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("seen-join forms: scan (default) and shuffle produce the identical crawl") {
    // the shared golden `store` runs the default scan form; the shuffle form
    // (plain left-anti) must yield the same crawl bit-for-bit — the join
    // form is a physical choice, never a semantic one. Exact-only
    // (useBloom=false) exercises the unfiltered path, which always takes
    // the shuffle form regardless of config.
    val sSh = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-seenshuffle"))
    Crawler.run(spark, sSh, seeds, Rounds, cfg.copy(seenJoin = "shuffle"))
    val sEx = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-seenexact"))
    Crawler.run(spark, sEx, seeds, Rounds, cfg.copy(useBloom = false))
    val oF = Crawler.ordering(spark, store).as[(Int, Long, String)].collect().toSeq
    for (s <- Seq(sSh, sEx)) {
      assert(Crawler.seenDigest(spark, s) === Crawler.seenDigest(spark, store))
      val o = Crawler.ordering(spark, s).as[(Int, Long, String)].collect().toSeq
      assert(o === oF)
      (0 to Rounds).foreach(k => assert(s.manifest(k) === store.manifest(k)))
    }
  }

  test("salting: salt-all (default), hot-threshold, and unsalted gates are identical") {
    // keep-proof in practice, all three policies: every host salted via the
    // codegen pmod column (default), only threshold-hot hosts salted via the
    // broadcast-map UDF (needs a counts pass → map form), and no salting
    val saltAll = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-saltall"))
    Crawler.run(spark, saltAll, seeds, 3, cfg.copy(saltBuckets = 4))
    val hotOnly = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-salt"))
    Crawler.run(spark, hotOnly, seeds, 3, cfg.copy(robotsForm = "map",
      saltAllHosts = false, hotHostThreshold = 1, saltBuckets = 4))
    val plain = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-plain"))
    Crawler.run(spark, plain, seeds, 3, cfg.copy(saltAllHosts = false))
    val o1 = Crawler.ordering(spark, saltAll).as[(Int, Long, String)].collect().toSeq
    val o2 = Crawler.ordering(spark, hotOnly).as[(Int, Long, String)].collect().toSeq
    val o3 = Crawler.ordering(spark, plain).as[(Int, Long, String)].collect().toSeq
    assert(o1 === o3)
    assert(o2 === o3)
    assert(Crawler.seenDigest(spark, saltAll) === Crawler.seenDigest(spark, plain))
    assert(Crawler.seenDigest(spark, hotOnly) === Crawler.seenDigest(spark, plain))
  }

  test("text extraction is byte-stable: sha256 recomputes identically") {
    val k = store.head.get
    val rows = store.loadAllPages(k).filter($"status" === 200)
      .select($"url", $"text", $"text_sha256")
      .as[(String, String, String)].take(50)
    assert(rows.nonEmpty)
    rows.foreach { case (url, text, sha) =>
      assert(graft.core.Hashes.sha256Hex(text) === sha)
      assert(graft.core.TextExtract.extract(SyntheticWeb.htmlFor(url)) === text)
    }
  }

  // --- golden replay (SURVEY.md §5.3): the committed files define the
  // reference; the crawl must reproduce them byte-for-byte -----------------
  private def golden(name: String): String =
    new String(getClass.getResourceAsStream(s"/golden/$name").readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)

  test("golden: crawl ordering matches the frozen ordering.csv") {
    val got = Crawler.ordering(spark, store).as[(Int, Long, String)].collect()
      .map { case (r, s, u) => s"$r,$s,$u" }
    assert("round,seq,url\n" + got.mkString("\n") + "\n" === golden("ordering.csv"))
  }

  test("golden: final URL-seen digest matches seen_digest.txt") {
    val (n, hsum, hxor) = Crawler.seenDigest(spark, store)
    assert(s"$n,$hsum,$hxor\n" === golden("seen_digest.txt"))
  }

  test("golden: per-url text sha256 matches text_sha256.csv (byte-identical invariant)") {
    val got = Crawler.textShas(spark, store).as[(String, String)].collect()
      .sortBy(_._1).map { case (u, s) => s"$u,$s" }
    assert("url,sha256\n" + got.mkString("\n") + "\n" === golden("text_sha256.csv"))
  }

  test("seen compaction: compacted layout reproduces the identical crawl and seen set") {
    val cA = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-compact"))
    Crawler.run(spark, cA, seeds, 4, cfg.copy(compactSeenEvery = 2))
    // a seen_full base exists and is read instead of all deltas
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(cA.seenFullPath(4))))
    val cB = new SnapshotStore(spark, SparkTestSession.tempDir("crawl-nocompact"))
    Crawler.run(spark, cB, seeds, 4, cfg.copy(compactSeenEvery = 0))
    assert(Crawler.seenDigest(spark, cA) === Crawler.seenDigest(spark, cB))
    val o1 = Crawler.ordering(spark, cA).as[(Int, Long, String)].collect().toSeq
    val o2 = Crawler.ordering(spark, cB).as[(Int, Long, String)].collect().toSeq
    assert(o1 === o2)
    // resume on top of a compacted store stays consistent
    Crawler.run(spark, new SnapshotStore(spark, cA.root), seeds, 5,
      cfg.copy(compactSeenEvery = 2))
    Crawler.run(spark, new SnapshotStore(spark, cB.root), seeds, 5,
      cfg.copy(compactSeenEvery = 0))
    assert(Crawler.seenDigest(spark, new SnapshotStore(spark, cA.root))
      === Crawler.seenDigest(spark, new SnapshotStore(spark, cB.root)))
  }

  test("404 pages carry no text and no links but are marked seen") {
    val k = store.head.get
    val errs = store.loadAllPages(k).filter($"status" =!= 200)
    assert(errs.filter(length($"text") > 0 || size($"links") > 0).count() === 0)
  }
}
