package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class LinkGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pagerank: uniform on a cycle, sums to 1, hub beats spokes on a star") {
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val pr = LinkGraph.pageRank(cycle, iterations = 20)
      .as[(String, Double)].collect().toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9))

    // star: spokes all point at the hub; hub points back at one spoke
    val star = Seq(("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1"))
      .toDF("src", "dst")
    val prS = LinkGraph.pageRank(star, iterations = 30).as[(String, Double)]
      .collect().toMap
    assert(math.abs(prS.values.sum - 1.0) < 1e-9)
    assert(prS("hub") > prS("s1") && prS("s1") > prS("s2"))
    assert(prS("s2") === prS("s3"))
  }

  test("pagerank handles dangling vertices (rank mass conserved)") {
    val g = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst") // c dangles
    val pr = LinkGraph.pageRank(g, iterations = 25).as[(String, Double)]
      .collect().toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    assert(pr("c") > pr("b") && pr("b") > pr("a"))
  }

  test("degrees and host edges over a real crawled graph") {
    val store = {
      val s = new graft.sources.SnapshotStore(spark,
        graft.SparkTestSession.tempDir("crawl-graph"))
      Crawler.run(spark, s, graft.core.SyntheticWeb.seeds(10), 2,
        graft.plans.Model.CrawlConfig(roundCap = 200))
      s
    }
    val e = LinkGraph.edges(store.loadAllPages(store.head.get)).persist()
    assert(e.count() > 100)
    val d = LinkGraph.degrees(e)
    assert(d.filter($"out_degree" === 0 && $"in_degree" === 0).count() === 0)
    // every crawled page's outlink count shows up as its out_degree
    val he = LinkGraph.hostEdges(e)
    assert(he.count() > 0)
    assert(he.agg(sum($"n_links")).as[Long].head() === e.count())
    val pr = LinkGraph.pageRank(e, iterations = 5)
    assert(math.abs(pr.agg(sum($"rank")).as[Double].head() - 1.0) < 1e-6)
    e.unpersist()
  }

  test("reprioritize: percentile buckets match the naive window; unranked rows untouched") {
    import graft.plans.Model.FrontierEntry
    def fe(i: Long) = FrontierEntry(s"https://h$i.example.com/", i, i, i,
      s"h$i.example.com", priority = 5, next_fetch_ts = 1000L + i,
      discovered_round = 0, retries = 0)
    val frontier = spark.createDataset((0L until 40L).map(fe))
    // rank 30 of the 40 urls; rank value grows with i, so high-i → high rank
    val ranks = (0L until 30L).map(i => (s"https://h$i.example.com/", (i + 1) / 100.0))
      .toDF("url", "rank")
    val (out0, caches) = LinkGraph.reprioritize(frontier, ranks, buckets = 10)
    val out = out0.persist()
    assert(out.count() === 40L)
    // unranked urls (30..39) keep priority 5 and every other field
    val untouched = out.filter($"url_hash" >= 30L).collect()
    assert(untouched.length === 10 && untouched.forall(_.priority == 5))
    // naive oracle: row_number over rank desc → bucket = (nb-1) - (rn-1)*nb/n
    val got = out.filter($"url_hash" < 30L)
      .select($"url_hash", $"priority").as[(Long, Int)].collect().toMap
    val expected = (0L until 30L).map { i =>
      val pos = 29L - i // i=29 has the best rank → pos 0
      i -> (9L - pos * 10L / 30L).toInt
    }.toMap
    assert(got === expected)
    // non-priority fields pass through unchanged
    val r7 = out.filter($"url_hash" === 7L).head()
    assert(r7.next_fetch_ts === 1007L && r7.retries === 0 && r7.host === "h7.example.com")
    // single bucket degenerates to all-zero priorities for ranked rows
    val (one, caches1) = LinkGraph.reprioritize(frontier, ranks, buckets = 1)
    assert(one.filter($"url_hash" < 30L).select($"priority").distinct().as[Int].collect().toSeq === Seq(0))
    out.unpersist()
    (caches ++ caches1).foreach(_.unpersist(false))
  }
}
