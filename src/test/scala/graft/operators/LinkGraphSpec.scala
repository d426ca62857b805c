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
}
