package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.SyntheticWeb
import graft.plans.Model.CrawlConfig
import graft.sources.SnapshotStore

/** Opt-in adaptive politeness backoff (CrawlConfig.adaptiveBackoff): hosts
  * over the previous round's error-rate threshold get half budget. The
  * default-off path is pinned by the existing goldens; these tests pin the
  * ON behavior and the no-trigger equivalence. */
class AdaptiveBackoffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def crawl(cfg: CrawlConfig, tag: String): SnapshotStore = {
    val store = new SnapshotStore(spark, SparkTestSession.tempDir(tag))
    Crawler.run(spark, store, SyntheticWeb.seeds(10), 3, cfg)
    store
  }

  test("hosts with any previous-round error are capped at half budget next round") {
    val cfg = CrawlConfig(roundCap = 500, hostBudget = 4,
      adaptiveBackoff = true, backoffErrorRate = 0.0)
    val store = crawl(cfg, "backoff-on")
    var checked = 0L
    (1 to 2).foreach { k =>
      // pages in snapshot k were fetched by run(k-1); run(k) reads them as
      // its backoff signal and commits its own fetches into snapshot k+1
      val bad = store.loadPages(k).toDF().groupBy($"host")
        .agg(sum(when($"status" =!= 200, 1L).otherwise(0L)).as("errs"))
        .filter($"errs" > 0).select("host").as[String].collect().toSet
      val nextCounts = store.loadPages(k + 1).toDF()
        .groupBy($"host").count().as[(String, Long)].collect().toMap
      val violations = bad.flatMap(h => nextCounts.get(h).filter(_ > 2).map(h -> _))
      assert(violations.isEmpty, s"round $k bad hosts over half budget: $violations")
      checked += bad.count(nextCounts.contains)
    }
    assert(checked > 0, "no backed-off host was ever re-fetched — test vacuous")
  }

  test("backoff that never triggers is byte-identical to the fixed-budget crawl") {
    val base = crawl(CrawlConfig(roundCap = 500, hostBudget = 4), "backoff-base")
    val noTrig = crawl(CrawlConfig(roundCap = 500, hostBudget = 4,
      adaptiveBackoff = true, backoffErrorRate = 1.1), "backoff-notrig")
    val o1 = Crawler.ordering(spark, base).collect().toSeq
    val o2 = Crawler.ordering(spark, noTrig).collect().toSeq
    assert(o1 === o2)
    assert(Crawler.seenDigest(spark, base) === Crawler.seenDigest(spark, noTrig))
  }
}
