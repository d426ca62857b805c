package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Determinism + distribution sanity of the synthetic web (SURVEY.md §8.4). */
class SyntheticWebSpec extends AnyFunSuite {

  test("everything is a pure function of the url string") {
    val u = SyntheticWeb.seeds(1).head
    assert(SyntheticWeb.htmlFor(u) === SyntheticWeb.htmlFor(u))
    assert(SyntheticWeb.hrefsFor(u) === SyntheticWeb.hrefsFor(u))
    assert(SyntheticWeb.robotsBody("host1.example") === SyntheticWeb.robotsBody("host1.example"))
    assert(SyntheticWeb.status(u) === SyntheticWeb.status(u))
  }

  test("seed list: right size, distinct, canonical") {
    val s = SyntheticWeb.seeds(20)
    assert(s.size === 20)
    assert(s.distinct.size === 20)
    s.foreach(u => assert(UrlCanon.canonical(u) === Some(u)))
  }

  test("host distribution is zipfian-skewed (hot hosts exist)") {
    val urls = (0 until 2000).map(i => SyntheticWeb.urlFor(Hashes.mix(7L, i.toLong)))
    val byHost = urls.groupBy(UrlCanon.hostOf).view.mapValues(_.size).toMap
    val top = byHost.values.max
    assert(top > 100, s"expected a hot host, top count was $top") // ~15% under zipf 1.1
    assert(byHost.size > 200, "should still touch many hosts")
  }

  test("404 rate is ~1/47") {
    val urls = (0 until 2000).map(i => SyntheticWeb.urlFor(Hashes.mix(11L, i.toLong)))
    val n404 = urls.count(SyntheticWeb.status(_) == 404)
    assert(n404 > 10 && n404 < 130, s"404s = $n404")
  }

  test("robots bodies parse and sometimes restrict") {
    val hosts = (0 until 200).map(i => s"host$i.example")
    val rules = hosts.map(SyntheticWeb.robotsFor)
    assert(rules.exists(_.disallow.nonEmpty))
    assert(rules.exists(_.disallow.isEmpty))
    assert(rules.exists(_.crawlDelayMs > 0))
    assert(rules.forall(r => r.crawlDelayMs >= 0 && r.crawlDelayMs <= 5000))
  }

  test("outlinks: 4..12 per page, canonicalizable against the page") {
    SyntheticWeb.seeds(20).foreach { u =>
      val hrefs = SyntheticWeb.hrefsFor(u)
      assert(hrefs.size >= 4 && hrefs.size <= 12)
      val canon = hrefs.flatMap(h => UrlCanon.canonicalize(u, h))
      assert(canon.nonEmpty)
    }
  }
}
