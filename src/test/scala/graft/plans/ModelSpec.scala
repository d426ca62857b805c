package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Model.CrawlConfig

/** CrawlConfig enum knobs fail loudly on construction: the robots forms and
  * filter kinds are output-equivalent, so a typo ('fsued') silently selecting
  * a different code path would run — and measure — the wrong implementation
  * without any observable output difference (ADVICE round 4). */
class ModelSpec extends AnyFunSuite {

  test("valid enum values construct") {
    Seq("fused", "map", "join").foreach(f => CrawlConfig(robotsForm = f))
    Seq("bloom", "cuckoo").foreach(k => CrawlConfig(filterKind = k))
  }

  test("a typo'd robotsForm throws instead of falling back to a default") {
    val e = intercept[IllegalArgumentException](CrawlConfig(robotsForm = "fsued"))
    assert(e.getMessage.contains("fsued"))
  }

  test("a typo'd filterKind throws instead of falling back to a default") {
    val e = intercept[IllegalArgumentException](CrawlConfig(filterKind = "blom"))
    assert(e.getMessage.contains("blom"))
  }

  test("a typo'd seenJoin throws instead of falling back to a default") {
    val e = intercept[IllegalArgumentException](CrawlConfig(seenJoin = "scam"))
    assert(e.getMessage.contains("scam"))
  }
}
