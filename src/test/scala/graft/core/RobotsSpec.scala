package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 matcher vectors (SURVEY.md §8.5, FIXTURES.md §3). */
class RobotsSpec extends AnyFunSuite {

  test("basic disallow + crawl-delay") {
    val r = Robots.parse("User-agent: *\nDisallow: /private\nCrawl-delay: 2\n")
    assert(r.crawlDelayMs === 2000L)
    assert(r.allowed("/public/x"))
    assert(!r.allowed("/private"))
    assert(!r.allowed("/private/x"))
    assert(r.allowed("/privat"))
  }

  test("longest match wins; allow beats disallow on tie") {
    val r = Robots.parse("User-agent: *\nDisallow: /a\nAllow: /a/b\n")
    assert(!r.allowed("/a/x"))
    assert(r.allowed("/a/b/c"))
    val tie = Robots.parse("User-agent: *\nDisallow: /x\nAllow: /x\n")
    assert(tie.allowed("/x/y"))
  }

  test("specific agent group replaces the * group") {
    val body = "User-agent: graft\nDisallow: /g\n\nUser-agent: *\nDisallow: /s\n"
    val r = Robots.parse(body, agent = "graft")
    assert(!r.allowed("/g/x"))
    assert(r.allowed("/s/x"))
    val other = Robots.parse(body, agent = "elsebot")
    assert(other.allowed("/g/x"))
    assert(!other.allowed("/s/x"))
  }

  test("stacked user-agent lines share one group") {
    val r = Robots.parse("User-agent: a\nUser-agent: *\nDisallow: /x\n")
    assert(!r.allowed("/x/1"))
  }

  test("empty disallow matches nothing; comments stripped; missing file permissive") {
    val r = Robots.parse("User-agent: *\nDisallow: # everything allowed\n")
    assert(r.allowed("/anything"))
    assert(Robots.parse("").allowed("/x"))
    assert(Robots.Permissive.allowed("/x"))
  }

  test("fractional crawl-delay, case-insensitive keys") {
    val r = Robots.parse("USER-AGENT: *\nCRAWL-DELAY: 0.5\ndisallow: /q\n")
    assert(r.crawlDelayMs === 500L)
    assert(!r.allowed("/q/1"))
  }
}
