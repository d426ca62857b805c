package graft.core

import org.scalatest.funsuite.AnyFunSuite

class LinkExtractSpec extends AnyFunSuite {

  private val base = "http://h.example/a/b"

  test("href shapes: quoted, single-quoted, unquoted, relative, rooted") {
    val html =
      """<a href="/x">1</a> <a href='y'>2</a> <a href=../z>3</a>
        |<a class="k" href="http://other.example/p#frag">4</a>""".stripMargin
    assert(LinkExtract.extract(html, base) === Vector(
      "http://h.example/x",
      "http://h.example/a/y",
      "http://h.example/z",
      "http://other.example/p"))
  }

  test("duplicates collapse keeping first; non-http dropped; anchors without href dropped") {
    val html =
      """<a href="/x">1</a><a href="/x">again</a><a name="n">no href</a>
        |<a href="mailto:a@b">m</a><a href="javascript:f()">j</a>""".stripMargin
    assert(LinkExtract.extract(html, base) === Vector("http://h.example/x"))
  }

  test("case-insensitive tag and attribute, multiline tags") {
    val html = "<A\n  HREF=\"/up\">U</A>"
    assert(LinkExtract.extract(html, base) === Vector("http://h.example/up"))
  }

  test("synthetic pages yield only canonical fixpoint links") {
    SyntheticWeb.seeds(10).foreach { url =>
      val links = LinkExtract.extract(SyntheticWeb.htmlFor(url), url)
      assert(links.nonEmpty)
      links.foreach { l =>
        assert(l.startsWith("http://"), l)
        assert(UrlCanon.canonical(l) === Some(l), s"not a fixpoint: $l")
      }
      assert(links.distinct === links)
    }
  }
}
