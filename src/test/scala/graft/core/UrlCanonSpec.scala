package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Locks the normative canonicalizer (SURVEY.md §8.2). The RFC 3986 §5.4
  * reference-resolution examples are public spec vectors; everything else pins
  * OUR canonical form (the reference repo is unrecoverable — SURVEY.md §0.1).
  * Property tests sample scalacheck Gens directly (no scalatestplus bridge in
  * the offline cache) with fixed seeds — fully deterministic. */
class UrlCanonSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int, seed: Long = 42L): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val Base = "http://a/b/c/d;p?q"

  private val rfcNormal = Seq(
    "g:h" -> "g:h",
    "g" -> "http://a/b/c/g",
    "./g" -> "http://a/b/c/g",
    "g/" -> "http://a/b/c/g/",
    "/g" -> "http://a/g",
    "//g" -> "http://g",
    "?y" -> "http://a/b/c/d;p?y",
    "g?y" -> "http://a/b/c/g?y",
    "#s" -> "http://a/b/c/d;p?q#s",
    "g#s" -> "http://a/b/c/g#s",
    "g?y#s" -> "http://a/b/c/g?y#s",
    ";x" -> "http://a/b/c/;x",
    "g;x" -> "http://a/b/c/g;x",
    "g;x?y#s" -> "http://a/b/c/g;x?y#s",
    "" -> "http://a/b/c/d;p?q",
    "." -> "http://a/b/c/",
    "./" -> "http://a/b/c/",
    ".." -> "http://a/b/",
    "../" -> "http://a/b/",
    "../g" -> "http://a/b/g",
    "../.." -> "http://a/",
    "../../" -> "http://a/",
    "../../g" -> "http://a/g")

  private val rfcAbnormal = Seq(
    "../../../g" -> "http://a/g",
    "../../../../g" -> "http://a/g",
    "/./g" -> "http://a/g",
    "/../g" -> "http://a/g",
    "g." -> "http://a/b/c/g.",
    ".g" -> "http://a/b/c/.g",
    "g.." -> "http://a/b/c/g..",
    "..g" -> "http://a/b/c/..g",
    "./../g" -> "http://a/b/g",
    "./g/." -> "http://a/b/c/g/",
    "g/./h" -> "http://a/b/c/g/h",
    "g/../h" -> "http://a/b/c/h",
    "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
    "g;x=1/../y" -> "http://a/b/c/y",
    "g?y/./x" -> "http://a/b/c/g?y/./x",
    "g?y/../x" -> "http://a/b/c/g?y/../x",
    "g#s/./x" -> "http://a/b/c/g#s/./x",
    "g#s/../x" -> "http://a/b/c/g#s/../x",
    "http:g" -> "http:g")

  test("RFC 3986 §5.4.1 normal resolution examples") {
    rfcNormal.foreach { case (ref, expected) =>
      assert(UrlCanon.resolveRaw(Base, ref) === expected, s"ref=$ref")
    }
  }

  test("RFC 3986 §5.4.2 abnormal resolution examples (strict)") {
    rfcAbnormal.foreach { case (ref, expected) =>
      assert(UrlCanon.resolveRaw(Base, ref) === expected, s"ref=$ref")
    }
  }

  private val canonVectors = Seq(
    ("http://Example.COM:80/a/../b", "", Some("http://example.com/b")),
    ("HTTPS://EXAMPLE.com:443/x", "", Some("https://example.com/x")),
    ("http://example.com", "", Some("http://example.com/")),
    ("http://example.com/?", "", Some("http://example.com/")),
    ("http://example.com/a/b", "%7Efoo%2Fbar", Some("http://example.com/a/~foo%2Fbar")),
    ("http://example.com/a/b", "%7efoo%2fbar", Some("http://example.com/a/~foo%2Fbar")),
    ("http://e.com/x", "y?b=2&a=1#z", Some("http://e.com/y?b=2&a=1")),
    ("http://e.com/x/y/", "../z", Some("http://e.com/x/z")),
    ("http://e.com/x", "//other.com/p", Some("http://other.com/p")),
    ("http://e.com/x", "HTTPS://Other.COM/P?Q=1", Some("https://other.com/P?Q=1")),
    ("http://e.com/x", " /sp aced ", Some("http://e.com/sp aced")),
    ("http://e.com/x", "/tab\tnew\nline", Some("http://e.com/tabnewline")),
    ("http://e.com/x", "ftp://e.com/y", None),
    ("http://e.com/x", "javascript:void(0)", None),
    ("http://e.com/x", "mailto:a@b.c", None),
    ("http://e.com/x", "http://", None),
    ("http://e.com:8080/x", "y", Some("http://e.com:8080/y")),
    ("http://user:pw@e.com/x", "y", Some("http://user:pw@e.com/y")),
    ("http://[::1]:443/x", "y", Some("http://[::1]:443/y")),
    ("https://[::1]:443/x", "y", Some("https://[::1]/y")))

  test("canonicalization vectors (normative, SURVEY.md §8.2)") {
    canonVectors.foreach { case (base, href, expected) =>
      assert(UrlCanon.canonicalize(base, href) === expected, s"base=$base href=$href")
    }
  }

  test("overlong URLs rejected") {
    val long = "http://e.com/" + ("x" * 2400)
    assert(UrlCanon.canonical(long).isEmpty)
    assert(UrlCanon.canonicalize("http://e.com/", "/" + ("y" * 2400)).isEmpty)
  }

  test("hostOf / pathOf on canonical forms") {
    assert(UrlCanon.hostOf("http://user@h.com:8080/a/b?q") === "h.com")
    assert(UrlCanon.hostOf("http://[::1]:8080/a") === "[::1]")
    assert(UrlCanon.pathOf("http://h.com") === "/")
    assert(UrlCanon.pathOf("http://h.com/a/b?q=1") === "/a/b")
  }

  private val messyUrlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HtTpS")
    host <- Gen.oneOf("Example.COM", "a.b.c", "HOST7.example", "x--y.z")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.listOfN(3, Gen.oneOf("a", "..", ".", "B%2f", "%7e", "p q", "09"))
    q <- Gen.oneOf("", "?a=1&b=%2F", "?")
    f <- Gen.oneOf("", "#frag")
  } yield s"$scheme://$host$port/${segs.mkString("/")}$q$f"

  test("property: canonical is idempotent") {
    samples(messyUrlGen, 500).foreach { u =>
      UrlCanon.canonical(u).foreach { c =>
        assert(UrlCanon.canonical(c) === Some(c), s"u=$u c=$c")
      }
    }
  }

  test("property: canonicalize(base, href) output is a fixpoint of canonical") {
    val hrefGen = Gen.oneOf("g", "../g", "./g/.", "/x/../y", "g?b=2", "#s", "",
      "//Other.COM/Z", "%41%2f", "a/b/../../../c")
    samples(Gen.zip(messyUrlGen, hrefGen), 500).foreach { case (base, href) =>
      UrlCanon.canonicalize(base, href).foreach { c =>
        assert(UrlCanon.canonical(c) === Some(c), s"base=$base href=$href c=$c")
      }
    }
  }
}
