package graft.core

import graft.core.Hashes.{mix, xxh64}

/** Deterministic synthetic web (SURVEY.md §8.4, FIXTURES.md §1/§4).
  *
  * Every artifact — HTML body, robots.txt, fetch status — is a pure function of
  * the URL/host string, seeded through xxHash64. No RNG state, no network, no
  * external data (driver instruction; the sandbox is zero-egress). The host
  * universe is zipfian (s ≈ 1.1 over 10k hosts) so a handful of hot hosts
  * dominate the frontier, exercising the two-phase salted politeness top-k
  * (SURVEY.md §4.3).
  *
  * Fetch results embed outlinks in several href shapes (absolute, rooted,
  * relative, `../`, query+fragment, uppercase-host+default-port, disallowed
  * paths) so one crawl exercises the whole canonicalizer + robots surface.
  */
object SyntheticWeb {

  val NumHosts = 10000
  val ZipfS = 1.1

  private val Words: Array[String] =
    ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi " +
      "omicron pi rho sigma tau upsilon phi chi psi omega amber birch cedar dune " +
      "ember flint grove harbor inlet juniper kelp lagoon marsh nectar orchid " +
      "prairie quartz ridge summit thicket umbra vale willow yonder zephyr arc " +
      "bolt cove drift echo fjord glen helm isle knoll loch mesa nook onyx peak").split(' ')

  /** Zipf CDF over host ranks: w_i = 1/(i+1)^s. */
  private lazy val zipfCum: Array[Double] = {
    val w = Array.tabulate(NumHosts)(i => 1.0 / math.pow(i + 1.0, ZipfS))
    val total = w.sum
    val cum = new Array[Double](NumHosts)
    var acc = 0.0
    var i = 0
    while (i < NumHosts) { acc += w(i) / total; cum(i) = acc; i += 1 }
    cum(NumHosts - 1) = 1.0
    cum
  }

  private def u01(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  def hostIdx(h: Long): Int = {
    val u = u01(h)
    var lo = 0; var hi = NumHosts - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCum(mid) < u) lo = mid + 1 else hi = mid
    }
    lo
  }

  def hostFor(h: Long): String = s"host${hostIdx(h)}.example"

  private def word(h: Long): String = Words(((h % Words.length) + Words.length).toInt % Words.length)

  private def pathFor(h: Long): String = {
    val depth = 1 + (math.floorMod(mix(h, 7), 3)).toInt
    val sb = new StringBuilder
    var i = 0
    while (i < depth) {
      sb.append('/').append(word(mix(h, 11 + i)))
      i += 1
    }
    sb.append('/').append((mix(h, 17) & 0xffffL).toString)
    sb.toString
  }

  /** A canonical-form URL drawn deterministically from hash h. */
  def urlFor(h: Long): String = "http://" + hostFor(mix(h, 3)) + pathFor(mix(h, 5))

  /** Deterministic seed list (FIXTURES.md §3: 20 URLs, seed 42). */
  def seeds(n: Int, seed: Long = 42L): Vector[String] =
    (0 until n).map(i => urlFor(mix(seed, 100000 + i))).toVector

  // --- robots ---------------------------------------------------------------

  private val DisallowPool = Vector("/private", "/admin", "/tmp")

  def robotsBody(host: String): String = {
    val h = xxh64(host)
    val delay = Array(0L, 1L, 2L, 5L)(math.floorMod(mix(h, 19), 4).toInt)
    val nDis = math.floorMod(mix(h, 23), 4).toInt // 0..3
    val dis = DisallowPool.take(nDis)
    val sb = new StringBuilder("User-agent: *\n")
    if (delay > 0) sb.append(s"Crawl-delay: $delay\n")
    dis.foreach(d => sb.append(s"Disallow: $d\n"))
    sb.toString
  }

  def robotsFor(host: String): Robots.Rules = Robots.parse(robotsBody(host))

  // --- fetch ------------------------------------------------------------------

  final case class Fetched(status: Int, html: String)

  def status(url: String): Int =
    if (math.floorMod(mix(xxh64(url), 13), 47) == 0) 404 else 200

  /** Hrefs embedded in the page at `url` — several syntactic shapes on purpose. */
  def hrefsFor(url: String): Vector[String] = {
    val seed = xxh64(url)
    val n = 4 + math.floorMod(mix(seed, 2), 9).toInt // 4..12 outlinks
    (0 until n).map { j =>
      val h = mix(seed, 200 + j)
      math.floorMod(mix(h, 29), 10).toInt match {
        case 0 | 1 | 2 | 3 => urlFor(h)                       // absolute
        case 4 => // uppercase scheme+host, default port — canonicalizer fodder
          val t = urlFor(h)
          "HTTP://" + UrlCanon.hostOf(t).toUpperCase + ":80" + UrlCanon.pathOf(t)
        case 5 => pathFor(h)                                   // rooted relative
        case 6 => word(h) + "/" + (mix(h, 31) & 0xffL).toString // dir-relative
        case 7 => "../" + word(h)                              // dot-dot relative
        case 8 => "/private/" + word(h)                        // usually disallowed
        case _ => urlFor(h) + "?q=" + (mix(h, 37) & 0xffL) + "&lang=en#frag"
      }
    }.toVector
  }

  private def sentence(h: Long, words: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < words) {
      if (i > 0) sb.append(' ')
      val w = mix(h, 41 + i)
      // sprinkle entities through the corpus — extractor fodder
      if (math.floorMod(w, 17) == 0) sb.append("&amp;")
      else if (math.floorMod(w, 29) == 1) sb.append("&quot;").append(word(w)).append("&quot;")
      else sb.append(word(w))
      i += 1
    }
    sb.toString
  }

  def htmlFor(url: String): String = {
    val seed = xxh64(url)
    val title = "Page " + java.lang.Long.toHexString(seed)
    val hrefs = hrefsFor(url)
    // 25..64 paragraphs of 30..79 words — pages land in the tens-of-KB range
    // of real web pages, so text extraction carries realistic CPU weight
    val nPara = 25 + math.floorMod(mix(seed, 1), 40).toInt
    val sb = new StringBuilder(32768)
    sb.append("<!DOCTYPE html>\n<html><head><title>").append(title)
      .append("</title>\n<style>p { color: #222; }</style>\n<script>var v=")
      .append(seed & 0xffffL).append(";</script></head>\n<body>\n<h1>")
      .append(title).append("</h1>\n")
    var i = 0
    while (i < nPara) {
      sb.append("<p>").append(sentence(mix(seed, 500 + i), 30 + math.floorMod(mix(seed, 600 + i), 50).toInt))
      if (i < hrefs.length) {
        sb.append(" <a href=\"").append(hrefs(i)).append("\">")
          .append(word(mix(seed, 700 + i))).append("</a>")
      }
      sb.append("</p>\n")
      i += 1
    }
    if (hrefs.length > nPara) {
      sb.append("<ul>\n")
      hrefs.drop(nPara).zipWithIndex.foreach { case (href, k) =>
        sb.append("<li><a href='").append(href).append("'>")
          .append(word(mix(seed, 800 + k))).append("</a></li>\n")
      }
      sb.append("</ul>\n")
    }
    sb.append("<!-- id ").append(seed).append(" -->\n</body></html>\n")
    sb.toString
  }

  /** The "network": deterministic fetch. 404s carry an empty body. */
  def fetch(url: String): Fetched = {
    val st = status(url)
    if (st == 200) Fetched(st, htmlFor(url)) else Fetched(st, "")
  }
}
