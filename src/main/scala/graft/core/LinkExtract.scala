package graft.core

import java.util.regex.Pattern
import scala.collection.mutable.LinkedHashSet

/** Outlink extraction (SURVEY.md §2.8 C5): find `href` attributes of `<a>` tags,
  * resolve + canonicalize each against the page URL, drop non-fetchable ones,
  * de-duplicate keeping first occurrence (pinned order: document order).
  *
  * Used as the `flatMap` body of the typed parse stage — this IS the UDTF surface
  * (SURVEY.md §2.10): a Dataset `flatMap` beats a custom Catalyst `Generator` here
  * because the surrounding stage is already an opaque fetch/parse `mapPartitions`.
  */
object LinkExtract {

  private val ATag = Pattern.compile("(?is)<a[\\s/][^>]*>")
  private val Href = Pattern.compile(
    "(?is)\\bhref\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>]+))")

  /** All canonical outlinks of `html` relative to absolute page URL `baseUrl`. */
  def extract(html: String, baseUrl: String): Vector[String] = {
    val seen = LinkedHashSet.empty[String]
    val m = ATag.matcher(html)
    while (m.find()) {
      val tag = m.group()
      val hm = Href.matcher(tag)
      if (hm.find()) {
        val raw =
          if (hm.group(1) != null) hm.group(1)
          else if (hm.group(2) != null) hm.group(2)
          else hm.group(3)
        UrlCanon.canonicalize(baseUrl, raw).foreach(seen.add)
      }
    }
    seen.toVector
  }

  def extract(html: Array[Byte], baseUrl: String): Vector[String] =
    extract(new String(html, java.nio.charset.StandardCharsets.UTF_8), baseUrl)
}
