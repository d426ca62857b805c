package graft.functions

import graft.core.Hashes

/** Pure text-analysis primitives for the training-data pipeline operators
  * (builder prompt: dedup / language-ID / quality / token counting /
  * fingerprinting over the `documents` table). No Spark imports — each
  * function is used inside typed maps or registered UDFs, and unit-testable
  * without a session. All hashing goes through xxh64 (graft.core.Hashes) so
  * driver-side and executor-side values agree bit-for-bit.
  */
object TextAnalysis {

  // --- tokenization ----------------------------------------------------------

  /** Whitespace tokens (lowercased). */
  def tokens(text: String): Array[String] = {
    val t = text.toLowerCase.split("\\s+")
    if (t.length == 1 && t(0).isEmpty) Array.empty else t
  }

  /** BPE-ish subword-boundary count: runs of alphanumerics plus each single
    * punctuation mark — the standard cheap proxy for a trained tokenizer. */
  private val BpeToken = java.util.regex.Pattern.compile("[A-Za-z0-9]+|[^A-Za-z0-9\\s]")
  def bpeTokenCount(text: String): Int = {
    val m = BpeToken.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** Word n-gram shingles, hashed to 64 bits. Distinct, unordered. */
  def shingles(text: String, n: Int = 3): Array[Long] = {
    val tk = tokens(text)
    if (tk.length < n) {
      if (tk.isEmpty) Array.empty else Array(Hashes.xxh64(tk.mkString(" ")))
    } else {
      val out = new java.util.HashSet[Long]()
      var i = 0
      while (i + n <= tk.length) {
        out.add(Hashes.xxh64(tk.slice(i, i + n).mkString(" ")))
        i += 1
      }
      val arr = new Array[Long](out.size)
      val it = out.iterator(); var j = 0
      while (it.hasNext) { arr(j) = it.next(); j += 1 }
      arr
    }
  }

  // --- MinHash ---------------------------------------------------------------

  /** k-permutation MinHash signature over the shingle set. Permutation i is
    * the xxh64 re-hash of each shingle with seed i — one pass, O(|S|·k). */
  def minHashSignature(shingleHashes: Array[Long], k: Int = 64): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var si = 0
    while (si < shingleHashes.length) {
      val s = shingleHashes(si)
      var i = 0
      while (i < k) {
        val h = Hashes.mix(i.toLong, s)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      si += 1
    }
    sig
  }

  /** LSH band keys: signature split into `bands` bands of `k/bands` rows,
    * each band hashed to one long. Two docs sharing any band key are
    * candidates (probability curve of banded MinHash). */
  def bandKeys(sig: Array[Long], bands: Int = 16): Array[Long] = {
    val rows = sig.length / bands
    Array.tabulate(bands) { b =>
      var acc = 1125899906842597L // deterministic fold seed
      var i = b * rows
      while (i < (b + 1) * rows) { acc = Hashes.mix(acc, sig(i)); i += 1 }
      Hashes.mix(b.toLong, acc)
    }
  }

  /** Exact Jaccard similarity of two shingle-hash sets. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = new java.util.HashSet[Long]()
    a.foreach(x => sa.add(x))
    var inter = 0
    val sb = new java.util.HashSet[Long]()
    b.foreach { x => if (sb.add(x) && sa.contains(x)) inter += 1 }
    inter.toDouble / (sa.size + sb.size - inter).toDouble
  }

  /** MinHash Jaccard estimate: fraction of agreeing signature positions. */
  def estJaccard(sigA: Array[Long], sigB: Array[Long]): Double = {
    var agree = 0; var i = 0
    while (i < sigA.length) { if (sigA(i) == sigB(i)) agree += 1; i += 1 }
    agree.toDouble / sigA.length
  }

  // --- SimHash ---------------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens (Charikar 2002, public). Near-dup
    * docs land within a small Hamming distance. */
  def simHash(text: String): Long = {
    val v = new Array[Int](64)
    tokens(text).foreach { t =>
      val h = Hashes.xxh64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) v(b) += 1 else v(b) -= 1
        b += 1
      }
    }
    var out = 0L; var b = 0
    while (b < 64) { if (v(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // --- fingerprinting (winnowing) ---------------------------------------------

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD 2003, public):
    * k-gram char rolling hashes, keep the min of each sliding window —
    * position-robust document fingerprints. Returns the selected hashes,
    * sorted + distinct (order-free comparison). */
  def winnow(text: String, k: Int = 5, window: Int = 8): Array[Long] = {
    val s = text.toLowerCase
    if (s.length < k) return if (s.isEmpty) Array.empty else Array(Hashes.xxh64(s))
    val grams = new Array[Long](s.length - k + 1)
    var i = 0
    while (i + k <= s.length) { grams(i) = Hashes.xxh64(s.substring(i, i + k)); i += 1 }
    val picked = new java.util.TreeSet[java.lang.Long]()
    val nWin = math.max(grams.length - window + 1, 1)
    var w = 0
    while (w < nWin) {
      val end = math.min(w + window, grams.length)
      var min = Long.MaxValue; var j = w
      while (j < end) { if (grams(j) < min) min = grams(j); j += 1 }
      picked.add(min)
      w += 1
    }
    val out = new Array[Long](picked.size)
    val it = picked.iterator(); var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** One 64-bit digest of the winnowed set (commutative fold). */
  def fingerprint(text: String): Long = {
    var acc = 0L
    winnow(text).foreach(h => acc ^= Hashes.mix(0x9e3779b97f4a7c15L, h))
    acc
  }

  // --- language ID (n-gram/stopword heuristic) ---------------------------------

  private val StopWords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "fr" -> Set("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "es" -> Set("el", "la", "los", "de", "y", "un", "una", "es", "que", "para"),
    "de" -> Set("der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "für"))

  /** Heuristic language ID: CJK codepoint share decides "zh"; otherwise the
    * stopword table with the highest hit rate wins; ties and no-hits → "en". */
  def langId(text: String): String = langIdWith(text, None)

  /** langId with an optional pre-computed full-text token array to reuse —
    * valid only when the text fits the 4000-char sniff window (the fused
    * `profile` path); semantics identical to `langId`. */
  private def langIdWith(text: String, fullTokens: Option[Array[String]]): String = {
    if (text.isEmpty) return "en"
    var cjk = 0; var i = 0
    val limit = math.min(text.length, 4000)
    while (i < limit) {
      val c = text.codePointAt(i)
      if ((c >= 0x4e00 && c <= 0x9fff) || (c >= 0x3400 && c <= 0x4dbf)) cjk += 1
      i += Character.charCount(c)
    }
    if (cjk * 10 > limit) return "zh"
    val tk = fullTokens.filter(_ => text.length <= 4000)
      .getOrElse(tokens(text.substring(0, limit)))
    if (tk.isEmpty) return "en"
    val best = StopWords.toSeq.sortBy(_._1).map { case (lang, sw) =>
      (lang, tk.count(sw.contains))
    }.maxBy(_._2)
    if (best._2 == 0) "en" else best._1
  }

  // --- quality scoring ----------------------------------------------------------

  final case class Quality(
      n_tokens: Int, n_bpe_tokens: Int, mean_token_len: Double,
      punct_ratio: Double, alpha_ratio: Double, stopword_ratio: Double,
      score: Double)

  /** Deterministic document quality heuristics (length / punctuation /
    * stopword mix — the standard web-corpus filters, e.g. C4/Gopher rules,
    * public). `score` ∈ [0,1], higher = keep. */
  def quality(text: String): Quality = qualityWith(text, tokens(text))

  private def qualityWith(text: String, tk: Array[String]): Quality = {
    val n = tk.length
    if (n == 0) return Quality(0, 0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val chars = text.length
    var punct = 0; var alpha = 0; var i = 0
    while (i < chars) {
      val c = text.charAt(i)
      if (c == '.' || c == ',' || c == ';' || c == ':' || c == '!' || c == '?') punct += 1
      if (c.isLetter) alpha += 1
      i += 1
    }
    val allStop = StopWords.values.flatten.toSet
    val stop = tk.count(allStop.contains)
    val meanLen = tk.map(_.length).sum.toDouble / n
    val punctR = punct.toDouble / chars
    val alphaR = alpha.toDouble / chars
    val stopR = stop.toDouble / n
    // pinned composite: token-count band, sane mean token length, some alpha
    val score =
      (if (n >= 20 && n <= 100000) 0.4 else 0.0) +
        (if (meanLen >= 2.5 && meanLen <= 12.0) 0.3 else 0.0) +
        (math.min(alphaR / 0.6, 1.0) * 0.3)
    Quality(n, bpeTokenCount(text), meanLen, punctR, alphaR, stopR, score)
  }

  // --- fused flagship kernel ---------------------------------------------------

  final case class TextProfile(
      lang_pred: String, quality: Double, n_tokens: Int, fingerprint: Long)

  /** The flagship text stack (lang-ID + quality score + token count +
    * fingerprint) in ONE kernel: the text is tokenized once and shared across
    * lang-ID and quality instead of four separate UDFs each re-parsing the
    * row. Outputs are identical to calling `langId` / `quality(_).score` /
    * `tokens(_).length` / `fingerprint` separately (property-tested). */
  def profile(text: String): TextProfile = {
    val tk = tokens(text)
    TextProfile(
      langIdWith(text, Some(tk)),
      qualityWith(text, tk).score,
      tk.length,
      fingerprint(text))
  }
}
