package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  import TextAnalysis._

  val doc = "the quick brown fox jumps over the lazy dog and runs far away today"
  val nearDoc = "the quick brown fox jumps over the lazy cat and runs far away today"
  val other = "completely different words compose this unrelated sentence about spark engines"

  test("shingles: deterministic, distinct, order-sensitive") {
    assert(shingles(doc).toSeq === shingles(doc).toSeq)
    assert(shingles(doc).length === shingles(doc).distinct.length)
    assert(shingles(doc).toSet !== shingles(doc.split(' ').reverse.mkString(" ")).toSet)
    assert(shingles("").isEmpty)
    assert(shingles("one two").length === 1) // short text → single shingle
  }

  test("jaccard: identity 1, disjoint 0, symmetric") {
    val a = shingles(doc); val b = shingles(nearDoc); val c = shingles(other)
    assert(jaccard(a, a) === 1.0)
    assert(jaccard(a, c) === 0.0)
    assert(jaccard(a, b) === jaccard(b, a))
    assert(jaccard(a, b) > 0.5 && jaccard(a, b) < 1.0)
  }

  test("minhash estimate tracks true jaccard") {
    val a = shingles(doc); val b = shingles(nearDoc)
    val est = estJaccard(minHashSignature(a), minHashSignature(b))
    val truth = jaccard(a, b)
    assert(math.abs(est - truth) < 0.25, s"est $est vs true $truth")
    assert(estJaccard(minHashSignature(a), minHashSignature(a)) === 1.0)
  }

  test("band keys: identical sigs share all bands; near sigs share ≥1 band") {
    val a = bandKeys(minHashSignature(shingles(doc)))
    val b = bandKeys(minHashSignature(shingles(nearDoc)))
    val c = bandKeys(minHashSignature(shingles(other)))
    assert(a.toSeq === bandKeys(minHashSignature(shingles(doc))).toSeq)
    assert(a.zip(b).count { case (x, y) => x == y } >= 1)
    assert(a.zip(c).count { case (x, y) => x == y } === 0)
  }

  test("simhash: near-dups land close in Hamming space, unrelated far") {
    val ha = simHash(doc); val hb = simHash(nearDoc); val hc = simHash(other)
    assert(hamming(ha, hb) <= 8, s"near hamming = ${hamming(ha, hb)}")
    assert(hamming(ha, hc) > 8, s"far hamming = ${hamming(ha, hc)}")
    assert(hamming(ha, ha) === 0)
  }

  test("winnowing: shared fingerprints survive a small edit") {
    val a = winnow(doc); val b = winnow(nearDoc)
    val inter = a.toSet.intersect(b.toSet).size.toDouble
    assert(inter / a.length > 0.5)
    assert(fingerprint(doc) === fingerprint(doc))
    assert(fingerprint(doc) !== fingerprint(other))
  }

  test("langId: stopword + CJK heuristics") {
    assert(langId("the cat sat on the mat and it is that for a day") === "en")
    assert(langId("le chat est sur la table et il est que pour un jour") === "fr")
    assert(langId("el gato es un animal y la casa es para los amigos") === "es")
    assert(langId("der hund ist ein tier und die katze ist zu den haus") === "de")
    assert(langId("这是一个中文句子用来测试语言识别功能") === "zh")
    assert(langId("") === "en")
  }

  test("quality: empty → 0; normal prose scores above word soup") {
    assert(quality("").score === 0.0)
    val prose = ("the quick brown fox jumps over the lazy dog. " * 10).trim
    assert(quality(prose).score > 0.5)
    val q = quality(prose)
    assert(q.n_tokens === 90)
    assert(q.punct_ratio > 0.0 && q.alpha_ratio > 0.5)
  }

  test("fused profile equals the four separate kernels") {
    val longDoc = (doc + " ") * 400 // > 4000 chars: exercises the sniff window
    for (t <- Seq(doc, nearDoc, other, "", "  ", "一二三四五六七八九十" * 50, longDoc)) {
      val p = profile(t)
      assert(p.lang_pred === langId(t), s"langId for <$t>")
      assert(p.quality === quality(t).score)
      assert(p.n_tokens === tokens(t).length)
      assert(p.fingerprint === fingerprint(t))
    }
  }

  test("bpe-ish token count: words plus punctuation marks") {
    assert(bpeTokenCount("hello, world!") === 4)
    assert(bpeTokenCount("") === 0)
    assert(bpeTokenCount("a b c") === 3)
  }
}
