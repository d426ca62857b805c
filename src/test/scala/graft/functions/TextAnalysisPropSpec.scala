package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests over random corpora (scalacheck Gens sampled directly with
  * fixed seeds, same pattern as UrlCanonSpec — fully deterministic). */
class TextAnalysisPropSpec extends AnyFunSuite {
  import TextAnalysis._

  private def samples[T](g: Gen[T], n: Int, seed: Long = 7L): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val word: Gen[String] = Gen.choose(1, 10)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val text: Gen[String] = Gen.choose(0, 120)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  test("jaccard ∈ [0,1], symmetric, 1 on self") {
    samples(Gen.zip(text, text), 200).foreach { case (a, b) =>
      val sa = shingles(a); val sb = shingles(b)
      val j = jaccard(sa, sb)
      assert(j >= 0.0 && j <= 1.0)
      assert(j === jaccard(sb, sa))
      assert(jaccard(sa, sa) === 1.0)
    }
  }

  test("minhash estimate within 0.3 of true jaccard (64 hashes)") {
    samples(Gen.zip(text, text), 100).foreach { case (a, b) =>
      val sa = shingles(a); val sb = shingles(b)
      if (sa.nonEmpty && sb.nonEmpty) {
        val est = estJaccard(minHashSignature(sa), minHashSignature(sb))
        assert(math.abs(est - jaccard(sa, sb)) <= 0.3,
          s"est=$est true=${jaccard(sa, sb)}")
      }
    }
  }

  test("simhash deterministic; hamming is a metric-ish (0 on self, symmetric)") {
    samples(Gen.zip(text, text), 200).foreach { case (a, b) =>
      assert(simHash(a) === simHash(a))
      assert(hamming(simHash(a), simHash(a)) === 0)
      assert(hamming(simHash(a), simHash(b)) === hamming(simHash(b), simHash(a)))
      assert(hamming(simHash(a), simHash(b)) <= 64)
    }
  }

  test("appending text never removes winnow fingerprints entirely; determinism") {
    samples(text, 150).foreach { t =>
      assert(winnow(t).toSeq === winnow(t).toSeq)
      assert(fingerprint(t) === fingerprint(t))
      if (t.length > 50) {
        // a shared long prefix keeps a large shared fingerprint fraction
        val extended = t + " zzz extra tail words appended here"
        val shared = winnow(t).toSet.intersect(winnow(extended).toSet).size.toDouble
        assert(shared / math.max(winnow(t).length, 1) > 0.5, s"shared=$shared")
      }
    }
  }

  test("langId is total and always one of the five langs; quality is bounded") {
    val langs = Set("en", "fr", "es", "zh", "de")
    samples(text, 200).foreach { t =>
      assert(langs.contains(langId(t)))
      val q = quality(t)
      assert(q.score >= 0.0 && q.score <= 1.0)
      assert(q.n_tokens >= 0 && q.punct_ratio >= 0.0 && q.punct_ratio <= 1.0)
      assert(q.alpha_ratio >= 0.0 && q.alpha_ratio <= 1.0)
    }
  }

  test("shingle count bounded by token count; band keys always 16") {
    samples(text, 200).foreach { t =>
      val tk = tokens(t)
      val sh = shingles(t)
      assert(sh.length <= math.max(tk.length, 1))
      if (sh.nonEmpty) assert(bandKeys(minHashSignature(sh)).length === 16)
    }
  }
}
