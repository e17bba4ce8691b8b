package graft

import graft.functions.TextFunctions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {

  test("tokens + counts") {
    assert(tokens("The quick brown fox!").toSeq == Seq("the", "quick", "brown", "fox"))
    assert(tokenCount("a b  c") == 3)
    assert(whitespaceTokenCount("a b  c") == 3)
    assert(tokenCount("") == 0)
  }

  test("quality signals: clean prose scores above junk") {
    val prose = "the quick brown fox jumps over the lazy dog and runs to the hills " * 3
    val junk = "@@@@ #### $$$$ %%%% ^^^^ &&&& 1234 ++++"
    assert(qualityScore(prose) > qualityScore(junk))
    assert(qualityScore("") == 0.0)
  }

  test("langId: marker words dominate; CJK short-circuits; deterministic") {
    assert(langId("the cat and the dog went to the market and that was fun")._1 == "en")
    assert(langId("el perro y la casa de los gatos que corren por la calle")._1 == "es")
    assert(langId("der hund und die katze ist nicht mit ein haus")._1 == "de")
    assert(langId("中文文本处理很重要")._1 == "zh")
    assert(langId("")._1 == "und")
  }

  test("fingerprint: deterministic, content-sensitive") {
    assert(fingerprint("abc") == fingerprint("abc"))
    assert(fingerprint("abc") != fingerprint("abd"))
  }

  test("shingles + exact jaccard (sorted-array set semantics)") {
    assert(shingles("a b c d", 2).toSeq == Seq("a b", "b c", "c d"))
    assert(shingles("a", 3).toSeq == Seq("a"))
    val a = shingleHashes("the quick brown fox jumps", 2)
    val b = shingleHashes("the quick brown fox runs", 2)
    val j = jaccard(a, b)
    assert(j > 0.3 && j < 1.0) // shares 3 of 5ish shingles
    assert(jaccard(a, a) == 1.0)
    assert(jaccard(Array.empty[Long], a) == 0.0)
  }

  test("minhash signature agreement estimates jaccard (property)") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val base = Array.fill(200)(rnd.nextLong())
      val keep = rnd.nextInt(150) + 50
      val b = base.take(keep) ++ Array.fill(200 - keep)(rnd.nextLong())
      val (sa, sb) = (base.distinct.sorted, b.distinct.sorted)
      val trueJ = jaccard(sa, sb)
      val (ma, mb) = (minhashSignature(sa, 256), minhashSignature(sb, 256))
      val est = ma.zip(mb).count { case (x, y) => x == y }.toDouble / 256
      assert(math.abs(est - trueJ) < 0.15, s"est=$est true=$trueJ")
    }
  }

  test("minhash bands: identical signatures share all bands; disjoint sets rarely collide") {
    val a = shingleHashes("the quick brown fox", 2)
    val sigA = minhashSignature(a, 64)
    assert(minhashBands(sigA, 16).toSeq == minhashBands(minhashSignature(a, 64), 16).toSeq)
  }

  test("simhash: similar text ⇒ small hamming; different ⇒ large") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val near = base.replace("today", "tonight")
    val far = "completely unrelated words about spark shuffle partitions and bloom filters"
    assert(hammingDistance(simhash(base), simhash(near)) <
      hammingDistance(simhash(base), simhash(far)))
    assert(hammingDistance(simhash(base), simhash(base)) == 0)
  }

  test("simhash segments: pigeonhole guarantee (hamming < segs ⇒ shared segment)") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val h = rnd.nextLong()
      // flip up to 3 random bits
      val flipped = (1 to rnd.nextInt(4)).foldLeft(h)((acc, _) => acc ^ (1L << rnd.nextInt(64)))
      if (hammingDistance(h, flipped) <= 3) {
        val shared = simhashSegments(h, 4).intersect(simhashSegments(flipped, 4))
        assert(shared.nonEmpty, f"no shared segment for hamming=${hammingDistance(h, flipped)}")
      }
    }
  }

  test("cosine/dot/norm") {
    val a = Array(1f, 0f, 0f); val b = Array(0f, 1f, 0f); val c = Array(2f, 0f, 0f)
    assert(cosine(a, b) == 0.0)
    assert(math.abs(cosine(a, c) - 1.0) < 1e-12)
    assert(cosine(Array(0f, 0f, 0f), a) == 0.0)
  }

  test("hyperplane signature: deterministic; identical vectors share signature") {
    val v = Array.tabulate(16)(i => (i * 0.1f) - 0.8f)
    assert(hyperplaneSignature(v, 16, 1) == hyperplaneSignature(v.clone(), 16, 1))
    assert(hyperplaneSignature(v, 16, 1) != hyperplaneSignature(v, 16, 2) ||
      hyperplaneSignature(v, 32, 1) != hyperplaneSignature(v, 32, 3))
  }
}
