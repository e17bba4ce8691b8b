package graft.functions

/**
 * Pure text-analysis primitives for the training-data pipeline operators
 * (token counting, quality scoring, language-ID heuristic, fingerprints,
 * shingles, minhash, simhash). All pure + deterministic so they're safe
 * in deterministic UDFs and reusable by oracles/tests.
 */
object TextFunctions {

  // --- tokenisation ----------------------------------------------------------
  private val TokenRe = "[A-Za-z0-9]+(?:'[A-Za-z]+)?".r

  /** BPE-ish word tokens: alnum runs with optional apostrophe suffix. */
  def tokens(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else TokenRe.findAllIn(text.toLowerCase).toArray

  def tokenCount(text: String): Int = tokens(text).length

  def whitespaceTokenCount(text: String): Int =
    if (text == null || text.isEmpty) 0
    else text.split("\\s+").count(_.nonEmpty)

  // --- quality scoring -------------------------------------------------------
  private val Stopwords: Set[String] = Set(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "from", "this")

  /** (alpha_ratio, punct_ratio, stopword_ratio, mean_token_len) — the
   * length/punct/stopword quality signals. */
  def qualitySignals(text: String): (Double, Double, Double, Double) = {
    if (text == null || text.isEmpty) return (0.0, 0.0, 0.0, 0.0)
    val n = text.length.toDouble
    val alpha = text.count(_.isLetter) / n
    val punct = text.count(c => !c.isLetterOrDigit && !c.isWhitespace) / n
    val ts = tokens(text)
    val stop = if (ts.isEmpty) 0.0 else ts.count(Stopwords.contains).toDouble / ts.length
    val mtl = if (ts.isEmpty) 0.0 else ts.map(_.length).sum.toDouble / ts.length
    (alpha, punct, stop, mtl)
  }

  /** Scalar quality score ∈ [0,1]: favors alphabetic, stopword-bearing,
   * moderately-long-token text — a classic crawl-corpus quality gate. */
  def qualityScore(text: String): Double = {
    if (text == null || text.isEmpty || tokenCount(text) == 0) return 0.0
    val (alpha, punct, stop, mtl) = qualitySignals(text)
    val lenTerm = math.min(1.0, tokenCount(text) / 50.0)
    val mtlTerm = if (mtl <= 0) 0.0 else math.max(0.0, 1.0 - math.abs(mtl - 5.0) / 10.0)
    math.max(0.0, math.min(1.0,
      0.3 * alpha + 0.2 * math.min(1.0, stop * 3.0) + 0.2 * (1.0 - math.min(1.0, punct * 4.0)) +
        0.15 * lenTerm + 0.15 * mtlTerm))
  }

  // --- language-ID heuristic ---------------------------------------------------
  /** Tiny per-language marker lexicons (function words + characteristic
   * letters). Returns (lang, confidence). CJK short-circuits on script. */
  private val LangMarkers: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "is", "that", "with", "for", "was"),
    "es" -> Set("el", "la", "de", "que", "y", "los", "las", "una", "por"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Set("le", "la", "les", "des", "est", "une", "dans", "pour"))

  def langId(text: String): (String, Double) = {
    if (text == null || text.isEmpty) return ("und", 0.0)
    val cjk = text.count(c => Character.UnicodeScript.of(c) == Character.UnicodeScript.HAN)
    if (cjk > text.length / 8) return ("zh", math.min(1.0, cjk * 4.0 / text.length))
    val ts = tokens(text)
    if (ts.isEmpty) return ("und", 0.0)
    val scores = LangMarkers.view.mapValues(m => ts.count(m.contains).toDouble / ts.length).toMap
    val (best, sc) = scores.maxBy { case (l, s) => (s, l) } // deterministic tiebreak
    if (sc <= 0.0) ("und", 0.0) else (best, math.min(1.0, sc * 5.0))
  }

  // --- fingerprints / shingles -------------------------------------------------
  /** Rolling polynomial hash of the whole text (document fingerprint). */
  def fingerprint(text: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    val s = if (text == null) "" else text
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Word n-gram shingles (space-joined), lowercased tokens. */
  def shingles(text: String, n: Int): Array[String] = {
    val ts = tokens(text)
    if (ts.length < n) { if (ts.isEmpty) Array.empty else Array(ts.mkString(" ")) }
    else ts.sliding(n).map(_.mkString(" ")).toArray
  }

  /** 64-bit hashes of the n-gram shingle set (deduped). */
  def shingleHashes(text: String, n: Int): Array[Long] =
    shingles(text, n).iterator.map(BloomSketch.hash(_, 0x5417L)).toArray.distinct.sorted

  /** Exact Jaccard similarity of two shingle-hash SETS (sorted arrays). */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1 else j += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }

  // --- MinHash -----------------------------------------------------------------
  /** numPerm-wide minhash signature over the shingle-hash set, using the
   * standard (a*x + b mod p) permutation family with fixed seeds. */
  def minhashSignature(shingleHs: Array[Long], numPerm: Int): Array[Long] = {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    if (shingleHs.isEmpty) return sig
    var p = 0
    while (p < numPerm) {
      val a = BloomSketch.hash(s"a$p", 0xabcdL) | 1L // odd multiplier
      val b = BloomSketch.hash(s"b$p", 0x1234L)
      var i = 0
      var mn = Long.MaxValue
      while (i < shingleHs.length) {
        val v = a * shingleHs(i) + b
        if (v < mn) mn = v
        i += 1
      }
      sig(p) = mn
      p += 1
    }
    sig
  }

  /** LSH band keys: hash each of `bands` contiguous rows-per-band slices. */
  def minhashBands(sig: Array[Long], bands: Int): Array[Long] = {
    val r = sig.length / bands
    (0 until bands).map { b =>
      var h = 0x9e3779b97f4a7c15L ^ b.toLong
      var i = b * r
      while (i < (b + 1) * r) { h ^= sig(i); h *= 0x100000001b3L; i += 1 }
      h
    }.toArray
  }

  // --- SimHash -----------------------------------------------------------------
  /** 64-bit simhash over token hashes (unweighted). */
  def simhash(text: String): Long = {
    val counts = new Array[Int](64)
    tokens(text).foreach { t =>
      val h = BloomSketch.hash(t, 0x51a4L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Split a 64-bit simhash into `seg` equal-width band keys: two hashes
   * within hamming distance < seg share at least one identical segment
   * (pigeonhole) — the standard simhash blocking trick. */
  def simhashSegments(h: Long, seg: Int = 4): Array[Long] = {
    val width = 64 / seg
    val mask = if (width == 64) -1L else (1L << width) - 1L
    (0 until seg).map(i => (i.toLong << 56) | ((h >>> (i * width)) & mask)).toArray
  }

  // --- embeddings ---------------------------------------------------------------
  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a); val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Deterministic random-hyperplane LSH signature (sign bits) — for
   * bucketed approximate cosine search. */
  def hyperplaneSignature(v: Array[Float], bits: Int, seed: Long): Long = {
    var out = 0L
    var b = 0
    while (b < bits) {
      var s = 0.0
      var i = 0
      while (i < v.length) {
        // deterministic pseudo-gaussian-ish component in [-1,1)
        val h = BloomSketch.hash(s"$b:$i", seed)
        s += v(i).toDouble * ((h >> 11).toDouble / (1L << 52).toDouble)
        i += 1
      }
      if (s >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
