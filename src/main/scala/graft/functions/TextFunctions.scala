package graft.functions

/**
 * Pure text-analysis primitives for the training-data pipeline operators
 * (token counting, quality scoring, language-ID heuristic, fingerprints,
 * shingles, minhash, simhash). All pure + deterministic so they're safe
 * in deterministic UDFs and reusable by oracles/tests.
 */
object TextFunctions {

  // --- md5-derived 64-bit hashes ----------------------------------------------
  // The similarity/dedup operators hash via MD5 rather than a custom fold so
  // the driver's DuckDB oracle can recompute identical signatures in pure SQL
  // (md5 hex is bit-identical across Spark, DuckDB and MessageDigest).
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 64 bits of md5(s), big-endian — equals parsing the first 16 hex
   * chars of the digest as an unsigned 64-bit value. */
  def md5Low64(s: String): Long = {
    val d = md5Local.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (bytes(i) & 0xffL); i += 1 }
    h
  }

  /** First 60 bits of md5(s) — always non-negative, so a SQL oracle can hold
   * it in a signed BIGINT (`('0x' || substr(md5(s),1,15))::BIGINT`). */
  def md5Low60(s: String): Long = md5Low64(s) >>> 4

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

  /** 60-bit md5 hashes of the n-gram shingle set (deduped, sorted). 60 bits
   * keep the values non-negative ⇒ signed compare == unsigned compare, and
   * the SQL oracle reproduces them from 15 hex chars of md5. */
  def shingleHashes(text: String, n: Int): Array[Long] =
    shingles(text, n).iterator.map(md5Low60).toArray.distinct.sorted

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
  /** Multiplier/offset of the p-th permutation — fixed, derivation-stable
   * constants (the SQL oracle inlines their decimal values). */
  def minhashPerm(p: Int): (Long, Long) =
    (BloomSketch.hash(s"a$p", 0xabcdL) | 1L, BloomSketch.hash(s"b$p", 0x1234L))

  /** Signature value of an EMPTY shingle set: unsigned max (2^64-1). */
  val MinhashEmpty: Long = -1L

  /** numPerm-wide minhash signature over the shingle-hash set, using the
   * (a*x + b mod 2^64) permutation family with UNSIGNED minimum — Long
   * overflow IS the mod, and unsigned compare matches the SQL oracle's
   * UBIGINT arithmetic exactly. */
  def minhashSignature(shingleHs: Array[Long], numPerm: Int): Array[Long] = {
    val sig = Array.fill(numPerm)(MinhashEmpty)
    if (shingleHs.isEmpty) return sig
    var p = 0
    while (p < numPerm) {
      val (a, b) = minhashPerm(p)
      var i = 0
      var mn = MinhashEmpty // unsigned max
      while (i < shingleHs.length) {
        val v = a * shingleHs(i) + b
        if (java.lang.Long.compareUnsigned(v, mn) < 0) mn = v
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
  /** 64-bit simhash over md5 token hashes (unweighted). */
  def simhash(text: String): Long = {
    val counts = new Array[Int](64)
    tokens(text).foreach { t =>
      val h = md5Low64(t)
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

  /** Component i of hyperplane (table, b): md5-derived uniform in [-1, 1).
   * (u >>> 12) < 2^52 is exactly representable in a double, so the SQL
   * oracle's `(h >> 12)::DOUBLE / 2^52 - 1` is bit-identical. */
  def hyperplaneComponent(table: Int, b: Int, i: Int): Double =
    ((md5Low64(s"hp:$table:$b:$i") >>> 12).toDouble / 4503599627370496.0) - 1.0

  // hyperplane matrices are constants per (table, bits, dim): compute once
  // per JVM, not once per row
  private val hpCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()
  private def hyperplanes(table: Int, bits: Int, dim: Int): Array[Array[Double]] =
    hpCache.computeIfAbsent((table, bits, dim), { case (t, nb, d) =>
      Array.tabulate(nb, d)((b, i) => hyperplaneComponent(t, b, i))
    })

  /** Deterministic random-hyperplane LSH signature (sign bits) — for
   * bucketed approximate cosine search. `table` selects an independent
   * hyperplane family. */
  def hyperplaneSignature(v: Array[Float], bits: Int, table: Int): Long = {
    val hp = hyperplanes(table, bits, v.length)
    var out = 0L
    var b = 0
    while (b < bits) {
      val row = hp(b)
      var s = 0.0
      var i = 0
      while (i < v.length) {
        s += v(i).toDouble * row(i)
        i += 1
      }
      if (s >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
