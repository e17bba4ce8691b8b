package graft

import graft.operators.{Dedup, HostGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force reference checks for the round-5 pipeline additions:
 * duplicated-n-gram stats (Lee et al. exact-substring metric), benchmark
 * decontamination, line-level keep-first dedup, and integer PageRank. Each
 * Spark result is compared against a driver-side Scala reimplementation of
 * the definition over the same inputs. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  // ---------- shared brute-force helpers over in-memory docs ----------
  private def ngrams(text: String, n: Int): Seq[String] = {
    val toks = text.split(" ", -1).toSeq
    if (toks.size < n) Seq.empty
    else (0 to toks.size - n).map(i => toks.slice(i, i + n).mkString(" "))
  }

  private val docs: Seq[(Long, String)] = Seq(
    (0L, "a b c d e f g h"),                 // 5-gram "a b c d e" etc.
    (1L, "a b c d e x y z"),                 // shares "a b c d e" with 0
    (2L, "p q r s t u v w"),                 // unique
    (3L, "a b c d e f g h"),                 // exact dup of 0
    (4L, "m m m m m m m m m m"),             // within-doc repeats
    (5L, "one two three four"),              // shorter than 5 tokens → no 5-grams
    (6L, "z z")                               // shorter than everything
  )

  private def docsDf = {
    val s = spark; import s.implicits._
    docs.toDF("doc_id", "text")
  }

  test("dupNgramStats matches brute force (incl. within-doc repeats and short docs)") {
    val n = 5
    val all = docs.flatMap { case (_, t) => ngrams(t, n) }
    val freq = all.groupBy(identity).view.mapValues(_.size).toMap
    val expected = docs.flatMap { case (id, t) =>
      val gs = ngrams(t, n)
      if (gs.isEmpty) None
      else {
        val dup = gs.count(g => freq(g) > 1)
        Some((id, gs.size.toLong, dup.toLong,
          BigDecimal(dup.toDouble / gs.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.toSet
    val got = Dedup.dupNgramStats(docsDf, n).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected)
    // short docs (< n tokens) are absent, not zero-row'd
    assert(!got.exists(x => x._1 == 5L || x._1 == 6L))
    // within-doc repetition alone counts as duplication (doc 4: all windows dup)
    assert(got.find(_._1 == 4L).get._4 == 1.0)
  }

  test("decontaminate counts distinct shared grams per train doc, bench excluded") {
    val n = 3
    val bench = docs.filter(_._1 % 3 == 0)
    val train = docs.filter(_._1 % 3 != 0)
    val benchGrams = bench.flatMap { case (_, t) => ngrams(t, n) }.toSet
    val expected = train.flatMap { case (id, t) =>
      val hits = ngrams(t, n).toSet.intersect(benchGrams).size
      if (hits > 0) Some((id, hits.toLong)) else None
    }.toSet
    val s = spark; import s.implicits._
    val got = Dedup.decontaminate(
      train.toDF("doc_id", "text"), bench.toDF("doc_id", "text"), n)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(expected.nonEmpty) // the fixture really exercises overlap
  }

  test("lineDedup keeps first occurrence in (doc_id, line_idx) order and rebuilds text") {
    val chunk = 2
    val lines = docs.filter(_._2.nonEmpty).flatMap { case (id, t) =>
      t.split(" ", -1).grouped(chunk).zipWithIndex.map { case (g, i) =>
        (id, i, g.mkString(" "))
      }
    }
    // global keep-first by (doc_id, line_idx) per distinct line
    val firstOf = lines.groupBy(_._3).view.mapValues(_.minBy(l => (l._1, l._2))).toMap
    val expected = lines.groupBy(_._1).map { case (id, ls) =>
      val surviving = ls.filter(l => firstOf(l._3) == l).sortBy(_._2)
      (id, surviving.size.toLong, (ls.size - surviving.size).toLong,
        surviving.map(_._3).mkString(" "))
    }.toSet
    val got = Dedup.lineDedup(Dedup.tokenLines(docsDf, chunk)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == expected)
    // doc 3 is an exact dup of doc 0 → every line removed, empty rebuild
    assert(got.find(_._1 == 3L).get == ((3L, 0L, 4L, "")))
  }

  test("tokenLines: trailing short chunk, single-token doc, no phantom lines") {
    val rows = Dedup.tokenLines(docsDf, chunk = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // doc 0 has 8 tokens → lines of 3,3,2
    val d0 = rows.filter(_._1 == 0L).sortBy(_._2).map(_._3).toSeq
    assert(d0 == Seq("a b c", "d e f", "g h"))
    // doc 6 "z z" → one line
    assert(rows.filter(_._1 == 6L).map(_._3).toSeq == Seq("z z"))
    // total lines = sum of ceil(tokens/3), no descending-sequence phantoms
    val expectedCount = docs.map { case (_, t) => (t.split(" ", -1).length + 2) / 3 }.sum
    assert(rows.length == expectedCount)
  }

  // ---------- integer PageRank ----------
  /** Driver-side exact reimplementation of HostGraph.pageRankInt. */
  private def pageRankRef(edges: Set[(String, String)], iters: Int,
      scale: Long, dampPct: Int): Map[String, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = scale * (100 - dampPct) / 100
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.toSeq.map { case (u, v) =>
        v -> (r(u) * dampPct / 100 / outdeg(u))
      }
      val sums = contrib.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(n => n -> (base + sums.getOrElse(n, 0L))).toMap
    }
    r
  }

  test("pageRankInt matches the exact integer reference on a star+chain+cycle graph") {
    val edges = Set(
      // star: hub -> a,b,c ; back-links a->hub
      ("hub", "a"), ("hub", "b"), ("hub", "c"), ("a", "hub"),
      // chain: c -> d -> e
      ("c", "d"), ("d", "e"),
      // 2-cycle with a dangling sink f
      ("b", "g"), ("g", "b"), ("g", "f"))
    val s = spark; import s.implicits._
    val df = edges.toSeq.toDF("src", "dst")
    for (iters <- Seq(0, 1, 5)) {
      val got = HostGraph.pageRankInt(df, iters).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == pageRankRef(edges, iters, 1000000L, 85), s"iters=$iters")
    }
  }

  test("pageRankInt drops self-loops and duplicate edges; ranks are a stable ordering") {
    val s = spark; import s.implicits._
    val noisy = Seq(("x", "y"), ("x", "y"), ("x", "x"), ("y", "z"), ("z", "x"))
      .toDF("src", "dst")
    val clean = Set(("x", "y"), ("y", "z"), ("z", "x"))
    val got = HostGraph.pageRankInt(noisy, iters = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == pageRankRef(clean, 3, 1000000L, 85))
    // a 3-cycle is symmetric: every node ends with the same rank
    assert(got.values.toSet.size == 1)
  }

  test("pageRankInt is deterministic across runs (integer arithmetic, no float order)") {
    val s = spark; import s.implicits._
    val edges = (0 until 200).map(i => (s"h${i % 23}", s"h${(i * 7) % 23}"))
      .toDF("src", "dst")
    val a = HostGraph.pageRankInt(edges, 4).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = HostGraph.pageRankInt(edges.repartition(13), 4).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
  }

  // ---------- within-doc repetition signals (Gopher rules) ----------
  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("docRepetitionStats matches brute force (dup lines, dup chars, top bigram)") {
    val chunk = 2
    // extra fixtures: an empty doc (1 empty-string token → n_chars = 0) and
    // a doc whose most frequent bigram dominates
    val local = docs ++ Seq((7L, ""), (8L, "k k k k q r"))
    val expected = local.map { case (id, t) =>
      val toks = t.split(" ", -1).toSeq
      val lines = toks.grouped(chunk).map(_.mkString(" ")).toSeq
      val cnt = lines.groupBy(identity).view.mapValues(_.size).toMap
      val nLines = lines.size.toLong
      val dupLines = cnt.values.map(_ - 1).sum.toLong
      val dupChars = cnt.map { case (l, c) => (c - 1).toLong * l.length }.sum
      val nChars = cnt.map { case (l, c) => c.toLong * l.length }.sum
      val bigrams = if (toks.size < 2) Seq.empty
                    else (0 to toks.size - 2).map(i => s"${toks(i)} ${toks(i + 1)}")
      val topFrac =
        if (bigrams.isEmpty) 0.0
        else round6(bigrams.groupBy(identity).values.map(_.size).max.toDouble / bigrams.size)
      (id, nLines, round6(dupLines.toDouble / nLines),
        if (nChars > 0) round6(dupChars.toDouble / nChars) else 0.0, topFrac)
    }.toSet
    val s = spark; import s.implicits._
    val got = Dedup.docRepetitionStats(local.toDF("doc_id", "text"), chunk).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(got == expected)
    // doc 4 ("m m" × 5 lines): 4/5 lines are dups, and its only bigram is everything
    assert(got.find(_._1 == 4L).get == ((4L, 5L, 0.8, 0.8, 1.0)))
    // the empty doc exercises the n_chars = 0 guard without NaN
    assert(got.find(_._1 == 7L).get == ((7L, 1L, 0.0, 0.0, 0.0)))
  }

  // ---------- deterministic token-budget sampling ----------
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("sampleToTokenBudget keeps exactly the md5-order prefix, at any partitioning") {
    val s = spark; import s.implicits._
    val local = (0L until 97L).map(i => (i, (0 to (i % 13).toInt).map(j => s"t$j").mkString(" ")))
    val ordered = local
      .map { case (id, t) => (id, t.split(" ", -1).length.toLong, md5hex(id.toString)) }
      .sortBy { case (id, _, h) => (h, id) }
    val cums = ordered.scanLeft(0L)(_ + _._2).tail
    for (budget <- Seq(1L, 37L, 200L, 10000L)) {
      val expected = ordered.zip(cums).takeWhile(_._2 <= budget)
        .map { case ((id, n, _), c) => (id, n, c) }.toSet
      val df = local.toDF("doc_id", "text")
      val got = Dedup.sampleToTokenBudget(df, budget).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"budget=$budget")
      // partitioning must not move the cut (range shuffle re-sorts)
      val gotRep = Dedup.sampleToTokenBudget(df.repartition(7), budget).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(gotRep == expected, s"budget=$budget repartitioned")
    }
    // a budget ≥ the corpus keeps everything, with the full running sum
    val total = local.map(_._2.split(" ", -1).length.toLong).sum
    assert(Dedup.sampleToTokenBudget(local.toDF("doc_id", "text"), total).count() == 97L)
  }

  test("sampleToTokenBudget boundary: the first doc past the budget is cut, not trimmed") {
    val s = spark; import s.implicits._
    val local = (0L until 10L).map(i => (i, Seq.fill(10)("w").mkString(" "))) // 10 tokens each
    // budget 35 → exactly 3 docs (30 tokens); the 4th would reach 40 > 35
    val got = Dedup.sampleToTokenBudget(local.toDF("doc_id", "text"), 35L).collect()
    assert(got.length == 3)
    assert(got.map(_.getLong(2)).max == 30L)
  }

  test("QualityGate: first failing rule wins, every arm reachable, keep == (reason = ok)") {
    import graft.functions.TextFunctions
    import graft.operators.QualityGate
    val minTokens = 5; val minQuality = 0.50; val maxTopBigram = 0.60
    val langs = Set("en")
    val fixtures = Seq(
      (0L, "the cat and the dog went to the market for fish"), // ok (en, stopwords, varied)
      (1L, "one two"),                                         // too_few_tokens
      (2L, "el perro y la casa de los gatos que viven por las calles"), // non_target_lang (es)
      (3L, "the 000000 111111 222222 333333 444444 555555 666666"), // low_quality (en marker, digit soup)
      (4L, "the the the the the the the the the the"),          // repetitive (one bigram dominates)
      (5L, ""))                                                 // empty → too_few_tokens
    // driver-side reference with the SAME JVM signal functions
    val expected = fixtures.map { case (id, t) =>
      val ws = t.split(" ", -1).length
      val q = BigDecimal(TextFunctions.qualityScore(t))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val lang = TextFunctions.langId(t)._1
      val toks = t.split(" ", -1).toSeq
      val bigrams = if (toks.size < 2) Seq.empty
                    else (0 to toks.size - 2).map(i => s"${toks(i)} ${toks(i + 1)}")
      val topFrac =
        if (bigrams.isEmpty) 0.0
        else round6(bigrams.groupBy(identity).values.map(_.size).max.toDouble / bigrams.size)
      val reason =
        if (ws < minTokens) "too_few_tokens"
        else if (!langs.contains(lang)) "non_target_lang"
        else if (q < minQuality) "low_quality"
        else if (topFrac > maxTopBigram) "repetitive"
        else "ok"
      (id, reason, reason == "ok")
    }.toSet
    val s = spark; import s.implicits._
    val got = QualityGate(fixtures.toDF("doc_id", "text"),
        minTokens, minQuality, langs, maxTopBigram).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(got == expected)
    // each arm really fired — the fixture covers the whole reason table
    assert(got.map(_._2) ==
      Set("ok", "too_few_tokens", "non_target_lang", "low_quality", "repetitive"))
  }

  test("corpus build composes gate → exact dedup → token budget exactly") {
    import graft.functions.TextFunctions
    import graft.operators.QualityGate
    val minTokens = 5; val minQuality = 0.50; val maxTopBigram = 0.60
    val good = "the cat and the dog went to the market for fish"
    val fixtures = Seq(
      (0L, good), (1L, good), (2L, good + " again today"),     // 0 and 1 exact dups
      (3L, "one two"),                                          // gated out (short)
      (4L, "el perro y la casa de los gatos que viven por aqui"), // gated out (es)
      (5L, "the fox ran over the old wooden bridge at dawn"),
      (6L, good))                                               // third copy of the dup group
    // driver-side chain with the same JVM signal functions
    val gated = fixtures.filter { case (_, t) =>
      val ws = t.split(" ", -1).length
      val lang = TextFunctions.langId(t)._1
      val q = TextFunctions.qualityScore(t)
      val toks = t.split(" ", -1).toSeq
      val bigrams = (0 to toks.size - 2).map(i => s"${toks(i)} ${toks(i + 1)}")
      val topFrac = if (bigrams.isEmpty) 0.0
                    else bigrams.groupBy(identity).values.map(_.size).max.toDouble / bigrams.size
      ws >= minTokens && lang == "en" && q >= minQuality && topFrac <= maxTopBigram
    }
    val deduped = gated.groupBy(_._2).map { case (_, ds) => ds.minBy(_._1) }.toSeq
    val ordered = deduped
      .map { case (id, t) => (id, t.split(" ", -1).length.toLong, md5hex(id.toString)) }
      .sortBy { case (id, _, h) => (h, id) }
    val budget = ordered.map(_._2).sum - 1 // force the boundary to cut one doc
    val cums = ordered.scanLeft(0L)(_ + _._2).tail
    val expected = ordered.zip(cums).takeWhile(_._2 <= budget)
      .map { case ((id, n, _), c) => (id, n, c) }.toSet
    assert(gated.size == 5 && deduped.size == 3) // the fixture really exercises both stages
    val s = spark; import s.implicits._
    val docs = fixtures.toDF("doc_id", "text")
    val kept = QualityGate(docs, minTokens, minQuality, Set("en"), maxTopBigram)
      .filter(col("keep")).select("doc_id")
    val gatedDf = docs.join(kept, Seq("doc_id"))
    val uniq = Dedup.exact(gatedDf).select("doc_id")
    val got = Dedup.sampleToTokenBudget(gatedDf.join(uniq, Seq("doc_id")), budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.size == deduped.size - 1) // the boundary doc fell out
  }

  test("token-budget samplers property: seeded random corpora/budgets/partitionings ≡ brute force") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(4242)
    // driver-side reference shared by both sampler forms: drop null text,
    // per-group md5-order prefix with cum ≤ budget
    def reference(docs: Seq[(Long, String, String)], budgets: Map[String, Long])
        : Set[(String, Long, Long, Long)] =
      docs.filter { case (_, src, t) => budgets.contains(src) && t != null }
        .groupBy(_._2).toSeq.flatMap { case (src, ds) =>
          val ordered = ds
            .map { case (id, _, t) => (id, t.split(" ", -1).length.toLong, md5hex(id.toString)) }
            .sortBy { case (id, _, h) => (h, id) }
          val cums = ordered.scanLeft(0L)(_ + _._2).tail
          ordered.zip(cums).takeWhile(_._2 <= budgets(src))
            .map { case ((id, n, _), c) => (src, id, n, c) }
        }.toSet
    for (trial <- 1 to 12) {
      val nSrc = 1 + rnd.nextInt(4)
      val docs = (0 until (50 + rnd.nextInt(150))).map { i =>
        val src = s"s${rnd.nextInt(nSrc)}"
        // ~10% null text (must DROP, not NPE); empty text ("" = 1 token) possible
        val text = if (rnd.nextInt(10) == 0) null
                   else Seq.fill(rnd.nextInt(12))("w").mkString(" ")
        (i.toLong, src, text)
      }
      // sometimes leave a source unbudgeted; budgets span degenerate to generous
      val dropped = if (nSrc > 1 && rnd.nextBoolean()) Set(s"s${rnd.nextInt(nSrc)}") else Set.empty[String]
      val budgets = (0 until nSrc).map(j => s"s$j" -> (1L + rnd.nextInt(300))).toMap
        .filterNot { case (k, _) => dropped.contains(k) }
      val df = docs.toDF("doc_id", "source", "text").repartition(1 + rnd.nextInt(8))
      val got = Dedup.sampleMixtureTokenBudget(df, budgets).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == reference(docs, budgets), s"mixture trial $trial")
      // single-budget form on the same corpus (source ignored): must agree
      // with the one-group reference under the same null-drop rule
      val budget = 1L + rnd.nextInt(600)
      val gotSingle = Dedup.sampleToTokenBudget(df, budget).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expSingle = reference(docs.map { case (id, _, t) => (id, "", t) }, Map("" -> budget))
        .map { case (_, id, n, c) => (id, n, c) }
      assert(gotSingle == expSingle, s"single trial $trial")
    }
  }

  test("sampleMixtureTokenBudget: per-source prefixes in one pass, unbudgeted sources dropped") {
    val s = spark; import s.implicits._
    val local = (0L until 120L).map { i =>
      (i, s"s${(i % 5)}", (0 to (i % 11).toInt).map(j => s"t$j").mkString(" "))
    }
    val budgets = Map("s0" -> 30L, "s1" -> 55L, "s3" -> 1L, "s4" -> 100000L)
    // driver-side reference: per-source md5-order prefix
    val expected = local
      .filter { case (_, src, _) => budgets.contains(src) }
      .groupBy(_._2).toSeq.flatMap { case (src, ds) =>
        val ordered = ds
          .map { case (id, _, t) => (id, t.split(" ", -1).length.toLong, md5hex(id.toString)) }
          .sortBy { case (id, _, h) => (h, id) }
        val cums = ordered.scanLeft(0L)(_ + _._2).tail
        ordered.zip(cums).takeWhile(_._2 <= budgets(src))
          .map { case ((id, n, _), c) => (src, id, n, c) }
      }.toSet
    val df = local.toDF("doc_id", "source", "text")
    for (d <- Seq(df, df.repartition(9))) {
      val got = Dedup.sampleMixtureTokenBudget(d, budgets).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected)
      // s2 has no budget → absent; s4's huge budget keeps every s4 doc
      assert(!got.exists(_._1 == "s2"))
      assert(got.count(_._1 == "s4") == local.count(_._2 == "s4"))
    }
  }
}
