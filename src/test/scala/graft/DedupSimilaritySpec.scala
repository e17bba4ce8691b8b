package graft

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private val sf = "/root/testdata/sf0.001"

  private def docsWithDups = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river"),
      (1L, "the quick brown fox jumps over the lazy dog near the river"), // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy dog near the creek"), // near dup of 0
      (3L, "spark shuffle partitions and bloom filters for frontier dedup"),
      (4L, "spark shuffle partitions and bloom filters for frontier dedup"), // exact dup of 3
      (5L, "completely different content about nothing in particular here")
    ).toDF("doc_id", "text")
  }

  test("exact dedup keeps min doc_id per content group with dup counts") {
    val out = Dedup.exact(docsWithDups).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set(0L, 2L, 3L, 5L))
    assert(out(0L) == 1L && out(3L) == 1L && out(2L) == 0L && out(5L) == 0L)
  }

  test("minhash pairs find near + exact dups, verified jaccard matches pure fn") {
    val pairs = Dedup.minhashPairs(docsWithDups, threshold = 0.5, shingleN = 2,
      numPerm = 64, bands = 32).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) == 1.0)
    assert(pairs.contains((3L, 4L)) && pairs((3L, 4L)) == 1.0)
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L))) // near-dup caught
    pairs.foreach { case ((a, b), j) =>
      val ja = TextFunctions.jaccard(
        TextFunctions.shingleHashes(textOf(a), 2), TextFunctions.shingleHashes(textOf(b), 2))
      assert(math.abs(j - ja) < 1e-12)
      assert(j >= 0.5)
    }
  }
  private def textOf(id: Long): String =
    docsWithDups.filter(col("doc_id") === id).collect()(0).getString(1)

  test("minhashDedup drops the larger-id twin of each dup pair") {
    val kept = Dedup.minhashDedup(docsWithDups, threshold = 0.9, shingleN = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L) && !kept.contains(4L))
    assert(kept.contains(0L) && kept.contains(3L) && kept.contains(5L))
  }

  test("connectedComponents: transitive clusters get ONE min label (beats keep-smallest)") {
    val s = spark
    import s.implicits._
    // chain 2≈3≈1 with ids ordered so keep-smallest keeps TWO locals (1 and
    // 2) but the true component minimum is 1 — plus an isolated pair (7,9)
    val pairs = Seq((2L, 3L), (1L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connectedComponents runs ONE Spark job per propagation round") {
    val s = spark
    import s.implicits._
    // diameter-3 chain forces ≥3 rounds; the convergence check must ride the
    // round's single action (Observation), not a second join+count job
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("doc_a", "doc_b")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    }
    s.sparkContext.addSparkListener(listener)
    try {
      val labels = Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels.forall { case (n, l) => if (n <= 5L) l == 1L else l == 8L })
      // rounds needed: 4 label rounds + 1 converged round + final collect.
      // Under AQE one action fans into ~5 stage-jobs: measured 30 for this
      // graph with Observation-based convergence vs 35 with the old separate
      // changed-check join+count — this is the regression guard for that
      // extra per-round join sneaking back in.
      val n = jobs.get()
      assert(n <= 32, s"connectedComponents issued $n jobs — a second per-round job crept in")
    } finally s.sparkContext.removeSparkListener(listener)
  }

  test("cosinePairs keeps STRING ids end-to-end (no silent numeric cast)") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      ("doc-a", Seq(1f, 0f, 0f)), ("doc-b", Seq(0.9f, 0.1f, 0f)),
      ("doc-c", Seq(0f, 1f, 0f)), ("doc-d", Seq(1f, 0.01f, 0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosinePairs(vecs, 0.95, blocks = 3).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("doc-a", "doc-b"), ("doc-a", "doc-d"), ("doc-b", "doc-d")),
      s"string-keyed pairs wrong: $pairs")
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("minhashDedupCC keeps exactly one survivor per transitive cluster") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val mid = base.replace("lazy dog", "sleepy cat")         // ≈ base
    val far = mid.replace("quick brown", "slow green")       // ≈ mid, not ≈ base
    val docs = Seq(
      (2L, base), (3L, mid), (1L, far), // ids chosen so 3 bridges 2 and 1
      (10L, "completely unrelated words about spark shuffles and bloom filters here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, threshold = 0.45, shingleN = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 3L), (1L, 3L)), s"unexpected pair graph: $pairs")
    // one-pass keep-smallest keeps both local minima of the chain...
    val greedy = Dedup.minhashDedup(docs, 0.45, 2).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(greedy == Set(1L, 2L, 10L))
    // ...CC collapses the whole transitive cluster to its minimum
    val cc = Dedup.minhashDedupCC(docs, 0.45, 2).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(cc == Set(1L, 10L))
    val clusters = Dedup.minhashClusters(docs, 0.45, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L))
  }

  test("simhash pairs: finds ALL pairs with hamming<=3 (vs brute force)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val got = Dedup.simhashPairs(docs, maxHamming = 3, segments = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = docs.collect().map(r => r.getLong(0) -> TextFunctions.simhash(r.getString(1)))
    val want = (for {
      (ia, ha) <- sigs; (ib, hb) <- sigs
      if ia < ib && TextFunctions.hammingDistance(ha, hb) <= 3
    } yield (ia, ib)).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("IVF with nProbe == nLists is EXACTLY brute force (full probe = no approximation)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(120)
    val bf = Similarity.bruteForceTopK(e, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfTopK(e, k = 3, nLists = 4, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(ivf == bf)
  }

  test("IVF partial probe: high recall vs brute force") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val bf = Similarity.bruteForceTopK(e, k = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.ivfTopK(e, k = 5, nLists = 8, nProbe = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = bf.keysIterator.map(q =>
      (bf(q) intersect ivf.getOrElse(q, Set.empty)).size.toDouble / bf(q).size).sum / bf.size
    assert(recall > 0.35, s"IVF recall=$recall") // nProbe/nLists = 1/2 of lists probed
  }

  test("LSH ANN: structural invariants + nonzero recall") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = Similarity.lshTopK(e, k = 5, bits = 6, tables = 6).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) != r.getLong(1)) // no self-match
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 5)
    }
    val bf = Similarity.bruteForceTopK(e, k = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lsh = out.map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = bf.keysIterator.map(q =>
      (bf(q) intersect lsh.getOrElse(q, Set.empty)).size.toDouble / bf(q).size).sum / bf.size
    assert(recall > 0.05, s"LSH recall=$recall")
  }

  test("cosinePairs: symmetric threshold pairs, a<b only") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0.9f, 0.1f, 0f)),
      (3L, Seq(0f, 1f, 0f)), (4L, Seq(1f, 0.01f, 0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosinePairs(vecs, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a >= b })
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("IVF refine sample: per-list input bounded by refineSample, exact md5-order top-n") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, floor}
    val n = 7
    // 3 lists × 40 rows — every list is over the cap
    val assigned = (0L until 120L).map(i => (i, (i % 3).toInt, Seq(i.toFloat)))
      .toDF("id", "list", "unit")
    val sampled = Similarity.refineSampleRows(assigned, n).collect()
      .map(r => (r.getAs[Int]("list"), r.getAs[Long]("id")))
    val perList = sampled.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(perList.values.forall(_.size == n),
      s"refine input not bounded at $n: ${perList.view.mapValues(_.size).toMap}")
    // exactness: the n smallest (md5(id), id) per list — same rule the oracle runs
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md5.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val want = (0L until 120L).groupBy(i => (i % 3).toInt).view.mapValues(ids =>
      ids.sortBy(i => (h(i), i)).take(n).toSet).toMap
    assert(perList == want)
  }

  test("IVF with refine sampling + full probe is still EXACTLY brute force") {
    // sampling only moves centroids; with nProbe == nLists every list is
    // probed, so the result must stay exact whatever the sample size
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(120)
    val bf = Similarity.bruteForceTopK(e, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfTopK(e, k = 3, nLists = 4, nProbe = 4, refineSample = 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(ivf == bf)
  }

  test("ivfTopK edge cases: fewer rows than lists; empty input") {
    val s = spark
    import s.implicits._
    val tiny = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0f, 1f))
    ).toDF("vec_id", "embedding")
    // nLists > rows: list count clamps to the row count instead of indexing
    // past the seed array (round-1 ArrayIndexOutOfBounds)
    val out = Similarity.ivfTopK(tiny, k = 2, nLists = 8, nProbe = 8).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) != r.getLong(1)))
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.ivfTopK(empty, k = 3, nLists = 4, nProbe = 2).collect().isEmpty)
  }

  test("cosinePairs blocked join is EXACT: equals per-pair cosine brute force") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(300)
    val got = Similarity.cosinePairs(e, threshold = 0.3, blocks = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val want = (for {
      (ia, va) <- rows; (ib, vb) <- rows
      if ia < ib
      c = TextFunctions.cosine(va, vb)
      if c >= 0.3
    } yield (ia, ib) -> c).toMap
    assert(got.keySet == want.keySet,
      s"missing=${(want.keySet -- got.keySet).take(5)} extra=${(got.keySet -- want.keySet).take(5)}")
    // bit-exact cosines (same accumulation order) — the oracle relies on this
    assert(want.forall { case (k, c) => got(k) == c })
  }

  test("lshNearDupPairs: recall >= 0.95 on planted near-dups at tau=0.9") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val base = Array.fill(200)(Array.fill(32)(rnd.nextGaussian().toFloat))
    // plant 60 near-duplicates: tiny gaussian perturbations of existing rows
    val dups = (0 until 60).map { i =>
      val src = base(i * 3)
      (1000L + i, src.map(x => x + 0.02f * rnd.nextGaussian().toFloat).toSeq)
    }
    val all = base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++ dups
    val df = all.toSeq.toDF("vec_id", "embedding")
    val truth = Similarity.cosinePairs(df, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size >= 50, s"planting failed: only ${truth.size} true pairs")
    val got = Similarity.lshNearDupPairs(df, threshold = 0.9, bits = 8, tables = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact verify ⇒ perfect precision; banding ⇒ near-perfect recall at high τ
    assert(got.subsetOf(truth), s"false positives: ${(got -- truth).take(3)}")
    val recall = (got intersect truth).size.toDouble / truth.size
    assert(recall >= 0.95, s"LSH near-dup recall=$recall")
  }

  test("multimodal resize: aspect ratio preserved, longest side clamped, deterministic") {
    val docs = graft.corpus.CorpusTables.documents(spark,
      graft.corpus.CorpusConfig(seed = 42L, numHosts = 8, maxPages = 16)).toDF()
    val blobs = Multimodal.mediaBlobs(spark, docs)
    val out = Multimodal.resizeMedia(blobs, maxDim = 256).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(math.max(r.out_w, r.out_h) <= 256 && r.out_w >= 1 && r.out_h >= 1)
      // aspect preserved within rounding: out_w/out_h ≈ width/height
      val in = r.width.toDouble / r.height
      val o = r.out_w.toDouble / r.out_h
      assert(math.abs(in - o) / in < 0.05, s"aspect drift: $r")
      if (math.max(r.width, r.height) <= 256)
        assert(r.out_w == r.width && r.out_h == r.height) // no upscale
    }
    assert(Multimodal.resizeMedia(blobs, 256).collect().toSet == out.toSet) // deterministic
  }

  test("multimodal frame sample: fan-out bounded, dense ts grid, images = 1 frame") {
    val docs = graft.corpus.CorpusTables.documents(spark,
      graft.corpus.CorpusConfig(seed = 42L, numHosts = 8, maxPages = 16)).toDF()
    val blobs = Multimodal.mediaBlobs(spark, docs)
    val frames = Multimodal.frameSample(blobs, everyMs = 40000L, maxFrames = 16).collect()
    val byRef = frames.groupBy(r => (r.doc_id, r.media_ref))
    byRef.foreach { case (_, fs) =>
      assert(fs.length >= 1 && fs.length <= 16)
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length)) // dense indices
      fs.foreach(f => assert(f.ts_ms == f.frame_idx * 40000L))
    }
    // corpus media are img:// refs ⇒ duration 0 ⇒ exactly one frame each
    assert(byRef.forall { case ((_, ref), fs) => !ref.startsWith("img://") || fs.length == 1 })
  }

  test("multimodal: blob count matches media spans; features deterministic; schema real") {
    val docs = graft.corpus.CorpusTables.documents(spark,
      graft.corpus.CorpusConfig(seed = 42L, numHosts = 8, maxPages = 16)).toDF()
    val blobs = Multimodal.mediaBlobs(spark, docs)
    val nSpans = docs.select(explode(col("spans")).as("s"))
      .filter(col("s.kind") === "media").count()
    assert(blobs.count() == nSpans)
    val f1 = Multimodal.extractFeatures(blobs).collect().sortBy(r => (r.doc_id, r.media_ref))
    val f2 = Multimodal.extractFeatures(blobs).collect().sortBy(r => (r.doc_id, r.media_ref))
    assert(f1.map(_.sha).toSeq == f2.map(_.sha).toSeq)
    assert(f1.forall(_.feature.length == 16))
    assert(f1.forall(f => f.width >= 64 && f.height >= 64))
    val meta = Multimodal.mediaMeta(blobs)
    assert(meta.columns.toSeq ==
      Seq("doc_id", "media_ref", "mime", "n_bytes", "content_md5"))
  }

  test("connectedComponents frees each round's checkpoint blocks as it goes") {
    // Dataset.unpersist is a NO-OP on a localCheckpoint'ed round (blocks
    // belong to the LogicalRDD's rdd, not a CacheManager entry) — without
    // the explicit rdd.unpersist a big graph accumulates one full label set
    // of undead MEMORY_AND_DISK blocks per round. Only the RETURNED labels'
    // checkpoint may remain.
    val s = SparkSuite.spark
    import s.implicits._
    val before = s.sparkContext.getPersistentRDDs.keySet
    val chain = (0 until 19).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b") // diameter 18 ⇒ ~7 shortcut rounds
    val labels = Dedup.connectedComponents(chain, maxIter = 12)
    assert(labels.count() == 20)
    val leaked = s.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"${leaked.size} persisted RDDs left after CC — rounds are not freeing their blocks")
  }

  test("connectedComponents fails loud on non-convergence; converges on a long chain") {
    val s = SparkSuite.spark
    import s.implicits._
    // a 30-node path: diameter 29 — plain min-label would need ~29 rounds;
    // 3 rounds cannot finish even with shortcutting (reach ~4 hops)
    val chain = (0 until 29).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_a", "doc_b")
    val e = intercept[RuntimeException](
      Dedup.connectedComponents(chain, maxIter = 3).count())
    assert(e.getMessage.contains("did not converge"),
      s"expected a loud non-convergence error, got: ${e.getMessage}")
    // pointer jumping makes convergence O(log diameter): 10 rounds MUST
    // cover a diameter-29 path (plain propagation would still be half way) —
    // this is the logarithmic-round-count pin for the 100-TB dup-chain case
    val labels = Dedup.connectedComponents(chain, maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 30 && labels.values.forall(_ == 0L),
      "one chain must collapse to a single min-id cluster")
  }

  test("ivfTopK rejects non-integral id columns with a direct message") {
    val s = SparkSuite.spark
    import s.implicits._
    val strKeyed = Seq(("a", Seq(1.0f, 0.0f)), ("b", Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Similarity.ivfTopK(strKeyed, k = 1))
    assert(e.getMessage.contains("integral id column"))
  }
}
