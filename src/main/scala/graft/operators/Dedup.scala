package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus deduplication operators for the training-data pipeline. Each takes
 * documents(doc_id, text, ...) and is designed around ONE key-shuffle:
 *
 *  - exact:    hash-groupBy on a content digest (built-in md5/xxhash64 —
 *              codegen'd, map-side partial agg for the count; duplicate
 *              GROUPS are rare so the shuffle carries ~1 row per distinct).
 *  - minhash:  shingle → signature (one narrow UDF pass) → explode b band
 *              keys → self-join per bucket (shuffle on band key) → exact
 *              Jaccard verify on the candidate pairs only. Bucket skew is
 *              capped: degenerate buckets (> maxBucket docs, e.g. boilerplate)
 *              are DROPPED — the standard stop-bucket guard. The loss is
 *              bounded (only pairs whose every shared band is degenerate are
 *              missed) and deliberate; no counter is emitted.
 *  - simhash:  64-bit fingerprint; pigeonhole segment blocking finds all
 *              pairs within hamming distance < segments.
 *  - ngram:    minhash candidates verified with EXACT n-gram Jaccard — the
 *              accuracy path; brute-force O(n²) never materialises.
 *  - embedding: cosine near-dup via Similarity.cosinePairs (exact, blocked)
 *              or Similarity.lshNearDupPairs (the at-scale path).
 */
object Dedup {

  /** Exact dedup: keep the smallest doc_id per identical text. Also returns
   * the duplicate count per survivor (dups = group size - 1). */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), (count(lit(1)) - 1).as("dups"))
      .select(idCol, "content_hash", "dups")

  private val shingleHashUdf = udf((t: String, n: Int) => TextFunctions.shingleHashes(t, n))
  private val minhashUdf = udf((sh: Seq[Long], perms: Int) =>
    TextFunctions.minhashSignature(sh.toArray, perms))
  private val bandsUdf = udf((sig: Seq[Long], bands: Int) =>
    TextFunctions.minhashBands(sig.toArray, bands))
  private val jaccardUdf = udf((a: Seq[Long], b: Seq[Long]) =>
    TextFunctions.jaccard(a.toArray, b.toArray))

  /** doc_id → (shingle set hash array, minhash signature, band keys). */
  def minhashSignatures(docs: DataFrame, shingleN: Int = 3, numPerm: Int = 64,
      bands: Int = 16, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        shingleHashUdf(col(textCol), lit(shingleN)).as("shingle_hashes"))
      .withColumn("signature", minhashUdf(col("shingle_hashes"), lit(numPerm)))
      .withColumn("bands", bandsUdf(col("signature"), lit(bands)))

  /** Near-duplicate PAIRS (doc_a < doc_b, jaccard ≥ threshold) via
   * MinHash-LSH banding + exact-Jaccard verification. */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.8, shingleN: Int = 3,
      numPerm: Int = 64, bands: Int = 16, maxBucket: Int = 64,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // Shingle hashing (tokenize + md5 per shingle) is the dominant per-row
    // cost and was recomputed THREE times — once under the band pipeline and
    // once per re-attach join side. Materialize it once (r6); the cache is
    // the operator's working set (ids + shingle hashes, no text) and lives
    // until the caller clears the session cache — the standard trade for an
    // index consulted by several joins of one query.
    val sh = docs.select(col(idCol).as("doc_id"),
        shingleHashUdf(col(textCol), lit(shingleN)).as("shingle_hashes"))
      .persist()
    val sigs = sh
      .withColumn("signature", minhashUdf(col("shingle_hashes"), lit(numPerm)))
      .withColumn("bands", bandsUdf(col("signature"), lit(bands)))
    val buckets = sigs
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    // stop-bucket guard: boilerplate bands explode quadratically — cap them
    val sized = buckets.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy("band_idx", "band_key")))
      .filter(col("bucket_n") <= maxBucket)
    // IDS ONLY through the explode → self-join → pair-dedup shuffles (the
    // shingle arrays are ~100× the id width; carrying them multiplied every
    // exchange by the array size). Shingles re-attach once per SURVIVING pair.
    val a = sized.select(col("band_idx"), col("band_key"), col("doc_id").as("doc_a"))
    val b = sized.select(col("band_idx"), col("band_key"), col("doc_id").as("doc_b"))
    val pairs = a.join(b, Seq("band_idx", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").dropDuplicates("doc_a", "doc_b")
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle_hashes").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle_hashes").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", jaccardUdf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Survivors after minhash near-dup clustering: greedy keep-smallest —
   * drop any doc that pairs with a smaller-id near-duplicate. One pass, no
   * iteration — keeps every LOCAL minimum of the similarity graph, so a
   * chain b≈c with ids (2,3,1) keeps both 1 and 2. For one survivor per
   * TRANSITIVE cluster use `minhashDedupCC`. */
  def minhashDedup(docs: DataFrame, threshold: Double = 0.8, shingleN: Int = 3,
      idCol: String = "doc_id"): DataFrame = {
    val pairs = minhashPairs(docs, threshold, shingleN, idCol = idCol)
    docs.join(pairs.select(col("doc_b").as(idCol)).distinct(), Seq(idCol), "left_anti")
  }

  /** Connected components over a (doc_a, doc_b) pair graph: min-label
   * propagation with POINTER JUMPING — each round every node adopts the
   * smallest label among itself, its neighbours, and (from round 2 on) its
   * label's label. Plain min-propagation needs O(component diameter) rounds,
   * which on a web-scale dup graph means dozens of shuffle rounds for a
   * templated-page chain; the label-of-label shortcut doubles the distance
   * labels travel per round, so convergence is O(log diameter) — the classic
   * MapReduce-CC shortcutting idea (Kiveris et al., "Connected Components in
   * MapReduce and Beyond"). The shortcut join is skipped for rounds 0-1
   * where label(label(n)) cannot beat the neighbour min (labels start as
   * identity), so shallow near-dup graphs — the common case, which converges
   * in ~3 rounds — pay for at most one extra join in their final confirm
   * round. Labels are always node ids WITHIN the component (neighbour labels
   * trivially; label-of-label because label(n) is such an id and its row
   * carries that node's own component-internal label), so the fixed point is
   * still the component minimum. Still ONE job and one aggregate per round:
   * each node's previous label rides the self rows through the aggregate
   * (min over exactly one non-null `prev` per node — every dst is also a
   * src by symmetrization, so every node has a self row), and the
   * convergence count is an `Observation` on the same action — no second
   * job against the previous labels. Returns (node, cluster = min id of
   * its component), nodes = pair endpoints. */
  /** Free a localCheckpoint'ed round's materialized blocks NOW.
   * `Dataset.unpersist` only uncaches CacheManager entries — a checkpointed
   * Dataset's blocks belong to the RDD inside its LogicalRDD leaf, and
   * without an explicit unpersist they linger until the driver GCs the RDD
   * reference and the ContextCleaner notices: one full label set per CC
   * round of undead MEMORY_AND_DISK blocks on a big graph. */
  private[operators] def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => df.unpersist(); ()
    }

  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    // PER-ROUND LINEAGE CUT (load-bearing, the classic iterative-algorithm
    // requirement — GraphFrames does the same): each round's plan references
    // the previous round's labels TWICE (self + join), so without a cut BOTH
    // representations of the computation grow without bound —
    //  (a) the logical tree Spark STRINGIFIES doubles per round even when
    //      execution reads a cache (InMemoryRelation innerChildren nest the
    //      cached child plan): AQE renders that string per job (onUpdatePlan
    //      ⇒ SQL-listener event, UI on or off) and a ~30-round run OOMs the
    //      DRIVER building one explain string;
    //  (b) the serialized RDD graph in every task binary deepens per round,
    //      and its recursive Java deserialization overflows the EXECUTOR
    //      stack at a few dozen rounds (observed as StackOverflowError in
    //      task deser at round ~30, killing the local executor).
    // localCheckpoint(eager) truncates both: the round's plan becomes a
    // depth-1 LogicalRDD over materialized blocks. Trade (documented): a
    // lost executor can no longer recompute those blocks — the CC JOB fails
    // and is simply re-run (labels are derived state, nothing durable is
    // lost); a deployment that prefers recomputability over re-runs can set
    // a checkpoint dir and swap in reliable .checkpoint() at the same seam.
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    try {
      var changed = 1L
      var i = 0
      // min-label propagation converges in O(component diameter) rounds —
      // hitting maxIter with changes outstanding means the labels are NOT
      // transitively consistent, and returning them silently would split
      // one cluster into several; fail loud instead (check after the loop)
      while (changed > 0 && i < maxIter) {
        val labelType = labels.schema("label").dataType
        val viaNeighbours = edges
          .join(labels, edges("src") === labels("node"))
          .select(col("dst").as("node"), col("label"),
            lit(null).cast(labelType).as("prev"))
        val self = labels.select(col("node"), col("label"), col("label").as("prev"))
        // pointer jump: node n also considers label(label(n)). Every label
        // value is a node id, so it has a row in `labels` — an inner
        // equi-join on label = node covers every node. Useless before round
        // 2 (labels are still within one hop of identity), skipped there.
        val viaShortcut =
          if (i < 2) Nil
          else Seq(labels.as("a")
            .join(labels.as("b"), col("a.label") === col("b.node"))
            .select(col("a.node").as("node"), col("b.label").as("label"),
              lit(null).cast(labelType).as("prev")))
        val obs = org.apache.spark.sql.Observation()
        // the eager localCheckpoint IS the round's single action; the
        // observation rides it (metrics post when the internal job ends)
        val next = (Seq(self, viaNeighbours) ++ viaShortcut).reduce(_.unionByName(_))
          .groupBy("node").agg(min("label").as("label"), min("prev").as("prev"))
          .observe(obs,
            sum(when(col("label") =!= col("prev"), 1L).otherwise(0L)).as("chg"))
          .select("node", "label").localCheckpoint(true)
        changed = Option(obs.get.apply("chg")).map(_.asInstanceOf[Long]).getOrElse(0L)
        freeCheckpoint(labels)
        labels = next
        i += 1
      }
      if (changed > 0) sys.error(
        s"connectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still changing) — the pair graph has a component " +
        s"of diameter beyond what $maxIter shortcutting rounds cover " +
        s"(roughly 2^${math.max(0, maxIter - 2)}); raise maxIter")
      labels
    } finally edges.unpersist()
  }

  /** (doc_id, cluster) for EVERY doc — transitive near-dup cluster id
   * (singletons cluster with themselves). */
  def minhashClusters(docs: DataFrame, threshold: Double = 0.8, shingleN: Int = 3,
      idCol: String = "doc_id"): DataFrame = {
    val pairs = minhashPairs(docs, threshold, shingleN, idCol = idCol)
    val labels = connectedComponents(pairs)
    docs.select(col(idCol).as("doc_id"))
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster"))
  }

  /** One survivor per TRANSITIVE near-dup cluster: the minimum doc id. */
  def minhashDedupCC(docs: DataFrame, threshold: Double = 0.8, shingleN: Int = 3,
      idCol: String = "doc_id"): DataFrame = {
    val clusters = minhashClusters(docs, threshold, shingleN, idCol)
      .filter(col("doc_id") === col("cluster")).select("doc_id")
    docs.join(clusters.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_semi")
  }

  private val simhashUdf = udf((t: String) => TextFunctions.simhash(t))
  private val segUdf = udf((h: Long, seg: Int) => TextFunctions.simhashSegments(h, seg))

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming (< segments
   * guaranteed found by pigeonhole; default 4 segments ⇒ exact for ≤3). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3, segments: Int = 4,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxHamming < segments, "pigeonhole needs maxHamming < segments")
    val sigs = docs.select(col(idCol).as("doc_id"), simhashUdf(col(textCol)).as("simhash"))
    val seg = sigs.select(col("doc_id"), col("simhash"),
      explode(segUdf(col("simhash"), lit(segments))).as("seg_key"))
    val a = seg.select(col("seg_key"), col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = seg.select(col("seg_key"), col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("seg_key"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", // native codegen'd expression: Long.bitCount(a^b)
        graft.functions.NativeExpressions.hammingDistance(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity join above a threshold — candidate
   * generation via MinHash-LSH (recall tuned by bands/perms), verification
   * exact. For τ ≥ 0.7, 16 bands × 4 rows gives >99% recall (standard
   * S-curve: P(candidate) = 1-(1-s^r)^b). */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double, shingleN: Int = 3): DataFrame =
    minhashPairs(docs, threshold, shingleN)

  /** Column form of the document fingerprint (rolling hash). */
  def fingerprintCol(textCol: Column): Column = {
    val fp = udf((t: String) => TextFunctions.fingerprint(t))
    fp(textCol)
  }

  /** Token n-gram windows of `toks` as an array<string> column — builtin
   * transform/sequence/concat_ws only (no UDF). CALLER must guard
   * `size(toks) >= n`: Spark's `sequence(1, 0)` DESCENDS instead of
   * being empty (the q34 trap), so an under-length doc would produce
   * phantom windows.
   *
   * PASS A MATERIALIZED ARRAY ATTRIBUTE, not `split(text)` inline: the
   * expression is copied into every `element_at` inside the transform
   * lambda, and higher-order functions evaluate INTERPRETED with no
   * common-subexpression elimination — an inline split() re-tokenizes the
   * whole text n times per window, turning an O(n·len) pass into
   * O(n·len²) per document (measured 9.3 s → ~1 s on the q35 catalogue
   * query at sf0.1). [[tokensOf]] produces the guarded attribute; Catalyst
   * keeps the split in its own Project because a non-cheap alias consumed
   * many times is not collapse-eligible. */
  def ngramsCol(toks: Column, n: Int): Column = {
    require(n >= 1, "n-gram size must be >= 1")
    transform(sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))
  }

  /** (doc_id, toks) with the whitespace tokenization materialized ONCE per
   * row and rows below `minTokens` dropped (the sequence-descends guard). */
  private def tokensOf(docs: DataFrame, minTokens: Int,
      textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= minTokens)

  /** Per-document duplicated n-gram statistics — the exact-substring
   * duplication metric of Lee et al., "Deduplicating Training Data Makes
   * Language Models Better" (token-window form): a window is *duplicated*
   * when its exact n-token string occurs more than once in the corpus
   * (anywhere — another document or a repeat within the same one).
   * Returns (doc_id, n_windows, dup_windows, dup_ratio) for docs with at
   * least n tokens.
   *
   * Plan shape (what survives 100 TB): explode → ONE hash-agg shuffle on
   * the gram for the corpus frequency (map-side partial agg collapses hot
   * boilerplate grams before the exchange) → equi-join grams⋈freq on the
   * gram (AQE skew-join splits the boilerplate keys) → ONE hash-agg
   * shuffle on doc_id. No window-over-gram (a sort window would funnel
   * each hot gram into a single task). At 10^12-gram scale, substitute a
   * 128-bit hash of the gram as the shuffle/join key to cut exchange
   * bytes ~4× — a one-line change at the `gram` select, kept as the plain
   * string here so the DuckDB oracle reproduces the arithmetic exactly. */
  def dupNgramStats(docs: DataFrame, n: Int = 5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val grams = tokensOf(docs, n, textCol, idCol)
      .select(col("doc_id"), explode(ngramsCol(col("toks"), n)).as("gram"))
    val freq = grams.groupBy("gram").agg(count(lit(1)).as("f"))
    grams.join(freq, Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("f") > 1, 1L).otherwise(0L)).as("dup_windows"))
      .withColumn("dup_ratio",
        round(col("dup_windows").cast("double") / col("n_windows"), 6))
  }

  /** Benchmark decontamination (GPT-3 appendix-C style n-gram overlap):
   * flag every training document sharing at least one exact n-token gram
   * with the benchmark set; returns (doc_id, n_hits) where n_hits counts
   * DISTINCT shared grams. Non-contaminated docs are absent (filter with
   * a left_anti on the result to keep the clean set).
   *
   * Scale: the benchmark side is distinct-reduced first and is small
   * relative to the corpus (a benchmark suite, not a crawl), so the join
   * broadcasts under AQE's size rule; the train side stays ids+gram
   * through the semi-shaped inner join and aggregates per doc with
   * map-side partial counts. */
  def decontaminate(train: DataFrame, bench: DataFrame, n: Int = 4,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    def grams(df: DataFrame) =
      tokensOf(df, n, textCol, idCol)
        .select(col("doc_id"), explode(ngramsCol(col("toks"), n)).as("gram"))
    val benchGrams = grams(bench).select("gram").distinct()
    grams(train).dropDuplicates("doc_id", "gram")
      .join(benchGrams, Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** Segment a document into fixed token chunks — the line table for
   * `lineDedup` when the corpus has no natural newlines. Returns
   * (doc_id, line_idx, line); the trailing chunk may be shorter. Docs
   * with no tokens produce no lines (sequence-descends guard as above). */
  def tokenLines(docs: DataFrame, chunk: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunk >= 1, "chunk must be >= 1")
    val toks = col("toks") // materialized attribute, see ngramsCol scaladoc
    val nLines = floor((size(toks) + (chunk - 1)) / lit(chunk.toDouble)).cast("int")
    val lineArr = transform(sequence(lit(0), nLines - 1), idx =>
      struct(idx.as("line_idx"),
        array_join(slice(toks, idx * chunk + 1, lit(chunk)), " ").as("line")))
    tokensOf(docs, 1, textCol, idCol)
      .select(col("doc_id"), explode(lineArr).as("l"))
      .select(col("doc_id"), col("l.line_idx"), col("l.line"))
  }

  /** Line-level exact dedup (RefinedWeb/CCNet style): across the whole
   * corpus, each distinct line survives only at its FIRST occurrence in
   * (doc_id, line_idx) order; later occurrences are removed. Returns one
   * row per document: (doc_id, kept_lines, removed_lines, new_text) with
   * new_text = surviving lines re-joined in document order ("" when every
   * line was a duplicate).
   *
   * Plan: ONE shuffle on the line content for the keep-first ranking
   * (row_number over a unique (doc_id, line_idx) order — deterministic),
   * then ONE shuffle on doc_id for the rebuild; the reassembly is
   * collect_list → array_sort → array_join, all builtin. At web scale the
   * ranking key should be a 128-bit line hash rather than the raw line
   * (same one-line substitution as dupNgramStats); hot boilerplate lines
   * make ONE window partition each, bounded by corpus line frequency —
   * the min-by-(doc,idx) aggregate form is the swap-in if a single line's
   * frequency outgrows a task. */
  def lineDedup(lines: DataFrame): DataFrame = {
    val w = Window.partitionBy("line").orderBy("doc_id", "line_idx")
    val ranked = lines.withColumn("rn", row_number().over(w))
    ranked.groupBy("doc_id").agg(
      sum(when(col("rn") === 1, 1L).otherwise(0L)).as("kept_lines"),
      sum(when(col("rn") > 1, 1L).otherwise(0L)).as("removed_lines"),
      array_join(transform(
        array_sort(collect_list(when(col("rn") === 1,
          struct(col("line_idx"), col("line"))))),
        s => s.getField("line")), " ").as("new_text"))
  }

  /** Within-document repetition signals — the Gopher repetition-rule family
   * (Rae et al. 2021, "Scaling Language Models", table A1: duplicate-line
   * fraction, duplicate-line character fraction, top-n-gram fraction), the
   * standard pre-training quality gates applied BEFORE corpus-level dedup.
   * Per document:
   *   - `dup_line_frac`:      fraction of the doc's lines that are repeats of
   *                           an earlier identical line in the SAME document,
   *   - `dup_line_char_frac`: the same fraction weighted by line characters,
   *   - `top_bigram_frac`:    fraction of the doc's bigram windows occupied
   *                           by its single most frequent bigram (0 when the
   *                           doc has < 2 tokens and therefore no windows).
   * Lines come from [[tokenLines]] (fixed `chunk`-token segments, for corpora
   * without natural newlines — swap in a newline split for prose).
   *
   * Plan shape (the property that makes this safe at 100 TB where the
   * corpus-level ops need care): every exchange is keyed BY DOCUMENT —
   * (doc_id, line) and (doc_id, bigram) hash-aggs roll up to doc_id, so a
   * boilerplate line shared by 10^9 docs never meets itself; skew is bounded
   * by the largest single document, not by corpus-wide string frequency.
   * Two hash-agg chains + one doc_id equi-join, map-side partials on all. */
  /** (doc_id, top_n, n_bigrams) — the bigram branch of the repetition
   * signals, shared with [[QualityGate]] (which needs ONLY this branch and
   * must not pay the duplicate-line aggregation chain). Docs with < 2
   * tokens are absent; consumers left-join and coalesce. */
  private[operators] def bigramTopCounts(docs: DataFrame,
      textCol: String, idCol: String): DataFrame =
    tokensOf(docs, 2, textCol, idCol)
      .select(col("doc_id"), explode(ngramsCol(col("toks"), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_n"), sum(col("c")).as("n_bigrams"))

  def docRepetitionStats(docs: DataFrame, chunk: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val lineStats = tokenLines(docs, chunk, textCol, idCol)
      .groupBy(col("doc_id"), col("line")).agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_lines"),
        sum(col("c") - 1).as("dup_lines"),
        sum((col("c") - 1) * length(col("line"))).as("dup_chars"),
        sum(col("c") * length(col("line"))).as("n_chars"))
    lineStats.join(bigramTopCounts(docs, textCol, idCol), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        round(col("dup_lines").cast("double") / col("n_lines"), 6)
          .as("dup_line_frac"),
        // n_chars = 0 when every line is the empty token (empty doc): guard
        // the 0/0 (Spark yields NaN, not null — coalesce alone can't fix it)
        when(col("n_chars") > 0,
          round(col("dup_chars").cast("double") / col("n_chars"), 6))
          .otherwise(0.0).as("dup_line_char_frac"),
        coalesce(round(col("top_n").cast("double") / col("n_bigrams"), 6),
          lit(0.0)).as("top_bigram_frac"))
  }

  /** Deterministic token-budget subsample — "take the first `budget` tokens
   * of the corpus in hash order", the reproducible way to cut a crawl to a
   * training-token target (and the building block for per-source mixture
   * weights: run it per partition of the mixture). Documents are ordered by
   * `(md5(doc_id), doc_id)` — a fixed pseudo-random permutation, so the
   * sample is unbiased w.r.t. crawl order yet bit-stable across runs,
   * partitionings and engines — and the greedy PREFIX whose cumulative
   * token count stays ≤ `budget` is kept. Returns
   * (doc_id, n_tokens, cum_tokens) for kept docs; `cum_tokens` is the
   * running total INCLUDING the row, so the boundary is auditable.
   *
   * Exact distributed prefix-sum, the [[graft.operators.Politeness.capGlobalBudget]]
   * machinery generalised from row counts to a weight column: range-repartition
   * on the order key (the exchange IS the distributed sort) → per-partition
   * token sums (numPartitions longs to the driver) → prefix offsets → one
   * narrow keep pass that SKIPS partitions wholly past the cut. Both jobs
   * share the range shuffle; no window function, no single-partition sort,
   * no driver materialisation of rows. Tokens = whitespace split of
   * `textCol`, matching the corpus-op convention ([[tokensOf]]). */
  def sampleToTokenBudget(docs: DataFrame, budget: Long,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, "token budget must be > 0")
    // the whole corpus is a one-component mixture; constant group key ⇒
    // the range order degenerates to (md5, doc_id) exactly as documented
    tokenPrefixKeep(docs, Map("" -> budget), lit(""), textCol, idCol)
      .select("doc_id", "n_tokens", "cum_tokens")
  }

  /** Domain-mixing sampler: [[sampleToTokenBudget]] applied PER SOURCE in a
   * single pass — the "mixture weights" step of a pre-training pipeline
   * (each corpus component gets its own token budget; e.g. 60% web /
   * 30% code / 10% reference, expressed as absolute token targets).
   * Documents whose source has no budget are dropped. Returns
   * (source, doc_id, n_tokens, cum_tokens) with `cum_tokens` the running
   * per-source total including the row.
   *
   * Still ONE range shuffle for the whole mixture: ordering by
   * (source, md5(doc_id), doc_id) makes each source a contiguous run of
   * partitions, the per-partition sums report a small source→tokens map
   * each (driver state = numPartitions × mixture components — a few
   * hundred K entries even at 10k partitions × 50 components), and the
   * keep pass resumes each source's running total from its per-partition
   * offset. Looping [[sampleToTokenBudget]] per component would cost one
   * shuffle per component instead. */
  def sampleMixtureTokenBudget(docs: DataFrame, budgets: Map[String, Long],
      textCol: String = "text", idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    require(budgets.nonEmpty, "mixture budgets must be non-empty")
    require(budgets.values.forall(_ > 0), "every mixture budget must be > 0")
    tokenPrefixKeep(docs.filter(col(sourceCol).isin(budgets.keys.toSeq: _*)),
      budgets, col(sourceCol), textCol, idCol)
  }

  /** The shared exact-distributed-prefix-sum core of both samplers (one
   * machinery, two public faces — the single-budget form passes a constant
   * group key). Range-repartition on (group, md5(id), id) — the exchange IS
   * the distributed sort — then per-partition group→tokens sums to the
   * driver (numPartitions × groups entries), exclusive prefix offsets, and
   * a keep pass that resumes each group's running total from its offset.
   * Both jobs share the range shuffle's files. Early exits: a partition
   * whose every group is already past its budget returns without scanning,
   * and a partition stops pulling rows once its LAST live group overflows
   * (cum is strictly increasing per group — null-text rows are dropped at
   * the base select, so n_tokens ≥ 1). */
  private def tokenPrefixKeep(docs: DataFrame, budgets: Map[String, Long],
      sourceExpr: org.apache.spark.sql.Column,
      textCol: String, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val base = docs
      .filter(col(textCol).isNotNull) // null text ⇒ no tokens ⇒ dropped (the tokensOf convention)
      .select(sourceExpr.as("source"), col(idCol).as("doc_id"),
        // native byte-scan count (≡ size(split(text," "))) — no per-row array
        graft.functions.NativeExpressions.wsTokenCount(col(textCol))
          .cast("long").as("n_tokens"),
        md5(col(idCol).cast("string")).as("h"))
    val order = Seq(col("source").asc, col("h").asc, col("doc_id").asc)
    val parts = math.max(2, spark.sparkContext.defaultParallelism * 2)
    val sorted = base.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema
    val srcIdx = schema.fieldIndex("source")
    val idIdx = schema.fieldIndex("doc_id")
    val ntIdx = schema.fieldIndex("n_tokens")
    val rdd = sorted.rdd // build ONCE: sum and keep jobs share the range shuffle
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { r =>
        val s = r.getString(srcIdx)
        m.update(s, m.getOrElse(s, 0L) + r.getLong(ntIdx))
      }
      Iterator((i, m.toMap))
    }.collect()
    val offsets = Array.fill(parts)(Map.empty[String, Long])
    val running = scala.collection.mutable.HashMap.empty[String, Long]
    partSums.sortBy(_._1).foreach { case (i, m) =>
      offsets(i) = m.keys.map(s => s -> running.getOrElse(s, 0L)).toMap
      m.foreach { case (s, v) => running.update(s, running.getOrElse(s, 0L) + v) }
    }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val bcBud = spark.sparkContext.broadcast(budgets)
    val kept = rdd.mapPartitionsWithIndex { (i, it) =>
      val offs = bcOff.value(i)
      val buds = bcBud.value
      if (offs.nonEmpty && offs.forall { case (s, off) => off >= buds(s) })
        Iterator.empty // every group here is wholly past its cut: don't scan
      else {
        val cums = scala.collection.mutable.HashMap[String, Long](offs.toSeq: _*)
        // groups that can still keep rows here; a group leaves exactly once,
        // at its first overflow — when the set drains, stop pulling rows
        val liveSet = scala.collection.mutable.HashSet.empty[String]
        offs.foreach { case (s, off) => if (off < buds(s)) liveSet += s }
        it.takeWhile(_ => liveSet.nonEmpty).flatMap { r =>
          val s = r.getString(srcIdx)
          val c = cums.getOrElse(s, 0L) + r.getLong(ntIdx)
          cums.update(s, c)
          if (c <= buds(s))
            Some(org.apache.spark.sql.Row(s, r.get(idIdx), r.getLong(ntIdx), c))
          else {
            liveSet.remove(s)
            None
          }
        }
      }
    }
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("source", schema("source").dataType),
      org.apache.spark.sql.types.StructField("doc_id", schema("doc_id").dataType),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cum_tokens",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(kept, outSchema)
  }
}
