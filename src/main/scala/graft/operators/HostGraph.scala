package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Host/link-graph analytics for crawl prioritisation — the aggregate view a
 * scheduler builds over the exchange's discovered links (the reference keeps
 * per-task link counts only, worker/src/main.rs observation counters; a
 * host-level rank is the standard extension a frontier scheduler feeds on).
 *
 * PageRank here is the INTEGER-ARITHMETIC variant: ranks are 64-bit integer
 * "rank units" (initial rank = `scale`) and every step is integer multiply /
 * integer (floor) division / integer sum. Floating-point PageRank is
 * order-sensitive under distributed summation — two runs (or Spark vs an
 * oracle) can differ in the last ulps depending on partitioning; the integer
 * form is bit-exact on any cluster layout and any aggregation order, which
 * is what lets the DuckDB oracle hash-match it and what makes reruns
 * byte-stable for downstream snapshotting. The quantisation error vs real
 * PageRank is ≤ outdeg⁻¹-rounding per edge per step, i.e. ~10⁻⁶ relative at
 * the default scale — far below anything a scheduler acts on.
 */
object HostGraph {

  /** Integer PageRank over a directed edge list (src, dst).
   *
   * r₀(v) = scale;
   * r_{t+1}(v) = (scale·(100−dampPct)) div 100
   *              + Σ_{u→v} ((r_t(u)·dampPct) div 100) div outdeg(u).
   *
   * Self-loops are dropped and edges de-duplicated (a link graph, not a
   * multigraph). Dangling nodes (no out-edges) simply leak their damped
   * mass — the classic simplification; total mass is NOT conserved and the
   * ranks are a relative ordering, which is all a frontier scheduler needs.
   *
   * Scale/iteration design (r6 shape): the out-degree is joined onto the
   * edge list ONCE up front (`wedges`), so each round is one equi-join
   * (wedges⋈ranks on src) plus one hash aggregation on node with map-side
   * partial sums; per-node zero rows ride the aggregate so dangling-in
   * nodes get the base term without a second join. All key-partitioned, no
   * broadcast of the rank vector (it is node-sized). Lineage is cut with
   * an eager localCheckpoint every `cutEvery` rounds (default 3) — enough
   * to bound the stringified-plan/task-binary growth that motivates the
   * per-round cut in [[Dedup.connectedComponents]] (that failure needs
   * dozens of uncut rounds) while letting one job execute a whole segment
   * of rounds instead of paying driver-sequential latency per round; the
   * same recompute-vs-rerun trade documented there applies. Rank values
   * stay < numNodes·scale, so with the default scale = 10⁶ the dampPct
   * multiply is overflow-safe below ~10¹¹ nodes; `require`d rather than
   * assumed. */
  def pageRankInt(edges0: DataFrame, iters: Int = 5, scale: Long = 1000000L,
      dampPct: Int = 85, cutEvery: Int = 3): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampPct >= 0 && dampPct <= 100, "dampPct must be in [0, 100]")
    require(cutEvery >= 1, "cutEvery must be >= 1")
    val edges = edges0.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct().persist()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct().persist()
    // out-degree pre-joined ONCE (r6): the previous form re-ran the
    // outdeg aggregate AND its join inside every round's plan — two of the
    // four per-round exchanges for a value that never changes.
    val wedges = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("d")), Seq("src"))
      .select(col("src"), col("dst"), col("d")).persist()
    try {
      val nNodes = nodes.count()
      require(nNodes == 0 || scale <= Long.MaxValue / math.max(1L, nNodes) / 100,
        s"scale=$scale risks 64-bit overflow at $nNodes nodes")
      val base = scale * (100 - dampPct) / 100
      // per-node zero rows ride the aggregate so every node gets base even
      // with no in-edges — replaces the previous per-round nodes⋈sums LEFT
      // join (one fewer join + exchange per round; integer sum is
      // order-independent, so the result is bit-identical).
      val zeros = nodes.select(col("node"), lit(0L).as("contrib"))
      var ranks = nodes.withColumn("rank", lit(scale))
      if (iters == 0) return ranks.localCheckpoint(true)
      // Lineage is cut every `cutEvery` rounds rather than every round: the
      // eager per-round localCheckpoint made each round its own job (5 jobs
      // of driver-sequential latency for q37's 5 iterations); chaining a few
      // rounds into one plan keeps the stringified-plan/task-binary growth
      // bounded (the Dedup.connectedComponents failure mode needs dozens of
      // UNCUT rounds) while an action runs the whole segment as one job.
      var lastCp: Option[DataFrame] = None
      var sinceCut = 0
      for (i <- 1 to iters) {
        val contrib = wedges.join(ranks, wedges("src") === ranks("node"))
          .select(col("dst").as("node"),
            expr(s"(rank * $dampPct) div 100 div d").as("contrib"))
        val next = contrib.unionByName(zeros)
          .groupBy("node").agg((lit(base) + sum(col("contrib"))).as("rank"))
        sinceCut += 1
        if (sinceCut >= cutEvery || i == iters) {
          val cut = next.localCheckpoint(true)
          lastCp.foreach(Dedup.freeCheckpoint)
          lastCp = Some(cut)
          ranks = cut
          sinceCut = 0
        } else ranks = next
      }
      ranks
    } finally { edges.unpersist(); nodes.unpersist(); wedges.unpersist(); () }
  }
}
