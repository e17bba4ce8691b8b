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
   * Scale/iteration design: each round is two equi-joins (ranks⋈edges on
   * src, then nodes⋈sums on node) and one hash aggregation on dst with
   * map-side partial sums — all key-partitioned, no broadcast of the rank
   * vector (it is node-sized). The per-round lineage is cut with an eager
   * localCheckpoint exactly as in [[Dedup.connectedComponents]] (same
   * failure mode without it: the stringified plan and the task-binary RDD
   * graph both double per round); the same recompute-vs-rerun trade
   * documented there applies. Rank values stay < numNodes·scale, so with
   * the default scale = 10⁶ the dampPct multiply is overflow-safe below
   * ~10¹¹ nodes; `require`d rather than assumed. */
  def pageRankInt(edges0: DataFrame, iters: Int = 5, scale: Long = 1000000L,
      dampPct: Int = 85): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampPct >= 0 && dampPct <= 100, "dampPct must be in [0, 100]")
    val edges = edges0.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct().persist()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct().persist()
    try {
      val nNodes = nodes.count()
      require(nNodes == 0 || scale <= Long.MaxValue / math.max(1L, nNodes) / 100,
        s"scale=$scale risks 64-bit overflow at $nNodes nodes")
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("d"))
      val base = scale * (100 - dampPct) / 100
      var ranks = nodes.withColumn("rank", lit(scale)).localCheckpoint(true)
      for (_ <- 1 to iters) {
        val contrib = edges.join(ranks, edges("src") === ranks("node"))
          .join(outdeg, Seq("src"))
          .select(col("dst"),
            expr(s"(rank * $dampPct) div 100 div d").as("contrib"))
        val sums = contrib.groupBy("dst").agg(sum(col("contrib")).as("s"))
        val next = nodes.join(sums, nodes("node") === sums("dst"), "left")
          .select(col("node"),
            (lit(base) + coalesce(col("s"), lit(0L))).as("rank"))
          .localCheckpoint(true)
        Dedup.freeCheckpoint(ranks)
        ranks = next
      }
      ranks
    } finally { edges.unpersist(); nodes.unpersist(); () }
  }
}
