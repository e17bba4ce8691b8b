package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-host politeness cap — the priority-queue operator of north_rule,
 * generalising the reference's only backpressure mechanism
 * (prefetch_count=5, worker/src/rmqredis.rs:162-165): at most `k` fetches
 * per host per generation, chosen by (priority, next_fetch, url) — a
 * deterministic per-host priority queue.
 *
 * Scale design (SURVEY.md §4.1), two layers:
 *
 *  1. **Count gate.** On a Zipf frontier most HOSTS are under the cap (the
 *     long tail) — those rows are all selected and never need ranking. A
 *     map-side-combinable host count, filtered to the OVER-CAP hosts
 *     (bounded by rows/cap), splits the frontier; only over-cap hosts'
 *     rows enter the sort machinery. The small over-cap side broadcasts
 *     under AQE, so the frontier itself is not exchanged for the split;
 *     past the broadcast threshold AQE falls back to a skew-split shuffle
 *     join — either beats sort-shuffling every row.
 *  2. **Salted two-stage top-k** for the over-cap subset: a single
 *     `Window.partitionBy(host)` would put every row of a hot host in one
 *     partition, so rank within (host, salt) first — any row ranked > k
 *     inside its salt bucket already has ≥ k better same-host rows and
 *     cannot be in the host's global top-k — then rank the ≤ salt·k
 *     survivors per host. Exact: equivalent to one per-host top-k.
 *
 * Contract: `host` must be non-null (the crawl guarantees it: host-less
 * URLs are dropped at extraction).
 */
object Politeness {

  /** Adds boolean column `selected`. Input needs columns
   * (url, host, priority, next_fetch). Exact: equivalent to a single
   * per-host top-k by (priority, next_fetch, url). */
  def markTopKPerHost(tasks: DataFrame, k: Int, saltBuckets: Int = 16): DataFrame =
    markTopKVarCap(tasks.withColumn("_k", lit(k.toLong)), saltBuckets)

  /** The count-gated salted top-k over a PER-ROW cap column `_k` (constant
   * within each host — it is host-derived: the plain cap, or 1 for
   * crawl-delayed hosts). One host-count aggregate and one ranking pass
   * whatever mix of caps is present; `_k` is consumed.
   *
   * r6 gate shape: the count table is filtered to OVER-CAP hosts before the
   * join. That set is bounded by rows/cap (a host needs > cap rows to enter
   * it), so on a Zipf frontier it is thousands of rows where the full count
   * table is host-cardinality — the previous full-table join forced the
   * whole frontier through a host-keyed exchange (+ its sort-merge sorts;
   * ~540 MB and the dominant politeness cost at the steady-state bench);
   * against the small over-cap side AQE picks a broadcast join and the
   * frontier's big side is NOT exchanged at all. If the over-cap set ever
   * outgrows the broadcast threshold, AQE falls back to exactly the
   * previous shuffle join, skew-split included — strictly no worse. */
  private def markTopKVarCap(tasks: DataFrame, saltBuckets: Int): DataFrame = {
    val order = Seq(col("priority").asc, col("next_fetch").asc, col("url").asc)
    // _k is host-constant, so max(_k) IS the host's cap; keeping the filter
    // inside the aggregate output leaves rows/cap as the join side's bound
    val overCounts = tasks.groupBy(col("host"))
      .agg(count(lit(1)).as("_hn"), max(col("_k")).as("_hk"))
      .filter(col("_hn") > col("_hk"))
      .select(col("host").as("_chost"), col("_hn"))
    // NULL-SAFE join (<=>): contract-violating null-host rows match their own
    // group-count row (groupBy and Window both treat nulls as one group), so
    // they flow through the same under-cap/ranking split as any host — the
    // pure-window formulation's behaviour exactly: kept, ranked together,
    // capped at k. A plain equi-join would never match null keys and either
    // drop the rows or (with a coalesce-to-1 fallback) select ALL of them
    // uncapped.
    val joined = tasks.join(overCounts, col("host") <=> col("_chost"), "left")
      .drop("_chost")
    // long tail: host absent from the over-cap side ⇒ its whole row set fits
    // under its cap — selected without ranking (k = 0 cannot land here: every
    // host with ≥ 1 row then has _hn > 0 = _k and joins non-null)
    val under = joined.filter(col("_hn").isNull)
      .drop("_hn", "_k").withColumn("selected", lit(true))
    // hot heads: exact two-stage salted top-k against the per-host cap.
    // (A priority-boundary prune — decide all but one priority class per
    // host arithmetically from (host, priority) counts and rank only the
    // boundary class — was tried this round and REVERTED: it cuts the
    // stage-1 sort input ~10×, but the extra union branches re-scan the
    // frontier subtree once each, and a same-JVM interleaved A/B on the 6M-row
    // steady-state frontier measured it ~2× SLOWER (6.4–7.9 s vs 2.9–4.4 s);
    // the sort was never the politeness bottleneck — the per-branch frontier
    // passes are. OPTIMIZATION_r06.md §politeness has the numbers.)
    val over = joined.filter(col("_hn").isNotNull).drop("_hn")
    val salted = over.withColumn("_salt", pmod(xxhash64(col("url")), lit(saltBuckets)))
    val w1 = Window.partitionBy(col("host"), col("_salt")).orderBy(order: _*)
    val stage1 = salted.withColumn("_rn1", row_number().over(w1))
    // Stage 2 ranks ONLY stage-1 survivors — at most salt·k rows per host, so
    // the per-host window partition is bounded no matter how hot the host.
    // Losers never enter a window: a row ranked > k inside its salt bucket
    // already has ≥ k better same-host rows, so `selected = false` is decided
    // without sorting it again. (Ranking losers through the same window —
    // e.g. partitionBy(host, _rn1 <= _k) — would send every loser row of a
    // Zipf-head host to one (host, false) partition: the exact single-task
    // hot-host sort the salt exists to break.)
    val survivors = stage1.filter(col("_rn1") <= col("_k"))
      .withColumn("_rn2",
        row_number().over(Window.partitionBy(col("host")).orderBy(order: _*)))
      .withColumn("selected", col("_rn2") <= col("_k"))
      .drop("_salt", "_rn1", "_rn2", "_k")
    val losers = stage1.filter(col("_rn1") > col("_k"))
      .withColumn("selected", lit(false))
      .drop("_salt", "_rn1", "_k")
    under.unionByName(survivors).unionByName(losers)
  }

  /** Crawl-delay-aware selection (north_rule "per-host politeness delays"
   * via the (priority, next-fetch-time) queue key):
   *
   *  - a task whose `next_fetch` generation hasn't arrived (`next_fetch >
   *    gen`) is INELIGIBLE — deferred untouched;
   *  - an eligible task of a host with robots `Crawl-delay` d competes under
   *    an effective cap of 1 (one politeness window = one generation, so a
   *    delayed host fetches ≤1 URL per window and the caller stamps its
   *    remaining tasks `next_fetch = gen + d` — ≤1 URL per d generations);
   *  - everything else takes the normal per-host top-k.
   *
   * `delays` is (host, delay ≥ 1); None ⇒ only the eligibility split runs.
   * The delay join is host-keyed and tiny-sided — the optimizer broadcasts
   * it at any realistic delayed-host count. */
  def markEligibleTopK(tasks: DataFrame, k: Int, saltBuckets: Int, gen: Long,
      delays: Option[DataFrame]): DataFrame = {
    val ineligible = tasks.filter(col("next_fetch") > gen)
      .withColumn("selected", lit(false))
    val eligible = tasks.filter(col("next_fetch") <= gen)
    val markedEligible = delays match {
      case None => markTopKPerHost(eligible, k, saltBuckets)
      case Some(d) =>
        // per-row effective cap: 1 for crawl-delayed hosts, k otherwise —
        // ONE count gate + ONE salted top-k pass over the whole eligible set
        // (the former delayed/normal split ran the host-count aggregate
        // twice over disjoint subsets for the same answer)
        val dl = d.select(col("host"), col("delay"))
        val tagged = eligible.join(dl, Seq("host"), "left")
          .withColumn("_k",
            when(col("delay") >= 1, lit(1L)).otherwise(lit(k.toLong)))
          .drop("delay")
        markTopKVarCap(tagged, saltBuckets)
    }
    markedEligible.unionByName(ineligible)
  }

  /** Global per-generation fetch budget: demote all but the best `budget`
   * selected tasks (by the same deterministic (priority, next_fetch, url)
   * queue key, now ranked ACROSS hosts) back to `selected = false`. The
   * composition stays polite — winners are a subset of the per-host
   * selection, so no host exceeds its cap and no delay window is violated;
   * demoted tasks take the existing deferred path and re-compete next
   * generation.
   *
   * This is the knob the reference does not have and a 100-TB crawl cannot
   * run without: a BSP generation fetches min(frontier, hosts·cap) pages,
   * and at 10^8 discovered hosts that is an unbounded step — the budget
   * bounds per-generation latency/failure blast radius to the cluster's
   * actual fetch capacity.
   *
   * Exact distributed top-B without collecting B rows to the driver
   * (`sort().limit(B)` plans TakeOrdered — a driver materialization; a
   * single global Window is a one-partition sort): range-repartition the
   * selected rows on the queue key (the range exchange IS the distributed
   * sort), count rows per range partition (tiny — `numPartitions` longs to
   * the driver), prefix-sum into per-partition global offsets, then demote
   * rows whose offset+index ≥ budget in one narrow pass. Both jobs hang off
   * the SAME RDD, so the second reuses the first's shuffle files. Ties are
   * impossible (url is unique within a frontier), so the winner set is
   * independent of the physical partition layout. */
  def capGlobalBudget(marked: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, "budget must be > 0 (use no budget for unlimited)")
    val spark = marked.sparkSession
    val sel = marked.filter(col("selected"))
    val unsel = marked.filter(!col("selected"))
    val order = Seq(col("priority").asc, col("next_fetch").asc, col("url").asc)
    val parts = math.max(2, spark.sparkContext.defaultParallelism * 2)
    val sorted = sel.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema
    val selIdx = schema.fieldIndex("selected")
    val rdd = sorted.rdd // build ONCE: both jobs share the shuffle
    val counts = rdd.mapPartitionsWithIndex((i, it) =>
      Iterator((i, it.size.toLong))).collect().toMap
    val offsets = Array.tabulate(parts)(identity)
      .scanLeft(0L)((acc, i) => acc + counts.getOrElse(i, 0L)).init
    if (offsets.lastOption.getOrElse(0L) +
        counts.getOrElse(parts - 1, 0L) <= budget) return marked // under budget
    val bc = spark.sparkContext.broadcast(offsets)
    val demoted = rdd.mapPartitionsWithIndex { (i, it) =>
      var rank = bc.value(i)
      it.map { r =>
        val keep = rank < budget; rank += 1
        if (keep) r
        else org.apache.spark.sql.Row.fromSeq(r.toSeq.updated(selIdx, false))
      }
    }
    spark.createDataFrame(demoted, schema).unionByName(unsel)
  }
}
