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
 * Skew handling (SURVEY.md §4.1): a single `Window.partitionBy(host)` puts
 * every row of a hot host in one partition. We therefore run the classic
 * exact two-stage top-k: rank within (host, salt) first — any row ranked
 * > k inside its salt bucket already has ≥ k better same-host rows, so it
 * cannot be in the host's global top-k — then rank the ≤ salt·k survivors
 * per host. The heavy first pass is spread over `salt` partitions per host;
 * the second pass sees at most salt·k rows per host.
 */
object Politeness {

  /** Adds boolean column `selected`. Input needs columns
   * (url, host, priority, next_fetch). Exact: equivalent to a single
   * per-host top-k by (priority, next_fetch, url). */
  def markTopKPerHost(tasks: DataFrame, k: Int, saltBuckets: Int = 16): DataFrame = {
    val order = Seq(col("priority").asc, col("next_fetch").asc, col("url").asc)
    val salted = tasks.withColumn("_salt", pmod(xxhash64(col("url")), lit(saltBuckets)))
    val w1 = Window.partitionBy(col("host"), col("_salt")).orderBy(order: _*)
    val stage1 = salted.withColumn("_rn1", row_number().over(w1))
    val w2 = Window.partitionBy(col("host")).orderBy(order: _*)
    // rank only the survivors; losers of stage 1 keep _rn2 = null ⇒ not selected
    stage1
      .withColumn("_rn2",
        when(col("_rn1") <= k, row_number().over(
          Window.partitionBy(col("host"), col("_rn1") <= k).orderBy(order: _*))))
      .withColumn("selected", col("_rn1") <= k && col("_rn2") <= k)
      .drop("_salt", "_rn1", "_rn2")
  }
}
