package graft

import graft.loop.StageMetrics
import org.scalatest.funsuite.AnyFunSuite

/** The listener's two read surfaces: per-stage attribution rows (drain)
 * and the round-5 stage spans that power ScalingBench's wall-occupancy
 * decomposition (stage_covered_sec / sched_gap_sec — the instrumentation
 * that exposed the robots-broadcast Amdahl term, BENCH.md §2g). */
class StageMetricsSpec extends AnyFunSuite {

  test("stageSpans: labelled stages report sane, ordered spans; drain evicts them") {
    val spark = SparkSuite.spark
    val sm = new StageMetrics(spark.sparkContext)
    spark.sparkContext.addSparkListener(sm)
    try {
      val t0 = System.currentTimeMillis()
      val n = sm.labelled(7, "probe") {
        // two stages: shuffle (groupBy) + result
        spark.range(0, 100000, 1, 8).toDF("id")
          .groupBy(org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.lit(13)).as("k"))
          .count().count()
      }
      val t1 = System.currentTimeMillis()
      assert(n == 13L)

      val spans = sm.stageSpans(7)
      assert(spans.nonEmpty, "labelled stages must yield spans")
      // sane: within the action's wall window (generous slack for the
      // async listener bus), completion >= submission, sorted by submission
      spans.foreach { case (_, sub, comp) =>
        assert(comp >= sub, s"completion $comp before submission $sub")
        assert(sub >= t0 - 5000 && comp <= t1 + 5000,
          s"span [$sub,$comp] outside wall [$t0,$t1]")
      }
      assert(spans == spans.sortBy(_._2), "spans must be submission-ordered")
      // a generation that never ran has no spans
      assert(sm.stageSpans(99).isEmpty)

      // drain returns the attribution rows for the same stages and evicts
      val rows = sm.drain(7)
      assert(rows.nonEmpty && rows.forall(r => r.gen == 7 && r.action == "probe"))
      assert(sm.stageSpans(7).isEmpty, "drain must evict the gen's spans")
    } finally spark.sparkContext.removeSparkListener(sm)
  }
}
