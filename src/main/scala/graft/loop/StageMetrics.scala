package graft.loop

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import scala.collection.mutable

/**
 * Per-stage wall-time attribution (reference A2: worker/src/metrics/
 * influx_client.rs:60-97 records per-task ms deltas for receive/download/
 * extract/normalise/filter/cull; call sites worker.rs:68-131).
 *
 * In a fused Catalyst pipeline those phases execute inside a handful of
 * ACTIONS, each of several shuffle-bounded Spark stages. The honest per-stage
 * clock is therefore: label every action the loop triggers (politeness+fetch+
 * extract+normalise+filter+cull all evaluate inside `frontier_write`; the
 * seen delta inside `seen_write`; outcome routing inside `outcomes_write`;
 * sketch maintenance inside `sketch_build`) and attribute each Spark stage's
 * summed task wall-time, records and shuffle bytes to that label via a
 * SparkListener. One row per (generation, action, spark stage).
 */
/** One attributed Spark stage of one labelled action of one generation.
 * `max_task_ms` vs `task_time_ms / tasks` exposes stragglers directly. */
final case class StageRow(gen: Int, action: String, stage_id: Int,
    tasks: Long, task_time_ms: Long, max_task_ms: Long, records_read: Long,
    shuffle_read_bytes: Long, shuffle_write_bytes: Long)

final class StageMetrics extends SparkListener {

  // label active at job start → its stage ids
  private val stageLabel = mutable.Map.empty[Int, (Int, String)]
  private val acc = mutable.Map.empty[(Int, Int, String), (Long, Long, Long, Long, Long, Long)]
  @volatile private var current: Option[(Int, String)] = None

  /** Label every job submitted while `f` runs. Single-threaded driver loop —
   * the label is a plain field, not thread-local. */
  def labelled[T](gen: Int, action: String)(f: => T): T = {
    current = Some((gen, action))
    try f finally current = None
  }

  override def onJobStart(jobStart: SparkListenerJobStart): Unit =
    current.foreach { label =>
      jobStart.stageInfos.foreach(si => stageLabel(si.stageId) = label)
    }

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit =
    stageLabel.get(taskEnd.stageId).foreach { case (gen, action) =>
      val m = taskEnd.taskMetrics
      if (m != null) {
        val key = (gen, taskEnd.stageId, action)
        acc.synchronized {
          val (t, ms, mx, rec, sr, sw) = acc.getOrElse(key, (0L, 0L, 0L, 0L, 0L, 0L))
          acc(key) = (t + 1L, ms + m.executorRunTime,
            math.max(mx, m.executorRunTime),
            rec + m.inputMetrics.recordsRead,
            sr + m.shuffleReadMetrics.totalBytesRead,
            sw + m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }

  /** Drain everything recorded for `gen` (rows sorted for determinism). */
  def drain(gen: Int): Seq[StageRow] = acc.synchronized {
    val keys = acc.keysIterator.filter(_._1 == gen).toVector
    val rows = keys.sortBy(k => (k._3, k._2)).map { k =>
      val (t, ms, mx, rec, sr, sw) = acc(k)
      StageRow(k._1, k._3, k._2, t, ms, mx, rec, sr, sw)
    }
    keys.foreach(acc.remove)
    rows
  }
}
