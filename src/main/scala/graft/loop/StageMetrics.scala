package graft.loop

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
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
 *
 * Attribution rides Spark's job-local properties (snapshotted per job at
 * submit time), NOT a mutable driver field — the async listener bus can
 * process `onJobStart` after `labelled()` returned, and a field would then
 * mislabel or drop the job. Stage→label entries are evicted per GENERATION
 * at drain time (not on stage completion: a resubmitted stage attempt after
 * a fetch failure / executor loss reuses its stageId and must keep its
 * attribution), bounding the map on long crawls.
 */
/** One attributed Spark stage of one labelled action of one generation.
 * `max_task_ms` vs `task_time_ms / tasks` exposes stragglers directly;
 * `gc_ms` and `fetch_wait_ms` (both INSIDE task_time_ms) attribute
 * inflation to collector pressure vs cross-executor shuffle fetch. */
final case class StageRow(gen: Int, action: String, stage_id: Int,
    tasks: Long, task_time_ms: Long, max_task_ms: Long, records_read: Long,
    shuffle_read_bytes: Long, shuffle_write_bytes: Long,
    gc_ms: Long, fetch_wait_ms: Long)

final class StageMetrics(sc: SparkContext) extends SparkListener {
  import StageMetrics.{LabelKey, MarkerKey}

  // stage id → (gen, action) attribution, from the submitting job's properties
  private val stageLabel = mutable.Map.empty[Int, (Int, String)]
  // stage id → (min submission, max completion) epoch ms across attempts —
  // kept OUT of StageRow so the crawl metrics table schema is unchanged;
  // consumers (ScalingBench occupancy) read it via stageSpans() pre-drain
  private val stageSpan = mutable.Map.empty[Int, (Long, Long)]
  private val acc =
    mutable.Map.empty[(Int, Int, String), (Long, Long, Long, Long, Long, Long, Long, Long)]
  // marker bookkeeping for settle(): jobId → marker token; tokens seen at JobEnd
  private val markerJob = mutable.Map.empty[Int, Long]
  private val markerSeen = mutable.Set.empty[Long]
  private var markerCounter = 0L

  /** Label every job submitted while `f` runs (job-local property — safe
   * against listener-bus lag, unlike a mutable field). */
  def labelled[T](gen: Int, action: String)(f: => T): T = {
    sc.setLocalProperty(LabelKey, s"$gen:$action")
    try f finally sc.setLocalProperty(LabelKey, null)
  }

  override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
    val props = jobStart.properties
    if (props != null) {
      Option(props.getProperty(MarkerKey)).foreach { tok =>
        markerSeen.synchronized { markerJob(jobStart.jobId) = tok.toLong }
      }
      Option(props.getProperty(LabelKey)).foreach { s =>
        val i = s.indexOf(':')
        if (i > 0) {
          val label = (s.substring(0, i).toInt, s.substring(i + 1))
          acc.synchronized {
            jobStart.stageInfos.foreach(si => stageLabel(si.stageId) = label)
          }
        }
      }
    }
  }

  override def onJobEnd(jobEnd: SparkListenerJobEnd): Unit =
    markerSeen.synchronized {
      markerJob.remove(jobEnd.jobId).foreach(markerSeen += _)
    }

  // NOTE deliberately NO eviction on stage completion: a fetch-failure or
  // executor loss RESUBMITS a completed stage under the same stageId, and
  // evicting at first completion would drop the retry attempt's attribution
  // — under-counting cost precisely in the recovery path. Labels are
  // evicted per generation at drain() instead (the action is over by then),
  // which bounds the map just the same.

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
    val si = ev.stageInfo
    for (sub <- si.submissionTime; comp <- si.completionTime) acc.synchronized {
      // labelled stages only (the job's onJobStart precedes its stage
      // completions on the ordered listener bus): unlabelled jobs — settle
      // markers, metrics-table writes, arbitrary caller jobs — must not
      // grow the map, or a long crawl leaks one entry per such stage and
      // the per-generation drain eviction never reclaims them
      if (stageLabel.contains(si.stageId)) {
        val (lo, hi) = stageSpan.getOrElse(si.stageId, (Long.MaxValue, Long.MinValue))
        stageSpan(si.stageId) = (math.min(lo, sub), math.max(hi, comp))
      }
    }
  }

  /** (stageId, submissionMs, completionMs) for `gen`'s labelled stages —
   * call BEFORE drain(), which evicts the labels. Spans let a caller
   * compute wall occupancy: wall time covered by ≥1 running stage vs
   * scheduler/driver gaps between stages. */
  def stageSpans(gen: Int): Seq[(Int, Long, Long)] = {
    settle()
    acc.synchronized {
      stageLabel.iterator.collect { case (sid, (g, _)) if g == gen =>
        stageSpan.get(sid).map { case (lo, hi) => (sid, lo, hi) }
      }.flatten.toVector.sortBy(_._2)
    }
  }

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) acc.synchronized {
      stageLabel.get(taskEnd.stageId).foreach { case (gen, action) =>
        val key = (gen, taskEnd.stageId, action)
        val (t, ms, mx, rec, sr, sw, gc, fw) =
          acc.getOrElse(key, (0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
        acc(key) = (t + 1L, ms + m.executorRunTime,
          math.max(mx, m.executorRunTime),
          rec + m.inputMetrics.recordsRead,
          sr + m.shuffleReadMetrics.totalBytesRead,
          sw + m.shuffleWriteMetrics.bytesWritten,
          gc + m.jvmGCTime,
          fw + m.shuffleReadMetrics.fetchWaitTime)
      }
    }
  }

  /** Flush the async listener bus: run a tiny marker job and wait until THIS
   * listener has processed its JobEnd — the bus is one ordered queue, so
   * every event posted before the marker has been delivered by then. */
  def settle(timeoutMs: Long = 2000): Unit = {
    val tok = { markerCounter += 1; markerCounter }
    sc.setLocalProperty(MarkerKey, tok.toString)
    try sc.parallelize(Seq(0), 1).count()
    finally sc.setLocalProperty(MarkerKey, null)
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!markerSeen.synchronized(markerSeen.remove(tok)) &&
           System.nanoTime() < deadline) Thread.sleep(1)
  }

  /** Settle the bus, then drain everything recorded for `gen` (rows sorted
   * for determinism). Evicts this and older generations' stage labels —
   * their actions are complete, so no further (re-)attempt can need them. */
  def drain(gen: Int): Seq[StageRow] = {
    settle()
    acc.synchronized {
      val keys = acc.keysIterator.filter(_._1 == gen).toVector
      val rows = keys.sortBy(k => (k._3, k._2)).map { k =>
        val (t, ms, mx, rec, sr, sw, gc, fw) = acc(k)
        StageRow(k._1, k._3, k._2, t, ms, mx, rec, sr, sw, gc, fw)
      }
      keys.foreach(acc.remove)
      val evicted = stageLabel.collect { case (sid, (g, _)) if g <= gen => sid }
      stageLabel.filterInPlace { case (_, (g, _)) => g > gen }
      evicted.foreach(stageSpan.remove)
      rows
    }
  }
}

object StageMetrics {
  val LabelKey = "graft.metrics.label"
  val MarkerKey = "graft.metrics.marker"
}
