package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for Spark-backed suites (one JVM-wide session). */
object SparkSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // A long-lived local session must survive a minutes-long stall (GC
      // storm, co-tenant CPU freeze — BENCH.md §0 documents 5× co-tenant
      // slowdowns on this box): at the 120 s default HeartbeatReceiver
      // expires the local executor, and local-mode BlockManager
      // RE-registration is impossible (it looks up the cluster-only
      // CoarseGrainedScheduler endpoint), so every later heartbeat fails
      // until Spark kills the JVM with exit 56 — observed killing this
      // suite mid-run. Cluster deployments keep the default: there,
      // re-registration works and expiry is the right call.
      .config("spark.storage.blockManagerHeartbeatTimeoutMs", "600000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
