package graft

import graft.corpus.{CorpusConfig, CorpusTables}
import graft.streaming.FrontierStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Structured Streaming smoke: file-source documents stream through the
 * same P1-P6 operators, with stateful dedup and watermarked metrics. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def stage(cfg: CorpusConfig): (String, Long) = {
    val dir = Files.createTempDirectory("graft-stream").toString
    val docs = CorpusTables.documents(spark, cfg).toDF()
    docs.write.mode("overwrite").parquet(dir)
    (dir, docs.count())
  }

  test("linkStream + dedupStream: streaming output = batch distinct links") {
    val cfg = CorpusConfig(seed = 42L, numHosts = 8, maxPages = 16)
    val (dir, _) = stage(cfg)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)

    val links = FrontierStream.linkStream(stream)
    val deduped = FrontierStream.dedupStream(spark, links)
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("stream_links")
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("stream_links").collect().map(_.getString(0)).toSet
    val want = FrontierStream.linkStream(spark.read.parquet(dir))
      .select("url").distinct().collect().map(_.getString(0)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("windowed outcome metrics with watermark aggregate by window+outcome") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-oc").toString
    Seq(
      (0, "http://a/1", "ok", "", java.sql.Timestamp.valueOf("2026-01-01 10:00:10")),
      (0, "http://a/2", "ok", "", java.sql.Timestamp.valueOf("2026-01-01 10:01:00")),
      (0, "http://a/3", "err", "InvalidPage", java.sql.Timestamp.valueOf("2026-01-01 10:02:00")),
      (1, "http://a/4", "ok", "", java.sql.Timestamp.valueOf("2026-01-01 10:07:00"))
    ).toDF("gen", "url", "outcome", "error_kind", "ts")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    // complete mode: append-mode windows only emit on a LATER batch advancing
    // the watermark; a one-shot AvailableNow run has none
    val q = FrontierStream.windowedOutcomeMetrics(stream)
      .writeStream.outputMode("complete").format("memory").queryName("oc_metrics")
      .option("checkpointLocation", Files.createTempDirectory("graft-ckpt2").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("oc_metrics").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(rows.contains(("2026-01-01 10:00:00.0", "ok", 2L)), s"got $rows")
    assert(rows.contains(("2026-01-01 10:00:00.0", "err", 1L)), s"got $rows")
    assert(rows.contains(("2026-01-01 10:05:00.0", "ok", 1L)), s"got $rows")
  }
}
