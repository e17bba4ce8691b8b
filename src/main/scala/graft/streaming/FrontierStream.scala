package graft.streaming

import graft.functions.UrlFunctions
import graft.model.Span
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming surface (SURVEY.md §7.7, optional future surface made
 * real): the reference's continuous consumer loop (rmqredis.rs:213-257) as a
 * stream. The BSP loop stays the primary engine (deterministic, golden-
 * tested); this surface covers continuous-ingest deployments where document
 * batches land as files and must be link-extracted / deduped / metered
 * online.
 *
 * Components:
 *  - `linkStream`: streaming documents(doc_id, spans) → exploded, resolved,
 *    canonicalized candidate links (same P1-P6 operators as the batch path).
 *  - `windowedOutcomeMetrics`: per-window outcome counts with a watermark —
 *    the streaming form of the A1/A2 metrics tables.
 *  - `dedupStream`: stateful URL-seen dedup via `flatMapGroupsWithState` —
 *    the streaming form of J1/J2 (per-key state = "seen before?"), emitting
 *    each canonical URL exactly once.
 */
object FrontierStream {

  /** Streaming documents → candidate canonical links (append mode). */
  def linkStream(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(filter(col("spans"), s => s.getField("kind") === Span.Link)).as("span"))
      .select(col("doc_id").as("base_url"), col("span.media_ref").as("href"))
      .withColumn("resolved", UrlFunctions.resolveHref(col("base_url"), col("href")))
      .filter(col("resolved").isNotNull)
      .withColumn("url", UrlFunctions.canonicalizeUrl(col("resolved")))
      .filter(col("url").isNotNull)
      .withColumn("host", UrlFunctions.urlHost(col("url")))
      .filter(col("host").isNotNull)
      .select("base_url", "url", "host")

  /** Watermarked sliding-window outcome counts over a streaming outcomes
   * feed (gen, url, outcome, error_kind, ts). */
  def windowedOutcomeMetrics(outcomes: DataFrame,
      watermark: String = "10 minutes", win: String = "5 minutes",
      slide: String = "5 minutes"): DataFrame =
    outcomes
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win, slide), col("outcome"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("outcome"), col("n"))

  /** Stateful exactly-once URL emission: keyed state per canonical URL —
   * first arrival emits, later arrivals are swallowed (streaming J1/J2). */
  def dedupStream(spark: SparkSession, links: DataFrame): DataFrame = {
    import spark.implicits._
    val emit = (url: String, _: Iterator[String], state: GroupState[Boolean]) => {
      if (state.exists) Iterator.empty
      else { state.update(true); Iterator.single(url) }
    }
    links.select("url").as[String]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(emit)
      .toDF("url")
  }
}
