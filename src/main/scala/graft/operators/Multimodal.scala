package graft.operators

import graft.functions.BloomSketch
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata travelling with every media blob. */
final case class MediaMeta(media_ref: String, mime: String, n_bytes: Long, sha: Long)

/** One media row: opaque bytes + metadata (the `media` spans made durable). */
final case class MediaBlob(doc_id: String, media_ref: String, mime: String,
    bytes: Array[Byte])

/** Decoded/extracted features for one blob. */
final case class MediaFeatures(doc_id: String, media_ref: String, mime: String,
    n_bytes: Long, sha: Long, width: Int, height: Int, duration_ms: Long,
    feature: Array[Float])

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed in BATCHES via `mapPartitions` (the Scala
 * analogue of arrow-batched UDFs — one decoder init per partition, vectorised
 * inner loop). The actual codec step is STUBBED (this container ships no
 * image/audio libraries): `FakeDecoder` derives deterministic pseudo-features
 * from the bytes, so schema / partitioning / batch shape / feature plumbing
 * are all real and testable while the decoder body is swappable.
 */
object Multimodal {

  /** THE STUB: a real deployment replaces this with an actual codec
   * (e.g. libjpeg/ffmpeg bindings). Deterministic fake: dimensions and
   * features are pure functions of the bytes. */
  object FakeDecoder {
    def decode(mime: String, bytes: Array[Byte], featureDim: Int): (Int, Int, Long, Array[Float]) = {
      val h = {
        var acc = 0xcbf29ce484222325L
        var i = 0
        while (i < bytes.length) { acc ^= bytes(i).toLong; acc *= 0x100000001b3L; i += 1 }
        acc
      }
      val width = 64 + Math.floorMod(h, 1024L).toInt
      val height = 64 + Math.floorMod(h >>> 16, 1024L).toInt
      val durationMs = if (mime.startsWith("video") || mime.startsWith("audio"))
        Math.floorMod(h >>> 24, 600000L) else 0L
      val feat = Array.tabulate(featureDim) { i =>
        ((BloomSketch.hash(s"$h:$i", 0xfeedL) >> 11).toDouble / (1L << 52).toDouble).toFloat
      }
      (width, height, durationMs, feat)
    }
  }

  /** Materialise media blobs from the corpus media spans (bytes are the
   * deterministic fake payload derived from the ref — stands in for the
   * fetched binary). */
  def mediaBlobs(spark: SparkSession, docs: DataFrame): Dataset[MediaBlob] = {
    import spark.implicits._
    docs.select(col("doc_id"),
        explode(filter(col("spans"), s => s.getField("kind") === lit("media"))).as("span"))
      .select(col("doc_id"), col("span.media_ref").as("media_ref"))
      .withColumn("mime",
        when(col("media_ref").startsWith("img://"), "image/fake")
          .when(col("media_ref").startsWith("aud://"), "audio/fake")
          .otherwise("application/octet-stream"))
      .withColumn("bytes", encode(col("media_ref"), "UTF-8").cast("binary"))
      .as[MediaBlob]
  }

  /** Batched decode / feature-extract: one decoder per partition, rows
   * streamed through it. The partition is the batch; repartition upstream by
   * size so each batch fits decoder memory. */
  def extractFeatures(blobs: Dataset[MediaBlob], featureDim: Int = 16): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // decoder init happens HERE, once per batch/partition
      it.map { b =>
        val sha = {
          var acc = 0xcbf29ce484222325L
          var i = 0
          while (i < b.bytes.length) { acc ^= b.bytes(i).toLong; acc *= 0x100000001b3L; i += 1 }
          acc
        }
        val (w, h, dur, feat) = FakeDecoder.decode(b.mime, b.bytes, featureDim)
        MediaFeatures(b.doc_id, b.media_ref, b.mime, b.bytes.length.toLong, sha,
          w, h, dur, feat)
      }
    }
  }

  /** Metadata-only projection (no decode) — cheap stats path. */
  def mediaMeta(blobs: Dataset[MediaBlob]): DataFrame =
    blobs.toDF().select(col("doc_id"), col("media_ref"), col("mime"),
      length(col("bytes")).as("n_bytes"),
      md5(col("bytes")).as("content_md5"))

  /** One resized variant per blob. */
  final case class ResizedMedia(doc_id: String, media_ref: String,
      width: Int, height: Int, out_w: Int, out_h: Int)

  /** Batched RESIZE plumbing: decode dims, compute the aspect-preserving
   * target box (longest side clamped to maxDim), and (in a real deployment)
   * re-encode — the rescale math and batch shape are real, the pixel work is
   * the same swappable stub as `extractFeatures`. */
  def resizeMedia(blobs: Dataset[MediaBlob], maxDim: Int = 256): Dataset[ResizedMedia] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // decoder/encoder init once per partition-batch
      it.map { b =>
        val (w, h, _, _) = FakeDecoder.decode(b.mime, b.bytes, 0)
        val maxSide = math.max(w, h)
        val scale = if (maxSide <= maxDim) 1.0 else maxDim.toDouble / maxSide
        ResizedMedia(b.doc_id, b.media_ref, w, h,
          math.max(1, math.floor(w * scale).toInt),
          math.max(1, math.floor(h * scale).toInt))
      }
    }
  }

  /** One sampled frame (or audio window) per row. */
  final case class MediaFrame(doc_id: String, media_ref: String,
      frame_idx: Int, ts_ms: Long)

  /** Batched FRAME-SAMPLE plumbing: decode duration, emit one row per
   * sampled timestamp (every `everyMs`, at most `maxFrames`) — the fan-out
   * shape of video/audio feature pipelines (one blob in → N frame rows out).
   * Still images have duration 0 ⇒ exactly one frame at t=0. */
  def frameSample(blobs: Dataset[MediaBlob], everyMs: Long = 40000L,
      maxFrames: Int = 16): Dataset[MediaFrame] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        val (_, _, durationMs, _) = FakeDecoder.decode(b.mime, b.bytes, 0)
        val n = math.min(maxFrames.toLong, durationMs / everyMs + 1L).toInt
        (0 until n).iterator.map(i => MediaFrame(b.doc_id, b.media_ref, i, i * everyMs))
      }
    }
  }
}
