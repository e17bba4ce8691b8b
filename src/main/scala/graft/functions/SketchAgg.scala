package graft.functions

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Sharded cuckoo filter — the DELETION-capable seen-sketch variant at scale
 * (north_rule). A single cuckoo table cannot be union-merged (inserts kick),
 * so the scale design shards by url hash: each shard is built entirely inside
 * one partition (no merge step), probes/deletes route to `shardOf(url)`.
 * At 10^10 URLs the shards stay distributed alongside the `seen` buckets;
 * here they are collected (MBs) and broadcast like the bloom sketch.
 */
final class ShardedCuckoo(val shards: Array[CuckooFilter]) extends Serializable {
  @inline private def shardOf(s: String): Int =
    Math.floorMod(BloomSketch.hash(s, 0x5ca4d0L), shards.length.toLong).toInt
  def contains(s: String): Boolean = shards(shardOf(s)).contains(s)
  def insert(s: String): Boolean = shards(shardOf(s)).insert(s)
  def delete(s: String): Boolean = shards(shardOf(s)).delete(s)
}

/**
 * Distributed sketch construction.
 *
 * `BloomAgg` is the idiomatic typed `Aggregator[String, _, Array[Byte]]`
 * (registerable via `functions.udaf`); `buildBloom` is the scale path: one
 * sketch per partition, merged with `treeReduce` (log-depth, no driver
 * fan-in bottleneck at 1000 executors).
 */
object SketchAgg {

  final class BloomAgg(expectedItems: Long, fpp: Double)
      extends Aggregator[String, BloomSketch, Array[Byte]] {
    override def zero: BloomSketch = BloomSketch.create(expectedItems, fpp)
    override def reduce(b: BloomSketch, a: String): BloomSketch = { if (a != null) b.put(a); b }
    override def merge(b1: BloomSketch, b2: BloomSketch): BloomSketch = b1.mergeInPlace(b2)
    override def finish(r: BloomSketch): Array[Byte] = r.serialize()
    override def bufferEncoder: Encoder[BloomSketch] = Encoders.kryo[BloomSketch]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def bloomAgg(expectedItems: Long, fpp: Double): BloomAgg = new BloomAgg(expectedItems, fpp)

  /** Partition-parallel bloom build with log-depth merge.
   *
   * Every partial sketch has the FULL geometry (they must, to OR-merge), so
   * the build cost is dominated by sketch-sized transfers, not row hashing.
   * Coalescing to a few build partitions keeps that cost independent of the
   * cluster's core count (32 cores would otherwise ship 32 full sketches per
   * generation); hashing a generation's delta is trivial in comparison. */
  def buildBloom(urls: Dataset[String], expectedItems: Long, fpp: Double,
      buildPartitions: Int = 8): BloomSketch = {
    val empty = BloomSketch.create(expectedItems, fpp)
    val coalesced = urls.rdd.coalesce(math.max(1, buildPartitions))
    val rdd = coalesced.mapPartitions { it =>
      val sk = BloomSketch.create(expectedItems, fpp)
      var any = false
      it.foreach(u => if (u != null) { sk.put(u); any = true })
      if (any) Iterator.single(sk) else Iterator.empty
    }
    if (rdd.isEmpty()) empty
    else rdd.treeReduce((a, b) => a.mergeInPlace(b), depth = 2)
  }

  /** Distributed sharded-cuckoo build: urls are hash-routed to `shards`
   * partitions and each shard's table is built wholly inside its partition
   * (cuckoo tables don't merge — kicks depend on occupancy order). */
  def buildShardedCuckoo(urls: Dataset[String], expectedItems: Long,
      shards: Int = 32): ShardedCuckoo = {
    val perShard = math.max(64L, expectedItems / shards)
    val built = urls.rdd
      .keyBy(u => Math.floorMod(BloomSketch.hash(u, 0x5ca4d0L), shards.toLong).toInt)
      .partitionBy(new org.apache.spark.HashPartitioner(shards))
      .mapPartitionsWithIndex { (_, it) =>
        var shardId = -1
        val cf = CuckooFilter.create(perShard)
        it.foreach { case (sid, u) => shardId = sid; cf.insert(u) }
        if (shardId < 0) Iterator.empty else Iterator.single(shardId -> cf)
      }
      .collect().toMap
    new ShardedCuckoo(Array.tabulate(shards)(i =>
      built.getOrElse(i, CuckooFilter.create(perShard))))
  }
}
