package graft.functions

import java.nio.ByteBuffer

/**
 * Partitioned bloom-filter seen-sketch (north_rule: "partitioned bloom-filter
 * union-merge") — B independent sketches, URL-hash-routed. Versus round 1's
 * single global sketch this buys the two properties a 10^10-URL crawl needs:
 *
 *  1. **Per-bucket geometry.** A shard saturating (fill ratio past the cap)
 *     is REBUILT alone, with doubled geometry, from its slice of the `seen`
 *     table — the sketch grows where load lands (Zipf hosts hash-spread, but
 *     growth is still uneven over time) instead of degrading to all-ones.
 *  2. **Shard-local construction.** Delta sketches are built one shard per
 *     partition (SketchAgg.buildShardedBloom): total bytes moved per
 *     generation = ONE copy of the geometry, not cores × full geometry.
 *
 * Merge is shard-wise bitwise OR and requires equal per-shard geometry — the
 * loop always builds deltas against the cumulative sketch's current geometry
 * (SketchAgg.geometryOf), so a rebuild at gen k simply changes what gen k+1's
 * delta is built against.
 *
 * The no-false-negative design rule (SURVEY.md §7.3) is unchanged: the sketch
 * only routes rows between "exact anti-join" and "skip the join"; a false
 * positive costs a probe, never a URL.
 */
final class ShardedBloom(val shards: Array[BloomSketch]) extends Serializable {

  @inline def shardOf(s: String): Int =
    Math.floorMod(BloomSketch.hash(s, ShardedBloom.RouteSalt), shards.length.toLong).toInt

  def mightContain(s: String): Boolean = shards(shardOf(s)).mightContain(s)

  def put(s: String): Unit = shards(shardOf(s)).put(s)

  /** Shard-wise OR; per-shard geometries must match. */
  def mergeInPlace(o: ShardedBloom): ShardedBloom = {
    require(o.shards.length == shards.length,
      s"shard count mismatch: ${shards.length} vs ${o.shards.length}")
    var i = 0
    while (i < shards.length) { shards(i).mergeInPlace(o.shards(i)); i += 1 }
    this
  }

  /** Indices of shards whose fill ratio exceeds `cap` — rebuild candidates. */
  def saturatedShards(cap: Double): Seq[Int] =
    shards.indices.filter(i => shards(i).fillRatio > cap)

  def serialize(): Array[Byte] = {
    val parts = shards.map(_.serialize())
    val bb = ByteBuffer.allocate(4 + parts.map(_.length + 4).sum)
    bb.putInt(shards.length)
    parts.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }
}

object ShardedBloom {
  /** Routing salt — distinct from every in-sketch hashing salt. */
  val RouteSalt: Long = 0x5ca4d0L

  def create(numShards: Int, expectedItemsPerShard: Long, fpp: Double): ShardedBloom =
    new ShardedBloom(Array.fill(numShards)(BloomSketch.create(expectedItemsPerShard, fpp)))

  /** One sketch wrapped as a single-shard partition (compat path). */
  def single(sketch: BloomSketch): ShardedBloom = new ShardedBloom(Array(sketch))

  def deserialize(bytes: Array[Byte]): ShardedBloom = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val shards = Array.fill(n) {
      val len = bb.getInt
      val p = new Array[Byte](len)
      bb.get(p)
      BloomSketch.deserialize(p)
    }
    new ShardedBloom(shards)
  }
}
