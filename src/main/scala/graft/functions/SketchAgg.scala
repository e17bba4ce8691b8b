package graft.functions

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Distributed sketch construction and maintenance.
 *
 * Bloom: `buildShardedBloom` routes URLs to `numShards` partitions and builds
 * each shard entirely inside its partition — the driver collects one shard's
 * bytes per partition (total = one copy of the geometry). `BloomAgg` remains
 * the typed `Aggregator` surface for SQL use.
 *
 * Cuckoo (the DELETION-capable variant, north_rule): shards live as a
 * persisted `RDD[CuckooShard]` hash-partitioned by shard id — they are never
 * collected to the driver. Inserts/deletes route the url batch with the SAME
 * partitioner and zipPartitions into fresh copies (RDD immutability); probes
 * route the candidate urls the same way. A shard whose kick loop ever
 * overflows is marked TAINTED and answers "maybe" for everything — inserts
 * may be lost on overflow, and the no-false-negative rule (a sketch miss
 * skips the exact anti-join) must survive that. Deletion itself cannot create
 * false negatives: inserts keep duplicate fingerprints (multiset semantics,
 * Fan et al. CoNEXT'14), so deleting a once-inserted URL removes exactly one
 * copy and never another URL's last copy.
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

  /** Partition-parallel single-geometry bloom build with log-depth merge
   * (kept for the single-sketch surfaces; the crawl loop uses the sharded
   * build below). Every partial sketch carries the FULL geometry, so build
   * partitions are capped to bound the sketch-sized transfers. */
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

  /** Sharded bloom build: urls hash-route to their shard's partition, each
   * shard is built whole inside one task with the geometry GIVEN (so the
   * result OR-merges with an existing cumulative sketch even after per-shard
   * rebuilds changed individual geometries). */
  def buildShardedBloom(urls: Dataset[String], geometry: Array[(Int, Int)]): ShardedBloom = {
    val numShards = geometry.length
    val geoBc = urls.sparkSession.sparkContext.broadcast(geometry)
    val built = urls.rdd
      .keyBy(u => Math.floorMod(BloomSketch.hash(u, ShardedBloom.RouteSalt), numShards.toLong).toInt)
      .partitionBy(new HashPartitioner(numShards))
      .mapPartitionsWithIndex { (pid, it) =>
        val (words, k) = geoBc.value(pid)
        val sk = BloomSketch.createWithGeometry(words, k)
        var any = false
        it.foreach { case (_, u) => if (u != null) { sk.put(u); any = true } }
        if (any) Iterator.single(pid -> sk.serialize()) else Iterator.empty
      }
      .collect().toMap
    new ShardedBloom(Array.tabulate(numShards) { i =>
      built.get(i).map(BloomSketch.deserialize).getOrElse {
        val (words, k) = geometry(i)
        BloomSketch.createWithGeometry(words, k)
      }
    })
  }

  /** Current per-shard geometry of a sharded sketch (words, k). */
  def geometryOf(sb: ShardedBloom): Array[(Int, Int)] =
    sb.shards.map(s => (s.bits.length, s.numHashes))

  /** Rebuild ONE saturated shard from its slice of the seen set — the
   * per-bucket growth path. The new geometry is sized for 2× the slice's
   * ACTUAL row count (headroom for the next generations), floored at double
   * the old geometry, so one rebuild absorbs any overload instead of
   * re-saturating next generation. Distributed: partial sketches of the new
   * geometry, tree-merged. */
  def rebuildShard(seenUrls: Dataset[String], sb: ShardedBloom, shard: Int,
      fpp: Double = 0.01): BloomSketch = {
    val n = sb.shards.length
    val mine = seenUrls.filter(u =>
      Math.floorMod(BloomSketch.hash(u, ShardedBloom.RouteSalt), n.toLong).toInt == shard)
      .persist()
    try {
      val cnt = mine.count()
      val sized = BloomSketch.create(math.max(64L, cnt * 2), fpp)
      val doubled = sb.shards(shard).bits.length * 2
      val words = math.max(sized.bits.length, doubled)
      val k = sized.numHashes
      val rdd = mine.rdd.coalesce(8).mapPartitions { it =>
        val sk = BloomSketch.createWithGeometry(words, k)
        var any = false
        it.foreach(u => if (u != null) { sk.put(u); any = true })
        if (any) Iterator.single(sk) else Iterator.empty
      }
      if (rdd.isEmpty()) BloomSketch.createWithGeometry(words, k)
      else rdd.treeReduce((a, b) => a.mergeInPlace(b), depth = 2)
    } finally mine.unpersist()
  }

  // --- cuckoo shards as a persisted, never-collected RDD -----------------------

  /** One cuckoo shard; `tainted` = an insert overflowed its kick budget, so
   * membership answers are no longer complete and the shard must answer
   * "maybe" until rebuilt with more capacity. */
  final case class CuckooShard(id: Int, filter: CuckooFilter, tainted: Boolean)

  @inline private def routeOf(u: String, n: Int): Int =
    Math.floorMod(BloomSketch.hash(u, ShardedBloom.RouteSalt), n.toLong).toInt

  /** Build `numShards` cuckoo shards, each wholly inside its partition. */
  def buildCuckooShards(urls: Dataset[String], numShards: Int,
      expectedItemsPerShard: Long): RDD[CuckooShard] = {
    val routed = urls.rdd
      .keyBy(routeOf(_, numShards))
      .partitionBy(new HashPartitioner(numShards))
    routed.mapPartitionsWithIndex({ (pid, it) =>
      val cf = CuckooFilter.create(expectedItemsPerShard)
      var tainted = false
      it.foreach { case (_, u) => if (u != null && !cf.insert(u)) tainted = true }
      Iterator.single(CuckooShard(pid, cf, tainted))
    }, preservesPartitioning = true)
  }

  /** Insert or delete a url batch — routes with the shards' partitioner and
   * zipPartitions into COPIES (persisted parents stay immutable). Returns a
   * new shard RDD; caller persists it and unpersists the old one. */
  def updateCuckooShards(shards: RDD[CuckooShard], urls: Dataset[String],
      delete: Boolean): RDD[CuckooShard] = {
    val n = shards.getNumPartitions
    val routed = urls.rdd
      .keyBy(routeOf(_, n))
      .partitionBy(new HashPartitioner(n))
    shards.zipPartitions(routed, preservesPartitioning = true) { (sit, uit) =>
      sit.map { s =>
        val nf = s.filter.copyOf
        var tainted = s.tainted
        uit.foreach { case (_, u) =>
          if (delete) nf.delete(u)
          else if (!nf.insert(u)) tainted = true
        }
        CuckooShard(s.id, nf, tainted)
      }
    }
  }

  /** Rebuild TAINTED shards (insert overflow) from the full seen set with
   * grown capacity — the cuckoo analogue of the bloom per-bucket rebuild:
   * a tainted shard answers "maybe" for everything (correct, prunes
   * nothing), so the loop grows it instead of letting the prefilter decay.
   * Only the tainted ids' urls are routed; healthy shards pass through.
   * The tiny (id, tainted) metadata is the only thing collected. */
  def rebuildTaintedCuckoo(shards: RDD[CuckooShard], seenUrls: Dataset[String],
      growFactor: Int = 2): RDD[CuckooShard] = {
    val n = shards.getNumPartitions
    val taintedIds = shards.filter(_.tainted).map(_.id).collect().toSet
    if (taintedIds.isEmpty) shards
    else {
      val routed = seenUrls.rdd
        .keyBy(routeOf(_, n))
        .filter { case (sid, _) => taintedIds(sid) }
        .partitionBy(new HashPartitioner(n))
      shards.zipPartitions(routed, preservesPartitioning = true) { (sit, uit) =>
        sit.map { s =>
          if (!s.tainted) s
          else {
            // grown design capacity ≈ slots × load-factor × growFactor
            val cap = (s.filter.table.length.toLong * 0.84 * growFactor).toLong
            val nf = CuckooFilter.create(math.max(64L, cap))
            var tainted = false
            uit.foreach { case (_, u) => if (u != null && !nf.insert(u)) tainted = true }
            CuckooShard(s.id, nf, tainted)
          }
        }
      }
    }
  }

  /** Tag (url, host) rows with `_maybe` by routing them to their shard —
   * the distributed probe: no filter ever leaves its partition. Tainted or
   * missing shards answer maybe=true (conservative: costs probes, never
   * loses a URL). */
  def probeCuckooShards(pairs: Dataset[(String, String)],
      shards: RDD[CuckooShard]): RDD[(String, String, Boolean)] = {
    val n = shards.getNumPartitions
    val routed = pairs.rdd
      .keyBy { case (u, _) => routeOf(u, n) }
      .partitionBy(new HashPartitioner(n))
    shards.zipPartitions(routed) { (sit, uit) =>
      val shard = if (sit.hasNext) Some(sit.next()) else None
      uit.map { case (_, (u, h)) =>
        val maybe = shard match {
          case Some(s) => s.tainted || s.filter.contains(u)
          case None => true
        }
        (u, h, maybe)
      }
    }
  }
}

/**
 * Driver-side sharded cuckoo (kept for small/bench scale and property tests;
 * the crawl loop uses the RDD form above, which never collects a shard).
 */
final class ShardedCuckoo(val shards: Array[CuckooFilter]) extends Serializable {
  @inline private def shardOf(s: String): Int =
    Math.floorMod(BloomSketch.hash(s, ShardedBloom.RouteSalt), shards.length.toLong).toInt
  def contains(s: String): Boolean = shards(shardOf(s)).contains(s)
  def insert(s: String): Boolean = shards(shardOf(s)).insert(s)
  def delete(s: String): Boolean = shards(shardOf(s)).delete(s)
}
