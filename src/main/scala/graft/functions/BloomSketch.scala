package graft.functions

import java.nio.ByteBuffer

/**
 * Partitioned bloom-filter sketch for the URL-seen set (north_rule;
 * SURVEY.md §2 J1). Hand-rolled (encoder-friendly, mergeable by bitwise OR)
 * rather than `df.stat.bloomFilter` so that per-generation delta sketches
 * can be union-merged incrementally without rescanning `seen`.
 *
 * DESIGN RULE (SURVEY.md §7.3): the sketch only decides which candidate rows
 * are "maybe seen" (⇒ exact anti-join) vs "definitely new" (⇒ skip the
 * join). A false positive costs one extra join probe; it can never lose a
 * URL. No false negatives — property-tested.
 */
final class BloomSketch(val bits: Array[Long], val numHashes: Int) extends Serializable {
  private def m: Long = bits.length.toLong * 64L

  /** Geometry in bits (for sizing/diagnostics). */
  def sizeBits: Long = m

  /** Number of set bits — drives the fill-ratio saturation estimate. */
  def setBitCount: Long = {
    var i = 0; var n = 0L
    while (i < bits.length) { n += java.lang.Long.bitCount(bits(i)).toLong; i += 1 }
    n
  }

  /** Fraction of bits set. ~0.5 is the designed load; beyond it the FPR
   * degrades quickly (at 1.0 the sketch prunes nothing). */
  def fillRatio: Double = setBitCount.toDouble / m

  // 128-bit-ish double hashing from two independent 64-bit string hashes.
  // Positions stay Long end-to-end: geometries past 2^31 bits (expectedItems
  // ≳ 2.2e8 at fpp 0.01) are legal up to the JVM array ceiling (2^37 bits).
  @inline private def pos(h1: Long, h2: Long, i: Int): Long = {
    val combined = h1 + i.toLong * h2
    Math.floorMod(combined, m)
  }

  def put(s: String): Unit = {
    val h1 = BloomSketch.hash(s, 0x9747b28cL)
    val h2 = BloomSketch.hash(s, 0x5bd1e995L)
    var i = 0
    while (i < numHashes) {
      val p = pos(h1, h2, i)
      bits((p >>> 6).toInt) |= (1L << (p & 63L).toInt)
      i += 1
    }
  }

  def mightContain(s: String): Boolean = {
    val h1 = BloomSketch.hash(s, 0x9747b28cL)
    val h2 = BloomSketch.hash(s, 0x5bd1e995L)
    var i = 0
    while (i < numHashes) {
      val p = pos(h1, h2, i)
      if ((bits((p >>> 6).toInt) & (1L << (p & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitwise-OR union; both sketches must share geometry. */
  def mergeInPlace(o: BloomSketch): BloomSketch = {
    require(o.bits.length == bits.length && o.numHashes == numHashes,
      s"incompatible sketch geometry: ${bits.length}/$numHashes vs ${o.bits.length}/${o.numHashes}")
    var i = 0
    while (i < bits.length) { bits(i) |= o.bits(i); i += 1 }
    this
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + bits.length * 8)
    bb.putInt(numHashes).putInt(bits.length)
    bits.foreach(bb.putLong)
    bb.array()
  }
}

object BloomSketch {

  /** xxhash-style 64-bit string hash with a seed (pure, stable across JVMs). */
  def hash(s: String, seed: Long): Long = {
    var h = seed ^ (s.length.toLong * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      h ^= h >>> 29
      i += 1
    }
    h ^= h >>> 32
    h * 0xff51afd7ed558ccdL
  }

  /** Geometry for n expected items at target false-positive rate. */
  /** Largest word count a shard can round-trip through one byte[] —
   * serialize() allocates 8 + words*8 bytes, and a shard must fit a single
   * ShardStore file / broadcast buffer. (The old 2^37-BIT ceiling admitted
   * geometries whose serialize() overflowed Int and crashed at write time.) */
  val MaxWords: Int = (Int.MaxValue - 16) / 8

  def create(expectedItems: Long, fpp: Double): BloomSketch = {
    val n = math.max(1L, expectedItems)
    val mBits = math.max(64L, math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val wordsL = (mBits + 63) / 64
    require(wordsL <= MaxWords,
      s"bloom geometry $mBits bits ($wordsL words) serializes past the 2 GiB " +
      "single-shard ceiling; raise sketchShards instead of growing one shard")
    val k = math.max(1, math.round(mBits.toDouble / n * math.log(2)).toInt)
    new BloomSketch(new Array[Long](wordsL.toInt), k)
  }

  /** Exact geometry (for building delta sketches OR-mergeable with an
   * existing one — merge requires identical (words, k)). */
  def createWithGeometry(words: Int, k: Int): BloomSketch =
    new BloomSketch(new Array[Long](words), k)

  def deserialize(bytes: Array[Byte]): BloomSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt; val words = bb.getInt
    val bits = new Array[Long](words)
    var i = 0
    while (i < words) { bits(i) = bb.getLong; i += 1 }
    new BloomSketch(bits, k)
  }
}

/**
 * Cuckoo filter variant — supports DELETION (north_rule: "cuckoo-filter
 * variant for deletions"), e.g. retiring URLs whose politeness lease expired
 * or whose host was blacklisted after the fact. 4-way buckets, 16-bit
 * fingerprints, standard partial-key cuckoo hashing (Fan et al., CoNEXT'14 —
 * public algorithm).
 */
final class CuckooFilter(val table: Array[Short], val numBuckets: Int) extends Serializable {
  import CuckooFilter._

  @inline private def slot(b: Int, s: Int): Int = b * BucketSize + s
  @inline private def fpOf(s: String): Short = {
    val f = (BloomSketch.hash(s, 0xc3a5c85c97cb3127L) & 0xffffL).toInt
    (if (f == 0) 1 else f).toShort // 0 = empty marker
  }
  @inline private def bucketOf(s: String): Int =
    Math.floorMod(BloomSketch.hash(s, 0xb492b66fbe98f273L), numBuckets.toLong).toInt
  @inline private def altBucket(b: Int, fp: Short): Int =
    Math.floorMod(b.toLong ^ BloomSketch.hash(fp.toString, 0x9ae16a3b2f90404fL), numBuckets.toLong).toInt

  private def tryInsertAt(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < BucketSize) {
      if (table(slot(b, s)) == 0) { table(slot(b, s)) = fp; return true }
      s += 1
    }
    false
  }

  def insert(x: String): Boolean = {
    val fp0 = fpOf(x)
    val b1 = bucketOf(x)
    val b2 = altBucket(b1, fp0)
    if (tryInsertAt(b1, fp0) || tryInsertAt(b2, fp0)) return true
    // kick loop
    var b = if ((BloomSketch.hash(x, 7L) & 1L) == 0L) b1 else b2
    var fp = fp0
    var kicks = 0
    while (kicks < MaxKicks) {
      val victim = Math.floorMod(BloomSketch.hash(s"$kicks:$fp:$b", 11L), BucketSize.toLong).toInt
      val tmp = table(slot(b, victim))
      table(slot(b, victim)) = fp
      fp = tmp
      b = altBucket(b, fp)
      if (tryInsertAt(b, fp)) return true
      kicks += 1
    }
    false // table full — caller falls back to exact path
  }

  def contains(x: String): Boolean = {
    val fp = fpOf(x)
    val b1 = bucketOf(x)
    val b2 = altBucket(b1, fp)
    var s = 0
    while (s < BucketSize) {
      if (table(slot(b1, s)) == fp || table(slot(b2, s)) == fp) return true
      s += 1
    }
    false
  }

  /** Deep copy — RDD lineage safety: zipPartitions updates must not mutate
   * a persisted parent partition's filter in place. */
  def copyOf: CuckooFilter = new CuckooFilter(table.clone(), numBuckets)

  /** Remove one copy of x's fingerprint; true if found. delete∘insert = id. */
  def delete(x: String): Boolean = {
    val fp = fpOf(x)
    val b1 = bucketOf(x)
    val b2 = altBucket(b1, fp)
    var s = 0
    while (s < BucketSize) {
      if (table(slot(b1, s)) == fp) { table(slot(b1, s)) = 0; return true }
      if (table(slot(b2, s)) == fp) { table(slot(b2, s)) = 0; return true }
      s += 1
    }
    false
  }
}

object CuckooFilter {
  val BucketSize = 4
  val MaxKicks = 500

  def create(expectedItems: Long): CuckooFilter = {
    // ~84% load ceiling for 4-way buckets; size up to the next power of two
    // with slack. LONG math throughout: the old Int truncation wrapped at
    // ≥3.6e9 expected items to a negative bucket count and an empty table.
    val want = math.max(4L, (expectedItems / (BucketSize * 0.84)).toLong)
    // table = buckets*4 Shorts must serialize into one byte[] (18 + len*2)
    require(want < (1L << 28),
      s"cuckoo geometry for $expectedItems expected items exceeds the " +
      "single-shard table ceiling; raise sketchShards")
    val buckets = (java.lang.Long.highestOneBit(want) * 2).toInt
    new CuckooFilter(new Array[Short](buckets * BucketSize), buckets)
  }
}
