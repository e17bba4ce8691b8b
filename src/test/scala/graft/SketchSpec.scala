package graft

import graft.functions.{BloomSketch, CuckooFilter}
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {

  private def urls(n: Int, tag: String): Seq[String] =
    (0 until n).map(i => s"http://h$i.example/$tag$i")

  test("bloom: NO false negatives (the load-bearing invariant, SURVEY §7.3)") {
    val sk = BloomSketch.create(10000, 0.01)
    val in = urls(10000, "in")
    in.foreach(sk.put)
    assert(in.forall(sk.mightContain))
  }

  test("bloom: FPR near target on disjoint probes") {
    val sk = BloomSketch.create(10000, 0.01)
    urls(10000, "in").foreach(sk.put)
    val fp = urls(20000, "out").count(sk.mightContain)
    assert(fp < 20000 * 0.03, s"fp=$fp — FPR way above target")
  }

  test("bloom: serialize round-trip and OR-merge") {
    val a = BloomSketch.create(1000, 0.01)
    val b = BloomSketch.create(1000, 0.01)
    urls(500, "a").foreach(a.put)
    urls(500, "b").foreach(b.put)
    val m = BloomSketch.deserialize(a.serialize()).mergeInPlace(b)
    assert(urls(500, "a").forall(m.mightContain))
    assert(urls(500, "b").forall(m.mightContain))
  }

  test("bloom: incompatible geometry rejected") {
    val a = BloomSketch.create(1000, 0.01)
    val b = BloomSketch.create(100000, 0.01)
    intercept[IllegalArgumentException](a.mergeInPlace(b))
  }

  test("cuckoo: insert/contains, no false negatives") {
    val cf = CuckooFilter.create(5000)
    val in = urls(5000, "c")
    val inserted = in.filter(cf.insert)
    assert(inserted.size == in.size, "cuckoo table overflowed below design load")
    assert(in.forall(cf.contains))
  }

  test("cuckoo: delete removes (delete∘insert = id)") {
    val cf = CuckooFilter.create(1000)
    val in = urls(1000, "d")
    in.foreach(cf.insert)
    val victim = in(37)
    assert(cf.contains(victim))
    assert(cf.delete(victim))
    // no-false-negative on the survivors
    assert(in.filterNot(_ == victim).forall(cf.contains))
  }

  test("cuckoo shard RDD: distributed build + probe + delete, never collected") {
    val spark = SparkSuite.spark
    import spark.implicits._
    import graft.functions.SketchAgg
    val in = urls(20000, "sc")
    val shards = SketchAgg.buildCuckooShards(in.toDS(), numShards = 16,
      expectedItemsPerShard = 2048)
    shards.persist()
    assert(shards.getNumPartitions == 16)
    // distributed probe: inserted urls all maybe=true (no false negatives)
    val probedIn = SketchAgg.probeCuckooShards(
      in.map(u => (u, "h")).toDS(), shards).collect()
    assert(probedIn.length == in.size)
    assert(probedIn.forall(_._3), "cuckoo probe lost an inserted url")
    // FPR on disjoint probes stays low
    val fp = SketchAgg.probeCuckooShards(
      urls(20000, "zz").map(u => (u, "h")).toDS(), shards).collect().count(_._3)
    assert(fp < 20000 * 0.02, s"fp=$fp")
    // distributed delete: victims gone, survivors intact (multiset semantics
    // ⇒ deleting once-inserted urls cannot evict another url's fingerprint)
    val victims = in.take(500)
    val after = SketchAgg.updateCuckooShards(shards, victims.toDS(), delete = true)
    after.persist()
    val probedAfter = SketchAgg.probeCuckooShards(
      in.map(u => (u, "h")).toDS(), shards = after).collect()
      .map { case (u, _, m) => u -> m }.toMap
    assert(victims.count(v => probedAfter.getOrElse(v, true)) < victims.size / 10,
      "deletion left most victims visible")
    assert(in.drop(500).forall(u => probedAfter.getOrElse(u, false)),
      "deletion created a false negative on a survivor")
    // parent shards untouched (RDD immutability: updates copy)
    val reprobe = SketchAgg.probeCuckooShards(
      victims.map(u => (u, "h")).toDS(), shards).collect()
    assert(reprobe.forall(_._3), "updateCuckooShards mutated its parent in place")
    shards.unpersist(); after.unpersist()
  }

  test("cuckoo taint + rebuild: overflow answers maybe-all, rebuild grows and recovers") {
    val spark = SparkSuite.spark
    import spark.implicits._
    import graft.functions.SketchAgg
    val in = urls(4000, "tc")
    // 4000 urls into 4 shards of ~128 slots each ⇒ every shard overflows
    val shards = SketchAgg.buildCuckooShards(in.toDS(), numShards = 4,
      expectedItemsPerShard = 64)
    shards.persist()
    assert(shards.filter(_.tainted).count() == 4, "expected all shards tainted")
    // tainted ⇒ conservative: EVERYTHING is maybe (no pruning, no loss)
    val probed = SketchAgg.probeCuckooShards(
      urls(1000, "zz").map(u => (u, "h")).toDS(), shards).collect()
    assert(probed.forall(_._3), "tainted shard must answer maybe")
    // rebuild from the full set with grown capacity until healthy
    var cur = shards
    var rounds = 0
    while (cur.filter(_.tainted).count() > 0 && rounds < 8) {
      val next = SketchAgg.rebuildTaintedCuckoo(cur, in.toDS())
      next.persist(); next.count(); cur.unpersist()
      cur = next
      rounds += 1
    }
    assert(cur.filter(_.tainted).count() == 0, s"still tainted after $rounds rebuilds")
    // recovered: no false negatives, real pruning again
    val probedIn = SketchAgg.probeCuckooShards(
      in.map(u => (u, "h")).toDS(), cur).collect()
    assert(probedIn.forall(_._3))
    val fp = SketchAgg.probeCuckooShards(
      urls(4000, "zz").map(u => (u, "h")).toDS(), cur).collect().count(_._3)
    assert(fp < 4000 * 0.02, s"fp=$fp after rebuild")
    cur.unpersist()
  }

  test("sharded bloom: distributed build, no false negatives, geometry-true deltas merge") {
    val spark = SparkSuite.spark
    import spark.implicits._
    import graft.functions.{ShardedBloom, SketchAgg}
    val base = ShardedBloom.create(8, 1024, 0.01)
    val a = urls(4000, "sa")
    val built = SketchAgg.buildShardedBloom(a.toDS(), SketchAgg.geometryOf(base))
    assert(a.forall(built.mightContain))
    val b = urls(4000, "sb")
    val delta = SketchAgg.buildShardedBloom(b.toDS(), SketchAgg.geometryOf(built))
    val merged = built.mergeInPlace(delta)
    assert((a ++ b).forall(merged.mightContain))
    val rt = ShardedBloom.deserialize(merged.serialize())
    assert((a ++ b).forall(rt.mightContain))
  }

  test("sharded bloom: saturating shard rebuilds alone with doubled geometry") {
    val spark = SparkSuite.spark
    import spark.implicits._
    import graft.functions.{ShardedBloom, SketchAgg}
    // tiny per-shard geometry so 8k urls saturate it far past the fill cap
    val sb = ShardedBloom.create(4, 64, 0.01)
    val in = urls(8000, "ov")
    in.foreach(sb.put)
    val saturated = sb.saturatedShards(0.47)
    assert(saturated.nonEmpty, "expected saturation at 2000x design load")
    assert(in.forall(sb.mightContain)) // degraded (≈all-ones) but never lossy
    val before = saturated.map(i => sb.shards(i).sizeBits).toVector
    saturated.foreach { i =>
      sb.shards(i) = SketchAgg.rebuildShard(in.toDS(), sb, i, fpp = 0.01)
    }
    saturated.zipWithIndex.foreach { case (s, j) =>
      assert(sb.shards(s).sizeBits >= before(j) * 2, "rebuild did not grow geometry")
    }
    // invariant survives the rebuild: still no false negatives
    assert(in.forall(sb.mightContain))
    // and the rebuilt shards are back under the designed load
    saturated.foreach(i => assert(sb.shards(i).fillRatio < 0.47,
      s"shard $i still saturated after count-sized rebuild"))
  }

  test("cuckoo: low FPR on disjoint probes") {
    val cf = CuckooFilter.create(5000)
    urls(5000, "c").foreach(cf.insert)
    val fp = urls(20000, "z").count(cf.contains)
    assert(fp < 20000 * 0.02, s"fp=$fp")
  }
}
