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

  test("sharded cuckoo: distributed build, no false negatives, delete works") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val in = urls(20000, "sc")
    val sc = graft.functions.SketchAgg.buildShardedCuckoo(
      in.toDS(), expectedItems = 20000, shards = 16)
    assert(in.forall(sc.contains))
    val victim = in(123)
    assert(sc.delete(victim))
    assert(in.filterNot(_ == victim).forall(sc.contains))
    val fp = urls(20000, "zz").count(sc.contains)
    assert(fp < 20000 * 0.02, s"fp=$fp")
  }

  test("cuckoo: low FPR on disjoint probes") {
    val cf = CuckooFilter.create(5000)
    urls(5000, "c").foreach(cf.insert)
    val fp = urls(20000, "z").count(cf.contains)
    assert(fp < 20000 * 0.02, s"fp=$fp")
  }
}
