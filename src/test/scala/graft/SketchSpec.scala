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





  test("cuckoo: low FPR on disjoint probes") {
    val cf = CuckooFilter.create(5000)
    urls(5000, "c").foreach(cf.insert)
    val fp = urls(20000, "z").count(cf.contains)
    assert(fp < 20000 * 0.02, s"fp=$fp")
  }

  test("ShardStore: build/update/probe — no false negatives, both flavours") {
    val spark = SparkSuite.spark
    import spark.implicits._
    import graft.functions.ShardStore
    for (kind <- Seq("bloom", "cuckoo")) {
      val a = urls(3000, s"$kind-a")
      val shards = ShardStore.build(a.toDS(), numShards = 8, kind = kind,
        expectedItemsPerShard = 1024, fpp = 0.01).persist()
      val b = urls(3000, s"$kind-b")
      val updated = ShardStore.update(shards, b.toDS()).persist()
      val pairs = (a ++ b).map(u => (u, "h")).toDS()
      val probed = ShardStore.probe(pairs, updated).collect()
      assert(probed.length == a.size + b.size)
      assert(probed.forall(_._3), s"$kind: false negative after build+update")
      // FP rate on disjoint probes stays low (sketch actually prunes)
      val out = urls(6000, s"$kind-z").map(u => (u, "h")).toDS()
      val fp = ShardStore.probe(out, updated).collect().count(_._3)
      assert(fp < 6000 * 0.05, s"$kind: fp=$fp — sketch prunes nothing")
      // parent shards untouched (RDD immutability: updates copy) — the
      // persisted parent must NOT know b's urls
      val parentProbe = ShardStore.probe(b.map(u => (u, "h")).toDS(), shards)
        .collect().count(_._3)
      assert(parentProbe < b.size / 2,
        s"$kind: update mutated its persisted parent in place ($parentProbe/${b.size})")
      shards.unpersist(); updated.unpersist()
    }
  }

  test("ShardStore: cuckoo delete removes; bloom delete is identity (stale-bit FPs)") {
    val spark = SparkSuite.spark
    import spark.implicits._
    import graft.functions.ShardStore
    val in = urls(2000, "sd")
    val victims = in.take(200)
    for (kind <- Seq("bloom", "cuckoo")) {
      val shards = ShardStore.build(in.toDS(), 4, kind, 1024, 0.01).persist()
      val after = ShardStore.update(shards, victims.toDS(), delete = true).persist()
      val probed = ShardStore.probe(in.map(u => (u, "h")).toDS(), after)
        .collect().map(t => t._1 -> t._3).toMap
      // survivors: never a false negative, either flavour
      assert(in.drop(200).forall(probed(_)), s"$kind: survivor lost by delete")
      if (kind == "cuckoo") {
        val remaining = victims.count(probed(_))
        assert(remaining < 20, s"cuckoo: $remaining/200 victims still maybe-seen")
      } else {
        assert(victims.forall(probed(_)), "bloom delete must keep stale bits")
      }
      shards.unpersist(); after.unpersist()
    }
  }

  test("ShardStore: degraded shards rebuild alone with grown geometry, invariant intact") {
    val spark = SparkSuite.spark
    import spark.implicits._
    import graft.functions.{BloomSeenShard, CuckooSeenShard, ShardStore}
    val in = urls(4000, "rg")
    for (kind <- Seq("bloom", "cuckoo")) {
      // designed for 64/shard, fed 1000/shard ⇒ every shard degrades
      val shards = ShardStore.build(in.toDS(), 4, kind, 64, 0.01).persist()
      val degraded = shards.filter(_.needsRebuild(0.47)).count()
      assert(degraded > 0, s"$kind: expected degradation at 15x design load")
      // degraded shards stay CONSERVATIVE: a tainted cuckoo answers maybe
      // for everything; a saturated bloom approaches all-ones — neither may
      // lose an inserted url, ever
      val degradedProbe = ShardStore.probe(in.map(u => (u, "h")).toDS(), shards).collect()
      assert(degradedProbe.forall(_._3), s"$kind: degraded shard lost a url")
      val healthy = ShardStore.rebuildDegraded(shards, in.toDS(), 0.47, 0.01).persist()
      assert(healthy.filter(_.needsRebuild(0.47)).count() == 0,
        s"$kind: shards still degraded after count-sized rebuild")
      val probed = ShardStore.probe(in.map(u => (u, "h")).toDS(), healthy).collect()
      assert(probed.forall(_._3), s"$kind: rebuild leaked a false negative")
      // items stayed exact through the rebuild
      val items = healthy.map(_.items).collect().sum
      assert(items == in.size.toLong, s"$kind: items=$items != ${in.size}")
      healthy.collect().foreach {
        case b: BloomSeenShard  => assert(b.sketch.fillRatio <= 0.47)
        case c: CuckooSeenShard => assert(!c.tainted)
      }
      shards.unpersist(); healthy.unpersist()
    }
  }

  test("ShardStore: per-shard checkpoint files round-trip through write + load") {
    val spark = SparkSuite.spark
    import spark.implicits._
    import graft.functions.ShardStore
    val dir = java.nio.file.Files.createTempDirectory("graft-shardstore").toString
    val in = urls(2000, "wf")
    for (kind <- Seq("bloom", "cuckoo")) {
      val d = s"$dir/$kind"
      val shards = ShardStore.build(in.toDS(), 4, kind, 1024, 0.01)
      val meta = ShardStore.write(shards, d, rebuildCap = 0.47)
      assert(meta.map(_.id).sorted == Seq(0, 1, 2, 3))
      assert(meta.map(_.items).sum == in.size.toLong) // exact items metadata
      assert(meta.forall(!_.needsRebuild)) // healthy at design load
      val loaded = ShardStore.load(spark, d, 4).get
      val probed = ShardStore.probe(in.map(u => (u, "h")).toDS(), loaded).collect()
      assert(probed.forall(_._3), s"$kind: loaded shards lost urls")
      // incomplete dir (wrong shard count) refuses to load — the resume
      // path must fall back to rebuild-from-seen, not probe a partial sketch
      assert(ShardStore.load(spark, d, 8).isEmpty)
      // ...and so does a dir with MORE shards than requested: loading the
      // first 2 of 4 files would probe a mod-2-routed url against a
      // mod-4-routed shard — a false-negative factory, not a sketch
      assert(ShardStore.load(spark, d, 2).isEmpty)
      // flavour check (ADVICE round 3): resuming with the OTHER --sketch
      // over these files must refuse (⇒ rebuild-from-seen), not silently
      // load the wrong kind and turn cuckoo deletes into no-ops
      assert(ShardStore.load(spark, d, 4, Some(kind)).isDefined)
      val other = if (kind == "bloom") "cuckoo" else "bloom"
      assert(ShardStore.load(spark, d, 4, Some(other)).isEmpty,
        s"loaded $kind shard files under --sketch=$other")
    }
  }

  test("ShardStore: a healthy delta-insert + checkpoint costs exactly ONE job") {
    // the per-generation sketch maintenance contract CrawlLoop relies on:
    // update() is lazy, write() is the single action, and its metadata
    // carries the degradation flags — no second scan when all shards are
    // healthy. A regression here silently doubles the per-generation fixed
    // cost on a 10^5-generation crawl.
    val spark = SparkSuite.spark
    import spark.implicits._
    import graft.functions.ShardStore
    val dir = java.nio.file.Files.createTempDirectory("graft-onejob").toString
    val shards = ShardStore.build(urls(1000, "j1").toDS(), 4, "bloom", 2048, 0.01)
      .persist()
    shards.count() // materialise the parent outside the measured window
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val meta = ShardStore.write(
        ShardStore.update(shards, urls(1000, "j2").toDS()), dir,
        rebuildCap = 0.47)
      // settle the async listener bus (listenerBus is private[spark]):
      // poll until the job counter is stable for 300 ms
      var last = -1
      var stableSince = System.nanoTime()
      while (System.nanoTime() - stableSince < 300000000L) {
        val cur = jobs.get()
        if (cur != last) { last = cur; stableSince = System.nanoTime() }
        Thread.sleep(20)
      }
      assert(meta.forall(!_.needsRebuild))
      assert(jobs.get() == 1,
        s"healthy sketch maintenance ran ${jobs.get()} jobs; contract is 1")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      shards.unpersist()
    }
  }

  test("geometry ceilings fail loud instead of overflowing at serialize time") {
    // bloom: the old 2^37-BIT ceiling admitted shards whose serialize()
    // byte count overflowed Int and crashed the checkpoint write. The
    // require fires BEFORE allocation, so the intercepts are free.
    val eb = intercept[IllegalArgumentException](
      BloomSketch.create(3_000_000_000L, 0.01))
    assert(eb.getMessage.contains("sketchShards"))
    // every admissible geometry's serialized byte count fits an Int (and a
    // ByteBuffer) BY ARITHMETIC — asserted on the constant, not by actually
    // allocating a MaxWords sketch: the original form of this test created
    // two ~2.1 GiB arrays, and on a heap already carrying a whole session's
    // suites that triggered a minutes-long full-GC storm — long enough for
    // HeartbeatReceiver to expire the local executor (>120 s without a
    // heartbeat), whose re-registration DOESN'T EXIST in local mode
    // (CoarseGrainedScheduler endpoint is cluster-only) ⇒ every later
    // heartbeat fails ⇒ Spark kills the whole test JVM with exit 56.
    // exact layout: BloomSketch.serialize = 8 + words*8; BloomSeenShard
    // wraps it in 1+4+8 more — at MaxWords that is 2147483645, 2 to spare
    assert(BloomSketch.MaxWords.toLong * 8 + 8 + 13 <= Int.MaxValue.toLong)
    // a large-but-modest geometry allocates, serializes and deserializes
    val big = BloomSketch.create(100_000_000L, 0.01) // ~120 MB
    assert(big.bits.length <= BloomSketch.MaxWords)
    assert(BloomSketch.deserialize(big.serialize()).bits.length == big.bits.length)
    // cuckoo: Int truncation used to wrap >=3.6e9 items to an empty table
    val ec = intercept[IllegalArgumentException](CuckooFilter.create(4_000_000_000L))
    assert(ec.getMessage.contains("sketchShards"))
    val cf = CuckooFilter.create(50_000_000L) // ~120 MB of shorts
    assert(cf.numBuckets > 0 && cf.table.length.toLong == cf.numBuckets.toLong * 4)
  }
}
