package graft.plans

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/**
 * Snapshot-directory table layer (SURVEY.md §7.5). The sandbox ships no
 * Iceberg/Delta jar, so ACID generation commits are emulated with an atomic
 * per-generation manifest: data is written to `<table>/gen=K/`, then
 * `_commits/gen_K.json` is created via write-temp + atomic rename. A
 * generation EXISTS iff its manifest exists; readers only ever list
 * manifests, so a crashed half-written generation is invisible and resume
 * is safe from any checkpoint (north_rule resumability).
 *
 * All paths go through the Hadoop FileSystem API resolved from `root` — the
 * same treatment the sketch shard store got in round 3 (ShardStore scaladoc):
 * a local dir in the sandbox, HDFS/S3/any Hadoop-addressable store on a real
 * cluster. The commit fence, delta listing, compaction markers and sketch GC
 * are therefore cluster-addressable; nothing in the state layer touches
 * `java.nio`. Commit publishes use `FileContext.rename(OVERWRITE)` — atomic
 * on HDFS and local fs; object stores without atomic rename should front the
 * commit dir with HDFS or swap in the Iceberg seam below.
 *
 * The `seen` table is APPEND-ONLY per-generation deltas — never rewritten
 * in the hot loop (at 10^10 URLs a rewrite per generation would be the
 * scale killer); the anti-join reads the union of segments, each disjoint
 * by construction (discovered rows passed the anti-join against all prior
 * segments). Maintenance is size-tiered incremental merging (see the
 * compaction section below), never a periodic full rewrite.
 *
 * Swap-in for a real cluster: Iceberg `MERGE INTO seen` + snapshot commit —
 * same seam, one class.
 *
 * SINGLE WRITER REQUIRED: one TableIO instance must be the only writer of
 * its workDir for its lifetime (the commit fence is a manifest-rename, not a
 * lock — two concurrent writers would both think they own the fence). The
 * `_commits` listing is cached under that assumption; if an external process
 * legitimately mutated the directory (e.g. manual GC between runs), call
 * `refreshCommits()` — and `readManifest` self-heals a stale cache by
 * re-listing once when a cached manifest turns out to be missing.
 */
final class TableIO(val root: String,
    conf: Configuration = TableIO.defaultConf()) {
  private val rootPath = new Path(root)
  private val fs: FileSystem = rootPath.getFileSystem(conf)
  private val fc: FileContext =
    FileContext.getFileContext(fs.makeQualified(rootPath).toUri, conf)
  private def p(parts: String*): Path = parts.foldLeft(rootPath)(new Path(_, _))
  fs.mkdirs(p("_commits"))

  /** Materialized directory listing (names only; empty if missing). */
  private def listNames(dir: Path): Seq[String] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).map(_.getPath.getName).toVector

  // The `_commits` listing is consulted several times per generation
  // (anti-join delta dirs, compaction floor, resume probe); at 10^5
  // generations each listing is an O(gens) metadata call — on HDFS/S3 a
  // real per-generation cost. This instance is the SINGLE WRITER of its
  // workDir (the commit-fence design assumes that), so the listing is
  // cached and appended to on publish instead of re-listed.
  private var commitNamesCache: Option[Vector[String]] = None
  private def commitNames(): Vector[String] = commitNamesCache match {
    case Some(v) => v
    case None =>
      val v = listNames(p("_commits")).toVector
      commitNamesCache = Some(v)
      v
  }

  /** Atomic write-temp + overwriting-rename publish of a small JSON file. */
  private def publishJson(tmp: Path, dst: Path, payload: String): Unit = {
    val out = fs.create(tmp, true)
    try out.write(payload.getBytes(UTF_8)) finally out.close()
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(dst),
      Options.Rename.OVERWRITE)
  }

  def genDir(table: String, gen: Int): String = p(table, f"gen=$gen%05d").toString

  /** True iff `dir` (a path this TableIO produced) exists as a directory —
   * the loop's probe for optional per-generation tables (host_next, archive,
   * metrics), FS-API-addressed like everything else here. */
  def dirExists(dir: String): Boolean = fs.isDirectory(new Path(dir))

  /** Recursively delete a data dir (e.g. a retraction's spent sketch
   * checkpoint) — no-op when absent. */
  def deleteDir(dir: String): Unit = fs.delete(new Path(dir), true)

  /** Driver-side read of one small file (manifests, sketch shard inspection). */
  def readBytes(file: String): Array[Byte] = {
    val path = new Path(file)
    val st = fs.getFileStatus(path)
    val bytes = new Array[Byte](st.getLen.toInt)
    val in = fs.open(path)
    try in.readFully(0L, bytes) finally in.close()
    bytes
  }

  def fileExists(file: String): Boolean = fs.exists(new Path(file))

  /** Total bytes of a directory's COMMITTED files (−1 if missing) — one FS
   * listing, no data read. Sizes the hybrid sketch-probe decision, so
   * `_tmp_*` leftovers from killed task attempts must not count: an
   * orphaned attempt file would silently push the sketch past the
   * broadcast threshold and pick the slower routed regime. */
  def dirBytes(dir: String): Long = {
    val path = new Path(dir)
    if (!fs.isDirectory(path)) -1L
    else fs.listStatus(path)
      .filterNot(_.getPath.getName.startsWith("_tmp_"))
      .map(_.getLen).sum
  }

  /** `[{"file":…,"bytes":…}]` of a generation dir's parquet parts — lineage
   * straight from directory metadata, no data scan. */
  def lineageJson(table: String, gen: Int): String = {
    val dir = new Path(genDir(table, gen))
    if (!fs.isDirectory(dir)) "[]"
    else fs.listStatus(dir).iterator
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => s"""{"file":"${st.getPath.getName}","bytes":${st.getLen}}""")
      .mkString("[", ",", "]")
  }

  private def manifest(gen: Int): Path = p("_commits", f"gen_$gen%05d.json")

  /** Atomically publish generation `gen` with its lineage/metrics payload. */
  def commit(gen: Int, payloadJson: String): Unit = {
    publishJson(p("_commits", f"_tmp_gen_$gen%05d.json"), manifest(gen),
      payloadJson)
    val name = f"gen_$gen%05d.json"
    commitNamesCache = commitNamesCache.map(v => if (v.contains(name)) v else v :+ name)
  }

  def committedGens(): Seq[Int] =
    commitNames()
      .collect { case s if s.startsWith("gen_") && s.endsWith(".json") =>
        s.stripPrefix("gen_").stripSuffix(".json").toInt }
      .sorted

  def lastCommittedGen(): Option[Int] = committedGens().lastOption

  /** Drop the cached `_commits` listing (next read re-lists). Only needed
   * after an EXTERNAL mutation of the workDir between runs — see the
   * single-writer note in the class doc. */
  def refreshCommits(): Unit = { commitNamesCache = None }

  def readManifest(gen: Int): String = {
    // self-heal a stale cache: a cached manifest that no longer exists means
    // something else mutated _commits (single-writer assumption violated or
    // manual cleanup) — re-list once so committedGens() stops advertising it
    if (!fs.exists(manifest(gen))) refreshCommits()
    new String(readBytes(manifest(gen).toString), UTF_8)
  }

  // --- compaction (log-structured maintenance of append-only tables) --------
  // Tiered MERGE SEGMENTS, not a periodic full rewrite: a merge covers a
  // contiguous generation range [lo, hi] and replaces those segments for
  // readers; the loop's size-tiered policy (CrawlLoop.compactTiered) folds
  // recent deltas and absorbs an adjacent predecessor only while it is no
  // larger than what was just folded — so one compaction's I/O is
  // proportional to the RECENTLY-DISCOVERED rows (amortized O(N log N) over
  // a crawl), never a periodic O(total-seen) job (at 10^10 URLs the old
  // full rewrite was the scale killer). Crash-safe like commits: data
  // first, atomic marker second; covered segments are then GC'd
  // (`gcCovered`) so storage tracks the live set instead of growing
  // monotonically. A crash between marker and GC leaves covered leftovers
  // that readers ignore (outermost-cover selection) and the next sweep
  // deletes.

  def mergeDir(table: String, lo: Int, hi: Int): String =
    p(table, f"merge_$lo%05d-$hi%05d").toString

  /** Staging dir for a SAME-RANGE merge rewrite (the retraction path): the
   * final [0, hi] dir can be an INPUT of the rewrite when a prior
   * compaction already collapsed the whole cover, and Spark (rightly)
   * refuses to overwrite a path it is reading from. Writers stage here,
   * then `promoteStagedMerge` swaps the data into place. */
  def mergeStageDir(table: String, lo: Int, hi: Int): String =
    mergeDir(table, lo, hi) + ".stage"

  /** Swap fully-written staged merge data into the final dir (delete the
   * old final dir if present, rename the stage). Call only after every
   * reader of the OLD final dir has finished — including any lazily
   * recomputable lineage. A crash between the delete and the rename is
   * healed on the next read: `deltaDirs` promotes a complete stage whose
   * final dir is missing (the stage is only ever deleted-into-place, so a
   * present stage with an absent final is always fully written). */
  def promoteStagedMerge(table: String, lo: Int, hi: Int): Unit = {
    val fin = new Path(mergeDir(table, lo, hi))
    val st = new Path(mergeStageDir(table, lo, hi))
    require(fs.isDirectory(st), s"no staged merge data at $st")
    if (fs.isDirectory(fin)) fs.delete(fin, true)
    // FileSystem.rename signals failure by RETURN VALUE — a silent false
    // here would leave the table with a marker and no data dir
    if (!fs.rename(st, fin)) sys.error(s"staged-merge rename failed: $st -> $fin")
  }

  private def mergeMarker(table: String, lo: Int, hi: Int): Path =
    p("_commits", f"merge_${table}_$lo%05d_$hi%05d.json")

  /** Atomically publish a merge of `table` covering delta gens [lo, hi]
   * (the merged data must already be fully written to `mergeDir`). */
  def commitMerge(table: String, lo: Int, hi: Int, rows: Long): Unit = {
    publishJson(p("_commits", f"_tmp_merge_${table}_$lo%05d_$hi%05d.json"),
      mergeMarker(table, lo, hi),
      s"""{"table":"$table","lo_gen":$lo,"hi_gen":$hi,"rows":$rows}""")
    val name = f"merge_${table}_$lo%05d_$hi%05d.json"
    commitNamesCache = commitNamesCache.map(v => if (v.contains(name)) v else v :+ name)
  }

  /** All committed merge segments of `table`, outermost-first within a lo
   * (sorted by lo asc, span desc). */
  def committedMerges(table: String): Seq[(Int, Int)] =
    commitNames()
      .collect { case s if s.startsWith(s"merge_${table}_") && s.endsWith(".json") =>
        val parts = s.stripPrefix(s"merge_${table}_").stripSuffix(".json").split('_')
        (parts(0).toInt, parts(1).toInt)
      }
      .sortBy(m => (m._1, -m._2))

  /** The reader's view of `table` at `upToGen`: the outermost non-overlapping
   * merge segments (contained ones are pre-GC leftovers) plus the committed
   * delta gens no merge covers. Merges never partially overlap by
   * construction (a merge always absorbs whole adjacent segments). */
  def cover(table: String, upToGen: Int): (Seq[(Int, Int)], Seq[Int]) = {
    var maxHi = -1
    val outer = committedMerges(table).filter(_._2 <= upToGen).flatMap {
      case (lo, hi) =>
        if (hi <= maxHi) None // contained in an already-selected segment
        else { maxHi = hi; Some((lo, hi)) }
    }
    val loose = committedGens().filter(g =>
      g <= upToGen && !outer.exists(m => g >= m._1 && g <= m._2))
    (outer, loose)
  }

  /** All committed data dirs of an append-only table (e.g. `seen`): the
   * outermost merge segments plus the deltas they don't cover. */
  def deltaDirs(table: String, upToGen: Int): Seq[String] = {
    val (merges, loose) = cover(table, upToGen)
    // crash heal: a committed merge whose dir is missing but whose stage
    // dir exists crashed between promoteStagedMerge's delete and rename —
    // complete the promotion (idempotent; the stage is fully written)
    merges.foreach { case (lo, hi) =>
      if (!fs.isDirectory(new Path(mergeDir(table, lo, hi))) &&
          fs.isDirectory(new Path(mergeStageDir(table, lo, hi))))
        promoteStagedMerge(table, lo, hi)
    }
    (merges.map(m => mergeDir(table, m._1, m._2)) ++ loose.map(genDir(table, _)))
      .filter(d => fs.isDirectory(new Path(d)))
  }

  /** Delete data (and, for merges, markers) of every segment covered by the
   * current outermost merge cover — the storage GC the merge design needs to
   * keep disk ∝ live rows. Safe any time after the covering merge's marker
   * committed: readers already ignore covered segments. Covered DELTA dirs
   * lose only their data directory (their generation manifest stays — it
   * fences frontier/archive/metrics too); covered merge segments lose data
   * and marker. */
  def gcCovered(table: String): Unit = {
    val (outer, _) = cover(table, Int.MaxValue)
    committedMerges(table).filterNot(outer.contains).foreach { case (lo, hi) =>
      fs.delete(new Path(mergeDir(table, lo, hi)), true)
      fs.delete(new Path(mergeStageDir(table, lo, hi)), true) // stale stage leftovers
      fs.delete(mergeMarker(table, lo, hi), false)
      val name = f"merge_${table}_$lo%05d_$hi%05d.json"
      commitNamesCache = commitNamesCache.map(_.filterNot(_ == name))
    }
    committedGens()
      .filter(g => outer.exists(m => g >= m._1 && g <= m._2))
      .map(g => new Path(genDir(table, g)))
      .filter(fs.isDirectory)
      .foreach(fs.delete(_, true))
  }

  // --- per-shard sketch persistence (the sketch's reliable checkpoint) ------
  /** Directory holding generation `gen`'s seen-sketch shard files
   * (`shard_I.bin`, written from inside each shard's partition). */
  def sketchDir(gen: Int): String = p("sketch", f"gen=$gen%05d").toString

  /** GC sketch shard dirs for generations < `keepFrom` (called after the
   * commit fence — the newest committed generation's files are never
   * dropped, so resume always finds them). Non-numeric suffixes (e.g. an
   * orphaned `gen=K_retract` checkpoint from a crash mid-retraction whose
   * resume no longer retracts at K) are skipped, not parsed — one leftover
   * dir must not fail every later generation's GC. */
  def dropSketchesBefore(keepFrom: Int): Unit = {
    val sketchRoot = p("sketch")
    val numbered = "gen=(\\d+)".r
    listNames(sketchRoot).foreach {
      case name @ numbered(g) =>
        if (g.toInt < keepFrom) fs.delete(new Path(sketchRoot, name), true)
      case _ => ()
    }
  }
}

object TableIO {
  /** Hadoop conf for path resolution: the active (thread-local) or default
   * Spark session's (so credentials / defaultFS set through Spark apply),
   * else a bare one. */
  def defaultConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
}
