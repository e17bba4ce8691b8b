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
 * (at 10^10 URLs a rewrite per generation would be the scale killer); the
 * anti-join reads the union of deltas, each delta disjoint by construction
 * (discovered rows passed the anti-join against all prior deltas).
 *
 * Swap-in for a real cluster: Iceberg `MERGE INTO seen` + snapshot commit —
 * same seam, one class.
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

  /** Total bytes of a directory's files (−1 if missing) — one FS listing,
   * no data read. Sizes the hybrid sketch-probe decision. */
  def dirBytes(dir: String): Long = {
    val path = new Path(dir)
    if (!fs.isDirectory(path)) -1L
    else fs.listStatus(path).map(_.getLen).sum
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

  def readManifest(gen: Int): String =
    new String(readBytes(manifest(gen).toString), UTF_8)

  // --- compaction (log-structured maintenance of append-only tables) --------
  def compactDir(table: String, upToGen: Int): String =
    p(table, f"compact_upto=$upToGen%05d").toString

  private def compactMarker(table: String, gen: Int): Path =
    p("_commits", f"compact_${table}_$gen%05d.json")

  /** Publish a compaction of `table` covering all deltas ≤ upToGen. The
   * marker is written atomically AFTER the compacted data; a crashed
   * half-written compaction is invisible. Old deltas are retained (readers
   * ignore them once covered; GC is a separate concern). */
  def commitCompaction(table: String, upToGen: Int, rows: Long): Unit = {
    publishJson(p("_commits", f"_tmp_compact_${table}_$upToGen%05d.json"),
      compactMarker(table, upToGen),
      s"""{"table":"$table","upto_gen":$upToGen,"rows":$rows}""")
    val name = f"compact_${table}_$upToGen%05d.json"
    commitNamesCache = commitNamesCache.map(v => if (v.contains(name)) v else v :+ name)
  }

  /** Latest committed compaction of `table` at or below `upToGen`. */
  def lastCompaction(table: String, upToGen: Int): Option[Int] =
    commitNames()
      .collect { case s if s.startsWith(s"compact_${table}_") && s.endsWith(".json") =>
        s.stripPrefix(s"compact_${table}_").stripSuffix(".json").toInt }
      .filter(_ <= upToGen).maxOption

  /** All committed data dirs of an append-only table (e.g. `seen`): the
   * newest covering compaction (if any) plus the deltas after it. */
  def deltaDirs(table: String, upToGen: Int): Seq[String] = {
    val compacted = lastCompaction(table, upToGen)
    val base = compacted.map(c => compactDir(table, c)).toSeq
    val floor = compacted.getOrElse(-1)
    (base ++ committedGens().filter(g => g > floor && g <= upToGen)
      .map(genDir(table, _)))
      .filter(d => fs.isDirectory(new Path(d)))
  }

  // --- per-shard sketch persistence (the sketch's reliable checkpoint) ------
  /** Directory holding generation `gen`'s seen-sketch shard files
   * (`shard_I.bin`, written from inside each shard's partition). */
  def sketchDir(gen: Int): String = p("sketch", f"gen=$gen%05d").toString

  /** GC sketch shard dirs for generations < `keepFrom` (called after the
   * commit fence — the newest committed generation's files are never
   * dropped, so resume always finds them). */
  def dropSketchesBefore(keepFrom: Int): Unit = {
    val sketchRoot = p("sketch")
    listNames(sketchRoot).foreach { name =>
      if (name.startsWith("gen=")) {
        val g = name.stripPrefix("gen=").toInt
        if (g < keepFrom) fs.delete(new Path(sketchRoot, name), true)
      }
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
