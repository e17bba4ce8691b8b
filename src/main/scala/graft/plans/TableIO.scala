package graft.plans

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * Snapshot-directory table layer (SURVEY.md §7.5). The sandbox ships no
 * Iceberg/Delta jar, so ACID generation commits are emulated with an atomic
 * per-generation manifest: data is written to `<table>/gen=K/`, then
 * `_commits/gen_K.json` is created via write-temp + atomic rename. A
 * generation EXISTS iff its manifest exists; readers only ever list
 * manifests, so a crashed half-written generation is invisible and resume
 * is safe from any checkpoint (north_rule resumability).
 *
 * The `seen` table is APPEND-ONLY per-generation deltas — never rewritten
 * (at 10^10 URLs a rewrite per generation would be the scale killer); the
 * anti-join reads the union of deltas, each delta disjoint by construction
 * (discovered rows passed the anti-join against all prior deltas).
 *
 * Swap-in for a real cluster: Iceberg `MERGE INTO seen` + snapshot commit —
 * same seam, one class.
 */
final class TableIO(val root: String) {
  private def p(parts: String*): Path = Paths.get(root, parts: _*)
  Files.createDirectories(p("_commits"))

  /** Materialized directory listing — Files.list streams hold an fd until
   * closed; this runs several times per generation on long crawls. */
  private def listNames(dir: Path): Seq[String] =
    scala.util.Using.resource(Files.list(dir))(_.iterator.asScala
      .map(_.getFileName.toString).toVector)

  def genDir(table: String, gen: Int): String = p(table, f"gen=$gen%05d").toString

  private def manifest(gen: Int): Path = p("_commits", f"gen_$gen%05d.json")

  /** Atomically publish generation `gen` with its lineage/metrics payload. */
  def commit(gen: Int, payloadJson: String): Unit = {
    val tmp = p("_commits", f"_tmp_gen_$gen%05d.json")
    Files.writeString(tmp, payloadJson)
    Files.move(tmp, manifest(gen), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def committedGens(): Seq[Int] =
    if (!Files.isDirectory(p("_commits"))) Nil
    else listNames(p("_commits"))
      .collect { case s if s.startsWith("gen_") && s.endsWith(".json") =>
        s.stripPrefix("gen_").stripSuffix(".json").toInt }
      .sorted

  def lastCommittedGen(): Option[Int] = committedGens().lastOption

  def readManifest(gen: Int): String = Files.readString(manifest(gen))

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
    val tmp = p("_commits", f"_tmp_compact_${table}_$upToGen%05d.json")
    Files.writeString(tmp,
      s"""{"table":"$table","upto_gen":$upToGen,"rows":$rows}""")
    Files.move(tmp, compactMarker(table, upToGen), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Latest committed compaction of `table` at or below `upToGen`. */
  def lastCompaction(table: String, upToGen: Int): Option[Int] =
    if (!Files.isDirectory(p("_commits"))) None
    else listNames(p("_commits"))
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
      .filter(d => Files.isDirectory(Paths.get(d)))
  }

  // --- per-shard sketch persistence (the sketch's reliable checkpoint) ------
  /** Directory holding generation `gen`'s seen-sketch shard files
   * (`shard_I.bin`, written from inside each shard's partition). */
  def sketchDir(gen: Int): String = p("sketch", f"gen=$gen%05d").toString

  /** GC sketch shard dirs for generations < `keepFrom` (called after the
   * commit fence — the newest committed generation's files are never
   * dropped, so resume always finds them). */
  def dropSketchesBefore(keepFrom: Int): Unit = {
    val root = p("sketch")
    if (Files.isDirectory(root)) listNames(root).foreach { name =>
      if (name.startsWith("gen=")) {
        val g = name.stripPrefix("gen=").toInt
        if (g < keepFrom) {
          val dir = root.resolve(name)
          listNames(dir).foreach(f => Files.deleteIfExists(dir.resolve(f)))
          Files.deleteIfExists(dir)
        }
      }
    }
  }

}
