package graft

import graft.corpus.{CorpusConfig, CorpusGen}
import graft.loop.CrawlLoop
import graft.operators.CrawlConfig
import graft.plans.TableIO
import org.apache.spark.sql.SparkSession

/**
 * spark-submit entry for the BSP crawl (north_rule: "run via spark-submit
 * ... at two cluster sizes"). Local sandbox: parallelism via SPARK_GRAFT_CPUS.
 *
 * Usage: CrawlMain <workDir> [numHosts] [maxPages] [perHostCap] [maxGens] [seeds] [join|gen]
 * Resumable: re-running with the same workDir continues from the last
 * committed generation.
 */
object CrawlMain {
  def main(args: Array[String]): Unit = {
    val workDir = if (args.length > 0) args(0) else "/tmp/graft-crawl"
    val numHosts = if (args.length > 1) args(1).toInt else 200
    val maxPages = if (args.length > 2) args(2).toInt else 400
    val perHostCap = if (args.length > 3) args(3).toInt else 5
    val maxGens = if (args.length > 4) args(4).toInt else 30
    val nSeeds = if (args.length > 5) args(5).toInt else 5
    val fetchMode = if (args.length > 6 && args(6) == "gen")
      graft.operators.FetchMode.Generator else graft.operators.FetchMode.CorpusJoin

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(sys.props.getOrElse("spark.master", s"local[$cpus]"))
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // extra confs for experiments: SPARK_GRAFT_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = CrawlConfig(corpus = CorpusConfig(numHosts = numHosts, maxPages = maxPages),
      perHostCap = perHostCap, fetchMode = fetchMode,
      bloomExpectedItems = 1L << 22)
    val io = new TableIO(workDir)
    val t0 = System.nanoTime()
    val res = CrawlLoop.run(spark, io, CorpusGen.seeds(cfg.corpus, nSeeds), cfg, maxGens)
    val wallSec = (System.nanoTime() - t0) / 1e9
    val fetched = res.stats.map(_.fetched).sum
    val discovered = res.stats.map(_.discovered).sum
    res.stats.foreach(s => println(
      s"""gen=${s.gen} frontier=${s.frontierRows} fetched=${s.fetched} """ +
      s"""discovered=${s.discovered} ok=${s.okCount} err=${s.errCount} """ +
      s"""reject=${s.rejectCount} wall_ms=${s.wallMs}"""))
    println(s"""{"gens":${res.stats.size},"fetched":$fetched,""" +
      s""""discovered":$discovered,"wall_sec":$wallSec,""" +
      s""""fetch_per_sec":${fetched / math.max(wallSec, 1e-9)},"cpus":"$cpus"}""")
    spark.stop()
  }
}
