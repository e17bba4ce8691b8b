package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase-level probe for optimization work — not part of the
 * deliverable surface; timings cited in OPTIMIZATION_r06.md come from
 * Bench/BenchExtra. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 2000000, 1, 32).selectExpr("sum(id % 7)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  [$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // --- single-thread kernel micro-benchmarks --------------------------------
    val cfg = graft.corpus.CorpusConfig(seed = 42L, numHosts = 1200000, maxPages = 400000)
    val urls = (0 until 200000).map(i => graft.corpus.CorpusGen.pageUrl(i % 100000, i % 4)).toArray
    t("kernel resolvePage x200k") {
      var ok = 0
      urls.foreach(u => if (graft.corpus.CorpusGen.resolvePage(cfg, u).isInstanceOf[graft.corpus.CorpusGen.PageLookup.Found]) ok += 1)
      ok
    }
    t("kernel pageHrefs x50k") {
      var n = 0
      (0 until 50000).foreach(i => n += graft.corpus.CorpusGen.pageHrefs(cfg, i % 10000, 0).length)
      n
    }
    val hrefs = (0 until 50000).flatMap(i => graft.corpus.CorpusGen.pageHrefs(cfg, i % 1000, 0)).toArray
    println(s"  hrefs n=${hrefs.length}")
    t("kernel resolveCanonHost x" + hrefs.length) {
      var n = 0
      val base = "http://h17.example/p0"
      hrefs.foreach(h => if (graft.core.UrlCanon.resolveCanonHost(base, h).isDefined) n += 1)
      n
    }
    t("kernel priorityOf x200k") {
      var s = 0L; urls.foreach(u => s += graft.operators.FrontierStep.priorityOf(u)); s
    }

    // --- steady-state stage dissection (mirrors Bench phase 1) ----------------
    val ssCfg = graft.operators.CrawlConfig(corpus = cfg, perHostCap = 200,
      bloomExpectedItems = 1L << 23,
      fetchMode = graft.operators.FetchMode.Generator)
    val megaFrontier = BenchFrontier.allPages(spark, cfg)
    t("frontier materialize count") { megaFrontier.count() }
    val marked = t("politeness markTopKPerHost count") {
      val m = graft.operators.Politeness.markTopKPerHost(megaFrontier, 200, 16)
      m.filter(col("selected")).count()
    }
    println(s"  selected=$marked")
    val fetchable = graft.operators.Politeness.markTopKPerHost(megaFrontier, 200, 16)
      .filter(col("selected")).drop("selected")
      .repartition(spark.sparkContext.defaultParallelism * 3, col("url"))
    t("politeness+repartition count") { fetchable.count() }
    val classify = udf((url: String) => graft.corpus.CorpusGen.resolvePage(cfg, url) match {
      case graft.corpus.CorpusGen.PageLookup.Found(_, _) => "Ok"
      case graft.corpus.CorpusGen.PageLookup.NotFound    => "Err"
      case _                                             => "Reject"
    })
    val fetched = fetchable.withColumn("outcome", classify(col("url")))
    t("(+classify) count") { fetched.filter(col("outcome") === "Ok").count() }
    import spark.implicits._
    val links = fetched.filter(col("outcome") === "Ok").select("url").as[String]
      .mapPartitions { it =>
        it.flatMap { base =>
          graft.corpus.CorpusGen.resolvePage(cfg, base) match {
            case graft.corpus.CorpusGen.PageLookup.Found(h, p) =>
              val inPage = new java.util.HashSet[String]()
              graft.corpus.CorpusGen.pageHrefs(cfg, h, p).iterator.flatMap { href =>
                graft.core.UrlCanon.resolveCanonHost(base, href) match {
                  case Some((u, host)) if inPage.add(u) => Iterator.single((u, host))
                  case _ => Iterator.empty
                }
              }
            case _ => Iterator.empty
          }
        }
      }.toDF("url", "host")
    t("(+links extract) count") { links.count() }
    t("(+dedup) count") { links.dropDuplicates("url").count() }
    spark.stop()
  }
}
