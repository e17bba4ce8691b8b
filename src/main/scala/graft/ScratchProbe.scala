package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch phase-level probe for optimization work — not part of the
 * deliverable surface; timings cited in OPTIMIZATION_r06.md come from
 * Bench/BenchExtra. Current contents: (a) the politeness boundary-prune
 * A/B that motivated its revert (see markTopKOld below), (b) link-stream
 * duplicate-rate measurement for the within-partition pre-dedup decision. */
object ScratchProbe {

  /** The r5 politeness shape (full count-table join, no boundary prune) —
   * kept for the A/B record (OPTIMIZATION_r06.md §politeness). */
  private def markTopKOld(tasks: DataFrame, k: Int, saltBuckets: Int): DataFrame = {
    val t = tasks.withColumn("_k", lit(k.toLong))
    val order = Seq(col("priority").asc, col("next_fetch").asc, col("url").asc)
    val counts = t.groupBy(col("host")).agg(count(lit(1)).as("_hn"))
      .withColumnRenamed("host", "_chost")
    val joined = t.join(counts, col("host") <=> col("_chost"), "left")
      .drop("_chost")
      .withColumn("_hn", coalesce(col("_hn"), lit(1L)))
    val under = joined.filter(col("_hn") <= col("_k"))
      .drop("_hn", "_k").withColumn("selected", lit(true))
    val over = joined.filter(col("_hn") > col("_k")).drop("_hn")
    val salted = over.withColumn("_salt", pmod(xxhash64(col("url")), lit(saltBuckets)))
    val w1 = Window.partitionBy(col("host"), col("_salt")).orderBy(order: _*)
    val stage1 = salted.withColumn("_rn1", row_number().over(w1))
    val survivors = stage1.filter(col("_rn1") <= col("_k"))
      .withColumn("_rn2",
        row_number().over(Window.partitionBy(col("host")).orderBy(order: _*)))
      .withColumn("selected", col("_rn2") <= col("_k"))
      .drop("_salt", "_rn1", "_rn2", "_k")
    val losers = stage1.filter(col("_rn1") > col("_k"))
      .withColumn("selected", lit(false))
      .drop("_salt", "_rn1", "_k")
    under.unionByName(survivors).unionByName(losers)
  }

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
    import spark.implicits._
    spark.range(0, 2000000, 1, 32).selectExpr("sum(id % 7)").collect()

    val cfg = graft.corpus.CorpusConfig(seed = 42L, numHosts = 1200000, maxPages = 400000)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"  [$label] ${(System.nanoTime() - t0) / 1e9}%6.2f s  (n=$n)  load=${
        scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ").head}")
    }

    // --- link-stream duplicate rates on the steady-state selection ----------
    val frontier = BenchFrontier.allPages(spark, cfg)
    val fetchable = graft.operators.Politeness.markTopKPerHost(frontier, 200, 16)
      .filter(col("selected")).drop("selected")
      .repartition(spark.sparkContext.defaultParallelism * 3, col("url"))
      .persist()
    println(s"selected=${fetchable.count()}")
    val links = fetchable.select("url").as[String]
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
    time("links raw count") { links.count() }
    val linksPartDedup = fetchable.select("url").as[String]
      .mapPartitions { it =>
        val inPart = new java.util.HashSet[String]()
        it.flatMap { base =>
          graft.corpus.CorpusGen.resolvePage(cfg, base) match {
            case graft.corpus.CorpusGen.PageLookup.Found(h, p) =>
              graft.corpus.CorpusGen.pageHrefs(cfg, h, p).iterator.flatMap { href =>
                graft.core.UrlCanon.resolveCanonHost(base, href) match {
                  case Some((u, host)) if inPart.add(u) => Iterator.single((u, host))
                  case _ => Iterator.empty
                }
              }
            case _ => Iterator.empty
          }
        }
      }.toDF("url", "host")
    time("links part-dedup count") { linksPartDedup.count() }
    time("global dedup (from raw)") { links.dropDuplicates("url").count() }
    time("global dedup (from part-dedup)") { linksPartDedup.dropDuplicates("url").count() }
    time("global dedup (from raw) again") { links.dropDuplicates("url").count() }
    time("global dedup (from part-dedup) again") { linksPartDedup.dropDuplicates("url").count() }
    spark.stop()
  }
}
