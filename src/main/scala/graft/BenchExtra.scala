package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1.4): times individual
 * catalogue queries in isolation, with repeats, using BOTH the frozen
 * bench's action (`count()`, for comparability with Bench.scala) and the
 * noop sink (computes every column, excludes sink cost). Does NOT touch
 * the frozen Bench/Verify harnesses.
 *
 * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
 *   sbt "runMain graft.BenchExtra [repeats] [qname...]"
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(3)
    val names = {
      val qs = if (args.isEmpty) Nil else args.tail.toSeq
      if (qs.nonEmpty) qs
      else Seq("q23_ann_ivf", "q33_minhash_cc", "q37_host_rank", "q22_ann_lsh",
        "q18_minhash_pairs", "q24_crawl_gen1", "q44_corpus_build",
        "q35_dup_ngrams", "q39_gen_budget", "q09_canonicalize")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.storage.blockManagerHeartbeatTimeoutMs", "600000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warmup as Bench
    spark.range(0, 2000000, 1, 32).selectExpr("sum(id % 7)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .groupBy("l_returnflag").count().collect()

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val counts = (1 to repeats).map { i =>
        spark.sparkContext.setJobDescription(s"$n count#$i")
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(s"$n noop")
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val noop = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"$n%-24s count=${counts.map(c => f"$c%.2f").mkString("/")} min=${counts.min}%.2f noop=$noop%.2f")
    }
    spark.stop()
  }
}
