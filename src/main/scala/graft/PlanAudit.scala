package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative catalogue queries so
 * scan pruning / pushdown / join strategy / codegen spans can be audited
 * (results recorded in PLANS.md). Usage: runMain graft.PlanAudit [names...] */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_agg", "q03_anti_join", "q06_filter_whitelist", "q12_token_count",
        "q15_join_agg", "q02_window_topk", "q24_crawl_gen1")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
