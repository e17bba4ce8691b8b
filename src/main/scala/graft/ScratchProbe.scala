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


  /** r5 lshTopK band construction (per-table union) — A/B only. */
  private def lshTopKUnion(vectors: DataFrame, k: Int, bits: Int, tables: Int): DataFrame = {
    import graft.functions.TextFunctions
    val hpSigUdf = udf((v: Seq[Float], bits: Int, table: Int) =>
      TextFunctions.hyperplaneSignature(v.toArray, bits, table))
    val normalizeUdf = udf((v: Seq[Float]) => {
      val a = v.toArray
      val n = TextFunctions.norm(a)
      if (n == 0.0) a else a.map(x => (x / n).toFloat)
    })
    val dotUdf = udf((a: Seq[Float], b: Seq[Float]) => TextFunctions.dot(a.toArray, b.toArray))
    val unit = vectors.select(col("vec_id").as("id"), normalizeUdf(col("embedding")).as("unit")).persist()
    val tablesDf = (0 until tables).map { t =>
      unit.select(col("id"),
        concat_ws(":", lit(t), hpSigUdf(col("unit"), lit(bits), lit(t))).as("band_key"))
    }.reduce(_ unionByName _)
    val a = tablesDf.select(col("band_key"), col("id").as("vec_id"))
    val b = tablesDf.select(col("band_key"), col("id").as("neighbour_id"))
    val cand = a.join(b, Seq("band_key"))
      .filter(col("vec_id") =!= col("neighbour_id"))
      .select("vec_id", "neighbour_id")
      .dropDuplicates("vec_id", "neighbour_id")
    val scored = cand
      .join(unit.select(col("id").as("neighbour_id"), col("unit").as("c_unit")), Seq("neighbour_id"))
      .join(unit.select(col("id").as("vec_id"), col("unit").as("q_unit")), Seq("vec_id"))
      .withColumn("cosine", dotUdf(col("q_unit"), col("c_unit")))
      .select("vec_id", "neighbour_id", "cosine")
    val w = Window.partitionBy("vec_id").orderBy(col("cosine").desc, col("neighbour_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "neighbour_id", "cosine", "rank")
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
    spark.range(0, 2000000, 1, 32).selectExpr("sum(id % 7)").collect()
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"  [$label] ${(System.nanoTime() - t0) / 1e9}%6.2f s  (n=$n)  load=${
        scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ").head}")
    }
    (1 to 3).foreach { rep =>
      time(s"UNION   rep$rep") {
        val r = lshTopKUnion(emb, 5, 8, 4).groupBy("vec_id").count().count()
        spark.catalog.clearCache(); r
      }
      time(s"EXPLODE rep$rep") {
        val r = graft.operators.Similarity.lshTopK(emb, 5, 8, 4)
          .groupBy("vec_id").count().count()
        spark.catalog.clearCache(); r
      }
    }
    spark.stop()
  }
}
