package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbour search over an embedding column
 * (`Array[Float]`) — training-data pipeline similarity operators.
 *
 * Scale design:
 *  - `bruteForceTopK` is the exactness baseline: query×corpus join. Both
 *    sides are pre-normalised ONCE (cosine = dot of unit vectors), the dot
 *    product runs on primitive arrays in a single UDF, and the per-query
 *    top-k is a rank window AFTER a size-guarded join. At 100 TB you never
 *    run this unblocked — it exists to measure recall of the bucketed paths.
 *  - `lshTopK`: random-hyperplane signatures; candidates share a signature
 *    band (shuffle on band key), then exact re-rank within candidates.
 *  - `ivfTopK`: IVF — deterministic k-means-lite centroids (hash-sampled
 *    seeds + one Lloyd pass, all distributed), vectors assigned to nearest
 *    centroid list; queries probe the nProbe nearest lists only ⇒ the join
 *    touches ~nProbe/k of the corpus. Centroids are broadcast (k is small).
 */
object Similarity {

  private val normalizeUdf = udf((v: Seq[Float]) => {
    val a = v.toArray
    val n = TextFunctions.norm(a)
    if (n == 0.0) a else a.map(x => (x / n).toFloat)
  })
  private val dotUdf = udf((a: Seq[Float], b: Seq[Float]) =>
    TextFunctions.dot(a.toArray, b.toArray))
  private val hpSigUdf = udf((v: Seq[Float], bits: Int, seed: Long) =>
    TextFunctions.hyperplaneSignature(v.toArray, bits, seed))

  /** Add a unit-norm copy of the embedding column. */
  def withUnitNorm(df: DataFrame, embCol: String = "embedding",
      outCol: String = "unit"): DataFrame =
    df.withColumn(outCol, normalizeUdf(col(embCol)))

  /** Exact cosine top-k neighbours for each query id (default: all ids).
   * Returns (vec_id, neighbour_id, cosine, rank). */
  def bruteForceTopK(vectors: DataFrame, k: Int, queryIds: Option[Seq[Long]] = None,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val unit = withUnitNorm(vectors.select(col(idCol), col(embCol)), embCol)
    val queries = queryIds match {
      case Some(ids) => unit.filter(col(idCol).isin(ids: _*))
      case None => unit
    }
    val q = queries.select(col(idCol).as("vec_id"), col("unit").as("q_unit"))
    val c = unit.select(col(idCol).as("neighbour_id"), col("unit").as("c_unit"))
    val scored = q.join(c, col("vec_id") =!= col("neighbour_id"))
      .withColumn("cosine", dotUdf(col("q_unit"), col("c_unit")))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cosine").desc, col("neighbour_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "neighbour_id", "cosine", "rank")
  }

  /** All pairs (a<b) with cosine ≥ threshold — embedding near-dup dedup.
   * Brute force variant (baseline / small corpora). */
  def cosinePairs(vectors: DataFrame, threshold: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val unit = withUnitNorm(vectors.select(col(idCol), col(embCol)), embCol)
    val a = unit.select(col(idCol).as("id_a"), col("unit").as("u_a"))
    val b = unit.select(col(idCol).as("id_b"), col("unit").as("u_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", dotUdf(col("u_a"), col("u_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** LSH-bucketed ANN: hyperplane signature bands → candidates share a band
   * → exact re-rank. `tables` independent signatures trade recall for cost. */
  def lshTopK(vectors: DataFrame, k: Int, bits: Int = 16, tables: Int = 4,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val unit = withUnitNorm(vectors.select(col(idCol), col(embCol)), embCol)
      .select(col(idCol).as("id"), col("unit"))
    val tablesDf = (0 until tables).map { t =>
      unit.withColumn("band_key",
        concat_ws(":", lit(t), hpSigUdf(col("unit"), lit(bits), lit(0xbeefL + t))))
    }.reduce(_ unionByName _)
    val a = tablesDf.select(col("band_key"), col("id").as("vec_id"), col("unit").as("q_unit"))
    val b = tablesDf.select(col("band_key"), col("id").as("neighbour_id"), col("unit").as("c_unit"))
    val cand = a.join(b, Seq("band_key"))
      .filter(col("vec_id") =!= col("neighbour_id"))
      .dropDuplicates("vec_id", "neighbour_id")
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cosine").desc, col("neighbour_id").asc)
    cand.withColumn("cosine", dotUdf(col("q_unit"), col("c_unit")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "neighbour_id", "cosine", "rank")
  }

  /** IVF ANN: deterministic centroids (hash-order sample + one Lloyd pass),
   * nProbe-list probing, exact re-rank inside probed lists. */
  def ivfTopK(vectors: DataFrame, k: Int, nLists: Int = 16, nProbe: Int = 4,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    val unit = withUnitNorm(vectors.select(col(idCol), col(embCol)), embCol)
      .select(col(idCol).as("id"), col("unit")).cache()

    // seed centroids: the nLists vectors with smallest hash(id) — deterministic,
    // distributed (orderBy + limit on a narrow projection)
    val seedRows = unit
      .withColumn("h", xxhash64(col("id")))
      .orderBy("h").limit(nLists).select("unit").collect()
      .map(_.getSeq[Float](0).toArray)

    // one Lloyd refinement pass: assign → mean per cluster. The mean is a
    // typed mapGroups (one pass over primitive arrays) rather than dim-many
    // avg() columns — a 64-wide aggregate costs seconds of codegen
    // compilation alone and dominates small inputs.
    val bcSeed = spark.sparkContext.broadcast(seedRows)
    val assignUdf = udf((v: Seq[Float]) => {
      val a = v.toArray
      var best = 0; var bestD = Double.MinValue; var i = 0
      val cs = bcSeed.value
      while (i < cs.length) {
        val d = TextFunctions.dot(a, cs(i))
        if (d > bestD) { bestD = d; best = i }
        i += 1
      }
      best
    })
    val dim = seedRows.headOption.map(_.length).getOrElse(0)
    import spark.implicits._
    val refined = unit.withColumn("list", assignUdf(col("unit")))
      .select(col("list"), col("unit")).as[(Int, Seq[Float])]
      .groupByKey(_._1)
      .mapGroups { (list, it) =>
        val sum = new Array[Double](dim)
        var n = 0L
        it.foreach { case (_, v) =>
          var i = 0
          while (i < dim) { sum(i) += v(i); i += 1 }
          n += 1
        }
        (list, sum.map(x => (x / n).toFloat).toSeq)
      }
      .collect()
      .map { case (list, c) => list -> c.toArray }
      .toMap
    val centroids = (0 until nLists).map(i => refined.getOrElse(i, seedRows(i)))
    val bcC = spark.sparkContext.broadcast(centroids.toArray)

    val assignFinal = udf((v: Seq[Float]) => {
      val a = v.toArray
      var best = 0; var bestD = Double.MinValue; var i = 0
      val cs = bcC.value
      while (i < cs.length) {
        val d = TextFunctions.dot(a, cs(i))
        if (d > bestD) { bestD = d; best = i }
        i += 1
      }
      best
    })
    val probeLists = udf((v: Seq[Float], np: Int) => {
      val a = v.toArray
      bcC.value.zipWithIndex
        .map { case (c, i) => (TextFunctions.dot(a, c), i) }
        .sortBy { case (d, i) => (-d, i) }.take(np).map(_._2)
    })

    val indexed = unit.withColumn("list", assignFinal(col("unit")))
    val queries = unit.withColumn("probe", probeLists(col("unit"), lit(nProbe)))
      .select(col("id").as("vec_id"), col("unit").as("q_unit"),
        explode(col("probe")).as("list"))
    val cand = queries.join(
        indexed.select(col("list"), col("id").as("neighbour_id"), col("unit").as("c_unit")),
        Seq("list"))
      .filter(col("vec_id") =!= col("neighbour_id"))
      .dropDuplicates("vec_id", "neighbour_id")
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cosine").desc, col("neighbour_id").asc)
    cand.withColumn("cosine", dotUdf(col("q_unit"), col("c_unit")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("vec_id", "neighbour_id", "cosine", "rank")
  }
}
