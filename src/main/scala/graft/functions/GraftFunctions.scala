package graft.functions

import graft.core.{Extract, UrlCanon}
import org.apache.spark.sql.SparkSession

/**
 * SQL surface: registers every graft scalar function so the whole catalogue
 * is usable from `spark.sql(...)` as well as the Column API. All functions
 * are pure/deterministic. The two native expressions register through the
 * catalyst function registry (keeping codegen); the rest are standard UDFs.
 */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("canonicalize_url", (s: String) =>
      if (s == null) null else UrlCanon.canonicalize(s).orNull)
    u.register("url_host", (s: String) =>
      if (s == null) null else { val h = UrlCanon.hostOf(s); if (h.isEmpty) null else h })
    u.register("resolve_url", (base: String, href: String) =>
      if (base == null || href == null) null else Extract.resolveLink(base, href).orNull)
    u.register("is_fetchable_scheme", (s: String) =>
      s != null && UrlCanon.isFetchableScheme(s))
    u.register("extract_hrefs", (html: String) =>
      if (html == null) Seq.empty[String] else Extract.rawHrefs(html))
    u.register("token_count", (t: String) => TextFunctions.tokenCount(t))
    u.register("quality_score", (t: String) => TextFunctions.qualityScore(t))
    u.register("lang_id", (t: String) => TextFunctions.langId(t)._1)
    u.register("simhash", (t: String) => TextFunctions.simhash(t))
    u.register("doc_fingerprint", (t: String) => TextFunctions.fingerprint(t))
    u.register("shingle_hashes", (t: String, n: Int) => TextFunctions.shingleHashes(t, n))
    u.register("minhash_signature", (t: String, n: Int, perms: Int) =>
      TextFunctions.minhashSignature(TextFunctions.shingleHashes(t, n), perms))
    u.register("jaccard_sim", (a: Seq[Long], b: Seq[Long]) =>
      TextFunctions.jaccard(a.toArray, b.toArray))
    u.register("cosine_sim", (a: Seq[Float], b: Seq[Float]) =>
      TextFunctions.cosine(a.toArray, b.toArray))

    // native expressions — registered at the catalyst level so SQL use keeps
    // whole-stage codegen
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming_distance",
      exprs => HammingDistance( // widen int literals etc. to the LongType the expression expects
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(0),
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(1),
          org.apache.spark.sql.types.LongType)),
      "built-in")
  }
}
