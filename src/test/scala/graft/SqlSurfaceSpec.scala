package graft

import graft.functions.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

/** The whole function catalogue through spark.sql(...). */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = { val s = SparkSuite.spark; GraftFunctions.register(s); s }

  test("URL functions via SQL") {
    val r = spark.sql(
      """SELECT canonicalize_url('HTTP://AAU.DK:80/x?b=2&a=1#f') AS c,
        |       url_host('https://Sub.Host.com/x') AS h,
        |       resolve_url('http://ref.ref/dir/page.html', '../t.html') AS r,
        |       is_fetchable_scheme('mailto:x@y.z') AS m
        |""".stripMargin).collect()(0)
    assert(r.getString(0) == "http://aau.dk/x?a=1&b=2")
    assert(r.getString(1) == "sub.host.com")
    assert(r.getString(2) == "http://ref.ref/t.html")
    assert(!r.getBoolean(3))
  }

  test("text + sketch functions via SQL, incl. native hamming_distance") {
    val r = spark.sql(
      """SELECT token_count('the quick brown fox') AS tc,
        |       lang_id('the cat and the dog went to the market') AS l,
        |       hamming_distance(simhash('abc def'), simhash('abc def')) AS h0,
        |       hamming_distance(5, 6) AS h3,
        |       round(cosine_sim(array(1.0f, 0.0f), array(1.0f, 0.0f)), 6) AS cs
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) == 4)
    assert(r.getString(1) == "en")
    assert(r.getInt(2) == 0)
    assert(r.getInt(3) == 2) // 101 vs 110 -> xor 011
    assert(r.getDouble(4) == 1.0)
  }

  test("invalid URL returns null through SQL (Err => droppable)") {
    val n = spark.sql(
      "SELECT canonicalize_url('mail@aau.dk') AS c").filter("c IS NULL").count()
    assert(n == 1)
  }

  test("minhash/jaccard end-to-end in SQL") {
    val r = spark.sql(
      """SELECT round(jaccard_sim(shingle_hashes('a b c d e', 2),
        |                         shingle_hashes('a b c d f', 2)), 4) AS j
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) > 0.3 && r.getDouble(0) < 1.0)
  }
}
