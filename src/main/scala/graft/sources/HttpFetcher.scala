package graft.sources

import graft.model.Outcome
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One fetch result row. */
final case class FetchResult(url: String, status: Int, body: Array[Byte],
    outcome: String, error_kind: String)

/**
 * Production HTTP fetch stage (reference: worker/src/downloader.rs:26-41) —
 * `mapPartitions` with ONE pooled `java.net.http.HttpClient` per partition,
 * mirroring the reference's one-reqwest-Client-per-process design
 * (downloader.rs:13-21). Deliberately an opaque I/O island between two
 * narrow projections so it breaks whole-stage codegen only locally
 * (SURVEY.md §4 physical notes).
 *
 * Error → outcome mapping per the reference (worker/src/errors.rs:89-183):
 * connect/timeout (network, unreachable) ⇒ Reject; non-2xx ⇒ Err(InvalidPage);
 * malformed URL ⇒ Err(InvalidUrl).
 *
 * Exercised against real sockets by FetcherSpec (error mapping, the
 * reference's mockito analogue downloader.rs:54-88) and by the
 * GoldenCrawlSpec loopback-HTTP crawl (FetchMode.Http), which must be
 * crawl-identical to the Generator/corpus-join modes.
 */
object HttpFetcher {

  /** One pooled client (per test; production partitions use sharedClient). */
  def newClient(connectTimeoutMs: Int): java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs.toLong))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()

  // one client per EXECUTOR JVM (keyed by connect timeout), exactly the
  // reference's one-reqwest-Client-per-process design (downloader.rs:13-21):
  // JDK HttpClient is thread-safe and pools connections internally, so all
  // of an executor's tasks share one socket pool and one selector thread
  // instead of leaking a client (JDK 17 has no close()) per partition
  private val shared =
    new java.util.concurrent.ConcurrentHashMap[Int, java.net.http.HttpClient]()
  def sharedClient(connectTimeoutMs: Int): java.net.http.HttpClient =
    shared.computeIfAbsent(connectTimeoutMs, newClient(_))

  /** GET one URL, mapping failures to the reference's outcome semantics.
   * Pure I/O + mapping — no Spark — so the error table is unit-testable. */
  def fetchOne(client: java.net.http.HttpClient, url: String,
      requestTimeoutMs: Int): FetchResult =
    try {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(requestTimeoutMs.toLong))
        .GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      if (resp.statusCode() >= 200 && resp.statusCode() < 300)
        FetchResult(url, resp.statusCode(), resp.body(), Outcome.Ok, "")
      else
        FetchResult(url, resp.statusCode(), Array.emptyByteArray,
          Outcome.Err, "InvalidPage")
    } catch {
      case _: java.net.ConnectException | _: java.net.http.HttpTimeoutException |
           _: java.net.UnknownHostException | _: java.io.IOException =>
        FetchResult(url, -1, Array.emptyByteArray, Outcome.Reject, "NetworkError")
      case _: IllegalArgumentException =>
        FetchResult(url, -1, Array.emptyByteArray, Outcome.Err, "InvalidUrl")
      case _: InterruptedException =>
        FetchResult(url, -1, Array.emptyByteArray, Outcome.Reject, "NetworkError")
    }

  def fetch(spark: SparkSession, urls: Dataset[String],
      connectTimeoutMs: Int = 5000, requestTimeoutMs: Int = 20000): DataFrame = {
    import spark.implicits._
    urls.mapPartitions { it =>
      // one client per partition; lazily constructed so empty partitions pay nothing
      lazy val client = newClient(connectTimeoutMs)
      it.map(url => fetchOne(client, url, requestTimeoutMs))
    }.toDF()
  }
}
