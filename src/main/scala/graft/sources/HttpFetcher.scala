package graft.sources

import java.util.concurrent.{CompletableFuture, CompletionException, ExecutionException}

import graft.model.Outcome
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One fetch result row. */
final case class FetchResult(url: String, status: Int, body: Array[Byte],
    outcome: String, error_kind: String)

/**
 * Production HTTP fetch stage (reference: worker/src/downloader.rs:26-41) —
 * `mapPartitions` with ONE pooled `java.net.http.HttpClient` per executor
 * JVM, mirroring the reference's one-reqwest-Client-per-process design
 * (downloader.rs:13-21). Deliberately an opaque I/O island between two
 * narrow projections so it breaks whole-stage codegen only locally
 * (SURVEY.md §4 physical notes).
 *
 * **Windowed async pipelining** (`fetchWindowed`): a real crawl is
 * LATENCY-bound, not CPU-bound — at ~200 ms per page round-trip a
 * synchronous send per task thread caps a 32-core executor at ~160 urls/s
 * no matter how many task slots it has. Each fetch partition therefore
 * keeps up to `window` requests in flight (async send into the client's
 * selector, results drained in submission order), the iterator-level form
 * of the reference's prefetch pipelining (`basic_qos(prefetch_count)`,
 * rmqredis.rs:162-165 — its workers hold 5 tasks in flight each).
 * Throughput scales ≈ min(window × partitions, server capacity) while the
 * politeness contract is untouched: the per-generation per-host cap is
 * enforced upstream at selection time, so at most `perHostCap` requests
 * can ever be in flight against one host across the WHOLE cluster —
 * exactly the reference's concurrency shape (5 per worker). Results are
 * yielded in submission order, so windowed output == sequential output,
 * row for row (FetcherSpec pins this).
 *
 * Error → outcome mapping per the reference (worker/src/errors.rs:89-183):
 * connect/timeout (network, unreachable) ⇒ Reject; non-2xx ⇒ Err(InvalidPage);
 * malformed URL ⇒ Err(InvalidUrl). The async path funnels failures through
 * the same `failureResult` table (futures always complete NORMALLY with a
 * FetchResult — `join()` in the drain loop can never throw a transport
 * error).
 *
 * Exercised against real sockets by FetcherSpec (error mapping, the
 * reference's mockito analogue downloader.rs:54-88; windowed≡sequential
 * equality) and by the GoldenCrawlSpec loopback-HTTP crawl (FetchMode.Http),
 * which must be crawl-identical to the Generator/corpus-join modes.
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

  /** The reference's error table (errors.rs:89-183) over a Java exception —
   * shared verbatim by the sync and async paths. */
  private def failureResult(url: String, e: Throwable): FetchResult = e match {
    case ce: CompletionException if ce.getCause != null =>
      failureResult(url, ce.getCause)
    case ee: ExecutionException if ee.getCause != null =>
      failureResult(url, ee.getCause)
    case _: java.net.ConnectException | _: java.net.http.HttpTimeoutException |
         _: java.net.UnknownHostException | _: java.io.IOException |
         _: InterruptedException | _: java.util.concurrent.CancellationException =>
      FetchResult(url, -1, Array.emptyByteArray, Outcome.Reject, "NetworkError")
    case _: IllegalArgumentException =>
      FetchResult(url, -1, Array.emptyByteArray, Outcome.Err, "InvalidUrl")
    case other => throw other // programming error: don't swallow it
  }

  private def statusResult(url: String, status: Int, body: Array[Byte]): FetchResult =
    if (status >= 200 && status < 300)
      FetchResult(url, status, body, Outcome.Ok, "")
    else
      FetchResult(url, status, Array.emptyByteArray, Outcome.Err, "InvalidPage")

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
      statusResult(url, resp.statusCode(), resp.body())
    } catch { case e: Throwable => failureResult(url, e) }

  /** Async GET whose future ALWAYS completes normally with a FetchResult
   * (transport failures and malformed URLs land in the same outcome table
   * as fetchOne — bitwise-identical results, FetcherSpec-pinned). */
  def sendOne(client: java.net.http.HttpClient, url: String,
      requestTimeoutMs: Int): CompletableFuture[FetchResult] =
    try {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(requestTimeoutMs.toLong))
        .GET().build()
      client.sendAsync(req, java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        .handle[FetchResult] { (resp, err) =>
          if (err != null) failureResult(url, err)
          else statusResult(url, resp.statusCode(), resp.body())
        }
    } catch { case e: IllegalArgumentException =>
      CompletableFuture.completedFuture(failureResult(url, e))
    }

  /** Pipelined fetch of an item iterator: up to `window` requests in flight,
   * results drained FIFO so output order == input order (windowed output is
   * row-identical to the sequential path). `window = 1` degrades to strictly
   * sequential. Lazy: nothing is sent until the caller pulls. */
  def fetchWindowed[A](client: java.net.http.HttpClient, items: Iterator[A],
      urlOf: A => String, requestTimeoutMs: Int,
      window: Int): Iterator[(A, FetchResult)] = {
    val w = math.max(1, window)
    val inFlight = new java.util.ArrayDeque[(A, CompletableFuture[FetchResult])](w)
    new Iterator[(A, FetchResult)] {
      private def refill(): Unit =
        while (inFlight.size < w && items.hasNext) {
          val a = items.next()
          inFlight.addLast((a, sendOne(client, urlOf(a), requestTimeoutMs)))
        }
      def hasNext: Boolean = { refill(); !inFlight.isEmpty }
      def next(): (A, FetchResult) = {
        refill()
        val (a, f) = inFlight.removeFirst()
        (a, f.join()) // never throws: sendOne maps every failure to a result
      }
    }
  }

  def fetch(spark: SparkSession, urls: Dataset[String],
      connectTimeoutMs: Int = 5000, requestTimeoutMs: Int = 20000,
      window: Int = 16): DataFrame = {
    import spark.implicits._
    urls.mapPartitions { it =>
      // shared executor client; lazily touched so empty partitions pay nothing
      lazy val client = sharedClient(connectTimeoutMs)
      fetchWindowed(client, it, identity[String], requestTimeoutMs, window)
        .map(_._2)
    }.toDF()
  }
}
