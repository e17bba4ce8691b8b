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
 * **Bounded bodies** (deliberate divergence from the reference, which
 * `read_to_end`s unbounded — downloader.rs:30-37): every response body is
 * read through a capped subscriber that stops consuming at `maxBodyBytes`
 * and cancels the stream. Unbounded buffering does not survive scale — with
 * `window` requests in flight per partition, one executor holds up to
 * window × taskSlots bodies at once, so a handful of multi-GB (or hostile)
 * responses OOMs it. A 2xx body that hit the cap is TRUNCATED, not failed:
 * outcome stays Ok and `error_kind = "Truncated"` marks it (the tolerant
 * HTML tokenizer parses a prefix fine; the batch outcome table derives
 * error_kind from outcome so batch goldens are unaffected, while the
 * streaming outcome feed carries the marker through). Robots fetches use
 * the conventional 512 KiB cap (Google's documented robots.txt limit —
 * parse the first 500 KiB); pages default to 16 MiB, CrawlMain
 * `--max-body-bytes` overrides, `<= 0` means unbounded (the reference's
 * exact behavior, for strict-parity runs).
 *
 * **Transparent compression** (reference parity): requests advertise
 * `Accept-Encoding: gzip` (exactly reqwest 0.9's default) and responses
 * decode transparently — a bare JDK HttpClient does neither, and without
 * this a live gzip-answering server hands the extractor compressed bytes
 * where the reference gets HTML. Volunteered `deflate` decodes too, with
 * zlib-vs-raw sniffing (legacy servers send RFC-violating raw deflate).
 * The body cap applies to the DECOMPRESSED output too (`decodeBody`) —
 * network-side capping alone is no defense against a zip bomb. A truncated
 * body additionally drops any incomplete trailing UTF-8 sequence
 * (`trimPartialUtf8Tail`): the strict downstream decoder would otherwise
 * reject the whole page over the cut character.
 *
 * **Instantaneous per-host concurrency**: windowed pipelining can open a
 * host's selected requests concurrently where the sequential loop paced
 * them one RTT apart — but the burst is bounded by the politeness cap
 * (≤ perHostCap requests per host per generation exist AT ALL,
 * cluster-wide), i.e. ≤ the default 5, the connection count a browser
 * opens per origin. Operators raising perHostCap far above the default
 * should size `fetchWindow` accordingly.
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

  /** Default page-body cap (16 MiB; see the class doc's bounded-bodies
   * contract). `<= 0` anywhere a cap is taken means unbounded. */
  val DefaultMaxBodyBytes: Long = 16L * 1024 * 1024
  /** robots.txt cap — the conventional 512 KiB limit (Google's documented
   * robots.txt size: rules beyond the first 500 KiB are ignored). */
  val RobotsMaxBodyBytes: Long = 512L * 1024

  /** Body subscriber that buffers at most `cap` bytes, then cancels the
   * stream. Completes with (bytes, hitCap). Reactive-stream onNext calls are
   * serialized by the JDK client, so the accumulation needs no locking. */
  private final class BoundedBody(cap: Long)
      extends java.net.http.HttpResponse.BodySubscriber[(Array[Byte], Boolean)] {
    private val done = new CompletableFuture[(Array[Byte], Boolean)]()
    private val buf = new java.io.ByteArrayOutputStream()
    private var sub: java.util.concurrent.Flow.Subscription = _
    private var finished = false
    override def onSubscribe(s: java.util.concurrent.Flow.Subscription): Unit = {
      sub = s; s.request(Long.MaxValue)
    }
    override def onNext(items: java.util.List[java.nio.ByteBuffer]): Unit =
      if (!finished) {
        val it = items.iterator()
        while (!finished && it.hasNext) {
          val bb = it.next()
          val take = math.min(bb.remaining().toLong, cap - buf.size()).toInt
          if (take > 0) {
            val chunk = new Array[Byte](take)
            bb.get(chunk)
            buf.write(chunk, 0, take)
          }
          if (buf.size() >= cap && (bb.hasRemaining || it.hasNext)) {
            // more bytes exist beyond the cap: truncate and stop the stream
            finished = true
            sub.cancel()
            done.complete((buf.toByteArray, true))
          }
        }
      }
    override def onError(t: Throwable): Unit =
      if (!finished) { finished = true; done.completeExceptionally(t) }
    override def onComplete(): Unit =
      if (!finished) { finished = true; done.complete((buf.toByteArray, false)) }
    override def getBody: java.util.concurrent.CompletionStage[(Array[Byte], Boolean)] = done
  }

  /** Body handler enforcing the cap (`<= 0` ⇒ unbounded passthrough). */
  private def boundedBody(cap: Long)
      : java.net.http.HttpResponse.BodyHandler[(Array[Byte], Boolean)] =
    (_: java.net.http.HttpResponse.ResponseInfo) =>
      if (cap <= 0)
        java.net.http.HttpResponse.BodySubscribers.mapping(
          java.net.http.HttpResponse.BodySubscribers.ofByteArray(),
          (b: Array[Byte]) => (b, false))
      else new BoundedBody(cap)

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

  /** Transparent gzip/deflate decode (the reference's reqwest 0.9 client
   * decompresses gzip by DEFAULT — a JDK HttpClient does not, and a live
   * server answering `Content-Encoding: gzip` would otherwise hand the
   * extractor compressed bytes where the reference gets HTML). The cap
   * applies to DECOMPRESSED output as well — the network-side cap alone is
   * no defense against a zip bomb (a few KiB can inflate to GiB). A stream
   * that dies mid-decode (corrupt, or compressed bytes cut by the network
   * cap) keeps whatever decoded cleanly and marks it truncated; a stream
   * yielding nothing at all is the reference's read-failure arm
   * (InvalidPage, downloader.rs:33-37). Unknown encodings pass through
   * untouched, like reqwest. */
  private def decodeBody(enc: String, body: Array[Byte],
      cap: Long): Either[String, (Array[Byte], Boolean)] = {
    if (enc != "gzip" && enc != "x-gzip" && enc != "deflate")
      return Right((body, false))
    // misconfigured servers send 'Content-Encoding: gzip' with a zero-byte
    // 200 body — an empty page, not a read failure (browsers agree)
    if (body.isEmpty) return Right((body, false))
    val lim = if (cap <= 0) Long.MaxValue else cap
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var in: java.io.InputStream = null
    try {
      // constructed inside the try: GZIPInputStream reads (and may reject)
      // the stream header right here. 'deflate' in the wild is either zlib
      // (RFC-correct) or raw deflate (legacy IIS and friends) — sniff the
      // zlib CMF byte (low nibble 8 = deflate method) and fall back to a
      // raw Inflater when absent, like browsers do.
      in =
        if (enc == "deflate") {
          val zlibHeader = (body(0) & 0x0f) == 8 &&
            ((((body(0) & 0xff) << 8) | (body(1) & 0xff)) % 31 == 0)
          new java.util.zip.InflaterInputStream(
            new java.io.ByteArrayInputStream(body),
            new java.util.zip.Inflater(!zlibHeader))
        } else new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(body))
      var truncated = false
      var n = in.read(buf)
      while (n >= 0 && !truncated) {
        val take = math.min(n.toLong, lim - out.size()).toInt
        out.write(buf, 0, take)
        if (out.size() >= lim && (take < n || in.read() != -1)) truncated = true
        else n = in.read(buf)
      }
      Right((out.toByteArray, truncated))
    } catch {
      case _: java.io.IOException =>
        if (out.size() > 0) Right((out.toByteArray, true))
        else Left("InvalidPage")
    } finally if (in != null) in.close() // frees the native zlib inflater NOW, not at GC
  }

  /** Drop an incomplete trailing UTF-8 sequence from a TRUNCATED body: the
   * cap cuts at an arbitrary byte, and the strict downstream decoder
   * (UrlCanon.decodeUtf8, REPORT mode) would otherwise reject the whole
   * page over the last character — turning the documented Ok/Truncated
   * outcome into Err for any non-ASCII page. At most 3 bytes leave; binary
   * (non-UTF-8) content loses nothing it could have used. */
  private def trimPartialUtf8Tail(b: Array[Byte]): Array[Byte] = {
    var i = b.length - 1
    var cont = 0
    while (i >= 0 && cont < 3 && (b(i) & 0xc0) == 0x80) { cont += 1; i -= 1 }
    if (i < 0) return b
    val lead = b(i) & 0xff
    val need = // continuation bytes the lead byte promises
      if (lead >= 0xf0) 3 else if (lead >= 0xe0) 2 else if (lead >= 0xc0) 1 else 0
    if (need > cont) java.util.Arrays.copyOfRange(b, 0, i) // incomplete: drop it
    else b
  }

  private def statusResult(url: String, status: Int, encoding: String,
      body: (Array[Byte], Boolean), cap: Long): FetchResult =
    if (status >= 200 && status < 300)
      decodeBody(encoding, body._1, cap) match {
        case Right((bytes, hitCap)) =>
          val truncated = hitCap || body._2
          FetchResult(url, status,
            if (truncated) trimPartialUtf8Tail(bytes) else bytes,
            Outcome.Ok, if (truncated) "Truncated" else "")
        case Left(kind) =>
          FetchResult(url, status, Array.emptyByteArray, Outcome.Err, kind)
      }
    else
      FetchResult(url, status, Array.emptyByteArray, Outcome.Err, "InvalidPage")

  private def encodingOf(resp: java.net.http.HttpResponse[_]): String =
    resp.headers.firstValue("Content-Encoding").orElse("")
      .trim.toLowerCase(java.util.Locale.ROOT)

  /** GET one URL, mapping failures to the reference's outcome semantics.
   * Pure I/O + mapping — no Spark — so the error table is unit-testable. */
  def fetchOne(client: java.net.http.HttpClient, url: String,
      requestTimeoutMs: Int,
      maxBodyBytes: Long = DefaultMaxBodyBytes): FetchResult =
    try {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(requestTimeoutMs.toLong))
        .header("Accept-Encoding", "gzip") // reqwest 0.9 advertises gzip only; deflate still DECODES if a server volunteers it
        .GET().build()
      val resp = client.send(req, boundedBody(maxBodyBytes))
      statusResult(url, resp.statusCode(), encodingOf(resp), resp.body(), maxBodyBytes)
    } catch { case e: Throwable => failureResult(url, e) }

  /** Async GET whose future ALWAYS completes normally with a FetchResult
   * (transport failures and malformed URLs land in the same outcome table
   * as fetchOne — bitwise-identical results, FetcherSpec-pinned). */
  def sendOne(client: java.net.http.HttpClient, url: String,
      requestTimeoutMs: Int,
      maxBodyBytes: Long = DefaultMaxBodyBytes): CompletableFuture[FetchResult] =
    try {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(requestTimeoutMs.toLong))
        .header("Accept-Encoding", "gzip") // reqwest 0.9 advertises gzip only; deflate still DECODES if a server volunteers it
        .GET().build()
      client.sendAsync(req, boundedBody(maxBodyBytes))
        .handle[FetchResult] { (resp, err) =>
          if (err != null) failureResult(url, err)
          else statusResult(url, resp.statusCode(), encodingOf(resp),
            resp.body(), maxBodyBytes)
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
      window: Int, maxBodyBytes: Long = DefaultMaxBodyBytes): Iterator[(A, FetchResult)] = {
    val w = math.max(1, window)
    val inFlight = new java.util.ArrayDeque[(A, CompletableFuture[FetchResult])](w)
    new Iterator[(A, FetchResult)] {
      private def refill(): Unit =
        while (inFlight.size < w && items.hasNext) {
          val a = items.next()
          inFlight.addLast((a, sendOne(client, urlOf(a), requestTimeoutMs, maxBodyBytes)))
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
