package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.corpus.{CorpusConfig, CorpusGen}
import graft.model.Outcome
import graft.sources.HttpFetcher
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress

/**
 * Real-socket tests of the production HTTP fetch path — the re-expression of
 * the reference's mockito downloader test (worker/src/downloader.rs:54-88)
 * and of the error-kind → outcome table (worker/src/errors.rs:89-183):
 * 2xx ⇒ Ok(body), non-2xx ⇒ Err(InvalidPage), connect-refused/unreachable ⇒
 * Reject(NetworkError), malformed URL ⇒ Err(InvalidUrl).
 */
class FetcherSpec extends AnyFunSuite {

  private def withServer(routes: Map[String, (Int, String)])(f: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val (status, body) = routes.getOrElse(ex.getRequestURI.getPath, (404, "not here"))
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(status, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(server.getAddress.getPort) finally server.stop(0)
  }

  test("200 returns the body bytes untouched (downloader.rs:54-88)") {
    withServer(Map("/page" -> (200, "<html>Some Page</html>"))) { port =>
      val client = HttpFetcher.newClient(2000)
      val r = HttpFetcher.fetchOne(client, s"http://127.0.0.1:$port/page", 5000)
      assert(r.outcome == Outcome.Ok)
      assert(r.status == 200)
      assert(new String(r.body, "UTF-8") == "<html>Some Page</html>")
    }
  }

  test("404 maps to Err(InvalidPage) (errors.rs InvalidPage arm)") {
    withServer(Map.empty) { port =>
      val client = HttpFetcher.newClient(2000)
      val r = HttpFetcher.fetchOne(client, s"http://127.0.0.1:$port/missing", 5000)
      assert(r.outcome == Outcome.Err)
      assert(r.error_kind == "InvalidPage")
      assert(r.status == 404)
    }
  }

  test("connect refused maps to Reject(NetworkError) (errors.rs Network arm)") {
    // port 1 (tcpmux) is never served in this sandbox ⇒ immediate ECONNREFUSED
    val client = HttpFetcher.newClient(2000)
    val r = HttpFetcher.fetchOne(client, "http://127.0.0.1:1/x", 5000)
    assert(r.outcome == Outcome.Reject)
    assert(r.error_kind == "NetworkError")
  }

  test("malformed URL maps to Err(InvalidUrl) (errors.rs InvalidUrl arm)") {
    val client = HttpFetcher.newClient(2000)
    val r = HttpFetcher.fetchOne(client, "http://[not-a-host/", 5000)
    assert(r.outcome == Outcome.Err)
    assert(r.error_kind == "InvalidUrl")
  }

  test("robots fetch: host answers are definitive, network failures are not") {
    // ADVICE round 3: a transient robots failure must NOT enter the durable
    // cache (a cached blip would permanently erase the host's rules) — only
    // a 200 parse or an HTTP-status answer (404 ⇒ allow-all) is definitive.
    val spark = SparkSuite.spark
    import spark.implicits._
    withServer(Map(
      "/good.example/robots.txt" -> (200, "User-agent: *\nDisallow: /x\nCrawl-delay: 2")
    )) { port =>
      val rewrite = (u: String) => {
        val rest = u.stripPrefix("http://")
        if (rest.startsWith("down.example")) s"http://127.0.0.1:1/$rest" // refused
        else s"http://127.0.0.1:$port/$rest"
      }
      val rows = graft.operators.FrontierStep.fetchRobotsRules(
          Seq("good.example", "missing.example", "down.example").toDS(),
          rewrite, 2000, 5000)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getSeq[String](1), r.getInt(2), r.getBoolean(3))))
        .toMap
      assert(rows("good.example") == ((Seq("/x"), 2, true)))    // 200: cached
      assert(rows("missing.example") == ((Nil, 0, true)))       // 404: allow-all, cached
      assert(rows("down.example") == ((Nil, 0, false)))         // blip: allow-all THIS GEN ONLY
    }
  }

  test("windowed fetch == sequential fetch, row for row, across the error table") {
    // the async pipelined path must be OBSERVATIONALLY identical to the
    // sequential one: same results in the same (submission) order, same
    // outcome mapping for ok / 404 / connect-refused / malformed URLs
    withServer(Map(
      "/a" -> (200, "<html>A</html>"),
      "/b" -> (200, "<html>B page</html>"),
      "/slow" -> (200, "finally")
    )) { port =>
      val client = HttpFetcher.newClient(2000)
      val urls = Seq(
        s"http://127.0.0.1:$port/a",
        s"http://127.0.0.1:$port/missing", // 404
        "http://127.0.0.1:1/x",            // refused
        s"http://127.0.0.1:$port/b",
        "http://[not-a-host/",             // malformed
        s"http://127.0.0.1:$port/slow")
      val sequential = urls.map(HttpFetcher.fetchOne(client, _, 5000))
      for (window <- Seq(1, 3, 64)) {
        val windowed = HttpFetcher
          .fetchWindowed(client, urls.iterator, identity[String], 5000, window)
          .toVector
        assert(windowed.map(_._1) == urls, s"order broke at window=$window")
        windowed.map(_._2).zip(sequential).foreach { case (w, s) =>
          assert(w.url == s.url && w.status == s.status &&
            w.outcome == s.outcome && w.error_kind == s.error_kind &&
            java.util.Arrays.equals(w.body, s.body),
            s"result diverged at window=$window for ${s.url}")
        }
      }
    }
  }

  test("windowed fetch actually overlaps requests (pipelining, not batching)") {
    // 8 requests against a server that sleeps 150 ms each, window 8: the
    // wall must be well under the 1.2 s a sequential drain would take. The
    // server handles requests on its own pool, so the only serialization
    // left would be the client's.
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      Thread.sleep(150)
      val bytes = "ok".getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try {
      val port = server.getAddress.getPort
      val client = HttpFetcher.newClient(2000)
      val urls = (0 until 8).map(i => s"http://127.0.0.1:$port/p$i")
      // warm the connection pool + JIT outside the timed window
      HttpFetcher.fetchOne(client, urls.head, 5000)
      val t0 = System.nanoTime()
      val rs = HttpFetcher
        .fetchWindowed(client, urls.iterator, identity[String], 5000, 8).toVector
      val wallMs = (System.nanoTime() - t0) / 1e6
      assert(rs.forall(_._2.outcome == Outcome.Ok))
      assert(wallMs < 900, f"8×150 ms with window=8 took $wallMs%.0f ms — not pipelined")
    } finally server.stop(0)
  }

  test("bodies over the cap truncate at the cap with error_kind=Truncated") {
    // the bounded-bodies contract (HttpFetcher class doc): a 2xx body larger
    // than maxBodyBytes yields Ok with EXACTLY the first cap bytes and the
    // Truncated marker; a body of exactly cap bytes is NOT marked; cap <= 0
    // is unbounded (the reference's read_to_end behavior, downloader.rs:30-37)
    val big = ("x" * 1000) + "TAIL" // 1004 bytes
    withServer(Map("/big" -> (200, big), "/fit" -> (200, "x" * 100))) { port =>
      val client = HttpFetcher.newClient(2000)
      val url = s"http://127.0.0.1:$port/big"

      val truncated = HttpFetcher.fetchOne(client, url, 5000, maxBodyBytes = 1000)
      assert(truncated.outcome == Outcome.Ok)
      assert(truncated.error_kind == "Truncated")
      assert(truncated.body.length == 1000)
      assert(new String(truncated.body, "UTF-8") == "x" * 1000)

      val exact = HttpFetcher.fetchOne(client,
        s"http://127.0.0.1:$port/fit", 5000, maxBodyBytes = 100)
      assert(exact.outcome == Outcome.Ok && exact.error_kind == "",
        "an exactly-cap-sized body must not be marked truncated")
      assert(exact.body.length == 100)

      val unbounded = HttpFetcher.fetchOne(client, url, 5000, maxBodyBytes = 0)
      assert(unbounded.outcome == Outcome.Ok && unbounded.error_kind == "")
      assert(new String(unbounded.body, "UTF-8") == big)

      // the async windowed path enforces the identical cap semantics
      val windowed = HttpFetcher.fetchWindowed(client,
        Iterator(url, url), identity[String], 5000, 2, maxBodyBytes = 1000).toVector
      windowed.foreach { case (_, r) =>
        assert(r.outcome == Outcome.Ok && r.error_kind == "Truncated")
        assert(r.body.length == 1000)
      }
    }
  }

  test("gzip responses decode transparently; bombs cap at decompressed size; corrupt streams fail") {
    // reqwest 0.9 (the reference's client) gzips by default on both sides of
    // the wire; and the body cap must bound the DECOMPRESSED size, or a
    // few-KiB zip bomb defeats the whole bounded-bodies contract
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val page = "<html><a href=\"/z\">zipped</a></html>"
    val bomb = gz(("x" * 4_000_000).getBytes("UTF-8")) // ~4 MB -> few KB
    val routes = Map[String, (Int, Array[Byte], String)](
      "/gz" -> (200, gz(page.getBytes("UTF-8")), "gzip"),
      "/bomb" -> (200, bomb, "gzip"),
      "/corrupt" -> (200, "not gzip at all".getBytes("UTF-8"), "gzip"),
      "/plain" -> (200, page.getBytes("UTF-8"), ""))
    val server = com.sun.net.httpserver.HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val (status, bytes, enc) = routes(ex.getRequestURI.getPath)
      // a well-behaved server only compresses when the client asked for it —
      // assert the Accept-Encoding advertisement actually goes out
      assert(Option(ex.getRequestHeaders.getFirst("Accept-Encoding"))
        .exists(_.contains("gzip")), "request did not advertise gzip")
      if (enc.nonEmpty) ex.getResponseHeaders.set("Content-Encoding", enc)
      ex.sendResponseHeaders(status, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val client = HttpFetcher.newClient(2000)
      def get(path: String, cap: Long = 0) =
        HttpFetcher.fetchOne(client, s"http://127.0.0.1:$port$path", 5000,
          maxBodyBytes = cap)

      val ok = get("/gz")
      assert(ok.outcome == Outcome.Ok && ok.error_kind == "")
      assert(new String(ok.body, "UTF-8") == page, "gzip body did not decode")
      assert(new String(get("/plain").body, "UTF-8") == page)

      val capped = get("/bomb", cap = 10000)
      assert(capped.outcome == Outcome.Ok && capped.error_kind == "Truncated")
      assert(capped.body.length == 10000,
        s"decompressed cap leaked: ${capped.body.length} bytes")

      val corrupt = get("/corrupt")
      assert(corrupt.outcome == Outcome.Err && corrupt.error_kind == "InvalidPage",
        s"corrupt gzip must be the read-failure arm, got $corrupt")

      // async path: identical decode semantics
      val w = HttpFetcher.fetchWindowed(client,
        Iterator(s"http://127.0.0.1:$port/gz", s"http://127.0.0.1:$port/bomb"),
        identity[String], 5000, 2, maxBodyBytes = 10000).toVector
      assert(new String(w(0)._2.body, "UTF-8") == page)
      assert(w(1)._2.error_kind == "Truncated" && w(1)._2.body.length == 10000)
    } finally server.stop(0)
  }

  test("truncation drops a cut UTF-8 sequence; deflate decodes zlib AND raw; empty gzip is empty Ok") {
    // three review-found edges of the bounded/compressed path:
    // (a) the cap cuts at an arbitrary byte — a multi-byte char split at the
    //     boundary must not turn the whole page into Err downstream (the
    //     strict decoder REPORTs); the truncated body must stay valid UTF-8
    // (b) 'deflate' in the wild is zlib OR raw deflate (legacy IIS) — both
    //     must decode
    // (c) a zero-byte 200 with Content-Encoding: gzip is an empty page,
    //     not a read failure
    def deflate(b: Array[Byte], raw: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val accented = "é" * 600 // 1200 bytes of 2-byte sequences
    val routes = Map[String, (Array[Byte], String)](
      "/utf8" -> (accented.getBytes("UTF-8"), ""),
      "/zlib" -> (deflate("<p>zlib page</p>".getBytes("UTF-8"), raw = false), "deflate"),
      "/raw" -> (deflate("<p>raw page</p>".getBytes("UTF-8"), raw = true), "deflate"),
      "/emptygz" -> (Array.emptyByteArray, "gzip"))
    val server = com.sun.net.httpserver.HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val (bytes, enc) = routes(ex.getRequestURI.getPath)
      if (enc.nonEmpty) ex.getResponseHeaders.set("Content-Encoding", enc)
      ex.sendResponseHeaders(200, if (bytes.isEmpty) -1 else bytes.length.toLong)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val client = HttpFetcher.newClient(2000)
      def get(path: String, cap: Long = 0) =
        HttpFetcher.fetchOne(client, s"http://127.0.0.1:$port$path", 5000,
          maxBodyBytes = cap)

      // cap 999 lands mid-'é' (999 = 499 chars * 2 + 1): the half sequence
      // must be dropped, the rest must decode strictly
      val cut = get("/utf8", cap = 999)
      assert(cut.outcome == Outcome.Ok && cut.error_kind == "Truncated")
      assert(cut.body.length == 998, s"partial tail kept: ${cut.body.length}")
      assert(graft.core.UrlCanon.decodeUtf8(cut.body).contains("é" * 499),
        "truncated body no longer strictly decodable")
      // an even cap cuts BETWEEN sequences: nothing extra may be dropped
      assert(get("/utf8", cap = 1000).body.length == 1000)

      assert(new String(get("/zlib").body, "UTF-8") == "<p>zlib page</p>")
      assert(new String(get("/raw").body, "UTF-8") == "<p>raw page</p>")

      val empty = get("/emptygz")
      assert(empty.outcome == Outcome.Ok && empty.error_kind == "" &&
        empty.body.isEmpty, s"empty gzip body mishandled: $empty")
    } finally server.stop(0)
  }

  test("an over-cap robots.txt parses rules from the kept prefix") {
    // robots caps at RobotsMaxBodyBytes (512 KiB, the conventional limit:
    // parse the first 500 KiB). Rules that fit inside the cap must survive;
    // the host answer stays definitive (it WAS an HTTP 200).
    val rules = "User-agent: *\nDisallow: /private\n"
    val body = rules + ("#pad\n" * (600 * 1024 / 5)) // ~600 KiB of comments
    withServer(Map("/robots.txt" -> (200, body))) { port =>
      val spark = SparkSuite.spark
      import spark.implicits._
      val df = graft.operators.FrontierStep.fetchRobotsRules(
        Seq("h0").toDS(),
        _ => s"http://127.0.0.1:$port/robots.txt", 2000, 5000)
      val row = df.collect().head
      assert(row.getSeq[String](row.fieldIndex("disallows")).toList == List("/private"))
      assert(row.getAs[Boolean]("definitive"))
    }
  }

  test("served corpus HTML round-trips exactly the generator hrefs") {
    val cfg = CorpusConfig(seed = 42L, numHosts = 12, maxPages = 24)
    for (h <- 0 until 4; p <- 0 until math.min(3, CorpusGen.pageCount(cfg, h))) {
      val html = CorpusGen.pageHtml(cfg, h, p)
      assert(graft.core.Extract.rawHrefs(html) == CorpusGen.pageHrefs(cfg, h, p),
        s"href mismatch on page ($h,$p)")
    }
  }
}
