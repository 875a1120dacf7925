package graft.sources

import java.time.LocalDate
import graft.SparkSuite
import BarTransport.{Config, RetryableFailure}

/** The REAL remote path of the transport seam: an actual HTTP client
  * (java.net.http) against an in-process HTTP server, with the
  * reference API's failure modes injected — rate-limit replies with
  * Retry-After, auth rejection, pagination, malformed and
  * out-of-order pages.  The headline test drives the full DSv2 scan
  * over the HTTP transport and asserts bit-identical rows to the
  * generator transport — the seam's promise that swapping the remote
  * changes zero connector mechanics. */
class BarHttpTransportSpec extends SparkSuite {

  private val d0 = LocalDate.parse("2024-01-01")

  /** In-process bar server: serves BarGen pages at /bars with numeric
    * page tokens; optionally requires an auth header; optionally
    * rate-limits the first `flakyPer` hits of each (symbol, token). */
  private def startServer(requireKey: Option[String] = None,
      flakyPer: Int = 0): (com.sun.net.httpserver.HttpServer, String) = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    server.createContext("/bars", (ex: com.sun.net.httpserver.HttpExchange) => {
      def respond(status: Int, body: String,
          headers: Map[String, String] = Map.empty): Unit = {
        headers.foreach { case (k, v) =>
          ex.getResponseHeaders.set(k, v)
        }
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
      try {
        val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
          .split("&").filter(_.nonEmpty).map { kv =>
            val Array(k, v) = kv.split("=", 2)
            k -> java.net.URLDecoder.decode(v, "UTF-8")
          }.toMap
        val authOk = requireKey.forall(k =>
          Option(ex.getRequestHeaders.getFirst("authKeyId")).contains(k))
        if (!authOk) respond(401, """{"error":"unauthorized"}""")
        else {
          val sym = q("symbol")
          val start = LocalDate.parse(q("start"))
          val end = LocalDate.parse(q("end"))
          val limit = q.get("limit").map(_.toInt).getOrElse(365)
          val from = q.get("page_token").map(_.toLong).getOrElse(0L)
          val key = s"$sym|$from"
          val n = hits.merge(key, 1, (a, b) => a + b)
          if (n <= flakyPer)
            respond(429, """{"error":"rate limited"}""",
              Map("Retry-After" -> "0"))
          else {
            val total = math.max(0L, end.toEpochDay - start.toEpochDay + 1L)
            val until = math.min(total, from + math.max(1, limit))
            val bars = (from until until).map { i =>
              val day = start.plusDays(i)
              val b = BarGen.bar(sym, day)
              s"""{"t":"$day","o":${b.open},"h":${b.high},""" +
                s""""l":${b.low},"c":${b.close},"v":${b.volume}}"""
            }.mkString("[", ",", "]")
            val next =
              if (until < total) s""""$until"""" else "null"
            respond(200,
              s"""{"bars":$bars,"next_page_token":$next}""")
          }
        }
      } catch {
        case e: Throwable => respond(500, s"""{"error":"${e.getMessage}"}""")
      }
    })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}")
  }

  test("DSv2 scan over HTTP equals the generator transport exactly — " +
      "through pagination, 429s and retry") {
    val (server, base) = startServer(requireKey = Some("test-key"),
      flakyPer = 1) // every page 429s once before succeeding
    try {
      def scan(transport: String) = {
        val r = spark.read.format("graft.sources.BarDataSource")
          .option("symbols", "AAPL,MSFT")
          .option("start", "2024-01-01").option("end", "2024-01-20")
          .option("pageSizeDays", "7") // forces a 3-page loop
          .option("transport", transport)
        (if (transport == "http")
          r.option("endpoint", base).option("authKeyId", "test-key")
            .option("retryBaseMillis", "1")
        else r)
          .load().collect().map(_.toSeq).sortBy(_.toString)
      }
      val viaHttp = scan("http")
      val viaGen = scan("generator")
      assert(viaHttp.length == 40) // 2 symbols x 20 days
      assert(viaHttp.toSeq == viaGen.toSeq)
    } finally server.stop(0)
  }

  test("micro-batch streaming over HTTP drains the range exactly — " +
      "stream ≡ batch through a flaky remote") {
    // The T1-T8 streaming path over the REAL remote: bounded
    // micro-batches, each page fetched over HTTP with injected 429s,
    // must drain the full range with no skips and no duplicates.
    import org.apache.spark.sql.streaming.Trigger
    val (server, base) = startServer(flakyPer = 1)
    try {
      val df = spark.readStream.format("graft.sources.BarDataSource")
        .option("symbols", "AAPL,MSFT")
        .option("start", "2024-01-01").option("end", "2024-01-10")
        .option("maxDaysPerBatch", "3")
        .option("pageSizeDays", "2")
        .option("transport", "http").option("endpoint", base)
        .option("retryBaseMillis", "1")
        .load()
      val q = df.writeStream.format("memory").queryName("bars_http_stream")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val streamed = spark.table("bars_http_stream").collect()
        .map(_.toSeq).sortBy(_.toString).toSeq
      val batch = spark.read.format("graft.sources.BarDataSource")
        .option("symbols", "AAPL,MSFT")
        .option("start", "2024-01-01").option("end", "2024-01-10")
        .load().collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(streamed == batch)
      assert(streamed.length == 20)
    } finally server.stop(0)
  }

  test("auth rejection fails fast — no retry burn, no partial rows") {
    val (server, base) = startServer(requireKey = Some("right-key"))
    try {
      val t = new BarTransport.Http(Config(
        credentials = Map("authKeyId" -> "wrong-key"), endpoint = base))
      val e = intercept[IllegalArgumentException] {
        t.fetchPage("AAPL", d0, d0.plusDays(3), "Day", None)
      }
      assert(e.getMessage.contains("401") &&
        e.getMessage.contains("non-retryable"))
      // and the secret never rides in the URL the error carries
      assert(!e.getMessage.contains("wrong-key"))
    } finally server.stop(0)
  }

  test("429 maps to RetryableFailure with the Retry-After floor") {
    val (server, base) = startServer(flakyPer = Int.MaxValue)
    try {
      val t = new BarTransport.Http(Config(endpoint = base))
      val e = intercept[RetryableFailure] {
        t.fetchPage("AAPL", d0, d0.plusDays(3), "Day", None)
      }
      assert(e.retryAfterMillis == 0L) // server sent Retry-After: 0
    } finally server.stop(0)
  }

  test("a dead endpoint is a retryable IO failure, not a crash") {
    // connect to a port nothing listens on
    val t = new BarTransport.Http(Config(endpoint = "http://127.0.0.1:1"))
    intercept[RetryableFailure] {
      t.fetchPage("AAPL", d0, d0, "Day", None)
    }
  }

  test("page parsing enforces the contract: schema, order, token") {
    def page(body: String) = BarTransport.Http.parsePage(body, "test://u")
    // well-formed page with a next token
    val p = page("""{"bars":[{"t":"2024-01-01","o":1.0,"h":2.0,"l":0.5,
      "c":1.5,"v":100},{"t":"2024-01-02","o":1.0,"h":2.0,"l":0.5,
      "c":1.5,"v":100}],"next_page_token":"2"}""")
    assert(p.rows.map(_._1.toString) == Seq("2024-01-01", "2024-01-02"))
    assert(p.next.contains("2"))
    // terminal page: null token -> None
    assert(page("""{"bars":[],"next_page_token":null}""").next.isEmpty)
    // out-of-order days must fail loudly
    intercept[IllegalArgumentException](page(
      """{"bars":[{"t":"2024-01-02","o":1,"h":1,"l":1,"c":1,"v":1},
        {"t":"2024-01-01","o":1,"h":1,"l":1,"c":1,"v":1}],
        "next_page_token":null}"""))
    // missing field and non-JSON both name the URL
    val miss = intercept[IllegalArgumentException](page(
      """{"bars":[{"t":"2024-01-01","o":1,"h":1,"l":1,"v":1}],
        "next_page_token":null}"""))
    assert(miss.getMessage.contains("'c'"))
    assert(intercept[IllegalArgumentException](page("<html>oops"))
      .getMessage.contains("test://u"))
  }
}
