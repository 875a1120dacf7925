package graft.sources

import java.time.LocalDate

/** The remote-transport seam of the bar connector — everything a REAL
  * remote bar API needs that the in-sandbox deterministic generator
  * doesn't: credential injection, per-task rate limiting, bounded
  * retry with exponential backoff on retryable failures, and
  * pagination.  The reference's client wraps exactly this surface
  * (`api.get_bars(symbol, timeframe, start, end)` behind an
  * authenticated, rate-limited SDK, `app/alpaca_service.py:117-132`);
  * here it is isolated behind ONE interface so swapping the generator
  * for an HTTP client changes one class and zero connector mechanics
  * (partitioning, pushdown, pruning, offsets all live above the seam).
  *
  * Contract:
  *  - `fetchPage` returns one page of (day, bar) rows IN ASCENDING day
  *    order plus the next page token, `None` when exhausted;
  *  - a transient failure is signaled by throwing `RetryableFailure`
  *    (HTTP 429/5xx/timeouts in a real client) — the `withRetry`
  *    decorator absorbs up to `maxRetries` of them per page with
  *    exponential backoff; anything else propagates immediately
  *    (auth errors must fail the task, not burn the retry budget);
  *  - implementations are constructed PER TASK (the factory runs
  *    inside the executor), so they may hold non-serializable state
  *    (connections, token buckets) freely. */
trait BarTransport {
  def fetchPage(symbol: String, start: LocalDate, end: LocalDate,
                timeframe: String, pageToken: Option[String]): BarTransport.Page
}

object BarTransport {
  /** One page: rows in ascending day order + the follow-up token. */
  case class Page(rows: Seq[(LocalDate, BarGen.Bar)], next: Option[String])

  /** A transient remote failure a retry may cure (rate-limit reply,
    * 5xx, timeout).  `retryAfterMillis` models a server-provided
    * Retry-After hint: when set, backoff waits at least that long. */
  class RetryableFailure(msg: String, val retryAfterMillis: Long = 0L)
      extends RuntimeException(msg)

  /** Transport configuration carried through DSv2 options into each
    * task.  Credentials ride as an opaque map and are NEVER echoed in
    * plan descriptions or errors (see `BarScan.description`). */
  case class Config(pageSizeDays: Int = 365,
                    maxRetries: Int = 3,
                    retryBaseMillis: Long = 10L,
                    minRequestIntervalMillis: Long = 0L,
                    credentials: Map[String, String] = Map.empty,
                    endpoint: String = "") {
    // The case-class toString would echo the credentials map verbatim
    // into any log line or exception that stringifies the config (or a
    // BarInputPartition carrying it) — redact it structurally so no
    // accidental stringification can leak a secret once a real
    // transport registers keys.  The endpoint is not a secret (it
    // names the remote, like a JDBC URL) and aids diagnosis.
    override def toString: String =
      s"Config($pageSizeDays,$maxRetries,$retryBaseMillis," +
        s"$minRequestIntervalMillis,credentials=<${credentials.size} keys>," +
        s"endpoint=$endpoint)"
  }

  // ---------------------------------------------------------------
  // Default transport: the deterministic generator, paginated.
  // ---------------------------------------------------------------

  /** Generator-backed transport — the sandbox stand-in for the HTTP
    * client.  Pagination is real (`pageSizeDays` per page, opaque
    * numeric token), so the reader's page loop is exercised by every
    * oracle-checked scan, not just by specs. */
  final class Generator(cfg: Config) extends BarTransport {
    override def fetchPage(symbol: String, start: LocalDate, end: LocalDate,
        timeframe: String, pageToken: Option[String]): Page = {
      val total = math.max(0L, end.toEpochDay - start.toEpochDay + 1L)
      val from = pageToken.map(_.toLong).getOrElse(0L)
      val until = math.min(total, from + math.max(1, cfg.pageSizeDays))
      val rows = (from until until).map { i =>
        val day = start.plusDays(i)
        day -> BarGen.bar(symbol, day)
      }
      Page(rows, if (until < total) Some(until.toString) else None)
    }
  }

  // ---------------------------------------------------------------
  // HTTP transport: a REAL remote client over the same seam.
  // ---------------------------------------------------------------

  /** HTTP/JSON bar transport — the second `BarTransport`
    * implementation, proving the seam's contract holds for a remote
    * with real latency, failures and pagination (the reference's
    * client is exactly this shape behind an SDK,
    * `/root/reference/app/alpaca_service.py:117-132`).
    *
    * Protocol (one GET per page):
    *   `{endpoint}/bars?symbol=S&timeframe=T&start=YYYY-MM-DD&`
    *   `end=YYYY-MM-DD&limit=N[&page_token=TOK]`
    * with every credential entry sent as a request HEADER (the
    * Alpaca/Polygon convention — never in the URL, so tokens cannot
    * leak into server access logs or error messages carrying the
    * URI).  Expected 200 body:
    *   `{"bars": [{"t": "YYYY-MM-DD", "o":…, "h":…, "l":…, "c":…,
    *     "v":…}, …], "next_page_token": "…" | null}`
    * with bars in ascending day order (validated — an out-of-order
    * page is a server bug that must fail the task loudly, not corrupt
    * downstream watermark logic).
    *
    * Failure mapping (the seam's contract):
    *  - 429 / 5xx → `RetryableFailure`, honoring a `Retry-After`
    *    seconds header as the backoff floor;
    *  - IO errors / timeouts → `RetryableFailure` (transient network);
    *  - any other non-200 (401/403/404…) → fail FAST — auth or
    *    protocol errors must surface, not burn the retry budget.
    *
    * Constructed per task like every transport (the factory runs
    * inside the executor), so the HttpClient and its connection pool
    * are task-local — no shared mutable state across partitions. */
  final class Http(cfg: Config,
      client: java.net.http.HttpClient = Http.defaultClient)
      extends BarTransport {
    require(cfg.endpoint.nonEmpty,
      "http transport requires the 'endpoint' option (base URL)")

    override def fetchPage(symbol: String, start: LocalDate, end: LocalDate,
        timeframe: String, pageToken: Option[String]): Page = {
      import java.net.http.{HttpRequest, HttpResponse}
      def enc(s: String): String =
        java.net.URLEncoder.encode(s, "UTF-8")
      val url = s"${cfg.endpoint.stripSuffix("/")}/bars?symbol=${enc(symbol)}" +
        s"&timeframe=${enc(timeframe)}&start=$start&end=$end" +
        s"&limit=${math.max(1, cfg.pageSizeDays)}" +
        pageToken.fold("")(t => s"&page_token=${enc(t)}")
      val b = HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(Http.RequestTimeoutMillis))
        .GET()
      cfg.credentials.foreach { case (k, v) => b.header(k, v) }
      val resp =
        try client.send(b.build(), HttpResponse.BodyHandlers.ofString())
        catch {
          case e: java.io.IOException =>
            throw new RetryableFailure(s"io failure fetching $url: " +
              s"${e.getClass.getSimpleName}")
        }
      resp.statusCode() match {
        case 200 => Http.parsePage(resp.body(), url)
        case s if s == 429 || s >= 500 =>
          // RFC 7231 allows delta-seconds OR an HTTP-date; anything
          // unparseable degrades to the default backoff — a malformed
          // header must not turn a retryable response into a crash
          val retryAfter = resp.headers().firstValue("Retry-After")
            .map[Long](v => scala.util.Try(v.trim.toLong * 1000L)
              .getOrElse(0L))
            .orElse(0L)
          throw new RetryableFailure(s"HTTP $s from $url", retryAfter)
        case s =>
          // 4xx other than 429: auth/protocol — fail the task now
          throw new IllegalArgumentException(
            s"HTTP $s from $url (non-retryable)")
      }
    }
  }

  object Http {
    val RequestTimeoutMillis = 30000L

    private[sources] lazy val defaultClient: java.net.http.HttpClient =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(5000))
        .build()

    /** Parse one page body.  Jackson (shipped with Spark) for the
      * tree walk; strict field checks so a drifted server schema
      * fails loudly with the URL, never as silent zeros. */
    private[sources] def parsePage(body: String, url: String): Page = {
      val root =
        try new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
        catch {
          case e: com.fasterxml.jackson.core.JacksonException =>
            throw new IllegalArgumentException(
              s"unparseable JSON from $url: ${e.getMessage}")
        }
      val barsNode = root.get("bars")
      require(barsNode != null && barsNode.isArray,
        s"response from $url lacks a 'bars' array")
      import scala.jdk.CollectionConverters._
      val rows = barsNode.elements().asScala.map { n =>
        def f(k: String): com.fasterxml.jackson.databind.JsonNode = {
          val v = n.get(k)
          require(v != null, s"bar from $url lacks field '$k'")
          // Jackson's asDouble/asLong return 0 for object/array/bool
          // nodes — exactly the silent zeros this parser documents
          // itself as refusing to emit
          require(k == "t" || v.isNumber,
            s"bar field '$k' from $url is not numeric (${v.getNodeType})")
          v
        }
        val day = LocalDate.parse(f("t").asText())
        day -> BarGen.Bar(f("o").asDouble(), f("h").asDouble(),
          f("l").asDouble(), f("c").asDouble(), f("v").asLong())
      }.toSeq
      rows.sliding(2).foreach {
        case Seq((a, _), (b, _)) =>
          require(a.isBefore(b),
            s"server returned out-of-order days $a >= $b from $url")
        case _ => ()
      }
      val nextNode = root.get("next_page_token")
      val next =
        if (nextNode == null || nextNode.isNull) None
        else Some(nextNode.asText())
      Page(rows, next)
    }
  }

  /** Bounded-retry decorator: absorbs up to `maxRetries` consecutive
    * `RetryableFailure`s per page with capped exponential backoff
    * (base·2^attempt, floored at the server's Retry-After hint), then
    * rethrows.  Non-retryable throwables pass straight through. */
  final class Retrying(inner: BarTransport, cfg: Config,
      sleep: Long => Unit = Thread.sleep) extends BarTransport {
    @volatile var attempts: Long = 0L // observability: total tries
    override def fetchPage(symbol: String, start: LocalDate, end: LocalDate,
        timeframe: String, pageToken: Option[String]): Page = {
      var attempt = 0
      while (true) {
        attempts += 1
        try return inner.fetchPage(symbol, start, end, timeframe, pageToken)
        catch {
          case e: RetryableFailure =>
            if (attempt >= cfg.maxRetries) throw e
            val backoff = cfg.retryBaseMillis << attempt
            sleep(math.max(backoff, e.retryAfterMillis))
            attempt += 1
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** Per-task min-interval rate limiter: a request fires no sooner
    * than `minRequestIntervalMillis` after the previous one from this
    * task — the client-side half of staying under a remote quota
    * (the server-side half is honoring Retry-After, above).  Per-task
    * state is exactly the right scope: N symbol partitions each hold
    * an independent budget, matching per-connection API quotas. */
  final class RateLimited(inner: BarTransport, cfg: Config,
      now: () => Long = System.nanoTime,
      sleep: Long => Unit = Thread.sleep) extends BarTransport {
    private var lastAt = Long.MinValue
    override def fetchPage(symbol: String, start: LocalDate, end: LocalDate,
        timeframe: String, pageToken: Option[String]): Page = {
      val minNanos = cfg.minRequestIntervalMillis * 1000000L
      if (minNanos > 0 && lastAt != Long.MinValue) {
        val wait = lastAt + minNanos - now()
        if (wait > 0) sleep(wait / 1000000L + 1)
      }
      lastAt = now()
      inner.fetchPage(symbol, start, end, timeframe, pageToken)
    }
  }

  /** Build the task-side transport stack for a named base transport:
    * base → rate limiter → retry (retry OUTSIDE the limiter, so a
    * retried request pays the interval again — a retry storm cannot
    * exceed the quota). */
  def stacked(name: String, cfg: Config): BarTransport = {
    val base = BarTransports.create(name, cfg)
    new Retrying(new RateLimited(base, cfg), cfg)
  }
}

/** Registry of transport factories keyed by the `transport` DSv2
  * option.  "generator" is built in; specs (and an embedding
  * application shipping a real HTTP client) register factories at
  * session start.  Local-mode tasks share the driver JVM so spec
  * registration is visible to readers; a cluster deployment registers
  * from an executor plugin or simply links its factory here. */
object BarTransports {
  private val factories =
    new java.util.concurrent.ConcurrentHashMap[
      String, BarTransport.Config => BarTransport]()
  register("generator", cfg => new BarTransport.Generator(cfg))
  register("http", cfg => new BarTransport.Http(cfg))

  def register(name: String,
               factory: BarTransport.Config => BarTransport): Unit =
    factories.put(name, factory)

  def create(name: String, cfg: BarTransport.Config): BarTransport =
    Option(factories.get(name)).map(_(cfg)).getOrElse(
      throw new IllegalArgumentException(
        s"unknown bar transport '$name'; registered: " +
          factories.keySet().toString))
}
