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
                    credentials: Map[String, String] = Map.empty) {
    // The case-class toString would echo the credentials map verbatim
    // into any log line or exception that stringifies the config (or a
    // BarInputPartition carrying it) — redact it structurally so no
    // accidental stringification can leak a secret once a real
    // transport registers keys.
    override def toString: String =
      s"Config($pageSizeDays,$maxRetries,$retryBaseMillis," +
        s"$minRequestIntervalMillis,credentials=<${credentials.size} keys>)"
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

  def register(name: String,
               factory: BarTransport.Config => BarTransport): Unit =
    factories.put(name, factory)

  def create(name: String, cfg: BarTransport.Config): BarTransport =
    Option(factories.get(name)).map(_(cfg)).getOrElse(
      throw new IllegalArgumentException(
        s"unknown bar transport '$name'; registered: " +
          factories.keySet().toString))
}
