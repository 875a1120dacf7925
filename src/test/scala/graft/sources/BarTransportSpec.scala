package graft.sources

import java.time.LocalDate
import graft.SparkSuite
import BarTransport.{Config, Page, RetryableFailure}

/** The connector's remote-transport seam: bounded retry with backoff,
  * Retry-After honoring, fail-fast on non-retryable errors, per-task
  * rate limiting, and pagination — spec-driven with fake clocks and a
  * deliberately flaky transport, then end-to-end through the real
  * DSv2 scan to prove a flaky remote still yields the exact
  * oracle-checked rows. */
class BarTransportSpec extends SparkSuite {

  private val d0 = LocalDate.parse("2024-01-01")
  private val d9 = LocalDate.parse("2024-01-10")

  /** Fails the first `failures` calls of each page retryably. */
  private class Flaky(cfg: Config, failures: Int,
      retryAfter: Long = 0L) extends BarTransport {
    private val seen = scala.collection.mutable.Map[String, Int]()
    val inner = new BarTransport.Generator(cfg)
    override def fetchPage(symbol: String, start: LocalDate, end: LocalDate,
        timeframe: String, pageToken: Option[String]): Page = {
      val key = s"$symbol|$pageToken"
      val n = seen.getOrElse(key, 0)
      if (n < failures) {
        seen(key) = n + 1
        throw new RetryableFailure(s"simulated 429 #$n", retryAfter)
      }
      inner.fetchPage(symbol, start, end, timeframe, pageToken)
    }
  }

  test("bounded retry absorbs transient failures and backs off exponentially") {
    val cfg = Config(maxRetries = 3, retryBaseMillis = 10)
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val t = new BarTransport.Retrying(new Flaky(cfg, 2), cfg, sleeps += _)
    val page = t.fetchPage("AAPL", d0, d9, "Day", None)
    assert(page.rows.size == 10)
    assert(sleeps.toSeq == Seq(10L, 20L), "base*2^attempt backoff")
    assert(t.attempts == 3L)
    // identical content to a clean fetch
    val clean = new BarTransport.Generator(cfg)
      .fetchPage("AAPL", d0, d9, "Day", None)
    assert(page.rows == clean.rows)
  }

  test("a server Retry-After hint floors the backoff wait") {
    val cfg = Config(maxRetries = 2, retryBaseMillis = 1)
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val t = new BarTransport.Retrying(
      new Flaky(cfg, 1, retryAfter = 250L), cfg, sleeps += _)
    t.fetchPage("AAPL", d0, d9, "Day", None)
    assert(sleeps.toSeq == Seq(250L), "hint 250 > base 1 must win")
  }

  test("the retry budget is bounded; exhaustion rethrows the failure") {
    val cfg = Config(maxRetries = 2, retryBaseMillis = 1)
    val t = new BarTransport.Retrying(new Flaky(cfg, 99), cfg, _ => ())
    intercept[RetryableFailure] {
      t.fetchPage("AAPL", d0, d9, "Day", None)
    }
    assert(t.attempts == 3L, "1 try + maxRetries retries, no more")
  }

  test("non-retryable failures fail fast — no retry burn") {
    val cfg = Config(maxRetries = 5)
    val t = new BarTransport.Retrying(new BarTransport() {
      override def fetchPage(s: String, a: LocalDate, b: LocalDate,
          tf: String, tok: Option[String]): Page =
        throw new IllegalStateException("401 unauthorized")
    }, cfg, _ => ())
    intercept[IllegalStateException] {
      t.fetchPage("AAPL", d0, d9, "Day", None)
    }
    assert(t.attempts == 1L)
  }

  test("rate limiter enforces the per-task min request interval") {
    val cfg = Config(minRequestIntervalMillis = 100)
    var clock = 0L
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val t = new BarTransport.RateLimited(
      new BarTransport.Generator(cfg), cfg,
      now = () => clock,
      sleep = ms => { sleeps += ms; clock += ms * 1000000L })
    t.fetchPage("AAPL", d0, d9, "Day", None) // first: no wait
    t.fetchPage("AAPL", d0, d9, "Day", None) // immediate: must wait
    assert(sleeps.nonEmpty && sleeps.head >= 100L,
      s"second immediate request must wait ~100ms, slept: $sleeps")
    clock += 500L * 1000000L
    val before = sleeps.size
    t.fetchPage("AAPL", d0, d9, "Day", None) // interval elapsed: no wait
    assert(sleeps.size == before)
  }

  test("a flaky paginated remote still yields the exact scan rows " +
      "end-to-end") {
    // register a transport that fails twice per page AND pages every
    // 3 days; the full DSv2 read must return exactly the clean rows
    BarTransports.register("flaky-spec",
      cfg => new Flaky(cfg.copy(pageSizeDays = 3), 2))
    def scan(transport: String) = spark.read
      .format("graft.sources.BarDataSource")
      .option("symbols", "AAPL,MSFT")
      .option("start", "2024-01-01").option("end", "2024-01-10")
      .option("transport", transport)
      .option("retryBaseMillis", "1")
      .load().collect().map(_.toSeq).toSet
    assert(scan("flaky-spec") == scan("generator"))
    assert(scan("generator").size == 20)
  }

  test("config stringification never echoes credential values") {
    // ADVICE r12: the case-class toString would print the credentials
    // map verbatim into any log/exception that stringifies the config
    // (or a partition carrying it).  Redaction is structural: only the
    // key COUNT survives stringification.
    val cfg = Config(credentials =
      Map("authKeyId" -> "AKIDSECRET42", "authSecret" -> "hunter2"))
    val shown = Seq(cfg.toString, s"$cfg",
      new RuntimeException(s"failed with $cfg").getMessage)
    shown.foreach { s =>
      assert(!s.contains("AKIDSECRET42") && !s.contains("hunter2"),
        s"credential leaked into: $s")
      assert(s.contains("credentials=<2 keys>"))
    }
  }

  test("an unknown transport name fails with the registered list") {
    val e = intercept[Exception] {
      spark.read.format("graft.sources.BarDataSource")
        .option("symbols", "AAPL").option("transport", "nope")
        .load().collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("unknown bar transport")))
  }
}
