package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BarDataSourceSpec extends SparkSuite {

  private def read(start: String = "2024-01-01", end: String = "2024-01-10") =
    spark.read.format("graft.sources.BarDataSource")
      .option("symbols", "AAPL,MSFT")
      .option("start", start).option("end", end)
      .load()

  test("scan yields one bar per symbol-day with the canonical schema") {
    val df = read()
    assert(df.schema.fieldNames.toSeq == Seq("symbol", "timeframe",
      "timestamp", "open", "high", "low", "close", "volume"))
    assert(df.count() == 2 * 10)
    assert(df.select("symbol").distinct().count() == 2)
  }

  test("bars are deterministic and OHLC-consistent") {
    val a = read().collect().map(_.toSeq).sortBy(_.toString)
    val b = read().collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
    read().collect().foreach { r =>
      val (o, h, l, c) = (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(h >= math.max(o, c) && l <= math.min(o, c))
      assert(r.getLong(7) >= 1000L)
    }
  }

  test("timestamp predicates push into the source (range narrowing)") {
    import spark.implicits._
    val df = read(end = "2024-01-31")
      .filter($"timestamp" >= to_timestamp(lit("2024-01-20")))
    assert(df.count() == 2 * 12) // Jan 20..31
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-bars"))
    assert(plan.contains("2024-01-20"), s"scan range not narrowed:\n$plan")
  }

  test("sub-day timestamp predicates return exact rows (residual re-eval)") {
    import spark.implicits._
    // Narrowing is day-granular; the noon bound must still be applied
    // exactly: the 2024-01-05 00:00 bar fails `>= 05 12:00` and
    // passes `< 05 12:00`.
    val ge = read().filter($"timestamp" >= to_timestamp(lit("2024-01-05 12:00:00")))
    assert(ge.count() == 2 * 5) // Jan 6..10
    val lt = read().filter($"timestamp" < to_timestamp(lit("2024-01-05 12:00:00")))
    assert(lt.count() == 2 * 5) // Jan 1..5 (day-5 bar kept)
    val gt = read().filter($"timestamp" > to_timestamp(lit("2024-01-05 00:00:00")))
    assert(gt.count() == 2 * 5) // exact-midnight bound excludes day 5
    val between = read().filter(
      $"timestamp".between(to_timestamp(lit("2024-01-03 06:00:00")),
        to_timestamp(lit("2024-01-07 18:00:00"))))
    assert(between.count() == 2 * 4) // Jan 4..7
  }

  test("column pruning reaches the reader") {
    val df = read().select("symbol", "close")
    assert(df.columns.toSeq == Seq("symbol", "close"))
    assert(df.distinct().count() > 0)
  }

  test("streaming read drains the full range in bounded micro-batches") {
    import org.apache.spark.sql.streaming.Trigger
    val df = spark.readStream.format("graft.sources.BarDataSource")
      .option("symbols", "AAPL,MSFT")
      .option("start", "2024-01-01").option("end", "2024-01-10")
      .option("maxDaysPerBatch", "3") // 10 days → 4 batches
      .load()
    val q = df.writeStream.format("memory").queryName("bars_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("bars_stream").collect()
      .map(_.toSeq).sortBy(_.toString).toSeq
    val batch = read().collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(streamed == batch) // stream ≡ batch, no skips, no dups
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4) // rate-limited
  }

  test("generator matches the portable h60 hash") {
    // Same value as Spark SQL's CONV(SUBSTRING(MD5(x),1,15),16,10)
    val fromSql = spark.sql(
      "SELECT CAST(CONV(SUBSTRING(MD5('AAPL|2024-01-01|o'), 1, 15), 16, 10) AS BIGINT)")
      .head.getLong(0)
    assert(BarGen.h60("AAPL|2024-01-01|o") == fromSql)
  }
}
