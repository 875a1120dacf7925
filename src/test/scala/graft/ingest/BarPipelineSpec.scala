package graft.ingest

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSuite

class BarPipelineSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val ticks = Seq(
    // one day, one symbol: open=first-by-time, close=last-by-time
    (1L, ts("2024-01-02 09:30:00"), 1L, "SPY", 100.0, "{}"),
    (2L, ts("2024-01-02 12:00:00"), 1L, "SPY", 110.0, "{}"),
    (3L, ts("2024-01-02 16:00:00"), 1L, "SPY", 90.0, "{}"),
    (4L, ts("2024-01-03 09:30:00"), 1L, "SPY", 95.0, "{}"),
    (5L, ts("2024-01-02 10:00:00"), 1L, "QQQ", 50.0, "{}"))
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("barsFromTicks: OHLCV with time-ordered open/close (T5/A1)") {
    val bars = BarPipeline.barsFromTicks(ticks, "Day")
      .filter($"symbol" === "SPY" && $"t" === ts("2024-01-02 00:00:00"))
      .collect()
    assert(bars.length === 1)
    val b = bars.head
    assert(b.getAs[Double]("o") === 100.0) // 09:30 tick, not row order
    assert(b.getAs[Double]("h") === 110.0)
    assert(b.getAs[Double]("l") === 90.0)
    assert(b.getAs[Double]("c") === 90.0)  // 16:00 tick
    assert(b.getAs[Long]("v") === 3L)
  }

  test("provider filter keeps only the requested provider (P8)") {
    val cat = BarPipeline.assetCatalog(spark, sf())
    assert(BarPipeline.filterByProvider(cat, "alpaca").count() == cat.count())
    assert(BarPipeline.filterByProvider(cat, "other").count() == 0)
  }

  test("server timestamp lands at the sink boundary (F7)") {
    val bars = BarPipeline.canonicalBars(spark, sf()).limit(3)
    val stamped = Canonicalize.withServerTimestamp(bars)
    assert(stamped.columns.contains("updated_at"))
    val ts = stamped.collect().map(_.getAs[java.sql.Timestamp]("updated_at"))
    val now = System.currentTimeMillis()
    assert(ts.forall(t => math.abs(t.getTime - now) < 600000L))
  }

  test("null-symbol ticks are skipped (P5)") {
    val withNull = ticks.union(
      Seq((9L, ts("2024-01-02 11:00:00"), 1L,
        null.asInstanceOf[String], 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val n = BarPipeline.barsFromTicks(withNull, "Day")
      .filter($"symbol".isNull).count()
    assert(n === 0)
  }

  test("summary event JSON carries the A5 payload fields (S5/F6)") {
    val bars = Canonicalize.canonicalize(
      BarPipeline.barsFromTicks(ticks, "Day"), "Day").get
    val msg = BarPipeline.summaryEventJson(BarPipeline.ingestSummaries(bars))
      .filter(get_json_object($"message", "$.asset_symbol") === "SPY")
      .collect().head
    assert(msg.getAs[String]("event_type") === "HistoricalDataUpdated")
    val json = msg.getAs[String]("message")
    assert(json.contains(""""start_timestamp_utc":"2024-01-02T00:00:00Z""""))
    assert(json.contains(""""bars_count":2"""))
  }

  test("run status aggregates (A2/A4)") {
    val bars = Canonicalize.canonicalize(
      BarPipeline.barsFromTicks(ticks, "Day"), "Day").get
    val st = BarPipeline.runStatus(bars).collect().head
    assert(st.getAs[Long]("assets_processed_count") === 2L)
    assert(st.getAs[Long]("total_bars_saved_in_last_run") === 3L)
    assert(!st.getAs[Boolean]("run_had_errors"))
  }
}
