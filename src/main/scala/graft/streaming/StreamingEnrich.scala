package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming as-of enrichment — the stream-stream join counterpart of
  * the batch `Temporal.asofEventBars`: each event row joins the bars
  * of its symbol published within `lookback` BEFORE it (a watermarked
  * time-interval join, so both sides' state is bounded by
  * watermark + lookback), the per-event as-of bar is the latest
  * joined bar, and finalized (window, symbol, bar) rollups emit in
  * append mode.
  *
  * Semantics vs batch as-of: the interval join bounds the lookback —
  * an event whose nearest bar is OLDER than `lookback` is DROPPED
  * (inner join, no match), where the unbounded batch operator would
  * still find it.  That bound is what makes streaming state finite (a
  * bar retires from join state once the event-side watermark passes
  * bar_ts + lookback), and it is the honest contract: pipelines
  * needing unbounded as-of run the batch operator over the settled
  * corpus — the same stream-then-batch rule as `StreamingNearDedup`.
  * `batchEnrich` below is the bounded-lookback batch mirror the spec
  * pins stream ≡ batch against.
  *
  * Events must carry a unique `event_id`: the per-event bar election
  * is a grouped aggregation, and without an id two identical events
  * would collapse into one.  (The fixture synthesizes monotonic ids;
  * real feeds have message ids.)
  *
  * Chain shape: time-interval join → per-event aggregation (elect the
  * latest bar) → rollup aggregation — a supported multi-stateful
  * chain; only the window struct carries event time downstream of the
  * first aggregation (two event-time columns are rejected at
  * runtime). */
object StreamingEnrich {

  private def perEventBar(joined: DataFrame, windowDur: String): DataFrame =
    joined
      .groupBy(window(col("e.ts"), windowDur), col("e.symbol"),
        col("e.event_id"))
      .agg(max(col("e.value")).as("value"),
        max(col("b.bar_ts")).as("bar_ts"),
        max_by(col("b.bar_close"), col("b.bar_ts")).as("bar_close"))
      .groupBy(col("window"), col("symbol"), col("bar_ts"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        round(max(col("bar_close")), 4).as("bar_close"))
      .select(col("window.start").as("window_start"), col("symbol"),
        col("bar_ts"), col("n_events"), col("sum_value"), col("bar_close"))

  private def intervalCond(lookback: String) =
    expr(s"""e.symbol = b.symbol AND
             b.bar_ts <= e.ts AND
             b.bar_ts >= e.ts - INTERVAL $lookback""")

  /** events(event_id, symbol, ts, value) ⋈ bars(symbol, bar_ts,
    * bar_close) → (window_start, symbol, bar_ts, n_events, sum_value,
    * bar_close), finalized per event-time window. */
  def eventBars(events: DataFrame, bars: DataFrame,
                watermark: String = "30 days", lookback: String = "1 day",
                windowDur: String = "1 hour"): DataFrame = {
    val e = events.withWatermark("ts", watermark).alias("e")
    val b = bars.withWatermark("bar_ts", watermark).alias("b")
    perEventBar(e.join(b, intervalCond(lookback)), windowDur)
  }

  /** Bounded-lookback batch mirror: per event, the latest bar of its
    * symbol within [ts − lookback, ts]; events with none are dropped —
    * exactly the streaming contract, over a bounded feed. */
  def batchEnrich(events: DataFrame, bars: DataFrame,
                  lookback: String = "1 day",
                  windowDur: String = "1 hour"): DataFrame =
    perEventBar(
      events.alias("e").join(bars.alias("b"), intervalCond(lookback)),
      windowDur)
}
