package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization: the same `session_window` aggregation as
  * the batch operator (`ops.Temporal.sessionWindows`), run against an
  * unbounded event stream with a watermark.
  *
  * Native session windows are Spark's merging-window state machine:
  * per (key, open session) state, sessions extended by any event
  * within the gap, merged when a bridging event arrives, EMITTED (in
  * append mode) only once the event-time watermark passes the
  * session's close — so downstream sees each final session exactly
  * once.  State is bounded by the number of open sessions inside the
  * watermark horizon, independent of stream length: the T4/T6 bounded
  * late-data/state story applied to a stateful window aggregate.
  *
  * Same gap, same aggregates, same rounding as the batch operator —
  * a closed stream therefore equals the batch computation over the
  * same events (spec-verified), which is the streaming/batch parity
  * a pipeline needs to backfill history in batch and tail the live
  * feed with one definition.
  */
object StreamingSessions {

  /** events must carry (symbol, ts, value); `gap` and `watermark` are
    * duration strings. */
  def sessionize(events: DataFrame, gap: String = "1 hour",
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("symbol"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_last"))
      .select(col("symbol"), col("session_start"), col("session_last"),
        col("n_events"), col("sum_value"))
}
