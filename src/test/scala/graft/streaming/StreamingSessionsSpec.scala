package graft.streaming

import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming session windows ≡ the batch session computation once the
  * watermark closes them; sessions merge across micro-batches. */
class StreamingSessionsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("closed sessions equal the batch computation, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val events = input.toDS().toDF("symbol", "ts", "value")
    val q = StreamingSessions.sessionize(events)
      .writeStream.format("memory").queryName("stream_sessions")
      .outputMode("append").start()
    try {
      // batch 1: two sessions for A (gap > 1h apart), one for B
      input.addData(
        ("A", ts("2024-01-01 00:00:00"), 1.0),
        ("A", ts("2024-01-01 00:30:00"), 2.0),
        ("A", ts("2024-01-01 03:00:00"), 3.0),
        ("B", ts("2024-01-01 01:00:00"), 5.0))
      q.processAllAvailable()
      // batch 2: extends A's second session (bridging within the gap),
      // then a far-future event pushes the watermark past everything
      input.addData(
        ("A", ts("2024-01-01 03:40:00"), 4.0),
        ("C", ts("2024-01-02 12:00:00"), 9.0))
      q.processAllAvailable()

      val streamed = spark.table("stream_sessions")
        .select($"symbol", $"session_start", $"session_last",
          $"n_events", $"sum_value")
      // C's session is still open (watermark hasn't passed it) — the
      // closed set must equal the batch computation on A and B
      val closed = Seq(
        ("A", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00"), 1.0, 2.0),
        ("A", ts("2024-01-01 03:00:00"), ts("2024-01-01 03:40:00"), 3.0, 4.0),
        ("B", ts("2024-01-01 01:00:00"), ts("2024-01-01 01:00:00"), 5.0, 5.0))
      val batch = closed.flatMap { case (s, _, _, _, _) => Seq(s) } // keys only
      assert(batch.nonEmpty)
      val got = streamed.collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      val want = Set(
        ("A", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00"), 2L, 3.0),
        ("A", ts("2024-01-01 03:00:00"), ts("2024-01-01 03:40:00"), 2L, 7.0),
        ("B", ts("2024-01-01 01:00:00"), ts("2024-01-01 01:00:00"), 1L, 5.0))
      assert(got == want, s"got $got")

      // and the same rows come out of the BATCH operator on the same
      // closed subset (stream ≡ batch for finished sessions)
      val batchRows = Seq(
        ("A", ts("2024-01-01 00:00:00"), 1.0),
        ("A", ts("2024-01-01 00:30:00"), 2.0),
        ("A", ts("2024-01-01 03:00:00"), 3.0),
        ("A", ts("2024-01-01 03:40:00"), 4.0),
        ("B", ts("2024-01-01 01:00:00"), 5.0))
        .toDF("symbol", "ts", "value")
        .groupBy($"symbol", session_window($"ts", "1 hour"))
        .agg(count(lit(1)).as("n_events"),
          round(sum($"value"), 4).as("sum_value"),
          min($"ts").as("session_start"), max($"ts").as("session_last"))
        .select($"symbol", $"session_start", $"session_last",
          $"n_events", $"sum_value")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(batchRows == want)
    } finally q.stop()
  }
}
