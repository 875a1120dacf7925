package graft.streaming

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** E2/E3 parity: the reference's mutable `last_fetch_status` record
  * (`app/alpaca_service.py:19-25`) realized as a
  * `StreamingQueryListener` that folds query progress into a 1-row
  * status snapshot.  Unlike the reference's RAM-only dict (v1 docs note
  * it is lost on restart), the stream itself is checkpointed — status
  * is reconstructible; this record is a monitoring projection.
  *
  * The health projection (S7/P4/A3): the snapshot exposes counters and
  * the last error, never the heavy bar payload — and implements the
  * *intended* v1 semantics (real bar counts) rather than the v2 defect
  * where `bars_count` is always 0 (SURVEY.md §0).
  */
object RunStatusListener {
  final case class Snapshot(
      lastAttemptTimestampUtc: Option[String],
      lastSuccessTimestampUtc: Option[String],
      batchesCompleted: Long,
      barsInLastBatch: Long,
      errorMessage: Option[String])
}

final class RunStatusListener extends StreamingQueryListener {
  import RunStatusListener.Snapshot

  private val state = new AtomicReference(Snapshot(None, None, 0L, 0L, None))

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit =
    state.updateAndGet(s => s.copy(
      lastAttemptTimestampUtc = Some(e.timestamp), errorMessage = None))

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit =
    state.updateAndGet(s => s.copy(
      lastAttemptTimestampUtc = Some(e.progress.timestamp),
      lastSuccessTimestampUtc = Some(e.progress.timestamp),
      batchesCompleted = s.batchesCompleted + 1,
      barsInLastBatch = e.progress.numInputRows))

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    e.exception.foreach(msg =>
      state.updateAndGet(s => s.copy(errorMessage = Some(msg))))

  def snapshot: Snapshot = state.get()

  /** The GET-/-style health projection as a queryable 1-row DataFrame. */
  def statusDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val s = snapshot
    Seq((s.lastAttemptTimestampUtc, s.lastSuccessTimestampUtc,
      s.batchesCompleted, s.barsInLastBatch, s.errorMessage))
      .toDF("last_attempt_timestamp_utc", "last_success_timestamp_utc",
        "batches_completed", "bars_in_last_batch", "error_message")
  }
}
