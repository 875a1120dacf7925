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
  /** One stateful operator's footprint in the latest progress: the
    * observability a pipeline needs to size watermarks from data —
    * e.g. the near-dup dedup's live band-key count or the anomaly
    * detector's keyed-state rows, plus eviction flow and memory. */
  final case class StateMetric(
      operatorName: String,
      stateRows: Long,
      rowsUpdated: Long,
      rowsRemoved: Long,
      memoryUsedBytes: Long)

  final case class Snapshot(
      lastAttemptTimestampUtc: Option[String],
      lastSuccessTimestampUtc: Option[String],
      batchesCompleted: Long,
      barsInLastBatch: Long,
      errorMessage: Option[String],
      stateOperators: Seq[StateMetric] = Seq.empty)
}

final class RunStatusListener extends StreamingQueryListener {
  import RunStatusListener.Snapshot

  private val state = new AtomicReference(Snapshot(None, None, 0L, 0L, None))

  // Change-notification channel for the push surface (StatusServer's
  // SSE endpoint): every status mutation bumps a version and wakes
  // waiters, so a push connection sleeps between batches instead of
  // polling.  Single JVM-local lock — waiters are HTTP connections
  // (bounded), signals are per-micro-batch (seconds apart).
  private val changeLock = new Object
  private var versionCounter: Long = 0L

  private def bumpVersion(): Unit = changeLock.synchronized {
    versionCounter += 1
    changeLock.notifyAll()
  }

  /** Monotonic status version: increments on every completed batch or
    * terminal error. */
  def version: Long = changeLock.synchronized(versionCounter)

  /** Block until the status version exceeds `since` or the timeout
    * elapses; returns the version at wake-up (== `since` on timeout). */
  def awaitChange(since: Long, timeoutMillis: Long): Long =
    changeLock.synchronized {
      val deadline = System.nanoTime() + timeoutMillis * 1000000L
      var remain = timeoutMillis
      while (versionCounter <= since && remain > 0) {
        changeLock.wait(remain)
        remain = (deadline - System.nanoTime()) / 1000000L
      }
      versionCounter
    }

  /** Test seam: fire the change channel without a real streaming
    * event (constructing QueryProgressEvent requires Spark internals). */
  private[graft] def bumpForTest(): Unit = bumpVersion()

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit =
    state.updateAndGet(s => s.copy(
      lastAttemptTimestampUtc = Some(e.timestamp), errorMessage = None))

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    state.updateAndGet(s => s.copy(
      lastAttemptTimestampUtc = Some(e.progress.timestamp),
      lastSuccessTimestampUtc = Some(e.progress.timestamp),
      batchesCompleted = s.batchesCompleted + 1,
      barsInLastBatch = e.progress.numInputRows,
      stateOperators = e.progress.stateOperators.toSeq.map(so =>
        RunStatusListener.StateMetric(so.operatorName, so.numRowsTotal,
          so.numRowsUpdated, so.numRowsRemoved, so.memoryUsedBytes))))
    bumpVersion()
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    e.exception.foreach { msg =>
      state.updateAndGet(s => s.copy(errorMessage = Some(msg)))
      bumpVersion()
    }

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

  /** Per-stateful-operator metrics of the latest micro-batch as a
    * queryable table — one row per operator (dedup registry, windowed
    * aggregation, keyed detector …) with its live state row count,
    * per-batch update/eviction flow and memory footprint.  This is the
    * feedback loop for sizing watermarks: a band-key count that grows
    * batch over batch means the horizon outlives the feed's actual
    * duplicate lag. */
  def stateMetricsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshot.stateOperators
      .map(m => (m.operatorName, m.stateRows, m.rowsUpdated,
        m.rowsRemoved, m.memoryUsedBytes))
      .toDF("operator_name", "state_rows", "rows_updated",
        "rows_removed", "memory_used_bytes")
  }
}
