package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful change detection over the bar stream
  * (`flatMapGroupsWithState`): per symbol, remember the last close of
  * every bar key and classify each incoming bar as `new` (first sight
  * of the key), `revised` (same key, different close — the reference's
  * late-data overwrite, T3/T4), or suppress it when unchanged (an
  * idempotent re-run produces zero events).
  *
  * This is the "publish only real changes" refinement of the
  * reference's S5 summary events: its Pub/Sub republishes every run
  * even when nothing changed; keyed state turns that into a
  * change-data stream.
  *
  * Scale notes: state is keyed by symbol and holds one (bar_key →
  * close) entry per live bar; with a 30-day retention horizon that is
  * ≤ ~30 entries per symbol-day timeframe.  State eviction drops bars
  * older than the horizon on every invocation, so state is bounded the
  * same way the reference's refetch window bounds its writes.
  */
object BarChangeDetector {

  case class BarUpdate(symbol: String, bar_key: String, t: Long, close: Double)
  case class BarChange(symbol: String, bar_key: String,
                       change_type: String, close: Double)
  /** Per-key (close, bar timestamp micros) + high-water mark. */
  case class SymbolState(last: Map[String, (Double, Long)], maxT: Long)

  val RetentionMicros: Long = 30L * 24 * 3600 * 1000000L // 30 days

  def detect(symbol: String, updates: Iterator[BarUpdate],
             state: GroupState[SymbolState]): Iterator[BarChange] = {
    val prev = state.getOption.getOrElse(SymbolState(Map.empty, Long.MinValue))
    var last = prev.last
    var maxT = prev.maxT
    val out = Seq.newBuilder[BarChange]
    // deterministic processing order within a batch
    updates.toSeq.sortBy(u => (u.t, u.bar_key)).foreach { u =>
      if (u.t > maxT) maxT = u.t
      last.get(u.bar_key) match {
        case None =>
          out += BarChange(symbol, u.bar_key, "new", u.close)
          last = last.updated(u.bar_key, (u.close, u.t))
        case Some((c, _)) if c != u.close =>
          out += BarChange(symbol, u.bar_key, "revised", u.close)
          last = last.updated(u.bar_key, (u.close, u.t))
        case _ => // unchanged — suppress (idempotent re-run emits nothing)
      }
    }
    // evict entries beyond the retention horizon: bounded state (T4),
    // mirroring how the reference's 30-day refetch window bounds writes
    if (maxT != Long.MinValue)
      last = last.filter { case (_, (_, t)) => t >= maxT - RetentionMicros }
    state.update(SymbolState(last, maxT))
    out.result().iterator
  }

  /** Wire the detector over a streaming Dataset of BarUpdate. */
  def changes(updates: Dataset[BarUpdate]): Dataset[BarChange] = {
    import updates.sparkSession.implicits._
    updates
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(detect)
  }
}
