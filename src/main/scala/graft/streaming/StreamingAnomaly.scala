package graft.streaming

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of `Temporal.anomalySql` (q_anomaly): per event
  * type, maintain the trailing 14 closed daily counts in keyed state
  * and score each day as it closes — the same explicit Σn/Σn² variance
  * arithmetic as the batch query, so a closed day's row is
  * bit-identical to the batch result (StreamingAnomalySpec pins
  * stream ≡ batch on the fixture events).
  *
  * Day-closure semantics: a day closes for a key when that key sees an
  * event of any LATER day (mirroring how the batch query only ever
  * scores days that have complete counts); the current maximum day
  * stays open in state, so a feed that ends mid-day emits nothing
  * for it — and an event arriving for an already-closed day is late
  * beyond the horizon and is dropped, the same trade
  * `dropDuplicatesWithinWatermark` makes in `StreamingDedup`.
  *
  * Scale notes: state per key is one open-day count map (size = days
  * in flight, ~1 with in-order feeds) plus 14 (day, count) pairs —
  * constant, independent of event volume; the counts accumulate
  * incrementally so no per-event history is ever buffered.
  */
object StreamingAnomaly {

  case class Evt(event_type: String, ts: Timestamp)
  /** `lastClosed` is the closure high-water mark (ISO day, "" = none):
    * the trimmed `closed` vector only remembers the trailing 14 days,
    * so lateness must be judged against this mark, not membership in
    * the vector — otherwise an event for a long-closed day would
    * reopen it, score it against a future-relative history, and
    * corrupt the chronological order of the trailing window. */
  case class TypeState(open: Map[String, Long],
                       closed: Vector[(String, Long)],
                       lastClosed: String)
  case class Anomaly(event_type: String, day: Date, n: Long,
                     expected_n: Double, z_score: Double)

  val Trailing = 14
  val MinObs = 7

  /** Day bucket of an event under the given zone — `anomalies` passes
    * the session's `spark.sql.session.timeZone`, so the stream buckets
    * days exactly like the batch query's `CAST(ts AS DATE)` in ANY
    * session zone, not only the UTC this repo pins. */
  private def dayOf(ts: Timestamp, zone: java.time.ZoneId): String =
    ts.toInstant.atZone(zone).toLocalDate.toString

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Score day `d` (count `n`) against the trailing closed history —
    * the identical mu/var/z expressions as the batch SQL (integer
    * sums exact, double ops in the same order). */
  private def score(tpe: String, d: String, n: Long,
                    hist: Vector[Long]): Option[Anomaly] = {
    if (hist.size < MinObs) None
    else {
      val c = hist.size
      val s1 = hist.sum
      val s2 = hist.map(x => x * x).sum
      val mu = s1.toDouble / c
      val vr = (s2.toDouble - c * mu * mu) / (c - 1)
      if (vr > 0) {
        val z = (n - mu) / math.sqrt(vr)
        if (math.abs(z) > 2)
          Some(Anomaly(tpe, Date.valueOf(d), n, round6(mu), round6(z)))
        else None
      } else None
    }
  }

  def detect(zone: java.time.ZoneId)(tpe: String, evts: Iterator[Evt],
             state: GroupState[TypeState]): Iterator[Anomaly] = {
    val prev = state.getOption
      .getOrElse(TypeState(Map.empty, Vector.empty, ""))
    var open = prev.open
    var closed = prev.closed
    var lastClosed = prev.lastClosed
    evts.foreach { e =>
      val d = dayOf(e.ts, zone)
      // a day at or before the closure high-water mark cannot reopen
      // (late beyond the horizon — dropped); "" < every ISO day
      if (d > lastClosed)
        open = open.updated(d, open.getOrElse(d, 0L) + 1L)
    }
    val out = Vector.newBuilder[Anomaly]
    if (open.nonEmpty) {
      val maxDay = open.keys.max
      // close strictly-older days in day order; ISO yyyy-MM-dd strings
      // sort chronologically
      open.keys.filter(_ < maxDay).toSeq.sorted.foreach { d =>
        val n = open(d)
        score(tpe, d, n, closed.takeRight(Trailing).map(_._2))
          .foreach(out += _)
        closed = (closed :+ (d, n)).takeRight(Trailing)
        lastClosed = d
        open = open - d
      }
    }
    state.update(TypeState(open, closed, lastClosed))
    out.result().iterator
  }

  /** Wire the detector over a streaming Dataset of events.  The day
    * zone comes from the session (`spark.sql.session.timeZone`) so
    * stream ≡ batch holds whatever zone the session runs in. */
  def anomalies(evts: Dataset[Evt]): Dataset[Anomaly] = {
    import evts.sparkSession.implicits._
    val zone = java.time.ZoneId.of(
      evts.sparkSession.sessionState.conf.sessionLocalTimeZone)
    evts
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(detect(zone))
  }
}
