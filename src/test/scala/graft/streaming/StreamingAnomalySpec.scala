package graft.streaming

import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming anomaly detection ≡ the batch q_anomaly query for every
  * day the stream has closed, across micro-batches. */
class StreamingAnomalySpec extends SparkSuite {
  import spark.implicits._

  test("streamed anomaly rows equal the batch query on closed days") {
    implicit val sqlCtx = spark.sqlContext
    // fixture events, fed in three day-ordered micro-batches
    val evts = graft.Tables.events(spark, sf())
      .selectExpr("event_type", "ts")
      .as[(String, Timestamp)].collect().sortBy(_._2.getTime)
    val days = evts.map(e => e._2.toInstant
      .atZone(java.time.ZoneOffset.UTC).toLocalDate).distinct.sorted
    val cut1 = days(days.length / 3).atStartOfDay(java.time.ZoneOffset.UTC)
    val cut2 = days(2 * days.length / 3).atStartOfDay(java.time.ZoneOffset.UTC)
    val input = MemoryStream[(String, Timestamp)]
    val q = StreamingAnomaly.anomalies(
      input.toDS().map(e => StreamingAnomaly.Evt(e._1, e._2)))
      .writeStream.format("memory").queryName("stream_anomaly")
      .outputMode("append").start()
    try {
      def before(t: java.time.ZonedDateTime)(e: (String, Timestamp)) =
        e._2.toInstant.isBefore(t.toInstant)
      input.addData(evts.filter(before(cut1)).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(evts.filter(e =>
        !before(cut1)(e) && before(cut2)(e)).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(evts.filterNot(before(cut2)).toIndexedSeq: _*)
      q.processAllAvailable()

      val streamed = spark.table("stream_anomaly").collect()
        .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSet
      // each type's OWN final day never closes (day closure is per
      // event type — no later event of that type arrives), so the
      // stream must equal the batch query minus every type's own max
      // day, not the corpus-global last day
      val lastDayByType = evts.groupBy(_._1).map { case (tpe, es) =>
        tpe -> es.map(_._2.toInstant.atZone(java.time.ZoneOffset.UTC)
          .toLocalDate).max.toString
      }
      val batch = graft.ops.Temporal.anomaly(spark, sf()).collect()
        .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSet
        .filter(t => t._2 < lastDayByType(t._1))
      assert(batch.nonEmpty, "fixture produced no closed-day anomalies")
      assert(streamed == batch, s"stream $streamed\nbatch $batch")
    } finally q.stop()
  }

  test("late events for long-closed days are dropped, never re-scored") {
    implicit val sqlCtx = spark.sqlContext
    def evts(day: Int, k: Int) = (0 until k).map(i =>
      ("a", Timestamp.valueOf(f"2024-01-$day%02d 00:00:${i % 60}%02d")))
    val input = MemoryStream[(String, Timestamp)]
    val q = StreamingAnomaly.anomalies(
      input.toDS().map(e => StreamingAnomaly.Evt(e._1, e._2)))
      .writeStream.format("memory").queryName("stream_anomaly_late")
      .outputMode("append").start()
    try {
      // 14 noisy days + a 30-count spike day; day 15 stays open
      input.addData((1 to 14).flatMap(d =>
        evts(d, if (d % 2 == 0) 11 else 9)) ++ evts(15, 30): _*)
      q.processAllAvailable()
      // a long-closed day-2 straggler arrives with day 16: the
      // straggler must be dropped (day 2 closed an epoch ago), while
      // day 16 closes day 15 and flags the spike against days 1-14
      input.addData(evts(2, 1) ++ evts(16, 10): _*)
      q.processAllAvailable()
      val got = spark.table("stream_anomaly_late").collect()
        .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2))).toSet
      assert(got == Set(("a", "2024-01-15", 30L)), s"got $got")
    } finally q.stop()
  }
}
