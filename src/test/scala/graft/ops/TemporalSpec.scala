package graft.ops

import graft.SparkSuite
import java.sql.Timestamp

class TemporalSpec extends SparkSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asof join picks the latest right row at or before each left row") {
    import spark.implicits._
    val trades = Seq(
      ("A", ts("2024-01-01 10:00:30"), 1.0),
      ("A", ts("2024-01-01 10:01:00"), 2.0), // exactly at quote q2
      ("A", ts("2024-01-01 09:59:00"), 3.0), // before any quote -> dropped
      ("B", ts("2024-01-01 10:05:00"), 4.0)
    ).toDF("sym", "t_ts", "qty")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:01:00"), 101.0),
      ("B", ts("2024-01-01 10:00:00"), 200.0)
    ).toDF("sym", "q_ts", "px")
    val out = Temporal.asofJoin(trades, quotes, "sym", "t_ts", "q_ts")
      .select("sym", "t_ts", "qty", "q_ts", "px").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
        r.getTimestamp(3), r.getDouble(4))).toSet
    assert(out == Set(
      ("A", ts("2024-01-01 10:00:30"), 1.0, ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:01:00"), 2.0, ts("2024-01-01 10:01:00"), 101.0),
      ("B", ts("2024-01-01 10:05:00"), 4.0, ts("2024-01-01 10:00:00"), 200.0)))
  }

  test("native streaming-merge asof equals the union+window fallback") {
    import spark.implicits._
    val events = graft.Tables.events(spark, sf())
      .filter($"event_type".isNotNull)
      .select($"event_type".as("symbol"), $"ts", $"value")
    val bars = graft.ingest.BarPipeline.canonicalBars(spark, sf())
      .select($"symbol", $"timestamp".as("bar_ts"), $"close".as("bar_close"))
    val native = Temporal.asofJoinNative(events, bars, "symbol", "ts", "bar_ts")
      .collect().map(_.toSeq.toString).sorted.toSeq
    val window = Temporal.asofJoinViaWindow(events, bars, "symbol", "ts", "bar_ts")
      .collect().map(_.toSeq.toString).sorted.toSeq
    assert(native == window)
    assert(native.nonEmpty)
  }

  test("native asof plan contains the custom exec, not a window") {
    import spark.implicits._
    val events = graft.Tables.events(spark, sf())
      .select($"event_type".as("symbol"), $"ts", $"value")
    val bars = graft.ingest.BarPipeline.canonicalBars(spark, sf())
      .select($"symbol", $"timestamp".as("bar_ts"), $"close".as("bar_close"))
    val plan = Temporal.asofJoinNative(events, bars, "symbol", "ts", "bar_ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(2000))
  }

  test("asof event-bars accounts for every event exactly once") {
    import spark.implicits._
    val out = Temporal.asofEventBars(spark, sf())
    val total = out.agg(org.apache.spark.sql.functions.sum($"n_events"))
      .head.getLong(0)
    val events = graft.Tables.events(spark, sf())
      .filter($"event_type".isNotNull).count()
    assert(total == events)
  }

  test("anomaly flags a spike over noisy history, never over flat history") {
    import spark.implicits._
    def rows(tpe: String, day: Int, k: Int) = (0 until k).map { i =>
      (tpe, Timestamp.valueOf(f"2024-01-$day%02d 00:${i / 60}%02d:${i % 60}%02d"))
    }
    // type a: 14 noisy days (9/11 alternating), then a 30-count spike;
    // type b: perfectly flat history before the same spike — var = 0,
    // so by the documented semantics it is never scored
    val data = (1 to 14).flatMap(d => rows("a", d, if (d % 2 == 0) 11 else 9)) ++
      rows("a", 15, 30) ++
      (1 to 15).flatMap(d => rows("b", d, if (d == 15) 30 else 10))
    data.toDF("event_type", "ts").createOrReplaceTempView("events")
    val out = spark.sql(Temporal.anomalySql).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // hand-derived: mu = 10, var = (7·81 + 7·121 − 14·10²)/13 = 14/13
    val mu = 140.0 / 14
    val vr = (1414.0 - 14 * mu * mu) / 13
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet == Set("a" -> "2024-01-15"))
    assert(out("a" -> "2024-01-15") ==
      ((30L, r6(mu), r6((30 - mu) / math.sqrt(vr)))))
  }

  test("session windows partition events without loss and respect the gap") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Temporal.sessionWindows(spark, sf()).collect()
    val events = graft.Tables.events(spark, sf())
      .filter($"event_type".isNotNull).count()
    assert(out.map(_.getAs[Long]("n_events")).sum == events)
    // sessions of one symbol are disjoint and ordered, gap >= 1h between
    out.groupBy(_.getAs[String]("symbol")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Timestamp]("session_start").getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gapMs = b.getAs[Timestamp]("session_start").getTime -
            a.getAs[Timestamp]("session_last").getTime
          assert(gapMs >= 3600 * 1000L)
        case _ =>
      }
    }
  }
}
