package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import BarChangeDetector._

class BarChangeDetectorSpec extends SparkSuite {

  test("stateful detector classifies new/revised and suppresses unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[BarUpdate]
    val q = changes(input.toDS())
      .writeStream.format("memory").queryName("chg")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two fresh bars
      input.addData(
        BarUpdate("AAPL", "20240101T000000Z_Day", 1000L, 10.0),
        BarUpdate("AAPL", "20240102T000000Z_Day", 2000L, 11.0))
      q.processAllAvailable()
      // batch 2: one unchanged (suppressed), one revised, one new
      input.addData(
        BarUpdate("AAPL", "20240101T000000Z_Day", 1000L, 10.0),  // unchanged
        BarUpdate("AAPL", "20240102T000000Z_Day", 2000L, 11.5),  // revised
        BarUpdate("MSFT", "20240102T000000Z_Day", 2000L, 20.0))  // new
      q.processAllAvailable()
      val rows = spark.table("chg").as[BarChange].collect()
        .map(c => (c.symbol, c.bar_key, c.change_type, c.close)).toSet
      assert(rows == Set(
        ("AAPL", "20240101T000000Z_Day", "new", 10.0),
        ("AAPL", "20240102T000000Z_Day", "new", 11.0),
        ("AAPL", "20240102T000000Z_Day", "revised", 11.5),
        ("MSFT", "20240102T000000Z_Day", "new", 20.0)))
    } finally q.stop()
  }

  test("state evicts beyond the 30-day horizon") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    // unit-level: drive detect() with a fake GroupState
    var stored: Option[SymbolState] = None
    val gs = new org.apache.spark.sql.streaming.GroupState[SymbolState] {
      override def exists: Boolean = stored.isDefined
      override def get: SymbolState = stored.get
      override def getOption: Option[SymbolState] = stored
      override def update(s: SymbolState): Unit = stored = Some(s)
      override def remove(): Unit = stored = None
      override def hasTimedOut: Boolean = false
      override def setTimeoutDuration(d: Long): Unit = ()
      override def setTimeoutDuration(d: String): Unit = ()
      override def setTimeoutTimestamp(t: Long): Unit = ()
      override def setTimeoutTimestamp(t: Long, d: String): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date, d: String): Unit = ()
      override def getCurrentWatermarkMs(): Long = 0L
      override def getCurrentProcessingTimeMs(): Long = 0L
    }
    val old = BarUpdate("A", "old", 0L, 1.0)
    val fresh = BarUpdate("A", "new",
      BarChangeDetector.RetentionMicros + 1000000L, 2.0)
    detect("A", Iterator(old), gs).toList
    assert(stored.get.last.contains("old"))
    detect("A", Iterator(fresh), gs).toList
    assert(!stored.get.last.contains("old") && stored.get.last.contains("new"))
  }
}
