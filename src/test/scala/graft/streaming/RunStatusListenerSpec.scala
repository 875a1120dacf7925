package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class RunStatusListenerSpec extends SparkSuite {

  test("listener folds progress into the 1-row health projection") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val listener = new RunStatusListener
    spark.streams.addListener(listener)
    val input = MemoryStream[Int]
    val q = input.toDS().writeStream
      .format("memory").queryName("rsl_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(1, 2, 3)
      q.processAllAvailable()
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 20000
      while (listener.snapshot.batchesCompleted < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val s = listener.snapshot
      assert(s.batchesCompleted >= 1)
      assert(s.lastSuccessTimestampUtc.isDefined)
      assert(s.errorMessage.isEmpty)
      val row = listener.statusDf(spark).collect().head
      assert(row.getAs[Long]("batches_completed") >= 1L)
      assert(row.getAs[String]("error_message") == null)
      // P4 anti-projection: no heavy payload columns in the projection
      assert(!listener.statusDf(spark).columns.contains("bars"))
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}
