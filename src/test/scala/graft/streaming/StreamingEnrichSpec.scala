package graft.streaming

import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming as-of enrichment ≡ the bounded-lookback batch mirror on
  * the fixture feed, with events and bars arriving as independent
  * streams across interleaved micro-batches. */
class StreamingEnrichSpec extends SparkSuite {
  import spark.implicits._

  test("stream-stream interval join enrichment equals the batch mirror") {
    implicit val sqlCtx = spark.sqlContext
    val events = graft.Tables.events(spark, sf())
      .filter($"event_type".isNotNull)
      .selectExpr("event_type AS symbol", "ts", "value")
      .collect().zipWithIndex
      .map { case (r, i) =>
        (i.toLong, r.getString(0), r.getTimestamp(1), r.getDouble(2)) }
      .sortBy(_._3.getTime)
    val bars = graft.ingest.BarPipeline.canonicalBars(spark, sf())
      .selectExpr("symbol", "timestamp AS bar_ts", "close AS bar_close")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))

    val evIn = MemoryStream[(Long, String, Timestamp, Double)]
    val barIn = MemoryStream[(String, Timestamp, Double)]
    val q = StreamingEnrich.eventBars(
        evIn.toDS().toDF("event_id", "symbol", "ts", "value"),
        barIn.toDS().toDF("symbol", "bar_ts", "bar_close"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      // bars first (half), then events in two halves, then the rest of
      // the bars — the join must buffer and match across batch shapes
      val (b1, b2) = bars.splitAt(bars.length / 2)
      val (e1, e2) = events.splitAt(events.length / 2)
      barIn.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      evIn.addData(e1.toIndexedSeq: _*); q.processAllAvailable()
      barIn.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      evIn.addData(e2.toIndexedSeq: _*); q.processAllAvailable()
      // watermark flush on both sides (two rounds to finalize windows)
      val flushTs = new Timestamp(
        events.map(_._3.getTime).max + 60L * 86400L * 1000L)
      (1 to 2).foreach { i =>
        evIn.addData(Seq((90000L + i, "ZZZ", flushTs, 0.0)))
        barIn.addData(Seq(("ZZZ", flushTs, 0.0)))
        q.processAllAvailable()
      }
      val streamed = spark.table("enriched")
        .filter($"symbol" =!= "ZZZ")
        .collect().map(_.toSeq).toSet
      val batch = StreamingEnrich.batchEnrich(
          events.toSeq.toDF("event_id", "symbol", "ts", "value"),
          bars.toSeq.toDF("symbol", "bar_ts", "bar_close"))
        .collect().map(_.toSeq).toSet
      assert(batch.nonEmpty, "fixture must produce enriched rollups")
      assert(streamed == batch)
      // the lookback genuinely bounds the join: the batch mirror is a
      // strict subset of the unbounded as-of rollup's event mass
      val unboundedEvents = graft.ops.Temporal
        .asofEventBars(spark, sf()).collect()
        .map(_.getAs[Long]("n_events")).sum
      val boundedEvents = batch.map(_(3).asInstanceOf[Long]).sum
      assert(boundedEvents <= unboundedEvents)
    } finally q.stop()
  }

  test("join state survives a checkpointed restart: bars buffered before the crash match events after it") {
    import java.nio.file.Files
    val evDir = Files.createTempDirectory("enrich_ev").toString
    val barDir = Files.createTempDirectory("enrich_bar").toString
    val ckpt = Files.createTempDirectory("enrich_ckpt").toString
    val out = Files.createTempDirectory("enrich_out").toString
    def t(h: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 00:00:00").getTime + h * 3600L * 1000L)
    def drain(): Unit = {
      val q = StreamingEnrich.eventBars(
          spark.readStream
            .schema("event_id LONG, symbol STRING, ts TIMESTAMP, value DOUBLE")
            .parquet(evDir),
          spark.readStream
            .schema("symbol STRING, bar_ts TIMESTAMP, bar_close DOUBLE")
            .parquet(barDir))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    // run 1: only the bar arrives — it enters join state
    Seq(("AAA", t(0), 10.0)).toDF("symbol", "bar_ts", "bar_close")
      .write.mode("append").parquet(barDir)
    Seq((0L, "BBB", t(0), 1.0)) // seed the event side so both sides tick
      .toDF("event_id", "symbol", "ts", "value")
      .write.mode("append").parquet(evDir)
    drain()
    // run 2 (fresh query from the checkpoint): the matching event
    // arrives — it must join the bar buffered BEFORE the restart
    Seq((1L, "AAA", t(2), 5.0)).toDF("event_id", "symbol", "ts", "value")
      .write.mode("append").parquet(evDir)
    drain()
    // flush the watermark on both sides, twice
    val flush = t(24 * 60)
    (2 to 3).foreach { i =>
      Seq((10L + i, "ZZZ", flush, 0.0))
        .toDF("event_id", "symbol", "ts", "value")
        .write.mode("append").parquet(evDir)
      Seq(("ZZZ", flush, 0.0)).toDF("symbol", "bar_ts", "bar_close")
        .write.mode("append").parquet(barDir)
      drain()
    }
    val got = spark.read.parquet(out).filter($"symbol" === "AAA")
      .select("symbol", "bar_ts", "n_events", "sum_value", "bar_close")
      .collect().map(_.toSeq).toSet
    assert(got == Set(Seq("AAA", t(0), 1L, 5.0, 10.0)),
      s"pre-restart bar must enrich the post-restart event, got $got")
  }
}
