package graft.streaming

import java.nio.file.Files
import graft.{SparkSuite, Tables}
import graft.ingest.{BarPipeline, BarStore, Canonicalize}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Streaming ≡ batch: the Structured Streaming ingest must land exactly
  * the rows the batch pipeline produces, and a checkpointed restart
  * must be a no-op (T1-T6). */
class StreamingIngestSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(tag: String) =
    Files.createTempDirectory(tag).toString

  test("streaming ingest lands the same canonical bars as batch") {
    val store = tmp("store") + "/bars"
    val ckpt = tmp("ckpt")
    val events = tmp("events") + "/summaries"
    val listener = new RunStatusListener
    spark.streams.addListener(listener)
    try {
      val (q, _) = StreamingIngest.start(spark, sf(), store, ckpt,
        eventsDir = Some(events))
      q.awaitTermination(120000)
      // S5: one summary event per asset per successful batch,
      // published after the store write
      val published = spark.read.json(events)
      assert(published.count() >= 5) // 5 symbols in the fixture
      assert(published.columns.toSet ==
        Set("event_type", "message", "batch_id", "sink_date"))
      assert(published.select("event_type").distinct().collect()
        .map(_.getString(0)).toSeq == Seq("HistoricalDataUpdated"))
      val streamed = BarStore.read(spark, store)
        .select("bar_key", "symbol", "timestamp", "timeframe",
          "open", "high", "low", "close", "volume")
        .collect().toSet
      val batch = BarPipeline.canonicalBars(spark, sf()).collect().toSet
      assert(streamed === batch)
      assert(listener.snapshot.batchesCompleted >= 1)
      assert(listener.snapshot.errorMessage.isEmpty)
      val status = listener.statusDf(spark).collect().head
      assert(status.getAs[Long]("batches_completed") >= 1L)
    } finally spark.streams.removeListener(listener)
  }

  test("checkpointed restart is a no-op (exactly-once via keyed sink)") {
    val store = tmp("store") + "/bars"
    val ckpt = tmp("ckpt")
    val (q1, _) = StreamingIngest.start(spark, sf(), store, ckpt)
    q1.awaitTermination(120000)
    val once = BarStore.read(spark, store).collect().toSet
    // same checkpoint: no new files → AvailableNow drains nothing
    val (q2, _) = StreamingIngest.start(spark, sf(), store, ckpt)
    q2.awaitTermination(120000)
    val twice = BarStore.read(spark, store).collect().toSet
    assert(once === twice)
    // fresh checkpoint (full re-fetch, T3): still identical content
    val (q3, _) = StreamingIngest.start(spark, sf(), store, tmp("ckpt2"))
    q3.awaitTermination(120000)
    val refetch = BarStore.read(spark, store).collect().toSet
    assert(once === refetch)
  }

  test("Week bars match batch (calendar buckets, not epoch windows)") {
    // Epoch-aligned window('1 week') starts weeks on Thursday;
    // date_trunc('week') starts them Monday.  The streaming path must
    // produce the batch path's bar timestamps or the shared BarStore
    // keys diverge.
    val store = tmp("store") + "/bars"
    val (q, _) = StreamingIngest.start(spark, sf(), store, tmp("ckpt"),
      timeframe = "Week")
    q.awaitTermination(120000)
    val streamed = BarStore.read(spark, store)
      .select("bar_key", "symbol", "timestamp", "timeframe",
        "open", "high", "low", "close", "volume")
      .collect().toSet
    val batch = BarPipeline.canonicalBars(spark, sf(), "Week").collect().toSet
    assert(streamed === batch)
  }

  test("Month bars match batch (bucket-length watermark slack)") {
    // Month is the worst case for the bucket-column watermark: without
    // the one-bucket slack the previous month's state could evict the
    // moment a new month starts, dropping late events the 30-day
    // ts-horizon would accept.
    val store = tmp("store") + "/bars"
    val (q, _) = StreamingIngest.start(spark, sf(), store, tmp("ckpt"),
      timeframe = "Month")
    q.awaitTermination(120000)
    val streamed = BarStore.read(spark, store)
      .select("bar_key", "symbol", "timestamp", "timeframe",
        "open", "high", "low", "close", "volume")
      .collect().toSet
    val batch = BarPipeline.canonicalBars(spark, sf(), "Month").collect().toSet
    assert(streamed === batch)
  }

  test("watermarked stream dedup drops exact duplicate bar updates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val bars = input.toDS()
      .toDF("symbol", "t", "close")
    val q = StreamingIngest.dedupedBars(bars)
      .writeStream.format("memory").queryName("dedup_bars")
      .outputMode("append").start()
    try {
      val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
      input.addData(("A", t1, 1.0), ("A", t1, 1.0), ("B", t1, 2.0))
      q.processAllAvailable()
      input.addData(("A", t1, 1.0)) // duplicate across batches
      q.processAllAvailable()
      assert(spark.table("dedup_bars").count() == 2) // A and B once each
    } finally q.stop()
  }

  test("malformed events land in quarantine without failing the batch (T7)") {
    val src = tmp("qsrc")
    val store = tmp("qstore") + "/bars"
    val qd = tmp("quarantine")
    def nanos(s: String): java.lang.Long =
      java.sql.Timestamp.valueOf(s).getTime * 1000000L
    // raw feed: 2 valid ticks, one value-range violation (aggregates
    // into bars like batch — the quarantine is the monitoring copy),
    // one null-ts and one null-symbol tick (both absent from bars)
    val rows = Seq(
      (1L, nanos("2024-01-01 10:00:00"), 7L, "AAA", 10.0, "{}"),
      (2L, nanos("2024-01-01 11:00:00"), 7L, "AAA", 999.0, "{}"),
      (3L, null.asInstanceOf[java.lang.Long], 7L, "AAA", 20.0, "{}"),
      (4L, nanos("2024-01-01 12:00:00"), 7L, null.asInstanceOf[String], 30.0, "{}"),
      (5L, nanos("2024-01-02 09:00:00"), 7L, "BBB", 50.0, "{}"))
    val staged = tmp("qstage")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(staged)
    val part = Files.list(java.nio.file.Paths.get(staged)).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    Files.copy(java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(src, "events_custom.parquet"))

    val (q, qq) = StreamingIngest.start(spark, src, store, tmp("qckpt"),
      quarantineDir = Some(qd))
    q.awaitTermination(120000)
    assert(q.exception.isEmpty) // the malformed rows failed nothing
    // the quarantine query shares the trigger; drain it via its own
    // returned handle (no fishing in spark.streams.active)
    qq.foreach { s => s.awaitTermination(120000); assert(s.exception.isEmpty) }

    val rejected = spark.read.parquet(s"$qd/events")
    val byId = rejected.collect()
      .map(r => r.getAs[Long]("event_id") ->
        r.getAs[scala.collection.Seq[String]]("reject_reasons").toSet).toMap
    assert(byId.keySet == Set(2L, 3L, 4L))
    assert(byId(2L) == Set("value_range"))
    assert(byId(3L) == Set("null_ts"))
    assert(byId(4L) == Set("null_symbol"))

    // bars match the batch pipeline over the same raw feed: null-ts and
    // null-symbol ticks absent, the value outlier aggregated as batch does
    val rawBatch = spark.read.schema(StreamingIngest.eventSchema)
      .parquet(src)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    val expected = Canonicalize
      .canonicalize(BarPipeline.barsFromTicks(rawBatch), "Day").get
      .collect().toSet
    val streamed = BarStore.read(spark, store)
      .select("bar_key", "symbol", "timestamp", "timeframe",
        "open", "high", "low", "close", "volume")
      .collect().toSet
    assert(streamed === expected)
    assert(streamed.exists(_.getAs[Double]("high") == 999.0))
  }

  test("merge preserves untouched keys in a touched partition") {
    val store = tmp("store") + "/bars"
    val all = BarPipeline.canonicalBars(spark, sf())
    BarStore.upsert(all, store)
    // an update batch carrying a single symbol must not clobber the
    // other symbols sharing its date partitions
    val oneSymbol = all.filter($"symbol" === "click")
    BarStore.merge(oneSymbol, store)
    val after = BarStore.read(spark, store)
    assert(after.count() === all.count())
    assert(after.filter($"symbol" =!= "click").count() ===
      all.filter($"symbol" =!= "click").count())
  }
}
