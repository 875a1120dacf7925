package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.ingest.{BarStore, Canonicalize, Quarantine}

/** The E1 dataflow under Structured Streaming (SURVEY.md §2.7 T1-T6).
  *
  * Source: file stream of tick/event parquet (stands in for the remote
  * bar feed; a production connector would be a DataSource V2 table).
  * Transform: watermarked tumbling-window OHLCV aggregation (T5) →
  * canonicalize.  Sink: `foreachBatch` keyed idempotent upsert into the
  * partitioned bar store (T3) — the same BarStore as batch mode, so
  * streaming and batch ingests are interchangeable and re-runs are
  * no-ops.  Trigger: `AvailableNow` reproduces the reference's
  * scheduled batch cadence (cron fires a run that drains what's
  * available); `ProcessingTime` maps to its interval mode.
  *
  * Scale: state is bounded by the watermark (T4 — the reference's
  * 30-day trailing refetch window); the windowed agg shuffles once on
  * (symbol, window) with partial aggregation map-side.
  */
object StreamingIngest {

  /** Raw event-file schema (ts as raw nanos Long — see Tables.events). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-stream source over a directory of event parquet files.
    *
    * Like `Tables.events`, adapts to the `ts` physical type the files
    * actually store (raw nanos Long under the legacy conf, or
    * TIMESTAMP_NTZ micros from newer fixture generations): a file
    * stream needs its schema up front, so probe the directory once
    * with a static read — one footer read at stream build time, not
    * per micro-batch.  Either way downstream sees `ts: TimestampType`
    * at micros precision, identical to the batch loader.
    *
    * A stream started on an EMPTY directory has nothing to probe, and
    * a file stream cannot change schema after start — the format is
    * pinned for the stream's lifetime.  `tsFormat` makes that pin
    * explicit: "auto" (probe, falling back to the nanos-Long raw
    * schema when the dir is empty — the standing fixture generation),
    * or "nanos"/"micros" to declare the expected generation up front.
    * A caller whose producer writes the NTZ-micros generation into a
    * not-yet-populated dir MUST pass "micros", or the first arriving
    * file fails the pinned Long reader at micro-batch time. */
  def readEvents(spark: SparkSession, dir: String,
                 tsFormat: String = "auto"): DataFrame = {
    // Same fail-fast guard as Tables.events: on a session not built via
    // GraftSession/Verify a nanos-format stream would otherwise die at
    // start with an opaque Spark nanos-timestamp error.
    require(
      spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "session must set spark.sql.legacy.parquet.nanosAsLong=true " +
        "(GraftSession.build does) - events*.parquet may be TIMESTAMP(NANOS)")
    val ntzSchema = StructType(eventSchema.map(f =>
      if (f.name == "ts")
        f.copy(dataType = org.apache.spark.sql.types.TimestampNTZType)
      else f))
    val schema = tsFormat match {
      case "nanos" => eventSchema
      case "micros" => ntzSchema
      case "auto" =>
        val probed =
          try Some(spark.read.option("pathGlobFilter", "events*.parquet")
                .parquet(dir).schema)
          catch { case _: Exception => None } // empty dir: starts before files
        probed.getOrElse(eventSchema)
      case other => throw new IllegalArgumentException(
        s"tsFormat must be auto|nanos|micros, got '$other'")
    }
    val raw = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events*.parquet")
      .option("maxFilesPerTrigger", "4") // bounded micro-batches at scale
      .parquet(dir)
    schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** T5 under streaming: watermarked tumbling OHLCV bars.
    * Watermark = the reference's 30-day late-data horizon (T4).
    *
    * The bucket is calendar `date_trunc`, NOT `window(ts, duration)`:
    * fixed-length epoch-aligned windows diverge from the batch path for
    * Week (epoch weeks start Thursday) and Month (no fixed length), and
    * batch↔streaming interchangeability through the shared BarStore
    * requires identical bar timestamps/bar_keys.  `date_trunc` is
    * deterministic per-row, so the watermark moves to the *bucket*
    * column — grouping on the watermarked column keeps state eviction
    * (one state row per symbol × bucket, evicted once the watermark
    * passes the bucket start + the late horizon).
    *
    * The eviction delay is the caller's horizon PLUS one bucket
    * length: truncation moves an event's time back by up to a bucket,
    * so without the slack a previous-Month bucket could close the
    * moment the new month starts — any event the ts-based horizon
    * would accept (ts ≥ max(ts) − horizon) is then still accepted,
    * because bucket(ts) ≥ ts − bucketLen. */
  def streamingBars(events: DataFrame, timeframe: String = "Day",
      watermark: String = "30 days"): DataFrame = {
    val unit = graft.model.Timeframes.resolve(timeframe).toLowerCase
    val slackMinutes: Long = unit match {
      case "minute" => 1L
      case "hour" => 60L
      case "day" => 1440L
      case "week" => 7L * 1440L
      case "month" => 31L * 1440L
      case _ => 1440L
    }
    // normalize the horizon to minutes so any common interval spelling
    // ("30 days", "30 DAYS", "720 hours", "4 weeks") gets the slack;
    // unrecognized forms pass through unchanged (caller manages slack)
    val interval = "(?i)^\\s*(\\d+)\\s*(minute|hour|day|week)s?\\s*$".r
    val delay = watermark match {
      case interval(n, u) =>
        val unitMin = u.toLowerCase match {
          case "minute" => 1L
          case "hour" => 60L
          case "day" => 1440L
          case "week" => 7L * 1440L
        }
        s"${n.toLong * unitMin + slackMinutes} minutes"
      case _ => watermark
    }
    events
      .filter(col("event_type").isNotNull) // P5
      .withColumn("bucket", date_trunc(unit, col("ts")))
      .withWatermark("bucket", delay)
      .groupBy(col("event_type").as("symbol"), col("bucket"))
      .agg(
        min_by(col("value"), col("ts")).as("o"),
        max(col("value")).as("h"),
        min(col("value")).as("l"),
        max_by(col("value"), col("ts")).as("c"),
        count(lit(1)).as("v"))
      .select(col("symbol"), col("bucket").as("t"),
        col("o"), col("h"), col("l"), col("c"), col("v"))
  }

  /** T3 inside the stream: watermark-bounded key dedup.  The sink-side
    * upsert already makes duplicates harmless; this drops exact
    * duplicate bar updates *before* they reach the sink, with state
    * bounded by the watermark instead of growing forever — the
    * streaming form of the reference's deterministic-doc-id dedup. */
  def dedupedBars(bars: DataFrame, watermark: String = "30 days"): DataFrame =
    bars
      .withWatermark("t", watermark)
      .dropDuplicatesWithinWatermark("symbol", "t")

  /** Full streaming ingest: source → bars → canonicalize → upsert →
    * per-asset summary events (S5).  Update mode + keyed upsert sink =
    * exactly-once-per-key semantics via deterministic bar keys (the
    * reference's merge=True story).  When `eventsDir` is set, each
    * successful micro-batch appends one JSON summary message per asset
    * (`{event_type, payload{...}}`, the reference's Pub/Sub publish
    * after a successful write, `app/alpaca_service.py:237-258`) —
    * emitted AFTER the store merge, preserving the reference's
    * write-then-publish ordering.
    *
    * T7 under streaming: when `quarantineDir` is set, a second
    * streaming query routes raw events that violate
    * `Quarantine.eventRules()` — the SAME rule set as the batch
    * `ingest_quarantine` operator — to `quarantineDir`/events as
    * parquet rows carrying their `reject_reasons`, so a malformed
    * event is isolated without failing (or even touching) the bar
    * batch.  All three quarantine outputs and the summary feed are
    * `SinkRetention.appendDated` sinks (capture-date partitioned, no
    * file-sink manifest), so `SinkRetention.vacuum` gives every
    * side sink the same age-gated retention the bar store has.  It is a separate query because the rejects must be
    * captured at raw-event granularity, BEFORE the stateful window
    * aggregation that the main query's foreachBatch sees; both drain
    * under the same trigger (for `AvailableNow` the spec awaits both).
    * Inside foreachBatch, aggregated rows that `Canonicalize` would
    * silently drop (null bucket) are likewise quarantined to
    * `quarantineDir`/bars instead of vanishing — these are per-micro-
    * batch SNAPSHOTS of the (update-mode) aggregate row, stamped with
    * `batch_id` so a retried batch is distinguishable and a consumer
    * tallies one row per key at the max batch_id (the raw-event
    * capture in `quarantineDir`/events remains the authoritative
    * malformed-event record).  A canonicalize reject of the WHOLE
    * batch (missing timestamp column — a structurally different
    * schema) goes to `quarantineDir`/bars_structural rather than
    * throwing, so one malformed batch can never kill the query.
    *
    * Returns the main query AND the quarantine query (when
    * `quarantineDir` is set) so callers can await/stop/observe both —
    * a dropped handle would leak a running stream whose failure
    * nobody can see. */
  def start(spark: SparkSession, srcDir: String, storeDir: String,
      checkpointDir: String, timeframe: String = "Day",
      trigger: Trigger = Trigger.AvailableNow(),
      eventsDir: Option[String] = None,
      quarantineDir: Option[String] = None,
      eventSink: Option[graft.ingest.EventSink] = None)
      : (StreamingQuery, Option[StreamingQuery]) = {
    // eventsDir is the default-sink shorthand; both forms publish
    // through the same EventSink seam (S5) after the store write
    val sinks: Seq[graft.ingest.EventSink] =
      eventsDir.map(new graft.ingest.EventSink.DatedFileSink(_)).toSeq ++
        eventSink
    val quarantineQuery = quarantineDir.map { qd =>
      val (_, rejects) =
        Quarantine.split(readEvents(spark, srcDir), Quarantine.eventRules())
      // foreachBatch append (not the streaming file sink): the sink is
      // then a plain dated parquet dir with no _spark_metadata log, so
      // SinkRetention.vacuum can drop aged partitions without
      // orphaning a manifest.  At-least-once; batch_id enables dedup.
      rejects.writeStream
        .option("checkpointLocation", s"$checkpointDir/_quarantine")
        .outputMode("append")
        .trigger(trigger)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.ingest.SinkRetention.appendDated(
            batch.withColumn("batch_id", lit(batchId)), s"$qd/events")
        }
        .start()
    }
    val bars = streamingBars(readEvents(spark, srcDir), timeframe)
    bars.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Canonicalize.canonicalize(batch, timeframe) match {
          case Some(canonical) =>
            quarantineDir.foreach { qd =>
              val dropped = batch.filter(col("t").isNull)
              if (!dropped.isEmpty)
                graft.ingest.SinkRetention.appendDated(
                  dropped.withColumn("reject_reason", lit("null_bucket"))
                    .withColumn("batch_id", lit(batchId)), s"$qd/bars")
            }
            if (!canonical.isEmpty) {
              BarStore.merge(canonical, storeDir)
              if (sinks.nonEmpty) {
                val summaryEvents = graft.ingest.BarPipeline
                  .summaryEventJson(
                    graft.ingest.BarPipeline.ingestSummaries(canonical))
                sinks.foreach(_.publish(summaryEvents, batchId))
              }
            }
          case None => // structural reject: isolate, never throw (T7)
            quarantineDir.foreach { qd =>
              graft.ingest.SinkRetention.appendDated(
                batch.withColumn("reject_reason", lit("missing_timestamp"))
                  .withColumn("batch_id", lit(batchId)),
                s"$qd/bars_structural")
            }
        }
      }
      .start() -> quarantineQuery
  }
}
