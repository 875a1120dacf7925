package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's E1 dataflow re-expressed as declarative Spark batch
  * operators over the `events` fixture stream (SURVEY.md §3 E1):
  * catalog scan → per-symbol tick scan → tumbling-window bar
  * construction (T5) → canonicalize → keyed dedup (T3) → summary agg
  * (A1) → run status (A2/A4).
  *
  * `events` stands in for the remote tick/bar source: `event_type` is
  * the symbol, `value` the trade price, one event one tick.
  *
  * Scale design: bar construction is a single map-side-combinable
  * groupBy on (symbol, bucket) — at 100 TB this is one shuffle keyed by
  * a low-cardinality symbol × time bucket; skewed symbols are handled
  * by AQE skew-split since the agg is algebraic (min_by/max_by/min/max/
  * count all have partial merge).
  */
object BarPipeline {

  /** S2+P5+P8: asset catalog derived from the observed symbols.
    * (Reference scans Firestore `assets`; here the catalog is the
    * distinct symbol set with the provider tag defaulted, and
    * null-symbol rows filtered with a logged skip.) */
  def assetCatalog(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type".as("symbol"))
      .filter($"symbol".isNotNull) // P5
      .distinct()
      .select(
        concat(lit("alpaca_"), $"symbol").as("asset_doc_id"),
        lit("alpaca").as("provider_doc_id"), // P8 provider predicate value
        $"symbol")
  }

  /** P8: provider equality predicate over the catalog — the
    * reference's commented-out `where("provider_doc_id","==","alpaca")`
    * (`app/alpaca_service.py:85`) implemented as a real option. */
  def filterByProvider(catalog: DataFrame, provider: String): DataFrame =
    catalog.filter(col("provider_doc_id") === provider)

  /** T5: tumbling-window OHLCV bar construction from ticks.
    * open/close are min_by/max_by on the event timestamp — true
    * time-ordered first/last, not positional (SURVEY §2.4 A1 note).
    * Deterministic because (symbol, ts) is unique in the fixtures. */
  /** `date_trunc` unit of a timeframe label — shared by bar bucketing
    * and the incremental cutoff so the two can never disagree on
    * where a bucket starts. */
  private[ingest] def truncUnit(timeframe: String): String = timeframe match {
    case "Day"    => "day"
    case "Hour"   => "hour"
    case "Minute" => "minute"
    case "Week"   => "week"
    case "Month"  => "month"
    case other    => throw new IllegalArgumentException(s"timeframe $other")
  }

  def barsFromTicks(events: DataFrame, timeframe: String = "Day"): DataFrame = {
    val bucket = date_trunc(truncUnit(timeframe), col("ts"))
    events
      .filter(col("event_type").isNotNull) // P5
      .groupBy(col("event_type").as("symbol"), bucket.as("t"))
      .agg(
        min_by(col("value"), col("ts")).as("o"),
        max(col("value")).as("h"),
        min(col("value")).as("l"),
        max_by(col("value"), col("ts")).as("c"),
        count(lit(1)).as("v"))
  }

  /** Raw bars → canonical schema (never None here: `t` is present). */
  def canonicalBars(spark: SparkSession, dir: String,
      timeframe: String = "Day"): DataFrame =
    Canonicalize.canonicalize(
      barsFromTicks(Tables.events(spark, dir), timeframe), timeframe).get

  /** T3: the overlapping-refetch + idempotent-upsert dedup semantics.
    * Two overlapping trailing windows are re-fetched and unioned; the
    * deterministic key makes the union collapse under dropDuplicates —
    * re-running an ingest is a no-op.  At scale this is sink-side
    * MERGE; here the dedup itself is the observable operator. */
  def overlappingIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val w1 = ev.filter($"ts" < to_timestamp(lit("2024-01-21")))
    val w2 = ev.filter($"ts" >= to_timestamp(lit("2024-01-11")))
    val bars1 = Canonicalize.canonicalize(barsFromTicks(w1), "Day").get
    val bars2 = Canonicalize.canonicalize(barsFromTicks(w2), "Day").get
    // Overlap days straddling the window edges differ (partial buckets)
    // — last-write-wins like the reference's merge=True re-upsert: keep
    // the w2 (newer fetch) version of a duplicated key.
    bars1.withColumn("fetch_seq", lit(1))
      .unionByName(bars2.withColumn("fetch_seq", lit(2)))
      .groupBy($"symbol", $"bar_key")
      .agg(
        max_by(struct($"timestamp", $"timeframe", $"open", $"high",
          $"low", $"close", $"volume"), $"fetch_seq").as("bar"))
      .select($"symbol", $"bar_key", $"bar.timestamp".as("timestamp"),
        $"bar.timeframe".as("timeframe"), $"bar.open".as("open"),
        $"bar.high".as("high"), $"bar.low".as("low"),
        $"bar.close".as("close"), $"bar.volume".as("volume"))
  }

  /** Incremental re-ingest with a per-asset high-water mark: instead of
    * re-fetching the whole trailing window every run (`overlappingIngest`
    * — the reference's own full-refetch shape, `app/alpaca_service.py:
    * 117-118`), read the store's max ingested bar timestamp per asset
    * and scan only the tick tail that can still produce new or changed
    * bars.
    *
    * Two-level pruning, both scale-critical at 100 TB:
    *  - the MINIMUM high-water mark across assets (one collected scalar,
    *    like the k-means codebook) becomes a LITERAL `ts >=` predicate,
    *    so it reaches the source scan as a pushed filter / partition
    *    prune — the second run's scan is a strict subset of the first;
    *  - a broadcast join against the (tiny, one row per asset) watermark
    *    relation then trims each asset to its OWN tail, so one lagging
    *    asset doesn't inflate every other asset's re-read beyond the
    *    scan that the global cutoff admitted.
    *
    * Bar timestamps are bucket starts, so each per-asset cutoff
    * (`hwm − overlapDays`) stays on a bucket boundary: every recomputed
    * bucket sees ALL of its ticks, never a partial suffix — the
    * recomputed bars are bit-identical to a full-history run over those
    * days (IncrementalIngestSpec pins store ≡ one-shot ingest).
    * `overlapDays` absorbs late ticks inside already-ingested buckets
    * (the reference's overlap-refetch semantics); the key-level
    * `BarStore.merge` makes re-landing the overlap idempotent.
    *
    * Symbols absent from the store (new listings) have no watermark and
    * need their FULL history — which no single ts-pruned scan can
    * deliver — so they bootstrap through a separate anti-join branch
    * with no time bound.  On a stable catalog that branch produces zero
    * rows; pipelines whose catalog cannot grow between runs set
    * `newSymbolBootstrap = false` and skip its scan entirely (at the
    * 100 TB layout the tick source is partitioned by symbol, so the
    * anti branch prunes to the new symbols' directories anyway).
    * Returns the merged tail bars. */
  def incrementalIngest(events: DataFrame, storePath: String,
      overlapDays: Int = 1, timeframe: String = "Day",
      newSymbolBootstrap: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, min => fmin}
    val spark = events.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(storePath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // bootstrap on a missing OR empty path (a just-created directory is
    // not a store), not merely a missing one
    if (!fs.exists(hPath) || fs.listStatus(hPath).isEmpty) {
      val bars = Canonicalize
        .canonicalize(barsFromTicks(events, timeframe), timeframe).get
      BarStore.upsert(bars, storePath)
      bars
    } else {
      // materialize the tail BEFORE merging: the tail's plan reads the
      // store (for the watermark) that the merge is about to rewrite,
      // so the returned frame must not re-execute that lineage
      val bars = incrementalTail(events, BarStore.read(spark, storePath),
        overlapDays, timeframe, newSymbolBootstrap).localCheckpoint(true)
      BarStore.merge(bars, storePath)
      bars
    }
  }

  /** The pure (lazy) tail plan of `incrementalIngest`, split out so its
    * shape can be asserted before any merge executes: per-asset
    * watermark agg → literal global cutoff (pushed into the scan) →
    * broadcast per-asset trim → optional new-symbol anti branch →
    * canonical bars. */
  private[ingest] def incrementalTail(events: DataFrame, store: DataFrame,
      overlapDays: Int, timeframe: String,
      newSymbolBootstrap: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, min => fmin}
    // Snap the cutoff to a BUCKET boundary of the configured
    // timeframe: `max(timestamp) - overlapDays` lands mid-bucket for
    // Week/Month (Monday − 1 day is Sunday of the previous week), and
    // a bar recomputed from a partial tick suffix would silently
    // overwrite the correct stored bar via the newer-wins merge.
    // Truncating to the bucket start makes every recomputed bucket
    // complete; for Day/Hour/Minute the truncation is a no-op.
    val hwm = store
      .groupBy(col("symbol"))
      .agg(date_trunc(truncUnit(timeframe),
        date_sub(max(col("timestamp")), overlapDays)).as("cutoff"))
    val globalCutoff = hwm.agg(fmin(col("cutoff"))).head.getTimestamp(0)
    val known = events
      .filter(col("ts") >= lit(globalCutoff))
      .join(broadcast(hwm), events("event_type") === hwm("symbol"))
      .filter(col("ts") >= col("cutoff"))
      .drop("symbol", "cutoff")
    val tail =
      if (!newSymbolBootstrap) known
      else known.unionByName(events.join(broadcast(hwm),
        events("event_type") === hwm("symbol"), "left_anti"))
    Canonicalize.canonicalize(barsFromTicks(tail, timeframe), timeframe).get
  }

  /** A1+F2: per-asset ingest summary — true min/max of the batch window
    * as ISO strings plus the bar count (the Pub/Sub payload fields,
    * ref `app/alpaca_service.py:246-248`). */
  def ingestSummaries(bars: DataFrame): DataFrame =
    bars.groupBy(col("symbol").as("asset_symbol"), col("timeframe"))
      .agg(
        date_format(min(col("timestamp")), "yyyy-MM-dd'T'HH:mm:ss'Z'")
          .as("start_timestamp_utc"),
        date_format(max(col("timestamp")), "yyyy-MM-dd'T'HH:mm:ss'Z'")
          .as("end_timestamp_utc"),
        count(lit(1)).as("bars_count"))

  /** S5/F6: summary rows → JSON event messages (tested in ScalaTest;
    * JSON string formatting is engine-specific so not oracle-checked). */
  def summaryEventJson(summaries: DataFrame): DataFrame =
    summaries.select(
      lit("HistoricalDataUpdated").as("event_type"),
      to_json(struct(
        col("asset_symbol"), col("timeframe"),
        col("start_timestamp_utc"), col("end_timestamp_utc"),
        col("bars_count"))).as("message"))

  /** A2/A4: run-level status record over a completed batch. */
  def runStatus(bars: DataFrame): DataFrame =
    bars.agg(
      countDistinct(col("symbol")).as("assets_processed_count"),
      count(lit(1)).as("total_bars_saved_in_last_run"),
      // A4: OR-fold of per-asset failures; the declarative pipeline has
      // no partial failures (they quarantine upstream, T7) so this is
      // the no-error fold over saved rows.
      (sum(when(col("volume").isNull, 1L).otherwise(0L)) > 0)
        .as("run_had_errors"))
}
