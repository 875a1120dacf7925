package graft.ingest

import java.nio.file.{Files, Paths}
import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Incremental re-ingest watermark: the second run scans only the tick
  * tail (pushed literal cutoff — plan-asserted), rewrites a strict
  * subset of the store's date partitions, and lands byte-identical
  * content to a one-shot full-history ingest.  A third run over the
  * same events is a no-op on store content. */
class IncrementalIngestSpec extends SparkSuite {
  import spark.implicits._

  private def storeRows(path: String): Seq[Seq[Any]] =
    BarStore.read(spark, path)
      .select("symbol", "bar_key", "timestamp", "timeframe",
        "open", "high", "low", "close", "volume", "bar_date")
      .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.toString()).toSeq

  /** The fixture stores `ts` as a nanos long, which `Tables.events`
    * converts with timestamp_micros — a derived column no filter can
    * push through.  Re-materialize once with a native timestamp column
    * (the production layout) so the watermark cutoff can reach the
    * scan's PushedFilters. */
  private lazy val eventsSrc: String = {
    val src = Files.createTempDirectory("incr_events").toString + "/events"
    Tables.events(spark, sf()).write.parquet(src)
    src
  }

  test("incremental run prunes the scan, rewrites a partition subset, " +
      "and equals a one-shot ingest") {
    val store = Files.createTempDirectory("incr_store").toString
    val oneShot = Files.createTempDirectory("full_store").toString
    val ev = spark.read.parquet(eventsSrc)
    val split = to_timestamp(lit("2024-01-16 00:00:00"))

    // run 1: bootstrap from the first half of history (store absent →
    // full ingest of what exists so far)
    val bars1 = BarPipeline.incrementalIngest(ev.filter($"ts" < split), store)
    val allDates1 = bars1.select(to_date($"timestamp")).distinct().count()
    assert(allDates1 > 3)

    // snapshot an early partition's files before the incremental run —
    // dynamic overwrite must not rewrite untouched dates
    val earlyDir = BarStore.read(spark, store)
      .agg(min($"bar_date")).head.getDate(0).toString
    val earlyFiles = Paths.get(store, s"bar_date=$earlyDir")
    val before = Files.list(earlyFiles).toArray.map(_.toString).sorted.toSeq
    val mtimes = before.map(f => Files.getLastModifiedTime(Paths.get(f)))

    // (a) the events scan carries the literal watermark cutoff as a
    // pushed filter — the re-run reads a strict subset of the source
    // (asserted on the pure tail plan before any merge rewrites the
    // store the plan reads)
    val plan = BarPipeline.incrementalTail(ev, BarStore.read(spark, store),
      1, "Day", true).queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts,2024-01-1"), plan.take(2000))

    // run 2: full history arrives; only the tail may be scanned
    val bars2 = BarPipeline.incrementalIngest(ev, store)

    // (b) the recomputed bars cover a strict subset of all bar dates
    val dates2 = bars2.select(to_date($"timestamp")).distinct().count()
    val allDates = BarStore.read(spark, store)
      .select($"bar_date").distinct().count()
    assert(dates2 < allDates, s"tail covered $dates2 of $allDates dates")

    // (c) untouched early partition was not rewritten
    val after = Files.list(earlyFiles).toArray.map(_.toString).sorted.toSeq
    assert(after == before)
    assert(before.zip(mtimes).forall { case (f, t) =>
      Files.getLastModifiedTime(Paths.get(f)) == t })

    // (d) store content equals a one-shot full-history ingest
    BarStore.upsert(BarPipeline.canonicalBars(spark, sf()), oneShot)
    assert(storeRows(store) == storeRows(oneShot))

    // run 3: nothing new — store content must not change (idempotent
    // re-land of the overlap through the key-level merge)
    val snapshot = storeRows(store)
    BarPipeline.incrementalIngest(ev, store)
    assert(storeRows(store) == snapshot)
  }

  test("weekly incremental re-ingest recomputes full buckets, not partial tails") {
    val store = Files.createTempDirectory("incr_week").toString
    val oneShot = Files.createTempDirectory("full_week").toString
    val ev = spark.read.parquet(eventsSrc)
    // split mid-week: the naive cutoff (max stored ts − 1 day) lands
    // INSIDE the previous week's bucket and would rebuild that week's
    // bar from a one-day tick suffix, clobbering the correct bar via
    // the newer-wins merge — the snapped cutoff recomputes the whole
    // bucket instead
    val split = to_timestamp(lit("2024-01-16 00:00:00"))
    BarPipeline.incrementalIngest(ev.filter($"ts" < split), store,
      timeframe = "Week")
    BarPipeline.incrementalIngest(ev, store, timeframe = "Week")
    BarPipeline.incrementalIngest(ev, oneShot, timeframe = "Week")
    assert(storeRows(store) == storeRows(oneShot))
  }

  test("a symbol absent from the store keeps its full history") {
    val store = Files.createTempDirectory("incr_store_new").toString
    val ev = spark.read.parquet(eventsSrc)
    val symbols = ev.select($"event_type").distinct()
      .collect().map(_.getString(0)).sorted
    val held = symbols.head
    // bootstrap without one symbol, then re-ingest with it present
    BarPipeline.incrementalIngest(ev.filter($"event_type" =!= held), store)
    assert(BarStore.read(spark, store)
      .filter($"symbol" === held).count() == 0)
    BarPipeline.incrementalIngest(ev, store)
    val oneShot = Files.createTempDirectory("full_store_new").toString
    BarStore.upsert(BarPipeline.canonicalBars(spark, sf()), oneShot)
    assert(storeRows(store) == storeRows(oneShot))
  }
}
