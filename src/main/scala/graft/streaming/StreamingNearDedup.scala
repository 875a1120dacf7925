package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.ops.{Dedup, TextOps}

/** Streaming near-duplicate deduplication of a document feed — the
  * online counterpart of `ops.Dedup.minhashLsh` for a training-data
  * curation pipeline.  A document is KEPT iff none of its 8 MinHash
  * LSH band keys (the same 32-permutation, 8×4 banding as the batch
  * operator, computed by the native `graft_minhash` expression) has
  * been seen within the watermark horizon; a dropped document still
  * registers its non-colliding band keys, so a chain A ← B ← C (B
  * collides with A, C only with B) keeps exactly its first element —
  * the same greedy first-occurrence resolution a batch pass over the
  * arrival order produces (`batchKept` below is that mirror, pinned
  * stream ≡ batch by StreamingNearDedupSpec).
  *
  * Semantics are CANDIDATE-level, like every streaming LSH dedup: a
  * band collision declares a near-duplicate without re-verifying true
  * Jaccard against the earlier document (that would require streaming
  * the gram sets into per-key state — unbounded rows per key).  With
  * 8 bands × 4 rows, a pair at true Jaccard j collides with
  * probability 1−(1−j⁴)⁸ ≈ 1 for j ≥ 0.8 but ~6% at j = 0.3, so a
  * small fraction of merely-similar documents is dropped; pipelines
  * needing exactness run `compact` below — the packaged finishing
  * pass that reconciles the streamed result against the absolute
  * batch operator over a settled window.
  *
  * Keeper choice is DETERMINISTIC: band-key registration runs in a
  * `transformWithState` processor that elects the minimum
  * (ingest_ts, doc_id) holder among a micro-batch's rows for a key
  * (the whole batch's rows for one key arrive as one iterator), so
  * re-running the same feed always keeps the same members — the
  * first-PROCESSED batch still wins across micro-batches (immediate
  * registration, exactly like `dropDuplicatesWithinWatermark`), and
  * within a batch the winner is event-time canonical instead of
  * processing-order luck.  A late doc with an earlier event time
  * arriving in a LATER micro-batch (inside the watermark) loses to
  * the already-registered key; the kept sets still deduplicate
  * correctly (exactly one member of each collision survives) and
  * `compact` restores the event-time-canonical choice over the
  * settled window.
  *
  * Scale notes: the stateful exchange ships (band, bkey, doc_id, ts)
  * rows — 8 narrow rows per document, never the payload — and state
  * holds ONE long (the registered key's event time) per distinct
  * (band, bkey) inside the watermark horizon, evicted by an
  * event-time timer when the watermark passes ts + horizon (the same
  * eviction rule as `dropDuplicatesWithinWatermark`).  The kept set
  * is emitted as (window, doc_id) once the event-time window
  * finalizes; callers join doc_ids back to payloads instead of
  * dragging document text through two stateful shuffles.  Both
  * stateful operators run in append mode — transformWithState with a
  * re-declared event-time output column chained into a windowed
  * aggregation is a supported multiple-stateful-operator shape (it
  * requires the RocksDB state store provider; `dedupDocs` installs it
  * on the session when the default HDFS provider is still active).
  */
object StreamingNearDedup {

  /** One banded signature row of a document. */
  case class BandRow(doc_id: Long, ingest_ts: Timestamp, band: Int, bkey: String)

  /** Keyed band-key registry: first batch to present a key registers
    * it and emits the batch's event-time-minimal holder; later
    * batches within the horizon emit nothing for it.  State is one
    * long per live key; an event-time timer at ts + horizon clears it
    * when the watermark passes — `dropDuplicatesWithinWatermark`
    * semantics with a deterministic within-batch winner. */
  private class BandKeyDedupProcessor(horizonMs: Long)
      extends StatefulProcessor[(Int, String), BandRow, BandRow] {
    @transient private var seen: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong,
        TTLConfig.NONE)
    override def handleInputRows(key: (Int, String),
        rows: Iterator[BandRow], tv: TimerValues): Iterator[BandRow] = {
      if (seen.exists()) Iterator.empty
      else {
        val w = rows.minBy(r => (r.ingest_ts.getTime, r.doc_id))
        seen.update(w.ingest_ts.getTime)
        getHandle.registerTimer(w.ingest_ts.getTime + horizonMs)
        Iterator.single(w)
      }
    }
    override def handleExpiredTimer(key: (Int, String), tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[BandRow] = {
      seen.clear(); Iterator.empty
    }
  }

  /** Band key for band `b` over a `graft_minhash` signature array
    * (1-based `element_at`), components '_'-joined — the same banding
    * as the batch operator's bandKey.  A NULL signature (empty gram
    * set — fewer than 3 tokens) gets a per-document unique key, so
    * such documents never collide and are always kept, matching the
    * batch operator's emits-no-pair contract for empty gram sets
    * ('e' prefix keeps the namespace disjoint from numeric keys). */
  def bandKey(mh: Column, docId: Column, b: Int): Column =
    when(mh.isNull, concat(lit("e"), docId.cast("string")))
      .otherwise(concat_ws("_",
        (0 until TextOps.RowsPerBand).map(r =>
          element_at(mh, b * TextOps.RowsPerBand + r + 1).cast("string")): _*))

  /** docs(doc_id, ingest_ts, text) → one (doc_id, ingest_ts, band,
    * bkey) row per band: a narrow projection (native tokenize →
    * shingle → minhash, then an 8-struct inline) with no shuffle —
    * shared by the streaming plan and the batch mirror. */
  def bandRows(docs: DataFrame): DataFrame = {
    val sig = docs.withColumn("mh",
      expr("graft_minhash(graft_shingles3(graft_tokens(text)))"))
    sig.select(col("doc_id"), col("ingest_ts"),
        explode(array((0 until TextOps.Bands).map(b =>
          struct(lit(b).as("band"),
            bandKey(col("mh"), col("doc_id"), b).as("bkey"))): _*)).as("bb"))
      .select(col("doc_id"), col("ingest_ts"),
        col("bb.band").as("band"), col("bb.bkey").as("bkey"))
  }

  /** Watermark delay string → milliseconds, via Spark's own interval
    * parser so the timer horizon can never drift from the watermark
    * the plan actually applies.  Month-based delays are rejected (no
    * fixed millisecond width). */
  private def delayMs(watermark: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(watermark))
    require(iv.months == 0,
      s"month-based watermark '$watermark' has no fixed ms width")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  private val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** transformWithState requires the RocksDB state store.  Install it
    * when the session still runs the default HDFS provider; an
    * explicitly configured third-party provider is respected (and the
    * query start will fail with Spark's own error if incompatible). */
  private def ensureRocksDb(spark: SparkSession): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val cur = spark.conf.get(key, "")
    if (cur.isEmpty || cur.endsWith("HDFSBackedStateStoreProvider"))
      spark.conf.set(key, RocksDbProvider)
  }

  /** Streaming plan: docs must carry event-time `ingest_ts` and
    * `text`.  Emits one (window_start, doc_id) row per KEPT document
    * once the watermark passes its window — append mode throughout.
    *
    * `watermark` bounds both the dedup guarantee and the state size
    * (a near-duplicate arriving after the horizon passes again — size
    * it to the feed's duplicate-lag envelope, or finish with `compact`
    * for an absolute guarantee, exactly as `StreamingDedup`).
    * `windowDur` only batches result emission; it does not affect
    * which documents are kept.
    *
    * Keep-choice: within a micro-batch, event-time canonical
    * (deterministic — see header); across micro-batches, the first
    * PROCESSED batch wins, so a late doc with an earlier event time
    * keeps its already-emitted partner.  Pipelines that require the
    * event-time-canonical keeper across out-of-order batches run
    * `compact` over the settled window. */
  def dedupDocs(docs: DataFrame, watermark: String = "30 days",
                windowDur: String = "1 hour",
                assignWatermark: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    ensureRocksDb(spark)
    import spark.implicits._
    // assignWatermark = false is the CHAINED mode: the input already
    // carries an event-time-annotated ingest_ts (e.g. window_time() of
    // an upstream aggregation) whose watermark propagates from the
    // query's source-side withWatermark.  Re-marking here would create
    // a second watermark node that only ever observes old window
    // starts — its watermark never advances and the final aggregation
    // deadlocks (never emits).
    val banded = bandRows(docs)
    (if (assignWatermark) banded.withWatermark("ingest_ts", watermark)
     else banded)
      .as[BandRow]
      .groupByKey(r => (r.band, r.bkey))
      .transformWithState(new BandKeyDedupProcessor(delayMs(watermark)),
        "ingest_ts", OutputMode.Append())
      .groupBy(window(col("ingest_ts"), windowDur), col("doc_id"))
      .agg(count(lit(1)).as("n_fresh_bands"))
      // kept ⟺ all bands were first-seen: a dropped doc's surviving
      // (fresh) bands still flow here but count < Bands
      .filter(col("n_fresh_bands") === TextOps.Bands)
      .select(col("window.start").as("window_start"), col("doc_id"))
  }

  /** Batch mirror of the streaming semantics over a bounded set of
    * arrivals: a document is dropped iff some strictly-earlier
    * document (by (ingest_ts, doc_id) — the arrival order) shares a
    * band key with it, whether or not that document was itself kept.
    * Used by the spec to pin stream ≡ batch, and by pipelines as the
    * bootstrap pass over a historical corpus before the stream takes
    * over.  One self-join on (band, bkey) — band buckets bound the
    * fan-out exactly as in the batch LSH operator. */
  def batchKept(docs: DataFrame): DataFrame = {
    val bands = bandRows(docs)
    val dropped = bands.as("d")
      .join(bands.as("e"),
        col("d.band") === col("e.band") && col("d.bkey") === col("e.bkey") &&
          (col("e.ingest_ts") < col("d.ingest_ts") ||
            (col("e.ingest_ts") === col("d.ingest_ts") &&
              col("e.doc_id") < col("d.doc_id"))))
      .select(col("d.doc_id")).distinct()
    docs.join(dropped, Seq("doc_id"), "left_anti").select("doc_id")
  }

  /** Wire the full streaming pipeline against a `compact`-shaped
    * store: one query archives the raw feed to `store/feed` (the
    * relation the batch finishing pass re-reads), one runs `dedupDocs`
    * into `store/kept` — exactly the layout `compact` and `keptView`
    * consume, so the stream→compact lifecycle is producible end to end
    * by the library instead of hand-assembled sinks.  Two independent
    * queries over the same source (each tracks its own offsets);
    * callers run `compact(store, settledBefore)` on a cadence once the
    * watermark has passed the boundary. */
  def startPipeline(docs: DataFrame, store: String,
      watermark: String = "30 days", windowDur: String = "1 hour",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)):
      (org.apache.spark.sql.streaming.StreamingQuery,
       org.apache.spark.sql.streaming.StreamingQuery) = {
    val feedQ = docs.writeStream.format("parquet")
      .option("path", s"$store/feed")
      .option("checkpointLocation", s"$store/_ckpt_feed")
      .outputMode("append").trigger(trigger).start()
    val keptQ = dedupDocs(docs, watermark, windowDur)
      .writeStream.format("parquet")
      .option("path", s"$store/kept")
      .option("checkpointLocation", s"$store/_ckpt_kept")
      .outputMode("append").trigger(trigger).start()
    (feedQ, keptQ)
  }

  // ------------------------------------- batch finishing pass (compact)

  /** Event-time window start of `ts` under Spark's own epoch-aligned
    * bucketing — `window()` in a plain projection, so the compaction
    * boundaries can never disagree with the streaming plan's windows. */
  private def windowStart(ts: Column, windowDur: String): Column =
    window(ts, windowDur).getField("start")

  /** The ABSOLUTE batch dedup result over a bounded feed
    * (doc_id, ingest_ts, text): `Dedup.canonicalKeepers` — verified
    * MinHash-LSH pairs (exact Jaccard ≥ 0.5) → connected components →
    * keep the min-(ingest_ts, doc_id) member per cluster; documents
    * in no verified pair keep themselves.  Output
    * (window_start, doc_id) mirrors `dedupDocs` so the two results
    * are directly comparable / storable in the same table.
    *
    * This is the ground truth the streaming operator's candidate-level
    * semantics approximate: it re-admits band collisions that fail
    * Jaccard verification, and its keeper is event-time canonical per
    * CLUSTER rather than per arrival-order greedy chain (so
    * out-of-order stream keepers get replaced).  Candidate recall is
    * NOT extended — verified pairs come from the same banding, so a
    * pair whose bands never collide is invisible to both passes. */
  def canonicalKept(docs: DataFrame, windowDur: String = "1 hour"): DataFrame =
    Dedup.canonicalKeepers(docs)
      .select(windowStart(col("ingest_ts"), windowDur).as("window_start"),
        col("doc_id"))

  /** Reconciliation decisions for a settled feed: full-outer the
    * stream-kept set against `canonicalKept` and label every involved
    * document —
    *  - `keep`: kept by both (nothing to do);
    *  - `readmit`: canonical but not stream-kept (a false drop — band
    *    collision that failed Jaccard verification, or a non-canonical
    *    chain resolution);
    *  - `evict`: stream-kept but not canonical (a keeper the
    *    event-time-canonical cluster-level resolution replaced — e.g.
    *    the stream kept the first-processed member of an out-of-order
    *    pair).
    * `streamKept` is the (window_start, doc_id) output of `dedupDocs`
    * restricted to the same settled feed. */
  def compactActions(docs: DataFrame, streamKept: DataFrame,
                     windowDur: String = "1 hour"): DataFrame =
    actionsFrom(canonicalKept(docs, windowDur), streamKept)

  /** Reconciliation from an already-computed canonical kept relation —
    * `compact` materializes the canonical result once and feeds it to
    * both the store write and this join. */
  private def actionsFrom(canonical: DataFrame,
                          streamKept: DataFrame): DataFrame =
    canonical
      .select(col("doc_id"), col("window_start").as("canon_ws"))
      .join(streamKept.select(col("doc_id"),
        col("window_start").as("stream_ws")), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("canon_ws"), col("stream_ws")).as("window_start"),
        when(col("canon_ws").isNotNull && col("stream_ws").isNotNull, "keep")
          .when(col("canon_ws").isNotNull, "readmit")
          .otherwise("evict").as("action"))

  /** Store-level compaction job — the packaged stream-then-batch
    * finishing rule (the reference's sink-side re-reconciliation,
    * `app/alpaca_service.py:194,207`, generalized to near-dup
    * semantics).  Store layout (all parquet under `store`):
    *  - `feed/`  — the raw archived feed (doc_id, ingest_ts, text),
    *    written by the caller's archive sink alongside the dedup
    *    stream (the standard stream+batch dual-sink shape);
    *  - `kept/`  — the streaming `dedupDocs` output
    *    (window_start, doc_id);
    *  - `kept_compacted/` — this job's output: the canonical kept set
    *    for every settled window (overwritten per run);
    *  - `compact_cutoff`  — one-line marker file holding the settle
    *    boundary of the last run (ISO instant), so `keptView` knows
    *    where compacted truth ends and live stream output begins.
    *
    * `settledBefore` is aligned DOWN to a window boundary (via the
    * same `window()` bucketing as the stream) and must trail the
    * stream's watermark: windows at or beyond the boundary may still
    * be open.  The job recomputes the canonical result over the whole
    * settled range — the absolute guarantee has no incremental form
    * without cluster-boundary bookkeeping; callers with append-only
    * feeds bound the cost by archiving `feed/` in settled partitions
    * and compacting on a cadence ≫ trigger interval.  Runs are
    * idempotent (same inputs → same overwrite).
    *
    * Returns the reconciliation actions (doc_id, window_start,
    * action) so callers can propagate evictions/readmissions to
    * downstream consumers of the kept set. */
  /** Marker contents: the settle cutoff and the versioned directory
    * currently serving as compacted truth.  Publishing is two-phase —
    * write the new `kept_compacted_v<N>` dir, then swap the marker via
    * tmp-file + delete + rename — so a reader sees the previous
    * consistent (cutoff, version) pair until the swap lands, and a
    * crash mid-swap degrades to the no-marker (live-only) view rather
    * than mixing cutoffs with the wrong version's rows. */
  private case class CompactMarker(cutoff: Timestamp, versionDir: String)

  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
      store: String): Option[CompactMarker] = {
    val p = new org.apache.hadoop.fs.Path(store, "compact_cutoff")
    if (!fs.exists(p)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(buf) finally in.close()
      // Parse defensively: a malformed or partially visible marker
      // (e.g. non-atomic rename on object stores) must degrade to the
      // documented no-marker live-only view, not throw.
      scala.util.Try {
        val Array(cut, dir) = new String(buf, "UTF-8").trim.split("\n")
        CompactMarker(Timestamp.from(java.time.Instant.parse(cut)), dir)
      }.toOption
    }
  }

  /** CONTRACT — single writer: `compact` assumes at most one run per
    * store at a time (the intended deployment is one scheduled
    * maintenance job, mirroring the single-owner ingest loop).  Two
    * concurrent runs could both read marker version N and race on
    * `kept_compacted_v(N+1)`; nothing in-band prevents that, so
    * callers owning multiple schedulers must serialize externally.
    * Readers are protected from the *writer* by the marker swap plus
    * a retirement grace: the `graceVersions` most recent superseded
    * version dirs are retained, so a reader that resolved an older
    * marker keeps a consistent snapshot for that many further
    * compaction cycles (compaction cadence ≫ query time by design). */
  def compact(spark: SparkSession, store: String,
              settledBefore: Timestamp,
              windowDur: String = "1 hour",
              graceVersions: Int = 2): DataFrame = {
    import org.apache.hadoop.fs.Path
    val aligned = spark.range(1)
      .select(windowStart(lit(settledBefore), windowDur))
      .head().getTimestamp(0)
    val feed = spark.read.parquet(s"$store/feed")
      .filter(col("ingest_ts") < lit(aligned))
    val streamKept = spark.read.parquet(s"$store/kept")
      .filter(col("window_start") < lit(aligned))
    // the canonical pass (LSH verify + connected components) is the
    // dominant cost: materialize it ONCE and derive both the store
    // write and the reconciliation join from the checkpointed copy
    val canonical = canonicalKept(feed, windowDur).localCheckpoint()
    val fs = new Path(store).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val prev = readMarker(fs, store)
    // next version = 1 + max over marker AND on-disk dirs: a corrupt
    // marker must not reset the counter onto a dir a grace reader
    // may still be scanning
    val diskVersions = Option(
        fs.globStatus(new Path(store, "kept_compacted_v*")))
      .getOrElse(Array.empty)
      .flatMap(s => "_v(\\d+)$".r.findFirstMatchIn(s.getPath.getName)
        .map(_.group(1).toInt))
    val markerVersion = prev.map(_.versionDir)
      .flatMap(d => "_v(\\d+)$".r.findFirstMatchIn(d).map(_.group(1).toInt))
    val version = (diskVersions ++ markerVersion).foldLeft(0)(_ max _) + 1
    val versionDir = s"kept_compacted_v$version"
    canonical.write.mode("overwrite").parquet(s"$store/$versionDir")
    // two-phase marker swap: tmp write, delete old, rename into place
    val marker = new Path(store, "compact_cutoff")
    val tmp = new Path(store,
      "compact_cutoff_tmp_" + java.util.UUID.randomUUID().toString)
    val out = fs.create(tmp, true)
    try out.write(
      s"${aligned.toInstant}\n$versionDir".getBytes("UTF-8"))
    finally out.close()
    fs.delete(marker, false)
    fs.rename(tmp, marker)
    // retire superseded versions, keeping the `graceVersions` most
    // recent as grace copies for readers that resolved an older
    // marker mid-query (see the single-writer contract above)
    val old = fs.globStatus(new Path(store, "kept_compacted_v*"))
    if (old != null) {
      val byVer = old.flatMap { s =>
        "_v(\\d+)$".r.findFirstMatchIn(s.getPath.getName)
          .map(m => (m.group(1).toInt, s.getPath))
      }.sortBy(-_._1)
      byVer.filter(_._1 != version).drop(graceVersions)
        .foreach(p => fs.delete(p._2, true))
    }
    actionsFrom(canonical, streamKept)
  }

  /** The reconciled kept set: compacted canonical truth below the
    * last compaction cutoff, live stream output at and above it.
    * Before any compaction runs — or in the marker-less crash window —
    * this is just the stream output. */
  def keptView(spark: SparkSession, store: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val live = spark.read.parquet(s"$store/kept")
    readMarker(fs, store) match {
      case None => live
      case Some(m) =>
        spark.read.parquet(s"$store/${m.versionDir}")
          .unionByName(live.filter(col("window_start") >= lit(m.cutoff)))
    }
  }
}
