package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.TextOps

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
  * needing exactness run the batch `Dedup.minhashLsh` + clusters pass
  * over the kept corpus, where candidates ARE verified.  Within a
  * single micro-batch, which member of a colliding set survives is
  * unspecified (state keeps the first row processed); across
  * micro-batches, earlier always wins — the same contract as
  * `dropDuplicatesWithinWatermark` itself.
  *
  * Scale notes: the stateful exchange ships (band, bkey, doc_id, ts)
  * rows — 8 narrow rows per document, never the payload — and state
  * holds one entry per distinct (band, bkey) inside the watermark
  * horizon, evicted as the watermark passes.  The kept set is emitted
  * as (window, doc_id) once the event-time window finalizes; callers
  * join doc_ids back to payloads instead of dragging document text
  * through two stateful shuffles.  Both stateful operators run in
  * append mode — the dedup → windowed-count chain is a supported
  * multiple-stateful-operator shape.
  */
object StreamingNearDedup {

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

  /** Streaming plan: docs must carry event-time `ingest_ts` and
    * `text`.  Emits one (window_start, doc_id) row per KEPT document
    * once the watermark passes its window — append mode throughout.
    *
    * `watermark` bounds both the dedup guarantee and the state size
    * (a near-duplicate arriving after the horizon passes again — size
    * it to the feed's duplicate-lag envelope, or finish with the
    * batch operator for an absolute guarantee, exactly as
    * `StreamingDedup`).  `windowDur` only batches result emission; it
    * does not affect which documents are kept.
    *
    * Keep-choice under OUT-OF-ORDER arrival: the stream keeps the
    * first-PROCESSED member of a colliding pair
    * (`dropDuplicatesWithinWatermark` semantics), while `batchKept`
    * keeps the smallest (ingest_ts, doc_id) — first by EVENT time.
    * On an in-order feed (what the spec pins) the two agree; when a
    * late doc with an earlier event time arrives inside the
    * watermark, the stream has already emitted its partner and keeps
    * it, so the kept SETS still deduplicate identically (exactly one
    * member of each collision survives) but may differ in WHICH
    * member.  Pipelines that require the event-time-canonical keeper
    * run `batchKept` over the settled window — the same
    * stream-then-batch finishing rule as the watermark note above. */
  def dedupDocs(docs: DataFrame, watermark: String = "30 days",
                windowDur: String = "1 hour"): DataFrame =
    bandRows(docs)
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("band", "bkey")
      .groupBy(window(col("ingest_ts"), windowDur), col("doc_id"))
      .agg(count(lit(1)).as("n_fresh_bands"))
      // kept ⟺ all bands were first-seen: a dropped doc's surviving
      // (fresh) bands still flow here but count < Bands
      .filter(col("n_fresh_bands") === TextOps.Bands)
      .select(col("window.start").as("window_start"), col("doc_id"))

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
}
