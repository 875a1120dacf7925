package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication of a document feed — the online
  * counterpart of `ops.Dedup.exact` for a training-data ingest
  * pipeline: the first occurrence of a content digest passes through,
  * and duplicates arriving within the watermark horizon of it (same
  * batch or a later one) are dropped.  A duplicate arriving AFTER the
  * horizon passes again — bounded state necessarily bounds the dedup
  * guarantee; size the watermark to the feed's duplicate-lag envelope,
  * or finish with a batch `Dedup.exact` pass for an absolute
  * guarantee.
  *
  * The digest is the same normalization + md5 as the batch operator
  * (whitespace-collapsed lowercase text), so a corpus ingested within
  * the horizon equals the batch-deduped corpus (spec-verified).
  *
  * Scale notes: state is one row per distinct digest inside the
  * watermark horizon — `dropDuplicatesWithinWatermark` evicts state
  * once the ingest-time watermark passes, so an unbounded feed holds
  * bounded state (the same T3/T4 bounded-window story as the bar
  * ingest).  The digest is computed BEFORE the stateful operator, so
  * the exchange ships 16-byte digests, not document payloads.
  */
object StreamingDedup {

  /** Normalized content digest — identical to Dedup.exactSql's
    * md5(regexp_replace(trim(lower(text)), '\s+', ' ')). */
  def digest(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** docs must carry an event-time column `ingest_ts` and a `text`
    * column; emits first-seen rows with their digest attached. */
  def dedupDocs(docs: DataFrame, watermark: String = "30 days"): DataFrame =
    docs
      .withColumn("digest", digest(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("digest")
}
