package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Similarity

/** Online maintenance of a caller-managed IVF store from an embedding
  * stream: each micro-batch of (vec_id, embedding) rows is assigned to
  * the store's fixed codebook and appended as new list files
  * (`Similarity.ivfAppend` inside `foreachBatch`), so the index grows
  * with the feed and a probe between batches serves the consistent
  * prefix — the same append-only file contract the batch operator
  * documents.
  *
  * `foreachBatch` is the right tool here (not a custom sink): the
  * append is an idempotency-tolerant bulk write whose unit IS the
  * micro-batch, and the assignment plan inside it is the batch
  * operator unchanged — one definition for backfill and live feed.
  * A replayed batch after a crash re-appends its files — at-least-once
  * rows in the affected lists, never corruption: the serving path
  * dedups candidates by (query, neighbor) id before ranking, so a
  * duplicate cannot occupy two ranks.  Exactly-once needs a
  * transactional table format underneath, which the parquet store
  * deliberately keeps out of scope. */
object StreamingIndex {

  def start(embeddings: DataFrame, dir: String, indexPath: String,
            trigger: Trigger = Trigger.ProcessingTime(0),
            checkpoint: Option[String] = None): StreamingQuery = {
    val w = embeddings.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.ivfAppend(batch.sparkSession, dir, indexPath, batch)
      }
      .trigger(trigger)
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Same maintenance loop for the LEXICAL postings store: each
    * micro-batch of (doc_id, text) rows is tokenized and appended as
    * new posting files in its terms' `tshard=` partitions plus one
    * stats row (`LexIndex.append`).  The micro-batch id keys the
    * stats row, so a crash-replayed batch folds to one corpus count
    * at serve time — the lexical twin of the id-dedup that makes the
    * IVF replay contract exactly-once at the results level. */
  def startLex(docs: DataFrame, indexPath: String,
               trigger: Trigger = Trigger.ProcessingTime(0),
               checkpoint: Option[String] = None): StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        graft.ops.LexIndex.append(batch.sparkSession, indexPath, batch, s"b$bid")
      }
      .trigger(trigger)
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Same maintenance loop for the QUANTIZED managed store: each
    * micro-batch appends int8 (code, scale, nrm) rows via
    * `Similarity.ivfQuantizedAppend` — a quarter of the write bytes
    * per vector, same at-least-once replay contract (the quantized
    * serve path dedups by id before ranking). */
  def startQuantized(embeddings: DataFrame, dir: String, indexPath: String,
                     trigger: Trigger = Trigger.ProcessingTime(0),
                     checkpoint: Option[String] = None): StreamingQuery = {
    val w = embeddings.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.ivfQuantizedAppend(batch.sparkSession, dir, indexPath, batch)
      }
      .trigger(trigger)
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }
}
