package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ops.{SparkDialect, TextAnalysis}

/** Streaming text curation: the quality-gate → split-assignment pass
  * of `ops.TextAnalysis.curation`, applied to an unbounded document
  * stream.
  *
  * Every scalar here (token counts, symbol/digit ratios, the
  * composite score, the id-hash split bucket) is a NARROW per-row
  * projection, so the batch operators run unchanged under Structured
  * Streaming — no watermark, no state, no shuffle; the micro-batch
  * plan is Scan → Project → Filter, exactly the batch plan.  That is
  * the point of keeping the scoring pass shuffle-free: the same
  * curation logic serves the 100 TB backfill (batch) and the live
  * ingest feed (stream) with one definition, and a streaming corpus
  * equals the batch-curated corpus row-for-row (spec-verified).
  *
  * Exact dedup (the one stateful stage of the batch pipeline) is
  * composed separately via [[StreamingDedup.dedupDocs]] upstream when
  * the feed needs it — state bounds and watermark trade-offs live
  * there, not in the scoring pass.
  */
object StreamingCuration {

  /** Quality-score + split columns on a (streaming or batch)
    * DataFrame carrying doc_id / text, keeping rows with
    * score ≥ `minScore`.  Fragments are the shared dialect SQL
    * (TextAnalysis.scoredSplitExprs), so stream, batch, and the
    * DuckDB oracle share one definition. */
  def curate(docs: DataFrame, minScore: Double = 0.5): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val exprs = TextAnalysis.scoredSplitExprs(SparkDialect)
    docs
      .selectExpr(("*" +: exprs): _*)
      .filter(s"quality_score >= $minScore")
  }
}
