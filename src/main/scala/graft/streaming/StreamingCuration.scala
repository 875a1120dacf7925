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

  /** PII gate for the live ingest feed — the safety pass `text_pii`
    * measures, applied as a transform.  Per-family counts land as
    * metadata columns (same shared patterns as the batch query and
    * its oracle: `TextAnalysis.PiiFamilies`), then either
    *  - `redact = true`: `text` is rewritten with every match replaced
    *    by a fixed tag (documents stay in the corpus, scrubbed), or
    *  - `redact = false`: documents with any detection are DROPPED.
    * Like `curate`, every expression is a narrow per-row projection —
    * no watermark, no state, no shuffle — so the same definition
    * serves the batch backfill and the stream, and a streamed corpus
    * equals the batch-gated corpus row-for-row (spec-verified).
    * Redaction lowercases the text (patterns are defined over
    * lowercased input; a case-preserving redactor would need
    * case-insensitive dialect regexes in both engines). */
  def piiGate(docs: DataFrame, redact: Boolean = true): DataFrame = {
    val d = SparkDialect
    val counts = TextAnalysis.PiiFamilies.map { case (name, pat) =>
      s"CAST(${d.regexpExtractAllSize("lower(text)", pat)} AS BIGINT) AS $name"
    }
    val flagged = docs.selectExpr("*" +: counts: _*)
      .selectExpr("*",
        "(n_emails + n_ips + n_ids + n_phones > 0) AS has_pii")
    if (redact)
      flagged.withColumn("text", org.apache.spark.sql.functions.expr(
        s"CASE WHEN has_pii THEN ${TextAnalysis.piiRedact(d, "lower(text)")} " +
          "ELSE text END"))
    else flagged.filter("NOT has_pii")
  }
}
