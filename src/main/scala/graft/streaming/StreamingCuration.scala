package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ops.{SparkDialect, TextAnalysis, TextFilters}

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

  /** Unigram-LM model relation fit on a reference corpus —
    * (token, surprisal_q) with the same µ-quantized per-token
    * surprisal as `TextAnalysis.unigramLogprobSql`.  Fit once on the
    * settled corpus, then served into the stream gate below: the
    * standard fit-batch / score-stream split. */
  def unigramModel(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val tf = corpus
      .selectExpr(s"explode(${SparkDialect.tokens("text")}) AS token")
      .groupBy("token").agg(count(lit(1)).as("c"))
    val total = tf.agg(sum(col("c"))).head().getLong(0).toDouble
    tf.select(col("token"),
      round(log(col("c").cast("double") / lit(total)) * 1e6)
        .cast("long").as("surprisal_q"))
  }

  /** Surprisal gate for the live feed — model serving as a
    * STREAM-STATIC join: the (tiny, broadcast) pre-fit model joins
    * each document's exploded tokens, a windowed per-doc aggregation
    * averages the quantized surprisals, and docs outside
    * [minSurprisal, maxSurprisal] are dropped once their window
    * finalizes (too low ≈ boilerplate the model has memorized, too
    * high ≈ gibberish / out-of-domain).  Tokens ABSENT from the model
    * carry `oovSurprisal` (a pseudo-count floor), so vocabulary drift
    * raises scores instead of silently vanishing rows.
    *
    * Docs need event-time `ingest_ts`; output is
    * (window_start, doc_id, n_tokens, mean_surprisal) for the kept
    * documents.  One stateful operator (the windowed agg) — the join
    * side is static and stateless. */
  def surprisalGate(docs: DataFrame, model: DataFrame,
                    minSurprisal: Double, maxSurprisal: Double,
                    oovSurprisal: Double = 20.0,
                    watermark: String = "30 days",
                    windowDur: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    import org.apache.spark.sql.functions._
    // the per-doc mean stays in quantized-integer space through the
    // aggregation (exact, order-independent) — identical arithmetic to
    // text_unigram_logprob, so gate scores equal the batch operator's
    val oovQ = -math.rint(oovSurprisal * 1e6).toLong
    docs
      .withWatermark("ingest_ts", watermark)
      .select(col("doc_id"), col("ingest_ts"),
        explode(expr(SparkDialect.tokens("text"))).as("token"))
      .join(broadcast(model), Seq("token"), "left")
      .select(col("doc_id"), col("ingest_ts"),
        coalesce(col("surprisal_q"), lit(oovQ)).as("q"))
      .groupBy(window(col("ingest_ts"), windowDur), col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(-sum(col("q")).cast("double")
          / (lit(1e6) * count(lit(1))), 6).as("mean_surprisal"))
      .filter(col("mean_surprisal").between(minSurprisal, maxSurprisal))
      .select(col("window.start").as("window_start"), col("doc_id"),
        col("n_tokens"), col("mean_surprisal"))
  }

  /** Surprisal gate variant that CARRIES the document text through
    * the windowed aggregation (`max(text)` — constant per doc, so the
    * aggregate is deterministic), for composing downstream stages
    * that still need the payload (near-dup dedup).  Arithmetic is
    * `surprisalGate`'s exactly; output adds `text` and keeps exactly
    * one event-time column (the window start) so a downstream
    * stateful operator can re-declare event time on it. */
  def surprisalGateWithText(docs: DataFrame, model: DataFrame,
                            minSurprisal: Double, maxSurprisal: Double,
                            oovSurprisal: Double = 20.0,
                            watermark: String = "30 days",
                            windowDur: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    import org.apache.spark.sql.functions._
    val oovQ = -math.rint(oovSurprisal * 1e6).toLong
    docs
      .withWatermark("ingest_ts", watermark)
      .select(col("doc_id"), col("ingest_ts"), col("text"),
        explode(expr(SparkDialect.tokens("text"))).as("token"))
      .join(broadcast(model), Seq("token"), "left")
      .select(col("doc_id"), col("ingest_ts"), col("text"),
        coalesce(col("surprisal_q"), lit(oovQ)).as("q"))
      .groupBy(window(col("ingest_ts"), windowDur), col("doc_id"))
      .agg(max(col("text")).as("text"),
        count(lit(1)).as("n_tokens"),
        round(-sum(col("q")).cast("double")
          / (lit(1e6) * count(lit(1))), 6).as("mean_surprisal"))
      .filter(col("mean_surprisal").between(minSurprisal, maxSurprisal))
      // event_ts = window_time(window) (window end − 1 ms) is the
      // EVENT-TIME-ANNOTATED column a chained stateful operator keys
      // its watermark semantics on; window_start is the plain value
      // callers group/report by.  Only event_ts carries the
      // annotation, so exactly one event-time column flows downstream.
      .select(col("window.start").as("window_start"),
        window_time(col("window")).as("event_ts"), col("doc_id"),
        col("text"), col("n_tokens"), col("mean_surprisal"))
  }

  /** DSIR λ model fit on a reference corpus — (fb, l_u) per hashed
    * feature bucket with the µ-quantized log-likelihood ratio of
    * `Retrieval.dsirWeightsSql` (target = the English slice), plus
    * the smoothed default for buckets the corpus never hashed into.
    * Fit once batch-side, then served into the stream gate below:
    * the fit-batch / score-stream split the surprisal gate uses —
    * selection models are trained offline and applied online. */
  def dsirModel(corpus: DataFrame): (DataFrame, Long) = {
    val spark = corpus.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val b = graft.ops.Retrieval.DsirBuckets
    val f = corpus.select(col("lang"),
      expr(s"explode(${SparkDialect.tokens("text")})").as("token"))
      .select(col("lang"), expr(s"graft_h60(token) % $b").as("fb"))
    val cr = f.groupBy("fb").agg(count(lit(1)).as("c"))
    val ct = f.filter(col("lang") === "en")
      .groupBy("fb").agg(count(lit(1)).as("ct"))
    val totals = cr.agg(sum(col("c"))).head().getLong(0).toDouble
    val totalT = f.filter(col("lang") === "en").count().toDouble
    val lam = cr.join(ct, Seq("fb"), "left")
      .select(col("fb"),
        round((log((coalesce(col("ct"), lit(0L)).cast("double") + 1.0)
            / lit(totalT + b))
          - log((col("c").cast("double") + 1.0) / lit(totals + b))) * 1e6)
          .cast("long").as("l_u"))
    // add-1 smoothing value for a bucket with zero evidence on both
    // sides — what an unseen (out-of-vocabulary) bucket scores
    val oovQ = math.round((math.log(1.0 / (totalT + b))
      - math.log(1.0 / (totals + b))) * 1e6)
    (lam, oovQ)
  }

  /** DSIR acceptance gate for the live feed — the streaming form of
    * `text_dsir_sample`: the (tiny, broadcast) λ model joins each
    * document's hashed token buckets, a windowed per-doc aggregation
    * sums the quantized log-ratios, and the deterministic salted coin
    * keeps the doc with probability min(1, exp(mean log-ratio)).
    * Buckets absent from the model score the add-1 prior's log-ratio
    * ln((Nr+B)/(Nt+B)) (`oovQ` from `dsirModel`) — the batch
    * formula's zero-evidence limit: bounded, deterministic, never a
    * crash or a silent drop.  Same µ-quantized integer arithmetic as
    * the batch operator — the spec pins kept sets equal given the
    * same frozen model. */
  def dsirGate(docs: DataFrame, model: DataFrame, oovQ: Long,
               watermark: String = "30 days",
               windowDur: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    import org.apache.spark.sql.functions._
    val b = graft.ops.Retrieval.DsirBuckets
    val coin = SparkDialect.h60(s"${SparkDialect.castStr("doc_id")} || '_dsir'")
    docs
      .withWatermark("ingest_ts", watermark)
      .select(col("doc_id"), col("ingest_ts"),
        expr(s"explode(${SparkDialect.tokens("text")})").as("token"))
      .select(col("doc_id"), col("ingest_ts"),
        expr(s"graft_h60(token) % $b").as("fb"))
      .join(broadcast(model), Seq("fb"), "left")
      .select(col("doc_id"), col("ingest_ts"),
        coalesce(col("l_u"), lit(oovQ)).as("q"))
      .groupBy(window(col("ingest_ts"), windowDur), col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("q")).as("w_u"))
      .withColumn("p_u", least(lit(1000000L),
        expr("CAST(round(exp(CAST(w_u AS DOUBLE) / (1000000.0D * n_tokens))"
          + " * 1000000.0D) AS BIGINT)")))
      .filter(expr(s"($coin % 1000000) < p_u"))
      .select(col("window.start").as("window_start"), col("doc_id"),
        col("n_tokens"),
        round(col("w_u").cast("double") / (lit(1e6) * col("n_tokens")), 6)
          .as("dsir_logratio"))
  }

  /** Quality-classifier gate for the live feed — the frozen-model
    * (fit-batch / score-stream) application of
    * `text_quality_classifier`: the trained weight relation
    * (`Retrieval.clfModel`, ≤ 4096 rows) broadcast-joins each
    * document's hashed token buckets, a windowed per-doc aggregation
    * sums the integer weights, and the µ-quantized sigmoid keeps the
    * doc iff p > 0.5 — the decision boundary the batch operator
    * trains, applied online.  Buckets the model never saw weigh 0
    * (an untrained feature is no evidence either way).  Zero-token
    * docs carry no features and never reach the gate, matching the
    * batch operator's n_tok > 0 scope.  Same integer arithmetic as
    * the batch scorer — the spec pins kept sets equal given the same
    * frozen model.
    *
    * `minProbU` is the operating point on the 10⁻⁶ grid (default the
    * conventional 0.5).  Production filters tune this against a
    * validation set — GPT-3's filter effectively sampled by score
    * rather than hard-thresholding at 0.5 — and a corpus whose
    * features barely separate the classes (e.g. the shared-vocabulary
    * fixture, where every p sits just below 0.5) keeps nothing at the
    * default: an honest model outcome, not a gate defect. */
  def clfGate(docs: DataFrame, model: DataFrame,
              minProbU: Long = 500000L,
              watermark: String = "30 days",
              windowDur: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    import org.apache.spark.sql.functions._
    val b = graft.ops.Retrieval.DsirBuckets
    docs
      .withWatermark("ingest_ts", watermark)
      .select(col("doc_id"), col("ingest_ts"),
        expr(s"explode(${SparkDialect.tokens("text")})").as("token"))
      .select(col("doc_id"), col("ingest_ts"),
        expr(s"graft_h60(token) % $b").as("fb"))
      .join(broadcast(model), Seq("fb"), "left")
      .select(col("doc_id"), col("ingest_ts"),
        coalesce(col("w_u"), lit(0L)).as("w"))
      .groupBy(window(col("ingest_ts"), windowDur), col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("s_u"))
      .withColumn("prob_u", expr(
        "CAST(round(1000000.0D / (1.0D + exp(-(CAST(s_u AS DOUBLE)"
          + " / (CAST(n_tokens AS DOUBLE) * 1000000.0D))))) AS BIGINT)"))
      .filter(col("prob_u") > minProbU)
      .select(col("window.start").as("window_start"), col("doc_id"),
        col("n_tokens"),
        round(col("prob_u").cast("double") / 1e6, 6).as("clf_prob"))
  }

  /** The COMPOSED curation DAG as one streaming job: quality gate →
    * PII redaction → surprisal gate → near-dup dedup, append mode end
    * to end.  Stage order mirrors the batch pipeline: quality scores
    * the RAW text, the PII pass rewrites it, and every downstream
    * stage (surprisal tokens, MinHash bands) sees the REDACTED text —
    * two docs differing only in their PII spans become near-dup
    * collisions, exactly what a curation pipeline wants.
    *
    * Plan shape: stages 1–2 are narrow stateless projections fused
    * into the scan; stage 3 is the first stateful operator (windowed
    * agg over the broadcast-model join); stage 4 re-bases event time
    * onto the finalized window start (one event-time column — the
    * window struct is projected away) and runs the
    * `transformWithState` band registry + kept-window aggregation.
    * Three chained stateful operators, all append-mode — the
    * supported multi-stateful shape (RocksDB provider installed by
    * `dedupDocs`).  Re-basing event time to the surprisal window
    * start means dedup's within-batch keeper election ties on
    * (window_start, doc_id): deterministic, and mirrored exactly by
    * the batch equivalent the spec pins.
    *
    * Emits (window_start, doc_id) per kept document once the
    * watermark finalizes its window, `dedupDocs`'s contract — feed it
    * to a `compact`-shaped store via `startCurationPipeline`. */
  def curationDag(docs: DataFrame, model: DataFrame,
                  minScore: Double = 0.5,
                  minSurprisal: Double = graft.ops.TextAnalysis.SurprisalLo,
                  maxSurprisal: Double = graft.ops.TextAnalysis.SurprisalHi,
                  oovSurprisal: Double = 20.0,
                  watermark: String = "30 days",
                  windowDur: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions.col
    val gated = piiGate(curate(docs, minScore), redact = true)
    val scored = surprisalGateWithText(gated, model,
      minSurprisal, maxSurprisal, oovSurprisal, watermark, windowDur)
    // chained mode: event time propagates from the ONE source-side
    // watermark through window_time(); dedup must not re-mark it
    StreamingNearDedup.dedupDocs(
      scored.select(col("doc_id"), col("event_ts").as("ingest_ts"),
        col("text")),
      watermark, windowDur, assignWatermark = false)
  }

  /** Wire the composed DAG against a `compact`-shaped store — the
    * full judge chain as one library call: the GATED, REDACTED,
    * surprisal-scored feed archives to `store/feed` (exactly the
    * relation `StreamingNearDedup.compact`'s canonical finishing pass
    * re-reads, so compaction reconciles against the same post-gate
    * corpus the stream deduplicated), and the near-dup kept set lands
    * in `store/kept`.  Callers run `compact(store, settledBefore)` on
    * a cadence and serve `keptView` — compacted truth below the
    * cutoff, live stream above it. */
  def startCurationPipeline(docs: DataFrame, model: DataFrame,
      store: String, minScore: Double = 0.5,
      minSurprisal: Double = graft.ops.TextAnalysis.SurprisalLo,
      maxSurprisal: Double = graft.ops.TextAnalysis.SurprisalHi,
      oovSurprisal: Double = 20.0,
      watermark: String = "30 days", windowDur: String = "1 hour",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)):
      (org.apache.spark.sql.streaming.StreamingQuery,
       org.apache.spark.sql.streaming.StreamingQuery) = {
    import org.apache.spark.sql.functions.col
    def scoredFeed = {
      val gated = piiGate(curate(docs, minScore), redact = true)
      surprisalGateWithText(gated, model, minSurprisal, maxSurprisal,
          oovSurprisal, watermark, windowDur)
        .select(col("doc_id"), col("event_ts").as("ingest_ts"),
          col("text"))
    }
    val feedQ = scoredFeed.writeStream.format("parquet")
      .option("path", s"$store/feed")
      .option("checkpointLocation", s"$store/_ckpt_feed")
      .outputMode("append").trigger(trigger).start()
    val keptQ = StreamingNearDedup.dedupDocs(scoredFeed,
        watermark, windowDur, assignWatermark = false)
      .writeStream.format("parquet")
      .option("path", s"$store/kept")
      .option("checkpointLocation", s"$store/_ckpt_kept")
      .outputMode("append").trigger(trigger).start()
    (feedQ, keptQ)
  }

  /** Batch mirror of `curationDag` over a bounded arrival set — the
    * relation the spec pins the stream against, built from the SAME
    * fragments (curate / piiGate run unchanged on a static frame; the
    * surprisal mean re-uses the µ-quantized model join; dedup is
    * `StreamingNearDedup.batchKept` over the window-start-rebased
    * feed).  Returns the kept (window_start, doc_id) pairs. */
  def curationDagBatch(docs: DataFrame, model: DataFrame,
                       minScore: Double = 0.5,
                       minSurprisal: Double = graft.ops.TextAnalysis.SurprisalLo,
                       maxSurprisal: Double = graft.ops.TextAnalysis.SurprisalHi,
                       oovSurprisal: Double = 20.0,
                       windowDur: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions._
    val oovQ = -math.rint(oovSurprisal * 1e6).toLong
    val gated = piiGate(curate(docs, minScore), redact = true)
    val scored = gated
      .select(col("doc_id"), col("ingest_ts"), col("text"),
        explode(expr(SparkDialect.tokens("text"))).as("token"))
      .join(broadcast(model), Seq("token"), "left")
      .select(col("doc_id"), col("ingest_ts"), col("text"),
        coalesce(col("surprisal_q"), lit(oovQ)).as("q"))
      .groupBy(window(col("ingest_ts"), windowDur), col("doc_id"))
      .agg(max(col("text")).as("text"),
        round(-sum(col("q")).cast("double")
          / (lit(1e6) * count(lit(1))), 6).as("mean_surprisal"))
      .filter(col("mean_surprisal").between(minSurprisal, maxSurprisal))
      .select(col("window.start").as("ingest_ts"), col("doc_id"),
        col("text"))
    StreamingNearDedup.batchKept(scored)
      .join(scored, "doc_id")
      .select(col("ingest_ts").as("window_start"), col("doc_id"))
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
  /** Gopher rule-battery gate on a (streaming or batch) DataFrame
    * carrying doc_id / text — the heuristic pre-filter that runs
    * BEFORE any model-based scoring in a web-scale curation pipeline
    * (cheap rules first, models on the survivors).  Built from
    * exactly `TextFilters.gopherCountExprs/gopherRatioExprs/
    * gopherRuleExprs` — the fragments the batch relation and the
    * DuckDB oracle share — staged as chained projections so the
    * tokenization lands in a materialized column instead of being
    * re-evaluated per rule.
    *
    * Like `curate` and `piiGate`: narrow per-row projections only —
    * no watermark, no state, no shuffle — so stream ≡ batch by
    * construction (spec-verified).  `keepOnly = false` returns every
    * row with its verdict columns (the audit shape); the default
    * drops failers and prunes the intermediate count columns. */
  def gopherGate(docs: DataFrame,
                 minWords: Int = TextFilters.MinWords,
                 maxWords: Int = TextFilters.MaxWords,
                 minMeanLen: Double = TextFilters.MinMeanWordLen,
                 maxMeanLen: Double = TextFilters.MaxMeanWordLen,
                 minStop: Int = TextFilters.MinDistinctStopwords,
                 keepOnly: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val d = SparkDialect
    val rules =
      TextFilters.gopherRuleExprs(d, minWords, maxWords, minMeanLen,
        maxMeanLen, minStop)
    val verdicts = docs
      .selectExpr("*", s"${d.tokens("text")} AS toks")
      .selectExpr("*" +: TextFilters.gopherCountExprs(d): _*)
      .selectExpr("*" +: TextFilters.gopherRatioExprs(d): _*)
      .selectExpr(("*" +: rules.map { case (n, e) => s"$e AS $n" }): _*)
      .selectExpr("*",
        s"(${rules.map(_._1).mkString(" AND ")}) AS passes_gopher")
      .drop("toks", "word_chars", "n_sym", "n_lines", "n_bullet",
        "n_ellipsis", "n_alpha_words")
    if (keepOnly) verdicts.filter("passes_gopher") else verdicts
  }

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
