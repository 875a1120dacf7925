package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col}
import graft.ingest.BarPipeline
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
  * extensions) is exposed as a named query over the fixture tables, with
  * an equivalent DuckDB SQL oracle where the semantics are
  * SQL-expressible.  Column names/aliases match exactly between the
  * Spark result and the oracle (the driver sorts columns by name before
  * hashing).  Floating-point aggregates are rounded identically on both
  * sides so both engines land on the same grid points.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q6_selective_filter" -> (Relational.q6Revenue _),
    "q3_join_agg_topn" -> (Relational.q3ShippingPriority _),
    "q5_star_join" -> (Relational.q5LocalSupplier _),
    "q_semi_join" -> (Relational.qSemiJoin _),
    "q_anti_join" -> (Relational.qAntiJoin _),
    "q_cust_order_counts" -> (Relational.qCustOrderCounts _),
    "q_window_rank" -> (Relational.qWindowRank _),
    "q_top_orders" -> (Relational.qTopOrders _),
    "q_distinct" -> (Relational.qDistinct _),
    "q_set_ops" -> (Relational.qSetOps _),
    "q_case_agg" -> (Relational.qCaseAgg _),
    "q_rollup" -> (Relational.qRollup _),
    "q_cube" -> (Relational.qCube _),
    "q_full_outer" -> (Relational.qFullOuter _),
    "q_having" -> (Relational.qHaving _),
    "q_above_avg" -> (Relational.qAboveAvg _),
    "q_date_agg" -> (Relational.qDateAgg _),
    "q_pivot" -> (Relational.qPivot _),
    "q17_small_qty" -> (Relational.qSmallQtyRevenue _),
    "q18_large_orders" -> (Relational.qLargeOrders _),
    "q19_disjunctive" -> (Relational.qDisjunctivePredicates _),
    // Round-3 TPC-H fills + analytic extensions (RelationalExt)
    "q4_order_priority" -> (RelationalExt.q4OrderPriority _),
    "q7_nation_volume" -> (RelationalExt.q7NationVolume _),
    "q8_market_share" -> (RelationalExt.q8MarketShare _),
    "q10_returned_items" -> (RelationalExt.q10ReturnedItems _),
    "q11_important_balance" -> (RelationalExt.q11ImportantBalance _),
    "q14_promo_revenue" -> (RelationalExt.q14PromoRevenue _),
    "q15_top_supplier" -> (RelationalExt.q15TopSupplier _),
    "q_grouping_sets" -> (RelationalExt.qGroupingSets _),
    "q_moving_avg" -> (RelationalExt.qMovingAvg _),
    "q_ntile_lag" -> (RelationalExt.qNtileLag _),
    "q_percentiles" -> (RelationalExt.qPercentiles _),
    "q_hist_quantiles" -> (RelationalExt.qHistQuantiles _),
    "q_unpivot" -> (RelationalExt.qUnpivot _),
    "q_bloom_semi_join" -> (RelationalExt.qBloomSemiJoin _),
    "q_gapfill" -> (RelationalExt.qGapfill _),
    "q_array_stats" -> (RelationalExt.qArrayStats _),
    // Correlated-subquery TPC-H shapes (Catalyst decorrelation on trial)
    "q2_min_cost_supplier" -> (SubqueryShapes.q2MinCostSupplier _),
    "q13_cust_distribution" -> (SubqueryShapes.q13CustDistribution _),
    "q21_waiting_supplier" -> (SubqueryShapes.q21WaitingSupplier _),
    "q22_inactive_balance" -> (SubqueryShapes.q22InactiveBalance _),
    "q9_product_profit" -> (SubqueryShapes.q9ProductProfit _),
    "q12_priority_class" -> (SubqueryShapes.q12PriorityClass _),
    "q16_supplier_diversity" -> (SubqueryShapes.q16SupplierDiversity _),
    "q20_recent_share" -> (SubqueryShapes.q20RecentShare _),
    // Typed Aggregator extension surface (bounded-heap map-side top-k)
    "q_topk_per_group" -> (graft.functions.TopKQueries.qTopkPerGroup _),
    // Events analytics: profiling, funnel, cohort retention
    "q_profile" -> (RelationalExt.qProfile _),
    "q_event_funnel" -> (RelationalExt.qEventFunnel _),
    "q_retention" -> (RelationalExt.qRetention _),
    // Ingestion pipeline (SURVEY §2 S/P/F/A/T over the events stream)
    "ingest_asset_catalog" -> ((s: SparkSession, d: String) =>
      BarPipeline.assetCatalog(s, d).orderBy(col("symbol"))),
    "ingest_bars_daily" -> ((s: SparkSession, d: String) =>
      BarPipeline.canonicalBars(s, d).orderBy(col("symbol"), col("timestamp"))),
    "ingest_upsert_dedup" -> ((s: SparkSession, d: String) =>
      BarPipeline.overlappingIngest(s, d)
        .orderBy(col("symbol"), col("timestamp"))),
    "ingest_summaries" -> ((s: SparkSession, d: String) =>
      BarPipeline.ingestSummaries(BarPipeline.canonicalBars(s, d))
        .orderBy(col("asset_symbol"))),
    "ingest_run_status" -> ((s: SparkSession, d: String) =>
      BarPipeline.runStatus(BarPipeline.canonicalBars(s, d))),
    // Bar-domain analytics past the reference's single timeframe
    "ingest_bars_weekly" -> (graft.ingest.BarAnalytics.weeklyBars _),
    "ingest_bar_analytics" -> (graft.ingest.BarAnalytics.analytics _),
    "ingest_bar_beta" -> (graft.ingest.BarAnalytics.beta _),
    // Custom DataSource V2 connector (S1 shape: per-symbol remote scan)
    "src_bar_scan" -> (graft.sources.BarSourceQueries.srcBarScan _),
    // Temporal operators + error isolation + semi-structured
    "q_asof_join" -> (Temporal.asofEventBars _),
    "q_range_join" -> (Temporal.rangeJoinEventBars _),
    "q_session_window" -> (Temporal.sessionWindows _),
    "q_json_extract" -> (Relational.qJsonExtract _),
    "ingest_quarantine" -> (graft.ingest.Quarantine.eventQuarantineSummary _),
    // Text analysis (training-data pipeline extensions)
    "text_token_counts" -> (TextAnalysis.tokenCounts _),
    "text_quality" -> (TextAnalysis.quality _),
    "text_langid" -> (TextAnalysis.langId _),
    "text_fingerprint" -> (TextAnalysis.fingerprint _),
    "text_sample_split" -> (TextAnalysis.sampleSplit _),
    "text_curation" -> (TextAnalysis.curation _),
    "text_tfidf" -> (TextAnalysis.tfidf _),
    "text_pack_sequences" -> (TextAnalysis.packSequences _),
    "text_chunking" -> (TextAnalysis.chunking _),
    "text_chunk_dedup" -> (TextAnalysis.chunkDedup _),
    "text_contamination" -> (TextAnalysis.contamination _),
    "text_contamination_risk" -> (TextAnalysis.contaminationRisk _),
    "text_weighted_sample" -> (TextAnalysis.weightedSample _),
    "text_repetition" -> (TextAnalysis.repetition _),
    "text_mixture_plan" -> (TextAnalysis.mixturePlan _),
    "text_dup_spans" -> (TextAnalysis.dupSpans _),
    "text_dup_span_cut" -> (TextAnalysis.dupSpanCut _),
    "text_pii" -> (TextAnalysis.pii _),
    "text_curation_log" -> (TextAnalysis.curationLog _),
    "text_curation_log_full" -> (TextAnalysis.curationLogFull _),
    "text_surprisal_buckets" -> (TextAnalysis.surprisalBuckets _),
    "text_curation_funnel" -> (TextAnalysis.curationFunnel _),
    "text_unigram_logprob" -> (TextAnalysis.unigramLogprob _),
    "text_bigram_logprob" -> (TextFilters.bigramLogprob _),
    "text_pmi_pairs" -> (TextFilters.pmiPairs _),
    "text_novelty" -> (TextAnalysis.novelty _),
    // BPE subword-vocabulary trainer (ops.BpeTrain): histogram-train,
    // merge-table output, corpus encode + compression measurement
    "text_bpe_pairs" -> (BpeTrain.bpePairs _),
    "text_bpe_merges" -> (BpeTrain.bpeMerges _),
    "text_bpe_encode" -> (BpeTrain.bpeEncode _),
    "text_bpe_fertility" -> (BpeTrain.bpeFertility _),
    // Rule-based curation filters + frequency sketch (TextFilters)
    "text_gopher_rules" -> (TextFilters.gopherRules _),
    "text_gopher_by_source" -> (TextFilters.gopherBySource _),
    "text_heavy_hitters" -> (TextFilters.heavyHitters _),
    "text_token_drift" -> (TextFilters.tokenDrift _),
    "text_source_cap" -> (TextFilters.sourceCap _),
    "text_shard_plan" -> (TextFilters.shardPlan _),
    "text_shard_manifest" -> (TextFilters.shardManifest _),
    "q_ts_correlation" -> (Temporal.tsCorrelation _),
    "q_anomaly" -> (Temporal.anomaly _),
    // Deduplication family
    "dedup_exact" -> (Dedup.exact _),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "dedup_containment" -> (Dedup.ngramContainment _),
    "dedup_split_leakage" -> (Dedup.splitLeakage _),
    "dedup_degree_hist" -> (Dedup.degreeHist _),
    "dedup_minhash_lsh" -> (Dedup.minhashLsh _),
    "dedup_lsh_cap_report" -> (Dedup.minhashCapReport _),
    "dedup_simhash" -> (Dedup.simhash _),
    "dedup_clusters" -> (Dedup.simhashClusters _),
    "dedup_embedding" -> (Dedup.embeddingCosine _),
    "dedup_embedding_lsh" -> (Dedup.embeddingLsh _),
    "dedup_embedding_lsh_scaled" -> (Dedup.embeddingLshScaled _),
    "dedup_lsh_recall" -> (Dedup.lshRecall _),
    "dedup_lsh_recall_sampled" -> (Dedup.lshRecallSampled _),
    "dedup_embedding_compact" -> (Dedup.embeddingCompact _),
    "dedup_semantic" -> (Dedup.semantic _),
    "dedup_semantic_scaled" -> (Dedup.semanticScaled _),
    "dedup_report" -> (Dedup.report _),
    "dedup_report_tokens" -> (Dedup.reportTokens _),
    "dedup_cross_source" -> (Dedup.crossSource _),
    // Finishing-pass keeper election (stream-then-batch compaction)
    "dedup_compact" -> (Dedup.compactKept _),
    // Daily-increment dedup against the persisted signature store
    "dedup_incremental" -> (Dedup.incremental _),
    // Similarity search over embeddings
    "sim_topk_bruteforce" -> (Similarity.topK _),
    "sim_ann_lsh" -> (Similarity.annLsh _),
    "sim_ann_lsh_scaled" -> (Similarity.annLshScaled _),
    "sim_ann_ivf" -> (Similarity.ivf _),
    "sim_ivf_kmeans" -> (Similarity.ivfKmeans _),
    "sim_recall" -> (Similarity.recall _),
    "sim_recall_sampled" -> (Similarity.recallSampled _),
    "sim_retrieval_ndcg" -> (Similarity.retrievalNdcg _),
    "sim_retrieval_ndcg_sampled" -> (Similarity.retrievalNdcgSampled _),
    "sim_recall_rerank" -> (Similarity.recallRerank _),
    "sim_mmr_rerank" -> (Similarity.mmrRerank _),
    "sim_nprobe_sweep" -> (Similarity.nprobeSweep _),
    "sim_quantize" -> (Similarity.quantize _),
    "sim_ann_ivf_persisted" ->
      ((s: SparkSession, d: String) => Similarity.ivfPersisted(s, d)),
    "sim_ivf_kmeans_persisted" ->
      ((s: SparkSession, d: String) => Similarity.ivfKmeansPersisted(s, d)),
    "sim_ivf_kmeans_scaled" ->
      ((s: SparkSession, d: String) => Similarity.ivfKmeansScaled(s, d)),
    "sim_quantized_topk" -> (Similarity.quantizedTopK _),
    "sim_ann_ivf_pq" ->
      ((s: SparkSession, d: String) => Similarity.ivfQuantizedPersisted(s, d)),
    "sim_ivf_kmeans_pq" ->
      ((s: SparkSession, d: String) =>
        Similarity.ivfKmeansQuantizedPersisted(s, d)),
    "sim_ann_ivf_pq_rerank" ->
      ((s: SparkSession, d: String) =>
        Similarity.ivfQuantizedRerankPersisted(s, d)),
    "sim_ivf_kmeans_pq_rerank" ->
      ((s: SparkSession, d: String) =>
        Similarity.ivfKmeansQuantizedRerankPersisted(s, d)),
    // k-NN graph construction (deterministic NN-descent: LSH init +
    // bounded neighbor-of-neighbor rounds) + sampled-truth recall
    "sim_knn_graph" -> (Similarity.knnGraph _),
    "sim_knn_graph_recall" -> (Similarity.knnGraphRecall _),
    "sim_source_coherence" -> (Similarity.sourceCoherence _),
    "sim_outlier_report" -> (Similarity.outlierReport _),
    "sim_embedding_drift" -> (Similarity.embeddingDrift _),
    "sim_pca_projection" -> (Similarity.pca _),
    "sim_embedding_stats" -> (Similarity.embeddingStats _),
    // Per-list skew report over the persisted k-means store — the
    // retrain/rebuild trigger signal; oracle proves store ≡ assignment
    "sim_index_health" ->
      ((s: SparkSession, d: String) => Similarity.indexHealth(s, d)),
    // Maintenance decision over the same store (no-op branch at
    // fixture balance; the rebuild branch is spec-covered on a
    // deliberately skew-appended store)
    "sim_index_maintain" ->
      ((s: SparkSession, d: String) => Similarity.indexMaintain(s, d)),
    // HLL sketch — the estimate is engine-internal, so the oracle
    // checks the exact count + the sketch's verified tolerance bound
    "q_approx_distinct" -> (Relational.qApproxDistinct _),
    // KMV sketch — portable-hash estimator, fully oracle-checked
    "q_kmv_distinct" -> (Relational.qKmvDistinct _),
    // Skew-safe salted aggregation ≡ the plain aggregate (the oracle)
    "q_salted_agg" -> (ScalePatterns.qSaltedAgg _),
    "q_skew_report" -> (ScalePatterns.qSkewReport _),
    // Retrieval & data-selection wing: lexical BM25, hybrid RRF
    // fusion (lexical + vector), DSIR importance weights, corpus
    // data card, k-means cluster-purity audit
    "text_bm25_topk" -> (Retrieval.bm25 _),
    "text_bm25_persisted" ->
      ((s: SparkSession, d: String) => LexIndex.bm25Persisted(s, d)),
    "lex_index_health" ->
      ((s: SparkSession, d: String) => LexIndex.indexHealth(s, d)),
    "sim_hybrid_recall" -> (Retrieval.hybridRecall _),
    "sim_hybrid_recall_sampled" -> (Retrieval.hybridRecallSampled _),
    "sim_hybrid_rrf" -> (Retrieval.hybridRrf _),
    "sim_hybrid_rrf_sampled" -> (Retrieval.hybridRrfSampled _),
    "sim_hybrid_rrf_ann" -> (Retrieval.hybridRrfAnn _),
    "sim_hybrid_rrf_ann_scaled" -> (Retrieval.hybridRrfAnnScaled _),
    "text_dsir_weights" -> (Retrieval.dsirWeights _),
    "text_quality_classifier" -> (Retrieval.qualityClassifier _),
    "text_dsir_sample" -> (Retrieval.dsirSample _),
    "text_corpus_stats" -> (Retrieval.corpusStats _),
    "text_k_anonymity" -> (Retrieval.kAnonymity _),
    "sim_cluster_purity" -> (Similarity.clusterPurity _),
    "sim_cluster_keywords" -> (Similarity.clusterKeywords _),
    "sim_ann_ivf_adc" -> (Similarity.ivfAdc _),
    "sim_adc_recall" -> (Similarity.adcRecall _),
    "sim_adc_recall_sampled" -> (Similarity.adcRecallSampled _),
    "sim_ivf_adc_trained" -> (Similarity.ivfAdcTrained _),
    "sim_cluster_sample" -> (Similarity.clusterSample _),
    "sim_cluster_sample_scaled" -> (Similarity.clusterSampleScaled _),
    "text_chunk_bm25" -> (Retrieval.chunkBm25 _),
    "text_mixture_temperature" -> (TextAnalysis.mixtureTemperature _),
    // Multimodal binary-column plumbing
    "mm_inventory" -> (Multimodal.inventory _),
    "mm_video_frames" -> (Multimodal.videoFrames _),
    "mm_image_resize" -> (Multimodal.imageResize _),
    "mm_decode_features" -> (Multimodal.decodeFeatures _),
    "mm_decode_wav" -> (Multimodal.decodeWav _),
    "mm_decode_ppm" -> (Multimodal.decodePpm _),
    "mm_audio_windows" -> (Multimodal.audioWindows _),
    "mm_dedup" -> (Multimodal.payloadDedup _),
  )

  /** One-time SHARED store/codebook builds the serving queries above
    * amortize (all build-if-absent, fingerprint-keyed, idempotent).
    * Bench runs each BEFORE its measured passes and emits the wall
    * time as a labeled `builds` entry in the artifact — without this,
    * a build's cost silently attributes to whichever consumer query
    * happens to run first (alphabetically) in the session, distorting
    * that query's per-query row whenever the suite grows.  A ~0s
    * build line means the store was already published (the idempotent
    * re-run) — itself useful signal. */
  def builds: Map[String, (SparkSession, String) => Unit] = Map(
    "kmeans_codebooks_and_stores" ->
      ((s, d) => Similarity.prebuildKmeansStores(s, d)),
    "bm25_store" -> ((s, d) => LexIndex.prebuildStore(s, d)),
    // split (r15, advice): the persisted signature store serves any
    // dedup_* run, but the session pair cache (banded candidate join +
    // Jaccard verify, ~46 s at 100×) is only read by the minhash
    // family — a filtered dedup_embedding run must not pay it
    "minhash_sig_store" ->
      ((s, d) => { Dedup.prebuildSignatureStore(s, d); () }),
    "minhash_pair_cache" -> ((s, d) => Dedup.prebuildSessionSig(s, d)),
    "shared_gram_pairs" -> ((s, d) => Dedup.prebuildSharedPairs(s, d)),
    "emb_band_keys" -> ((s, d) => Dedup.prebuildEmbBandKeys(s, d)),
    "curation_sur" -> ((s, d) => TextAnalysis.prebuildSurRelation(s, d)),
    "pq_codes_sampled" -> ((s, d) => Similarity.prebuildPqCodesSampled(s, d)),
    "pq_codes_trained" -> ((s, d) => Similarity.prebuildPqCodesTrained(s, d)),
    "hybrid_lex_rank" -> ((s, d) => Retrieval.prebuildLexRank(s, d)),
    "fixed_ivf_stores" ->
      ((s, d) => Similarity.prebuildFixedStores(s, d)),
    "bpe_merge_table" -> ((s, d) => { BpeTrain.trainedMerges(s, d); () }),
    "knn_graph" -> ((s, d) => Similarity.prebuildKnnGraph(s, d)),
    // serving-cache warms (r15): the memoized recall truths and the
    // fixed-grid / corpus-scaled serve relations the recall-family
    // harnesses score — priced here so RUNS=1 artifacts never
    // attribute a one-time serve build to its first consumer
    "exact_truth_serves" -> ((s, d) => Similarity.prebuildExactTruth(s, d)),
    "sampled_truth_serves" ->
      ((s, d) => Similarity.prebuildSampledTruth(s, d)),
  )

  /** Per-build predicate over query names: does this query consume the
    * build's artifacts?  Bench skips a build when nothing in its
    * (possibly EXCLUDE-filtered) query set can read it — a filtered
    * scaling smoke of one text query must not pay the k-means training
    * (~20 min at the 100× fixture).  Predicates err on the inclusive
    * side: an unnecessary build only costs time, a missed one fails
    * visibly in the build-if-absent consumer. */
  def buildConsumers: Map[String, String => Boolean] = Map(
    "kmeans_codebooks_and_stores" -> (n => n.startsWith("sim_")),
    "bm25_store" -> (n => n.startsWith("text_bm25") ||
      n.startsWith("text_chunk") || n.startsWith("sim_hybrid") ||
      n == "lex_index_health"),
    "minhash_sig_store" -> (n => n.startsWith("dedup_")),
    "minhash_pair_cache" -> (n => n == "dedup_minhash_lsh" ||
      n == "dedup_compact"),
    "shared_gram_pairs" ->
      (n => n == "dedup_ngram_jaccard" || n == "dedup_containment" ||
        n == "dedup_split_leakage" || n == "dedup_degree_hist"),
    "emb_band_keys" -> (n => n == "dedup_embedding_lsh_scaled" ||
      n == "dedup_lsh_recall_sampled" || n == "dedup_embedding_compact" ||
      n == "dedup_lsh_recall" ||
      // the k-NN graph's init consumes the same banded signature (r15)
      n.startsWith("sim_knn_graph")),
    "curation_sur" -> (n => n == "text_curation_log_full" ||
      n == "text_curation_funnel" || n == "text_surprisal_buckets"),
    "pq_codes_sampled" -> (n => n == "sim_ann_ivf_adc" ||
      n == "sim_adc_recall_sampled"),
    "pq_codes_trained" -> (n => n == "sim_ivf_adc_trained" ||
      n == "sim_adc_recall_sampled"),
    "hybrid_lex_rank" -> (n => n.startsWith("sim_hybrid")),
    // sim_ivf_adc_trained shares the fixed-family kernel candidates
    // (adcServeLiteral → fixed_asgn) despite its sim_ivf_ prefix
    "fixed_ivf_stores" -> (n => n.startsWith("sim_ann_ivf") ||
      n == "sim_ivf_adc_trained" || n == "sim_adc_recall_sampled"),
    "bpe_merge_table" -> (n => n.startsWith("text_bpe")),
    "knn_graph" -> (n => n.startsWith("sim_knn_graph")),
    // every consumer is a registered scale BASELINE (quadratic truth
    // by definition), so scaling smokes that exclude the baselines
    // skip the quadratic truth build with them
    "exact_truth_serves" -> (n => n == "sim_topk_bruteforce" ||
      n == "sim_ann_lsh" || n == "sim_quantized_topk" ||
      n == "sim_recall" || n == "sim_recall_rerank" ||
      n == "sim_retrieval_ndcg" || n == "sim_adc_recall"),
    "sampled_truth_serves" -> (n => n == "sim_ann_lsh_scaled" ||
      n == "sim_recall_sampled" || n == "sim_retrieval_ndcg_sampled" ||
      n == "sim_adc_recall_sampled" || n == "sim_knn_graph_recall" ||
      n == "sim_nprobe_sweep"),
  )

  /** Queries that are DOCUMENTED brute-force / fixed-k ground-truth
    * baselines — correct and oracle-checked, but quadratic (or
    * near-quadratic) BY DESIGN, kept as the verify gates and simple
    * contrasts their scale-safe twins are measured against.  Each
    * names its scale path in its Scaladoc:
    *   - `dedup_embedding` (exact all-pairs cosine) → `dedup_embedding_lsh_scaled`
    *   - `dedup_embedding_lsh` (fixed 4-bit grid contrast) → the `_scaled` twin
    *   - `dedup_lsh_recall` (diagnostic CONTAINING the all-pairs
    *     subquery) → `dedup_lsh_recall_sampled` (√n-sampled twin)
    *   - `dedup_semantic` (fixed-k clusters, uncapped in-cluster pairs) → `dedup_semantic_scaled`
    *   - `sim_ann_lsh` (fixed 4-bit-grid serve: bucket population ∝ n,
    *     measured 1.30/decade) → `sim_ann_lsh_scaled` (corpus-scaled
    *     band width) and the trained-IVF family
    *   - `sim_hybrid_rrf` (brute-force vector modality) → `sim_hybrid_rrf_ann(_scaled)`
    * plus the GROUND-TRUTH MEASUREMENT tools, brute-force by
    * definition (their output IS the exact answer the approximate
    * operators are scored against — there is no "scale path", only
    * sampling):
    *   - `sim_topk_bruteforce`, `sim_quantized_topk` (exact all-pairs serving baselines)
    *   - `sim_recall`, `sim_recall_rerank`, `sim_adc_recall`,
    *     `sim_hybrid_recall` (each CONTAINS the all-pairs subquery by
    *     construction — recall needs the true top-k; the `_sampled`
    *     twins with √|Q|-sampled truth run at every scale)
    * Large-scale smokes exclude exactly this set
    * (`SPARK_GRAFT_BENCH_EXCLUDE=baselines` expands to it), so a
    * scaling artifact can't silently carry an hours-long baseline row
    * — and anything NOT in this set is asserting it holds at scale. */
  def scaleBaselines: Set[String] = Set(
    "dedup_embedding", "dedup_embedding_lsh", "dedup_lsh_recall",
    "dedup_semantic", "sim_ann_lsh", "sim_hybrid_rrf",
    "sim_topk_bruteforce", "sim_quantized_topk",
    "sim_recall", "sim_recall_rerank", "sim_adc_recall",
    "sim_hybrid_recall", "sim_retrieval_ndcg")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
        | round(avg(l_quantity), 6) AS avg_qty,
        | round(avg(l_extendedprice), 6) AS avg_price,
        | round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_selective_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q3_join_agg_topn" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM customer JOIN orders ON o_custkey = c_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-06-30'
        |  AND l_shipdate > TIMESTAMP '1997-06-30'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_star_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2001-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q_cust_order_counts" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_window_rank" ->
      """WITH m AS (
        |  SELECT l_suppkey, CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
        |         round(sum(l_extendedprice), 2) AS rev
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_suppkey, month, rev, rn, running_rev FROM (
        |  SELECT l_suppkey, month, rev,
        |    row_number() OVER (PARTITION BY l_suppkey ORDER BY month) AS rn,
        |    round(sum(rev) OVER (PARTITION BY l_suppkey ORDER BY month
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
        |  FROM m)
        |WHERE rn <= 3 ORDER BY l_suppkey, month""".stripMargin,
    "q_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin,
    "q_distinct" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_set_ops" ->
      """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        | rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
        | u AS (
        |  SELECT c_custkey, 'both' AS tag
        |    FROM (SELECT * FROM building INTERSECT SELECT * FROM rich)
        |  UNION ALL
        |  SELECT c_custkey, 'building_only' AS tag
        |    FROM (SELECT * FROM building EXCEPT SELECT * FROM rich)
        |  UNION ALL
        |  SELECT c_custkey, 'rich_only' AS tag
        |    FROM (SELECT * FROM rich EXCEPT SELECT * FROM building))
        |SELECT tag, count(*) AS n FROM u GROUP BY tag ORDER BY tag""".stripMargin,
    "q_case_agg" ->
      """SELECT l_returnflag,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |          THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |          THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l_shipdate < TIMESTAMP '1999-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        | round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q_cube" -> Relational.qCubeOracleSql,
    "q_full_outer" -> Relational.qFullOuterOracleSql,
    "q_having" ->
      """SELECT l_partkey, count(*) AS n_lines,
        | round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem GROUP BY l_partkey
        |HAVING count(*) >= 40 ORDER BY l_partkey""".stripMargin,
    "q_above_avg" ->
      """SELECT c_mktsegment, count(*) AS n_above,
        | round(avg(c_acctbal), 6) AS avg_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_date_agg" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | CAST(month(o_orderdate) AS INTEGER) AS o_month,
        | count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS sum_price,
        | round(min(o_totalprice), 2) AS min_price,
        | round(max(o_totalprice), 2) AS max_price
        |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""".stripMargin,
    "ingest_asset_catalog" ->
      """SELECT 'alpaca_' || symbol AS asset_doc_id, 'alpaca' AS provider_doc_id, symbol
        |FROM (SELECT DISTINCT event_type AS symbol FROM events
        |      WHERE event_type IS NOT NULL)
        |ORDER BY symbol""".stripMargin,
    "ingest_bars_daily" ->
      """WITH b AS (
        |  SELECT event_type AS symbol,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS t,
        |    min_by(value, ts) AS o, max(value) AS h, min(value) AS l,
        |    max_by(value, ts) AS c, count(*) AS v
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2)
        |SELECT strftime(t, '%Y%m%dT%H%M%SZ') || '_Day' AS bar_key, symbol,
        |  t AS timestamp, 'Day' AS timeframe,
        |  o AS open, h AS high, l AS low, c AS close, v AS volume
        |FROM b ORDER BY symbol, timestamp""".stripMargin,
    "ingest_upsert_dedup" ->
      """WITH mk AS (
        |  SELECT event_type AS symbol,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS t,
        |    min_by(value, ts) AS o, max(value) AS h, min(value) AS l,
        |    max_by(value, ts) AS c, count(*) AS v, seq
        |  FROM (
        |    SELECT *, 1 AS seq FROM events WHERE ts < TIMESTAMP '2024-01-21'
        |    UNION ALL
        |    SELECT *, 2 AS seq FROM events WHERE ts >= TIMESTAMP '2024-01-11')
        |  WHERE event_type IS NOT NULL GROUP BY symbol, t, seq)
        |SELECT symbol, strftime(t, '%Y%m%dT%H%M%SZ') || '_Day' AS bar_key,
        |  t AS timestamp, 'Day' AS timeframe,
        |  o AS open, h AS high, l AS low, c AS close, v AS volume
        |FROM mk
        |QUALIFY row_number() OVER (PARTITION BY symbol, t ORDER BY seq DESC) = 1
        |ORDER BY symbol, timestamp""".stripMargin,
    "ingest_summaries" ->
      """WITH b AS (
        |  SELECT event_type AS symbol,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS t, count(*) AS v
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2)
        |SELECT symbol AS asset_symbol, 'Day' AS timeframe,
        |  strftime(min(t), '%Y-%m-%dT%H:%M:%SZ') AS start_timestamp_utc,
        |  strftime(max(t), '%Y-%m-%dT%H:%M:%SZ') AS end_timestamp_utc,
        |  count(*) AS bars_count
        |FROM b GROUP BY 1, 2 ORDER BY asset_symbol""".stripMargin,
    "ingest_run_status" ->
      """WITH b AS (
        |  SELECT event_type AS symbol,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS t, count(*) AS v
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2)
        |SELECT count(DISTINCT symbol) AS assets_processed_count,
        |  count(*) AS total_bars_saved_in_last_run,
        |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) > 0
        |    AS run_had_errors
        |FROM b""".stripMargin,
    "q_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F_n,
        | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F_price,
        | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O_n,
        | round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O_price,
        | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P_n,
        | round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P_price
        |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q17_small_qty" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
        | round(q.sum_qty, 2) AS sum_qty
        |FROM orders
        | JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |       FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200) q
        |   ON o_orderkey = q.l_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q19_disjunctive" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q4_order_priority" -> RelationalExt.q4OrderPriorityOracleSql,
    "q7_nation_volume" -> RelationalExt.q7NationVolumeOracleSql,
    "q8_market_share" -> RelationalExt.q8MarketShareOracleSql,
    "q10_returned_items" -> RelationalExt.q10ReturnedItemsOracleSql,
    "q11_important_balance" -> RelationalExt.q11ImportantBalanceOracleSql,
    "q14_promo_revenue" -> RelationalExt.q14PromoRevenueOracleSql,
    "q15_top_supplier" -> RelationalExt.q15TopSupplierOracleSql,
    "q_grouping_sets" -> RelationalExt.qGroupingSetsSql,
    "q_moving_avg" -> RelationalExt.qMovingAvgSql,
    "q_ntile_lag" -> RelationalExt.qNtileLagSql,
    "q_percentiles" -> RelationalExt.qPercentilesOracleSql,
    "q_hist_quantiles" -> RelationalExt.histQuantilesSql(DuckDialect),
    "q_unpivot" -> RelationalExt.qUnpivotOracleSql,
    "q_bloom_semi_join" -> RelationalExt.qBloomSemiJoinOracleSql,
    "q_gapfill" -> RelationalExt.qGapfillOracleSql,
    "q_array_stats" -> RelationalExt.arrayStatsSql(DuckDialect),
    // engine-portable SQL: the oracle runs the very text Spark executes
    "q2_min_cost_supplier" -> SubqueryShapes.q2MinCostSupplierSql,
    "q13_cust_distribution" -> SubqueryShapes.q13CustDistributionSql,
    "q21_waiting_supplier" -> SubqueryShapes.q21WaitingSupplierSql,
    "q22_inactive_balance" -> SubqueryShapes.q22InactiveBalanceSql,
    "q9_product_profit" -> SubqueryShapes.q9ProductProfitSql,
    "q12_priority_class" -> SubqueryShapes.q12PriorityClassSql,
    "q16_supplier_diversity" -> SubqueryShapes.q16SupplierDiversitySql,
    "q20_recent_share" -> SubqueryShapes.q20RecentShareSql,
    "q_topk_per_group" -> graft.functions.TopKQueries.qTopkPerGroupOracleSql,
    "q_profile" -> RelationalExt.qProfileSql,
    "q_event_funnel" -> RelationalExt.qEventFunnelSql,
    "q_retention" -> RelationalExt.qRetentionSql,
    "src_bar_scan" -> graft.sources.BarSourceQueries.srcBarScanOracleSql,
    // one shared SQL text: the engine runs the very string DuckDB checks
    "ingest_bars_weekly" -> graft.ingest.BarAnalytics.weeklySql,
    "ingest_bar_analytics" -> graft.ingest.BarAnalytics.analyticsSql,
    "ingest_bar_beta" -> graft.ingest.BarAnalytics.betaSql,
    "q_asof_join" -> Temporal.asofOracleSql,
    "q_range_join" -> Temporal.rangeJoinOracleSql,
    "q_session_window" -> Temporal.sessionOracleSql,
    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket,
        | count(*) AS n_events, round(sum(value), 4) AS sum_value,
        | min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin,
    "ingest_quarantine" -> graft.ingest.Quarantine.eventQuarantineOracleSql,
    // Text analysis / dedup / similarity oracles: generated from the
    // same dialect-parameterized SQL bodies as the Spark plans (ops
    // .TextOps), so both sides share logic with portable primitives.
    "text_token_counts" -> TextAnalysis.tokenCountsSql(DuckDialect),
    "text_quality" -> TextAnalysis.qualitySql(DuckDialect),
    "text_langid" -> TextAnalysis.langIdSql(DuckDialect),
    "text_fingerprint" -> TextAnalysis.fingerprintSql(DuckDialect),
    "text_sample_split" -> TextAnalysis.sampleSplitSql(DuckDialect),
    "text_curation" -> TextAnalysis.curationSql(DuckDialect),
    "text_tfidf" -> TextAnalysis.tfidfSql(DuckDialect),
    "text_pack_sequences" -> TextAnalysis.packSequencesSql(DuckDialect),
    "text_chunking" -> TextAnalysis.chunkingSql(DuckDialect),
    "text_chunk_dedup" -> TextAnalysis.chunkDedupSql(DuckDialect),
    "text_contamination" -> TextAnalysis.contaminationSql(DuckDialect),
    "text_contamination_risk" -> TextAnalysis.contaminationRiskSql(DuckDialect),
    "text_weighted_sample" -> TextAnalysis.weightedSampleSql(DuckDialect),
    "text_repetition" -> TextAnalysis.repetitionSql(DuckDialect),
    "text_mixture_plan" -> TextAnalysis.mixturePlanSql(DuckDialect),
    "text_dup_spans" -> TextAnalysis.dupSpansSql(DuckDialect),
    "text_dup_span_cut" -> TextAnalysis.dupSpanCutSql(DuckDialect),
    "text_pii" -> TextAnalysis.piiSql(DuckDialect),
    "text_curation_log" -> TextAnalysis.curationLogSql(DuckDialect),
    "text_curation_log_full" -> TextAnalysis.curationLogFullSql(DuckDialect),
    "text_surprisal_buckets" -> TextAnalysis.surprisalBucketsSql(DuckDialect),
    "text_curation_funnel" -> TextAnalysis.curationFunnelSql(DuckDialect),
    "text_unigram_logprob" -> TextAnalysis.unigramLogprobSql(DuckDialect),
    "text_bigram_logprob" -> TextFilters.bigramLogprobSql(DuckDialect),
    "text_pmi_pairs" -> TextFilters.pmiPairsSql(DuckDialect),
    "text_novelty" -> TextAnalysis.noveltySql(DuckDialect),
    "text_bpe_pairs" -> BpeTrain.bpePairsSql(DuckDialect),
    "text_bpe_merges" -> BpeTrain.bpeMergesSql(DuckDialect),
    "text_bpe_encode" -> BpeTrain.bpeEncodeSql(DuckDialect),
    "text_bpe_fertility" -> BpeTrain.bpeFertilitySql(DuckDialect),
    "text_gopher_rules" -> TextFilters.gopherRulesSql(DuckDialect),
    "text_gopher_by_source" -> TextFilters.gopherBySourceSql(DuckDialect),
    "text_heavy_hitters" -> TextFilters.heavyHittersSql(DuckDialect),
    "text_token_drift" -> TextFilters.tokenDriftSql(DuckDialect),
    "text_source_cap" -> TextFilters.sourceCapSql(DuckDialect),
    "text_shard_plan" -> TextFilters.shardPlanSql(DuckDialect),
    "text_shard_manifest" -> TextFilters.shardManifestSql(DuckDialect),
    "q_ts_correlation" -> Temporal.tsCorrelationOracleSql,
    "q_anomaly" -> Temporal.anomalySql,
    "dedup_exact" -> Dedup.exactSql(DuckDialect),
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql(DuckDialect),
    "dedup_containment" -> Dedup.ngramContainmentSql(DuckDialect),
    "dedup_split_leakage" -> Dedup.splitLeakageSql(DuckDialect),
    "dedup_degree_hist" -> Dedup.degreeHistSql(DuckDialect),
    "dedup_minhash_lsh" -> Dedup.minhashLshSql(DuckDialect),
    "dedup_lsh_cap_report" -> Dedup.minhashCapReportSql(DuckDialect),
    // SimHash oracle is deliberately a DIFFERENT algorithm (brute-force
    // all-pairs) that must equal the engine's banded result — see
    // Dedup header for the completeness argument.
    "dedup_simhash" -> Dedup.simhashBruteSql(DuckDialect),
    // Cluster oracle is a recursive-CTE reachability closure vs the
    // engine's iterated label propagation — independent algorithms.
    "dedup_clusters" -> Dedup.simhashClustersOracleSql(DuckDialect),
    "dedup_embedding" -> Dedup.embeddingCosineSql(DuckDialect),
    "dedup_embedding_lsh" -> Dedup.embeddingLshSql(DuckDialect),
    "dedup_embedding_lsh_scaled" -> Dedup.embeddingLshScaledSql(DuckDialect),
    "dedup_lsh_recall" -> Dedup.lshRecallSql(DuckDialect),
    "dedup_lsh_recall_sampled" -> Dedup.lshRecallSampledSql(DuckDialect),
    "dedup_embedding_compact" -> Dedup.embeddingCompactOracleSql(DuckDialect),
    "dedup_semantic" -> Dedup.semanticSql(DuckDialect),
    "dedup_semantic_scaled" -> Dedup.semanticScaledSql(DuckDialect),
    "dedup_report" -> Dedup.reportSql(DuckDialect),
    "dedup_report_tokens" -> Dedup.reportTokensSql(DuckDialect),
    "dedup_cross_source" -> Dedup.crossSourceSql(DuckDialect),
    "dedup_compact" -> Dedup.compactKeptOracleSql(DuckDialect),
    "dedup_incremental" -> Dedup.incrementalSql(DuckDialect),
    "sim_topk_bruteforce" -> Similarity.topKSql(DuckDialect),
    "sim_ann_lsh" -> Similarity.annLshSql(DuckDialect),
    "sim_ann_lsh_scaled" -> Similarity.annLshScaledSql(DuckDialect),
    "sim_ann_ivf" -> Similarity.ivfSql(DuckDialect),
    "sim_ivf_kmeans" -> Similarity.ivfKmeansSql(DuckDialect),
    "sim_recall" -> Similarity.recallSql(DuckDialect),
    "sim_recall_sampled" -> Similarity.recallSampledSql(DuckDialect),
    "sim_retrieval_ndcg" -> Similarity.retrievalNdcgSql(DuckDialect),
    "sim_retrieval_ndcg_sampled" ->
      Similarity.retrievalNdcgSampledSql(DuckDialect),
    "sim_recall_rerank" -> Similarity.recallRerankSql(DuckDialect),
    "sim_mmr_rerank" -> Similarity.mmrSql(DuckDialect),
    "sim_nprobe_sweep" -> Similarity.nprobeSweepSql(DuckDialect),
    "sim_quantize" -> Similarity.quantizeSql(DuckDialect),
    // identical semantics to sim_ann_ivf / sim_ivf_kmeans by
    // construction — the same oracles verify the persisted-index paths
    "sim_ann_ivf_persisted" -> Similarity.ivfSql(DuckDialect),
    "sim_ivf_kmeans_persisted" -> Similarity.ivfKmeansSql(DuckDialect),
    "sim_ivf_kmeans_scaled" -> Similarity.ivfKmeansScaledSql(DuckDialect),
    "sim_quantized_topk" -> Similarity.quantizedTopKSql(DuckDialect),
    // recomputes the quantized IVF pipeline from the raw embeddings —
    // independently checks the persisted int8 store AND the serving math
    "sim_ann_ivf_pq" -> Similarity.ivfQuantizedSql(DuckDialect),
    "sim_ivf_kmeans_pq" -> Similarity.ivfKmeansQuantizedSql(DuckDialect),
    "sim_ann_ivf_pq_rerank" -> Similarity.ivfQuantizedRerankSql(DuckDialect),
    "sim_ivf_kmeans_pq_rerank" ->
      Similarity.ivfKmeansQuantizedRerankSql(DuckDialect),
    "sim_knn_graph" -> Similarity.knnGraphSql(DuckDialect),
    "sim_knn_graph_recall" -> Similarity.knnGraphRecallSql(DuckDialect),
    "sim_source_coherence" -> Similarity.sourceCoherenceSql(DuckDialect),
    "sim_outlier_report" -> Similarity.outlierReportSql(DuckDialect),
    "sim_embedding_drift" -> Similarity.embeddingDriftSql(DuckDialect),
    "sim_pca_projection" -> Similarity.pcaSql(DuckDialect),
    "sim_embedding_stats" -> Similarity.embeddingStatsSql(DuckDialect),
    "sim_index_health" -> Similarity.indexHealthSql(DuckDialect),
    "sim_index_maintain" -> Similarity.indexMaintainSql(DuckDialect),
    "q_approx_distinct" -> Relational.qApproxDistinctOracleSql,
    "q_kmv_distinct" -> Relational.qKmvDistinctOracleSql,
    "q_salted_agg" -> ScalePatterns.qSaltedAggOracleSql,
    "q_skew_report" -> ScalePatterns.skewReportSql(DuckDialect),
    "text_bm25_topk" -> Retrieval.bm25Sql(DuckDialect),
    // identical semantics to text_bm25_topk by construction — the
    // same oracle verifies the persisted-postings serving path
    "text_bm25_persisted" -> Retrieval.bm25Sql(DuckDialect),
    "lex_index_health" -> Retrieval.lexIndexHealthSql(DuckDialect),
    "sim_hybrid_recall" -> Retrieval.hybridRecallSql(DuckDialect),
    "sim_hybrid_recall_sampled" ->
      Retrieval.hybridRecallSampledSql(DuckDialect),
    "sim_hybrid_rrf" -> Retrieval.hybridRrfSql(DuckDialect),
    "sim_hybrid_rrf_sampled" -> Retrieval.hybridRrfSampledSql(DuckDialect),
    "sim_hybrid_rrf_ann" -> Retrieval.hybridRrfAnnSql(DuckDialect),
    "sim_hybrid_rrf_ann_scaled" ->
      Retrieval.hybridRrfAnnScaledSql(DuckDialect),
    "text_dsir_weights" -> Retrieval.dsirWeightsSql(DuckDialect),
    "text_quality_classifier" ->
      Retrieval.qualityClassifierSql(DuckDialect),
    "text_dsir_sample" -> Retrieval.dsirSampleSql(DuckDialect),
    "text_corpus_stats" -> Retrieval.corpusStatsSql(DuckDialect),
    "text_k_anonymity" -> Retrieval.kAnonymitySql(DuckDialect),
    "sim_cluster_purity" -> Similarity.clusterPuritySql(DuckDialect),
    "sim_cluster_keywords" -> Similarity.clusterKeywordsSql(DuckDialect),
    "sim_ann_ivf_adc" -> Similarity.ivfAdcSql(DuckDialect),
    "sim_adc_recall" -> Similarity.adcRecallSql(DuckDialect),
    "sim_adc_recall_sampled" -> Similarity.adcRecallSampledSql(DuckDialect),
    "sim_ivf_adc_trained" -> Similarity.ivfAdcTrainedSql(DuckDialect),
    "sim_cluster_sample" -> Similarity.clusterSampleSql(DuckDialect),
    "sim_cluster_sample_scaled" ->
      Similarity.clusterSampleScaledSql(DuckDialect),
    "text_chunk_bm25" -> Retrieval.chunkBm25Sql(DuckDialect),
    "text_mixture_temperature" ->
      TextAnalysis.mixtureTemperatureSql(DuckDialect),
    "mm_inventory" -> Multimodal.inventoryOracleSql,
    "mm_video_frames" -> Multimodal.videoFramesOracleSql,
    "mm_image_resize" -> Multimodal.imageResizeOracleSql,
    "mm_decode_features" -> Multimodal.decodeFeaturesOracleSql,
    "mm_decode_wav" -> Multimodal.decodeWavOracleSql,
    "mm_decode_ppm" -> Multimodal.decodePpmOracleSql,
    "mm_audio_windows" -> Multimodal.audioWindowsOracleSql,
    "mm_dedup" -> Multimodal.payloadDedupOracleSql,
  )
}
