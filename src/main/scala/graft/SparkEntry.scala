package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.JsonReports
import graft.functions.{text => T}

/** Driver contract — see /root/repo/SURVEY.md §2 for the capability map.
  *
  * Every implemented operator is registered in [[queries]]; those whose
  * semantics are ANSI-SQL-expressible carry a DuckDB oracle in
  * [[oracleSql]] (same column names, same rounding, same ordering). The
  * rest (LSH/SimHash candidate generation, streaming, decode plumbing)
  * are covered by ScalaTest specs with planted ground truth.
  *
  * Oracle conventions (why the SQL looks the way it does):
  *  - `events.ts` is parquet TIMESTAMP(NANOS): DuckDB reads it as
  *    TIMESTAMP_NS, Spark as int64 → microseconds; every oracle casts
  *    `ts` to TIMESTAMP (µs, floor) so both sides agree.
  *  - every float column is rounded to 4 dp on BOTH sides;
  *  - every query has a deterministic total ORDER BY;
  *  - counts are BIGINT on both sides (Spark `count`/casts ↔ DuckDB).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Reports.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-block: relational / report core
    "q01_pricing_summary"        -> ((s, d) => Reports.pricingSummary(s, d)),
    "q02_revenue_by_nation"      -> ((s, d) => Reports.revenueByNation(s, d)),
    "q03_top_orders_per_segment" -> ((s, d) => Reports.topOrdersPerSegment(s, d)),
    "q04_daily_order_spine"      -> ((s, d) => Reports.dailyOrderSpine(s, d)),
    "q05_event_type_pivot"       -> ((s, d) => Reports.eventTypePivot(s, d)),
    "q06_sales_report"           -> ((s, d) => Reports.salesReport(s, d)),
    "q07_clean_strings"          -> ((s, d) => Reports.cleanStrings(s, d)),
    "q08_dedup_latest"           -> ((s, d) => Dedup.dedupLatest(s, d)),
    "q09_sessionize"             -> ((s, d) => Sessionize.sessionize(s, d)),
    "q10_hourly_rollup"          -> ((s, d) => Reports.hourlyRollup(s, d)),
    "q11_json_props"             -> ((s, d) => jsonProps(s, d)),
    "q12_union_coalesce"         -> ((s, d) => Reports.unionCoalesce(s, d)),
    "q13_utc_day_bounds"         -> ((s, d) => Reports.utcDayBounds(s, d)),
    "q14_partitioned_sink"       -> ((s, d) => Reports.partitionedSink(s, d)),
    // B-block: forecasting
    "q15_forecast_daily"         -> ((s, d) => Forecast.forecastDailyValue(s, d)),
    "q16_forecast_multi"         -> ((s, d) => Forecast.forecastMulti(s, d)),
    "q17_forecast_bounded"       -> ((s, d) => Forecast.forecastBounded(s, d)),
    "q18_forecast_regressor"     -> ((s, d) => Forecast.forecastRegressor(s, d)),
    "q19_forecast_yearly"        -> ((s, d) => Forecast.forecastYearly(s, d)),
    "q43_forecast_joint"         -> ((s, d) => Forecast.forecastJoint(s, d)),
    "q44_forecast_joint_cramer"  -> ((s, d) => Forecast.forecastJointCramer(s, d)),
    "q35_forecast_holidays"      -> ((s, d) => Forecast.forecastHolidays(s, d)),
    "q38_forecast_changepoints"  -> ((s, d) => Forecast.forecastChangepoints(s, d)),
    // C-block: training-data pipeline
    "q20_dedup_exact"            -> ((s, d) => Dedup.dedupExact(s, d)),
    "q21_minhash_lsh"            -> ((s, d) => Dedup.minhashLsh(s, d)),
    "q22_simhash"                -> ((s, d) => Dedup.simhashDedup(s, d)),
    "q23_ngram_jaccard"          -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "q24_embedding_neardup"      -> ((s, d) => Similarity.embeddingNearDup(s, d)),
    "q25_ann_bruteforce"         -> ((s, d) => Similarity.annBruteForce(s, d)),
    "q26_ann_lsh"                -> ((s, d) => Similarity.annLsh(s, d)),
    "q78_ann_lsh_portable"       -> ((s, d) => Similarity.annLshPortable(s, d)),
    "q79_ann_ivf_portable"       -> ((s, d) => Similarity.annIvfPortable(s, d)),
    "q80_ann_pq_portable"        -> ((s, d) => Similarity.annPqPortable(s, d)),
    "q81_ann_ivfpq_portable"     -> ((s, d) => Similarity.annIvfPqPortable(s, d)),
    "q82_forecast_planted"       -> ((s, d) => Forecast.forecastPlanted(s, d)),
    "q83_forecast_planted_mult"  -> ((s, d) => Forecast.forecastPlantedMult(s, d)),
    "q85_semantic_dedup"         -> ((s, d) => Similarity.semanticDedupPortable(s, d)),
    "q88_cluster_sample"         -> ((s, d) => Similarity.clusterSamplePortable(s, d)),
    "q36_ann_ivf"                -> ((s, d) => Similarity.annIvf(s, d)),
    "q47_ann_pq"                 -> ((s, d) => Similarity.annPq(s, d)),
    "q48_ann_ivfpq"              -> ((s, d) => Similarity.annIvfPq(s, d)),
    "q37_dup_clusters"           -> ((s, d) => Dedup.dupClustersEmbeddings(s, d)),
    "q39_dup_clusters_logn"      -> ((s, d) => Dedup.dupClustersEmbeddingsLogN(s, d)),
    "q42_dup_clusters_auto"      -> ((s, d) => Dedup.dupClustersEmbeddingsAuto(s, d)),
    "q27_langid"                 -> ((s, d) => TextAnalysis.langId(s, d)),
    "q28_quality_score"          -> ((s, d) => TextAnalysis.qualityScore(s, d)),
    "q29_token_counts"           -> ((s, d) => TextAnalysis.tokenCounts(s, d)),
    "q30_fingerprint"            -> ((s, d) => TextAnalysis.fingerprintDocs(s, d)),
    "q31_multimodal_meta"        -> ((s, d) => Multimodal.multimodalMeta(s, d)),
    "q32_doc_stats"              -> ((s, d) => TextAnalysis.docStats(s, d)),
    "q40_word_stats"             -> ((s, d) => TextAnalysis.wordStats(s, d)),
    "q41_asof_attribution"       -> ((s, d) => AsOfJoin.clickAttribution(s, d)),
    "q45_token_packing"          -> ((s, d) => Sharding.tokenPacking(s, d)),
    "q46_unigram_logprob"        -> ((s, d) => TextAnalysis.unigramLogProb(s, d)),
    "q49_pii_redact"             -> ((s, d) => TextClean.piiRedactDocs(s, d)),
    "q50_html_strip"             -> ((s, d) => TextClean.htmlStripDocs(s, d)),
    "q51_doc_chunks"             -> ((s, d) => Sharding.docChunks(s, d)),
    "q52_tfidf_terms"            -> ((s, d) => TextAnalysis.tfidfTopTerms(s, d)),
    "q53_quality_filter"         -> ((s, d) => TextAnalysis.qualityFilter(s, d)),
    "q54_stratified_sample"      -> ((s, d) => Sharding.stratifiedDocSample(s, d)),
    // Shopify sales-report refunds/returns leg
    "q33_sales_returns"          -> ((s, d) => Reports.salesReturns(s, d)),
    "q34_refunds_frame"          -> ((s, d) => Reports.refundsFrame(s, d)),
    // engagement analytics over the events stream
    "q55_cohort_retention"       -> ((s, d) => Analytics.cohortRetentionEvents(s, d)),
    "q56_funnel_conversion"      -> ((s, d) => Analytics.funnelEvents(s, d)),
    "q57_rolling_metrics"        -> ((s, d) => Analytics.rollingMetricsEvents(s, d)),
    "q58_anomaly_flags"          -> ((s, d) => Analytics.anomalyFlagsEvents(s, d)),
    // sketch-backed scale operators
    "q59_bloom_semijoin"         -> ((s, d) => Sketches.bloomPrunedRevenue(s, d)),
    "q60_hll_users"              -> ((s, d) => Sketches.hllUsersByType(s, d)),
    "q77_hll_portable"           -> ((s, d) => Sketches.hllUsersPortable(s, d)),
    "q64_kll_quantiles"          -> ((s, d) => Sketches.kllQuantilesByType(s, d)),
    "q84_cms_heavy_hitters"      -> ((s, d) => Sketches.cmsTopUsers(s, d)),
    "q87_kmv_overlap"            -> ((s, d) => Sketches.kmvSourceOverlap(s, d)),
    // change-data-capture operators
    "q61_snapshot_diff"          -> ((s, d) => Cdc.snapshotDiffOrders(s, d)),
    "q62_scd2_merge"             -> ((s, d) => Cdc.scd2Customers(s, d)),
    "q63_linear_attribution"     -> ((s, d) => Analytics.linearAttributionEvents(s, d)),
    "q67_ushaped_attribution"    -> ((s, d) => Analytics.ushapedAttributionEvents(s, d)),
    "q68_paragraph_dedup"        -> ((s, d) => Dedup.paragraphDedupPages(s, d)),
    "q69_canonical_docs"         -> ((s, d) => Dedup.canonicalDocsEmbeddings(s, d)),
    "q70_span_dedup"             -> ((s, d) => Dedup.spanDedupDocs(s, d)),
    "q71_neardup_verdicts"       -> ((s, d) => Dedup.neardupVerdicts(s, d)),
    "q72_corpus_mix"             -> ((s, d) => Sharding.corpusMixDocs(s, d)),
    "q73_weighted_sample"        -> ((s, d) => Sharding.weightedSampleDocs(s, d)),
    "q74_simhash_verdicts"       -> ((s, d) => Dedup.simhashDedupPortable(s, d)),
    "q75_span_census_probe"      -> ((s, d) => Dedup.spanCensusProbeDocs(s, d)),
    "q76_paragraph_census_probe" -> ((s, d) => Dedup.paragraphCensusProbePages(s, d)),
    "q65_data_quality"           -> ((s, d) => Validation.ordersQuality(s, d)),
    "q66_session_attribution"    -> ((s, d) => IntervalJoin.sessionAttribution(s, d)),
    "q86_edit_join"              -> ((s, d) => FuzzyJoin.editJoinCustomers(s, d)),
    "q89_fuzzy_canonical"        -> ((s, d) => FuzzyJoin.fuzzyCanonicalParts(s, d)),
    "q90_bm25_search"            -> ((s, d) => Search.bm25SearchDocs(s, d)),
    "q91_bm25_incremental"       -> ((s, d) => Search.bm25IncrementalDocs(s, d)),
    "q92_phrase_search"          -> ((s, d) => Search.phraseSearchDocs(s, d)),
    "q93_bigram_nll"             -> ((s, d) => TextAnalysis.bigramNll(s, d)),
    "q94_collocations"           -> ((s, d) => TextAnalysis.collocations(s, d)),
    // dims = 60 (round 12): the FULL-width path — one md5's worth of
    // sign bits — so the oracle pins the widest projection the kernel
    // can emit, not just the 32-dim default
    "q95_text_embed_neardup"     -> ((s, d) => TextEmbed.textEmbedNearDup(s, d, dims = 60)),
    "q96_timedecay_attribution"  -> ((s, d) => Analytics.timeDecayAttributionEvents(s, d)),
    "q97_ingest_gate"            -> ((s, d) => Validation.ingestGateOrders(s, d)),
    "q98_semantic_dedup_probe"   -> ((s, d) => Similarity.semanticDedupProbePortable(s, d)),
    "q99_perplexity_buckets"     -> ((s, d) => TextAnalysis.perplexityBuckets(s, d)),
    "q100_repetition_signals"    -> ((s, d) => TextAnalysis.repetitionSignals(s, d)),
    "q101_dsir_selection"        -> ((s, d) => Sharding.dsirSelectDocs(s, d)),
    "q102_line_filter"           -> ((s, d) => TextClean.lineFilterDocs(s, d)),
    "q103_gopher_filters"        -> ((s, d) => TextAnalysis.gopherFiltersDocs(s, d)),
    "q104_fix_mojibake"          -> ((s, d) => TextClean.fixMojibakeDocs(s, d)),
    "q105_url_dedup"             -> ((s, d) => Urls.urlDedupDocs(s, d)),
    "q106_domain_gate"           -> ((s, d) => Urls.domainGateDocs(s, d)),
    "q107_exact_probe"           -> ((s, d) => Dedup.exactProbeDocs(s, d)),
    "q108_nb_classifier"         -> ((s, d) => Classify.nbLangDocs(s, d)),
    "q109_hybrid_rrf"            -> ((s, d) => Search.hybridSearchDocs(s, d)),
    "q110_leakage_split"         -> ((s, d) => Sharding.leakageSplitDocs(s, d)),
    "q111_url_probe"             -> ((s, d) => Urls.urlProbeDocs(s, d)),
    "q113_blocklist_gate"        -> ((s, d) => Urls.blocklistGateDocs(s, d)),
    "q112_nb_incremental"        -> ((s, d) => Classify.nbIncrementalDocs(s, d)),
    "q114_corpus_datasheet"      -> ((s, d) => TextAnalysis.corpusDatasheetDocs(s, d)),
    "q115_boilerplate_strip"     -> ((s, d) => TextClean.boilerplateStripDocs(s, d)),
    "q116_curation_pipeline"     -> ((s, d) => Pipeline.curationPipelineDocs(s, d)),
    "q117_boilerplate_probe"     -> ((s, d) => TextClean.boilerplateProbeDocs(s, d)),
    "q118_temperature_sample"    -> ((s, d) => Sharding.temperatureSampleDocs(s, d)),
    "q119_token_entropy"         -> ((s, d) => TextAnalysis.tokenEntropyDocs(s, d)),
    "q120_wet_records"           -> ((s, d) => graft.sources.Warc.wetRecordsDocs(s, d)),
    "q121_crawl_ingest"          -> ((s, d) => Pipeline.crawlIngestDocs(s, d)),
    "q122_signal_battery"        -> ((s, d) => TextAnalysis.signalBatteryDocs(s, d)),
    "q123_epoch_expansion"       -> ((s, d) => Sharding.epochExpansionDocs(s, d)),
    "q124_packed_sequences"      -> ((s, d) => Sharding.packedSequencesDocs(s, d)),
    "q125_bpe_encode"            -> ((s, d) => Bpe.bpeEncodeDocs(s, d)),
    "q126_bpe_kernel"            -> ((s, d) => Bpe.bpeKernelDocs(s, d)),
    "q127_corpus_build"          -> ((s, d) => Pipeline.corpusBuildDocs(s, d)),
    "q128_dsir_incremental"      -> ((s, d) => Sharding.dsirIncrementalDocs(s, d)),
    "q129_forecast_joint_cramer5" -> ((s, d) => Forecast.forecastJointCramer5(s, d)),
    "q130_bpe_packing"           -> ((s, d) => Bpe.bpePackedDocs(s, d)),
    "q131_tokenizer_parity"      -> ((s, d) => Bpe.tokenizerParityDocs(s, d)),
    "q132_curation_probe"        -> ((s, d) => Pipeline.curationProbeDocs(s, d)),
    "q133_forecast_joint_cramer6" -> ((s, d) => Forecast.forecastJointCramer6(s, d)),
    // rows-only (KMeans training has no SQL oracle — C7b convention):
    // the production-quantizer raw-text SemDeDup path q95 deliberately
    // fixes away; semantics certified by q85/q95 hash-checks of the
    // identical downstream stages + the planted-cluster TextEmbedSpec
    "q134_text_semdedup_trained" -> ((s, d) => TextEmbed.textSemDedupTrained(s, d)),
    "q135_phrase_incremental"    -> ((s, d) => Search.phraseIncrementalDocs(s, d)),
    "q136_bpe_byte_kernel"       -> ((s, d) => Bpe.bpeByteStatsDocs(s, d)),
    "q137_ngram_decontamination" -> ((s, d) => Dedup.ngramDecontaminationDocs(s, d)),
    // q134's pipeline on the two-level (inverted-multi-index)
    // quantizer — assignment scores ~2·sqrt(cells) centroids instead
    // of cells, the flat-IVF growth path measured in SCALING_r13.
    // Round 17: ORACLE-BACKED from its persisted half sub-quantizers
    // (the q134/q140 trained-artifact convention)
    "q138_text_semdedup_imi"     -> ((s, d) => TextEmbed.textSemDedupImi(s, d)),
    "q139_semdedup_imi_portable" -> ((s, d) => Similarity.semanticDedupImiPortable(s, d)),
    // rows-only (three KMeans fits — C7b/C7d convention): the composed
    // IMI+ADC system — two-level coarse quantizer + residual PQ codes;
    // q141 oracle-backs the identical search semantics on formula
    // artifacts, recall/parity spec-tested
    "q140_ann_imipq"             -> ((s, d) => Similarity.annImiPq(s, d,
      artifactDir = Some(s"${Similarity.TrainedArtifactRoot}/imipq"))),
    "q141_ann_imipq_portable"    -> ((s, d) => Similarity.annImiPqPortable(s, d)),
    "q142_bpe_packed_special"    -> ((s, d) => Bpe.bpePackedDelimitedDocs(s, d)),
    "q143_bpe_token_ids"         -> ((s, d) => Bpe.bpeTokenIdsDocs(s, d)),
    "q144_bpe_packed_ids"        -> ((s, d) => Bpe.bpePackedIdsDocs(s, d)),
    // EXACT prefix-filtered Jaccard join (AllPairs/PPJoin): same verdict
    // family as q23 but lossless, so the oracle is the PURE all-pairs
    // Jaccard with no candidate-scheme mirroring
    "q145_jaccard_prefix"        -> ((s, d) => Dedup.shingleJaccardPrefix(s, d)),
    // mixture-proportional deterministic training order: stride
    // interleave on dyadic keys, position-exact across engines
    "q146_mixture_order"         -> ((s, d) => Sharding.mixtureOrderDocs(s, d)),
    // day-2 EXACT Jaccard: batch vs the persisted three-part prefix
    // index (postings + grams + frozen vocab), estimator-free q71
    "q147_prefix_verdicts"       -> ((s, d) => Dedup.prefixVerdicts(s, d)),
    // vocabulary-growth (Heaps) curve: exact type/token/hapax counts
    // at document-prefix milestones — the corpus-health diagnostic
    "q148_vocab_growth"          -> ((s, d) => TextAnalysis.vocabGrowthDocs(s, d)),
    // z-order layout: min/max grid scaling + Morton bit interleave +
    // prefix bucket — the multi-column file-skipping sort key
    "q149_zorder_layout"         -> ((s, d) => graft.sources.Layout.zorderDocs(s, d)),
    // tokenizer DECODE: decode(encode(word)) == word corpus-wide —
    // the identity pins the id space, merge fold and byte map at once
    "q150_bpe_decode_roundtrip"  -> ((s, d) => Bpe.bpeDecodeDocs(s, d)),
    // winnowing (MOSS) local fingerprints: per-window min-hash
    // selection, pairwise shared-span evidence at ~2/(w+1) density
    "q151_winnow_overlap"        -> ((s, d) => Dedup.winnowOverlapDocs(s, d)),
    // winnowing day-2 probe: batch docs verdict against the persisted
    // fingerprint index — the one index family with NO frozen state
    "q152_winnow_probe"          -> ((s, d) => Dedup.winnowProbeVerdicts(s, d)),
    // shared-span localization: matched winnow prints → diagonal
    // islands → character intervals, the excision-ready coordinates
    "q153_winnow_spans"          -> ((s, d) => Dedup.winnowSpansDocs(s, d)),
    // span excision: merge each doc's b-side intervals, stitch the
    // kept segments in one higher-order fold — ExactSubstr's removal
    "q154_winnow_excise"         -> ((s, d) => Dedup.winnowExciseDocs(s, d)),
    // day-2 span probe: batch spans localize against the persisted
    // positional index — incremental ExactSubstr, corpus never re-read
    "q155_winnow_span_probe"     -> ((s, d) => Dedup.winnowSpanProbe(s, d)),
    // clean ingest, batch form: probe spans vs the index, excise them
    // from the batch — every doc survives with only its novel text
    "q156_winnow_clean"          -> ((s, d) => Dedup.winnowCleanDocs(s, d)),
    // within-doc repeated-line removal: first occurrence kept, order
    // preserved — one zero-shuffle HOF projection per row
    "q157_line_dedup"            -> ((s, d) => TextClean.lineDedupDocs(s, d)),
    // token-budget mixture planning: water-filling under an epoch cap,
    // integer-exact on a #sources-row frame
    "q158_mixture_plan"          -> ((s, d) => Sharding.mixturePlanDocs(s, d)),
    // the plan executed: whole copies + basis-point fractional coin,
    // one broadcast join + map-side explode over the corpus
    "q159_mixture_execute"       -> ((s, d) => Sharding.mixturePlanExecuteDocs(s, d)),
    // frozen-grid z-order increment: day-2 rows grid/route under the
    // build's bounds, out-of-range values clamp to the grid edge
    "q160_zorder_append"         -> ((s, d) => graft.sources.Layout.zorderAppendDocs(s, d)),
    // recall@k meter: the IVF tier at nProbe 1 and 4 vs exact brute
    // force — the probe knob's measured effect, integer basis points
    "q161_ann_recall"            -> ((s, d) => Similarity.annRecallReport(s, d)),
    // the PQ tier's knob measured the same way: ADC rerank cut 10 vs 50
    "q162_ann_pq_recall"         -> ((s, d) => Similarity.annPqRecallReport(s, d)),
    // the TWO-LEVEL (IMI) tier metered on the q161 convention: per-half
    // probe width 1 vs 2 on the q139 formula chain
    "q163_ann_imi_recall"        -> ((s, d) => Similarity.annImiRecallReport(s, d)),
    // the composed IMI+ADC tier (q141's chain) at ADC cuts 10 vs 50 —
    // the headline 100 TB configuration, now metered
    "q164_ann_imipq_recall"      -> ((s, d) => Similarity.annImiPqRecallReport(s, d)),
    // the mixture loop composed: q158 plan → q159 multiset → the
    // interleaved training order with REALIZED-count strides
    "q165_mixture_interleaved"   -> ((s, d) => Sharding.mixtureTrainingOrderDocs(s, d)),
    // the z-order grid-drift meter: clamp counts + actual ranges vs the
    // frozen bounds, one row per layout column (q160's scenario)
    "q166_zorder_drift"          -> ((s, d) => graft.sources.Layout.zorderDriftDocs(s, d)),
    // the PQ tier's OTHER knob: codebook size 16 vs 64 at a fixed ADC
    // cut — recall bought at constant per-query scan cost
    "q167_ann_pq_codebook"       -> ((s, d) => Similarity.annPqCodebookRecallReport(s, d)),
    // the LSH tier's knob: band split 2 vs 4 over 16 bits — with this
    // row every ANN tier in the family is metered
    "q168_ann_lsh_recall"        -> ((s, d) => Similarity.annLshRecallReport(s, d)),
    // deterministic JL sign projection: the 64→16 scan-width lever,
    // every component oracle-replayed from the md5 plane formula
    "q169_jl_projection"         -> ((s, d) => Similarity.jlProjectionDocs(s, d)),
    // the eval-leakage firewall composed: grouped split → held-out
    // gram artifact → train-side contamination flags
    "q170_split_decontam"        -> ((s, d) => Dedup.splitDecontamDocs(s, d)),
    // interpolated Kneser–Ney bigram scoring — the KenLM-style
    // smoothing behind the CCNet-family filters
    "q171_kneser_ney"            -> ((s, d) => TextAnalysis.knBigramNll(s, d)),
    // the day-2 KN flow: fit on the 80% slice, score the batch against
    // the frozen model — unseen events priced by smoothed continuation
    "q172_kn_score"              -> ((s, d) => TextAnalysis.knScoreDocs(s, d)),
    // Cavnar–Trenkle rank-profile language ID: frozen profiles from
    // the corpus slice, the batch identified by out-of-place distance
    "q173_langid_profiles"       -> ((s, d) => TextAnalysis.langIdProfileDocs(s, d)),
    // the MASTER pipeline: raw crawl chunks → packed BOS/EOS
    // training-id shards as ONE operator — ingest, clean, exact+near
    // dedup, winnow excision, gate, firewall, mixture, interleave, pack
    "q174_master_pipeline"       -> ((s, d) => Pipeline.masterPipelineDocs(s, d)),
    // the TRAINED IMI+ADC tier's recall meter, from the q140 persisted
    // artifacts at the production knobs — the tier a deployment ships
    // joins the q161-q168 oracle-backed meter family
    "q175_ann_trained_recall"    -> ((s, d) => Similarity.annImiPqTrainedRecallReport(s, d)),
    // interpolated Kneser-Ney at ORDER 3 — the KenLM-family filter
    // order production CCNet-style pipelines actually ship
    "q176_kn_trigram"            -> ((s, d) => TextAnalysis.knTrigramNll(s, d)),
    // the day-2 order-3 flow: fit on the 80% slice, score the batch
    // with every backoff rung priced (trigram mass, continuation
    // bigram mass, Laplace-floored continuation unigram)
    "q177_kn3_score"             -> ((s, d) => TextAnalysis.kn3ScoreDocs(s, d)),
    // the DAY-2 master ingest: the whole curation chain run against
    // the FROZEN day-1 artifacts — every batch record fated, both
    // firewall leak directions live, shipped docs encoded
    "q178_master_ingest"         -> ((s, d) => Pipeline.masterIngestDocs(s, d)),
    // the DAY-2 mixture REFRESH: day-1 train pool ∪ the ingest's
    // accepted batch → fresh water-fill, expansion, interleave and
    // DDP pack — the daily re-plan masterIngest only promised in prose
    "q179_master_refresh"        -> ((s, d) => Pipeline.masterRefreshDocs(s, d)),
    // the REFRESH-CADENCE meter (E9b): per-source pool mass vs the
    // persisted plan's recorded totals — grown sources, a plan-unseen
    // source, and a vanished source all report, integer-exact
    "q180_refresh_meter"         -> ((s, d) => Maintain.refreshMeterDocs(s, d))
  )

  /** A11 — JSON column flattening via the generic JsonReports source. */
  private def jsonProps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val ev = Tables(spark, dir).events.select(col("event_id"), col("props"))
    graft.operators.Perf.sortedOnce(
      JsonReports.flattenJson(ev, "props", JsonReports.schemaOf("k INT")),
      col("event_id"))
  }

  // ---- oracle SQL ------------------------------------------------------

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  private val langScoreCols: String = T.stopwords.map { case (lang, ws) =>
    s"len(list_filter(toks, t -> list_contains(${sqlList(ws)}, t))) AS s_$lang"
  }.mkString(", ")

  private val langBest: String =
    "greatest(" + T.stopwords.map { case (l, _) => s"s_$l" }.mkString(", ") + ")"

  private val langCase: String =
    "CASE " + T.stopwords.map { case (l, _) => s"WHEN s_$l = $langBest THEN '$l'" }.mkString(" ") +
      " ELSE 'unknown' END"

  private val enStops: String = sqlList(T.stopwords.head._2)

  /** Session rollup SQL shared by q09 and q66: q09's Spark side IS the
    * sessionizer; q66's Spark side re-derives session membership with
    * the keyed binned interval join — two independent computations,
    * ONE oracle truth. */
  private val sessionSql: String =
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM e),
      |m AS (SELECT *, CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new FROM l),
      |s AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM m)
      |SELECT user_id, session_id, count(*) AS n_events,
      | min(ts) AS session_start, max(ts) AS session_end, round(sum(value),4) AS session_value
      |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  /** Quality-score CTEs shared by q28 and q53 — ONE source of truth for
    * the scoring formula on the oracle side (the Spark side shares
    * `TextAnalysis.qualityScoreDocs` the same way). */
  /** q158/q159 shared oracle prefix: the whole water-filling plan —
    * weights CASE-chain GENERATED from [[graft.operators.Sharding
    * .mixturePlanWeights]] (the q104 shared-constant convention),
    * budget = 9/5 of corpus tokens, the ratio sort, prefix cap test,
    * running AND and the floor-divided allocations, all integer-exact.
    * Ends at CTE `a` carrying (source, n_docs, n_tokens, weight,
    * capacity, capped, alloc_tokens). */
  /** The q180 refresh-meter oracle: the plan-time per-source totals
    * over the DAY-1 pool (doc_id % 10 ≠ 7, weighted sources only —
    * exactly the rows planMixture's plan carries; the meter consumes
    * only the plan's recorded n_tokens, never its allocations), then
    * the meter's full-outer arithmetic against the CURRENT pool (all
    * docs, src13 remapped to src_day2): is_new = the plan never saw
    * it, in_pool = the pool still carries it, growth_bp =
    * floor(10000 · max(cur − plan, 0) / plan) for defined rows, −1
    * otherwise — integer-exact (`//` and Spark DIV agree on
    * non-negatives). */
  private val refreshMeterOracleSql: String = {
    val cases = graft.operators.Sharding.mixturePlanWeights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"WHEN '$s' THEN $w" }.mkString(" ")
    s"""WITH pln AS (
       |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_tokens
       |  FROM documents WHERE doc_id % 10 <> 7
       |    AND CAST(CASE source $cases ELSE 0 END AS BIGINT) > 0
       |  GROUP BY source),
       |cur AS (SELECT CASE WHEN source = 'src13' THEN 'src_day2'
       |               ELSE source END AS source,
       |         CAST(sum(n_chars) AS BIGINT) AS cur_tokens
       |        FROM documents GROUP BY 1),
       |rep AS (SELECT coalesce(cur.source, pln.source) AS source,
       |          pln.source IS NULL AS is_new,
       |          cur.source IS NOT NULL AS in_pool,
       |          CAST(coalesce(pln.n_tokens, 0) AS BIGINT) AS plan_tokens,
       |          CAST(coalesce(cur.cur_tokens, 0) AS BIGINT) AS cur_tokens
       |        FROM cur FULL OUTER JOIN pln ON pln.source = cur.source)
       |SELECT source, is_new, in_pool, plan_tokens, cur_tokens,
       |  CAST(CASE WHEN is_new OR NOT in_pool THEN -1
       |       ELSE greatest(cur_tokens - plan_tokens, 0) * 10000
       |            // greatest(plan_tokens, 1) END AS BIGINT) AS growth_bp
       |FROM rep ORDER BY source""".stripMargin
  }

  private val mixturePlanOracleCtes: String = {
    val cases = graft.operators.Sharding.mixturePlanWeights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"WHEN '$s' THEN $w" }.mkString(" ")
    s"""WITH per AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(n_chars) AS BIGINT) AS n_tokens,
       |         CAST(CASE source $cases ELSE 0 END AS BIGINT) AS weight
       |  FROM documents GROUP BY source),
       |b AS (SELECT CAST(sum(n_chars) * 9 // 5 AS BIGINT) AS bt FROM documents),
       |st AS (SELECT per.*, (n_tokens * 200) // 100 AS capacity
       |       FROM per WHERE weight > 0),
       |o AS (SELECT *, CAST(capacity AS DOUBLE) / weight AS r FROM st),
       |w1 AS (SELECT *,
       |        coalesce(sum(capacity) OVER pw, 0) AS csum_prev,
       |        coalesce(sum(weight) OVER pw, 0) AS wsum_prev,
       |        sum(weight) OVER () AS wtot
       |       FROM o WINDOW pw AS (ORDER BY r, source
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |w2 AS (SELECT *, CASE WHEN capacity * (wtot - wsum_prev) <=
       |                      weight * ((SELECT bt FROM b) - csum_prev)
       |                 THEN 1 ELSE 0 END AS f FROM w1),
       |w3 AS (SELECT *, min(f) OVER (ORDER BY r, source
       |         ROWS UNBOUNDED PRECEDING) = 1 AS capped FROM w2),
       |w4 AS (SELECT *,
       |        (SELECT bt FROM b) -
       |          coalesce(sum(CASE WHEN capped THEN capacity END) OVER (), 0) AS b_rem,
       |        coalesce(sum(CASE WHEN NOT capped THEN weight END) OVER (), 0) AS w_rem
       |       FROM w3),
       |a AS (SELECT *, CASE WHEN capped THEN capacity
       |                ELSE (weight * b_rem) // greatest(w_rem, 1) END AS alloc_tokens
       |      FROM w4)""".stripMargin
  }

  /** The q174 MASTER-pipeline oracle — the ENTIRE raw-chunks →
    * packed-training-id-shards chain replayed from raw rows in one
    * query, every stage the verbatim CTE shape of the oracle that
    * certifies it alone: the q127 serialize/parse/gate/election front,
    * q102's line rules, the q20 clean-text election, q145's all-pairs
    * exact Jaccard, the q154/q156 winnow span geometry + keep-all
    * excision stitch, q116's word-window/dupfrac gate, the q170
    * md5-split + 13-gram firewall, the q144 recursive BPE fold + id
    * space, the q158 water-filling plan (budget from the SURVIVING
    * train pool's real id counts), the q159 expansion, the q165
    * integer-key interleave, and the q144 packed id streams — so a
    * drifted value at ANY stage interface flips the final hash. */
  /** The day-1 master-front CTE block (dn..feg) — serialization,
    * parse, envelope/blocklist gates, URL election, line rules, exact
    * election, all-pairs near dedup, winnow selection/spans/excision,
    * quality gate, md5 split and the heldout eval-gram set — shared
    * VERBATIM by the q174 and q178 oracles (the imiCellCtes
    * convention: one maintained chain, never two drifting copies).
    * `docWhere` filters the serialized corpus (q178 holds the block-4
    * chunks out of day 1); `splitSeed` parameterizes the firewall
    * split. Callers prepend WITH RECURSIVE, append their own chains
    * and apply their own MATERIALIZED marks. */
  private def masterFrontCtes(docWhere: String, splitSeed: Long): String = {
    val blRows = graft.operators.Urls.docBlocklist.map(p => s"'$p'").mkString(", ")
    s"""
       |dn AS (
       |  SELECT d.doc_id, d.source, d.text,
       |    d2.text AS t2, d4.text AS t4, d6.text AS t6
       |  FROM documents d
       |  LEFT JOIN documents d2 ON d2.doc_id = d.doc_id - 2
       |  LEFT JOIN documents d4 ON d4.doc_id = d.doc_id - 4
       |  LEFT JOIN documents d6 ON d6.doc_id = d.doc_id - 6$docWhere),
       |bd AS (
       |  SELECT doc_id, source,
       |    CASE
       |      WHEN doc_id % 10 = 9 AND t4 IS NOT NULL THEN t4 || '.'
       |      WHEN doc_id % 10 = 3 AND t2 IS NOT NULL
       |        THEN t2 || '.' || chr(10) || text || '.'
       |      WHEN doc_id % 10 = 7 AND t6 IS NOT NULL
       |        THEN array_to_string(string_split_regex(trim(t6), '\\s+')[1:14], ' ')
       |             || '.' || chr(10) || text || '.'
       |      WHEN doc_id % 10 = 4 AND t2 IS NOT NULL
       |        THEN array_to_string(string_split_regex(trim(t2), '\\s+')[1:14], ' ')
       |             || '.' || chr(10) || text || '.'
       |      ELSE text || '.'
       |    END AS body
       |  FROM dn),
       |pg AS (
       |  SELECT doc_id, source,
       |    body || chr(10) ||
       |    'Please enable JavaScript and cookies to continue viewing.' || chr(10) ||
       |    'continue reading more about' || chr(10) ||
       |    'Copyright 2024 Example Corp id ' || CAST(doc_id AS VARCHAR) || '.' || chr(10) ||
       |    'BREAKING NEWS ALERT READ THIS NOW!' || chr(10) ||
       |    'Click here.' AS page
       |  FROM bd),
       |rec AS (
       |  SELECT doc_id, doc_id // 40 AS chunk_id,
       |    'WARC/1.0' || chr(10) ||
       |    'WARC-Type: conversion' || chr(10) ||
       |    'WARC-Target-URI: https://' || source || '.example.com/articles/'
       |      || CAST(CASE WHEN doc_id % 10 = 8 THEN doc_id - 2 ELSE doc_id END AS VARCHAR) || chr(10) ||
       |    'WARC-Date: 2024-01-01T00:00:00Z' || chr(10) ||
       |    'Content-Length: ' || CAST(CASE WHEN doc_id % 7 = 0 THEN strlen(page) + 5
       |                                    ELSE strlen(page) END AS VARCHAR) || chr(10) ||
       |    chr(10) || page || chr(10) || chr(10) AS r
       |  FROM pg),
       |chunks AS (
       |  SELECT chunk_id,
       |         'warcinfo preamble' || chr(10) || string_agg(r, '' ORDER BY doc_id) AS content
       |  FROM rec GROUP BY 1),
       |f AS (SELECT chunk_id, string_split(content, 'WARC/1.0' || chr(10)) AS fs FROM chunks),
       |e2 AS (SELECT chunk_id, unnest(fs) AS frag, generate_subscripts(fs, 1) AS gi FROM f),
       |g2 AS (SELECT chunk_id, gi - 1 AS rec_idx, frag,
       |        strpos(frag, chr(10) || chr(10)) AS p
       |      FROM e2 WHERE gi >= 2 AND strpos(frag, chr(10) || chr(10)) > 0),
       |h2 AS (SELECT chunk_id, rec_idx,
       |        substr(frag, 1, p - 1) AS hdr,
       |        regexp_replace(substr(frag, p + 2), '\\n\\n$$', '') AS payload
       |      FROM g2),
       |pp AS (SELECT chunk_id * 4294967296 + rec_idx AS rec_id,
       |        regexp_extract(hdr, '(?m)^WARC-Target-URI: (.*)$$', 1) AS uri,
       |        payload,
       |        coalesce(strlen(payload) = TRY_CAST(regexp_extract(hdr, '(?m)^Content-Length: ([0-9]+)$$', 1) AS BIGINT), false) AS length_ok
       |      FROM h2),
       |hh AS (SELECT *, regexp_extract(uri, '^https://([^/]*)', 1) AS host FROM pp),
       |bl AS (SELECT unnest([$blRows]) AS b),
       |hits AS (SELECT DISTINCT hh.rec_id FROM hh
       |         JOIN bl ON hh.host = bl.b OR hh.host LIKE '%.' || bl.b),
       |cc AS (SELECT hh.*, (t.rec_id IS NOT NULL) AS blocked
       |       FROM hh LEFT JOIN hits t USING (rec_id)),
       |el AS (SELECT *,
       |        min(CASE WHEN length_ok AND uri <> '' AND NOT blocked THEN rec_id END)
       |          OVER (PARTITION BY uri) AS keep
       |       FROM cc),
       |kept AS (SELECT rec_id, host, payload FROM el
       |         WHERE length_ok AND uri <> '' AND NOT blocked AND rec_id = keep),
       |arr AS (SELECT rec_id, host, string_split(payload, chr(10)) AS ls FROM kept),
       |ln AS (SELECT rec_id, host, trim(unnest(ls)) AS l,
       |         unnest(generate_series(1, len(ls))) AS pos FROM arr),
       |lf AS (SELECT rec_id, host, l, pos,
       |         (regexp_matches(l, '[.!?"]$$')
       |          AND len(string_split_regex(l, '\\s+')) >= 3
       |          AND NOT (contains(lower(l), 'javascript')
       |                OR contains(lower(l), 'cookie')
       |                OR contains(lower(l), 'all rights reserved')
       |                OR contains(lower(l), 'copyright')
       |                OR contains(lower(l), '©'))
       |          AND length(regexp_replace(l, '[^A-Z]', '', 'g')) * 100
       |              <= length(l) * 40) AS keepl
       |       FROM ln WHERE l <> ''),
       |cl AS (SELECT rec_id, any_value(host) AS host,
       |         coalesce(string_agg(l, chr(10) ORDER BY pos) FILTER (WHERE keepl), '') AS clean_text
       |       FROM lf GROUP BY 1),
       |ne AS (SELECT * FROM cl WHERE trim(clean_text) <> ''),
       |dd AS (SELECT *, min(rec_id) OVER (PARTITION BY clean_text) AS keep2 FROM ne),
       |sv AS (SELECT rec_id, host, clean_text FROM dd WHERE rec_id = keep2),
       |jt AS (SELECT rec_id, string_split_regex(lower(trim(clean_text)), '\\s+') AS t FROM sv),
       |jg AS (SELECT DISTINCT rec_id, array_to_string(t[i:i+2], ' ') AS g
       |       FROM jt, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)),
       |jsz AS (SELECT rec_id, count(*) AS n FROM jg GROUP BY 1),
       |ji AS (SELECT a.rec_id AS id_a, b.rec_id AS id_b, count(*) AS ix
       |       FROM jg a JOIN jg b ON a.g = b.g AND a.rec_id < b.rec_id
       |       GROUP BY 1, 2),
       |jp AS (SELECT id_a, id_b FROM ji
       |       JOIN jsz sa ON sa.rec_id = id_a JOIN jsz sb ON sb.rec_id = id_b
       |       WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.8),
       |jnb AS (SELECT id_a AS rec_id, id_b AS nb FROM jp
       |        UNION ALL SELECT id_b, id_a FROM jp),
       |jrep AS (SELECT rec_id, min(nb) AS mn FROM jnb GROUP BY 1),
       |nk AS (SELECT sv.* FROM sv LEFT JOIN jrep USING (rec_id)
       |       WHERE least(sv.rec_id, coalesce(jrep.mn, sv.rec_id)) = sv.rec_id),
       |wt AS (SELECT rec_id,
       |         regexp_replace(lower(trim(clean_text)), '\\s+', ' ', 'g') AS t
       |       FROM nk),
       |wg AS (SELECT rec_id, length(t) - 11 AS ng, u.i AS pos,
       |        CAST(('0x' || substr(md5(substr(t, CAST(u.i AS INTEGER), 12)), 1, 15))
       |             AS BIGINT) AS h
       |      FROM wt, unnest(generate_series(1, length(t) - 11)) u(i)
       |      WHERE length(t) >= 15),
       |wmem AS (SELECT rec_id, pos, h, u.s AS s
       |         FROM wg, unnest(generate_series(greatest(pos - 3, 1),
       |                                         least(pos, ng - 3))) u(s)),
       |wsel AS (SELECT DISTINCT rec_id, pos, h FROM (
       |          SELECT rec_id, pos, h, row_number() OVER
       |            (PARTITION BY rec_id, s ORDER BY h ASC, pos DESC) AS rn
       |          FROM wmem) WHERE rn = 1),
       |wpts AS (SELECT a.rec_id AS doc_a, b.rec_id AS doc_b,
       |          a.pos AS pa, b.pos - a.pos AS diag
       |         FROM wsel a JOIN wsel b ON a.h = b.h AND a.rec_id < b.rec_id),
       |wbrk AS (SELECT doc_a, doc_b, diag, pa,
       |          CASE WHEN pa - lag(pa) OVER
       |                 (PARTITION BY doc_a, doc_b, diag ORDER BY pa) > 4
       |               THEN 1 ELSE 0 END AS brk
       |         FROM wpts),
       |wisl AS (SELECT doc_a, doc_b, diag, pa,
       |          sum(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa
       |                         ROWS UNBOUNDED PRECEDING) AS isl_id
       |         FROM wbrk),
       |wsp AS (SELECT doc_a, doc_b, diag,
       |         min(pa) AS a_start, max(pa) + 11 AS a_end, count(*) AS np
       |        FROM wisl GROUP BY doc_a, doc_b, diag, isl_id),
       |wiv AS (SELECT DISTINCT doc_b AS rec_id, a_start + diag AS s, a_end + diag AS e
       |        FROM wsp WHERE np >= 60),
       |wom AS (SELECT rec_id, s, e,
       |         max(e) OVER (PARTITION BY rec_id ORDER BY s, e
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
       |        FROM wiv),
       |wgrp AS (SELECT rec_id, s, e,
       |          sum(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
       |            OVER (PARTITION BY rec_id ORDER BY s, e
       |                  ROWS UNBOUNDED PRECEDING) AS gid
       |         FROM wom),
       |wm AS (SELECT rec_id, min(s) AS s, max(e) AS e FROM wgrp GROUP BY rec_id, gid),
       |wsegs AS (SELECT rec_id, s, e,
       |           lag(e, 1, CAST(0 AS BIGINT)) OVER (PARTITION BY rec_id ORDER BY s) AS pe
       |          FROM wm),
       |wpieces AS (SELECT sg.rec_id,
       |             substr(wt.t, CAST(sg.pe + 1 AS INTEGER),
       |                    CAST(sg.s - sg.pe - 1 AS INTEGER)) AS piece, sg.s AS ord
       |            FROM wsegs sg JOIN wt ON wt.rec_id = sg.rec_id),
       |wagg AS (SELECT rec_id, max(e) AS le FROM wm GROUP BY 1),
       |wst AS (SELECT p.rec_id, string_agg(p.piece, '' ORDER BY p.ord) AS head
       |        FROM wpieces p GROUP BY 1),
       |wex AS (SELECT wt.rec_id,
       |         CASE WHEN a.le IS NULL THEN wt.t
       |              ELSE coalesce(st.head, '') || substr(wt.t, CAST(a.le + 1 AS INTEGER)) END
       |           AS ct2
       |        FROM wt LEFT JOIN wagg a USING (rec_id) LEFT JOIN wst st USING (rec_id)),
       |gt AS (SELECT rec_id, ct2,
       |        CASE WHEN trim(ct2) = '' THEN CAST(0 AS BIGINT)
       |             ELSE CAST(len(string_split_regex(ct2, '\\s+')) AS BIGINT) END AS nw,
       |        CASE WHEN trim(ct2) = '' THEN 1.0
       |             ELSE round(CAST(len(string_split_regex(ct2, '\\s+'))
       |                           - len(list_distinct(string_split_regex(ct2, '\\s+'))) AS DOUBLE)
       |                        / len(string_split_regex(ct2, '\\s+')), 4) END AS dupfrac
       |       FROM wex),
       |gd AS (SELECT gt.rec_id, nk.host, gt.ct2 FROM gt JOIN nk USING (rec_id)
       |       WHERE nw >= 15 AND nw <= 120 AND dupfrac <= 0.65),
       |ft AS (SELECT rec_id, host, ct2,
       |        CASE WHEN CAST(('0x' || substr(md5(host || ':split:$splitSeed'), 1, 13)) AS BIGINT) % 100 < 80 THEN 'train'
       |             WHEN CAST(('0x' || substr(md5(host || ':split:$splitSeed'), 1, 13)) AS BIGINT) % 100 < 90 THEN 'val'
       |             ELSE 'test' END AS sp
       |       FROM gd),
       |fev AS (SELECT string_split_regex(ct2, '\\s+')[1:20] AS w FROM ft WHERE sp <> 'train'),
       |feg AS (SELECT DISTINCT array_to_string(w[i:i+12], ' ') AS g
       |        FROM fev, unnest(generate_series(1, greatest(len(w) - 12, 0))) AS u(i)),""".stripMargin
  }

  /** The byte-level BPE fold + id-space CTE block (q143/q144's shape):
    * the static merge/symbol tables plus the recursive fold reading
    * (rec_id, ct2) from `srcCte`, ending at docids (rec_id, dseq).
    * Shared by q174 (srcCte = tc, the day-1 train pool) and q178
    * (tcb, the day-2 shipped pool). */
  private def masterBpeCtes(srcCte: String): String = {
    val byteRows = Bpe.byteKernelMerges.take(4).zipWithIndex
      .map { case ((l, r), i) => s"(CAST($i AS BIGINT), '$l', '$r')" }
      .mkString(", ")
    val nRanks = Bpe.byteKernelMerges.size
    val symRows = Bpe.byteSymbols.zipWithIndex
      .map { case (s, b) => s"(CAST($b AS BIGINT), '${s.replace("'", "''")}')" }
      .mkString(", ")
    s"""
       |letters AS (
       |  SELECT chr(97 + CAST(i AS INTEGER)) AS c, CAST(i AS BIGINT) AS i
       |  FROM range(26) t(i)),
       |m AS (
       |  SELECT * FROM (VALUES $byteRows) AS v(rank, l, r)
       |  UNION ALL
       |  SELECT 4 + x.i * 26 + y.i AS rank, x.c AS l, y.c AS r
       |  FROM letters x, letters y),
       |mo AS (SELECT rank, l || r AS pout FROM m),
       |bytesyms AS (SELECT * FROM (VALUES $symRows) AS v(idx, sym)),
       |bwd AS (SELECT rec_id, string_split_regex(trim(ct2), '\\s+') AS ws FROM $srcCte),
       |bw AS (SELECT bwd.rec_id, u.i AS pos, bwd.ws[u.i] AS b
       |       FROM bwd, unnest(generate_series(1, len(bwd.ws))) u(i)
       |       WHERE bwd.ws[u.i] <> ''),
       |bwords AS (SELECT DISTINCT b FROM bw),
       |it AS (
       |  SELECT b, '  ' || regexp_replace(b, '(.)', '\\1  ', 'g') || '</w>  ' AS s,
       |         CAST(0 AS BIGINT) AS r
       |  FROM bwords
       |  UNION ALL
       |  SELECT it.b, replace(it.s, ' ' || m.l || '  ' || m.r || ' ',
       |                       ' ' || m.l || m.r || ' '), it.r + 1
       |  FROM it JOIN m ON m.rank = it.r),
       |fin2 AS (
       |  SELECT b, string_split_regex(trim(s), '\\s+') AS ps
       |  FROM it WHERE r = $nRanks),
       |pw AS (
       |  SELECT b, u.i AS ppos, ps[u.i] AS piece
       |  FROM fin2, unnest(generate_series(1, len(ps))) u(i)),
       |pids AS (
       |  SELECT pw.b, pw.ppos, CASE
       |           WHEN pw.piece = '</w>' THEN 3
       |           WHEN length(pw.piece) = 1 THEN 4 + bs.idx
       |           ELSE 260 + mo.rank END AS id
       |  FROM pw
       |  LEFT JOIN bytesyms bs ON bs.sym = pw.piece
       |  LEFT JOIN mo ON mo.pout = pw.piece),
       |wordids AS (
       |  SELECT b, list(id ORDER BY ppos) AS wids FROM pids GROUP BY b),
       |docids AS (
       |  SELECT bw.rec_id,
       |         [CAST(0 AS BIGINT)] || flatten(list(wi.wids ORDER BY bw.pos))
       |           || [CAST(1 AS BIGINT)] AS dseq
       |  FROM bw JOIN wordids wi ON wi.b = bw.b GROUP BY bw.rec_id),""".stripMargin
  }

  /** The q174 MASTER-pipeline oracle — the ENTIRE raw-chunks →
    * packed-training-id-shards chain replayed from raw rows in one
    * query, every stage the verbatim CTE shape of the oracle that
    * certifies it alone: the q127 serialize/parse/gate/election front,
    * q102's line rules, the q20 clean-text election, q145's all-pairs
    * exact Jaccard, the q154/q156 winnow span geometry + keep-all
    * excision stitch, q116's word-window/dupfrac gate, the q170
    * md5-split + 13-gram firewall, the q144 recursive BPE fold + id
    * space, the q158 water-filling plan (budget from the SURVIVING
    * train pool's real id counts), the q159 expansion, the q165
    * integer-key interleave, and the q144 packed id streams — so a
    * drifted value at ANY stage interface flips the final hash. */
  private val masterPipelineOracleSql: String = {
    val wCases = graft.operators.Pipeline.masterWeights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"WHEN '$s' THEN $w" }.mkString(" ")
    // every fan-out CTE is MATERIALIZED: DuckDB inlines plain CTEs by
    // reference, and with ~10 fan-out layers the serialization subtree
    // would duplicate exponentially (measured: >20k parquet opens —
    // fd exhaustion — before this)
    val mats = Seq("chunks", "cl", "sv", "jg", "jp", "nk", "wt", "wsel",
      "wm", "gd", "ft", "tc", "m", "bw", "docids", "toks2", "ms")
    val raw = "WITH RECURSIVE" + masterFrontCtes("", 40L) +
      masterDay1TrainCtes + masterBpeCtes("tc") +
      masterMixPackCtes("tc", wCases)
    mats.foldLeft(raw)((s, n) => s.replace(s"\n$n AS (", s"\n$n AS MATERIALIZED ("))
  }

  /** Day-1 firewall tail: the train side's 13-gram probe against the
    * heldout gram set and the surviving (uncontaminated) train pool
    * `tc` — shared verbatim by q174 and q179. */
  private def masterDay1TrainCtes: String =
    s"""
       |ftw AS (SELECT rec_id, string_split_regex(ct2, '\\s+') AS w FROM ft WHERE sp = 'train'),
       |ftg AS (SELECT DISTINCT rec_id, array_to_string(w[i:i+12], ' ') AS g
       |        FROM ftw, unnest(generate_series(1, greatest(len(w) - 12, 0))) AS u(i)
       |        WHERE len(w) >= 13),
       |fhits AS (SELECT DISTINCT ftg.rec_id FROM ftg JOIN feg USING (g)),
       |tc AS (SELECT ft.rec_id, ft.host, ft.ct2 FROM ft LEFT JOIN fhits USING (rec_id)
       |       WHERE ft.sp = 'train' AND fhits.rec_id IS NULL),""".stripMargin

  /** The mixture/pack tail (q158 water-fill → q159 expansion → q165
    * interleave → q144 pack) over the encoded pool `docids` joined
    * back to `srcCte` for its source host — shared by q174 (srcCte =
    * tc, the day-1 pool) and q179 (tcall, day-1 ∪ accepted batch). */
  private def masterMixPackCtes(srcCte: String, wCases: String): String =
      s"""
       |toks2 AS (SELECT d.rec_id, $srcCte.host,
       |           CAST(len(d.dseq) AS BIGINT) AS nt
       |          FROM docids d JOIN $srcCte USING (rec_id)),
       |per AS (
       |  SELECT host AS source, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(nt) AS BIGINT) AS n_tokens,
       |         CAST(CASE host $wCases ELSE 0 END AS BIGINT) AS weight
       |  FROM toks2 GROUP BY host),
       |bgt AS (SELECT CAST(sum(nt) * 3 // 2 AS BIGINT) AS bt FROM toks2),
       |st AS (SELECT per.*, (n_tokens * 200) // 100 AS capacity
       |       FROM per WHERE weight > 0),
       |o AS (SELECT *, CAST(capacity AS DOUBLE) / weight AS r FROM st),
       |w1 AS (SELECT *,
       |        coalesce(sum(capacity) OVER pw, 0) AS csum_prev,
       |        coalesce(sum(weight) OVER pw, 0) AS wsum_prev,
       |        sum(weight) OVER () AS wtot
       |       FROM o WINDOW pw AS (ORDER BY r, source
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |w2 AS (SELECT *, CASE WHEN capacity * (wtot - wsum_prev) <=
       |                      weight * ((SELECT bt FROM bgt) - csum_prev)
       |                 THEN 1 ELSE 0 END AS fl FROM w1),
       |w3 AS (SELECT *, min(fl) OVER (ORDER BY r, source
       |         ROWS UNBOUNDED PRECEDING) = 1 AS capped FROM w2),
       |w4 AS (SELECT *,
       |        (SELECT bt FROM bgt) -
       |          coalesce(sum(CASE WHEN capped THEN capacity END) OVER (), 0) AS b_rem,
       |        coalesce(sum(CASE WHEN NOT capped THEN weight END) OVER (), 0) AS w_rem
       |       FROM w3),
       |al AS (SELECT *, CASE WHEN capped THEN capacity
       |                 ELSE (weight * b_rem) // greatest(w_rem, 1) END AS alloc_tokens
       |       FROM w4),
       |pl AS (SELECT source,
       |         CAST((alloc_tokens * 10000) // n_tokens AS BIGINT) AS ebp
       |       FROM al),
       |ddx AS (SELECT t.rec_id, t.host AS source, pl.ebp,
       |         CAST(('0x' || substr(md5(CAST(t.rec_id AS VARCHAR) || ':19'), 1, 13))
       |              AS BIGINT) / 4503599627370496.0 AS u
       |        FROM toks2 t JOIN pl ON pl.source = t.host),
       |nx AS (SELECT rec_id, source,
       |        ebp // 10000
       |        + CASE WHEN u < (ebp % 10000) / 10000.0 THEN 1 ELSE 0 END AS n
       |       FROM ddx),
       |ms AS (SELECT rec_id, source, CAST(i AS BIGINT) AS epoch
       |       FROM nx CROSS JOIN generate_series(0, 7) AS g(i) WHERE i < n),
       |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src
       |        FROM ms GROUP BY source),
       |rk AS (SELECT ms.rec_id, ms.source, ms.epoch,
       |         CAST(('0x' || substr(md5(CAST(ms.rec_id AS VARCHAR) || '#'
       |              || CAST(ms.epoch AS VARCHAR) || ':23'), 1, 13))
       |              AS BIGINT) / 4503599627370496.0 AS u2
       |       FROM ms),
       |r2 AS (SELECT rec_id, source, epoch,
       |         CAST(row_number() OVER (PARTITION BY source
       |           ORDER BY u2 ASC, rec_id ASC, epoch ASC) AS BIGINT) AS src_rank
       |       FROM rk),
       |ky AS (SELECT r2.rec_id, r2.source, r2.epoch,
       |         ((2 * r2.src_rank - 1) * 4294967296) // (2 * cnt.n_src) AS pos_key
       |       FROM r2 JOIN cnt USING (source)),
       |ordx AS (SELECT CAST(row_number() OVER (
       |           ORDER BY pos_key, source, rec_id, epoch) - 1 AS BIGINT) AS global_pos,
       |          rec_id
       |         FROM ky),
       |pk AS (SELECT o2.global_pos, o2.rec_id,
       |         CAST(o2.global_pos % 8 AS INTEGER) AS shard,
       |         d.dseq, CAST(len(d.dseq) AS BIGINT) AS nt
       |       FROM ordx o2 JOIN docids d USING (rec_id)),
       |cm AS (SELECT *,
       |         CAST(sum(nt) OVER (PARTITION BY shard ORDER BY global_pos
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |       FROM pk),
       |ch AS (SELECT *, CAST(floor(CAST(cum - nt AS DOUBLE) / 2048) AS BIGINT) AS chunk FROM cm)
       |SELECT shard, chunk, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(nt) AS BIGINT) AS total_tokens,
       |       array_to_string(flatten(list(dseq ORDER BY global_pos)), ',') AS ids
       |FROM ch GROUP BY 1, 2 ORDER BY shard, chunk""".stripMargin

  /** The q178 DAY-2 MASTER-ingest oracle — the ENTIRE two-day chain
    * from raw rows in one query: the shared day-1 front (block-4
    * chunks held out, seed 4) derives every FROZEN artifact exactly as
    * [[graft.operators.Pipeline.masterArtifacts]] freezes it — the
    * eligible-record URL keepers (uix), the exact clean-text
    * fingerprints (sv), the near-kept Jaccard pool (nk via jg/jsz),
    * the winnow print index WITH positions (wsel), and the heldout
    * eval grams (feg) — then the batch's own serialization
    * ([[graft.sources.Warc.plantedMasterBatchChunks]]'s plant
    * families), parse, gates, its internal elections, every
    * batch-vs-frozen-index probe, the corpus-witnessed ∪ within-batch
    * span union + keep-all excision stitch, the gate, the SAME-seed
    * split, the firewall against frozen ∪ batch-extended grams, and
    * the BPE id streams. Every batch record's terminal fate, keeper,
    * span counters and id stream hash-check — a drift at ANY
    * day-1→day-2 interface flips a row. */
  private val masterIngestOracleSql: String = {
    val seed = graft.operators.Pipeline.MasterIngestSeed
    val mats = Seq("chunks", "cl", "sv", "jg", "jp", "nk", "wt", "wsel",
      "wm", "gd", "ft", "feg",
      "chunksb", "clb", "neb", "exs", "s3", "s4a", "s4", "jgb",
      "wtb", "wselb", "wmb", "gq", "ftb", "tcb", "m", "bw", "docids", "bb")
    val raw = "WITH RECURSIVE" +
      masterFrontCtes(" WHERE (d.doc_id // 40) % 5 <> 4", seed) +
      masterBatchCtes(seed) + masterBpeCtes("tcb") +
      s"""
       |encb AS (SELECT d.rec_id, CAST(len(d.dseq) AS BIGINT) AS n_tokens,
       |          array_to_string(d.dseq, ',') AS ids
       |         FROM docids d)
       |SELECT bb.rec_id, bb.host,
       |  CASE
       |    WHEN NOT (bb.length_ok AND bb.uri <> '') THEN 'bad_envelope'
       |    WHEN bb.blocked THEN 'blocked'
       |    WHEN bb.url_corp IS NOT NULL THEN 'url_dup_corpus'
       |    WHEN bb.rec_id <> bb.bk THEN 'url_dup_batch'
       |    WHEN clb.rec_id IS NULL OR trim(clb.clean_text) = '' THEN 'empty'
       |    WHEN exc.ex_corp IS NOT NULL THEN 'exact_dup_corpus'
       |    WHEN exs.rec_id IS NOT NULL AND exs.rec_id <> exs.ek THEN 'exact_dup_batch'
       |    WHEN ndc.nd_corp IS NOT NULL THEN 'near_dup_corpus'
       |    WHEN ndb.nd_batch IS NOT NULL THEN 'near_dup_batch'
       |    WHEN gq.rec_id IS NOT NULL AND NOT gq.gate_ok THEN 'gate_failed'
       |    WHEN ftb.sp IS NOT NULL AND ftb.sp <> 'train' THEN 'eval_heldout'
       |    WHEN fhitsb.rec_id IS NOT NULL THEN 'contaminated'
       |    ELSE 'shipped'
       |  END AS fate,
       |  CAST(coalesce(bb.url_corp,
       |    CASE WHEN bb.length_ok AND bb.uri <> '' AND NOT bb.blocked
       |              AND bb.rec_id <> bb.bk THEN bb.bk END,
       |    exc.ex_corp,
       |    CASE WHEN exs.rec_id <> exs.ek THEN exs.ek END,
       |    ndc.nd_corp, ndb.nd_batch, -1) AS BIGINT) AS dup_of,
       |  CAST(coalesce(wcnt.n_spans, 0) AS BIGINT) AS n_spans,
       |  CAST(coalesce(wcnt.removed_chars, 0) AS BIGINT) AS removed_chars,
       |  CAST(coalesce(encb.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  coalesce(encb.ids, '') AS ids
       |FROM bb
       |LEFT JOIN clb ON clb.rec_id = bb.rec_id
       |LEFT JOIN exc ON exc.rec_id = bb.rec_id
       |LEFT JOIN exs ON exs.rec_id = bb.rec_id
       |LEFT JOIN ndc ON ndc.rec_id = bb.rec_id
       |LEFT JOIN ndb ON ndb.rec_id = bb.rec_id
       |LEFT JOIN gq ON gq.rec_id = bb.rec_id
       |LEFT JOIN wcnt ON wcnt.rec_id = bb.rec_id
       |LEFT JOIN ftb ON ftb.rec_id = bb.rec_id
       |LEFT JOIN fhitsb ON fhitsb.rec_id = bb.rec_id
       |LEFT JOIN encb ON encb.rec_id = bb.rec_id
       |ORDER BY bb.rec_id""".stripMargin
    mats.foldLeft(raw)((s, n) => s.replace(s"\n$n AS (", s"\n$n AS MATERIALIZED ("))
  }

  /** The day-2 BATCH chain (q178's plant families → serialization →
    * parse → envelope/blocklist gates → batch + frozen-index URL and
    * exact elections → frozen-vocab prefix probe + within-batch
    * Jaccard → corpus-witnessed ∪ within-batch span union + keep-all
    * excision → gate → same-seed split → firewall against frozen ∪
    * batch-extended grams), ending at the shipped pool `tcb` —
    * shared verbatim by q178 and q179. */
  private def masterBatchCtes(seed: Long): String =
    s"""
       |dnb AS (
       |  SELECT d.doc_id, d.source, d.text,
       |    m40.text AS t40, m38.text AS t38, dh.text AS tdh, bh.text AS tbh,
       |    m2.text AS tb2, m3.text AS tb3, m4.text AS tb4
       |  FROM documents d
       |  LEFT JOIN documents m40 ON m40.doc_id = d.doc_id - 40
       |  LEFT JOIN documents m38 ON m38.doc_id = d.doc_id - 38
       |  LEFT JOIN documents dh ON dh.doc_id = d.doc_id - (d.doc_id % 20) - 35
       |  LEFT JOIN documents bh ON bh.doc_id = d.doc_id - (d.doc_id % 20) + 5
       |  LEFT JOIN documents m2 ON m2.doc_id = d.doc_id - 2
       |  LEFT JOIN documents m3 ON m3.doc_id = d.doc_id - 3
       |  LEFT JOIN documents m4 ON m4.doc_id = d.doc_id - 4
       |  WHERE (d.doc_id // 40) % 5 = 4),
       |bdb AS (
       |  SELECT doc_id, source,
       |    CASE
       |      WHEN doc_id % 10 = 1 AND t40 IS NOT NULL THEN t40 || '.'
       |      WHEN doc_id % 10 = 2 AND t40 IS NOT NULL
       |        THEN t40 || '. Indeed truly remarkable.'
       |      WHEN doc_id % 10 = 3 AND t38 IS NOT NULL
       |        THEN t38 || '.' || chr(10) || text || '.'
       |      WHEN doc_id % 10 = 4 AND tdh IS NOT NULL
       |        THEN array_to_string(string_split_regex(trim(tdh), '\\s+')[1:14], ' ')
       |             || '.' || chr(10) || text || '.'
       |      WHEN doc_id % 10 = 6 AND tbh IS NOT NULL
       |        THEN array_to_string(string_split_regex(trim(tbh), '\\s+')[1:14], ' ')
       |             || '.' || chr(10) || text || '.'
       |      WHEN doc_id % 10 = 7 AND tb2 IS NOT NULL
       |        THEN tb2 || '. Extra closing remark.'
       |      WHEN doc_id % 10 = 8 AND tb3 IS NOT NULL
       |        THEN tb3 || '.' || chr(10) || text || '.'
       |      WHEN doc_id % 10 = 9 AND tb4 IS NOT NULL THEN tb4 || '.'
       |      ELSE text || '.'
       |    END AS body
       |  FROM dnb),
       |pgb AS (
       |  SELECT doc_id, source,
       |    body || chr(10) ||
       |    'Please enable JavaScript and cookies to continue viewing.' || chr(10) ||
       |    'continue reading more about' || chr(10) ||
       |    'Copyright 2024 Example Corp id ' || CAST(doc_id AS VARCHAR) || '.' || chr(10) ||
       |    'BREAKING NEWS ALERT READ THIS NOW!' || chr(10) ||
       |    'Click here.' AS page
       |  FROM bdb),
       |recb AS (
       |  SELECT doc_id, doc_id // 40 AS chunk_id,
       |    'WARC/1.0' || chr(10) ||
       |    'WARC-Type: conversion' || chr(10) ||
       |    'WARC-Target-URI: https://' || source || '.example.com/articles/'
       |      || CAST(CASE WHEN doc_id % 20 = 0 THEN doc_id - 40
       |                    WHEN doc_id % 40 = 10 THEN doc_id + 20
       |                    ELSE doc_id END AS VARCHAR) || chr(10) ||
       |    'WARC-Date: 2024-01-01T00:00:00Z' || chr(10) ||
       |    'Content-Length: ' || CAST(CASE WHEN doc_id % 7 = 0 THEN strlen(page) + 5
       |                                    ELSE strlen(page) END AS VARCHAR) || chr(10) ||
       |    chr(10) || page || chr(10) || chr(10) AS r
       |  FROM pgb),
       |chunksb AS (
       |  SELECT chunk_id,
       |         'warcinfo preamble' || chr(10) || string_agg(r, '' ORDER BY doc_id) AS content
       |  FROM recb GROUP BY 1),
       |fb AS (SELECT chunk_id, string_split(content, 'WARC/1.0' || chr(10)) AS fs FROM chunksb),
       |e2b AS (SELECT chunk_id, unnest(fs) AS frag, generate_subscripts(fs, 1) AS gi FROM fb),
       |g2b AS (SELECT chunk_id, gi - 1 AS rec_idx, frag,
       |         strpos(frag, chr(10) || chr(10)) AS p
       |       FROM e2b WHERE gi >= 2 AND strpos(frag, chr(10) || chr(10)) > 0),
       |h2b AS (SELECT chunk_id, rec_idx,
       |         substr(frag, 1, p - 1) AS hdr,
       |         regexp_replace(substr(frag, p + 2), '\\n\\n$$', '') AS payload
       |       FROM g2b),
       |ppb AS (SELECT chunk_id * 4294967296 + rec_idx AS rec_id,
       |         regexp_extract(hdr, '(?m)^WARC-Target-URI: (.*)$$', 1) AS uri,
       |         payload,
       |         coalesce(strlen(payload) = TRY_CAST(regexp_extract(hdr, '(?m)^Content-Length: ([0-9]+)$$', 1) AS BIGINT), false) AS length_ok
       |       FROM h2b),
       |hhb AS (SELECT *, regexp_extract(uri, '^https://([^/]*)', 1) AS host FROM ppb),
       |hitsb AS (SELECT DISTINCT hhb.rec_id FROM hhb
       |          JOIN bl ON hhb.host = bl.b OR hhb.host LIKE '%.' || bl.b),
       |ccb AS (SELECT hhb.*, (t.rec_id IS NOT NULL) AS blocked
       |        FROM hhb LEFT JOIN hitsb t USING (rec_id)),
       |uix AS (SELECT uri, min(rec_id) AS keep_id FROM cc
       |        WHERE length_ok AND uri <> '' AND NOT blocked GROUP BY 1),
       |bb AS (SELECT c.*, u.keep_id AS url_corp,
       |         min(CASE WHEN c.length_ok AND c.uri <> '' AND NOT c.blocked
       |                  THEN c.rec_id END) OVER (PARTITION BY c.uri) AS bk
       |       FROM ccb c LEFT JOIN uix u
       |         ON u.uri = c.uri AND c.length_ok AND c.uri <> '' AND NOT c.blocked),
       |sv1 AS (SELECT rec_id, host, payload FROM bb
       |        WHERE length_ok AND uri <> '' AND NOT blocked
       |          AND url_corp IS NULL AND rec_id = bk),
       |arrb AS (SELECT rec_id, host, string_split(payload, chr(10)) AS ls FROM sv1),
       |lnb AS (SELECT rec_id, host, trim(unnest(ls)) AS l,
       |          unnest(generate_series(1, len(ls))) AS pos FROM arrb),
       |lfb AS (SELECT rec_id, host, l, pos,
       |          (regexp_matches(l, '[.!?"]$$')
       |           AND len(string_split_regex(l, '\\s+')) >= 3
       |           AND NOT (contains(lower(l), 'javascript')
       |                 OR contains(lower(l), 'cookie')
       |                 OR contains(lower(l), 'all rights reserved')
       |                 OR contains(lower(l), 'copyright')
       |                 OR contains(lower(l), '©'))
       |           AND length(regexp_replace(l, '[^A-Z]', '', 'g')) * 100
       |               <= length(l) * 40) AS keepl
       |        FROM lnb WHERE l <> ''),
       |clb AS (SELECT rec_id, any_value(host) AS host,
       |          coalesce(string_agg(l, chr(10) ORDER BY pos) FILTER (WHERE keepl), '') AS clean_text
       |        FROM lfb GROUP BY 1),
       |neb AS (SELECT * FROM clb WHERE trim(clean_text) <> ''),
       |exc AS (SELECT n.rec_id, s.rec_id AS ex_corp
       |        FROM neb n JOIN sv s ON s.clean_text = n.clean_text),
       |exs AS (SELECT n.*, min(n.rec_id) OVER (PARTITION BY n.clean_text) AS ek
       |        FROM neb n LEFT JOIN exc ON exc.rec_id = n.rec_id
       |        WHERE exc.ex_corp IS NULL),
       |s3 AS (SELECT rec_id, host, clean_text FROM exs WHERE rec_id = ek),
       |jgk AS (SELECT j.rec_id, j.g FROM jg j JOIN nk ON nk.rec_id = j.rec_id),
       |jszk AS (SELECT z.rec_id, z.n FROM jsz z JOIN nk ON nk.rec_id = z.rec_id),
       |jtb AS (SELECT rec_id, string_split_regex(lower(trim(clean_text)), '\\s+') AS t FROM s3),
       |jgb AS (SELECT DISTINCT rec_id, array_to_string(t[i:i+2], ' ') AS g
       |        FROM jtb, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)),
       |jszb AS (SELECT rec_id, count(*) AS n FROM jgb GROUP BY 1),
       |jixc AS (SELECT b.rec_id AS id_b, a.rec_id AS id_a, count(*) AS ix
       |         FROM jgb b JOIN jgk a ON a.g = b.g GROUP BY 1, 2),
       |ndc AS (SELECT id_b AS rec_id, min(id_a) AS nd_corp
       |        FROM jixc
       |        JOIN jszk sa ON sa.rec_id = id_a JOIN jszb sb ON sb.rec_id = id_b
       |        WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.8 GROUP BY 1),
       |s4a AS (SELECT s3.* FROM s3 LEFT JOIN ndc ON ndc.rec_id = s3.rec_id
       |        WHERE ndc.nd_corp IS NULL),
       |jgb2 AS (SELECT j.* FROM jgb j JOIN s4a ON s4a.rec_id = j.rec_id),
       |jix2 AS (SELECT a.rec_id AS id_a, b.rec_id AS id_b, count(*) AS ix
       |         FROM jgb2 a JOIN jgb2 b ON a.g = b.g AND a.rec_id < b.rec_id
       |         GROUP BY 1, 2),
       |jp2 AS (SELECT id_a, id_b FROM jix2
       |        JOIN jszb sa ON sa.rec_id = id_a JOIN jszb sb ON sb.rec_id = id_b
       |        WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.8),
       |jnb2 AS (SELECT id_a AS rec_id, id_b AS nb FROM jp2
       |         UNION ALL SELECT id_b, id_a FROM jp2),
       |ndb AS (SELECT rec_id, min(nb) AS nd_batch FROM jnb2 GROUP BY 1
       |        HAVING min(nb) < rec_id),
       |s4 AS (SELECT s4a.* FROM s4a LEFT JOIN ndb ON ndb.rec_id = s4a.rec_id
       |       WHERE ndb.nd_batch IS NULL),
       |wtb AS (SELECT rec_id,
       |          regexp_replace(lower(trim(clean_text)), '\\s+', ' ', 'g') AS t
       |        FROM s4),
       |wgb AS (SELECT rec_id, length(t) - 11 AS ng, u.i AS pos,
       |         CAST(('0x' || substr(md5(substr(t, CAST(u.i AS INTEGER), 12)), 1, 15))
       |              AS BIGINT) AS h
       |       FROM wtb, unnest(generate_series(1, length(t) - 11)) u(i)
       |       WHERE length(t) >= 15),
       |wmemb AS (SELECT rec_id, pos, h, u.s AS s
       |          FROM wgb, unnest(generate_series(greatest(pos - 3, 1),
       |                                           least(pos, ng - 3))) u(s)),
       |wselb AS (SELECT DISTINCT rec_id, pos, h FROM (
       |           SELECT rec_id, pos, h, row_number() OVER
       |             (PARTITION BY rec_id, s ORDER BY h ASC, pos DESC) AS rn
       |           FROM wmemb) WHERE rn = 1),
       |wptsc AS (SELECT a.rec_id AS doc_a, b.rec_id AS doc_b,
       |           a.pos AS pa, b.pos - a.pos AS diag
       |          FROM wselb a JOIN wsel b ON a.h = b.h),
       |wbrkc AS (SELECT doc_a, doc_b, diag, pa,
       |           CASE WHEN pa - lag(pa) OVER
       |                  (PARTITION BY doc_a, doc_b, diag ORDER BY pa) > 4
       |                THEN 1 ELSE 0 END AS brk
       |          FROM wptsc),
       |wislc AS (SELECT doc_a, doc_b, diag, pa,
       |           sum(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa
       |                          ROWS UNBOUNDED PRECEDING) AS isl_id
       |          FROM wbrkc),
       |wspc AS (SELECT doc_a, doc_b, diag,
       |          min(pa) AS a_start, max(pa) + 11 AS a_end, count(*) AS np
       |         FROM wislc GROUP BY doc_a, doc_b, diag, isl_id),
       |wivc AS (SELECT DISTINCT doc_a AS rec_id, a_start AS s, a_end AS e
       |         FROM wspc WHERE np >= 60),
       |wptsb AS (SELECT a.rec_id AS doc_a, b.rec_id AS doc_b,
       |           a.pos AS pa, b.pos - a.pos AS diag
       |          FROM wselb a JOIN wselb b ON a.h = b.h AND a.rec_id < b.rec_id),
       |wbrkb AS (SELECT doc_a, doc_b, diag, pa,
       |           CASE WHEN pa - lag(pa) OVER
       |                  (PARTITION BY doc_a, doc_b, diag ORDER BY pa) > 4
       |                THEN 1 ELSE 0 END AS brk
       |          FROM wptsb),
       |wislb AS (SELECT doc_a, doc_b, diag, pa,
       |           sum(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa
       |                          ROWS UNBOUNDED PRECEDING) AS isl_id
       |          FROM wbrkb),
       |wspb AS (SELECT doc_a, doc_b, diag,
       |          min(pa) AS a_start, max(pa) + 11 AS a_end, count(*) AS np
       |         FROM wislb GROUP BY doc_a, doc_b, diag, isl_id),
       |wivb AS (SELECT DISTINCT doc_b AS rec_id, a_start + diag AS s, a_end + diag AS e
       |         FROM wspb WHERE np >= 60),
       |wivu AS (SELECT DISTINCT rec_id, s, e FROM
       |          (SELECT * FROM wivc UNION ALL SELECT * FROM wivb)),
       |womb AS (SELECT rec_id, s, e,
       |          max(e) OVER (PARTITION BY rec_id ORDER BY s, e
       |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
       |         FROM wivu),
       |wgrpb AS (SELECT rec_id, s, e,
       |           sum(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
       |             OVER (PARTITION BY rec_id ORDER BY s, e
       |                   ROWS UNBOUNDED PRECEDING) AS gid
       |          FROM womb),
       |wmb AS (SELECT rec_id, min(s) AS s, max(e) AS e FROM wgrpb GROUP BY rec_id, gid),
       |wcnt AS (SELECT rec_id, CAST(count(*) AS BIGINT) AS n_spans,
       |          CAST(sum(e - s + 1) AS BIGINT) AS removed_chars
       |         FROM wmb GROUP BY 1),
       |wsegsb AS (SELECT rec_id, s, e,
       |            lag(e, 1, CAST(0 AS BIGINT)) OVER (PARTITION BY rec_id ORDER BY s) AS pe
       |           FROM wmb),
       |wpiecesb AS (SELECT sg.rec_id,
       |              substr(wtb.t, CAST(sg.pe + 1 AS INTEGER),
       |                     CAST(sg.s - sg.pe - 1 AS INTEGER)) AS piece, sg.s AS ord
       |             FROM wsegsb sg JOIN wtb ON wtb.rec_id = sg.rec_id),
       |waggb AS (SELECT rec_id, max(e) AS le FROM wmb GROUP BY 1),
       |wstb AS (SELECT p.rec_id, string_agg(p.piece, '' ORDER BY p.ord) AS head
       |         FROM wpiecesb p GROUP BY 1),
       |wexb AS (SELECT wtb.rec_id,
       |          CASE WHEN a.le IS NULL THEN wtb.t
       |               ELSE coalesce(st.head, '') || substr(wtb.t, CAST(a.le + 1 AS INTEGER)) END
       |            AS ct2
       |         FROM wtb LEFT JOIN waggb a ON a.rec_id = wtb.rec_id
       |         LEFT JOIN wstb st ON st.rec_id = wtb.rec_id),
       |gtb AS (SELECT rec_id, ct2,
       |         CASE WHEN trim(ct2) = '' THEN CAST(0 AS BIGINT)
       |              ELSE CAST(len(string_split_regex(ct2, '\\s+')) AS BIGINT) END AS nw,
       |         CASE WHEN trim(ct2) = '' THEN 1.0
       |              ELSE round(CAST(len(string_split_regex(ct2, '\\s+'))
       |                            - len(list_distinct(string_split_regex(ct2, '\\s+'))) AS DOUBLE)
       |                         / len(string_split_regex(ct2, '\\s+')), 4) END AS dupfrac
       |        FROM wexb),
       |gq AS (SELECT g.rec_id, s4.host, g.ct2,
       |         (g.nw >= 15 AND g.nw <= 120 AND g.dupfrac <= 0.65) AS gate_ok
       |        FROM gtb g JOIN s4 ON s4.rec_id = g.rec_id),
       |ftb AS (SELECT rec_id, host, ct2,
       |         CASE WHEN CAST(('0x' || substr(md5(host || ':split:$seed'), 1, 13)) AS BIGINT) % 100 < 80 THEN 'train'
       |              WHEN CAST(('0x' || substr(md5(host || ':split:$seed'), 1, 13)) AS BIGINT) % 100 < 90 THEN 'val'
       |              ELSE 'test' END AS sp
       |        FROM gq WHERE gate_ok),
       |fevb AS (SELECT string_split_regex(ct2, '\\s+')[1:20] AS w FROM ftb WHERE sp <> 'train'),
       |fegb AS (SELECT DISTINCT array_to_string(w[i:i+12], ' ') AS g
       |         FROM fevb, unnest(generate_series(1, greatest(len(w) - 12, 0))) AS u(i)),
       |fega AS (SELECT g FROM feg UNION SELECT g FROM fegb),
       |ftwb AS (SELECT rec_id, string_split_regex(ct2, '\\s+') AS w FROM ftb WHERE sp = 'train'),
       |ftgb AS (SELECT DISTINCT rec_id, array_to_string(w[i:i+12], ' ') AS g
       |         FROM ftwb, unnest(generate_series(1, greatest(len(w) - 12, 0))) AS u(i)
       |         WHERE len(w) >= 13),
       |fhitsb AS (SELECT DISTINCT ftgb.rec_id FROM ftgb JOIN fega USING (g)),
       |tcb AS (SELECT ftb.rec_id, ftb.host, ftb.ct2 FROM ftb
       |        LEFT JOIN fhitsb ON fhitsb.rec_id = ftb.rec_id
       |        WHERE ftb.sp = 'train' AND fhitsb.rec_id IS NULL),""".stripMargin

  /** The q179 DAY-2 MIXTURE-REFRESH oracle — the two-day chain of
    * q178 CONTINUED through the re-plan: the day-1 front (block-4
    * held out, seed 4) and its firewall-surviving train pool `tc`,
    * the entire batch fate ladder down to the shipped pool `tcb`,
    * ONE BPE id space over the UNION (`tcall` — rec_id spaces are
    * chunk-keyed and disjoint), and the q174 mixture/pack tail
    * (water-fill on the grown per-source pools, expansion coins and
    * order keys unchanged per doc, fresh interleave, DDP-striped
    * pack). A drift anywhere — a batch fate, a day-1 gram, a
    * re-levelled allocation — flips the packed id streams. */
  private val masterRefreshOracleSql: String = {
    val seed = graft.operators.Pipeline.MasterIngestSeed
    val wCases = graft.operators.Pipeline.masterWeights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"WHEN '$s' THEN $w" }.mkString(" ")
    val mats = Seq("chunks", "cl", "sv", "jg", "jp", "nk", "wt", "wsel",
      "wm", "gd", "ft", "feg", "tc",
      "chunksb", "clb", "neb", "exs", "s3", "s4a", "s4", "jgb",
      "wtb", "wselb", "wmb", "gq", "ftb", "tcb", "bb",
      "tcall", "m", "bw", "docids", "toks2", "ms")
    val raw = "WITH RECURSIVE" +
      masterFrontCtes(" WHERE (d.doc_id // 40) % 5 <> 4", seed) +
      masterDay1TrainCtes +
      masterBatchCtes(seed) +
      s"""
       |tcall AS (SELECT rec_id, host, ct2 FROM tc
       |          UNION ALL SELECT rec_id, host, ct2 FROM tcb),""".stripMargin +
      masterBpeCtes("tcall") +
      masterMixPackCtes("tcall", wCases)
    mats.foldLeft(raw)((s, n) => s.replace(s"\n$n AS (", s"\n$n AS MATERIALIZED ("))
  }

  /** The TRAINED IMI+ADC chain's shared CTE prefix (round 16 — the
    * oracle boundary moved onto the production path): the q141 chain
    * with the formula sub-quantizers and codebook replaced by the
    * PERSISTED TRAINED ARTIFACTS the registered q140 writes under
    * `Similarity.TrainedArtifactRoot`, key-guarded by the portable
    * corpus key (Σ⌊1000·embedding[0]⌋ + count) so an artifact from a
    * different SF or a stale run can never be silently adopted.
    * Assignment, residuals, corpus ENCODE, per-half probes and the
    * per-probe ADC all re-derive from the parquet bytes — only the
    * KMeans fits stay outside the boundary. Shared by q140 and q175. */
  private val trainedImiPqCtes: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |ck AS (SELECT CAST(sum(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT))
      |         + count(*) AS BIGINT) AS k FROM embeddings),
      |h AS (SELECT vec_id, v[1:32] AS v1, v[33:64] AS v2, v FROM e),
      |c1 AS (SELECT CAST(cell AS INT) AS cell, CAST(cvec AS DOUBLE[]) AS cvec,
      |         CAST(c2 AS DOUBLE) AS cc
      |       FROM read_parquet('/tmp/graft_trained/imipq/cent1/*/*.parquet',
      |                         hive_partitioning = true)
      |       WHERE CAST(k AS BIGINT) = (SELECT k FROM ck)),
      |c2t AS (SELECT CAST(cell AS INT) AS cell, CAST(cvec AS DOUBLE[]) AS cvec,
      |          CAST(c2 AS DOUBLE) AS cc
      |        FROM read_parquet('/tmp/graft_trained/imipq/cent2/*/*.parquet',
      |                          hive_partitioning = true)
      |        WHERE CAST(k AS BIGINT) = (SELECT k FROM ck)),
      |a1 AS (SELECT vec_id, cell AS cc1 FROM (
      |        SELECT h.vec_id, c1.cell,
      |          row_number() OVER (PARTITION BY h.vec_id
      |            ORDER BY c1.cc - 2.0 * list_dot_product(h.v1, c1.cvec) ASC,
      |                     c1.cell ASC) AS rn
      |        FROM h CROSS JOIN c1) WHERE rn = 1),
      |a2 AS (SELECT vec_id, cell AS cc2 FROM (
      |        SELECT h.vec_id, c2t.cell,
      |          row_number() OVER (PARTITION BY h.vec_id
      |            ORDER BY c2t.cc - 2.0 * list_dot_product(h.v2, c2t.cvec) ASC,
      |                     c2t.cell ASC) AS rn
      |        FROM h CROSS JOIN c2t) WHERE rn = 1),
      |asg AS (SELECT a1.vec_id, a1.cc1, a2.cc2, a1.cc1 * 4 + a2.cc2 AS cell
      |        FROM a1 JOIN a2 USING (vec_id)),
      |res AS (SELECT a.vec_id, a.cell,
      |          list_transform(range(1, 33), i -> h.v1[i] - p1.cvec[i]) ||
      |          list_transform(range(1, 33), i -> h.v2[i] - p2.cvec[i]) AS r
      |        FROM asg a JOIN h ON h.vec_id = a.vec_id
      |          JOIN c1 p1 ON p1.cell = a.cc1
      |          JOIN c2t p2 ON p2.cell = a.cc2),
      |cb AS (SELECT CAST(subspace AS INT) AS subspace, CAST(code AS INT) AS code,
      |         CAST(centroid AS DOUBLE[]) AS centroid
      |       FROM read_parquet('/tmp/graft_trained/imipq/codebook/*/*.parquet',
      |                         hive_partitioning = true)
      |       WHERE CAST(k AS BIGINT) = (SELECT k FROM ck)),
      |d AS (SELECT r.vec_id, r.cell, cb.subspace, cb.code,
      |        list_sum(list_transform(range(1, 9), i ->
      |          (r.r[cb.subspace*8 + i] - cb.centroid[i])
      |          * (r.r[cb.subspace*8 + i] - cb.centroid[i]))) AS dist
      |      FROM res r CROSS JOIN cb),
      |codes AS (SELECT vec_id, cell, subspace, code FROM (
      |           SELECT vec_id, cell, subspace, code,
      |             row_number() OVER (PARTITION BY vec_id, subspace
      |               ORDER BY dist ASC, code ASC) AS rn
      |           FROM d) WHERE rn = 1),
      |p1 AS (SELECT q_id, cell AS cc1 FROM (
      |        SELECT h.vec_id AS q_id, c1.cell,
      |          row_number() OVER (PARTITION BY h.vec_id
      |            ORDER BY c1.cc - 2.0 * list_dot_product(h.v1, c1.cvec) ASC,
      |                     c1.cell ASC) AS rn
      |        FROM h CROSS JOIN c1 WHERE h.vec_id < 5) WHERE rn <= 2),
      |p2 AS (SELECT q_id, cell AS cc2 FROM (
      |        SELECT h.vec_id AS q_id, c2t.cell,
      |          row_number() OVER (PARTITION BY h.vec_id
      |            ORDER BY c2t.cc - 2.0 * list_dot_product(h.v2, c2t.cvec) ASC,
      |                     c2t.cell ASC) AS rn
      |        FROM h CROSS JOIN c2t WHERE h.vec_id < 5) WHERE rn <= 2),
      |qres AS (SELECT p1.q_id, p1.cc1 * 4 + p2.cc2 AS cell,
      |           list_transform(range(1, 33), i -> h.v1[i] - pc1.cvec[i]) ||
      |           list_transform(range(1, 33), i -> h.v2[i] - pc2.cvec[i]) AS qr
      |         FROM p1 JOIN p2 USING (q_id)
      |           JOIN h ON h.vec_id = p1.q_id
      |           JOIN c1 pc1 ON pc1.cell = p1.cc1
      |           JOIN c2t pc2 ON pc2.cell = p2.cc2),
      |qd AS (SELECT q.q_id, q.cell, cb.subspace, cb.code,
      |         list_sum(list_transform(range(1, 9), i ->
      |           (q.qr[cb.subspace*8 + i] - cb.centroid[i])
      |           * (q.qr[cb.subspace*8 + i] - cb.centroid[i]))) AS dist
      |       FROM qres q CROSS JOIN cb),
      |adist AS (SELECT qd.q_id, co.vec_id AS c_id,
      |            list_sum(list(qd.dist ORDER BY qd.subspace)) AS ad
      |          FROM codes co JOIN qd ON qd.cell = co.cell
      |            AND qd.subspace = co.subspace AND qd.code = co.code
      |          WHERE co.vec_id <> qd.q_id
      |          GROUP BY 1, 2)""".stripMargin

  /** The q141 IMI chain's shared CTE prefix — formula per-half
    * sub-quantizers (first 4 vectors' halves), per-half argmin
    * assignment and the product-cell arithmetic. Shared verbatim by
    * q141 (composed search), q163 (IMI recall meter) and q164 (IMI+ADC
    * recall meter), the mixturePlanOracleCtes convention. */
  private val imiCellCtes: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |h AS (SELECT vec_id, v[1:32] AS v1, v[33:64] AS v2, v FROM e),
      |c1 AS (SELECT CAST(vec_id AS INT) AS cell, v1 AS cvec,
      |         list_dot_product(v1, v1) AS cc FROM h WHERE vec_id < 4),
      |c2t AS (SELECT CAST(vec_id AS INT) AS cell, v2 AS cvec,
      |          list_dot_product(v2, v2) AS cc FROM h WHERE vec_id < 4),
      |a1 AS (SELECT vec_id, cell AS cc1 FROM (
      |        SELECT h.vec_id, c1.cell,
      |          row_number() OVER (PARTITION BY h.vec_id
      |            ORDER BY c1.cc - 2.0 * list_dot_product(h.v1, c1.cvec) ASC,
      |                     c1.cell ASC) AS rn
      |        FROM h CROSS JOIN c1) WHERE rn = 1),
      |a2 AS (SELECT vec_id, cell AS cc2 FROM (
      |        SELECT h.vec_id, c2t.cell,
      |          row_number() OVER (PARTITION BY h.vec_id
      |            ORDER BY c2t.cc - 2.0 * list_dot_product(h.v2, c2t.cvec) ASC,
      |                     c2t.cell ASC) AS rn
      |        FROM h CROSS JOIN c2t) WHERE rn = 1),
      |asg AS (SELECT a1.vec_id, a1.cc1, a2.cc2, a1.cc1 * 4 + a2.cc2 AS cell
      |        FROM a1 JOIN a2 USING (vec_id))""".stripMargin

  /** q141's residual-PQ continuation: residuals against the assigned
    * PRODUCT-cell centroid, the formula codebook (vectors 16..31's
    * residuals), corpus encoding, per-half top-2 query probes and the
    * per-probe ADC distances. Appended to [[imiCellCtes]] by q141 and
    * q164. */
  private val imiPqAdcCtes: String =
    """res AS (SELECT a.vec_id, a.cell,
      |          list_transform(range(1, 33), i -> h.v1[i] - p1.cvec[i]) ||
      |          list_transform(range(1, 33), i -> h.v2[i] - p2.cvec[i]) AS r
      |        FROM asg a JOIN h ON h.vec_id = a.vec_id
      |          JOIN c1 p1 ON p1.cell = a.cc1
      |          JOIN c2t p2 ON p2.cell = a.cc2),
      |cb AS (SELECT s.s AS subspace, CAST(r.vec_id - 16 AS INT) AS code,
      |         r.r[s.s*8+1 : s.s*8+8] AS centroid
      |       FROM res r CROSS JOIN range(0, 8) s(s) WHERE r.vec_id BETWEEN 16 AND 31),
      |d AS (SELECT r.vec_id, r.cell, cb.subspace, cb.code,
      |        list_sum(list_transform(range(1, 9), i ->
      |          (r.r[cb.subspace*8 + i] - cb.centroid[i])
      |          * (r.r[cb.subspace*8 + i] - cb.centroid[i]))) AS dist
      |      FROM res r CROSS JOIN cb),
      |codes AS (SELECT vec_id, cell, subspace, code FROM (
      |           SELECT vec_id, cell, subspace, code,
      |             row_number() OVER (PARTITION BY vec_id, subspace
      |               ORDER BY dist ASC, code ASC) AS rn
      |           FROM d) WHERE rn = 1),
      |p1 AS (SELECT q_id, cell AS cc1 FROM (
      |        SELECT h.vec_id AS q_id, c1.cell,
      |          row_number() OVER (PARTITION BY h.vec_id
      |            ORDER BY c1.cc - 2.0 * list_dot_product(h.v1, c1.cvec) ASC,
      |                     c1.cell ASC) AS rn
      |        FROM h CROSS JOIN c1 WHERE h.vec_id < 5) WHERE rn <= 2),
      |p2 AS (SELECT q_id, cell AS cc2 FROM (
      |        SELECT h.vec_id AS q_id, c2t.cell,
      |          row_number() OVER (PARTITION BY h.vec_id
      |            ORDER BY c2t.cc - 2.0 * list_dot_product(h.v2, c2t.cvec) ASC,
      |                     c2t.cell ASC) AS rn
      |        FROM h CROSS JOIN c2t WHERE h.vec_id < 5) WHERE rn <= 2),
      |qres AS (SELECT p1.q_id, p1.cc1 * 4 + p2.cc2 AS cell,
      |           list_transform(range(1, 33), i -> h.v1[i] - pc1.cvec[i]) ||
      |           list_transform(range(1, 33), i -> h.v2[i] - pc2.cvec[i]) AS qr
      |         FROM p1 JOIN p2 USING (q_id)
      |           JOIN h ON h.vec_id = p1.q_id
      |           JOIN c1 pc1 ON pc1.cell = p1.cc1
      |           JOIN c2t pc2 ON pc2.cell = p2.cc2),
      |qd AS (SELECT q.q_id, q.cell, cb.subspace, cb.code,
      |         list_sum(list_transform(range(1, 9), i ->
      |           (q.qr[cb.subspace*8 + i] - cb.centroid[i])
      |           * (q.qr[cb.subspace*8 + i] - cb.centroid[i]))) AS dist
      |       FROM qres q CROSS JOIN cb),
      |adist AS (SELECT qd.q_id, co.vec_id AS c_id,
      |            list_sum(list(qd.dist ORDER BY qd.subspace)) AS ad
      |          FROM codes co JOIN qd ON qd.cell = co.cell
      |            AND qd.subspace = co.subspace AND qd.code = co.code
      |          WHERE co.vec_id <> qd.q_id
      |          GROUP BY 1, 2)""".stripMargin

  /** The q161 brute-force ground-truth CTEs (exact cosine over all
    * pairs, top-10 per query) — reusable wherever `e` is in scope. */
  private val annTruthCtes: String =
    """bscored AS (SELECT q.vec_id AS q_id, cd.vec_id AS c_id,
      |    round(list_dot_product(q.v, cd.v) /
      |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(cd.v, cd.v))), 4) AS cos
      |  FROM e q JOIN e cd ON q.vec_id < 5 AND cd.vec_id <> q.vec_id),
      |truth AS (SELECT q_id, c_id FROM (
      |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos DESC, c_id ASC) AS rn FROM bscored) WHERE rn <= 10)""".stripMargin

  private val qualityCtes: String =
    s"""base AS (
       |  SELECT doc_id,
       |   CAST(length(text) AS BIGINT) AS n_chars,
       |   CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens,
       |   CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS punct,
       |   CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |        t -> list_contains($enStops, t))) AS BIGINT) AS stops
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, n_chars, n_tokens,
       |   round(CAST(punct AS DOUBLE) / greatest(n_chars, 1), 4) AS punct_ratio,
       |   round(CAST(stops AS DOUBLE) / greatest(n_tokens, 1), 4) AS stop_ratio,
       |   round(least(1.0,
       |     0.5 * (CAST(stops AS DOUBLE) / greatest(n_tokens, 1))
       |   + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 20.0)
       |   + 0.2 * (1.0 - CAST(punct AS DOUBLE) / greatest(n_chars, 1))) + 1e-9, 4) AS quality_score
       |  FROM base)""".stripMargin

  /** Transitive-closure ground truth shared by q37 (label propagation)
    * and q39 (large-star/small-star): DuckDB recursive-CTE reachability
    * over the embedding near-dup pair predicate. */
  private val clusterCtes: String =
    """edges0 AS (
      | SELECT id_a, id_b FROM (
      |  SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
      |   round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      |    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
      |       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),4) AS cos
      |  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id)
      | WHERE cos >= 0.25),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM edges0
      |          UNION SELECT id_b, id_a FROM edges0),
      |nodes AS (SELECT DISTINCT src AS id FROM edges),
      |reach AS (
      | SELECT id, id AS r FROM nodes
      | UNION
      | SELECT e.src AS id, reach.r FROM edges e JOIN reach ON reach.id = e.dst)""".stripMargin

  private val dupClustersOracle: String =
    s"""WITH RECURSIVE $clusterCtes
      |SELECT id, CAST(min(r) AS BIGINT) AS rep_id
      |FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** Exact all-pairs 3-word-shingle Jaccard ground truth for the
    * MinHash near-dup verdicts (q21/q71). Tokenization mirrors
    * [[graft.operators.Dedup.minhashIndexDocs]]: lower(trim(text))
    * split on whitespace, distinct 3-token windows, with the short-doc
    * clamp (< 3 tokens yields one shingle of what's there). MinHash+LSH
    * is an approximation of this — the oracle is valid because the
    * corpus's pair-similarity distribution is bimodal (nothing within
    * [0.15, 0.85] at sf0.01, measured), so estimate and truth agree at
    * the 0.5 threshold with a wide margin on both sides. */
  /** Phrase-search derivation shared by q92 (one-shot build) and q135
    * (80/20 split + positional append): the Spark sides compute the
    * same answer by the append-equals-rebuild contract, so ONE oracle
    * truth certifies both — the q09/q66/dsir shared-oracle convention. */
  private val phraseSearchSql: String =
    """WITH d AS (SELECT doc_id,
      |             regexp_split_to_array(lower(trim(text)), '\s+') AS w
      |           FROM documents),
      |tok AS (SELECT doc_id, unnest(w) AS term,
      |          unnest(generate_series(1, len(w))) AS pos FROM d),
      |occ AS (SELECT t0.doc_id, count(*) AS n_occ
      |        FROM tok t0 JOIN tok t1
      |          ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
      |         AND t1.term = 'hash'
      |        WHERE t0.term = 'table' GROUP BY 1),
      |ranked AS (SELECT doc_id, n_occ,
      |    row_number() OVER (ORDER BY n_occ DESC, doc_id ASC) AS rank
      |  FROM occ)
      |SELECT CAST(rank AS BIGINT) AS rank, doc_id, n_occ
      |FROM ranked WHERE rank <= 20 ORDER BY rank""".stripMargin

  private val jaccardCtes: String =
    """toks AS (
      | SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      | FROM documents),
      |grams AS (
      | SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS g
      | FROM toks, UNNEST(generate_series(1, greatest(len(t)-2, 1))) AS u(i)),
      |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the non-SQL-expressible ops
    * (q21/q22/q23 LSH candidate generation, q26 LSH ANN) → rows-only +
    * ScalaTest specs. */
  /** DSIR selection derivation shared by q101 (one-shot fit) and q128
    * (fit-in-halves + exact-long count merge): the Spark sides compute
    * the same answer by the merge-equals-refit contract, so ONE oracle
    * truth certifies both — the q09/q66 shared-oracle convention. */
  private val dsirSelectionSql: String =
    """WITH tk AS (
      |  SELECT doc_id, source = 'src0' AS t,
      |         unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      |  FROM documents),
      |tb AS (SELECT doc_id, t,
      |         CAST(('0x' || substr(md5('dsir:' || tok), 1, 15)) AS BIGINT) % 256 AS b
      |       FROM tk),
      |dist AS (SELECT b,
      |           sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
      |           sum(CASE WHEN t THEN 0 ELSE 1 END) AS cr
      |         FROM tb GROUP BY 1),
      |tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM dist),
      |ratio AS (SELECT b,
      |            CAST(round((ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + 256 AS DOUBLE))
      |                      - ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + 256 AS DOUBLE)))
      |                       * 100000000.0) AS BIGINT) AS lr
      |          FROM dist CROSS JOIN tot),
      |w AS (SELECT tb.doc_id, count(*) AS n_tokens, sum(r.lr) AS w
      |      FROM tb JOIN ratio r USING (b) WHERE NOT tb.t GROUP BY 1),
      |g AS (SELECT doc_id, n_tokens, w,
      |        w + CAST(round(-ln(-ln(
      |              (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':13'), 1, 13)) AS BIGINT)
      |               + 0.5) / 4503599627370496.0)) * 100000000.0) AS BIGINT) AS s
      |      FROM w),
      |r AS (SELECT doc_id, n_tokens,
      |        CAST(w AS DOUBLE) / 100000000.0 AS logweight,
      |        CAST(s AS DOUBLE) / 100000000.0 AS score,
      |        row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
      |      FROM g)
      |SELECT * FROM r WHERE rank <= 100 ORDER BY rank""".stripMargin

  /** The q126/q130/q131 shared BPE-oracle prelude — ONE definition of
    * the formula-planted 1024-merge table and its 1024-step
    * recursive-CTE rank-order encode over the distinct-word table
    * (`fin` = (word, pieces)); `keyCol` is the document attribute each
    * consumer carries through (doc_id for stats/packing, lang for the
    * parity report). Factored so the three oracles cannot drift from
    * each other or from `Bpe.kernelMerges`. */
  private def bpeKernelOracleCtes(keyCol: String): String =
    s"""WITH RECURSIVE
       |letters AS (
       |  SELECT chr(97 + CAST(i AS INTEGER)) AS c, CAST(i AS BIGINT) AS i
       |  FROM range(26) t(i)),
       |m AS (
       |  SELECT x.i * 26 + y.i AS rank, x.c AS l, y.c AS r
       |  FROM letters x, letters y
       |  UNION ALL
       |  SELECT 676 + x.i * 26 + y.i AS rank, x.c || y.c AS l, '</w>' AS r
       |  FROM letters x, letters y WHERE x.i * 26 + y.i < 348),
       |w AS (
       |  SELECT $keyCol, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
       |  FROM documents),
       |words AS (SELECT DISTINCT w FROM w WHERE w <> ''),
       |it AS (
       |  SELECT w, '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') || '</w>  ' AS s,
       |         CAST(0 AS BIGINT) AS r
       |  FROM words
       |  UNION ALL
       |  SELECT it.w, replace(it.s, ' ' || m.l || '  ' || m.r || ' ',
       |                       ' ' || m.l || m.r || ' '), it.r + 1
       |  FROM it JOIN m ON m.rank = it.r),
       |fin AS (
       |  SELECT w, CAST(len(string_split_regex(trim(s), '\\s+')) AS BIGINT) AS p
       |  FROM it WHERE r = 1024)""".stripMargin

  /** The q115/q117/q132 shared site-dressing oracle prelude — ONE
    * definition of the planted dressing (mirroring
    * `TextClean.plantedSitePages`), the line explode, the per-domain
    * census, and the boilerplate sets, so the three oracles cannot
    * drift from each other or from the Spark-side planting (the
    * bpeKernelOracleCtes convention). `bodyCte` must define
    * `src(doc_id, source, body)`; `censusWhere` restricts the census
    * to the corpus side ('' = whole corpus, the q115 one-shot). */
  private def sitePagesOracleCtes(bodyCte: String, censusWhere: String): String =
    s"""WITH $bodyCte,
       |planted AS (
       |  SELECT doc_id, source,
       |    concat_ws(chr(10),
       |      'SITE HEADER ' || source,
       |      'home | about | contact',
       |      CASE WHEN doc_id % 5 = 0 THEN 'subscribe to ' || source || ' today' ELSE body END,
       |      CASE WHEN doc_id % 5 = 0 THEN body ELSE '' END,
       |      CASE WHEN doc_id % 125 = 4 THEN 'rare notice ' || source ELSE '' END,
       |      '(c) 2024 ' || source || ' all rights reserved') AS text
       |  FROM src),
       |l AS (SELECT doc_id, source, string_split(text, chr(10)) AS ls FROM planted),
       |ex AS (SELECT doc_id, source, unnest(ls) AS line FROM l$censusWhere),
       |census AS (SELECT source, line, count(DISTINCT doc_id) AS nd
       |           FROM ex WHERE trim(line) <> '' GROUP BY 1, 2),
       |bp AS (SELECT source, list(line ORDER BY line) AS bls
       |       FROM census WHERE nd >= 3 GROUP BY 1)""".stripMargin

  private val plainBodyCte =
    "src AS (SELECT doc_id, source, text AS body FROM documents)"

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),4) AS sum_qty,
        | round(sum(l_extendedprice),4) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_by_nation" ->
      """SELECT r_name, n_name,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
        | count(*) AS n_lineitems
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q03_top_orders_per_segment" ->
      """SELECT c_mktsegment, rn, o_orderkey, round(o_totalprice,4) AS o_totalprice FROM (
        | SELECT c_mktsegment, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        | FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin,

    "q04_daily_order_spine" ->
      """WITH bounds AS (
        |  SELECT min(CAST(o_orderdate AS DATE)) AS lo, max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders, sum(o_totalprice) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT s.day, coalesce(d.n_orders, 0) AS n_orders, round(coalesce(d.rev, 0),4) AS revenue
        |FROM spine s LEFT JOIN daily d USING(day) ORDER BY s.day""".stripMargin,

    "q05_event_type_pivot" ->
      """SELECT user_id,
        | coalesce(round(sum(CASE WHEN event_type='click' THEN value END),4),0) AS click_value,
        | coalesce(round(sum(CASE WHEN event_type='error' THEN value END),4),0) AS error_value,
        | coalesce(round(sum(CASE WHEN event_type='purchase' THEN value END),4),0) AS purchase_value,
        | coalesce(round(sum(CASE WHEN event_type='signup' THEN value END),4),0) AS signup_value,
        | coalesce(round(sum(CASE WHEN event_type='view' THEN value END),4),0) AS view_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q06_sales_report" ->
      """WITH per_order AS (
        |  SELECT l_orderkey,
        |   CAST(sum(CAST(round(l_extendedprice*1000000.0) AS BIGINT)) AS BIGINT) AS gross_s,
        |   CAST(sum(CAST(round(l_extendedprice*l_discount*1000000.0) AS BIGINT)) AS BIGINT) AS disc_s,
        |   CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*l_tax*1000000.0) AS BIGINT)) AS BIGINT) AS tax_s
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT o_orderkey,
        | CASE WHEN o_orderstatus='F' THEN 'fulfilled' WHEN o_orderstatus='O' THEN 'open'
        |      WHEN o_orderstatus='P' THEN 'partial' ELSE 'unknown' END AS status_label,
        | o_orderpriority IN ('1-URGENT','2-HIGH') AS is_priority,
        | round(CAST(coalesce(gross_s, 0) AS DOUBLE) / 1000000.0 + 1e-9, 4) AS gross,
        | round(CAST(coalesce(disc_s, 0) AS DOUBLE) / 1000000.0 + 1e-9, 4) AS discount_amt,
        | round(CAST(coalesce(tax_s, 0) AS DOUBLE) / 1000000.0 + 1e-9, 4) AS tax_amt,
        | round(CAST(coalesce(gross_s - disc_s + tax_s, 0) AS DOUBLE) / 1000000.0 + 1e-9, 4) AS net
        |FROM orders LEFT JOIN per_order ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "q07_clean_strings" ->
      """SELECT p_partkey, p_name,
        | trim(regexp_replace(regexp_replace(strip_accents(lower(trim(p_name))), '^ga:', ''), '[^a-z0-9]+', '_', 'g'), '_') AS clean_name,
        | trim(regexp_replace(regexp_replace(strip_accents(lower(trim(p_type))), '^ga:', ''), '[^a-z0-9]+', '_', 'g'), '_') AS clean_type,
        | trim(regexp_replace(regexp_replace(strip_accents(lower(trim(p_brand))), '^ga:', ''), '[^a-z0-9]+', '_', 'g'), '_') AS clean_brand
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q08_dedup_latest" ->
      """SELECT user_id, event_type, event_id, ts, round(value,4) AS value FROM (
        | SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |                     ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        | FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q09_sessionize" -> sessionSql,

    "q10_hourly_rollup" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start, event_type,
        | count(*) AS n_events, round(sum(value),4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,

    "q11_json_props" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q12_union_coalesce" ->
      """WITH u AS (
        | SELECT o_orderkey, o_custkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority,
        |        'open_extract' AS src
        | FROM orders WHERE o_orderstatus = 'O'
        | UNION ALL
        | SELECT o_orderkey, o_custkey, CAST(NULL AS DOUBLE) AS o_totalprice, o_orderpriority,
        |        'closed_extract' AS src
        | FROM orders WHERE o_orderstatus <> 'O')
        |SELECT o_orderkey, o_custkey,
        | round(coalesce(o_totalprice, 0),4) AS o_totalprice,
        | coalesce(o_orderpriority, 'NONE') AS o_orderpriority,
        | src, 'batch_2026_01' AS batch_id
        |FROM u ORDER BY o_orderkey, src""".stripMargin,

    "q13_utc_day_bounds" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS utc_ts FROM events),
        |c AS (SELECT event_id, utc_ts,
        |  CAST(timezone('America/Santiago', timezone('UTC', utc_ts)) AS TIMESTAMP) AS local_ts
        | FROM e)
        |SELECT event_id, utc_ts, local_ts, CAST(local_ts AS DATE) AS local_date,
        | CAST(timezone('UTC', timezone('America/Santiago', CAST(CAST(local_ts AS DATE) AS TIMESTAMP))) AS TIMESTAMP) AS day_start_utc,
        | CAST(timezone('UTC', timezone('America/Santiago', CAST(CAST(local_ts AS DATE) AS TIMESTAMP) + INTERVAL '23:59:59')) AS TIMESTAMP) AS day_end_utc
        |FROM c ORDER BY event_id""".stripMargin,

    "q14_partitioned_sink" ->
      """SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS order_year,
        | count(*) AS n_orders, round(sum(o_totalprice),4) AS revenue
        |FROM orders GROUP BY 1 ORDER BY order_year""".stripMargin,

    "q15_forecast_daily" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS ds, sum(value) AS y
        |  FROM events GROUP BY 1, 2),
        |wx AS (SELECT *, CAST(date_diff('day', min(ds) OVER (PARTITION BY event_type), ds) AS DOUBLE) AS x FROM daily),
        |fit AS (SELECT event_type, regr_slope(y, x) AS slope, regr_intercept(y, x) AS icept,
        |               max(x) AS xmax, max(ds) AS maxds
        |        FROM wx GROUP BY event_type),
        |dowm AS (SELECT w.event_type, dayofweek(w.ds) AS dow,
        |                avg(w.y - (f.icept + f.slope*w.x)) AS dow_mean
        |         FROM wx w JOIN fit f USING(event_type) GROUP BY 1, 2),
        |future AS (SELECT event_type, slope, icept, xmax, maxds,
        |                  CAST(unnest(generate_series(1, 7)) AS INTEGER) AS h FROM fit)
        |SELECT f.event_type, f.maxds + f.h AS ds,
        | round(greatest(0.0, f.icept + f.slope*(f.xmax + f.h) + coalesce(d.dow_mean, 0)),4) AS yhat
        |FROM future f LEFT JOIN dowm d
        |  ON f.event_type = d.event_type AND dayofweek(f.maxds + f.h) = d.dow
        |ORDER BY f.event_type, ds""".stripMargin,

    "q16_forecast_multi" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS ds,
        |         sum(value) AS value_sum, CAST(count(*) AS DOUBLE) AS n_events
        |  FROM events GROUP BY 1, 2),
        |melted AS (
        |  SELECT event_type, ds, 'value_sum' AS metric, value_sum AS y FROM daily
        |  UNION ALL
        |  SELECT event_type, ds, 'n_events' AS metric, n_events AS y FROM daily),
        |wx AS (SELECT *, CAST(date_diff('day', min(ds) OVER (PARTITION BY event_type, metric), ds) AS DOUBLE) AS x FROM melted),
        |fit AS (SELECT event_type, metric, regr_slope(y, x) AS slope, regr_intercept(y, x) AS icept,
        |               max(x) AS xmax, max(ds) AS maxds
        |        FROM wx GROUP BY event_type, metric),
        |dowm AS (SELECT w.event_type, w.metric, dayofweek(w.ds) AS dow,
        |                avg(w.y - (f.icept + f.slope*w.x)) AS dow_mean
        |         FROM wx w JOIN fit f ON w.event_type = f.event_type AND w.metric = f.metric
        |         GROUP BY 1, 2, 3),
        |future AS (SELECT event_type, metric, slope, icept, xmax, maxds,
        |                  CAST(unnest(generate_series(1, 7)) AS INTEGER) AS h FROM fit)
        |SELECT f.event_type, f.metric, f.maxds + f.h AS ds,
        | round(greatest(0.0, f.icept + f.slope*(f.xmax + f.h) + coalesce(d.dow_mean, 0)),4) AS yhat
        |FROM future f LEFT JOIN dowm d
        |  ON f.event_type = d.event_type AND f.metric = d.metric AND dayofweek(f.maxds + f.h) = d.dow
        |ORDER BY f.event_type, f.metric, ds""".stripMargin,

    "q17_forecast_bounded" -> {
      // Same z literal as the Spark plan (driver-side Acklam quantile) so
      // the two engines cannot disagree on the band width.
      val z = operators.Forecast.intervalZ(0.80)
      s"""WITH daily AS (
         |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS ds, sum(value) AS y
         |  FROM events GROUP BY 1, 2),
         |wx AS (SELECT *, CAST(date_diff('day', min(ds) OVER (PARTITION BY event_type), ds) AS DOUBLE) AS x FROM daily),
         |fit AS (SELECT event_type, regr_slope(y, x) AS slope, regr_intercept(y, x) AS icept,
         |               max(x) AS xmax, max(ds) AS maxds
         |        FROM wx GROUP BY event_type),
         |dowm AS (SELECT w.event_type, dayofweek(w.ds) AS dow,
         |                avg(w.y - (f.icept + f.slope*w.x)) AS dow_mean
         |         FROM wx w JOIN fit f USING(event_type) GROUP BY 1, 2),
         |sig AS (SELECT w.event_type,
         |               coalesce(stddev_samp(w.y - (f.icept + f.slope*w.x + coalesce(d.dow_mean, 0))), 0) AS sigma
         |        FROM wx w JOIN fit f USING(event_type)
         |        LEFT JOIN dowm d ON d.event_type = w.event_type AND dayofweek(w.ds) = d.dow
         |        GROUP BY 1),
         |future AS (SELECT event_type, slope, icept, xmax, maxds,
         |                  CAST(unnest(generate_series(1, 7)) AS INTEGER) AS h FROM fit),
         |pred AS (SELECT f.event_type, f.maxds + f.h AS ds,
         |                f.icept + f.slope*(f.xmax + f.h) + coalesce(d.dow_mean, 0) AS raw
         |         FROM future f LEFT JOIN dowm d
         |           ON f.event_type = d.event_type AND dayofweek(f.maxds + f.h) = d.dow)
         |SELECT p.event_type, p.ds,
         | round(greatest(0.0, greatest(10.0, least(500.0, p.raw))), 4) AS yhat,
         | round(greatest(0.0, greatest(10.0, least(500.0, p.raw - $z*s.sigma))), 4) AS yhat_lower,
         | round(greatest(0.0, greatest(10.0, least(500.0, p.raw + $z*s.sigma))), 4) AS yhat_upper
         |FROM pred p JOIN sig s USING(event_type)
         |ORDER BY p.event_type, p.ds""".stripMargin
    },

    "q18_forecast_regressor" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS ds,
        |         sum(value) AS y, CAST(count(*) AS DOUBLE) AS r
        |  FROM events GROUP BY 1, 2),
        |wx AS (SELECT *, CAST(date_diff('day', min(ds) OVER (PARTITION BY event_type), ds) AS DOUBLE) AS x FROM daily),
        |sums AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |                sum(x) AS sx, sum(r) AS sr, sum(x*x) AS sxx, sum(x*r) AS sxr, sum(r*r) AS srr,
        |                sum(y) AS sy, sum(x*y) AS sxy, sum(r*y) AS sry,
        |                max(x) AS xmax, max(ds) AS maxds
        |         FROM wx GROUP BY 1),
        |dets AS (SELECT *,
        |  n*(sxx*srr - sxr*sxr) - sx*(sx*srr - sxr*sr) + sr*(sx*sxr - sxx*sr) AS det,
        |  n*sxx - sx*sx AS den2
        |  FROM sums),
        |fb AS (SELECT *,
        |  CASE WHEN abs(den2) > 0 THEN (n*sxy - sx*sy) / den2 ELSE 0.0 END AS b1f
        |  FROM dets),
        |betas AS (SELECT event_type, xmax, maxds,
        |  CASE WHEN abs(det) <= 1e-9 * abs(n*sxx*srr) THEN (sy - b1f*sx) / n
        |       ELSE (sy*(sxx*srr - sxr*sxr) - sx*(sxy*srr - sxr*sry) + sr*(sxy*sxr - sxx*sry)) / det END AS b0,
        |  CASE WHEN abs(det) <= 1e-9 * abs(n*sxx*srr) THEN b1f
        |       ELSE (n*(sxy*srr - sxr*sry) - sy*(sx*srr - sxr*sr) + sr*(sx*sry - sxy*sr)) / det END AS b1,
        |  CASE WHEN abs(det) <= 1e-9 * abs(n*sxx*srr) THEN 0.0
        |       ELSE (n*(sxx*sry - sxy*sxr) - sx*(sx*sry - sxy*sr) + sy*(sx*sxr - sxx*sr)) / det END AS b2
        |  FROM fb),
        |dowm AS (SELECT w.event_type, dayofweek(w.ds) AS dow,
        |                avg(w.y - (b.b0 + b.b1*w.x + b.b2*w.r)) AS dow_mean
        |         FROM wx w JOIN betas b USING(event_type) GROUP BY 1, 2),
        |freg AS (SELECT event_type, avg(r) AS r FROM daily GROUP BY 1),
        |future AS (SELECT b.event_type, b.b0, b.b1, b.b2, b.maxds + t.h AS ds, b.xmax + t.h AS x, g.r
        |           FROM betas b
        |           CROSS JOIN (SELECT CAST(unnest(generate_series(1, 7)) AS INTEGER) AS h) t
        |           JOIN freg g ON g.event_type = b.event_type)
        |SELECT f.event_type, f.ds,
        | round(greatest(0.0, f.b0 + f.b1*f.x + f.b2*f.r + coalesce(d.dow_mean, 0)), 4) AS yhat
        |FROM future f LEFT JOIN dowm d
        |  ON f.event_type = d.event_type AND dayofweek(f.ds) = d.dow
        |ORDER BY f.event_type, f.ds""".stripMargin,

    // JOINT regressor + holiday-indicator fit: the 4×4 Cramer formula
    // trees are GENERATED from the same structural definition the Spark
    // plan uses (operators.Forecast.Cramer4 renders one tree to Columns
    // and to fully-parenthesized SQL), so the two engines execute
    // bit-identical float expressions — the q18 convention one
    // dimension up, and the hash check covers a genuinely joint fit.
    // q133: the q19 SHAPE (trend + weekly + yearly Fourier pairs, 6×6)
    // — Cramer6 renders the same determinant/numerator float trees
    // into the Spark plan and into this SQL (the q129 convention one
    // size up); both omegas are literal doubles, identical bits
    "q133_forecast_joint_cramer6" -> {
      import operators.Forecast.{Cramer4, Cramer6}
      val det = Cramer6.det(Cramer4.SqlAlg)
      def num(i: Int) = Cramer6.num(Cramer4.SqlAlg, i)
      val guard = "abs(det) <= 1e-9 * abs(n*sxx*sss*scc*suu*svv)"
      s"""WITH daily AS (
         |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS ds, sum(value) AS y
         |  FROM events GROUP BY 1, 2),
         |wx AS (SELECT *,
         |         CAST(date_diff('day', min(ds) OVER (PARTITION BY event_type), ds) AS DOUBLE) AS x
         |       FROM daily),
         |wf AS (SELECT *,
         |         sin(x * 0.8975979010256552) AS s, cos(x * 0.8975979010256552) AS c,
         |         sin(x * 0.017202423838958484) AS u, cos(x * 0.017202423838958484) AS v
         |       FROM wx),
         |sums AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         |  sum(x) AS sx, sum(s) AS ss, sum(c) AS sc, sum(u) AS su, sum(v) AS sv,
         |  sum(x*x) AS sxx, sum(x*s) AS sxs, sum(x*c) AS sxc, sum(x*u) AS sxu, sum(x*v) AS sxv,
         |  sum(s*s) AS sss, sum(s*c) AS ssc, sum(s*u) AS ssu, sum(s*v) AS ssv,
         |  sum(c*c) AS scc, sum(c*u) AS scu, sum(c*v) AS scv,
         |  sum(u*u) AS suu, sum(u*v) AS suv, sum(v*v) AS svv,
         |  sum(y) AS sy, sum(x*y) AS sxy, sum(s*y) AS ssy, sum(c*y) AS scy,
         |  sum(u*y) AS suy, sum(v*y) AS svy,
         |  max(x) AS xmax, max(ds) AS maxds
         |  FROM wf GROUP BY 1),
         |dets AS (SELECT *, $det AS det, n*sxx - sx*sx AS den2 FROM sums),
         |fb AS (SELECT *, CASE WHEN abs(den2) > 0 THEN (n*sxy - sx*sy) / den2 ELSE 0.0 END AS b1f FROM dets),
         |betas AS (SELECT event_type, xmax, maxds,
         |  CASE WHEN $guard THEN (sy - b1f*sx) / n ELSE ${num(0)} / det END AS b0,
         |  CASE WHEN $guard THEN b1f ELSE ${num(1)} / det END AS b1,
         |  CASE WHEN $guard THEN 0.0 ELSE ${num(2)} / det END AS b2,
         |  CASE WHEN $guard THEN 0.0 ELSE ${num(3)} / det END AS b3,
         |  CASE WHEN $guard THEN 0.0 ELSE ${num(4)} / det END AS b4,
         |  CASE WHEN $guard THEN 0.0 ELSE ${num(5)} / det END AS b5
         |  FROM fb),
         |future AS (SELECT b.event_type, b.b0, b.b1, b.b2, b.b3, b.b4, b.b5,
         |                  b.maxds + t.hz AS ds, b.xmax + t.hz AS x
         |           FROM betas b
         |           CROSS JOIN (SELECT CAST(unnest(generate_series(1, 7)) AS INTEGER) AS hz) t),
         |ff AS (SELECT *,
         |         sin(x * 0.8975979010256552) AS s, cos(x * 0.8975979010256552) AS c,
         |         sin(x * 0.017202423838958484) AS u, cos(x * 0.017202423838958484) AS v
         |       FROM future)
         |SELECT event_type, ds,
         | round(greatest(0.0, b0 + b1*x + b2*s + b3*c + b4*u + b5*v), 4) AS yhat
         |FROM ff ORDER BY event_type, ds""".stripMargin
    },

    // q129: the q43 SHAPE (trend + weekly Fourier pair + regressor,
    // 5×5) made oracle-backed — Cramer5 renders the SAME determinant
    // and numerator float trees into the Spark plan and into this SQL
    // (the q44 convention one size up); sin/cos arguments are x times
    // the literal double 2π/7, identical bits on both engines
    "q129_forecast_joint_cramer5" -> {
      import operators.Forecast.{Cramer4, Cramer5}
      val det = Cramer5.det(Cramer4.SqlAlg)
      def num(i: Int) = Cramer5.num(Cramer4.SqlAlg, i)
      val guard = "abs(det) <= 1e-9 * abs(n*sxx*sss*scc*srr)"
      s"""WITH daily AS (
         |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS ds,
         |         sum(value) AS y, CAST(count(*) AS DOUBLE) AS r
         |  FROM events GROUP BY 1, 2),
         |wx AS (SELECT *,
         |         CAST(date_diff('day', min(ds) OVER (PARTITION BY event_type), ds) AS DOUBLE) AS x
         |       FROM daily),
         |wf AS (SELECT *, sin(x * 0.8975979010256552) AS s, cos(x * 0.8975979010256552) AS c FROM wx),
         |sums AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         |  sum(x) AS sx, sum(s) AS ss, sum(c) AS sc, sum(r) AS sr,
         |  sum(x*x) AS sxx, sum(x*s) AS sxs, sum(x*c) AS sxc, sum(x*r) AS sxr,
         |  sum(s*s) AS sss, sum(s*c) AS ssc, sum(s*r) AS ssr,
         |  sum(c*c) AS scc, sum(c*r) AS scr, sum(r*r) AS srr,
         |  sum(y) AS sy, sum(x*y) AS sxy, sum(s*y) AS ssy, sum(c*y) AS scy, sum(r*y) AS sry,
         |  max(x) AS xmax, max(ds) AS maxds, avg(r) AS rmean
         |  FROM wf GROUP BY 1),
         |dets AS (SELECT *, $det AS det, n*sxx - sx*sx AS den2 FROM sums),
         |fb AS (SELECT *, CASE WHEN abs(den2) > 0 THEN (n*sxy - sx*sy) / den2 ELSE 0.0 END AS b1f FROM dets),
         |betas AS (SELECT event_type, xmax, maxds, rmean,
         |  CASE WHEN $guard THEN (sy - b1f*sx) / n ELSE ${num(0)} / det END AS b0,
         |  CASE WHEN $guard THEN b1f ELSE ${num(1)} / det END AS b1,
         |  CASE WHEN $guard THEN 0.0 ELSE ${num(2)} / det END AS b2,
         |  CASE WHEN $guard THEN 0.0 ELSE ${num(3)} / det END AS b3,
         |  CASE WHEN $guard THEN 0.0 ELSE ${num(4)} / det END AS b4
         |  FROM fb),
         |future AS (SELECT b.event_type, b.b0, b.b1, b.b2, b.b3, b.b4,
         |                  b.maxds + t.hz AS ds, b.xmax + t.hz AS x, b.rmean
         |           FROM betas b
         |           CROSS JOIN (SELECT CAST(unnest(generate_series(1, 7)) AS INTEGER) AS hz) t),
         |ff AS (SELECT *, sin(x * 0.8975979010256552) AS s, cos(x * 0.8975979010256552) AS c FROM future)
         |SELECT event_type, ds,
         | round(greatest(0.0, b0 + b1*x + b2*s + b3*c + b4*rmean), 4) AS yhat
         |FROM ff ORDER BY event_type, ds""".stripMargin
    },

    "q44_forecast_joint_cramer" -> {
      import operators.Forecast.Cramer4
      val det = Cramer4.det(Cramer4.SqlAlg)
      def num(i: Int) = Cramer4.num(Cramer4.SqlAlg, i)
      val guard = "abs(det) <= 1e-9 * abs(n*sxx*srr*shh)"
      s"""WITH daily AS (
         |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS ds,
         |         sum(value) AS y, CAST(count(*) AS DOUBLE) AS r
         |  FROM events GROUP BY 1, 2),
         |dh AS (SELECT *, CASE WHEN day(ds) IN (1, 15) THEN 1.0 ELSE 0.0 END AS h FROM daily),
         |wx AS (SELECT *, CAST(date_diff('day', min(ds) OVER (PARTITION BY event_type), ds) AS DOUBLE) AS x FROM dh),
         |sums AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         |  sum(x) AS sx, sum(r) AS sr, sum(h) AS sh,
         |  sum(x*x) AS sxx, sum(x*r) AS sxr, sum(x*h) AS sxh,
         |  sum(r*r) AS srr, sum(r*h) AS srh, sum(h*h) AS shh,
         |  sum(y) AS sy, sum(x*y) AS sxy, sum(r*y) AS sry, sum(h*y) AS shy,
         |  max(x) AS xmax, max(ds) AS maxds, avg(r) AS rmean
         |  FROM wx GROUP BY 1),
         |dets AS (SELECT *, $det AS det, n*sxx - sx*sx AS den2 FROM sums),
         |fb AS (SELECT *, CASE WHEN abs(den2) > 0 THEN (n*sxy - sx*sy) / den2 ELSE 0.0 END AS b1f FROM dets),
         |betas AS (SELECT event_type, xmax, maxds, rmean,
         |  CASE WHEN $guard THEN (sy - b1f*sx) / n ELSE ${num(0)} / det END AS b0,
         |  CASE WHEN $guard THEN b1f ELSE ${num(1)} / det END AS b1,
         |  CASE WHEN $guard THEN 0.0 ELSE ${num(2)} / det END AS b2,
         |  CASE WHEN $guard THEN 0.0 ELSE ${num(3)} / det END AS b3
         |  FROM fb),
         |dowm AS (SELECT w.event_type, dayofweek(w.ds) AS dow,
         |                avg(w.y - (b.b0 + b.b1*w.x + b.b2*w.r + b.b3*w.h)) AS dow_mean
         |         FROM wx w JOIN betas b USING(event_type) GROUP BY 1, 2),
         |future AS (SELECT b.event_type, b.b0, b.b1, b.b2, b.b3,
         |                  b.maxds + t.hz AS ds, b.xmax + t.hz AS x, b.rmean AS r
         |           FROM betas b
         |           CROSS JOIN (SELECT CAST(unnest(generate_series(1, 7)) AS INTEGER) AS hz) t),
         |fut2 AS (SELECT *, CASE WHEN day(ds) IN (1, 15) THEN 1.0 ELSE 0.0 END AS hh FROM future)
         |SELECT f.event_type, f.ds,
         | round(greatest(0.0, f.b0 + f.b1*f.x + f.b2*f.r + f.b3*f.hh + coalesce(d.dow_mean, 0)), 4) AS yhat
         |FROM fut2 f LEFT JOIN dowm d
         |  ON f.event_type = d.event_type AND dayofweek(f.ds) = d.dow
         |ORDER BY f.event_type, f.ds""".stripMargin
    },

    // piecewise-linear trend, one knot at 0.8·span: the hinge is an
    // auto-generated regressor, so the SQL is the q18 Cramer pattern
    // with r = (x − 0.8·max(x))₊ — same formulas, same float tree.
    "q38_forecast_changepoints" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS ds, sum(value) AS y
        |  FROM events GROUP BY 1, 2),
        |wx0 AS (SELECT *, CAST(date_diff('day', min(ds) OVER (PARTITION BY event_type), ds) AS DOUBLE) AS x FROM daily),
        |wx AS (SELECT *, greatest(0.0, x - 0.8 * max(x) OVER (PARTITION BY event_type)) AS r FROM wx0),
        |sums AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |                sum(x) AS sx, sum(r) AS sr, sum(x*x) AS sxx, sum(x*r) AS sxr, sum(r*r) AS srr,
        |                sum(y) AS sy, sum(x*y) AS sxy, sum(r*y) AS sry,
        |                max(x) AS xmax, max(ds) AS maxds
        |         FROM wx GROUP BY 1),
        |dets AS (SELECT *,
        |  n*(sxx*srr - sxr*sxr) - sx*(sx*srr - sxr*sr) + sr*(sx*sxr - sxx*sr) AS det,
        |  n*sxx - sx*sx AS den2
        |  FROM sums),
        |fb AS (SELECT *,
        |  CASE WHEN abs(den2) > 0 THEN (n*sxy - sx*sy) / den2 ELSE 0.0 END AS b1f
        |  FROM dets),
        |betas AS (SELECT event_type, xmax, maxds,
        |  CASE WHEN abs(det) <= 1e-9 * abs(n*sxx*srr) THEN (sy - b1f*sx) / n
        |       ELSE (sy*(sxx*srr - sxr*sxr) - sx*(sxy*srr - sxr*sry) + sr*(sxy*sxr - sxx*sry)) / det END AS b0,
        |  CASE WHEN abs(det) <= 1e-9 * abs(n*sxx*srr) THEN b1f
        |       ELSE (n*(sxy*srr - sxr*sry) - sy*(sx*srr - sxr*sr) + sr*(sx*sry - sxy*sr)) / det END AS b1,
        |  CASE WHEN abs(det) <= 1e-9 * abs(n*sxx*srr) THEN 0.0
        |       ELSE (n*(sxx*sry - sxy*sxr) - sx*(sx*sry - sxy*sr) + sy*(sx*sxr - sxx*sr)) / det END AS b2
        |  FROM fb),
        |dowm AS (SELECT w.event_type, dayofweek(w.ds) AS dow,
        |                avg(w.y - (b.b0 + b.b1*w.x + b.b2*w.r)) AS dow_mean
        |         FROM wx w JOIN betas b USING(event_type) GROUP BY 1, 2),
        |future AS (SELECT b.event_type, b.b0, b.b1, b.b2, b.maxds + t.h AS ds, b.xmax + t.h AS x,
        |                  b.xmax + t.h - 0.8*b.xmax AS r
        |           FROM betas b
        |           CROSS JOIN (SELECT CAST(unnest(generate_series(1, 7)) AS INTEGER) AS h) t)
        |SELECT f.event_type, f.ds,
        | round(greatest(0.0, f.b0 + f.b1*f.x + f.b2*f.r + coalesce(d.dow_mean, 0)), 4) AS yhat
        |FROM future f LEFT JOIN dowm d
        |  ON f.event_type = d.event_type AND dayofweek(f.ds) = d.dow
        |ORDER BY f.event_type, f.ds""".stripMargin,

    "q35_forecast_holidays" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS ds, sum(value) AS y
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT min(ds) AS lo, max(ds) AS hi FROM daily),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
        |                 CAST(hi AS TIMESTAMP) + INTERVAL 7 DAY, INTERVAL 1 DAY)) AS DATE) AS ds
        |          FROM bounds),
        |hol AS (SELECT ds, 'payday_' || CAST(day(ds) AS VARCHAR) AS holiday
        |        FROM spine WHERE day(ds) IN (1, 15)),
        |wx AS (SELECT *, CAST(date_diff('day', min(ds) OVER (PARTITION BY event_type), ds) AS DOUBLE) AS x FROM daily),
        |fit AS (SELECT event_type, regr_slope(y, x) AS slope, regr_intercept(y, x) AS icept,
        |               max(x) AS xmax, max(ds) AS maxds
        |        FROM wx GROUP BY event_type),
        |resid AS (SELECT w.event_type, w.ds, w.y - (f.icept + f.slope*w.x) AS r1, h.holiday
        |          FROM wx w JOIN fit f USING(event_type) LEFT JOIN hol h USING(ds)),
        |holm AS (SELECT event_type, holiday, avg(r1) AS h_mean
        |         FROM resid WHERE holiday IS NOT NULL GROUP BY 1, 2),
        |dowm AS (SELECT r.event_type, dayofweek(r.ds) AS dow,
        |                avg(r.r1 - coalesce(m.h_mean, 0)) AS dow_mean
        |         FROM resid r LEFT JOIN holm m
        |           ON m.event_type = r.event_type AND m.holiday = r.holiday
        |         GROUP BY 1, 2),
        |future AS (SELECT f.event_type, f.slope, f.icept, f.maxds + t.h AS ds, f.xmax + t.h AS x
        |           FROM fit f CROSS JOIN (SELECT CAST(unnest(generate_series(1, 7)) AS INTEGER) AS h) t)
        |SELECT fu.event_type, fu.ds,
        | round(greatest(0.0, fu.icept + fu.slope*fu.x
        |   + coalesce(m.h_mean, 0) + coalesce(d.dow_mean, 0)), 4) AS yhat
        |FROM future fu
        |LEFT JOIN hol h ON h.ds = fu.ds
        |LEFT JOIN holm m ON m.event_type = fu.event_type AND m.holiday = h.holiday
        |LEFT JOIN dowm d ON d.event_type = fu.event_type AND dayofweek(fu.ds) = d.dow
        |ORDER BY fu.event_type, fu.ds""".stripMargin,

    "q33_sales_returns" ->
      """WITH per_order AS (
        |  SELECT l_orderkey,
        |   CAST(sum(CAST(round(l_extendedprice*1000000.0) AS BIGINT)) AS BIGINT) AS gross_s,
        |   CAST(sum(CAST(round(l_extendedprice*l_discount*1000000.0) AS BIGINT)) AS BIGINT) AS disc_s,
        |   CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*l_tax*1000000.0) AS BIGINT)) AS BIGINT) AS tax_s,
        |   CAST(sum(CASE WHEN l_returnflag = 'R' THEN
        |     CAST(round(l_extendedprice*(1-l_discount)*1000000.0) AS BIGINT)
        |     - CAST(round(l_extendedprice*(1-l_discount)*l_tax*1000000.0) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS ret_s,
        |   count(*) AS n_lines,
        |   sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned
        |  FROM lineitem GROUP BY 1)
        |SELECT o_orderkey,
        | CASE WHEN coalesce(n_returned, 0) = 0 THEN 'paid'
        |      WHEN n_returned = n_lines THEN 'refunded'
        |      ELSE 'partially_refunded' END AS financial_status,
        | round(CAST(coalesce(gross_s, 0) AS DOUBLE) / 1000000.0 + 1e-9, 4) AS gross_sales,
        | round(CAST(coalesce(disc_s, 0) AS DOUBLE) / 1000000.0 + 1e-9, 4) AS discounts,
        | round(CAST(coalesce(ret_s, 0) AS DOUBLE) / 1000000.0 + 1e-9, 4) AS returns,
        | round(CAST(coalesce(tax_s, 0) AS DOUBLE) / 1000000.0 + 1e-9, 4) AS taxes,
        | round(o_totalprice + 1e-9, 4) AS total_sales,
        | round(o_totalprice - CAST(coalesce(ret_s, 0) AS DOUBLE) / 1000000.0 + 1e-9, 4) AS custom_total_sales
        |FROM orders LEFT JOIN per_order ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "q34_refunds_frame" ->
      """WITH per_order AS (
        |  SELECT l_orderkey,
        |   CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*1000000.0) AS BIGINT)
        |      - CAST(round(l_extendedprice*(1-l_discount)*l_tax*1000000.0) AS BIGINT)) AS BIGINT) AS ret_s,
        |   max(CAST(l_shipdate AS DATE)) AS refund_date
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1)
        |SELECT o_orderkey, refund_date,
        | round(CAST(ret_s AS DOUBLE) / 1000000.0 + 1e-9, 4) AS returns,
        | round(-o_totalprice + 1e-9, 4) AS total_sales
        |FROM orders JOIN per_order ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "q20_dedup_exact" ->
      """SELECT fingerprint, keep_id, n_copies FROM (
        | SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id, count(*) AS n_copies
        | FROM documents GROUP BY 1)
        |ORDER BY keep_id""".stripMargin,

    // the near-dup FINAL verdicts are exact-checkable even though the
    // LSH candidate generation is not (see jaccardCtes for the margin
    // argument). q21: one-shot all-pairs verdict. q71: the incremental
    // batch-vs-corpus verdict over the deterministic 80/20 split.
    "q21_minhash_lsh" ->
      s"""WITH $jaccardCtes,
         |inter AS (
         | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
         | FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         | GROUP BY 1, 2),
         |pairs AS (
         | SELECT id_a, id_b FROM inter
         | JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
         | WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.5),
         |nb AS (SELECT id_a AS doc_id, id_b AS nb FROM pairs
         |       UNION ALL SELECT id_b, id_a FROM pairs),
         |rep AS (SELECT doc_id, min(nb) AS min_nb FROM nb GROUP BY 1)
         |SELECT d.doc_id,
         | least(d.doc_id, coalesce(r.min_nb, d.doc_id)) AS rep_id,
         | least(d.doc_id, coalesce(r.min_nb, d.doc_id)) < d.doc_id AS is_dup
         |FROM documents d LEFT JOIN rep r USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // q23's verdict is exact-checkable too: char-3-gram Jaccard with
    // the dfCap=50 stop-gram pruning replicated (candidates must share
    // a NON-STOP gram; verification then uses ALL grams — exactly the
    // operator's bucket-size filter semantics). Spark compares hashed
    // grams, the oracle compares gram strings: the match certifies the
    // verdict semantics, not the hash function.
    "q23_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, lower(trim(text)) AS s FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, substr(s, i, 3) AS g
        |  FROM toks, UNNEST(generate_series(1, greatest(length(s) - 2, 1))) AS u(i)),
        |df AS (SELECT g, count(*) AS df FROM grams GROUP BY 1),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  JOIN df ON df.g = a.g
        |  WHERE df.df BETWEEN 2 AND 50),
        |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
        |inter AS (
        |  SELECT c.id_a, c.id_b, count(*) AS ix
        |  FROM cand c
        |  JOIN grams a ON a.doc_id = c.id_a
        |  JOIN grams b ON b.doc_id = c.id_b AND b.g = a.g
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT i.id_a, i.id_b FROM inter i
        |  JOIN sizes sa ON sa.doc_id = i.id_a JOIN sizes sb ON sb.doc_id = i.id_b
        |  WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.5),
        |nb AS (SELECT id_a AS doc_id, id_b AS nb FROM pairs
        |       UNION ALL SELECT id_b, id_a FROM pairs),
        |rep AS (SELECT doc_id, min(nb) AS min_nb FROM nb GROUP BY 1)
        |SELECT d.doc_id,
        | least(d.doc_id, coalesce(r.min_nb, d.doc_id)) AS rep_id,
        | least(d.doc_id, coalesce(r.min_nb, d.doc_id)) < d.doc_id AS is_dup
        |FROM documents d LEFT JOIN rep r USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // q145: the PURE exact all-pairs 3-word-shingle Jaccard verdict —
    // no df cap, no candidate scheme, no bimodality argument (q21's
    // oracle needs one; the prefix join is exact by construction). The
    // Spark side's prefix filter is provably lossless (AllPairs lemma),
    // so this oracle certifies both the verdict AND the losslessness
    // claim: any pair the prefix index missed would hash-mismatch here.
    "q145_jaccard_prefix" ->
      s"""WITH $jaccardCtes,
         |inter AS (
         | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
         | FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         | GROUP BY 1, 2),
         |pairs AS (
         | SELECT id_a, id_b FROM inter
         | JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
         | WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.5),
         |nb AS (SELECT id_a AS doc_id, id_b AS nb FROM pairs
         |       UNION ALL SELECT id_b, id_a FROM pairs),
         |rep AS (SELECT doc_id, min(nb) AS min_nb FROM nb GROUP BY 1)
         |SELECT d.doc_id,
         | least(d.doc_id, coalesce(r.min_nb, d.doc_id)) AS rep_id,
         | least(d.doc_id, coalesce(r.min_nb, d.doc_id)) < d.doc_id AS is_dup
         |FROM documents d LEFT JOIN rep r USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // q147: q71's batch-vs-corpus split at the EXACT tier — and because
    // the operator is estimator-free, best_sim itself (the true 4-dp
    // Jaccard) joins the hash check, which the MinHash tier cannot offer
    "q147_prefix_verdicts" ->
      s"""WITH $jaccardCtes,
         |inter AS (
         | SELECT a.doc_id AS batch_id, b.doc_id AS corpus_id, count(*) AS ix
         | FROM grams a JOIN grams b ON a.g = b.g
         | WHERE a.doc_id % 5 = 4 AND b.doc_id % 5 <> 4
         | GROUP BY 1, 2),
         |pairs AS (
         | SELECT batch_id, corpus_id, ix * 1.0 / (sa.n + sb.n - ix) AS jv
         | FROM inter
         | JOIN sizes sa ON sa.doc_id = batch_id JOIN sizes sb ON sb.doc_id = corpus_id
         | WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.5),
         |agg AS (SELECT batch_id AS doc_id, min(corpus_id) AS dup_of,
         |        round(max(jv), 4) AS best_sim FROM pairs GROUP BY 1)
         |SELECT d.doc_id, a.dup_of IS NOT NULL AS is_dup,
         | CAST(coalesce(a.dup_of, -1) AS BIGINT) AS dup_of,
         | coalesce(a.best_sim, -1.0) AS best_sim
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |WHERE d.doc_id % 5 = 4
         |ORDER BY d.doc_id""".stripMargin,

    // q148: the Heaps curve re-derived — tokenization, the prefix
    // theta-join, both aggregation tiers; every column an exact
    // integer but the one 4-dp ratio of two longs (deterministic:
    // double division of identical ints rounds identically). Milestone
    // literals appear in both engines; any drift changes row counts
    // and fails the compare.
    "q148_vocab_growth" ->
      """WITH n AS (SELECT count(*) AS c FROM documents),
        |ms(prefix_docs) AS (VALUES (50), (100), (200), (500), (1000), (2000), (5000)),
        |m2 AS (SELECT CAST(prefix_docs AS BIGINT) AS prefix_docs
        |       FROM ms, n WHERE prefix_docs <= n.c),
        |toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |t2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
        |per AS (
        |  SELECT m.prefix_docs, t.tok, count(*) AS c
        |  FROM t2 t JOIN m2 m ON t.doc_id < m.prefix_docs
        |  GROUP BY 1, 2)
        |SELECT prefix_docs,
        | CAST(count(*) AS BIGINT) AS types,
        | CAST(sum(c) AS BIGINT) AS tokens,
        | CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        | round(count(*) * 1.0 / sum(c), 4) AS ttr
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,

    // q151: winnowing replayed from raw rows — donor planting, the
    // normalized char grams, the portable 60-bit md5 hashes, the
    // window argmin (min, then rightmost occurrence as its own
    // two-step where the engine uses one lexicographic struct-min),
    // distinct fingerprint sets, pairing and the minShared gate.
    "q151_winnow_overlap" ->
      """WITH planted AS (
        |  SELECT d.doc_id,
        |         CASE WHEN d.doc_id % 10 = 9 THEN dn.text ELSE d.text END AS text
        |  FROM documents d
        |  LEFT JOIN documents dn ON dn.doc_id = d.doc_id - 4),
        |t AS (SELECT doc_id,
        |        regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |      FROM planted),
        |g AS (SELECT doc_id, length(t) - 11 AS ng, u.i AS pos,
        |        CAST(('0x' || substr(md5(substr(t, CAST(u.i AS INTEGER), 12)), 1, 15))
        |             AS BIGINT) AS h
        |      FROM t, unnest(generate_series(1, length(t) - 11)) u(i)
        |      WHERE length(t) >= 15),
        |mem AS (SELECT doc_id, pos, h, u.s AS s
        |        FROM g, unnest(generate_series(greatest(pos - 3, 1),
        |                                       least(pos, ng - 3))) u(s)),
        |wm AS (SELECT doc_id, s, min(h) AS mh FROM mem GROUP BY 1, 2),
        |sel AS (SELECT DISTINCT m.doc_id, m.h
        |        FROM mem m JOIN wm ON wm.doc_id = m.doc_id AND wm.s = m.s
        |        WHERE m.h = wm.mh),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |        CAST(count(*) AS BIGINT) AS n_shared
        |      FROM sel a JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_shared FROM p
        |WHERE n_shared >= 8 ORDER BY doc_a, doc_b""".stripMargin,

    // q152: the day-2 winnow probe replayed — the q151 selection chain
    // verbatim (selection is doc-local, so the split changes nothing
    // about what each side selects), then batch-vs-corpus pairing,
    // the minShared gate, and the (max shared, min id) witness pick
    // as its own two-step where the engine uses one struct-min
    "q152_winnow_probe" ->
      """WITH planted AS (
        |  SELECT d.doc_id,
        |         CASE WHEN d.doc_id % 10 = 9 THEN dn.text ELSE d.text END AS text
        |  FROM documents d
        |  LEFT JOIN documents dn ON dn.doc_id = d.doc_id - 4),
        |t AS (SELECT doc_id,
        |        regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |      FROM planted),
        |g AS (SELECT doc_id, length(t) - 11 AS ng, u.i AS pos,
        |        CAST(('0x' || substr(md5(substr(t, CAST(u.i AS INTEGER), 12)), 1, 15))
        |             AS BIGINT) AS h
        |      FROM t, unnest(generate_series(1, length(t) - 11)) u(i)
        |      WHERE length(t) >= 15),
        |mem AS (SELECT doc_id, pos, h, u.s AS s
        |        FROM g, unnest(generate_series(greatest(pos - 3, 1),
        |                                       least(pos, ng - 3))) u(s)),
        |wm AS (SELECT doc_id, s, min(h) AS mh FROM mem GROUP BY 1, 2),
        |sel AS (SELECT DISTINCT m.doc_id, m.h
        |        FROM mem m JOIN wm ON wm.doc_id = m.doc_id AND wm.s = m.s
        |        WHERE m.h = wm.mh),
        |p AS (SELECT b.doc_id AS doc_id, c.doc_id AS corpus_id,
        |        CAST(count(*) AS BIGINT) AS ns
        |      FROM sel b JOIN sel c ON b.h = c.h
        |      WHERE b.doc_id % 5 = 4 AND c.doc_id % 5 <> 4
        |      GROUP BY 1, 2
        |      HAVING count(*) >= 8),
        |mx AS (SELECT doc_id, max(ns) AS max_shared FROM p GROUP BY 1),
        |bm AS (SELECT p.doc_id, min(p.corpus_id) AS best_match
        |       FROM p JOIN mx ON mx.doc_id = p.doc_id AND p.ns = mx.max_shared
        |       GROUP BY 1)
        |SELECT d.doc_id, mx.doc_id IS NOT NULL AS has_overlap,
        |       CAST(coalesce(bm.best_match, -1) AS BIGINT) AS best_match,
        |       CAST(coalesce(mx.max_shared, 0) AS BIGINT) AS max_shared
        |FROM documents d LEFT JOIN mx USING (doc_id) LEFT JOIN bm USING (doc_id)
        |WHERE d.doc_id % 5 = 4
        |ORDER BY d.doc_id""".stripMargin,

    // q153: span localization replayed — the q151 selection chain WITH
    // positions, diagonal pairing (pos_b − pos_a), the lag/sum islands
    // split at tolerance w, interval arithmetic and the minPrints gate
    "q153_winnow_spans" ->
      """WITH planted AS (
        |  SELECT d.doc_id,
        |         CASE WHEN d.doc_id % 10 = 9 THEN dn.text ELSE d.text END AS text
        |  FROM documents d
        |  LEFT JOIN documents dn ON dn.doc_id = d.doc_id - 4),
        |t AS (SELECT doc_id,
        |        regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |      FROM planted),
        |g AS (SELECT doc_id, length(t) - 11 AS ng, u.i AS pos,
        |        CAST(('0x' || substr(md5(substr(t, CAST(u.i AS INTEGER), 12)), 1, 15))
        |             AS BIGINT) AS h
        |      FROM t, unnest(generate_series(1, length(t) - 11)) u(i)
        |      WHERE length(t) >= 15),
        |mem AS (SELECT doc_id, pos, h, u.s AS s
        |        FROM g, unnest(generate_series(greatest(pos - 3, 1),
        |                                       least(pos, ng - 3))) u(s)),
        |sel AS (SELECT DISTINCT doc_id, pos, h FROM (
        |          SELECT doc_id, pos, h, row_number() OVER
        |            (PARTITION BY doc_id, s ORDER BY h ASC, pos DESC) AS rn
        |          FROM mem) WHERE rn = 1),
        |pts AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |          a.pos AS pa, b.pos - a.pos AS diag
        |        FROM sel a JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id),
        |brks AS (SELECT doc_a, doc_b, diag, pa,
        |          CASE WHEN pa - lag(pa) OVER
        |                 (PARTITION BY doc_a, doc_b, diag ORDER BY pa) > 4
        |               THEN 1 ELSE 0 END AS brk
        |         FROM pts),
        |isl AS (SELECT doc_a, doc_b, diag, pa,
        |          sum(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa
        |                         ROWS UNBOUNDED PRECEDING) AS isl_id
        |        FROM brks),
        |sp AS (SELECT doc_a, doc_b, diag,
        |         min(pa) AS a_start, max(pa) + 11 AS a_end,
        |         CAST(count(*) AS BIGINT) AS n_prints
        |       FROM isl GROUP BY doc_a, doc_b, diag, isl_id)
        |SELECT doc_a, doc_b,
        |  CAST(a_start AS BIGINT) AS a_start, CAST(a_end AS BIGINT) AS a_end,
        |  CAST(a_start + diag AS BIGINT) AS b_start,
        |  CAST(a_end + diag AS BIGINT) AS b_end, n_prints
        |FROM sp WHERE n_prints >= 3
        |ORDER BY doc_a, doc_b, a_start, b_start""".stripMargin,

    // q155: the day-2 span probe replayed — the q153 selection chain
    // WITH positions, the batch-vs-corpus role pairing (no a<b — the
    // split defines the roles), islands at tolerance w, intervals
    "q155_winnow_span_probe" ->
      """WITH planted AS (
        |  SELECT d.doc_id,
        |         CASE WHEN d.doc_id % 10 = 9 THEN dn.text ELSE d.text END AS text
        |  FROM documents d
        |  LEFT JOIN documents dn ON dn.doc_id = d.doc_id - 4),
        |t AS (SELECT doc_id,
        |        regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |      FROM planted),
        |g AS (SELECT doc_id, length(t) - 11 AS ng, u.i AS pos,
        |        CAST(('0x' || substr(md5(substr(t, CAST(u.i AS INTEGER), 12)), 1, 15))
        |             AS BIGINT) AS h
        |      FROM t, unnest(generate_series(1, length(t) - 11)) u(i)
        |      WHERE length(t) >= 15),
        |mem AS (SELECT doc_id, pos, h, u.s AS s
        |        FROM g, unnest(generate_series(greatest(pos - 3, 1),
        |                                       least(pos, ng - 3))) u(s)),
        |sel AS (SELECT DISTINCT doc_id, pos, h FROM (
        |          SELECT doc_id, pos, h, row_number() OVER
        |            (PARTITION BY doc_id, s ORDER BY h ASC, pos DESC) AS rn
        |          FROM mem) WHERE rn = 1),
        |pts AS (SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS corpus_id,
        |          a.pos AS pa, b.pos - a.pos AS diag
        |        FROM sel a JOIN sel b ON a.h = b.h
        |        WHERE a.doc_id % 5 = 4 AND b.doc_id % 5 <> 4),
        |brks AS (SELECT doc_id, corpus_id, diag, pa,
        |          CASE WHEN pa - lag(pa) OVER
        |                 (PARTITION BY doc_id, corpus_id, diag ORDER BY pa) > 4
        |               THEN 1 ELSE 0 END AS brk
        |         FROM pts),
        |isl AS (SELECT doc_id, corpus_id, diag, pa,
        |          sum(brk) OVER (PARTITION BY doc_id, corpus_id, diag ORDER BY pa
        |                         ROWS UNBOUNDED PRECEDING) AS isl_id
        |        FROM brks),
        |sp AS (SELECT doc_id, corpus_id, diag,
        |         min(pa) AS st, max(pa) + 11 AS en,
        |         CAST(count(*) AS BIGINT) AS n_prints
        |       FROM isl GROUP BY doc_id, corpus_id, diag, isl_id)
        |SELECT doc_id, corpus_id,
        |  CAST(st AS BIGINT) AS start, CAST(en AS BIGINT) AS "end",
        |  CAST(st + diag AS BIGINT) AS c_start,
        |  CAST(en + diag AS BIGINT) AS c_end, n_prints
        |FROM sp WHERE n_prints >= 3
        |ORDER BY doc_id, corpus_id, start, c_start""".stripMargin,

    // q156: the clean ingest replayed — the q155 probe chain down to
    // batch-side intervals, the q154 union + stitch, then a LEFT join
    // over the whole batch (untouched docs pass through normalized)
    "q156_winnow_clean" ->
      """WITH planted AS (
        |  SELECT d.doc_id,
        |         CASE WHEN d.doc_id % 10 = 9 THEN dn.text ELSE d.text END AS text
        |  FROM documents d
        |  LEFT JOIN documents dn ON dn.doc_id = d.doc_id - 4),
        |t AS (SELECT doc_id,
        |        regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |      FROM planted),
        |g AS (SELECT doc_id, length(t) - 11 AS ng, u.i AS pos,
        |        CAST(('0x' || substr(md5(substr(t, CAST(u.i AS INTEGER), 12)), 1, 15))
        |             AS BIGINT) AS h
        |      FROM t, unnest(generate_series(1, length(t) - 11)) u(i)
        |      WHERE length(t) >= 15),
        |mem AS (SELECT doc_id, pos, h, u.s AS s
        |        FROM g, unnest(generate_series(greatest(pos - 3, 1),
        |                                       least(pos, ng - 3))) u(s)),
        |sel AS (SELECT DISTINCT doc_id, pos, h FROM (
        |          SELECT doc_id, pos, h, row_number() OVER
        |            (PARTITION BY doc_id, s ORDER BY h ASC, pos DESC) AS rn
        |          FROM mem) WHERE rn = 1),
        |pts AS (SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS corpus_id,
        |          a.pos AS pa, b.pos - a.pos AS diag
        |        FROM sel a JOIN sel b ON a.h = b.h
        |        WHERE a.doc_id % 5 = 4 AND b.doc_id % 5 <> 4),
        |brks AS (SELECT doc_id, corpus_id, diag, pa,
        |          CASE WHEN pa - lag(pa) OVER
        |                 (PARTITION BY doc_id, corpus_id, diag ORDER BY pa) > 4
        |               THEN 1 ELSE 0 END AS brk
        |         FROM pts),
        |isl AS (SELECT doc_id, corpus_id, diag, pa,
        |          sum(brk) OVER (PARTITION BY doc_id, corpus_id, diag ORDER BY pa
        |                         ROWS UNBOUNDED PRECEDING) AS isl_id
        |        FROM brks),
        |sp AS (SELECT doc_id, corpus_id, diag,
        |         min(pa) AS st, max(pa) + 11 AS en, count(*) AS np
        |       FROM isl GROUP BY doc_id, corpus_id, diag, isl_id),
        |iv AS (SELECT DISTINCT doc_id, st AS s, en AS e FROM sp WHERE np >= 3),
        |om AS (SELECT doc_id, s, e,
        |        max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |       FROM iv),
        |grp AS (SELECT doc_id, s, e,
        |         sum(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY s, e
        |                 ROWS UNBOUNDED PRECEDING) AS gid
        |        FROM om),
        |m AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM grp GROUP BY doc_id, gid),
        |segs AS (SELECT doc_id, s, e,
        |          lag(e, 1, CAST(0 AS BIGINT)) OVER (PARTITION BY doc_id ORDER BY s) AS pe
        |         FROM m),
        |pieces AS (SELECT sg.doc_id,
        |            substr(t.t, CAST(sg.pe + 1 AS INTEGER),
        |                   CAST(sg.s - sg.pe - 1 AS INTEGER)) AS piece, sg.s AS ord
        |           FROM segs sg JOIN t ON t.doc_id = sg.doc_id),
        |agg AS (SELECT doc_id, max(e) AS le, CAST(count(*) AS BIGINT) AS n_spans,
        |         CAST(sum(e - s + 1) AS BIGINT) AS removed_chars
        |        FROM m GROUP BY 1),
        |stitched AS (SELECT p.doc_id, string_agg(p.piece, '' ORDER BY p.ord) AS head
        |             FROM pieces p GROUP BY 1)
        |SELECT t.doc_id,
        | CASE WHEN a.le IS NULL THEN t.t
        |      ELSE coalesce(st.head, '') || substr(t.t, CAST(a.le + 1 AS INTEGER)) END
        |   AS clean_text,
        | CAST(coalesce(a.removed_chars, 0) AS BIGINT) AS removed_chars,
        | CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans
        |FROM t LEFT JOIN agg a USING (doc_id) LEFT JOIN stitched st USING (doc_id)
        |WHERE t.doc_id % 5 = 4
        |ORDER BY t.doc_id""".stripMargin,
    // q157: the within-doc line dedup replayed — the identical
    // planting, then the first-index keep rule via list_position
    // (1-based, like the engine's array_position = i + 1)
    "q157_line_dedup" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || chr(10) || 'Subscribe to our newsletter today'
        |         || chr(10) || 'section ' || CAST(doc_id % 7 AS VARCHAR)
        |         || chr(10) || 'Subscribe to our newsletter today'
        |         || chr(10) || CASE WHEN doc_id % 3 = 0 THEN text
        |                       ELSE 'unique tail ' || CAST(doc_id AS VARCHAR) END
        |      AS text
        |  FROM documents),
        |lt AS (SELECT doc_id,
        |         list_filter(list_transform(string_split(text, chr(10)),
        |                                    x -> trim(x)),
        |                     x -> x <> '') AS ls
        |       FROM p),
        |k AS (SELECT doc_id, ls,
        |        list_filter(list_transform(ls, (x, i) ->
        |          CASE WHEN list_position(ls, x) = i THEN x END),
        |          x -> x IS NOT NULL) AS ks
        |      FROM lt)
        |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
        |       CAST(len(ks) AS BIGINT) AS n_kept,
        |       array_to_string(ks, chr(10)) AS clean_text
        |FROM k ORDER BY doc_id""".stripMargin,

    // q158: the mixture plan replayed — weights interpolated from the
    // SAME Scala map (q104 convention), then grouping, the ratio sort,
    // the prefix cap test, the running AND, and both floor divisions
    // (Spark DIV and DuckDB // agree on positives) — integer-exact
    "q158_mixture_plan" ->
      s"""$mixturePlanOracleCtes
         |SELECT source, n_docs, n_tokens, weight,
         |  CAST(capacity AS BIGINT) AS capacity,
         |  CAST(alloc_tokens AS BIGINT) AS alloc_tokens, capped,
         |  CAST((alloc_tokens * 10000) // n_tokens AS BIGINT) AS epochs_bp
         |FROM a ORDER BY source""".stripMargin,

    // q159: the plan EXECUTED — the q158 CTEs, then per-doc whole
    // copies + the basis-point fractional coin (the q123 expansion
    // shape with the target joined from the plan)
    "q159_mixture_execute" ->
      s"""$mixturePlanOracleCtes,
         |pl AS (SELECT source,
         |         CAST((alloc_tokens * 10000) // n_tokens AS BIGINT) AS ebp
         |       FROM a),
         |dd AS (SELECT d.doc_id, d.source, pl.ebp,
         |        CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':19'), 1, 13))
         |             AS BIGINT) / 4503599627370496.0 AS u
         |       FROM documents d JOIN pl ON pl.source = d.source),
         |n AS (SELECT doc_id, source,
         |        ebp // 10000
         |        + CASE WHEN u < (ebp % 10000) / 10000.0 THEN 1 ELSE 0 END AS n
         |      FROM dd)
         |SELECT doc_id, source, CAST(i AS BIGINT) AS epoch
         |FROM n CROSS JOIN generate_series(0, 7) AS g(i)
         |WHERE i < n ORDER BY doc_id, epoch""".stripMargin,

    // q165: the composed mixture loop replayed end to end — the q158
    // plan CTEs, the q159 expansion, then realized per-source counts,
    // the md5 within-source shuffle, the exact integer stride keys
    // ((2k−1)·2³²) // (2·n_s) and the global merge, position for
    // position (global_pos = row_number over the total key order)
    "q165_mixture_interleaved" ->
      s"""$mixturePlanOracleCtes,
         |pl AS (SELECT source,
         |         CAST((alloc_tokens * 10000) // n_tokens AS BIGINT) AS ebp
         |       FROM a),
         |dd AS (SELECT d.doc_id, d.source, pl.ebp,
         |        CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':19'), 1, 13))
         |             AS BIGINT) / 4503599627370496.0 AS u
         |       FROM documents d JOIN pl ON pl.source = d.source),
         |n AS (SELECT doc_id, source,
         |        ebp // 10000
         |        + CASE WHEN u < (ebp % 10000) / 10000.0 THEN 1 ELSE 0 END AS n
         |      FROM dd),
         |ms AS (SELECT doc_id, source, CAST(i AS BIGINT) AS epoch
         |       FROM n CROSS JOIN generate_series(0, 7) AS g(i) WHERE i < n),
         |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src
         |        FROM ms GROUP BY source),
         |rk AS (SELECT ms.doc_id, ms.source, ms.epoch,
         |         CAST(('0x' || substr(md5(CAST(ms.doc_id AS VARCHAR) || '#'
         |              || CAST(ms.epoch AS VARCHAR) || ':23'), 1, 13))
         |              AS BIGINT) / 4503599627370496.0 AS u2
         |       FROM ms),
         |r2 AS (SELECT doc_id, source, epoch,
         |         CAST(row_number() OVER (PARTITION BY source
         |           ORDER BY u2 ASC, doc_id ASC, epoch ASC) AS BIGINT) AS src_rank
         |       FROM rk),
         |ky AS (SELECT r2.doc_id, r2.source, r2.epoch, r2.src_rank,
         |         ((2 * r2.src_rank - 1) * 4294967296) // (2 * cnt.n_src) AS pos_key
         |       FROM r2 JOIN cnt USING (source))
         |SELECT CAST(row_number() OVER (
         |         ORDER BY pos_key, source, doc_id, epoch) - 1 AS BIGINT) AS global_pos,
         |       doc_id, source, epoch, src_rank
         |FROM ky ORDER BY global_pos""".stripMargin,


    // q154: excision replayed — the q153 span chain, the b-side
    // interval union (window merge over (s, e)), and the kept-segment
    // stitch (lag-based pieces + tail where the engine uses one fold)
    "q154_winnow_excise" ->
      """WITH planted AS (
        |  SELECT d.doc_id,
        |         CASE WHEN d.doc_id % 10 = 9 THEN dn.text ELSE d.text END AS text
        |  FROM documents d
        |  LEFT JOIN documents dn ON dn.doc_id = d.doc_id - 4),
        |t AS (SELECT doc_id,
        |        regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |      FROM planted),
        |g AS (SELECT doc_id, length(t) - 11 AS ng, u.i AS pos,
        |        CAST(('0x' || substr(md5(substr(t, CAST(u.i AS INTEGER), 12)), 1, 15))
        |             AS BIGINT) AS h
        |      FROM t, unnest(generate_series(1, length(t) - 11)) u(i)
        |      WHERE length(t) >= 15),
        |mem AS (SELECT doc_id, pos, h, u.s AS s
        |        FROM g, unnest(generate_series(greatest(pos - 3, 1),
        |                                       least(pos, ng - 3))) u(s)),
        |sel AS (SELECT DISTINCT doc_id, pos, h FROM (
        |          SELECT doc_id, pos, h, row_number() OVER
        |            (PARTITION BY doc_id, s ORDER BY h ASC, pos DESC) AS rn
        |          FROM mem) WHERE rn = 1),
        |pts AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |          a.pos AS pa, b.pos - a.pos AS diag
        |        FROM sel a JOIN sel b ON a.h = b.h AND a.doc_id < b.doc_id),
        |brks AS (SELECT doc_a, doc_b, diag, pa,
        |          CASE WHEN pa - lag(pa) OVER
        |                 (PARTITION BY doc_a, doc_b, diag ORDER BY pa) > 4
        |               THEN 1 ELSE 0 END AS brk
        |         FROM pts),
        |isl AS (SELECT doc_a, doc_b, diag, pa,
        |          sum(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa
        |                         ROWS UNBOUNDED PRECEDING) AS isl_id
        |        FROM brks),
        |sp AS (SELECT doc_a, doc_b, diag,
        |         min(pa) AS a_start, max(pa) + 11 AS a_end, count(*) AS np
        |       FROM isl GROUP BY doc_a, doc_b, diag, isl_id),
        |iv AS (SELECT DISTINCT doc_b AS doc_id, a_start + diag AS s, a_end + diag AS e
        |       FROM sp WHERE np >= 3),
        |om AS (SELECT doc_id, s, e,
        |        max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |       FROM iv),
        |grp AS (SELECT doc_id, s, e,
        |         sum(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY s, e
        |                 ROWS UNBOUNDED PRECEDING) AS gid
        |        FROM om),
        |m AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM grp GROUP BY doc_id, gid),
        |segs AS (SELECT doc_id, s, e,
        |          lag(e, 1, CAST(0 AS BIGINT)) OVER (PARTITION BY doc_id ORDER BY s) AS pe
        |         FROM m),
        |pieces AS (SELECT sg.doc_id,
        |            substr(t.t, CAST(sg.pe + 1 AS INTEGER),
        |                   CAST(sg.s - sg.pe - 1 AS INTEGER)) AS piece, sg.s AS ord
        |           FROM segs sg JOIN t ON t.doc_id = sg.doc_id),
        |agg AS (SELECT doc_id, max(e) AS le, CAST(count(*) AS BIGINT) AS n_spans,
        |         CAST(sum(e - s + 1) AS BIGINT) AS removed_chars
        |        FROM m GROUP BY 1),
        |stitched AS (SELECT p.doc_id, string_agg(p.piece, '' ORDER BY p.ord) AS head
        |             FROM pieces p GROUP BY 1)
        |SELECT t.doc_id,
        | coalesce(st.head, '') || substr(t.t, CAST(a.le + 1 AS INTEGER)) AS clean_text,
        | a.removed_chars, a.n_spans
        |FROM t JOIN agg a USING (doc_id) LEFT JOIN stitched st USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    // q150: the round-trip identity — the oracle is deliberately just
    // the dressing (split → position-ordered rejoin): the engine side
    // runs the FULL encode→decode chain, so any drift in the id
    // space, merge fold, byte map or its inverse fails the hash.
    "q150_bpe_decode_roundtrip" ->
      """WITH wd AS (
        |  SELECT doc_id, string_split_regex(
        |    trim(lower(translate(lower(text), 'ae', 'äé'))), '\s+') AS ws
        |  FROM documents),
        |w AS (
        |  SELECT wd.doc_id, u.i AS pos, wd.ws[u.i] AS w
        |  FROM wd, unnest(generate_series(1, len(wd.ws))) u(i)
        |  WHERE wd.ws[u.i] <> '')
        |SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS text,
        |       CAST(count(*) AS BIGINT) AS n_words
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q149: the z-curve replayed as pure integer SQL — min/max range
    // scaling (the 2^(53-bits) guard makes the double quotient exact,
    // so floor == integer division on both engines), a 16-step bit
    // interleave via a range lateral join, and the 6-bit prefix shift.
    "q149_zorder_layout" ->
      """WITH mm AS (
        |  SELECT min(length(text)) AS xmin, max(length(text)) AS xmax,
        |         min(doc_id) AS ymin, max(doc_id) AS ymax
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST((CAST(length(text) - xmin AS BIGINT) * 65536)
        |         // CAST(xmax - xmin + 1 AS BIGINT) AS BIGINT) AS x_grid,
        |    CAST((CAST(doc_id - ymin AS BIGINT) * 65536)
        |         // CAST(ymax - ymin + 1 AS BIGINT) AS BIGINT) AS y_grid
        |  FROM documents, mm),
        |z AS (
        |  SELECT doc_id, x_grid, y_grid,
        |    CAST(sum((((x_grid >> i) & 1) << (2 * i))
        |           + (((y_grid >> i) & 1) << ((2 * i) + 1))) AS BIGINT) AS zvalue
        |  FROM s, range(0, 16) t(i)
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, x_grid, y_grid, zvalue,
        |       CAST(zvalue >> 26 AS BIGINT) AS zbucket
        |FROM z ORDER BY zvalue, doc_id""".stripMargin,

    // q160: the frozen-grid increment replayed — bounds from the
    // corpus slice, the batch clamped onto them (greatest/least), then
    // the q149 grid/interleave/shift chain verbatim
    "q160_zorder_append" ->
      """WITH mm AS (
        |  SELECT min(length(text)) AS xmin, max(length(text)) AS xmax,
        |         min(doc_id) AS ymin, max(doc_id) AS ymax
        |  FROM documents WHERE doc_id % 5 <> 4),
        |s AS (
        |  SELECT doc_id,
        |    CAST((CAST(least(greatest(length(text), xmin), xmax) - xmin AS BIGINT)
        |          * 65536) // CAST(xmax - xmin + 1 AS BIGINT) AS BIGINT) AS x_grid,
        |    CAST((CAST(least(greatest(doc_id, ymin), ymax) - ymin AS BIGINT)
        |          * 65536) // CAST(ymax - ymin + 1 AS BIGINT) AS BIGINT) AS y_grid
        |  FROM documents, mm WHERE doc_id % 5 = 4),
        |z AS (
        |  SELECT doc_id, x_grid, y_grid,
        |    CAST(sum((((x_grid >> i) & 1) << (2 * i))
        |           + (((y_grid >> i) & 1) << ((2 * i) + 1))) AS BIGINT) AS zvalue
        |  FROM s, range(0, 16) t(i)
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, x_grid, y_grid, zvalue,
        |       CAST(zvalue >> 26 AS BIGINT) AS zbucket
        |FROM z ORDER BY zvalue, doc_id""".stripMargin,

    // q166: the grid-drift meter replayed — frozen bounds from the
    // corpus slice, then one aggregation over the WHOLE table (clamp
    // counts below/above each bound, actual min/max), one row per
    // layout column, clamp_bp as exact integer basis points
    "q166_zorder_drift" ->
      """WITH t AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS x,
        |                  CAST(doc_id AS BIGINT) AS y
        |           FROM documents),
        |b AS (SELECT min(x) AS x0, max(x) AS x1, min(y) AS y0, max(y) AS y1
        |      FROM t WHERE doc_id % 5 <> 4),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN t.x < b.x0 THEN 1 ELSE 0 END) AS BIGINT) AS lox,
        |        CAST(sum(CASE WHEN t.x > b.x1 THEN 1 ELSE 0 END) AS BIGINT) AS hix,
        |        CAST(sum(CASE WHEN t.y < b.y0 THEN 1 ELSE 0 END) AS BIGINT) AS loy,
        |        CAST(sum(CASE WHEN t.y > b.y1 THEN 1 ELSE 0 END) AS BIGINT) AS hiy,
        |        CAST(min(t.x) AS BIGINT) AS mnx, CAST(max(t.x) AS BIGINT) AS mxx,
        |        CAST(min(t.y) AS BIGINT) AS mny, CAST(max(t.y) AS BIGINT) AS mxy
        |      FROM t, b)
        |SELECT '_x' AS col_name, n AS n_rows, lox AS n_clamped_lo,
        |       hix AS n_clamped_hi,
        |       CAST(((lox + hix) * 10000) // n AS BIGINT) AS clamp_bp,
        |       (SELECT x0 FROM b) AS frozen_min, (SELECT x1 FROM b) AS frozen_max,
        |       mnx AS data_min, mxx AS data_max
        |FROM s
        |UNION ALL
        |SELECT '_y', n, loy, hiy,
        |       CAST(((loy + hiy) * 10000) // n AS BIGINT),
        |       (SELECT y0 FROM b), (SELECT y1 FROM b), mny, mxy
        |FROM s
        |ORDER BY col_name""".stripMargin,

    // q161: the recall meter replayed — the q25 brute chain as ground
    // truth, the q79 IVF chain at both probe widths, then the
    // (q_id, c_id) intersection counts in integer basis points
    "q161_ann_recall" -> {
      def ivfTier(np: Int): String =
        s"""probes$np AS (SELECT q_id, cell FROM (
           |  SELECT e.vec_id AS q_id, c.cell,
           |    row_number() OVER (PARTITION BY e.vec_id
           |      ORDER BY c.c2 - 2.0 * list_dot_product(e.v, c.cvec) ASC, c.cell ASC) AS rn
           |  FROM e CROSS JOIN c WHERE e.vec_id < 5) WHERE rn <= $np),
           |cand$np AS (SELECT p.q_id, a.vec_id AS c_id
           |  FROM probes$np p JOIN asg a ON a.cell = p.cell WHERE a.vec_id <> p.q_id),
           |scored$np AS (SELECT cand$np.q_id, cand$np.c_id,
           |    round(list_dot_product(qe.v, ce.v) /
           |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 4) AS cos
           |  FROM cand$np JOIN e qe ON qe.vec_id = cand$np.q_id
           |  JOIN e ce ON ce.vec_id = cand$np.c_id),
           |appr$np AS (SELECT q_id, c_id FROM (
           |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
           |    ORDER BY cos DESC, c_id ASC) AS rn FROM scored$np) WHERE rn <= 10),
           |hits$np AS (SELECT t.q_id, CAST(count(*) AS BIGINT) AS n
           |  FROM truth t JOIN appr$np a ON a.q_id = t.q_id AND a.c_id = t.c_id
           |  GROUP BY 1)""".stripMargin
      def tierSelect(np: Int): String =
        s"""SELECT 'ivf_np$np' AS tier, q.q_id, CAST(10 AS BIGINT) AS k,
           |  coalesce(h.n, 0) AS n_hits,
           |  CAST((coalesce(h.n, 0) * 10000) // 10 AS BIGINT) AS recall_bp
           |FROM (SELECT DISTINCT q_id FROM truth) q
           |LEFT JOIN hits$np h ON h.q_id = q.q_id""".stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT CAST(vec_id AS INT) AS cell, v AS cvec, list_dot_product(v, v) AS c2
         |      FROM e WHERE vec_id < 16),
         |asg AS (SELECT vec_id, cell FROM (
         |         SELECT e.vec_id, c.cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY c.c2 - 2.0 * list_dot_product(e.v, c.cvec) ASC, c.cell ASC) AS rn
         |         FROM e CROSS JOIN c) WHERE rn = 1),
         |bscored AS (SELECT q.vec_id AS q_id, cd.vec_id AS c_id,
         |    round(list_dot_product(q.v, cd.v) /
         |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(cd.v, cd.v))), 4) AS cos
         |  FROM e q JOIN e cd ON q.vec_id < 5 AND cd.vec_id <> q.vec_id),
         |truth AS (SELECT q_id, c_id FROM (
         |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, c_id ASC) AS rn FROM bscored) WHERE rn <= 10),
         |${ivfTier(1)},
         |${ivfTier(4)}
         |${tierSelect(1)}
         |UNION ALL
         |${tierSelect(4)}
         |ORDER BY tier, q_id""".stripMargin
    },

    // q162: the PQ tier's recall meter — the q80 chain at ADC cuts
    // 10 and 50, the brute truth, the intersection counts
    "q162_ann_pq_recall" -> {
      def pqTier(r: Int): String =
        s"""cand$r AS (SELECT q_id, c_id FROM (
           |  SELECT q_id, c_id,
           |    row_number() OVER (PARTITION BY q_id ORDER BY ad ASC, c_id ASC) AS ar
           |  FROM adist) WHERE ar <= $r),
           |scored$r AS (SELECT cand$r.q_id, cand$r.c_id,
           |    round(list_dot_product(qe.v, ce.v) /
           |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 4) AS cos
           |  FROM cand$r JOIN e qe ON qe.vec_id = cand$r.q_id
           |  JOIN e ce ON ce.vec_id = cand$r.c_id),
           |appr$r AS (SELECT q_id, c_id FROM (
           |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
           |    ORDER BY cos DESC, c_id ASC) AS rn FROM scored$r) WHERE rn <= 10),
           |hits$r AS (SELECT t.q_id, CAST(count(*) AS BIGINT) AS n
           |  FROM truth t JOIN appr$r a ON a.q_id = t.q_id AND a.c_id = t.c_id
           |  GROUP BY 1)""".stripMargin
      def tierSelect(r: Int): String =
        s"""SELECT 'pq_r${f"$r%02d"}' AS tier, q.q_id, CAST(10 AS BIGINT) AS k,
           |  coalesce(h.n, 0) AS n_hits,
           |  CAST((coalesce(h.n, 0) * 10000) // 10 AS BIGINT) AS recall_bp
           |FROM (SELECT DISTINCT q_id FROM truth) q
           |LEFT JOIN hits$r h ON h.q_id = q.q_id""".stripMargin
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cb AS (SELECT s.s AS subspace, CAST(c.vec_id AS INT) AS code,
         |         c.v[s.s*8+1 : s.s*8+8] AS centroid
         |       FROM e c CROSS JOIN range(0, 8) s(s) WHERE c.vec_id < 16),
         |d AS (SELECT e.vec_id, cb.subspace, cb.code,
         |        list_sum(list_transform(range(1, 9), i ->
         |          (e.v[cb.subspace*8 + i] - cb.centroid[i])
         |          * (e.v[cb.subspace*8 + i] - cb.centroid[i]))) AS dist
         |      FROM e CROSS JOIN cb),
         |codes AS (SELECT vec_id, subspace, code FROM (
         |           SELECT vec_id, subspace, code,
         |             row_number() OVER (PARTITION BY vec_id, subspace
         |               ORDER BY dist ASC, code ASC) AS rn
         |           FROM d) WHERE rn = 1),
         |adist AS (SELECT qd.vec_id AS q_id, co.vec_id AS c_id,
         |            list_sum(list(qd.dist ORDER BY qd.subspace)) AS ad
         |          FROM codes co JOIN d qd
         |            ON qd.subspace = co.subspace AND qd.code = co.code
         |          WHERE qd.vec_id < 5 AND co.vec_id <> qd.vec_id
         |          GROUP BY 1, 2),
         |bscored AS (SELECT q.vec_id AS q_id, cd.vec_id AS c_id,
         |    round(list_dot_product(q.v, cd.v) /
         |      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(cd.v, cd.v))), 4) AS cos
         |  FROM e q JOIN e cd ON q.vec_id < 5 AND cd.vec_id <> q.vec_id),
         |truth AS (SELECT q_id, c_id FROM (
         |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, c_id ASC) AS rn FROM bscored) WHERE rn <= 10),
         |${pqTier(10)},
         |${pqTier(50)}
         |${tierSelect(10)}
         |UNION ALL
         |${tierSelect(50)}
         |ORDER BY tier, q_id""".stripMargin
    },

    // q167: the PQ codebook-size leg — the q162 chain twice, codebooks
    // from the first 16 vs the first 64 vectors, fixed ADC cut 50
    "q167_ann_pq_codebook" -> {
      def cbTier(cb: Int): String =
        s"""cb$cb AS (SELECT s.s AS subspace, CAST(c.vec_id AS INT) AS code,
           |         c.v[s.s*8+1 : s.s*8+8] AS centroid
           |       FROM e c CROSS JOIN range(0, 8) s(s) WHERE c.vec_id < $cb),
           |d$cb AS (SELECT e.vec_id, cb$cb.subspace, cb$cb.code,
           |        list_sum(list_transform(range(1, 9), i ->
           |          (e.v[cb$cb.subspace*8 + i] - cb$cb.centroid[i])
           |          * (e.v[cb$cb.subspace*8 + i] - cb$cb.centroid[i]))) AS dist
           |      FROM e CROSS JOIN cb$cb),
           |codes$cb AS (SELECT vec_id, subspace, code FROM (
           |           SELECT vec_id, subspace, code,
           |             row_number() OVER (PARTITION BY vec_id, subspace
           |               ORDER BY dist ASC, code ASC) AS rn
           |           FROM d$cb) WHERE rn = 1),
           |adist$cb AS (SELECT qd.vec_id AS q_id, co.vec_id AS c_id,
           |            list_sum(list(qd.dist ORDER BY qd.subspace)) AS ad
           |          FROM codes$cb co JOIN d$cb qd
           |            ON qd.subspace = co.subspace AND qd.code = co.code
           |          WHERE qd.vec_id < 5 AND co.vec_id <> qd.vec_id
           |          GROUP BY 1, 2),
           |cand$cb AS (SELECT q_id, c_id FROM (
           |  SELECT q_id, c_id,
           |    row_number() OVER (PARTITION BY q_id ORDER BY ad ASC, c_id ASC) AS ar
           |  FROM adist$cb) WHERE ar <= 50),
           |scored$cb AS (SELECT cand$cb.q_id, cand$cb.c_id,
           |    round(list_dot_product(qe.v, ce.v) /
           |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 4) AS cos
           |  FROM cand$cb JOIN e qe ON qe.vec_id = cand$cb.q_id
           |  JOIN e ce ON ce.vec_id = cand$cb.c_id),
           |appr$cb AS (SELECT q_id, c_id FROM (
           |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
           |    ORDER BY cos DESC, c_id ASC) AS rn FROM scored$cb) WHERE rn <= 10),
           |hits$cb AS (SELECT t.q_id, CAST(count(*) AS BIGINT) AS n
           |  FROM truth t JOIN appr$cb a ON a.q_id = t.q_id AND a.c_id = t.c_id
           |  GROUP BY 1)""".stripMargin
      def tierSelect(cb: Int): String =
        s"""SELECT 'pq_cb${f"$cb%02d"}' AS tier, q.q_id, CAST(10 AS BIGINT) AS k,
           |  coalesce(h.n, 0) AS n_hits,
           |  CAST((coalesce(h.n, 0) * 10000) // 10 AS BIGINT) AS recall_bp
           |FROM (SELECT DISTINCT q_id FROM truth) q
           |LEFT JOIN hits$cb h ON h.q_id = q.q_id""".stripMargin
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),\n" +
        annTruthCtes + ",\n" +
        cbTier(16) + ",\n" + cbTier(64) + "\n" +
        tierSelect(16) + "\nUNION ALL\n" + tierSelect(64) +
        "\nORDER BY tier, q_id"
    },

    // q168: the LSH tier's recall meter — the q78 md5-sign chain at
    // band splits 2 and 4 (nested boundaries: an 8-bit band match
    // implies both 4-bit sub-band matches), vs the brute truth
    "q168_ann_lsh_recall" -> {
      def lshTier(b: Int): String = {
        val w = 16 / b
        s"""bands$b AS (SELECT vec_id, j // $w AS band,
           |           string_agg(CAST(bit AS VARCHAR), '' ORDER BY j) AS bh
           |         FROM bits GROUP BY 1, 2),
           |cand$b AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
           |        FROM bands$b q JOIN bands$b c ON q.band = c.band AND q.bh = c.bh
           |        WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
           |scored$b AS (SELECT cand$b.q_id, cand$b.c_id,
           |    round(list_dot_product(qe.v, ce.v) /
           |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 4) AS cos
           |  FROM cand$b JOIN e qe ON qe.vec_id = cand$b.q_id
           |  JOIN e ce ON ce.vec_id = cand$b.c_id),
           |appr$b AS (SELECT q_id, c_id FROM (
           |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
           |    ORDER BY cos DESC, c_id ASC) AS rn FROM scored$b) WHERE rn <= 10),
           |hits$b AS (SELECT t.q_id, CAST(count(*) AS BIGINT) AS n
           |  FROM truth t JOIN appr$b a ON a.q_id = t.q_id AND a.c_id = t.c_id
           |  GROUP BY 1)""".stripMargin
      }
      def tierSelect(b: Int): String =
        s"""SELECT 'lsh_b$b' AS tier, q.q_id, CAST(10 AS BIGINT) AS k,
           |  coalesce(h.n, 0) AS n_hits,
           |  CAST((coalesce(h.n, 0) * 10000) // 10 AS BIGINT) AS recall_bp
           |FROM (SELECT DISTINCT q_id FROM truth) q
           |LEFT JOIN hits$b h ON h.q_id = q.q_id""".stripMargin
      """WITH planes AS (
        | SELECT j, list_transform(range(0, 64), d ->
        |   CASE WHEN CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 1)) AS INT) % 2 = 1
        |        THEN 1.0 ELSE -1.0 END) AS plane
        | FROM range(0, 16) t(j)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |bits AS (SELECT e.vec_id, p.j,
        |          CASE WHEN list_dot_product(e.v, p.plane) > 0 THEN 1 ELSE 0 END AS bit
        |        FROM e CROSS JOIN planes p),""".stripMargin + "\n" +
        annTruthCtes + ",\n" +
        lshTier(2) + ",\n" + lshTier(4) + "\n" +
        tierSelect(2) + "\nUNION ALL\n" + tierSelect(4) +
        "\nORDER BY tier, q_id"
    },

    // q146: the mixture-interleaved training order replayed position-
    // for-position — md5 within-source shuffle (the q72 idiom), dyadic
    // stride keys (float-EXACT: half-integer rank × half-integer stride
    // never rounds), global merge with the (key, source, id) tiebreak.
    // The stride CASE is interpolated from the SAME Scala constant the
    // query uses (the q104/q121 shared-constant convention).
    "q146_mixture_order" -> {
      val strideCase = Sharding.mixtureStrides.toSeq.sortBy(_._1)
        .map { case (s, m) => f"WHEN '$s' THEN $m%.1f" }.mkString(" ")
      s"""WITH u AS (
         |  SELECT doc_id, source,
         |   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':11'), 1, 13)) AS BIGINT)
         |     / 4503599627370496.0 AS draw
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source,
         |   CAST(row_number() OVER (PARTITION BY source ORDER BY draw, doc_id) AS BIGINT)
         |     AS src_rank
         |  FROM u),
         |k AS (
         |  SELECT doc_id, source, src_rank,
         |   (src_rank - 0.5) * (CASE source $strideCase END) AS pos_key
         |  FROM r)
         |SELECT
         | CAST(row_number() OVER (ORDER BY pos_key, source, doc_id) AS BIGINT) - 1
         |   AS global_pos,
         | doc_id, source, src_rank
         |FROM k
         |ORDER BY global_pos""".stripMargin
    },

    // q74: the ENTIRE simhash pipeline — signature, banding, bucket cap,
    // hamming verification, verdict — recomputed from scratch in SQL.
    // Portable because the signature is the 60-bit md5-token-hash
    // variant (graft_simhash60_md5): both engines hash identical UTF-8
    // token bytes through md5, so the signatures (also in the output)
    // must match bit-for-bit, not just the verdicts. The bucket-size
    // gate (BETWEEN 2 AND 200) replicates bucketPairs' cap; the 4×15-bit
    // banding is pigeonhole-exact at hamming <= 3 on both sides.
    "q74_simhash_verdicts" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |th AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM toks),
        |bits AS (
        |  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM th, UNNEST(generate_series(0, 59)) AS u(b) GROUP BY 1, 2),
        |sig AS (
        |  SELECT doc_id,
        |   CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY 1),
        |banded AS (
        |  SELECT doc_id, simhash, b AS band, (simhash >> (b * 15)) & 32767 AS bh
        |  FROM sig, UNNEST(generate_series(0, 3)) AS u(b)),
        |bsz AS (SELECT band, bh, count(*) AS n FROM banded GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        |  JOIN bsz z ON z.band = a.band AND z.bh = a.bh
        |  WHERE z.n BETWEEN 2 AND 200),
        |pairs AS (
        |  SELECT c.id_a, c.id_b
        |  FROM cand c JOIN sig sa ON sa.doc_id = c.id_a JOIN sig sb ON sb.doc_id = c.id_b
        |  WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3),
        |nb AS (SELECT id_a AS doc_id, id_b AS nb FROM pairs
        |       UNION ALL SELECT id_b, id_a FROM pairs),
        |rep AS (SELECT doc_id, min(nb) AS min_nb FROM nb GROUP BY 1)
        |SELECT s.doc_id, s.simhash,
        | least(s.doc_id, coalesce(r.min_nb, s.doc_id)) AS rep_id,
        | least(s.doc_id, coalesce(r.min_nb, s.doc_id)) < s.doc_id AS is_dup
        |FROM sig s LEFT JOIN rep r USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin,

    "q71_neardup_verdicts" ->
      s"""WITH $jaccardCtes,
         |inter AS (
         | SELECT a.doc_id AS batch_id, b.doc_id AS corpus_id, count(*) AS ix
         | FROM grams a JOIN grams b ON a.g = b.g
         | WHERE a.doc_id % 5 = 4 AND b.doc_id % 5 <> 4
         | GROUP BY 1, 2),
         |pairs AS (
         | SELECT batch_id, corpus_id FROM inter
         | JOIN sizes sa ON sa.doc_id = batch_id JOIN sizes sb ON sb.doc_id = corpus_id
         | WHERE ix * 1.0 / (sa.n + sb.n - ix) >= 0.5),
         |agg AS (SELECT batch_id AS doc_id, min(corpus_id) AS dup_of FROM pairs GROUP BY 1)
         |SELECT d.doc_id, a.dup_of IS NOT NULL AS is_dup,
         | CAST(coalesce(a.dup_of, -1) AS BIGINT) AS dup_of
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |WHERE d.doc_id % 5 = 4
         |ORDER BY d.doc_id""".stripMargin,

    "q24_embedding_neardup" ->
      """SELECT label, id_a, id_b, cos FROM (
        | SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |   / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |      * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),4) AS cos
        | FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id)
        |WHERE cos >= 0.25 ORDER BY id_a, id_b""".stripMargin,

    // q39 (large-star/small-star) and q42 (auto: propagation with a
    // star-contraction fallback) run against the SAME transitive-closure
    // ground truth as q37's label propagation — three algorithms, one
    // oracle
    "q39_dup_clusters_logn" -> dupClustersOracle,
    "q42_dup_clusters_auto" -> dupClustersOracle,
    "q37_dup_clusters" -> dupClustersOracle,

    // the dedup-curation composite: q37's recursive-CTE clusters +
    // q28's shared quality CTEs + a window argmax (score desc, id asc
    // over the ROUNDED score — both engines elect identically)
    "q69_canonical_docs" ->
      s"""WITH RECURSIVE $clusterCtes,
         |clusters AS (SELECT id, CAST(min(r) AS BIGINT) AS cluster_id
         |             FROM reach GROUP BY id),
         |$qualityCtes,
         |j AS (SELECT c.id, c.cluster_id, s.quality_score
         |      FROM clusters c JOIN scored s ON s.doc_id = c.id),
         |w AS (SELECT *, first_value(id) OVER (
         |        PARTITION BY cluster_id ORDER BY quality_score DESC, id ASC
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS canonical_id
         |      FROM j)
         |SELECT id, cluster_id, quality_score, canonical_id,
         | id = canonical_id AS is_canonical
         |FROM w ORDER BY id""".stripMargin,

    "q25_ann_bruteforce" ->
      """WITH scored AS (
        | SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |  round(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
        |   / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
        |      * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))),4) AS cos
        | FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
        |ranked AS (
        | SELECT q_id, c_id, cos,
        |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rn
        | FROM scored)
        |SELECT q_id, rn AS rank, c_id, cos FROM ranked WHERE rn <= 10 ORDER BY q_id, rank""".stripMargin,

    // q78: the LSH ANN pipeline on the md5-sign plane family — the
    // oracle REGENERATES the ±1 planes from the shared md5("j:d")
    // formula (low bit of the first hex nibble), so signatures,
    // banding, bucket join, candidate dedup, exact-cosine rerank and
    // tie-break are all hash-checked. Sign parity is exact: both
    // engines fold the dot product in index order over identical
    // doubles. q26 differs only in the plane constants (LCG family).
    "q78_ann_lsh_portable" ->
      """WITH planes AS (
        | SELECT j, list_transform(range(0, 64), d ->
        |   CASE WHEN CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 1)) AS INT) % 2 = 1
        |        THEN 1.0 ELSE -1.0 END) AS plane
        | FROM range(0, 16) t(j)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |bits AS (SELECT e.vec_id, p.j,
        |          CASE WHEN list_dot_product(e.v, p.plane) > 0 THEN 1 ELSE 0 END AS bit
        |        FROM e CROSS JOIN planes p),
        |bands AS (SELECT vec_id, j // 4 AS band,
        |           string_agg(CAST(bit AS VARCHAR), '' ORDER BY j) AS bh
        |         FROM bits GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
        |        FROM bands q JOIN bands c ON q.band = c.band AND q.bh = c.bh
        |        WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
        |scored AS (SELECT cand.q_id, cand.c_id,
        |           round(list_dot_product(qe.v, ce.v) /
        |             (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 4) AS cos
        |          FROM cand JOIN e qe ON qe.vec_id = cand.q_id JOIN e ce ON ce.vec_id = cand.c_id),
        |ranked AS (SELECT q_id, c_id, cos,
        |           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rn FROM scored)
        |SELECT q_id, rn AS rank, c_id, cos FROM ranked WHERE rn <= 10 ORDER BY q_id, rank""".stripMargin,

    // q169: the JL projection replayed — planes from the shared md5
    // formula, index-order dot fold, the float-exact 0.25 scale
    "q169_jl_projection" ->
      """WITH planes AS (
        | SELECT j, list_transform(range(0, 64), d ->
        |   CASE WHEN CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 1)) AS INT) % 2 = 1
        |        THEN 1.0 ELSE -1.0 END) AS plane
        | FROM range(0, 16) t(j)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT e.vec_id, CAST(p.j AS BIGINT) AS j,
        |       round(list_dot_product(e.v, p.plane) * 0.25, 4) AS p
        |FROM e CROSS JOIN planes p
        |ORDER BY vec_id, j""".stripMargin,

    // q79: the IVF ANN search path on formula-chosen centroids (the
    // first 16 corpus vectors). KMeans training is the only part of
    // q36 an oracle can't reproduce; everything else — the day-2
    // assignment rule (argmin |c|² − 2·v·c, tie → lower cell), nProbe
    // cell probing, candidate generation by cell equi-join, exact
    // cosine rerank and tie-break — is deterministic arithmetic both
    // engines fold in index order, so the whole search pipeline
    // hash-checks.
    "q79_ann_ivf_portable" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT CAST(vec_id AS INT) AS cell, v AS cvec, list_dot_product(v, v) AS c2
        |      FROM e WHERE vec_id < 16),
        |asg AS (SELECT vec_id, cell FROM (
        |         SELECT e.vec_id, c.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY c.c2 - 2.0 * list_dot_product(e.v, c.cvec) ASC, c.cell ASC) AS rn
        |         FROM e CROSS JOIN c) WHERE rn = 1),
        |probes AS (SELECT q_id, cell FROM (
        |            SELECT e.vec_id AS q_id, c.cell,
        |              row_number() OVER (PARTITION BY e.vec_id
        |                ORDER BY c.c2 - 2.0 * list_dot_product(e.v, c.cvec) ASC, c.cell ASC) AS rn
        |            FROM e CROSS JOIN c WHERE e.vec_id < 5) WHERE rn <= 4),
        |cand AS (SELECT p.q_id, a.vec_id AS c_id
        |        FROM probes p JOIN asg a ON a.cell = p.cell WHERE a.vec_id <> p.q_id),
        |scored AS (SELECT cand.q_id, cand.c_id,
        |           round(list_dot_product(qe.v, ce.v) /
        |             (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 4) AS cos
        |          FROM cand JOIN e qe ON qe.vec_id = cand.q_id JOIN e ce ON ce.vec_id = cand.c_id),
        |ranked AS (SELECT q_id, c_id, cos,
        |           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rn FROM scored)
        |SELECT q_id, rn AS rank, c_id, cos FROM ranked WHERE rn <= 10 ORDER BY q_id, rank""".stripMargin,

    // q80: the PQ ANN search path on formula-chosen codebooks (subspace
    // s's entry k = the s-th sub-vector of corpus vector k, k < 16).
    // KMeans codebook training is the only part of q47 an oracle can't
    // reproduce; the production encode rule (per-subspace argmin
    // squared-L2 against the frozen codebook, tie → lowest code), the
    // per-query flat ADC table, the code-only candidate scan with its
    // top-50 adist cut, and the exact-cosine rerank are deterministic
    // arithmetic both engines fold in index order (sub-vector squared
    // diffs left-to-right; candidate adist summed in subspace order via
    // the ordered list), so the whole search pipeline hash-checks.
    "q80_ann_pq_portable" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cb AS (SELECT s.s AS subspace, CAST(c.vec_id AS INT) AS code,
        |         c.v[s.s*8+1 : s.s*8+8] AS centroid
        |       FROM e c CROSS JOIN range(0, 8) s(s) WHERE c.vec_id < 16),
        |d AS (SELECT e.vec_id, cb.subspace, cb.code,
        |        list_sum(list_transform(range(1, 9), i ->
        |          (e.v[cb.subspace*8 + i] - cb.centroid[i])
        |          * (e.v[cb.subspace*8 + i] - cb.centroid[i]))) AS dist
        |      FROM e CROSS JOIN cb),
        |codes AS (SELECT vec_id, subspace, code FROM (
        |           SELECT vec_id, subspace, code,
        |             row_number() OVER (PARTITION BY vec_id, subspace
        |               ORDER BY dist ASC, code ASC) AS rn
        |           FROM d) WHERE rn = 1),
        |adist AS (SELECT qd.vec_id AS q_id, co.vec_id AS c_id,
        |            list_sum(list(qd.dist ORDER BY qd.subspace)) AS ad
        |          FROM codes co JOIN d qd
        |            ON qd.subspace = co.subspace AND qd.code = co.code
        |          WHERE qd.vec_id < 5 AND co.vec_id <> qd.vec_id
        |          GROUP BY 1, 2),
        |cand AS (SELECT q_id, c_id FROM (
        |          SELECT q_id, c_id,
        |            row_number() OVER (PARTITION BY q_id ORDER BY ad ASC, c_id ASC) AS ar
        |          FROM adist) WHERE ar <= 50),
        |scored AS (SELECT cand.q_id, cand.c_id,
        |           round(list_dot_product(qe.v, ce.v) /
        |             (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 4) AS cos
        |          FROM cand JOIN e qe ON qe.vec_id = cand.q_id JOIN e ce ON ce.vec_id = cand.c_id),
        |ranked AS (SELECT q_id, c_id, cos,
        |           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rn FROM scored)
        |SELECT q_id, rn AS rank, c_id, cos FROM ranked WHERE rn <= 10 ORDER BY q_id, rank""".stripMargin,

    // q81: the composed residual-IVFADC search path on formula-chosen
    // artifacts — q79's first-16-vector centroids plus a residual
    // codebook whose entry (s, k) is vector (16+k)'s residual
    // sub-vector (the anchors' own residuals are identically zero, so
    // the next sixteen vectors provide the entries). Cell assignment,
    // residual arithmetic, frozen-codebook encode, per-(query, cell)
    // residual ADC tables, the cell-pruned top-50 cut and the exact
    // rerank are all deterministic index-order arithmetic, so the
    // entire composed pipeline hash-checks; with q79/q80 only KMeans
    // training itself remains oracle-free.
    "q81_ann_ivfpq_portable" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT CAST(vec_id AS INT) AS cell, v AS cvec, list_dot_product(v, v) AS c2
        |      FROM e WHERE vec_id < 16),
        |asg AS (SELECT vec_id, cell FROM (
        |         SELECT e.vec_id, c.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY c.c2 - 2.0 * list_dot_product(e.v, c.cvec) ASC, c.cell ASC) AS rn
        |         FROM e CROSS JOIN c) WHERE rn = 1),
        |res AS (SELECT a.vec_id, a.cell,
        |          list_transform(range(1, 65), i -> e.v[i] - c.cvec[i]) AS r
        |        FROM asg a JOIN e ON e.vec_id = a.vec_id JOIN c ON c.cell = a.cell),
        |cb AS (SELECT s.s AS subspace, CAST(r.vec_id - 16 AS INT) AS code,
        |         r.r[s.s*8+1 : s.s*8+8] AS centroid
        |       FROM res r CROSS JOIN range(0, 8) s(s) WHERE r.vec_id BETWEEN 16 AND 31),
        |d AS (SELECT r.vec_id, r.cell, cb.subspace, cb.code,
        |        list_sum(list_transform(range(1, 9), i ->
        |          (r.r[cb.subspace*8 + i] - cb.centroid[i])
        |          * (r.r[cb.subspace*8 + i] - cb.centroid[i]))) AS dist
        |      FROM res r CROSS JOIN cb),
        |codes AS (SELECT vec_id, cell, subspace, code FROM (
        |           SELECT vec_id, cell, subspace, code,
        |             row_number() OVER (PARTITION BY vec_id, subspace
        |               ORDER BY dist ASC, code ASC) AS rn
        |           FROM d) WHERE rn = 1),
        |probes AS (SELECT q_id, cell FROM (
        |            SELECT e.vec_id AS q_id, c.cell,
        |              row_number() OVER (PARTITION BY e.vec_id
        |                ORDER BY c.c2 - 2.0 * list_dot_product(e.v, c.cvec) ASC, c.cell ASC) AS rn
        |            FROM e CROSS JOIN c WHERE e.vec_id < 5) WHERE rn <= 4),
        |qres AS (SELECT p.q_id, p.cell,
        |           list_transform(range(1, 65), i -> e.v[i] - c.cvec[i]) AS qr
        |         FROM probes p JOIN e ON e.vec_id = p.q_id JOIN c ON c.cell = p.cell),
        |qd AS (SELECT q.q_id, q.cell, cb.subspace, cb.code,
        |         list_sum(list_transform(range(1, 9), i ->
        |           (q.qr[cb.subspace*8 + i] - cb.centroid[i])
        |           * (q.qr[cb.subspace*8 + i] - cb.centroid[i]))) AS dist
        |       FROM qres q CROSS JOIN cb),
        |adist AS (SELECT qd.q_id, co.vec_id AS c_id,
        |            list_sum(list(qd.dist ORDER BY qd.subspace)) AS ad
        |          FROM codes co JOIN qd ON qd.cell = co.cell
        |            AND qd.subspace = co.subspace AND qd.code = co.code
        |          WHERE co.vec_id <> qd.q_id
        |          GROUP BY 1, 2),
        |cand AS (SELECT q_id, c_id FROM (
        |          SELECT q_id, c_id,
        |            row_number() OVER (PARTITION BY q_id ORDER BY ad ASC, c_id ASC) AS ar
        |          FROM adist) WHERE ar <= 50),
        |scored AS (SELECT cand.q_id, cand.c_id,
        |           round(list_dot_product(qe.v, ce.v) /
        |             (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 4) AS cos
        |          FROM cand JOIN e qe ON qe.vec_id = cand.q_id JOIN e ce ON ce.vec_id = cand.c_id),
        |ranked AS (SELECT q_id, c_id, cos,
        |           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rn FROM scored)
        |SELECT q_id, rn AS rank, c_id, cos FROM ranked WHERE rn <= 10 ORDER BY q_id, rank""".stripMargin,

    // q141: the composed IMI+ADC search from scratch — q139's per-half
    // argmin + product-cell arithmetic (formula sub-quantizers: first
    // 4 vectors' halves) feeding q81's residual-codebook ADC machinery
    // (codebook entries = vectors 16..31's residuals against their
    // PRODUCT-cell centroid, the two half-centroids concatenated);
    // per-half top-2 probes give 4 probed product cells per query
    "q141_ann_imipq_portable" ->
      (imiCellCtes + ",\n" + imiPqAdcCtes + ",\n" +
      """cand AS (SELECT q_id, c_id FROM (
        |          SELECT q_id, c_id,
        |            row_number() OVER (PARTITION BY q_id ORDER BY ad ASC, c_id ASC) AS ar
        |          FROM adist) WHERE ar <= 50),
        |scored AS (SELECT cand.q_id, cand.c_id,
        |           round(list_dot_product(qe.v, ce.v) /
        |             (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 4) AS cos
        |          FROM cand JOIN e qe ON qe.vec_id = cand.q_id JOIN e ce ON ce.vec_id = cand.c_id),
        |ranked AS (SELECT q_id, c_id, cos,
        |           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rn FROM scored)
        |SELECT q_id, rn AS rank, c_id, cos FROM ranked WHERE rn <= 10 ORDER BY q_id, rank""".stripMargin),

    // q140: the TRAINED composed system replayed from its persisted
    // artifacts (round 16) — assignment, residuals, corpus encode,
    // probes, ADC and rerank all from the parquet bytes the registered
    // query wrote; only the KMeans fits stay outside the boundary
    "q140_ann_imipq" ->
      (trainedImiPqCtes + ",\n" +
      """cand AS (SELECT q_id, c_id FROM (
        |          SELECT q_id, c_id,
        |            row_number() OVER (PARTITION BY q_id ORDER BY ad ASC, c_id ASC) AS ar
        |          FROM adist) WHERE ar <= 50),
        |scored AS (SELECT cand.q_id, cand.c_id,
        |           round(list_dot_product(qe.v, ce.v) /
        |             (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 4) AS cos
        |          FROM cand JOIN e qe ON qe.vec_id = cand.q_id JOIN e ce ON ce.vec_id = cand.c_id),
        |ranked AS (SELECT q_id, c_id, cos,
        |           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rn FROM scored)
        |SELECT q_id, rn AS rank, c_id, cos FROM ranked WHERE rn <= 10 ORDER BY q_id, rank""".stripMargin),

    // q175: the TRAINED tier's recall meter from the same artifacts —
    // the q164 cut shape (rerank 10 vs 50) against the brute truth, so
    // the production operating point is the one the meter certifies
    "q175_ann_trained_recall" -> {
      def cutTier(r: Int): String =
        s"""candr$r AS (SELECT q_id, c_id FROM (
           |  SELECT q_id, c_id,
           |    row_number() OVER (PARTITION BY q_id ORDER BY ad ASC, c_id ASC) AS ar
           |  FROM adist) WHERE ar <= $r),
           |scored$r AS (SELECT candr$r.q_id, candr$r.c_id,
           |    round(list_dot_product(qe.v, ce.v) /
           |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 4) AS cos
           |  FROM candr$r JOIN e qe ON qe.vec_id = candr$r.q_id
           |  JOIN e ce ON ce.vec_id = candr$r.c_id),
           |appr$r AS (SELECT q_id, c_id FROM (
           |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
           |    ORDER BY cos DESC, c_id ASC) AS rn FROM scored$r) WHERE rn <= 10),
           |hits$r AS (SELECT t.q_id, CAST(count(*) AS BIGINT) AS n
           |  FROM truth t JOIN appr$r a ON a.q_id = t.q_id AND a.c_id = t.c_id
           |  GROUP BY 1)""".stripMargin
      def tierSelect(r: Int): String =
        s"""SELECT 'trained_r${f"$r%02d"}' AS tier, q.q_id, CAST(10 AS BIGINT) AS k,
           |  coalesce(h.n, 0) AS n_hits,
           |  CAST((coalesce(h.n, 0) * 10000) // 10 AS BIGINT) AS recall_bp
           |FROM (SELECT DISTINCT q_id FROM truth) q
           |LEFT JOIN hits$r h ON h.q_id = q.q_id""".stripMargin
      trainedImiPqCtes + ",\n" + annTruthCtes + ",\n" +
        cutTier(10) + ",\n" + cutTier(50) + "\n" +
        tierSelect(10) + "\nUNION ALL\n" + tierSelect(50) +
        "\nORDER BY tier, q_id"
    },

    // q134: the PRODUCTION-quantizer SemDeDup replayed from its
    // persisted trained centroid artifact (round 16) — the q95 embed
    // chain, artifact-keyed assignment argmin, within-cell pairing and
    // min-id verdict; only the KMeans fit stays outside the boundary
    "q134_text_semdedup_trained" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |dk AS (SELECT CAST(sum(length(text)) + count(*) AS BIGINT) AS k FROM documents),
        |th AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM toks),
        |comp AS (SELECT doc_id, j,
        |    CAST(sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS DOUBLE) AS cmp
        |  FROM th CROSS JOIN generate_series(0, 59) AS dims(j)
        |  GROUP BY doc_id, j),
        |e AS (SELECT doc_id AS vec_id, list(cmp ORDER BY j) AS v
        |      FROM comp GROUP BY doc_id),
        |c AS (SELECT CAST(cell AS INT) AS cell, CAST(cvec AS DOUBLE[]) AS cvec,
        |        CAST(c2 AS DOUBLE) AS c2
        |      FROM read_parquet('/tmp/graft_trained/semdedup/centroids/*/*.parquet',
        |                        hive_partitioning = true)
        |      WHERE CAST(k AS BIGINT) = (SELECT k FROM dk)),
        |asg AS (SELECT vec_id, cell FROM (
        |         SELECT e.vec_id, c.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY c.c2 - 2.0 * list_dot_product(e.v, c.cvec) ASC,
        |                      c.cell ASC) AS rn
        |         FROM e CROSS JOIN c) WHERE rn = 1),
        |m AS (SELECT a.vec_id, a.cell, e.v,
        |        sqrt(list_dot_product(e.v, e.v)) AS nrm
        |      FROM asg a JOIN e ON e.vec_id = a.vec_id),
        |dups AS (SELECT id_b AS vec_id, min(id_a) AS dup_of FROM (
        |          SELECT x.vec_id AS id_a, y.vec_id AS id_b,
        |            round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 4) AS cos
        |          FROM m x JOIN m y ON x.cell = y.cell AND x.vec_id < y.vec_id)
        |         WHERE cos >= 0.92 GROUP BY 1)
        |SELECT m.vec_id, m.cell, d.vec_id IS NOT NULL AS is_dup, d.dup_of
        |FROM m LEFT JOIN dups d ON d.vec_id = m.vec_id
        |ORDER BY m.vec_id""".stripMargin,

    // q138: the TWO-LEVEL SemDeDup replayed from its persisted trained
    // half sub-quantizers (round 17 — q134's convention verbatim, one
    // level up): the q95 embed chain, per-half artifact-keyed
    // assignment argmins, the product cell cc1·k2+cc2 with k2 read off
    // the artifact itself, within-cell pairing and min-id verdict;
    // only the two KMeans fits stay outside the boundary
    "q138_text_semdedup_imi" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |dk AS (SELECT CAST(sum(length(text)) + count(*) AS BIGINT) AS k FROM documents),
        |th AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM toks),
        |comp AS (SELECT doc_id, j,
        |    CAST(sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS DOUBLE) AS cmp
        |  FROM th CROSS JOIN generate_series(0, 59) AS dims(j)
        |  GROUP BY doc_id, j),
        |e AS (SELECT doc_id AS vec_id, list(cmp ORDER BY j) AS v
        |      FROM comp GROUP BY doc_id),
        |c1 AS (SELECT CAST(cell AS INT) AS cell, CAST(cvec AS DOUBLE[]) AS cvec,
        |        CAST(c2 AS DOUBLE) AS c2
        |      FROM read_parquet('/tmp/graft_trained/semdedup_imi/cent1/*/*.parquet',
        |                        hive_partitioning = true)
        |      WHERE CAST(k AS BIGINT) = (SELECT k FROM dk)),
        |c2t AS (SELECT CAST(cell AS INT) AS cell, CAST(cvec AS DOUBLE[]) AS cvec,
        |        CAST(c2 AS DOUBLE) AS c2
        |      FROM read_parquet('/tmp/graft_trained/semdedup_imi/cent2/*/*.parquet',
        |                        hive_partitioning = true)
        |      WHERE CAST(k AS BIGINT) = (SELECT k FROM dk)),
        |k2v AS (SELECT CAST(count(*) AS INT) AS k2 FROM c2t),
        |a1 AS (SELECT vec_id, cell AS cc1 FROM (
        |        SELECT e.vec_id, c1.cell,
        |          row_number() OVER (PARTITION BY e.vec_id
        |            ORDER BY c1.c2 - 2.0 * list_dot_product(e.v[1:30], c1.cvec) ASC,
        |                     c1.cell ASC) AS rn
        |        FROM e CROSS JOIN c1) WHERE rn = 1),
        |a2 AS (SELECT vec_id, cell AS cc2 FROM (
        |        SELECT e.vec_id, c2t.cell,
        |          row_number() OVER (PARTITION BY e.vec_id
        |            ORDER BY c2t.c2 - 2.0 * list_dot_product(e.v[31:60], c2t.cvec) ASC,
        |                     c2t.cell ASC) AS rn
        |        FROM e CROSS JOIN c2t) WHERE rn = 1),
        |asg AS (SELECT a1.vec_id,
        |         a1.cc1 * (SELECT k2 FROM k2v) + a2.cc2 AS cell
        |        FROM a1 JOIN a2 USING (vec_id)),
        |m AS (SELECT a.vec_id, a.cell, e.v,
        |        sqrt(list_dot_product(e.v, e.v)) AS nrm
        |      FROM asg a JOIN e ON e.vec_id = a.vec_id),
        |dups AS (SELECT id_b AS vec_id, min(id_a) AS dup_of FROM (
        |          SELECT x.vec_id AS id_a, y.vec_id AS id_b,
        |            round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 4) AS cos
        |          FROM m x JOIN m y ON x.cell = y.cell AND x.vec_id < y.vec_id)
        |         WHERE cos >= 0.92 GROUP BY 1)
        |SELECT m.vec_id, m.cell, d.vec_id IS NOT NULL AS is_dup, d.dup_of
        |FROM m LEFT JOIN dups d ON d.vec_id = m.vec_id
        |ORDER BY m.vec_id""".stripMargin,

    // q163: the TWO-LEVEL tier's recall meter — the q141 cell CTEs
    // (formula per-half sub-quantizers + production assignment), the
    // per-half probe at widths 1 and 2, nProbe² product cells per
    // query, exact-cosine rerank, then the q161 intersection counts
    "q163_ann_imi_recall" -> {
      def imiTier(np: Int): String =
        s"""pr1n$np AS (SELECT q_id, cell AS cc1 FROM (
           |  SELECT h.vec_id AS q_id, c1.cell,
           |    row_number() OVER (PARTITION BY h.vec_id
           |      ORDER BY c1.cc - 2.0 * list_dot_product(h.v1, c1.cvec) ASC,
           |               c1.cell ASC) AS rn
           |  FROM h CROSS JOIN c1 WHERE h.vec_id < 5) WHERE rn <= $np),
           |pr2n$np AS (SELECT q_id, cell AS cc2 FROM (
           |  SELECT h.vec_id AS q_id, c2t.cell,
           |    row_number() OVER (PARTITION BY h.vec_id
           |      ORDER BY c2t.cc - 2.0 * list_dot_product(h.v2, c2t.cvec) ASC,
           |               c2t.cell ASC) AS rn
           |  FROM h CROSS JOIN c2t WHERE h.vec_id < 5) WHERE rn <= $np),
           |cand$np AS (SELECT p.q_id, a.vec_id AS c_id
           |  FROM (SELECT pr1n$np.q_id, pr1n$np.cc1 * 4 + pr2n$np.cc2 AS cell
           |        FROM pr1n$np JOIN pr2n$np USING (q_id)) p
           |  JOIN asg a ON a.cell = p.cell WHERE a.vec_id <> p.q_id),
           |scored$np AS (SELECT cand$np.q_id, cand$np.c_id,
           |    round(list_dot_product(qe.v, ce.v) /
           |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 4) AS cos
           |  FROM cand$np JOIN e qe ON qe.vec_id = cand$np.q_id
           |  JOIN e ce ON ce.vec_id = cand$np.c_id),
           |appr$np AS (SELECT q_id, c_id FROM (
           |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
           |    ORDER BY cos DESC, c_id ASC) AS rn FROM scored$np) WHERE rn <= 10),
           |hits$np AS (SELECT t.q_id, CAST(count(*) AS BIGINT) AS n
           |  FROM truth t JOIN appr$np a ON a.q_id = t.q_id AND a.c_id = t.c_id
           |  GROUP BY 1)""".stripMargin
      def tierSelect(np: Int): String =
        s"""SELECT 'imi_np$np' AS tier, q.q_id, CAST(10 AS BIGINT) AS k,
           |  coalesce(h.n, 0) AS n_hits,
           |  CAST((coalesce(h.n, 0) * 10000) // 10 AS BIGINT) AS recall_bp
           |FROM (SELECT DISTINCT q_id FROM truth) q
           |LEFT JOIN hits$np h ON h.q_id = q.q_id""".stripMargin
      imiCellCtes + ",\n" + annTruthCtes + ",\n" +
        imiTier(1) + ",\n" + imiTier(2) + "\n" +
        tierSelect(1) + "\nUNION ALL\n" + tierSelect(2) +
        "\nORDER BY tier, q_id"
    },

    // q164: the composed IMI+ADC tier's recall meter — the full q141
    // chain (cells, residual codebook, codes, per-half top-2 probes,
    // per-probe ADC) at rerank cuts 10 and 50, vs the brute truth
    "q164_ann_imipq_recall" -> {
      def cutTier(r: Int): String =
        s"""candr$r AS (SELECT q_id, c_id FROM (
           |  SELECT q_id, c_id,
           |    row_number() OVER (PARTITION BY q_id ORDER BY ad ASC, c_id ASC) AS ar
           |  FROM adist) WHERE ar <= $r),
           |scored$r AS (SELECT candr$r.q_id, candr$r.c_id,
           |    round(list_dot_product(qe.v, ce.v) /
           |      (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ce.v, ce.v))), 4) AS cos
           |  FROM candr$r JOIN e qe ON qe.vec_id = candr$r.q_id
           |  JOIN e ce ON ce.vec_id = candr$r.c_id),
           |appr$r AS (SELECT q_id, c_id FROM (
           |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
           |    ORDER BY cos DESC, c_id ASC) AS rn FROM scored$r) WHERE rn <= 10),
           |hits$r AS (SELECT t.q_id, CAST(count(*) AS BIGINT) AS n
           |  FROM truth t JOIN appr$r a ON a.q_id = t.q_id AND a.c_id = t.c_id
           |  GROUP BY 1)""".stripMargin
      def tierSelect(r: Int): String =
        s"""SELECT 'imipq_r${f"$r%02d"}' AS tier, q.q_id, CAST(10 AS BIGINT) AS k,
           |  coalesce(h.n, 0) AS n_hits,
           |  CAST((coalesce(h.n, 0) * 10000) // 10 AS BIGINT) AS recall_bp
           |FROM (SELECT DISTINCT q_id FROM truth) q
           |LEFT JOIN hits$r h ON h.q_id = q.q_id""".stripMargin
      imiCellCtes + ",\n" + imiPqAdcCtes + ",\n" + annTruthCtes + ",\n" +
        cutTier(10) + ",\n" + cutTier(50) + "\n" +
        tierSelect(10) + "\nUNION ALL\n" + tierSelect(50) +
        "\nORDER BY tier, q_id"
    },

    // q82: planted-coefficient certification of the dense-solve
    // forecast path. The oracle regenerates the noiseless truth from
    // the SAME closed-form formula with the same float expression
    // trees (ω constants folded identically, knot = 0.8*119.0,
    // left-associated sum) and pins recovered_ok TRUE — the Spark side
    // computes it as |yhat − y_true| < 1e-3, so solver drift at any of
    // the 402 points flips the flag and fails the hash. Coefficient
    // literals are cast to DOUBLE up front (DuckDB parses decimal
    // literals as DECIMAL; mixed-type arithmetic would diverge).
    "q82_forecast_planted" ->
      """WITH coefs0(grp, c0, c1, c2, a1, b1, a2, b2, rc) AS (VALUES
        |  ('a', 120.0, 0.8, -1.5, 10.0, 6.0, -4.0, 2.5, 5.0),
        |  ('b', 80.0, -0.4, 1.2, -7.0, 3.5, 2.0, -5.5, -3.0),
        |  ('c', 200.0, 1.6, -2.4, 4.0, -9.0, 6.5, 1.0, 8.0)),
        |coefs AS (SELECT grp, CAST(c0 AS DOUBLE) AS c0, CAST(c1 AS DOUBLE) AS c1,
        |            CAST(c2 AS DOUBLE) AS c2, CAST(a1 AS DOUBLE) AS a1,
        |            CAST(b1 AS DOUBLE) AS b1, CAST(a2 AS DOUBLE) AS a2,
        |            CAST(b2 AS DOUBLE) AS b2, CAST(rc AS DOUBLE) AS rc
        |          FROM coefs0),
        |spine AS (SELECT grp, c0, c1, c2, a1, b1, a2, b2, rc,
        |            CAST(xi AS DOUBLE) AS x,
        |            DATE '2025-01-01' + CAST(xi AS INT) AS ds,
        |            CAST(date_diff('day', DATE '1970-01-01',
        |              DATE '2025-01-01' + CAST(xi AS INT)) AS DOUBLE) AS t
        |          FROM coefs CROSS JOIN range(0, 134) r(xi))
        |SELECT grp, ds,
        |  round(c0 + c1*x + c2*greatest(0.0, x - 0.8*119.0)
        |    + a1*sin(t*(2*pi()/7)) + b1*cos(t*(2*pi()/7))
        |    + a2*sin(t*(2*pi()*2/7)) + b2*cos(t*(2*pi()*2/7))
        |    + rc*sin(t*(2*pi()/30.5)), 4) AS y_true,
        |  TRUE AS recovered_ok
        |FROM spine ORDER BY grp, ds""".stripMargin,

    // q83: q82's multiplicative twin — the planted truth exponentiates
    // the same closed-form tree (log-scale coefficients), certifying
    // the log-fit-space transform around the dense solve; tolerance is
    // RELATIVE 1e-4 on the Spark side since exp turns additive solve
    // error into relative output error.
    "q83_forecast_planted_mult" ->
      """WITH coefs0(grp, c0, c1, c2, a1, b1, a2, b2, rc) AS (VALUES
        |  ('a', 4.2, 0.010, -0.004, 0.12, 0.07, -0.05, 0.03, 0.08),
        |  ('b', 3.8, -0.006, 0.009, -0.09, 0.04, 0.02, -0.06, -0.05),
        |  ('c', 4.6, 0.016, -0.008, 0.05, -0.11, 0.07, 0.01, 0.10)),
        |coefs AS (SELECT grp, CAST(c0 AS DOUBLE) AS c0, CAST(c1 AS DOUBLE) AS c1,
        |            CAST(c2 AS DOUBLE) AS c2, CAST(a1 AS DOUBLE) AS a1,
        |            CAST(b1 AS DOUBLE) AS b1, CAST(a2 AS DOUBLE) AS a2,
        |            CAST(b2 AS DOUBLE) AS b2, CAST(rc AS DOUBLE) AS rc
        |          FROM coefs0),
        |spine AS (SELECT grp, c0, c1, c2, a1, b1, a2, b2, rc,
        |            CAST(xi AS DOUBLE) AS x,
        |            DATE '2025-01-01' + CAST(xi AS INT) AS ds,
        |            CAST(date_diff('day', DATE '1970-01-01',
        |              DATE '2025-01-01' + CAST(xi AS INT)) AS DOUBLE) AS t
        |          FROM coefs CROSS JOIN range(0, 134) r(xi))
        |SELECT grp, ds,
        |  round(exp(c0 + c1*x + c2*greatest(0.0, x - 0.8*119.0)
        |    + a1*sin(t*(2*pi()/7)) + b1*cos(t*(2*pi()/7))
        |    + a2*sin(t*(2*pi()*2/7)) + b2*cos(t*(2*pi()*2/7))
        |    + rc*sin(t*(2*pi()/30.5))), 4) AS y_true,
        |  TRUE AS recovered_ok
        |FROM spine ORDER BY grp, ds""".stripMargin,

    "q27_langid" ->
      s"""WITH toked AS (
         |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
         |scored AS (SELECT doc_id, $langScoreCols FROM toked)
         |SELECT doc_id, s_en, s_es, s_fr, s_de, s_zh, $langCase AS pred_lang
         |FROM scored ORDER BY doc_id""".stripMargin,

    "q28_quality_score" ->
      s"""WITH $qualityCtes
         |SELECT doc_id, n_chars, n_tokens, punct_ratio, stop_ratio, quality_score
         |FROM scored ORDER BY doc_id""".stripMargin,

    "q29_token_counts" ->
      """SELECT doc_id,
        | CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens,
        | round(CAST(length(text) AS DOUBLE)
        |   / greatest(CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT), 1), 4) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q30_fingerprint" ->
      """SELECT doc_id,
        | md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
        | substring(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 32) AS norm_prefix
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q32_doc_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | count(DISTINCT source) AS n_sources,
        | round(avg(n_chars) + 1e-9, 4) AS avg_chars,
        | round(quantile_cont(n_chars, 0.5) + 1e-9, 4) AS median_chars,
        | round(quantile_cont(n_chars, 0.9) + 1e-9, 4) AS p90_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q40_word_stats" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
        |b AS (SELECT doc_id, toks, len(toks) AS n,
        |  [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))] AS g2,
        |  [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] FOR i IN range(1, len(toks)-1)] AS g3
        | FROM t)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        | round(CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / greatest(n, 1) + 1e-9, 4) AS mean_word_len,
        | round(CASE WHEN n = 0 THEN 0.0 ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / n END + 1e-9, 4) AS dup_word_ratio,
        | round(CASE WHEN len(g2) = 0 THEN 0.0 ELSE 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) END + 1e-9, 4) AS dup_2gram_ratio,
        | round(CASE WHEN len(g3) = 0 THEN 0.0 ELSE 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) END + 1e-9, 4) AS dup_3gram_ratio
        |FROM b ORDER BY doc_id""".stripMargin,

    // DuckDB's native ASOF LEFT JOIN is the ground truth for the
    // union+window as-of composition; clicks pre-collapsed per
    // (user, ts) so the pick is unique on both engines
    "q41_asof_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |p AS (SELECT event_id, user_id, ts, round(value, 4) AS value FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS click_ts, max(event_id) AS click_id
        |      FROM e WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.ts, p.value, c.click_id, c.click_ts
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
        |ORDER BY p.event_id""".stripMargin,

    "q31_multimodal_meta" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | sha256(text) AS content_sha256,
        | CAST(64 + (doc_id % 16) * 32 AS BIGINT) AS width,
        | CAST(64 + (doc_id % 9) * 32 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,

    // unigram LM quality score: corpus token counts are exact integers
    // (< 2^53 — the double sum is order-independent, so both engines
    // compute the identical total); ppl is derived from the ROUNDED
    // avg_logprob on both sides so exp can't re-diverge the floats
    "q46_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok, CAST(count(*) AS DOUBLE) AS c FROM toks GROUP BY 1),
        |tot AS (SELECT sum(c) AS t FROM vocab),
        |scored AS (
        |  SELECT d.doc_id,
        |         CAST(count(*) AS BIGINT) AS n_tokens,
        |         round(avg(ln(v.c / (SELECT t FROM tot))), 4) AS avg_logprob
        |  FROM toks d JOIN vocab v USING (tok)
        |  GROUP BY d.doc_id)
        |SELECT doc_id, n_tokens, avg_logprob,
        |       round(exp(-avg_logprob), 4) AS ppl
        |FROM scored ORDER BY doc_id""".stripMargin,

    // token packing: per-shard running token totals and greedy chunk
    // assignment — pure ANSI window math, token counts via the q29
    // whitespace formula both engines already hash-match on
    "q45_token_packing" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |         CAST(doc_id % 8 AS INTEGER) AS shard
        |  FROM documents),
        |packed AS (
        |  SELECT doc_id, shard, n_tokens,
        |         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM toks)
        |SELECT doc_id, shard,
        |       CAST(floor(CAST(cum_tokens - n_tokens AS DOUBLE) / 2048) AS BIGINT) AS chunk,
        |       n_tokens, cum_tokens
        |FROM packed ORDER BY doc_id""".stripMargin,

    // PII redaction: the patterns interpolate from TextClean's constants
    // (one source of truth for both engines); the planted PII is built
    // from doc_id identically on both sides, so the hash check exercises
    // real detection + redaction, not zero counts over word-salad
    "q49_pii_redact" ->
      s"""WITH planted AS (
         |  SELECT doc_id,
         |         text || ' email user' || CAST(doc_id AS VARCHAR) || '@example.com'
         |              || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
         |              || ' phone 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-1234'
         |              || ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-45-6789' AS text
         |  FROM documents)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(text, '${TextClean.emailPattern}')) AS BIGINT) AS n_emails,
         |       CAST(len(regexp_extract_all(text, '${TextClean.ipv4Pattern}')) AS BIGINT) AS n_ips,
         |       CAST(len(regexp_extract_all(text, '${TextClean.phonePattern}')) AS BIGINT) AS n_phones,
         |       CAST(len(regexp_extract_all(text, '${TextClean.ssnPattern}')) AS BIGINT) AS n_ids,
         |       regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
         |         '${TextClean.emailPattern}', '[EMAIL]', 'g'),
         |         '${TextClean.ipv4Pattern}', '[IP]', 'g'),
         |         '${TextClean.phonePattern}', '[PHONE]', 'g'),
         |         '${TextClean.ssnPattern}', '[ID]', 'g') AS redacted
         |FROM planted ORDER BY doc_id""".stripMargin,

    // HTML strip: tags out first, entities unescaped in TextClean's
    // fixed order (&amp; last), whitespace collapsed — all replicated
    // verbatim so entity-bracketed content survives on both sides
    "q50_html_strip" ->
      s"""WITH planted AS (
         |  SELECT doc_id,
         |         '<div class="doc"><p id=''d''>' || text
         |           || '</p> <a href="http://ex.com/?a=1&amp;b=2">link</a>&nbsp;&lt;end&gt;</div>' AS text
         |  FROM documents),
         |stripped AS (
         |  SELECT doc_id,
         |         CAST(len(regexp_extract_all(text, '${TextClean.tagPattern}')) AS BIGINT) AS n_tags,
         |         replace(replace(replace(replace(replace(replace(
         |           regexp_replace(text, '${TextClean.tagPattern}', ' ', 'g'),
         |           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |           '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS un
         |  FROM planted)
         |SELECT doc_id, n_tags,
         |       trim(regexp_replace(un, '\\s+', ' ', 'g')) AS clean_text,
         |       CAST(length(trim(regexp_replace(un, '\\s+', ' ', 'g'))) AS BIGINT) AS clean_chars
         |FROM stripped ORDER BY doc_id""".stripMargin,

    // sliding-window chunking: chunk starts via generate_series (the
    // Spark side uses sequence+explode), chunk text via 1-based
    // inclusive list slicing — both engines share the q29/q45
    // whitespace-token convention, so text and spans hash-match
    "q51_doc_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |starts AS (
        |  SELECT doc_id, tk, n, unnest(generate_series(0, n - 1, 12)) AS s
        |  FROM toks)
        |SELECT doc_id,
        |       CAST(s // 12 AS BIGINT) AS chunk_idx,
        |       CAST(s AS BIGINT) AS tok_start,
        |       CAST(least(16, n - s) AS BIGINT) AS tok_len,
        |       array_to_string(tk[CAST(s + 1 AS BIGINT):CAST(s + least(16, n - s) AS BIGINT)], ' ') AS chunk_text
        |FROM starts ORDER BY doc_id, tok_start""".stripMargin,

    // TF-IDF per language: corpus df recovered from per-(lang, term)
    // distinct-doc counts by a window sum (a doc has exactly one lang);
    // ranking on the ROUNDED score (q46 ln-parity + q28 epsilon
    // conventions) with a term tiebreak keeps ordering engine-independent
    "q52_tfidf_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |per_lang AS (
        |  SELECT lang, term, CAST(count(*) AS BIGINT) AS tf,
        |         count(DISTINCT doc_id) AS dfl
        |  FROM toks GROUP BY 1, 2),
        |with_df AS (
        |  SELECT lang, term, tf,
        |         CAST(sum(dfl) OVER (PARTITION BY term) AS BIGINT) AS df
        |  FROM per_lang),
        |scored AS (
        |  SELECT lang, term, tf, df,
        |         round(tf * ln(CAST((SELECT n_docs FROM nd) AS DOUBLE) / df) + 1e-9, 4) AS score
        |  FROM with_df),
        |ranked AS (
        |  SELECT lang, term, tf, df, score,
        |         row_number() OVER (PARTITION BY lang ORDER BY score DESC, term ASC) AS rn
        |  FROM scored)
        |SELECT lang, rn AS rank, term, tf, df, score
        |FROM ranked WHERE rn <= 5 ORDER BY lang, rank""".stripMargin,

    // per-language quality-percentile gate: the shared quality CTEs +
    // percent_rank over a unique ordering — (rank-1)/(n-1) is exact
    // integer-derived math, identical in both engines, so the kept set
    // is deterministic
    "q53_quality_filter" ->
      s"""WITH $qualityCtes,
         |ranked AS (
         |  SELECT s.doc_id, d.lang, s.quality_score,
         |         percent_rank() OVER (PARTITION BY d.lang
         |           ORDER BY s.quality_score DESC, s.doc_id) AS pr
         |  FROM scored s JOIN documents d USING (doc_id))
         |SELECT doc_id, lang, quality_score, round(pr, 4) AS q_rank
         |FROM ranked WHERE pr <= 0.5 ORDER BY doc_id""".stripMargin,

    // stratified sampling: md5 of the decimal id string gives both
    // engines the identical draw order (lowercase hex compares
    // byte-equal), so the EXACT kept set hash-matches
    "q54_stratified_sample" ->
      """WITH hashed AS (
        |  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR) || ':7') AS h
        |  FROM documents),
        |ranked AS (
        |  SELECT lang, doc_id,
        |         CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS draw_rank
        |  FROM hashed)
        |SELECT lang, draw_rank, doc_id
        |FROM ranked WHERE draw_rank <= 20 ORDER BY lang, draw_rank""".stripMargin,

    // the corpus-mix / weighted-sample draws use the engine-portable
    // md5 unit (first 13 hex nibbles / 2^52 — 52 bits fit a double
    // exactly, the power-of-two division is exact), so the EXACT kept
    // sets hash-match across engines
    "q72_corpus_mix" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 13)) AS BIGINT)
        |     / 4503599627370496.0 AS draw
        |  FROM documents)
        |SELECT doc_id, source FROM u
        |WHERE draw < CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
        |                         WHEN 'src2' THEN 0.25 ELSE 0.1 END
        |ORDER BY doc_id""".stripMargin,

    // q118: temperature resampling — the skew slice, per-source counts,
    // 1e-6-quantized n^alpha terms summed as exact longs, the fixed-
    // order rate chain with the min(1,·) clamp, and the md5 draw all
    // re-derived; sqrt(= pow at alpha 0.5) is correctly-rounded IEEE
    "q118_temperature_sample" ->
      """WITH d AS (
        |  SELECT doc_id, source FROM documents
        |  WHERE CAST(floor(doc_id / 20.0) AS BIGINT) % 10 < (doc_id % 20) % 10 + 1),
        |c AS (SELECT source, CAST(count(*) AS BIGINT) AS ns FROM d GROUP BY 1),
        |t AS (SELECT source, ns,
        |        CAST(round(pow(CAST(ns AS DOUBLE), 0.5) * 1000000.0) AS BIGINT) AS ts
        |      FROM c),
        |z AS (SELECT CAST(sum(ts) AS BIGINT) AS z FROM t),
        |r AS (SELECT source,
        |        least(1.0, 200.0 * (CAST(ts AS DOUBLE) / CAST((SELECT z FROM z) AS DOUBLE))
        |                   / CAST(ns AS DOUBLE)) AS rate
        |      FROM t),
        |u AS (SELECT d.doc_id, d.source, r.rate,
        |        CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':13'), 1, 13)) AS BIGINT)
        |          / 4503599627370496.0 AS draw
        |      FROM d JOIN r USING (source))
        |SELECT doc_id, source FROM u WHERE draw < rate
        |ORDER BY doc_id""".stripMargin,

    // q132: the day-2 curation probe — block-crossing donor planting
    // (odd batch pages take the previous block member's text) under
    // the q115 site dressing, corpus-side census + blank-normalized
    // clean-text index (text-keyed where the operator keys md5 — the
    // C2e convention), batch strip + probe + gate replayed from raw
    // rows; the split is the q117 block rule
    "q132_curation_probe" -> (sitePagesOracleCtes(
      """src AS (
        |  SELECT d.doc_id, d.source,
        |    CASE WHEN (d.doc_id // 20) % 5 = 1 AND d.doc_id % 2 = 1
        |              AND o.text IS NOT NULL
        |         THEN o.text ELSE d.text END AS body
        |  FROM documents d LEFT JOIN documents o ON o.doc_id = d.doc_id - 20)""".stripMargin,
      " WHERE (doc_id // 20) % 5 <> 1") +
      """,
        |sel AS (SELECT l.doc_id, l.source,
        |          list_filter(l.ls, x -> NOT coalesce(list_contains(b.bls, x), false)) AS kept
        |        FROM l LEFT JOIN bp b USING (source)),
        |norm AS (SELECT doc_id, source, (doc_id // 20) % 5 = 1 AS is_batch,
        |           array_to_string(list_filter(kept, x -> trim(x) <> ''), chr(10)) AS t
        |         FROM sel),
        |idx AS (SELECT t, min(doc_id) AS keep_id FROM norm WHERE NOT is_batch GROUP BY 1),
        |v AS (SELECT n.doc_id, n.source, n.t,
        |        (i.keep_id IS NOT NULL AND i.keep_id <> n.doc_id) AS is_dup
        |      FROM norm n LEFT JOIN idx i USING (t) WHERE n.is_batch),
        |g AS (SELECT *,
        |        CASE WHEN trim(t) = '' THEN 0
        |             ELSE len(string_split_regex(trim(t), '\s+')) END AS w
        |      FROM v),
        |c AS (SELECT source AS domain, w,
        |        CASE WHEN is_dup THEN 'text_dup'
        |             WHEN w < 20 OR w > 200 THEN 'gate_failed'
        |             ELSE 'kept' END AS cat
        |      FROM g)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_pages,
        |       CAST(count(*) FILTER (cat = 'text_dup') AS BIGINT) AS n_text_dups,
        |       CAST(count(*) FILTER (cat = 'gate_failed') AS BIGINT) AS n_gate_failed,
        |       CAST(count(*) FILTER (cat = 'kept') AS BIGINT) AS n_kept,
        |       CAST(coalesce(sum(CASE WHEN cat = 'kept' THEN w END), 0) AS BIGINT) AS kept_words
        |FROM c GROUP BY 1 ORDER BY domain""".stripMargin),

    // q131: tokenizer parity — the q126 recursive-CTE encode feeding a
    // per-language fertility rollup (exact integers + two 4-dp ratios)
    "q131_tokenizer_parity" -> (bpeKernelOracleCtes("lang") +
      """,
        |e AS (
        |  SELECT w.lang, fin.p, CAST(length(w.w) AS BIGINT) AS c
        |  FROM w JOIN fin ON w.w = fin.w WHERE w.w <> '')
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(p) AS BIGINT) AS n_pieces,
        |       CAST(sum(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single_piece,
        |       round(CAST(sum(p) AS DOUBLE) / count(*), 4) AS fertility,
        |       round(CAST(sum(c) AS DOUBLE) / sum(p), 4) AS chars_per_piece
        |FROM e GROUP BY 1 ORDER BY lang""".stripMargin),

    // q130: packing budgeted in REAL subwords — the q126 recursive-CTE
    // encode supplies per-doc PIECE counts, and the q124 packing math
    // (shard route, running cum, chunk floor, exclusive-prefix
    // offsets, in-order member lists) runs on them in one derivation
    "q130_bpe_packing" -> (bpeKernelOracleCtes("doc_id") +
      """,
        |toks AS (
        |  SELECT w.doc_id, CAST(sum(fin.p) AS BIGINT) AS n_tokens,
        |         CAST(w.doc_id % 8 AS INTEGER) AS shard
        |  FROM w JOIN fin ON w.w = fin.w WHERE w.w <> ''
        |  GROUP BY w.doc_id),
        |packed AS (
        |  SELECT doc_id, shard, n_tokens,
        |         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM toks),
        |ch AS (SELECT *,
        |         CAST(floor(CAST(cum_tokens - n_tokens AS DOUBLE) / 4096) AS BIGINT) AS chunk
        |       FROM packed),
        |o AS (SELECT *,
        |        (cum_tokens - n_tokens)
        |        - min(cum_tokens - n_tokens) OVER (PARTITION BY shard, chunk) AS off
        |      FROM ch)
        |SELECT shard, chunk,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |       array_to_string(list(doc_id ORDER BY doc_id), ',') AS doc_ids,
        |       array_to_string(list(off ORDER BY doc_id), ',') AS offsets
        |FROM o GROUP BY 1, 2 ORDER BY shard, chunk""".stripMargin),

    // q142: q130's packing under the document-delimiter contract —
    // every doc costs its q126-CTE piece count PLUS 2 (BOS + EOS, the
    // reserved specials the kernel can neither produce nor split);
    // the +2 shift rides the identical packing derivation
    "q142_bpe_packed_special" -> (bpeKernelOracleCtes("doc_id") +
      """,
        |toks AS (
        |  SELECT w.doc_id, CAST(sum(fin.p) + 2 AS BIGINT) AS n_tokens,
        |         CAST(w.doc_id % 8 AS INTEGER) AS shard
        |  FROM w JOIN fin ON w.w = fin.w WHERE w.w <> ''
        |  GROUP BY w.doc_id),
        |packed AS (
        |  SELECT doc_id, shard, n_tokens,
        |         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM toks),
        |ch AS (SELECT *,
        |         CAST(floor(CAST(cum_tokens - n_tokens AS DOUBLE) / 4096) AS BIGINT) AS chunk
        |       FROM packed),
        |o AS (SELECT *,
        |        (cum_tokens - n_tokens)
        |        - min(cum_tokens - n_tokens) OVER (PARTITION BY shard, chunk) AS off
        |      FROM ch)
        |SELECT shard, chunk,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |       array_to_string(list(doc_id ORDER BY doc_id), ',') AS doc_ids,
        |       array_to_string(list(off ORDER BY doc_id), ',') AS offsets
        |FROM o GROUP BY 1, 2 ORDER BY shard, chunk""".stripMargin),

    // q126: the NATIVE BPE kernel at 1024 merges — 4× past the fold's
    // 256-merge expression cap. The oracle regenerates the same
    // formula-planted table (676 letter pairs + 348 end-of-word
    // attachments, ranks = the same lexicographic index math) and
    // replays the rank-order exhaustive fold as a recursive CTE — one
    // double-space replace per rank over the DISTINCT-word table, 1024
    // steps — then joins back to word instances and aggregates per doc.
    // The kernel runs the min-rank loop; the table invariants (each
    // multi-char side created earlier, outputs unique — validated
    // loudly at table build) make the two formulations exactly equal,
    // and this hash check certifies it on the full corpus.
    "q126_bpe_kernel" -> (bpeKernelOracleCtes("doc_id") +
      """,
        |e AS (
        |  SELECT w.doc_id, fin.p, CAST(length(w.w) AS BIGINT) AS c
        |  FROM w JOIN fin ON w.w = fin.w WHERE w.w <> '')
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(p) AS BIGINT) AS n_pieces,
        |       round(CAST(sum(c) AS DOUBLE) / sum(p), 4) AS chars_per_piece
        |FROM e GROUP BY 1 ORDER BY doc_id""".stripMargin),

    // q136: BYTE-LEVEL kernel encode — the oracle replays the a→ä/e→é
    // dressing, the byte map restricted to the dressed corpus's
    // alphabet (ASCII self-maps under the GPT-2 table; ä/é expand to
    // their interpolated UTF-8 byte pairs — the first rows of
    // Bpe.byteKernelMerges, so the two engines cannot disagree on the
    // planted pairs), and the 680-rank fold as a recursive CTE (the
    // q126 machinery over byte symbols)
    "q136_bpe_byte_kernel" -> {
      val byteRows = Bpe.byteKernelMerges.take(4).zipWithIndex
        .map { case ((l, r), i) => s"(CAST($i AS BIGINT), '$l', '$r')" }
        .mkString(", ")
      val nRanks = Bpe.byteKernelMerges.size
      s"""WITH RECURSIVE
         |letters AS (
         |  SELECT chr(97 + CAST(i AS INTEGER)) AS c, CAST(i AS BIGINT) AS i
         |  FROM range(26) t(i)),
         |m AS (
         |  SELECT * FROM (VALUES $byteRows) AS v(rank, l, r)
         |  UNION ALL
         |  SELECT 4 + x.i * 26 + y.i AS rank, x.c AS l, y.c AS r
         |  FROM letters x, letters y),
         |w AS (
         |  SELECT doc_id, unnest(string_split_regex(
         |    trim(lower(translate(lower(text), 'ae', 'äé'))), '\\s+')) AS w
         |  FROM documents),
         |wb AS (SELECT doc_id, replace(replace(w, 'ä', 'Ã¤'), 'é', 'Ã©') AS b
         |       FROM w WHERE w <> ''),
         |words AS (SELECT DISTINCT b FROM wb),
         |it AS (
         |  SELECT b, '  ' || regexp_replace(b, '(.)', '\\1  ', 'g') || '</w>  ' AS s,
         |         CAST(0 AS BIGINT) AS r
         |  FROM words
         |  UNION ALL
         |  SELECT it.b, replace(it.s, ' ' || m.l || '  ' || m.r || ' ',
         |                       ' ' || m.l || m.r || ' '), it.r + 1
         |  FROM it JOIN m ON m.rank = it.r),
         |fin AS (
         |  SELECT b, CAST(len(string_split_regex(trim(s), '\\s+')) AS BIGINT) AS p
         |  FROM it WHERE r = $nRanks),
         |e AS (SELECT wb.doc_id, fin.p, CAST(length(wb.b) AS BIGINT) AS c
         |      FROM wb JOIN fin ON wb.b = fin.b)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(p) AS BIGINT) AS n_pieces,
         |       round(CAST(sum(c) AS DOUBLE) / sum(p), 4) AS chars_per_piece
         |FROM e GROUP BY 1 ORDER BY doc_id""".stripMargin
    },

    // q143: the tokenizer ID SPACE from scratch — the q136 byte-mode
    // recursive-CTE fold produces the piece strings, and the id rule
    // replays as pure SQL: marker → 3, single-symbol piece → lookup in
    // the interpolated 256-entry bytes_to_unicode table (shared Scala
    // constants, the q104/q121 convention), multi-char piece → 260 +
    // its merge rank (outputs unique by the validator's invariant, so
    // the join is exact); every doc adds BOS(0) + EOS(1) — +2 pieces,
    // +1 to id_sum — so the reserved ids participate in the hash
    "q143_bpe_token_ids" -> {
      val byteRows = Bpe.byteKernelMerges.take(4).zipWithIndex
        .map { case ((l, r), i) => s"(CAST($i AS BIGINT), '$l', '$r')" }
        .mkString(", ")
      val nRanks = Bpe.byteKernelMerges.size
      val symRows = Bpe.byteSymbols.zipWithIndex
        .map { case (s, b) => s"(CAST($b AS BIGINT), '${s.replace("'", "''")}')" }
        .mkString(", ")
      s"""WITH RECURSIVE
         |letters AS (
         |  SELECT chr(97 + CAST(i AS INTEGER)) AS c, CAST(i AS BIGINT) AS i
         |  FROM range(26) t(i)),
         |m AS (
         |  SELECT * FROM (VALUES $byteRows) AS v(rank, l, r)
         |  UNION ALL
         |  SELECT 4 + x.i * 26 + y.i AS rank, x.c AS l, y.c AS r
         |  FROM letters x, letters y),
         |mo AS (SELECT rank, l || r AS pout FROM m),
         |bytesyms AS (SELECT * FROM (VALUES $symRows) AS v(idx, sym)),
         |w AS (
         |  SELECT doc_id, unnest(string_split_regex(
         |    trim(lower(translate(lower(text), 'ae', 'äé'))), '\\s+')) AS w
         |  FROM documents),
         |wb AS (SELECT doc_id, replace(replace(w, 'ä', 'Ã¤'), 'é', 'Ã©') AS b
         |       FROM w WHERE w <> ''),
         |words AS (SELECT DISTINCT b FROM wb),
         |it AS (
         |  SELECT b, '  ' || regexp_replace(b, '(.)', '\\1  ', 'g') || '</w>  ' AS s,
         |         CAST(0 AS BIGINT) AS r
         |  FROM words
         |  UNION ALL
         |  SELECT it.b, replace(it.s, ' ' || m.l || '  ' || m.r || ' ',
         |                       ' ' || m.l || m.r || ' '), it.r + 1
         |  FROM it JOIN m ON m.rank = it.r),
         |pw AS (
         |  SELECT b, unnest(string_split_regex(trim(s), '\\s+')) AS piece
         |  FROM it WHERE r = $nRanks),
         |ids AS (
         |  SELECT pw.b, CASE
         |           WHEN pw.piece = '</w>' THEN 3
         |           WHEN length(pw.piece) = 1 THEN 4 + bs.idx
         |           ELSE 260 + mo.rank END AS id
         |  FROM pw
         |  LEFT JOIN bytesyms bs ON bs.sym = pw.piece
         |  LEFT JOIN mo ON mo.pout = pw.piece),
         |wordids AS (
         |  SELECT b, count(*) AS np, sum(id) AS ids, max(id) AS mx
         |  FROM ids GROUP BY b),
         |e AS (SELECT wb.doc_id, wi.np, wi.ids, wi.mx
         |      FROM wb JOIN wordids wi ON wi.b = wb.b)
         |SELECT doc_id, CAST(sum(np) + 2 AS BIGINT) AS n_pieces,
         |       CAST(sum(ids) + 1 AS BIGINT) AS id_sum,
         |       CAST(max(mx) AS BIGINT) AS max_id
         |FROM e GROUP BY 1 ORDER BY doc_id""".stripMargin
    },

    // q144: the packed TRAINING EXPORT — every chunk's delimited
    // token-id stream, re-derived entirely from scratch: the q143 id
    // rule with word order preserved (position-keyed lists), BOS/EOS
    // wrapping each doc, the q130 packing math, and in-chunk
    // concatenation in doc-id order; streams compare as comma-joined
    // strings (the q124 exact-element-order convention)
    "q144_bpe_packed_ids" -> {
      val byteRows = Bpe.byteKernelMerges.take(4).zipWithIndex
        .map { case ((l, r), i) => s"(CAST($i AS BIGINT), '$l', '$r')" }
        .mkString(", ")
      val nRanks = Bpe.byteKernelMerges.size
      val symRows = Bpe.byteSymbols.zipWithIndex
        .map { case (s, b) => s"(CAST($b AS BIGINT), '${s.replace("'", "''")}')" }
        .mkString(", ")
      s"""WITH RECURSIVE
         |letters AS (
         |  SELECT chr(97 + CAST(i AS INTEGER)) AS c, CAST(i AS BIGINT) AS i
         |  FROM range(26) t(i)),
         |m AS (
         |  SELECT * FROM (VALUES $byteRows) AS v(rank, l, r)
         |  UNION ALL
         |  SELECT 4 + x.i * 26 + y.i AS rank, x.c AS l, y.c AS r
         |  FROM letters x, letters y),
         |mo AS (SELECT rank, l || r AS pout FROM m),
         |bytesyms AS (SELECT * FROM (VALUES $symRows) AS v(idx, sym)),
         |wd AS (
         |  SELECT doc_id, string_split_regex(
         |    trim(lower(translate(lower(text), 'ae', 'äé'))), '\\s+') AS ws
         |  FROM documents),
         |w AS (
         |  SELECT wd.doc_id, u.i AS pos,
         |         replace(replace(wd.ws[u.i], 'ä', 'Ã¤'), 'é', 'Ã©') AS b
         |  FROM wd, unnest(generate_series(1, len(wd.ws))) u(i)
         |  WHERE wd.ws[u.i] <> ''),
         |words AS (SELECT DISTINCT b FROM w),
         |it AS (
         |  SELECT b, '  ' || regexp_replace(b, '(.)', '\\1  ', 'g') || '</w>  ' AS s,
         |         CAST(0 AS BIGINT) AS r
         |  FROM words
         |  UNION ALL
         |  SELECT it.b, replace(it.s, ' ' || m.l || '  ' || m.r || ' ',
         |                       ' ' || m.l || m.r || ' '), it.r + 1
         |  FROM it JOIN m ON m.rank = it.r),
         |fin2 AS (
         |  SELECT b, string_split_regex(trim(s), '\\s+') AS ps
         |  FROM it WHERE r = $nRanks),
         |pw AS (
         |  SELECT b, u.i AS ppos, ps[u.i] AS piece
         |  FROM fin2, unnest(generate_series(1, len(ps))) u(i)),
         |pids AS (
         |  SELECT pw.b, pw.ppos, CASE
         |           WHEN pw.piece = '</w>' THEN 3
         |           WHEN length(pw.piece) = 1 THEN 4 + bs.idx
         |           ELSE 260 + mo.rank END AS id
         |  FROM pw
         |  LEFT JOIN bytesyms bs ON bs.sym = pw.piece
         |  LEFT JOIN mo ON mo.pout = pw.piece),
         |wordids AS (
         |  SELECT b, list(id ORDER BY ppos) AS wids FROM pids GROUP BY b),
         |docids AS (
         |  SELECT w.doc_id,
         |         [CAST(0 AS BIGINT)] || flatten(list(wi.wids ORDER BY w.pos))
         |           || [CAST(1 AS BIGINT)] AS dseq
         |  FROM w JOIN wordids wi ON wi.b = w.b GROUP BY w.doc_id),
         |toks AS (
         |  SELECT doc_id, CAST(len(dseq) AS BIGINT) AS n_tokens,
         |         CAST(doc_id % 8 AS INTEGER) AS shard
         |  FROM docids),
         |packed AS (
         |  SELECT doc_id, shard, n_tokens,
         |         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM toks),
         |ch AS (SELECT *,
         |         CAST(floor(CAST(cum_tokens - n_tokens AS DOUBLE) / 4096) AS BIGINT) AS chunk
         |       FROM packed)
         |SELECT ch.shard, ch.chunk,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(ch.n_tokens) AS BIGINT) AS total_tokens,
         |       array_to_string(flatten(list(d.dseq ORDER BY ch.doc_id)), ',') AS ids
         |FROM ch JOIN docids d USING (doc_id)
         |GROUP BY 1, 2 ORDER BY shard, chunk""".stripMargin
    },

    // q137: n-gram decontamination — the oracle replays the planted
    // eval slice (first 20 words of doc_id % 10 = 7 docs) and flags by
    // gram STRINGS where the operator joins xxhash64 gram keys: the
    // verdicts agree unless xxhash64 collides on this corpus, which
    // would flip a flag and hash-mismatch loudly
    "q137_ngram_decontamination" ->
      """WITH t AS (SELECT doc_id,
        |             string_split_regex(trim(lower(text)), '\s+') AS w
        |           FROM documents),
        |ev AS (SELECT w[1:20] AS w FROM t WHERE doc_id % 10 = 7),
        |eg AS (SELECT DISTINCT array_to_string(w[i:i+12], ' ') AS g
        |       FROM ev, unnest(generate_series(1, greatest(len(w) - 12, 0))) AS u(i)),
        |tg AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+12], ' ') AS g
        |       FROM t, unnest(generate_series(1, greatest(len(w) - 12, 0))) AS u(i)
        |       WHERE len(w) >= 13),
        |hits AS (SELECT DISTINCT tg.doc_id FROM tg JOIN eg USING (g))
        |SELECT t.doc_id, (hits.doc_id IS NOT NULL) AS contaminated
        |FROM t LEFT JOIN hits ON hits.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // q170: the firewall chain replayed — the q153 donor plant, the
    // md5 source-bucket split at seed 9, the held-out first-20-word
    // gram artifact, and the train-side flags by gram STRINGS (the
    // q137 convention: the operator joins xxhash64 keys; a collision
    // would flip a verdict and hash-mismatch loudly)
    "q170_split_decontam" ->
      """WITH d0 AS (SELECT d.doc_id, d.source,
        |             CASE WHEN d.doc_id % 10 = 9 THEN dn.text ELSE d.text END AS text
        |            FROM documents d
        |            LEFT JOIN documents dn ON dn.doc_id = d.doc_id - 4),
        |sp AS (SELECT doc_id, source, text,
        |         CAST(('0x' || substr(md5(source || ':split:9'), 1, 13)) AS BIGINT)
        |           % 100 AS b
        |       FROM d0),
        |t AS (SELECT doc_id, source,
        |        CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |             ELSE 'test' END AS split,
        |        string_split_regex(trim(lower(text)), '\s+') AS w
        |      FROM sp),
        |ev AS (SELECT w[1:20] AS w FROM t WHERE split <> 'train'),
        |eg AS (SELECT DISTINCT array_to_string(w[i:i+12], ' ') AS g
        |       FROM ev, unnest(generate_series(1, greatest(len(w) - 12, 0))) AS u(i)),
        |tg AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+12], ' ') AS g
        |       FROM t, unnest(generate_series(1, greatest(len(w) - 12, 0))) AS u(i)
        |       WHERE split = 'train' AND len(w) >= 13),
        |hits AS (SELECT DISTINCT tg.doc_id FROM tg JOIN eg USING (g))
        |SELECT t.doc_id, t.source, t.split,
        |       (hits.doc_id IS NOT NULL) AS contaminated
        |FROM t LEFT JOIN hits ON hits.doc_id = t.doc_id
        |WHERE t.split = 'train'
        |ORDER BY t.doc_id""".stripMargin,

    // q176: order-3 interpolated KN replayed — the trigram table, both
    // continuation levels (per-(b,c) row counts ARE distinct-a counts),
    // the two-rung recursion, grid sums; d interpolated from the Scala
    // constant (the q171 convention one order up)
    "q176_kn_trigram" ->
      s"""WITH d AS (SELECT doc_id,
         |             regexp_split_to_array(lower(trim(text)), '\\s+') AS w
         |           FROM documents),
         |tok AS (SELECT doc_id, unnest(w) AS tok,
         |          unnest(generate_series(1, len(w))) AS pos FROM d),
         |tg AS (SELECT t0.doc_id, t0.tok AS a, t1.tok AS b, t2.tok AS c
         |       FROM tok t0 JOIN tok t1
         |         ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
         |       JOIN tok t2
         |         ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2),
         |tc AS (SELECT a, b, c, count(*) AS cabc FROM tg GROUP BY 1, 2, 3),
         |ctx2 AS (SELECT a, b, sum(cabc) AS cab, count(*) AS n1ab
         |         FROM tc GROUP BY 1, 2),
         |mid AS (SELECT b, c, count(*) AS mbc FROM tc GROUP BY 1, 2),
         |ctx1 AS (SELECT b, sum(mbc) AS totb, count(*) AS n1b
         |         FROM mid GROUP BY 1),
         |uni AS (SELECT c, count(*) AS n1pc FROM mid GROUP BY 1),
         |tot AS (SELECT count(*) AS n1tot FROM mid),
         |lp AS (SELECT g.doc_id,
         |         CAST(round(ln(
         |           (greatest(t3.cabc - ${TextAnalysis.KnDiscount}, 0.0)
         |            + ${TextAnalysis.KnDiscount} * x2.n1ab
         |              * ((greatest(m.mbc - ${TextAnalysis.KnDiscount}, 0.0)
         |                  + ${TextAnalysis.KnDiscount} * x1.n1b
         |                    * (CAST(u.n1pc AS DOUBLE) / t.n1tot)) / x1.totb))
         |           / x2.cab)
         |                    * 100000000.0) AS BIGINT) AS lps
         |       FROM tg g
         |       JOIN tc t3 ON t3.a = g.a AND t3.b = g.b AND t3.c = g.c
         |       JOIN ctx2 x2 ON x2.a = g.a AND x2.b = g.b
         |       JOIN mid m ON m.b = g.b AND m.c = g.c
         |       JOIN ctx1 x1 ON x1.b = g.b
         |       JOIN uni u ON u.c = g.c CROSS JOIN tot t)
         |SELECT doc_id, count(*) AS n_trigrams,
         |  round(-(CAST(sum(lps) AS DOUBLE) / 100000000.0) / count(*)
         |        + 1e-9, 4) AS kn3_nll
         |FROM lp GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // q177: the day-2 order-3 flow replayed — the frozen trigram model
    // off the 80% slice, the batch's three-rung CASE ladder (seen
    // context → trigram mass; unseen context but seen middle →
    // continuation-bigram mass; unseen middle → Laplace-floored
    // continuation unigram), the q172 conventions one order up
    "q177_kn3_score" ->
      s"""WITH d AS (SELECT doc_id,
         |             regexp_split_to_array(lower(trim(text)), '\\s+') AS w
         |           FROM documents),
         |tok AS (SELECT doc_id, unnest(w) AS tok,
         |          unnest(generate_series(1, len(w))) AS pos FROM d),
         |tg AS (SELECT t0.doc_id, t0.tok AS a, t1.tok AS b, t2.tok AS c
         |       FROM tok t0 JOIN tok t1
         |         ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
         |       JOIN tok t2
         |         ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2),
         |tc AS (SELECT a, b, c, count(*) AS cabc FROM tg
         |       WHERE doc_id % 5 <> 4 GROUP BY 1, 2, 3),
         |ctx2 AS (SELECT a, b, sum(cabc) AS cab, count(*) AS n1ab
         |         FROM tc GROUP BY 1, 2),
         |mid AS (SELECT b, c, count(*) AS mbc FROM tc GROUP BY 1, 2),
         |ctx1 AS (SELECT b, sum(mbc) AS totb, count(*) AS n1b
         |         FROM mid GROUP BY 1),
         |uni AS (SELECT c, count(*) AS n1pc FROM mid GROUP BY 1),
         |sc AS (SELECT (SELECT count(*) FROM mid) AS n1tot,
         |         (SELECT count(DISTINCT t) FROM
         |           (SELECT a AS t FROM tc UNION ALL SELECT b FROM tc
         |            UNION ALL SELECT c FROM tc)) AS v),
         |q AS (SELECT g.doc_id, t3.cabc, x2.cab, x2.n1ab,
         |        m.mbc, x1.totb, x1.n1b, u.n1pc
         |      FROM tg g
         |      LEFT JOIN tc t3 ON t3.a = g.a AND t3.b = g.b AND t3.c = g.c
         |      LEFT JOIN ctx2 x2 ON x2.a = g.a AND x2.b = g.b
         |      LEFT JOIN mid m ON m.b = g.b AND m.c = g.c
         |      LEFT JOIN ctx1 x1 ON x1.b = g.b
         |      LEFT JOIN uni u ON u.c = g.c
         |      WHERE g.doc_id % 5 = 4),
         |lp AS (SELECT doc_id,
         |         CAST(round(ln(
         |           CASE WHEN cab IS NOT NULL THEN
         |             (greatest(coalesce(cabc, 0) - ${TextAnalysis.KnDiscount}, 0.0)
         |              + ${TextAnalysis.KnDiscount} * n1ab *
         |                CASE WHEN totb IS NOT NULL THEN
         |                  (greatest(coalesce(mbc, 0) - ${TextAnalysis.KnDiscount}, 0.0)
         |                   + ${TextAnalysis.KnDiscount} * n1b
         |                     * (CAST(coalesce(n1pc, 0) + 1 AS DOUBLE)
         |                        / (s.n1tot + s.v + 1))) / totb
         |                ELSE CAST(coalesce(n1pc, 0) + 1 AS DOUBLE)
         |                     / (s.n1tot + s.v + 1) END) / cab
         |           WHEN totb IS NOT NULL THEN
         |             (greatest(coalesce(mbc, 0) - ${TextAnalysis.KnDiscount}, 0.0)
         |              + ${TextAnalysis.KnDiscount} * n1b
         |                * (CAST(coalesce(n1pc, 0) + 1 AS DOUBLE)
         |                   / (s.n1tot + s.v + 1))) / totb
         |           ELSE CAST(coalesce(n1pc, 0) + 1 AS DOUBLE)
         |                / (s.n1tot + s.v + 1) END)
         |                    * 100000000.0) AS BIGINT) AS lps
         |       FROM q, sc s)
         |SELECT doc_id, count(*) AS n_trigrams,
         |  round(-(CAST(sum(lps) AS DOUBLE) / 100000000.0) / count(*)
         |        + 1e-9, 4) AS kn3_nll
         |FROM lp GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // q125: BPE encode — the oracle is GENERATED from the same planted
    // merge table the operator folds over (one replace per merge in
    // rank order, the subword-nmt left-to-right exhaustive convention),
    // so the two engines cannot apply different tables by accident
    "q125_bpe_encode" -> {
      val folds = Bpe.docMerges.foldLeft(
        "'  ' || regexp_replace(w, '(.)', '\\1  ', 'g') || '" +
          Bpe.EndOfWord + "  '") {
        // the double-space boundary representation: the pattern consumes
        // one space per side, the replacement re-emits them, so one scan
        // per rank is exhaustive (see Bpe.encode)
        case (acc, (a, b)) => s"replace($acc, ' $a  $b ', ' $a$b ')"
      }
      s"""WITH w AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
         |  FROM documents),
         |e AS (SELECT doc_id, w,
         |        CAST(len(string_split_regex(trim($folds), '\\s+')) AS BIGINT) AS p,
         |        CAST(length(w) AS BIGINT) AS c
         |      FROM w WHERE w <> '')
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(p) AS BIGINT) AS n_pieces,
         |       round(CAST(sum(c) AS DOUBLE) / sum(p), 4) AS chars_per_piece
         |FROM e GROUP BY 1 ORDER BY doc_id""".stripMargin
    },

    // q124: sequence assembly — q45's packing windows plus the
    // exclusive-prefix offsets (one window min per sequence) and the
    // in-order member lists, comma-joined so element order hash-checks
    "q124_packed_sequences" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |         CAST(doc_id % 8 AS INTEGER) AS shard
        |  FROM documents),
        |packed AS (
        |  SELECT doc_id, shard, n_tokens,
        |         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM toks),
        |ch AS (SELECT *,
        |         CAST(floor(CAST(cum_tokens - n_tokens AS DOUBLE) / 2048) AS BIGINT) AS chunk
        |       FROM packed),
        |o AS (SELECT *,
        |        (cum_tokens - n_tokens)
        |        - min(cum_tokens - n_tokens) OVER (PARTITION BY shard, chunk) AS off
        |      FROM ch)
        |SELECT shard, chunk,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |       array_to_string(list(doc_id ORDER BY doc_id), ',') AS doc_ids,
        |       array_to_string(list(off ORDER BY doc_id), ',') AS offsets
        |FROM o GROUP BY 1, 2 ORDER BY shard, chunk""".stripMargin,

    // q123: epoch expansion — the per-source when-chain target, the
    // md5 coin on the fractional part, and the per-copy epoch tags
    // re-derived; generate_series bound 7 is far past the max target
    "q123_epoch_expansion" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
        |                WHEN 'src2' THEN 0.25 ELSE 1.0 END AS e,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':17'), 1, 13)) AS BIGINT)
        |      / 4503599627370496.0 AS u
        |  FROM documents),
        |n AS (SELECT doc_id, source,
        |        CAST(floor(e) AS BIGINT)
        |        + CASE WHEN u < e - floor(e) THEN 1 ELSE 0 END AS n
        |      FROM d)
        |SELECT doc_id, source, CAST(i AS BIGINT) AS epoch
        |FROM n CROSS JOIN generate_series(0, 7) AS g(i)
        |WHERE i < n ORDER BY doc_id, epoch""".stripMargin,

    // q119: token entropy — per-(doc, token) counts, the 1e-8
    // scaled-long Σ c·ln(c), and the fixed-order closing chain with
    // the single-token guard, all re-derived from raw rows
    "q119_token_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |tc AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
        |       FROM toks GROUP BY 1, 2),
        |a AS (SELECT doc_id,
        |        CAST(sum(c) AS BIGINT) AS n_tokens,
        |        CAST(count(*) AS BIGINT) AS n_distinct,
        |        CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 100000000.0) AS BIGINT))
        |             AS BIGINT) AS s
        |      FROM tc GROUP BY 1)
        |SELECT doc_id, n_tokens, n_distinct,
        |  round(ln(CAST(n_tokens AS DOUBLE))
        |        - CAST(s AS DOUBLE) / 100000000.0 / CAST(n_tokens AS DOUBLE), 4) AS entropy,
        |  CASE WHEN n_tokens = 1 THEN 1.0
        |       ELSE round((ln(CAST(n_tokens AS DOUBLE))
        |                   - CAST(s AS DOUBLE) / 100000000.0 / CAST(n_tokens AS DOUBLE))
        |                  / ln(CAST(n_tokens AS DOUBLE)), 4)
        |  END AS diversity
        |FROM a ORDER BY doc_id""".stripMargin,

    // q120: WET record extraction — the oracle SERIALIZES the same
    // chunk files (string_agg in doc order behind a preamble) and
    // PARSES them back with the same split/strpos/regex rules;
    // Spark's 0-based posexplode over all fragments aligns with
    // generate_subscripts via rec_idx = gi - 1, records keeping >= 1
    "q120_wet_records" ->
      """WITH rec AS (
        |  SELECT doc_id, doc_id % 25 AS chunk_id,
        |    'WARC/1.0' || chr(10) ||
        |    'WARC-Type: conversion' || chr(10) ||
        |    'WARC-Target-URI: https://' || source || '.example.com/articles/'
        |      || CAST(doc_id % 100 AS VARCHAR) || chr(10) ||
        |    'WARC-Date: 2024-01-01T00:00:00Z' || chr(10) ||
        |    'Content-Length: ' || CAST(CASE WHEN doc_id % 7 = 0 THEN strlen(text) + 5
        |                                    ELSE strlen(text) END AS VARCHAR) || chr(10) ||
        |    chr(10) || text || chr(10) || chr(10) AS r
        |  FROM documents),
        |chunks AS (
        |  SELECT chunk_id,
        |         'warcinfo preamble' || chr(10) || string_agg(r, '' ORDER BY doc_id) AS content
        |  FROM rec GROUP BY 1),
        |f AS (SELECT chunk_id, string_split(content, 'WARC/1.0' || chr(10)) AS fs FROM chunks),
        |e AS (SELECT chunk_id, unnest(fs) AS frag, generate_subscripts(fs, 1) AS gi FROM f),
        |g AS (SELECT chunk_id, gi - 1 AS rec_idx, frag,
        |        strpos(frag, chr(10) || chr(10)) AS p
        |      FROM e WHERE gi >= 2 AND strpos(frag, chr(10) || chr(10)) > 0),
        |h AS (SELECT chunk_id, CAST(rec_idx AS BIGINT) AS rec_idx,
        |        substr(frag, 1, p - 1) AS hdr,
        |        regexp_replace(substr(frag, p + 2), '\n\n$', '') AS payload
        |      FROM g)
        |SELECT chunk_id, rec_idx,
        |  regexp_extract(hdr, '(?m)^WARC-Target-URI: (.*)$', 1) AS uri,
        |  regexp_extract(hdr, '(?m)^WARC-Date: (.*)$', 1) AS warc_date,
        |  CAST(regexp_extract(hdr, '(?m)^Content-Length: ([0-9]+)$', 1) AS BIGINT) AS content_length,
        |  CAST(strlen(payload) AS BIGINT) AS payload_len,
        |  coalesce(strlen(payload) = TRY_CAST(regexp_extract(hdr, '(?m)^Content-Length: ([0-9]+)$', 1) AS BIGINT), false) AS length_ok,
        |  payload
        |FROM h ORDER BY chunk_id, rec_idx""".stripMargin,

    // q121: the crawl→corpus front half replayed from scratch — the
    // q120 serialization + parse, then quarantine → blocklist →
    // canonical-URL election → per-domain rollup. The planted URIs are
    // already canonical (lowercase, no port/www/query), so canon_url =
    // uri and host = the authority — exact equivalence holds by
    // construction; the full rule chains are hash-checked by q105/q113
    "q121_crawl_ingest" ->
      (s"""WITH rec AS (
         |  SELECT doc_id, doc_id % 25 AS chunk_id,
         |    'WARC/1.0' || chr(10) ||
         |    'WARC-Type: conversion' || chr(10) ||
         |    'WARC-Target-URI: https://' || source || '.example.com/articles/'
         |      || CAST(doc_id % 100 AS VARCHAR) || chr(10) ||
         |    'WARC-Date: 2024-01-01T00:00:00Z' || chr(10) ||
         |    'Content-Length: ' || CAST(CASE WHEN doc_id % 7 = 0 THEN strlen(text) + 5
         |                                    ELSE strlen(text) END AS VARCHAR) || chr(10) ||
         |    chr(10) || text || chr(10) || chr(10) AS r
         |  FROM documents),
         |chunks AS (
         |  SELECT chunk_id,
         |         'warcinfo preamble' || chr(10) || string_agg(r, '' ORDER BY doc_id) AS content
         |  FROM rec GROUP BY 1),
         |f AS (SELECT chunk_id, string_split(content, 'WARC/1.0' || chr(10)) AS fs FROM chunks),
         |e AS (SELECT chunk_id, unnest(fs) AS frag, generate_subscripts(fs, 1) AS gi FROM f),
         |g AS (SELECT chunk_id, gi - 1 AS rec_idx, frag,
         |        strpos(frag, chr(10) || chr(10)) AS p
         |      FROM e WHERE gi >= 2 AND strpos(frag, chr(10) || chr(10)) > 0),
         |h AS (SELECT chunk_id, rec_idx,
         |        substr(frag, 1, p - 1) AS hdr,
         |        regexp_replace(substr(frag, p + 2), '\\n\\n$$', '') AS payload
         |      FROM g),
         |pp AS (SELECT chunk_id * 100000 + rec_idx AS rec_id,
         |        regexp_extract(hdr, '(?m)^WARC-Target-URI: (.*)$$', 1) AS uri,
         |        payload,
         |        coalesce(strlen(payload) = TRY_CAST(regexp_extract(hdr, '(?m)^Content-Length: ([0-9]+)$$', 1) AS BIGINT), false) AS length_ok
         |      FROM h),
         |hh AS (SELECT *, regexp_extract(uri, '^https://([^/]*)', 1) AS host FROM pp),
         |bl AS (SELECT unnest([${Urls.docBlocklist.map(p => s"'$p'").mkString(", ")}]) AS b),
         |hits AS (SELECT DISTINCT hh.rec_id FROM hh
         |         JOIN bl ON hh.host = bl.b OR hh.host LIKE '%.' || bl.b),
         |cc AS (SELECT hh.*, (t.rec_id IS NOT NULL) AS blocked
         |       FROM hh LEFT JOIN hits t USING (rec_id)),
         |el AS (SELECT *,
         |        min(CASE WHEN length_ok AND uri <> '' AND NOT blocked THEN rec_id END)
         |          OVER (PARTITION BY uri) AS keep
         |       FROM cc),
         |v AS (SELECT host AS domain,
         |        CASE WHEN NOT (length_ok AND uri <> '') THEN 'bad_envelope'
         |             WHEN blocked THEN 'blocked'
         |             WHEN rec_id <> keep THEN 'url_dup'
         |             ELSE 'kept' END AS cat,
         |        CASE WHEN trim(payload) = '' THEN 0
         |             ELSE len(string_split_regex(trim(payload), '\\s+')) END AS w
         |      FROM el)
         |SELECT domain,
         |       CAST(count(*) AS BIGINT) AS n_records,
         |       CAST(count(*) FILTER (cat = 'bad_envelope') AS BIGINT) AS n_bad_envelope,
         |       CAST(count(*) FILTER (cat = 'blocked') AS BIGINT) AS n_blocked,
         |       CAST(count(*) FILTER (cat = 'url_dup') AS BIGINT) AS n_url_dups,
         |       CAST(count(*) FILTER (cat = 'kept') AS BIGINT) AS n_kept,
         |       CAST(coalesce(sum(CASE WHEN cat = 'kept' THEN w END), 0) AS BIGINT) AS kept_words
         |FROM v GROUP BY domain ORDER BY domain""").stripMargin,

    "q73_weighted_sample" ->
      """WITH u AS (
        |  SELECT doc_id, source, n_chars,
        |   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':11'), 1, 13)) AS BIGINT)
        |     / 4503599627370496.0 AS draw
        |  FROM documents)
        |SELECT doc_id, source, n_chars FROM u
        |WHERE draw < least(greatest(n_chars * (1.0 / 400.0), 0.0), 1.0)
        |ORDER BY doc_id""".stripMargin,

    // weekly cohorts: Monday-start date_trunc('week') in both engines;
    // the /7 offset is exact (both weeks are Monday-anchored) so the
    // float division CASTs to the same INT
    "q55_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |wk AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week_start FROM e),
        |c AS (SELECT *, MIN(week_start) OVER (PARTITION BY user_id) AS cohort_week FROM wk),
        |o AS (SELECT cohort_week,
        |        CAST(datediff('day', cohort_week, week_start) / 7 AS INT) AS week_offset FROM c),
        |counts AS (SELECT cohort_week, week_offset, count(*) AS active_users FROM o GROUP BY 1, 2),
        |sizes AS (SELECT cohort_week, active_users AS cohort_size FROM counts WHERE week_offset = 0)
        |SELECT cohort_week, week_offset, active_users, cohort_size,
        | round(active_users * 1.0 / cohort_size, 4) AS retention_pct
        |FROM counts JOIN sizes USING (cohort_week)
        |ORDER BY cohort_week, week_offset""".stripMargin,

    // strict-order funnel: step k's min-ts must lie strictly after the
    // user's step k-1 timestamp — a click before the first view does
    // NOT qualify (AnalyticsSpec plants exactly that user)
    "q56_funnel_conversion" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |s1 AS (SELECT user_id, MIN(ts) AS t FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM e JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
        |c AS (SELECT 1 AS step, 'view' AS step_name, (SELECT count(*) FROM s1) AS users
        |      UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |      UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |SELECT step, step_name, users,
        | round(users * 1.0 / first_value(users) OVER (ORDER BY step), 4) AS pct_of_first,
        | round(users * 1.0 / lag(users) OVER (ORDER BY step), 4) AS pct_of_prev
        |FROM c ORDER BY step""".stripMargin,

    // RANGE frame over the day number, not ROWS: calendar gaps shrink
    // the trailing window identically in both engines
    "q57_rolling_metrics" ->
      """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |d AS (SELECT event_type, CAST(ts AS DATE) AS day, sum(value) AS dv, count(*) AS n_events
        |      FROM e GROUP BY 1, 2),
        |n AS (SELECT *, datediff('day', DATE '1970-01-01', day) AS day_num FROM d)
        |SELECT event_type, day, round(dv, 4) AS daily_value, n_events,
        | round(sum(dv) OVER w, 4) AS rolling_7d_value,
        | round(avg(dv) OVER w, 4) AS rolling_7d_avg,
        | CAST(sum(n_events) OVER w AS BIGINT) AS rolling_7d_events
        |FROM n
        |WINDOW w AS (PARTITION BY event_type ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, day""".stripMargin,

    // trailing baseline EXCLUDES the current day (a spike must not
    // suppress its own z); z is null while the baseline has <2 days or
    // is flat, and is_anomaly compares the ROUNDED z in both engines.
    // RANGE over the day number, not ROWS: calendar gaps SHRINK the
    // baseline instead of letting stale pre-gap days vote
    "q58_anomaly_flags" ->
      """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events FROM e GROUP BY 1, 2),
        |n AS (SELECT *, datediff('day', DATE '1970-01-01', day) AS day_num FROM d),
        |b AS (SELECT *, avg(n_events) OVER w AS m, stddev_samp(n_events) OVER w AS s
        |      FROM n WINDOW w AS (PARTITION BY event_type ORDER BY day_num
        |                          RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT *, CASE WHEN s IS NULL OR s = 0
        |                     THEN CAST(NULL AS DOUBLE)
        |                     ELSE round((n_events - m) / s, 4) END AS z_score FROM b)
        |SELECT event_type, day, n_events, z_score,
        | coalesce(abs(z_score) > 2.0, false) AS is_anomaly,
        | round(m, 4) AS baseline_mean, round(s, 4) AS baseline_std
        |FROM z ORDER BY event_type, day""".stripMargin,

    // q77: the portable-hash HLL twin. HLL is deterministic given its
    // hash, so with the repo's 60-bit md5 convention DuckDB reproduces
    // the IDENTICAL registers (idx = top 12 bits, rho = 49 - bitlen of
    // the 48-bit remainder) and estimate (harmonic mean with the
    // 2^-rho sum carried as exact scaled longs; linear counting below
    // 2.5m). The alpha·m²·2⁴⁹ constant is the same shortest-repr
    // double literal both engines parse bit-identically; the oracle
    // goes straight from raw rows where Spark merges day-grain
    // registers — max is associative, so hash-equality certifies the
    // merge too. This oracles the SKETCH SEMANTICS q60 rides through
    // DataSketches' private hash (the q22→q74 relationship).
    "q77_hll_portable" ->
      """WITH e AS (
        |  SELECT event_type, CAST(user_id AS VARCHAR) AS uid FROM events
        |  WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) >= DATE '2024-01-16'),
        |h AS (SELECT event_type,
        |        CAST(('0x' || substr(md5(uid), 1, 15)) AS BIGINT) AS h FROM e),
        |r AS (SELECT event_type, h >> 48 AS idx,
        |        max(CASE WHEN (h & 281474976710655) = 0 THEN 49
        |            ELSE 49 - length(format('{:b}', h & 281474976710655)) END) AS r
        |      FROM h GROUP BY 1, 2),
        |a AS (SELECT event_type, count(*) AS n_regs,
        |        sum(CAST(pow(2.0, 49 - r) AS BIGINT)) AS s
        |      FROM r GROUP BY 1),
        |est AS (SELECT event_type, n_regs,
        |          6.810691763087074e21 /
        |            CAST(s + (4096 - n_regs) * 562949953421312 AS DOUBLE) AS raw,
        |          4096 - n_regs AS zeros
        |        FROM a)
        |SELECT event_type, n_regs,
        | round(CASE WHEN raw <= 10240.0 AND zeros > 0
        |        THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END + 1e-9, 4)
        |   AS distinct_est
        |FROM est ORDER BY event_type""".stripMargin,

    // q84: the Count-Min heavy-hitter rollup is built ENTIRELY on the
    // portable md5 bucket convention, so unlike q60 it needs no twin —
    // DuckDB rebuilds the identical d×w counter grid from the raw rows
    // (merged-over-range counters = sum of per-item counts mapping to
    // each bucket), re-derives the per-day top-64 candidate lists,
    // estimates each candidate by the same min-over-d rule and ranks
    // with the same est-desc/item-asc tie-break
    "q84_cms_heavy_hitters" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS item,
        |             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |           FROM events
        |           WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) >= DATE '2024-01-16'),
        |cnts AS (SELECT day, item, count(*) AS cnt FROM e GROUP BY 1, 2),
        |b AS (SELECT i.item, j.j,
        |        CAST(('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || i.item), 1, 15)) AS BIGINT) % 1024 AS bucket
        |      FROM (SELECT DISTINCT item FROM cnts) i CROSS JOIN range(0, 4) j(j)),
        |merged AS (SELECT b.j, b.bucket, sum(c.cnt) AS cnt
        |           FROM cnts c JOIN b ON b.item = c.item GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT item FROM (
        |          SELECT item, row_number() OVER (PARTITION BY day
        |            ORDER BY cnt DESC, item ASC) AS rn FROM cnts) WHERE rn <= 64),
        |est AS (SELECT b.item, CAST(min(m.cnt) AS BIGINT) AS est_count
        |        FROM cand JOIN b ON b.item = cand.item
        |        JOIN merged m ON m.j = b.j AND m.bucket = b.bucket
        |        GROUP BY 1),
        |ranked AS (SELECT item, est_count,
        |           row_number() OVER (ORDER BY est_count DESC, item ASC) AS rank FROM est)
        |SELECT rank, item, est_count FROM ranked WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // q85: SemDeDup on the q79 formula-chosen centroids — assignment
    // (argmin |c|²−2·v·c, tie → lower cell), within-cell pairing, the
    // 4-dp-rounded cosine threshold and the keep-lowest-id verdict are
    // all deterministic index-order arithmetic, so the whole semantic-
    // dedup pipeline hash-checks from scratch
    "q85_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT CAST(vec_id AS INT) AS cell, v AS cvec, list_dot_product(v, v) AS c2
        |      FROM e WHERE vec_id < 16),
        |asg AS (SELECT vec_id, cell FROM (
        |         SELECT e.vec_id, c.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY c.c2 - 2.0 * list_dot_product(e.v, c.cvec) ASC, c.cell ASC) AS rn
        |         FROM e CROSS JOIN c) WHERE rn = 1),
        |m AS (SELECT a.vec_id, a.cell, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm
        |      FROM asg a JOIN e ON e.vec_id = a.vec_id),
        |dups AS (SELECT id_b AS vec_id, min(id_a) AS dup_of FROM (
        |          SELECT x.vec_id AS id_a, y.vec_id AS id_b,
        |            round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 4) AS cos
        |          FROM m x JOIN m y ON x.cell = y.cell AND x.vec_id < y.vec_id)
        |         WHERE cos >= 0.25 GROUP BY 1)
        |SELECT m.vec_id, m.cell, d.vec_id IS NOT NULL AS is_dup, d.dup_of
        |FROM m LEFT JOIN dups d ON d.vec_id = m.vec_id
        |ORDER BY m.vec_id""".stripMargin,

    // q139: the two-level (IMI) SemDeDup SHAPE from scratch — formula
    // sub-quantizers (cell j of each half = vector j's half, j < 4),
    // per-half argmin, product cell c1*4+c2, then q85's pairing and
    // verdict verbatim; halves are the 64-dim embedding's 32/32 split
    // (a corpus dim change would hash-mismatch loudly — the shared-
    // constant convention)
    "q139_semdedup_imi_portable" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |h AS (SELECT vec_id, v[1:32] AS v1, v[33:64] AS v2, v FROM e),
        |c1 AS (SELECT CAST(vec_id AS INT) AS cell, v1 AS cvec,
        |         list_dot_product(v1, v1) AS c2 FROM h WHERE vec_id < 4),
        |c2t AS (SELECT CAST(vec_id AS INT) AS cell, v2 AS cvec,
        |          list_dot_product(v2, v2) AS c2 FROM h WHERE vec_id < 4),
        |a1 AS (SELECT vec_id, cell AS cc1 FROM (
        |        SELECT h.vec_id, c1.cell,
        |          row_number() OVER (PARTITION BY h.vec_id
        |            ORDER BY c1.c2 - 2.0 * list_dot_product(h.v1, c1.cvec) ASC,
        |                     c1.cell ASC) AS rn
        |        FROM h CROSS JOIN c1) WHERE rn = 1),
        |a2 AS (SELECT vec_id, cell AS cc2 FROM (
        |        SELECT h.vec_id, c2t.cell,
        |          row_number() OVER (PARTITION BY h.vec_id
        |            ORDER BY c2t.c2 - 2.0 * list_dot_product(h.v2, c2t.cvec) ASC,
        |                     c2t.cell ASC) AS rn
        |        FROM h CROSS JOIN c2t) WHERE rn = 1),
        |asg AS (SELECT a1.vec_id, a1.cc1 * 4 + a2.cc2 AS cell
        |        FROM a1 JOIN a2 USING (vec_id)),
        |m AS (SELECT a.vec_id, a.cell, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm
        |      FROM asg a JOIN e ON e.vec_id = a.vec_id),
        |dups AS (SELECT id_b AS vec_id, min(id_a) AS dup_of FROM (
        |          SELECT x.vec_id AS id_a, y.vec_id AS id_b,
        |            round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 4) AS cos
        |          FROM m x JOIN m y ON x.cell = y.cell AND x.vec_id < y.vec_id)
        |         WHERE cos >= 0.25 GROUP BY 1)
        |SELECT m.vec_id, m.cell, d.vec_id IS NOT NULL AS is_dup, d.dup_of
        |FROM m LEFT JOIN dups d ON d.vec_id = m.vec_id
        |ORDER BY m.vec_id""".stripMargin,

    // q88: cluster-balanced sampling on the q85/q79 formula centroids —
    // assignment (argmin rule), the 4-dp rounded prototypicality
    // cosine, per-cell ranks and the ceil-keep rule are deterministic
    // index-order arithmetic, reproducible from scratch
    "q88_cluster_sample" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT CAST(vec_id AS INT) AS cell, v AS cvec,
        |        list_dot_product(v, v) AS c2
        |      FROM e WHERE vec_id < 16),
        |asg AS (SELECT vec_id, cell FROM (
        |         SELECT e.vec_id, c.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY c.c2 - 2.0 * list_dot_product(e.v, c.cvec) ASC,
        |                      c.cell ASC) AS rn
        |         FROM e CROSS JOIN c) WHERE rn = 1),
        |scored AS (SELECT a.vec_id, a.cell,
        |             round(list_dot_product(e.v, c.cvec)
        |                   / (sqrt(list_dot_product(e.v, e.v)) * sqrt(c.c2)), 4) AS cos_c
        |           FROM asg a JOIN e ON e.vec_id = a.vec_id
        |           JOIN c ON c.cell = a.cell),
        |ranked AS (SELECT vec_id, cell, cos_c,
        |             row_number() OVER (PARTITION BY cell
        |               ORDER BY cos_c DESC, vec_id ASC) AS cell_rank,
        |             count(*) OVER (PARTITION BY cell) AS csz
        |           FROM scored)
        |SELECT vec_id, cell, cos_c, CAST(cell_rank AS BIGINT) AS cell_rank
        |FROM ranked WHERE cell_rank <= ceil(0.25 * csz)
        |ORDER BY vec_id""".stripMargin,

    // q86: the prefix-filter blocking is lossless by the Ed-Join
    // theorem and the Levenshtein verify is the final predicate, so
    // the RESULT is exactly the all-pairs fuzzy join — the oracle is
    // the brute-force formulation (the q59 losslessness convention)
    "q86_edit_join" ->
      """WITH v AS (SELECT DISTINCT c_name AS s FROM customer
        |           WHERE c_name IS NOT NULL)
        |SELECT a.s AS name_a, b.s AS name_b,
        |       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM v a JOIN v b ON a.s < b.s
        |WHERE levenshtein(a.s, b.s) <= 1
        |ORDER BY name_a, name_b""".stripMargin,

    // q89: both composition halves re-derived from scratch — brute
    // Levenshtein pairs (q86's oracle shape) feeding the q37
    // recursive-CTE transitive closure; min label is lexicographic,
    // identical on both engines
    "q89_fuzzy_canonical" ->
      """WITH RECURSIVE v AS (SELECT DISTINCT p_name AS s FROM part
        |           WHERE p_name IS NOT NULL),
        |p0 AS (SELECT a.s AS id_a, b.s AS id_b FROM v a JOIN v b
        |       ON a.s < b.s WHERE levenshtein(a.s, b.s) <= 2),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM p0
        |          UNION SELECT id_b, id_a FROM p0),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach AS (SELECT id, id AS r FROM nodes
        |          UNION
        |          SELECT e.src AS id, reach.r FROM edges e
        |          JOIN reach ON reach.id = e.dst),
        |clus AS (SELECT id, min(r) AS rep FROM reach GROUP BY id)
        |SELECT v.s AS name, coalesce(c.rep, v.s) AS canonical,
        |       coalesce(c.rep, v.s) <> v.s AS is_variant
        |FROM v LEFT JOIN clus c ON c.id = v.s
        |ORDER BY name""".stripMargin,

    // q90: postings, stats, Lucene-IDF and the scaled-long score sum
    // (the q33/q63 convention — per-term contributions are
    // bit-identical IEEE, the sum rides exact longs) rebuilt from raw
    // rows; DuckDB ln == Spark log (natural); top-20 by (score desc,
    // doc_id asc)
    "q90_bm25_search" ->
      """WITH d AS (SELECT doc_id,
        |             regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |tok AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM d),
        |post AS (SELECT term, doc_id, dl, count(*) AS tf
        |         FROM tok GROUP BY 1, 2, 3),
        |stats AS (SELECT count(*) AS n_docs,
        |            CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |          FROM (SELECT DISTINCT doc_id, dl FROM tok)),
        |probe AS (SELECT * FROM post WHERE term IN ('spark', 'window', 'batch')),
        |dfs AS (SELECT term, count(*) AS df FROM probe GROUP BY 1),
        |contrib AS (SELECT p.doc_id,
        |    CAST(round(
        |      ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
        |      * (p.tf * (1.2 + 1.0))
        |      / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / s.avgdl))
        |      * 100000000.0) AS BIGINT) AS cs
        |  FROM probe p JOIN dfs f ON f.term = p.term CROSS JOIN stats s),
        |scored AS (SELECT doc_id,
        |    round(CAST(sum(cs) AS DOUBLE) / 100000000.0 + 1e-9, 4) AS score
        |  FROM contrib GROUP BY 1),
        |ranked AS (SELECT doc_id, score,
        |    row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
        |  FROM scored)
        |SELECT CAST(rank AS BIGINT) AS rank, doc_id, score
        |FROM ranked WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // q91: the day-2 contract IS the oracle — append-then-search must
    // equal the from-scratch full-corpus computation bit-exactly
    // (postings union is disjoint by doc, stats add as longs), so the
    // oracle is q90's reformulation over the WHOLE corpus with q91's
    // query terms
    "q91_bm25_incremental" ->
      """WITH d AS (SELECT doc_id,
        |             regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |tok AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM d),
        |post AS (SELECT term, doc_id, dl, count(*) AS tf
        |         FROM tok GROUP BY 1, 2, 3),
        |stats AS (SELECT count(*) AS n_docs,
        |            CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |          FROM (SELECT DISTINCT doc_id, dl FROM tok)),
        |probe AS (SELECT * FROM post WHERE term IN ('query', 'filter', 'join')),
        |dfs AS (SELECT term, count(*) AS df FROM probe GROUP BY 1),
        |contrib AS (SELECT p.doc_id,
        |    CAST(round(
        |      ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
        |      * (p.tf * (1.2 + 1.0))
        |      / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / s.avgdl))
        |      * 100000000.0) AS BIGINT) AS cs
        |  FROM probe p JOIN dfs f ON f.term = p.term CROSS JOIN stats s),
        |scored AS (SELECT doc_id,
        |    round(CAST(sum(cs) AS DOUBLE) / 100000000.0 + 1e-9, 4) AS score
        |  FROM contrib GROUP BY 1),
        |ranked AS (SELECT doc_id, score,
        |    row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
        |  FROM scored)
        |SELECT CAST(rank AS BIGINT) AS rank, doc_id, score
        |FROM ranked WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // q94: PMI's ln argument is a ratio of exact integers, so the
    // rounded score rides the ln-parity convention; ranks break ties
    // on (a, b)
    "q94_collocations" ->
      """WITH d AS (SELECT doc_id,
        |             regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS tok,
        |          unnest(generate_series(1, len(w))) AS pos FROM d),
        |bc AS (SELECT t0.tok AS a, t1.tok AS b, count(*) AS cab
        |       FROM tok t0 JOIN tok t1
        |         ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
        |       GROUP BY 1, 2),
        |l AS (SELECT a, sum(cab) AS ca FROM bc GROUP BY 1),
        |r AS (SELECT b, sum(cab) AS cb FROM bc GROUP BY 1),
        |n AS (SELECT sum(cab) AS n FROM bc),
        |scored AS (SELECT bc.a, bc.b, bc.cab,
        |    round(ln(CAST(bc.cab AS DOUBLE) * CAST(n.n AS DOUBLE)
        |             / (CAST(l.ca AS DOUBLE) * CAST(r.cb AS DOUBLE)))
        |          + 1e-9, 4) AS pmi
        |  FROM bc JOIN l ON l.a = bc.a JOIN r ON r.b = bc.b CROSS JOIN n
        |  WHERE bc.cab >= 5),
        |ranked AS (SELECT *, row_number() OVER
        |    (ORDER BY pmi DESC, a ASC, b ASC) AS rank FROM scored)
        |SELECT CAST(rank AS BIGINT) AS rank, a, b, cab, pmi
        |FROM ranked WHERE rank <= 50 ORDER BY rank""".stripMargin,

    // q93: Laplace-smoothed bigram NLL — counts are integers, each
    // per-bigram ln rides the proven ln-parity convention, the
    // per-doc sum rides the scaled-long grid (order-free), and the
    // 1e-9 nudge keeps grid-exact averages off the half-up boundary
    "q93_bigram_nll" ->
      """WITH d AS (SELECT doc_id,
        |             regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS tok,
        |          unnest(generate_series(1, len(w))) AS pos FROM d),
        |bg AS (SELECT t0.doc_id, t0.tok AS a, t1.tok AS b
        |       FROM tok t0 JOIN tok t1
        |         ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1),
        |bc AS (SELECT a, b, count(*) AS cab FROM bg GROUP BY 1, 2),
        |ctx AS (SELECT a, sum(cab) AS ca FROM bc GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS v FROM tok),
        |lp AS (SELECT g.doc_id,
        |         CAST(round(ln(CAST(c.cab + 1 AS DOUBLE)
        |                       / CAST(x.ca + v.v AS DOUBLE))
        |                    * 100000000.0) AS BIGINT) AS lps
        |       FROM bg g JOIN bc c ON c.a = g.a AND c.b = g.b
        |       JOIN ctx x ON x.a = g.a CROSS JOIN v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(-(CAST(sum(lps) AS DOUBLE) / 100000000.0) / count(*)
        |        + 1e-9, 4) AS nll
        |FROM lp GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // q171: interpolated Kneser–Ney replayed — the q93 bigram stream,
    // the ONE count table's three marginals (ca/N1+(a·) by context,
    // N1+(·b) by continuation, N1+(··) the row count), the discount
    // interpolated from the same Scala constant, ln on the q93 parity
    // convention, per-doc sums on the scaled-long grid
    "q171_kneser_ney" ->
      s"""WITH d AS (SELECT doc_id,
         |             regexp_split_to_array(lower(trim(text)), '\\s+') AS w
         |           FROM documents),
         |tok AS (SELECT doc_id, unnest(w) AS tok,
         |          unnest(generate_series(1, len(w))) AS pos FROM d),
         |bg AS (SELECT t0.doc_id, t0.tok AS a, t1.tok AS b
         |       FROM tok t0 JOIN tok t1
         |         ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1),
         |bc AS (SELECT a, b, count(*) AS cab FROM bg GROUP BY 1, 2),
         |ctx AS (SELECT a, sum(cab) AS ca, count(*) AS n1a FROM bc GROUP BY 1),
         |cont AS (SELECT b, count(*) AS n1b FROM bc GROUP BY 1),
         |tot AS (SELECT count(*) AS n1tot FROM bc),
         |lp AS (SELECT g.doc_id,
         |         CAST(round(ln(
         |           (greatest(c.cab - ${TextAnalysis.KnDiscount}, 0.0)
         |            + ${TextAnalysis.KnDiscount} * x.n1a
         |              * (CAST(k.n1b AS DOUBLE) / t.n1tot)) / x.ca)
         |                    * 100000000.0) AS BIGINT) AS lps
         |       FROM bg g JOIN bc c ON c.a = g.a AND c.b = g.b
         |       JOIN ctx x ON x.a = g.a JOIN cont k ON k.b = g.b CROSS JOIN tot t)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(-(CAST(sum(lps) AS DOUBLE) / 100000000.0) / count(*)
         |        + 1e-9, 4) AS kn_nll
         |FROM lp GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // q172: the day-2 KN flow replayed — the model's counts off the
    // 80% slice only, the batch's bigrams left-joined against them,
    // all three scoring branches (seen / unseen-bigram / unseen-
    // context) as one CASE, the smoothed continuation, the shared
    // discount constant, ln parity, grid sums
    "q172_kn_score" ->
      s"""WITH d AS (SELECT doc_id,
         |             regexp_split_to_array(lower(trim(text)), '\\s+') AS w
         |           FROM documents),
         |tok AS (SELECT doc_id, unnest(w) AS tok,
         |          unnest(generate_series(1, len(w))) AS pos FROM d),
         |bg AS (SELECT t0.doc_id, t0.tok AS a, t1.tok AS b
         |       FROM tok t0 JOIN tok t1
         |         ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1),
         |bc AS (SELECT a, b, count(*) AS cab FROM bg
         |       WHERE doc_id % 5 <> 4 GROUP BY 1, 2),
         |ctx AS (SELECT a, sum(cab) AS ca, count(*) AS n1a FROM bc GROUP BY 1),
         |cont AS (SELECT b, count(*) AS n1b FROM bc GROUP BY 1),
         |sc AS (SELECT (SELECT count(*) FROM bc) AS n1tot,
         |         (SELECT count(DISTINCT t) FROM
         |           (SELECT a AS t FROM bc UNION ALL SELECT b FROM bc)) AS v),
         |q AS (SELECT g.doc_id, c.cab, x.ca, x.n1a, k.n1b
         |      FROM bg g LEFT JOIN bc c ON c.a = g.a AND c.b = g.b
         |      LEFT JOIN ctx x ON x.a = g.a
         |      LEFT JOIN cont k ON k.b = g.b
         |      WHERE g.doc_id % 5 = 4),
         |lp AS (SELECT doc_id,
         |         CAST(round(ln(
         |           CASE WHEN ca IS NOT NULL THEN
         |             (greatest(coalesce(cab, 0) - ${TextAnalysis.KnDiscount}, 0.0)
         |              + ${TextAnalysis.KnDiscount} * n1a
         |                * (CAST(coalesce(n1b, 0) + 1 AS DOUBLE)
         |                   / (s.n1tot + s.v + 1))) / ca
         |           ELSE CAST(coalesce(n1b, 0) + 1 AS DOUBLE)
         |                / (s.n1tot + s.v + 1) END)
         |                    * 100000000.0) AS BIGINT) AS lps
         |       FROM q, sc s)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(-(CAST(sum(lps) AS DOUBLE) / 100000000.0) / count(*)
         |        + 1e-9, 4) AS kn_nll
         |FROM lp GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // q173: the rank-profile langid replayed — normalized char
    // trigrams via generate_series+substr, per-lang counts, the
    // (count desc, gram asc) rank tie-break, top-100 profiles, top-20
    // doc profiles, out-of-place sums with the n-penalty for misses,
    // argmin with the lexicographic lang tie-break
    "q173_langid_profiles" -> {
      val rotCases = TextAnalysis.langPlantRot.toSeq.sortBy(_._1)
        .map { case (l, r) =>
          s"WHEN '$l' THEN translate(lower(text), '${TextAnalysis.langPlantFrom}', " +
            s"'${TextAnalysis.langPlantTo(r)}')"
        }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, lang,
        |             regexp_replace(lower(trim(
        |               CASE lang $rotCases ELSE lower(text) END
        |             )), '\\s+', ' ', 'g') AS t
        |           FROM documents),""".stripMargin + "\n" +
      """g AS (SELECT doc_id, lang, substr(t, CAST(u.i AS INTEGER), 3) AS g
        |      FROM t, unnest(generate_series(1, length(t) - 2)) u(i)
        |      WHERE length(t) >= 3),
        |pc AS (SELECT lang, g, count(*) AS cnt FROM g
        |       WHERE doc_id % 5 <> 4 GROUP BY 1, 2),
        |prof AS (SELECT lang, g, rn AS rank FROM (
        |          SELECT lang, g, CAST(row_number() OVER (PARTITION BY lang
        |            ORDER BY cnt DESC, g ASC) AS BIGINT) AS rn
        |          FROM pc) WHERE rn <= 100),
        |dc AS (SELECT doc_id, g, count(*) AS cnt FROM g
        |       WHERE doc_id % 5 = 4 GROUP BY 1, 2),
        |dr AS (SELECT doc_id, g, rn AS r_doc FROM (
        |        SELECT doc_id, g, CAST(row_number() OVER (PARTITION BY doc_id
        |          ORDER BY cnt DESC, g ASC) AS BIGINT) AS rn
        |        FROM dc) WHERE rn <= 20),
        |langs AS (SELECT DISTINCT lang FROM prof),
        |dist AS (SELECT dr.doc_id, l.lang,
        |           CAST(sum(coalesce(abs(dr.r_doc - p.rank), 100)) AS BIGINT) AS dist
        |         FROM dr CROSS JOIN langs l
        |         LEFT JOIN prof p ON p.lang = l.lang AND p.g = dr.g
        |         GROUP BY 1, 2),
        |best AS (SELECT doc_id, lang AS pred_lang, dist FROM (
        |          SELECT doc_id, lang, dist,
        |            row_number() OVER (PARTITION BY doc_id
        |              ORDER BY dist ASC, lang ASC) AS rn
        |          FROM dist) WHERE rn = 1)
        |SELECT b.doc_id, t.lang, b.pred_lang, b.dist
        |FROM best b JOIN t ON t.doc_id = b.doc_id
        |ORDER BY b.doc_id""".stripMargin
    },

    // q174: the master pipeline replayed end to end — every stage
    // interface crossed by one from-scratch chain (see
    // masterPipelineOracleSql's Scaladoc for the stage-by-stage map)
    "q174_master_pipeline" -> masterPipelineOracleSql,

    // q178: the DAY-2 master ingest replayed — the shared day-1 front
    // derives every frozen artifact, then the batch's whole chain
    // probes them (see masterIngestOracleSql's Scaladoc)
    "q178_master_ingest" -> masterIngestOracleSql,
    // the day-2 mixture refresh: q178's two-day chain continued
    // through the re-plan over the grown pool (see
    // masterRefreshOracleSql's Scaladoc)
    "q179_master_refresh" -> masterRefreshOracleSql,

    // q180: the refresh-cadence meter replayed — the q158 water-fill
    // CTE chain over the DAY-1 subset (doc_id % 10 ≠ 7) derives the
    // plan, the current pool remaps src13 → src_day2, and the
    // full-outer meter arithmetic (new / vanished / grown sources,
    // integer basis points) re-derives per source
    "q180_refresh_meter" -> refreshMeterOracleSql,

    // q92: phrase matching is pure integer position arithmetic —
    // DuckDB re-derives (term, pos) pairs via zipped unnest and counts
    // consecutive-position joins; top-20 by (n_occ desc, doc_id)
    "q92_phrase_search" -> phraseSearchSql,

    // q135: append-equals-rebuild for the POSITIONAL tier — the Spark
    // side splits 80/20 and extends through appendToPositionalPostings;
    // ONE full-corpus oracle truth certifies both (the q91 convention)
    "q135_phrase_incremental" -> phraseSearchSql,

    // q87: the KMV/theta estimator is a deterministic function of the
    // portable md5 hashes, so DuckDB rebuilds the identical sketches
    // (min-256 distinct hashes per source×lang, rolled up to source),
    // order statistics and overlap estimates from the raw rows —
    // estimate regime included; no twin, no exact-regime dodge
    "q87_kmv_overlap" ->
      """WITH d AS (SELECT source, lang,
        |             regexp_split_to_array(lower(trim(text)), '\s+') w
        |           FROM documents),
        |sh AS (SELECT DISTINCT source, lang, sh FROM (
        |        SELECT source, lang, unnest(list_distinct(list_transform(
        |          generate_series(1, greatest(len(w) - 2, 1)),
        |          i -> array_to_string(w[i:i+2], ' ')))) AS sh FROM d)),
        |h AS (SELECT DISTINCT source, lang,
        |        CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h FROM sh),
        |fine AS (SELECT source, lang, h FROM (
        |          SELECT h.*, row_number() OVER (PARTITION BY source, lang
        |            ORDER BY h ASC) AS rn FROM h) WHERE rn <= 256),
        |merged AS (SELECT source, h FROM (
        |            SELECT source, h, row_number() OVER (PARTITION BY source
        |              ORDER BY h ASC) AS rn
        |            FROM (SELECT DISTINCT source, h FROM fine)) WHERE rn <= 256),
        |stats AS (SELECT source, count(*) AS cnt,
        |            CASE WHEN count(*) < 256 THEN 1152921504606846976
        |                 ELSE max(h) END AS ht,
        |            CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
        |                 ELSE floor(255.0 / (CAST(max(h) AS DOUBLE)
        |                                     / 1152921504606846976.0)) END AS est
        |          FROM merged GROUP BY 1),
        |pairs AS (SELECT a.source AS key_a, b.source AS key_b,
        |            a.est AS est_a, b.est AS est_b,
        |            least(a.ht, b.ht) AS ht_min
        |          FROM stats a JOIN stats b ON a.source < b.source),
        |m AS (SELECT x.source AS key_a, y.source AS key_b, count(*) AS m
        |      FROM merged x JOIN merged y ON x.h = y.h AND x.source < y.source
        |      JOIN pairs p ON p.key_a = x.source AND p.key_b = y.source
        |        AND x.h < p.ht_min
        |      GROUP BY 1, 2),
        |est AS (SELECT p.key_a, p.key_b, p.est_a, p.est_b,
        |          floor(coalesce(m.m, 0) / (CAST(p.ht_min AS DOUBLE)
        |                                    / 1152921504606846976.0)) AS ei
        |        FROM pairs p LEFT JOIN m ON m.key_a = p.key_a AND m.key_b = p.key_b)
        |SELECT key_a AS source_a, key_b AS source_b,
        |  CAST(est_a AS BIGINT) AS est_a, CAST(est_b AS BIGINT) AS est_b,
        |  CAST(ei AS BIGINT) AS est_inter,
        |  round(ei / (est_a + est_b - ei), 4) AS jaccard_est
        |FROM est ORDER BY source_a, source_b""".stripMargin,

    // the Bloom prune is an internal pre-shuffle optimization; the
    // trailing exact semi join makes the RESULT a plain semi join, so
    // the oracle is the IN-subquery formulation (q60's own estimate
    // stays engine-specific — its semantics are oracle-certified
    // through the portable twin q77, and SketchesSpec keeps the
    // exact-vs-estimate tolerance and merge-losslessness asserts)
    "q59_bloom_semijoin" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        | round(sum(l_extendedprice), 4) AS revenue
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // q64: k=4096 keeps every verify-scale sketch in the EXACT regime
    // (~1k values per type-range at sf0.01, no compaction anywhere —
    // that sizing is the operator's documented verification contract),
    // so the sketch answer IS the inclusive-rank order statistic: the
    // value at 1-indexed sorted position ceil(rank·n). The oracle
    // checks that rule end-to-end (insert → day-sketch → merge →
    // decode); the compacted regime's ±1.65% rank-error behavior stays
    // spec-pinned (SketchesSpec's 20k-value envelope test).
    "q64_kll_quantiles" ->
      """WITH v AS (SELECT event_type, CAST(value AS DOUBLE) AS value,
        |             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |           FROM events
        |           WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) >= DATE '2024-01-16'),
        |n AS (SELECT event_type, count(DISTINCT day) AS n_days,
        |        count(value) AS nv FROM v GROUP BY 1),
        |r AS (SELECT event_type, value,
        |        row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
        |      FROM v WHERE value IS NOT NULL)
        |SELECT n.event_type, n.n_days,
        | round(max(CASE WHEN rn = greatest(CAST(ceil(0.5 * nv) AS BIGINT), 1) THEN value END), 4) AS p50,
        | round(max(CASE WHEN rn = greatest(CAST(ceil(0.9 * nv) AS BIGINT), 1) THEN value END), 4) AS p90,
        | round(max(CASE WHEN rn = greatest(CAST(ceil(0.99 * nv) AS BIGINT), 1) THEN value END), 4) AS p99
        |FROM n JOIN r ON r.event_type = n.event_type
        |GROUP BY n.event_type, n.n_days ORDER BY n.event_type""".stripMargin,

    // the flat-10.00 rebate is a double SUBTRACTION (bit-identical in
    // both engines); NULL-safe compares via IS NOT DISTINCT FROM mirror
    // Spark's <=>
    "q61_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |           WHERE o_orderkey % 10 <> 0),
        |n AS (SELECT o_orderkey,
        |        CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice - 10.0
        |             ELSE o_totalprice END AS o_totalprice,
        |        o_orderstatus
        |      FROM orders WHERE o_orderkey % 7 <> 0),
        |j AS (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |        CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |             WHEN n.o_orderkey IS NULL THEN 'removed'
        |             WHEN NOT (o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
        |                       AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
        |             THEN 'changed' END AS change_type,
        |        o.o_totalprice AS old_o_totalprice, o.o_orderstatus AS old_o_orderstatus,
        |        n.o_totalprice AS new_o_totalprice, n.o_orderstatus AS new_o_orderstatus
        |      FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey, change_type,
        | round(old_o_totalprice, 4) AS old_o_totalprice, old_o_orderstatus,
        | round(new_o_totalprice, 4) AS new_o_totalprice, new_o_orderstatus
        |FROM j WHERE change_type IS NOT NULL ORDER BY o_orderkey""".stripMargin,

    // SCD2: kept-current / closed / opened legs as explicit UNION ALL;
    // the update key sets (resegmented vs +10^6 inserts) are disjoint,
    // so the keep-latest collapse inside scd2Merge is a no-op here and
    // both engines see the same single-update-per-key batch
    "q62_scd2_merge" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment FROM customer),
        |dim AS (SELECT c_custkey, c_mktsegment,
        |          DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to FROM c),
        |upd AS (
        |  SELECT c_custkey, c_mktsegment || '_V2' AS c_mktsegment,
        |         DATE '2024-06-01' AS eff FROM c WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_mktsegment, DATE '2024-06-01'
        |  FROM c WHERE c_custkey % 97 = 1),
        |merged AS (
        |  SELECT d.c_custkey, d.c_mktsegment, d.valid_from, d.valid_to
        |  FROM dim d LEFT JOIN upd u ON d.c_custkey = u.c_custkey
        |  WHERE u.c_custkey IS NULL OR d.c_mktsegment IS NOT DISTINCT FROM u.c_mktsegment
        |  UNION ALL
        |  SELECT d.c_custkey, d.c_mktsegment, d.valid_from, u.eff
        |  FROM dim d JOIN upd u ON d.c_custkey = u.c_custkey
        |  WHERE NOT (d.c_mktsegment IS NOT DISTINCT FROM u.c_mktsegment)
        |  UNION ALL
        |  SELECT u.c_custkey, u.c_mktsegment, u.eff, CAST(NULL AS DATE)
        |  FROM upd u LEFT JOIN dim d ON d.c_custkey = u.c_custkey
        |  WHERE d.c_custkey IS NULL
        |     OR NOT (d.c_mktsegment IS NOT DISTINCT FROM u.c_mktsegment))
        |SELECT c_custkey, c_mktsegment, valid_from,
        | coalesce(valid_to, DATE '9999-12-31') AS valid_to
        |FROM merged ORDER BY c_custkey, valid_from""".stripMargin,

    // linear multi-touch: value/n split per conversion (event_id is the
    // shared conversion identity), credited to click days in the prior
    // 7 days, strictly before the purchase. Credits quantize to the
    // 1e-8 grid and sum as exact BIGINTs (the q33 scaled-long money
    // convention): day 2024-01-05's true sum is exactly 3491.31575 — a
    // 4dp grid tie that a double sum rounds engine-dependently
    "q63_linear_attribution" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |           FROM events),
        |t AS (SELECT user_id, ts AS touch_ts FROM e WHERE event_type = 'click'),
        |c AS (SELECT event_id AS conv_id, user_id, ts AS conv_ts, value FROM e
        |      WHERE event_type = 'purchase'),
        |j AS (SELECT c.conv_id, c.value, t.touch_ts
        |      FROM c JOIN t ON c.user_id = t.user_id
        |      WHERE t.touch_ts < c.conv_ts
        |        AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY),
        |w AS (SELECT *, count(*) OVER (PARTITION BY conv_id) AS n_touches FROM j)
        |SELECT CAST(touch_ts AS DATE) AS touch_day,
        | round(CAST(sum(CAST(round(value / n_touches * 100000000.0) AS BIGINT)) AS DOUBLE)
        |       / 100000000.0 + 1e-9, 4) AS credited_value,
        | count(*) AS n_credited_touches,
        | CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions
        |FROM w GROUP BY 1 ORDER BY touch_day""".stripMargin,

    // u_shaped multi-touch: 40% first / 40% last / middles share 20%,
    // ties broken on the touch event id; the weight CASE is plain IEEE
    // arithmetic mirrored from the Spark when-chain, credits take the
    // same scaled-long path as q63
    "q67_ushaped_attribution" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |           FROM events),
        |t AS (SELECT event_id AS touch_id, user_id, ts AS touch_ts FROM e
        |      WHERE event_type = 'click'),
        |c AS (SELECT event_id AS conv_id, user_id, ts AS conv_ts, value FROM e
        |      WHERE event_type = 'purchase'),
        |j AS (SELECT c.conv_id, c.value, t.touch_ts, t.touch_id
        |      FROM c JOIN t ON c.user_id = t.user_id
        |      WHERE t.touch_ts < c.conv_ts
        |        AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY),
        |w AS (SELECT *, count(*) OVER (PARTITION BY conv_id) AS n,
        |        row_number() OVER (PARTITION BY conv_id ORDER BY touch_ts, touch_id) AS pos
        |      FROM j),
        |k AS (SELECT conv_id, touch_ts, value *
        |        (CASE WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
        |              WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
        |              WHEN pos = 1 OR pos = n THEN CAST(0.4 AS DOUBLE)
        |              ELSE CAST(0.2 AS DOUBLE) / (n - 2) END) AS credit
        |      FROM w)
        |SELECT CAST(touch_ts AS DATE) AS touch_day,
        | round(CAST(sum(CAST(round(credit * 100000000.0) AS BIGINT)) AS DOUBLE)
        |       / 100000000.0 + 1e-9, 4) AS credited_value,
        | count(*) AS n_credited_touches,
        | CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions
        |FROM k GROUP BY 1 ORDER BY touch_day""".stripMargin,

    // repeated-paragraph boilerplate removal over derived pages (page p
    // = docs p..p+2 joined by newline): paragraphs in > 2 distinct
    // pages drop everywhere, pages reassemble in order (string_agg
    // ORDER BY pos = Spark's array_sort on (pos, para) structs); blank
    // paragraphs are filtered as whitespace on both engines
    "q68_paragraph_dedup" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |pages AS (SELECT d0.doc_id AS page_id,
        |            d0.text || chr(10) || d1.text || chr(10) || d2.text AS page_text
        |          FROM d d0
        |          JOIN d d1 ON d1.doc_id = d0.doc_id + 1
        |          JOIN d d2 ON d2.doc_id = d0.doc_id + 2),
        |p AS (SELECT page_id, pos, para FROM (
        |        SELECT page_id,
        |          unnest(range(1, len(parts) + 1)) AS pos,
        |          unnest(parts) AS para
        |        FROM (SELECT page_id, string_split(page_text, chr(10)) AS parts FROM pages))
        |      WHERE para <> ''),
        |hot AS (SELECT para FROM p GROUP BY para HAVING count(DISTINCT page_id) > 2),
        |kept AS (SELECT * FROM p WHERE para NOT IN (SELECT para FROM hot)),
        |r AS (SELECT page_id, string_agg(para, chr(10) ORDER BY pos) AS text,
        |        count(*) AS n_kept FROM kept GROUP BY 1),
        |np AS (SELECT page_id,
        |         len(list_filter(string_split(page_text, chr(10)), x -> x <> '')) AS n_paras
        |       FROM pages)
        |SELECT np.page_id AS page_id, coalesce(r.text, '') AS text,
        | CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
        | CAST(np.n_paras - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped
        |FROM np LEFT JOIN r ON np.page_id = r.page_id
        |ORDER BY np.page_id""".stripMargin,

    // ExactSubstr span removal: 6-token windows shared by >= 2 docs cut
    // from ALL docs. The census key differs by design — Spark hashes
    // windows (xxhash64), the oracle uses the window STRING — because
    // hotness only needs EQUALITY within each engine; the removed spans
    // (and so the output text) agree unless xxhash64 collides, which
    // the hash-compare would surface. Positions stay dense (empty split
    // tokens kept) so the trailing coverage window sees identical spans
    "q70_span_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS parts FROM documents),
        |w AS (SELECT doc_id,
        |        unnest(range(0, greatest(len(parts) - 6 + 1, 0))) AS wstart,
        |        unnest(list_transform(range(0, greatest(len(parts) - 6 + 1, 0)),
        |          i -> array_to_string(parts[i+1:i+6], ' '))) AS win
        |      FROM d),
        |hot AS (SELECT win FROM w GROUP BY win HAVING count(DISTINCT doc_id) > 1),
        |hs AS (SELECT w.doc_id, w.wstart, (hot.win IS NOT NULL) AS h
        |       FROM w LEFT JOIN hot ON w.win = hot.win),
        |t AS (SELECT doc_id, unnest(range(0, len(parts))) AS pos, unnest(parts) AS tok FROM d),
        |cov AS (SELECT t.doc_id, t.pos, t.tok,
        |         max(CASE WHEN coalesce(hs.h, false) THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY t.doc_id ORDER BY t.pos
        |                 ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS c
        |        FROM t LEFT JOIN hs ON hs.doc_id = t.doc_id AND hs.wstart = t.pos),
        |r AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
        |        count(*) AS n_kept
        |      FROM cov WHERE c = 0 GROUP BY doc_id),
        |nt AS (SELECT doc_id, len(parts) AS n_tokens FROM d)
        |SELECT nt.doc_id AS doc_id, coalesce(r.text, '') AS text,
        | CAST(nt.n_tokens AS BIGINT) AS n_tokens,
        | CAST(nt.n_tokens - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
        |FROM nt LEFT JOIN r ON nt.doc_id = r.doc_id
        |ORDER BY nt.doc_id""".stripMargin,

    // q76: the day-2 paragraph probe — q68's derived-page oracle with
    // the census boundary reproduced (corpus pages feed counts only,
    // batch pages reassemble; hotness = the two sides' distinct-page
    // counts summing past maxDocs=2). Completes the oracle-backed
    // day-2 probe family: q71 minhash, q75 span, q76 paragraph.
    "q76_paragraph_census_probe" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |pages AS (SELECT d0.doc_id AS page_id,
        |            d0.text || chr(10) || d1.text || chr(10) || d2.text AS page_text
        |          FROM d d0
        |          JOIN d d1 ON d1.doc_id = d0.doc_id + 1
        |          JOIN d d2 ON d2.doc_id = d0.doc_id + 2),
        |pb AS (SELECT * FROM pages WHERE page_id % 5 = 0),
        |pc AS (SELECT * FROM pages WHERE page_id % 5 <> 0),
        |p AS (SELECT page_id, pos, para FROM (
        |        SELECT page_id,
        |          unnest(range(1, len(parts) + 1)) AS pos,
        |          unnest(parts) AS para
        |        FROM (SELECT page_id, string_split(page_text, chr(10)) AS parts FROM pb))
        |      WHERE para <> ''),
        |cp AS (SELECT page_id, para FROM (
        |        SELECT page_id, unnest(string_split(page_text, chr(10))) AS para FROM pc)
        |       WHERE para <> ''),
        |cn AS (SELECT para, count(DISTINCT page_id) AS n FROM cp GROUP BY para),
        |bn AS (SELECT para, count(DISTINCT page_id) AS n FROM p GROUP BY para),
        |hot AS (SELECT bn.para FROM bn LEFT JOIN cn ON cn.para = bn.para
        |        WHERE bn.n + coalesce(cn.n, 0) > 2),
        |kept AS (SELECT * FROM p WHERE para NOT IN (SELECT para FROM hot)),
        |r AS (SELECT page_id, string_agg(para, chr(10) ORDER BY pos) AS text,
        |        count(*) AS n_kept FROM kept GROUP BY 1),
        |np AS (SELECT page_id,
        |         len(list_filter(string_split(page_text, chr(10)), x -> x <> '')) AS n_paras
        |       FROM pb)
        |SELECT np.page_id AS page_id, coalesce(r.text, '') AS text,
        | CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
        | CAST(np.n_paras - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped
        |FROM np LEFT JOIN r ON np.page_id = r.page_id
        |ORDER BY np.page_id""".stripMargin,

    // q75: the day-2 span probe — q70's oracle with the census boundary
    // reproduced: corpus windows (doc_id % 5 <> 0) feed counts only, the
    // batch (doc_id % 5 = 0) tokenizes/covers/reassembles, and a window
    // is hot when the two sides' distinct-doc counts SUM past maxDocs=1
    // — exactly dropRepeatedSpansAgainstCensus's cross-boundary rule.
    // Same independent string-keyed census as q70: the hash match
    // certifies the probe semantics, not the hash function.
    "q75_span_census_probe" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS parts FROM documents),
        |db AS (SELECT * FROM d WHERE doc_id % 5 = 0),
        |dc AS (SELECT * FROM d WHERE doc_id % 5 <> 0),
        |wb AS (SELECT doc_id,
        |        unnest(range(0, greatest(len(parts) - 6 + 1, 0))) AS wstart,
        |        unnest(list_transform(range(0, greatest(len(parts) - 6 + 1, 0)),
        |          i -> array_to_string(parts[i+1:i+6], ' '))) AS win
        |      FROM db),
        |wc AS (SELECT doc_id,
        |        unnest(list_transform(range(0, greatest(len(parts) - 6 + 1, 0)),
        |          i -> array_to_string(parts[i+1:i+6], ' '))) AS win
        |      FROM dc),
        |cn AS (SELECT win, count(DISTINCT doc_id) AS n FROM wc GROUP BY win),
        |bn AS (SELECT win, count(DISTINCT doc_id) AS n FROM wb GROUP BY win),
        |hot AS (SELECT bn.win FROM bn LEFT JOIN cn ON cn.win = bn.win
        |        WHERE bn.n + coalesce(cn.n, 0) > 1),
        |hs AS (SELECT wb.doc_id, wb.wstart, (hot.win IS NOT NULL) AS h
        |       FROM wb LEFT JOIN hot ON wb.win = hot.win),
        |t AS (SELECT doc_id, unnest(range(0, len(parts))) AS pos, unnest(parts) AS tok FROM db),
        |cov AS (SELECT t.doc_id, t.pos, t.tok,
        |         max(CASE WHEN coalesce(hs.h, false) THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY t.doc_id ORDER BY t.pos
        |                 ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS c
        |        FROM t LEFT JOIN hs ON hs.doc_id = t.doc_id AND hs.wstart = t.pos),
        |r AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
        |        count(*) AS n_kept
        |      FROM cov WHERE c = 0 GROUP BY doc_id),
        |nt AS (SELECT doc_id, len(parts) AS n_tokens FROM db)
        |SELECT nt.doc_id AS doc_id, coalesce(r.text, '') AS text,
        | CAST(nt.n_tokens AS BIGINT) AS n_tokens,
        | CAST(nt.n_tokens - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
        |FROM nt LEFT JOIN r ON nt.doc_id = r.doc_id
        |ORDER BY nt.doc_id""".stripMargin,

    // every rule is a conditional sum over ONE aggregate row, unpivoted;
    // passed compares the ROUNDED pct so both engines agree at the
    // tolerance boundary
    "q65_data_quality" ->
      """WITH a AS (SELECT count(*) AS n,
        |  sum(CASE WHEN coalesce(o_totalprice <= 0, true) THEN 1 ELSE 0 END) AS v_nonpositive_price,
        |  sum(CASE WHEN coalesce(o_totalprice > 400000, true) THEN 1 ELSE 0 END) AS v_price_above_cap,
        |  sum(CASE WHEN coalesce(o_orderstatus NOT IN ('O','F','P'), true) THEN 1 ELSE 0 END) AS v_unknown_status,
        |  sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS v_null_priority,
        |  sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS v_null_date
        | FROM orders),
        |u AS (
        |  SELECT 'nonpositive_price' AS rule, v_nonpositive_price AS n_violations, n AS n_rows FROM a
        |  UNION ALL SELECT 'price_above_cap', v_price_above_cap, n FROM a
        |  UNION ALL SELECT 'unknown_status', v_unknown_status, n FROM a
        |  UNION ALL SELECT 'null_priority', v_null_priority, n FROM a
        |  UNION ALL SELECT 'null_date', v_null_date, n FROM a)
        |SELECT rule, CAST(n_violations AS BIGINT) AS n_violations, n_rows,
        | round(n_violations * 100.0 / n_rows, 4) AS violation_pct,
        | round(n_violations * 100.0 / n_rows, 4) <= 1.0 AS passed
        |FROM u ORDER BY rule""".stripMargin,

    // q66 shares q09's oracle VERBATIM: the Spark side re-derives each
    // session's membership through the keyed binned interval join and
    // rolls it up — hash-matching the sessionizer's truth reconciles
    // two independent computations of the same windows
    "q66_session_attribution" -> sessionSql,

    // q95: the WHOLE text→vector→verdict pipeline from scratch — the
    // embedding components are exact ±1 integer sums keyed off md5
    // bits (engine-portable by construction), so the oracle rebuilds
    // the projection per (doc, dim), assembles ordered vectors, and
    // replays q85's assignment + within-cell verdict on top
    "q95_text_embed_neardup" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |th AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM toks),
        |comp AS (SELECT doc_id, j,
        |    CAST(sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS DOUBLE) AS cmp
        |  FROM th CROSS JOIN generate_series(0, 59) AS dims(j)
        |  GROUP BY doc_id, j),
        |e AS (SELECT doc_id AS vec_id, list(cmp ORDER BY j) AS v
        |      FROM comp GROUP BY doc_id),
        |c AS (SELECT CAST(vec_id AS INT) AS cell, v AS cvec,
        |        list_dot_product(v, v) AS c2
        |      FROM e WHERE vec_id < 16),
        |asg AS (SELECT vec_id, cell FROM (
        |         SELECT e.vec_id, c.cell,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY c.c2 - 2.0 * list_dot_product(e.v, c.cvec) ASC,
        |                      c.cell ASC) AS rn
        |         FROM e CROSS JOIN c) WHERE rn = 1),
        |m AS (SELECT a.vec_id, a.cell, e.v,
        |        sqrt(list_dot_product(e.v, e.v)) AS nrm
        |      FROM asg a JOIN e ON e.vec_id = a.vec_id),
        |dups AS (SELECT id_b AS vec_id, min(id_a) AS dup_of FROM (
        |          SELECT x.vec_id AS id_a, y.vec_id AS id_b,
        |            round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 4) AS cos
        |          FROM m x JOIN m y ON x.cell = y.cell AND x.vec_id < y.vec_id)
        |         WHERE cos >= 0.92 GROUP BY 1)
        |SELECT m.vec_id, m.cell, d.vec_id IS NOT NULL AS is_dup, d.dup_of
        |FROM m LEFT JOIN dups d ON d.vec_id = m.vec_id
        |ORDER BY m.vec_id""".stripMargin,

    // q96: time-decay attribution — the transcendental 0.5^x weight is
    // plain IEEE on exact inputs (µs-epoch age differences relative to
    // the conversion's newest touch), quantizes to a 1e9 grid BEFORE
    // normalization so the weight denominator is an exact long sum,
    // and credits ride q63's scaled-long/decimal path
    "q96_timedecay_attribution" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |           FROM events),
        |t AS (SELECT user_id, ts AS touch_ts FROM e WHERE event_type = 'click'),
        |c AS (SELECT event_id AS conv_id, user_id, ts AS conv_ts, value FROM e
        |      WHERE event_type = 'purchase'),
        |j AS (SELECT c.conv_id, c.value, c.conv_ts, t.touch_ts
        |      FROM c JOIN t ON c.user_id = t.user_id
        |      WHERE t.touch_ts < c.conv_ts
        |        AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY),
        |a AS (SELECT *, (epoch_us(conv_ts) / 1000000.0
        |                 - epoch_us(touch_ts) / 1000000.0) / 86400.0 AS age FROM j),
        |m AS (SELECT *, min(age) OVER (PARTITION BY conv_id) AS min_age FROM a),
        |r AS (SELECT *, CAST(round(power(0.5, (age - min_age) / 2.0) * 1.0e9)
        |                     AS BIGINT) AS raw_s FROM m),
        |w AS (SELECT *, CAST(raw_s AS DOUBLE)
        |                / CAST(sum(raw_s) OVER (PARTITION BY conv_id) AS DOUBLE) AS w
        |      FROM r)
        |SELECT CAST(touch_ts AS DATE) AS touch_day,
        | round(CAST(sum(CAST(round(value * w * 100000000.0) AS BIGINT)) AS DOUBLE)
        |       / 100000000.0 + 1e-9, 4) AS credited_value,
        | count(*) AS n_credited_touches,
        | CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions
        |FROM w GROUP BY 1 ORDER BY touch_day""".stripMargin,

    // q97: the composed ingest gate replayed from scratch — the same
    // planted corruption, TRY_CAST coercions (null-on-unparseable on
    // both engines), the NULL-typed missing column, and q65's
    // conditional-aggregate + stack shape. Values that are NOT mangled
    // round-trip through each engine's own string format back to the
    // identical double/date, so the violation counts are exact.
    "q97_ingest_gate" ->
      """WITH staging AS (SELECT
        |    CAST(o_orderkey AS VARCHAR) AS k,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'N/A'
        |         ELSE CAST(o_totalprice AS VARCHAR) END AS p,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'not-a-date'
        |         ELSE CAST(o_orderdate AS VARCHAR) END AS d,
        |    o_orderstatus AS st
        |  FROM orders),
        |typed AS (SELECT TRY_CAST(p AS DOUBLE) AS p, TRY_CAST(d AS DATE) AS d,
        |    st, CAST(NULL AS VARCHAR) AS channel FROM staging),
        |a AS (SELECT count(*) AS n,
        |  sum(CASE WHEN p IS NULL THEN 1 ELSE 0 END) AS v_unparseable_price,
        |  sum(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS v_unparseable_date,
        |  sum(CASE WHEN coalesce(p <= 0, true) THEN 1 ELSE 0 END) AS v_nonpositive_price,
        |  sum(CASE WHEN coalesce(st NOT IN ('O','F','P'), true) THEN 1 ELSE 0 END) AS v_unknown_status,
        |  sum(CASE WHEN channel IS NULL THEN 1 ELSE 0 END) AS v_missing_channel
        | FROM typed),
        |u AS (
        |  SELECT 'unparseable_price' AS rule, v_unparseable_price AS n_violations, n AS n_rows FROM a
        |  UNION ALL SELECT 'unparseable_date', v_unparseable_date, n FROM a
        |  UNION ALL SELECT 'nonpositive_price', v_nonpositive_price, n FROM a
        |  UNION ALL SELECT 'unknown_status', v_unknown_status, n FROM a
        |  UNION ALL SELECT 'missing_channel', v_missing_channel, n FROM a)
        |SELECT rule, CAST(n_violations AS BIGINT) AS n_violations, n_rows,
        | round(n_violations * 100.0 / n_rows, 4) AS violation_pct,
        | round(n_violations * 100.0 / n_rows, 4) <= 20.0 AS passed
        |FROM u ORDER BY rule""".stripMargin,

    // q98: the day-2 SemDeDup probe replayed from scratch — the q71
    // 80/20 split, corpus-side formula centroids, BOTH assignment
    // argmins, cell-blocked pairing, rounded-cosine verdict and the
    // -1 sentinels
    "q98_semantic_dedup_probe" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |corp AS (SELECT * FROM e WHERE vec_id % 5 <> 4),
        |bat AS (SELECT * FROM e WHERE vec_id % 5 = 4),
        |c AS (SELECT CAST(vec_id AS INT) AS cell, v AS cvec,
        |        list_dot_product(v, v) AS c2
        |      FROM corp WHERE vec_id < 16),
        |asgc AS (SELECT vec_id, cell FROM (
        |         SELECT corp.vec_id, c.cell,
        |           row_number() OVER (PARTITION BY corp.vec_id
        |             ORDER BY c.c2 - 2.0 * list_dot_product(corp.v, c.cvec) ASC,
        |                      c.cell ASC) AS rn
        |         FROM corp CROSS JOIN c) WHERE rn = 1),
        |asgb AS (SELECT vec_id, cell FROM (
        |         SELECT bat.vec_id, c.cell,
        |           row_number() OVER (PARTITION BY bat.vec_id
        |             ORDER BY c.c2 - 2.0 * list_dot_product(bat.v, c.cvec) ASC,
        |                      c.cell ASC) AS rn
        |         FROM bat CROSS JOIN c) WHERE rn = 1),
        |m AS (SELECT a.vec_id, a.cell, corp.v,
        |        sqrt(list_dot_product(corp.v, corp.v)) AS nrm
        |      FROM asgc a JOIN corp ON corp.vec_id = a.vec_id),
        |b AS (SELECT a.vec_id, a.cell, bat.v,
        |        sqrt(list_dot_product(bat.v, bat.v)) AS nrm
        |      FROM asgb a JOIN bat ON bat.vec_id = a.vec_id),
        |pairs AS (SELECT b.vec_id AS bv, m.vec_id AS m_id,
        |            round(list_dot_product(b.v, m.v) / (b.nrm * m.nrm), 4) AS cos
        |          FROM b JOIN m ON m.cell = b.cell),
        |mt AS (SELECT bv AS vec_id, min(m_id) AS dup_of, max(cos) AS best
        |       FROM pairs WHERE cos >= 0.25 GROUP BY 1)
        |SELECT b.vec_id, b.cell, mt.vec_id IS NOT NULL AS is_dup,
        |  coalesce(mt.dup_of, -1) AS dup_of,
        |  coalesce(mt.best, -1.0) AS best_cos
        |FROM b LEFT JOIN mt ON mt.vec_id = b.vec_id
        |ORDER BY b.vec_id""".stripMargin,

    // q99: CCNet terciles — the q46 score (already ln-parity-proven)
    // feeds a bin-table bucket rule: integer cumulative counts, one
    // exact division whose floor boundaries are exact integer
    // quotients, bin-level assignment (a score bin never splits)
    "q99_perplexity_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok, CAST(count(*) AS DOUBLE) AS c FROM toks GROUP BY 1),
        |tot AS (SELECT sum(c) AS t FROM vocab),
        |scored AS (
        |  SELECT d.doc_id, round(avg(ln(v.c / (SELECT t FROM tot))), 4) AS avg_logprob
        |  FROM toks d JOIN vocab v USING (tok)
        |  GROUP BY d.doc_id),
        |sl AS (SELECT s.doc_id, d2.lang, s.avg_logprob
        |       FROM scored s JOIN documents d2 USING (doc_id)),
        |bins AS (SELECT lang, avg_logprob, count(*) AS bn FROM sl GROUP BY 1, 2),
        |lab AS (SELECT lang, avg_logprob,
        |          coalesce(sum(bn) OVER (PARTITION BY lang
        |            ORDER BY avg_logprob DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
        |          sum(bn) OVER (PARTITION BY lang) AS nl
        |        FROM bins),
        |lab2 AS (SELECT lang, avg_logprob,
        |           CASE CAST(floor(cb * 3 / nl) AS INT)
        |             WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail'
        |           END AS bucket
        |         FROM lab)
        |SELECT s.doc_id, s.lang, s.avg_logprob, l.bucket
        |FROM sl s JOIN lab2 l ON l.lang = s.lang AND l.avg_logprob = s.avg_logprob
        |ORDER BY s.doc_id""".stripMargin,

    // q100: Gopher repetition signals — every ratio is exact integers
    // over exact integers (counts, gram lengths, char lengths), the
    // top-gram tie breaks lexicographically, and the flag compares the
    // ROUNDED values, so the whole filter replays from raw rows
    "q100_repetition_signals" ->
      """WITH d AS (SELECT doc_id, length(trim(text)) AS n_chars,
        |             regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |tok AS (SELECT doc_id, n_chars, unnest(w) AS tok,
        |          unnest(generate_series(1, len(w))) AS pos FROM d),
        |ts AS (SELECT doc_id, max(n_chars) AS n_chars, count(*) AS n_tokens,
        |         count(DISTINCT tok) AS nd FROM tok GROUP BY 1),
        |bc AS (SELECT t0.doc_id, t0.tok || ' ' || t1.tok AS g, count(*) AS c
        |       FROM tok t0 JOIN tok t1
        |         ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
        |       GROUP BY 1, 2),
        |top AS (SELECT doc_id, c AS topc, g AS top_g FROM (
        |        SELECT *, row_number() OVER (PARTITION BY doc_id
        |          ORDER BY c DESC, g ASC) AS rn FROM bc) WHERE rn = 1),
        |mass AS (SELECT doc_id, sum(c * length(g)) AS tot,
        |           sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END) AS dup
        |         FROM bc GROUP BY 1),
        |o AS (SELECT ts.doc_id, ts.n_tokens,
        |  round(CAST(ts.n_tokens - ts.nd AS DOUBLE) / ts.n_tokens, 4) AS dup_token_frac,
        |  coalesce(top.top_g, '') AS top_bigram,
        |  round(CAST(coalesce(top.topc * length(top.top_g), 0) AS DOUBLE)
        |        / greatest(ts.n_chars, 1), 4) AS top2_char_frac,
        |  round(CAST(coalesce(mass.dup, 0) AS DOUBLE)
        |        / greatest(coalesce(mass.tot, 0), 1), 4) AS dup2_mass_frac
        | FROM ts LEFT JOIN top ON top.doc_id = ts.doc_id
        |         LEFT JOIN mass ON mass.doc_id = ts.doc_id)
        |SELECT *, (dup_token_frac > 0.80 OR top2_char_frac > 0.20
        |           OR dup2_mass_frac > 0.60) AS flagged
        |FROM o ORDER BY doc_id""".stripMargin,

    // q101: DSIR selection — bucket hash, Laplace log-ratio, Gumbel
    // draw, and the top-k key are all the established md5/ln-parity
    // conventions (15-hex bucket, 13-hex 52-bit uniform + 0.5 center,
    // 1e-8 scaled-long quantization, exact integer sums), so the
    // selected SET, its scores, and its ranking replay exactly
    "q101_dsir_selection" -> dsirSelectionSql,

    // q128: the day-2 DSIR growth path — fit-in-halves (count form) +
    // mergeDsirModels (exact long adds) + ratios from the merged
    // counts. The oracle is q101's full-corpus derivation VERBATIM:
    // merge-equals-refit is the contract, bit-exact because counts sum
    // as longs before any log is taken (the q112 NB convention).
    "q128_dsir_incremental" -> dsirSelectionSql,

    // q127: the END-TO-END corpus build — the oracle re-serializes the
    // line-dressed donor-planted WET chunks (q120/q121's serialization
    // + q102's dressing + q116's donor rule) and replays ALL SIX
    // stages from raw rows: parse/quarantine/blocklist/URL-election
    // (the q121 derivation verbatim, rec_id on the shift-32 encoding),
    // the line rules (q102 verbatim), the post-clean min-id text
    // election, the integer-exact word-window + 4-dp dup-fraction
    // gate, the q118 temperature rate chain under the portable md5
    // draw, and the q124 packing windows with exclusive-prefix offsets
    "q127_corpus_build" ->
      (s"""WITH dn AS (
         |  SELECT d.doc_id, d.source,
         |    CASE WHEN d.doc_id % 10 = 9 THEN o.text ELSE d.text END AS body
         |  FROM documents d LEFT JOIN documents o ON o.doc_id = d.doc_id - 4),
         |pg AS (
         |  SELECT doc_id, source,
         |    body || '.' || chr(10) ||
         |    'Please enable JavaScript and cookies to continue viewing.' || chr(10) ||
         |    'continue reading more about' || chr(10) ||
         |    'Copyright 2024 Example Corp id ' || CAST(doc_id AS VARCHAR) || '.' || chr(10) ||
         |    'BREAKING NEWS ALERT READ THIS NOW!' || chr(10) ||
         |    'Click here.' AS page
         |  FROM dn),
         |rec AS (
         |  SELECT doc_id, doc_id % 25 AS chunk_id,
         |    'WARC/1.0' || chr(10) ||
         |    'WARC-Type: conversion' || chr(10) ||
         |    'WARC-Target-URI: https://' || source || '.example.com/articles/'
         |      || CAST(doc_id % 100 AS VARCHAR) || chr(10) ||
         |    'WARC-Date: 2024-01-01T00:00:00Z' || chr(10) ||
         |    'Content-Length: ' || CAST(CASE WHEN doc_id % 7 = 0 THEN strlen(page) + 5
         |                                    ELSE strlen(page) END AS VARCHAR) || chr(10) ||
         |    chr(10) || page || chr(10) || chr(10) AS r
         |  FROM pg),
         |chunks AS (
         |  SELECT chunk_id,
         |         'warcinfo preamble' || chr(10) || string_agg(r, '' ORDER BY doc_id) AS content
         |  FROM rec GROUP BY 1),
         |f AS (SELECT chunk_id, string_split(content, 'WARC/1.0' || chr(10)) AS fs FROM chunks),
         |e2 AS (SELECT chunk_id, unnest(fs) AS frag, generate_subscripts(fs, 1) AS gi FROM f),
         |g2 AS (SELECT chunk_id, gi - 1 AS rec_idx, frag,
         |        strpos(frag, chr(10) || chr(10)) AS p
         |      FROM e2 WHERE gi >= 2 AND strpos(frag, chr(10) || chr(10)) > 0),
         |h2 AS (SELECT chunk_id, rec_idx,
         |        substr(frag, 1, p - 1) AS hdr,
         |        regexp_replace(substr(frag, p + 2), '\\n\\n$$', '') AS payload
         |      FROM g2),
         |pp AS (SELECT chunk_id * 4294967296 + rec_idx AS rec_id,
         |        regexp_extract(hdr, '(?m)^WARC-Target-URI: (.*)$$', 1) AS uri,
         |        payload,
         |        coalesce(strlen(payload) = TRY_CAST(regexp_extract(hdr, '(?m)^Content-Length: ([0-9]+)$$', 1) AS BIGINT), false) AS length_ok
         |      FROM h2),
         |hh AS (SELECT *, regexp_extract(uri, '^https://([^/]*)', 1) AS host FROM pp),
         |bl AS (SELECT unnest([${Urls.docBlocklist.map(p => s"'$p'").mkString(", ")}]) AS b),
         |hits AS (SELECT DISTINCT hh.rec_id FROM hh
         |         JOIN bl ON hh.host = bl.b OR hh.host LIKE '%.' || bl.b),
         |cc AS (SELECT hh.*, (t.rec_id IS NOT NULL) AS blocked
         |       FROM hh LEFT JOIN hits t USING (rec_id)),
         |el AS (SELECT *,
         |        min(CASE WHEN length_ok AND uri <> '' AND NOT blocked THEN rec_id END)
         |          OVER (PARTITION BY uri) AS keep
         |       FROM cc),
         |kept AS (SELECT rec_id, host, payload FROM el
         |         WHERE length_ok AND uri <> '' AND NOT blocked AND rec_id = keep),
         |arr AS (SELECT rec_id, host, string_split(payload, chr(10)) AS ls FROM kept),
         |ln AS (SELECT rec_id, host, trim(unnest(ls)) AS l,
         |         unnest(generate_series(1, len(ls))) AS pos FROM arr),
         |lf AS (SELECT rec_id, host, l, pos,
         |         (regexp_matches(l, '[.!?"]$$')
         |          AND len(string_split_regex(l, '\\s+')) >= 3
         |          AND NOT (contains(lower(l), 'javascript')
         |                OR contains(lower(l), 'cookie')
         |                OR contains(lower(l), 'all rights reserved')
         |                OR contains(lower(l), 'copyright')
         |                OR contains(lower(l), '©'))
         |          AND length(regexp_replace(l, '[^A-Z]', '', 'g')) * 100
         |              <= length(l) * 40) AS keepl
         |       FROM ln WHERE l <> ''),
         |cl AS (SELECT rec_id, any_value(host) AS host,
         |         coalesce(string_agg(l, chr(10) ORDER BY pos) FILTER (WHERE keepl), '') AS clean_text
         |       FROM lf GROUP BY 1),
         |dd AS (SELECT *, min(rec_id) OVER (PARTITION BY clean_text) AS keep2 FROM cl),
         |sv AS (SELECT rec_id, host, clean_text FROM dd WHERE rec_id = keep2),
         |gt AS (SELECT rec_id, host,
         |        CASE WHEN trim(clean_text) = '' THEN CAST(0 AS BIGINT)
         |             ELSE CAST(len(string_split_regex(trim(lower(clean_text)), '\\s+')) AS BIGINT) END AS n_tokens,
         |        CASE WHEN trim(clean_text) = '' THEN 1.0
         |             ELSE round(CAST(len(string_split_regex(trim(lower(clean_text)), '\\s+'))
         |                           - len(list_distinct(string_split_regex(trim(lower(clean_text)), '\\s+'))) AS DOUBLE)
         |                        / len(string_split_regex(trim(lower(clean_text)), '\\s+')), 4) END AS dupfrac
         |       FROM sv),
         |gd AS (SELECT rec_id, host, n_tokens FROM gt
         |       WHERE n_tokens >= 20 AND n_tokens <= 200 AND dupfrac <= 0.65),
         |c3 AS (SELECT host, CAST(count(*) AS BIGINT) AS ns FROM gd GROUP BY 1),
         |t3 AS (SELECT host, ns,
         |         CAST(round(pow(CAST(ns AS DOUBLE), 0.5) * 1000000.0) AS BIGINT) AS ts3 FROM c3),
         |z3 AS (SELECT CAST(sum(ts3) AS BIGINT) AS z FROM t3),
         |r3 AS (SELECT host,
         |         least(1.0, 40.0 * (CAST(ts3 AS DOUBLE) / CAST((SELECT z FROM z3) AS DOUBLE))
         |                    / CAST(ns AS DOUBLE)) AS rate FROM t3),
         |mx AS (SELECT gd.rec_id, gd.n_tokens FROM gd JOIN r3 USING (host)
         |       WHERE CAST(('0x' || substr(md5(CAST(gd.rec_id AS VARCHAR) || ':13'), 1, 13)) AS BIGINT)
         |             / 4503599627370496.0 < rate),
         |pk AS (SELECT rec_id, n_tokens, CAST(rec_id % 8 AS INTEGER) AS shard FROM mx),
         |cm AS (SELECT rec_id, shard, n_tokens,
         |         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY rec_id
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |       FROM pk),
         |ch AS (SELECT *, CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 2048) AS BIGINT) AS chunk FROM cm),
         |o3 AS (SELECT *, (cum - n_tokens) - min(cum - n_tokens) OVER (PARTITION BY shard, chunk) AS off FROM ch)
         |SELECT shard, chunk, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |       array_to_string(list(rec_id ORDER BY rec_id), ',') AS doc_ids,
         |       array_to_string(list(off ORDER BY rec_id), ',') AS offsets
         |FROM o3 GROUP BY 1, 2 ORDER BY shard, chunk""").stripMargin,

    // q102: C4/RefinedWeb line rules — the oracle rebuilds the planted
    // six-line page and re-derives every verdict (terminal punct, word
    // count, phrase list, exact-integer uppercase ratio); clean_text
    // reassembles in line order, coalesced to '' when nothing survives
    // (the Spark array_join convention)
    "q102_line_filter" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || '.' || chr(10) ||
        |    'Please enable JavaScript and cookies to continue viewing.' || chr(10) ||
        |    'continue reading more about' || chr(10) ||
        |    'Copyright 2024 Example Corp id ' || CAST(doc_id AS VARCHAR) || '.' || chr(10) ||
        |    'BREAKING NEWS ALERT READ THIS NOW!' || chr(10) ||
        |    'Click here.' AS text
        |  FROM documents),
        |arr AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM p),
        |ln AS (SELECT doc_id, trim(unnest(ls)) AS l,
        |         unnest(generate_series(1, len(ls))) AS pos
        |       FROM arr),
        |nb AS (SELECT doc_id, l, pos,
        |         (regexp_matches(l, '[.!?"]$')
        |          AND len(string_split_regex(l, '\s+')) >= 3
        |          AND NOT (contains(lower(l), 'javascript')
        |                OR contains(lower(l), 'cookie')
        |                OR contains(lower(l), 'all rights reserved')
        |                OR contains(lower(l), 'copyright')
        |                OR contains(lower(l), '©'))
        |          AND length(regexp_replace(l, '[^A-Z]', '', 'g')) * 100
        |              <= length(l) * 40) AS keep
        |       FROM ln WHERE l <> '')
        |SELECT doc_id, count(*) AS n_lines,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(l, chr(10) ORDER BY pos) FILTER (WHERE keep), '') AS clean_text
        |FROM nb GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // q103: Gopher page filters — every signal is exact integers over
    // exact integers (token/line counts, char lengths, distinct
    // stopwords), ratios round on the 4-dp grid and the verdict ANDs
    // the ROUNDED values (the q100 convention)
    "q103_gopher_filters" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    concat_ws(chr(10), text, '- first bullet item',
        |      CASE WHEN doc_id % 2 = 0
        |        THEN '- second bullet item' || chr(10) || '- third bullet item' END,
        |      CASE WHEN doc_id % 3 = 0
        |        THEN 'the story continues next week...' END,
        |      CASE WHEN doc_id % 5 <> 1
        |        THEN 'to be continued with that and more of the usual' END) AS text
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w FROM p),
        |ts AS (SELECT doc_id, count(*) AS n, sum(length(w)) AS sl,
        |         sum(CASE WHEN regexp_matches(w, '[A-Za-z]') THEN 1 ELSE 0 END) AS aw
        |       FROM tok GROUP BY 1),
        |sh AS (SELECT doc_id, count(DISTINCT lower(w)) AS stop_hits FROM tok
        |       WHERE lower(w) IN ('the','be','to','of','and','that','have','with')
        |       GROUP BY 1),
        |sy AS (SELECT doc_id,
        |         len(regexp_extract_all(trim(text), '#'))
        |         + len(regexp_extract_all(trim(text), '\.\.\.'))
        |         + len(regexp_extract_all(trim(text), '…')) AS sym
        |       FROM p),
        |ln AS (SELECT doc_id, trim(unnest(string_split(text, chr(10)))) AS l FROM p),
        |ls AS (SELECT doc_id, count(*) AS nl,
        |         sum(CASE WHEN regexp_matches(l, '^[-*•]') THEN 1 ELSE 0 END) AS bl,
        |         sum(CASE WHEN regexp_matches(l, '(\.\.\.|…)$') THEN 1 ELSE 0 END) AS el
        |       FROM ln WHERE l <> '' GROUP BY 1),
        |o AS (SELECT ts.doc_id, ts.n AS n_tokens,
        |        round(CAST(ts.sl AS DOUBLE) / ts.n, 4) AS mean_word_len,
        |        round(CAST(sy.sym AS DOUBLE) / ts.n, 4) AS symbol_ratio,
        |        round(CAST(coalesce(ls.bl, 0) AS DOUBLE) / greatest(coalesce(ls.nl, 0), 1), 4) AS bullet_frac,
        |        round(CAST(coalesce(ls.el, 0) AS DOUBLE) / greatest(coalesce(ls.nl, 0), 1), 4) AS ellipsis_frac,
        |        round(CAST(ts.aw AS DOUBLE) / ts.n, 4) AS alpha_frac,
        |        CAST(coalesce(sh.stop_hits, 0) AS BIGINT) AS stop_hits
        |      FROM ts JOIN sy ON sy.doc_id = ts.doc_id
        |        LEFT JOIN ls ON ls.doc_id = ts.doc_id
        |        LEFT JOIN sh ON sh.doc_id = ts.doc_id)
        |SELECT *, (n_tokens BETWEEN 20 AND 100000
        |           AND mean_word_len BETWEEN 3.0 AND 10.0
        |           AND symbol_ratio <= 0.10
        |           AND bullet_frac <= 0.50
        |           AND ellipsis_frac <= 0.30
        |           AND alpha_frac >= 0.80
        |           AND stop_hits >= 2) AS pass
        |FROM o ORDER BY doc_id""".stripMargin,

    // q104: mojibake repair — the oracle is GENERATED from the same
    // fix table the operator folds over (one CTE per repair, counting
    // before replacing, exactly the operator's sequential semantics),
    // so the two engines cannot apply different tables by accident
    "q104_fix_mojibake" -> mojibakeOracleSql,

    // q105: URL canonicalization + canonical-URL dedup — the oracle
    // rebuilds the same planted messy URLs, re-derives the canonical
    // form rule by rule (shared regex pieces + the shared tracking-
    // param list), and re-elects keepers, so every canonicalization
    // rule is hash-checked, not just exercised
    "q105_url_dedup" -> (urlCanonCtes +
      """,
        |rep AS (SELECT canon_url, min(doc_id) AS keep FROM p5 GROUP BY 1)
        |SELECT c.doc_id, c.canon_url, (c.doc_id <> r.keep) AS is_dup,
        |       CAST(CASE WHEN c.doc_id <> r.keep THEN r.keep ELSE -1 END AS BIGINT) AS dup_of
        |FROM p5 c JOIN rep r USING (canon_url) ORDER BY c.doc_id""".stripMargin),

    // q110: leakage-safe split over the q105 canonical groups — the
    // oracle re-derives canonicalization (shared CTEs), the 13-nibble
    // md5 bucket, and the split label; identical group strings hash to
    // identical buckets BY CONSTRUCTION on both engines, so the
    // hash-match certifies that no recrawl group straddles splits
    "q110_leakage_split" -> (urlCanonCtes +
      """,
        |b AS (SELECT doc_id, canon_url,
        |        CAST(('0x' || substr(md5(canon_url || ':split:7'), 1, 13)) AS BIGINT) % 100
        |          AS bucket
        |      FROM p5)
        |SELECT doc_id, canon_url, bucket,
        |       CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin),

    // q111: day-2 canonical-URL probe — the oracle re-derives the
    // canonicalization (shared CTEs), elects corpus-side keepers, and
    // replays the batch verdicts with the self-match exclusion
    // the batch is the fifth recrawl COPY of each canonical group
    // ((doc_id // 100) % 5 = 4 — group members share doc_id % 100, so
    // only a copy-keyed split crosses the group boundary); fresh batch
    // docs (doc_id ≡ 0 mod 3) swap in a never-seen resource whose URL
    // is already canonical, so the override applies at the canon level
    "q111_url_probe" -> (urlCanonCtes +
      """,
        |idx AS (SELECT canon_url, min(doc_id) AS keep_id FROM p5
        |        WHERE (doc_id // 100) % 5 <> 4 GROUP BY 1),
        |b AS (SELECT doc_id,
        |        CASE WHEN doc_id % 3 = 0
        |             THEN 'https://fresh.example.com/items/' || CAST(doc_id AS VARCHAR)
        |             ELSE canon_url END AS canon_url
        |      FROM p5 WHERE (doc_id // 100) % 5 = 4)
        |SELECT b.doc_id, b.canon_url,
        |       (i.keep_id IS NOT NULL AND i.keep_id <> b.doc_id) AS is_dup,
        |       CAST(CASE WHEN i.keep_id IS NOT NULL AND i.keep_id <> b.doc_id
        |                 THEN i.keep_id ELSE -1 END AS BIGINT) AS dup_of
        |FROM b LEFT JOIN idx i USING (canon_url) ORDER BY b.doc_id""".stripMargin),

    // q113: domain-suffix blocklist gate — host extraction, the
    // boundary-suffix expansion, and the list join re-derived from the
    // SAME shared suffix constants (Urls.docBlocklist interpolates
    // into both engines)
    "q113_blocklist_gate" -> (urlPlantedCte +
      s""",
         |h AS (SELECT doc_id,
         |        regexp_replace(regexp_replace(
         |          lower(regexp_extract(regexp_replace(regexp_replace(regexp_replace(
         |            url, '#.*$$', ''),
         |            '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^[^/?]*@', ''),
         |            '^([^/?]*)', 1)),
         |          ':[0-9]+$$', ''), '^(www\\.)+', '') AS host
         |      FROM planted),
         |-- 31 labels is far past any real host; the WHERE guard keeps
         |-- the expansion exact for shorter ones
         |sufs AS (SELECT doc_id,
         |           array_to_string(list_slice(string_split(host, '.'), i + 1,
         |             len(string_split(host, '.'))), '.') AS suf
         |         FROM h CROSS JOIN generate_series(0, 31) AS g(i)
         |         WHERE i < len(string_split(host, '.'))),
         |bl AS (SELECT unnest([${Urls.docBlocklist.map(p => s"'$p'").mkString(", ")}]) AS suf),
         |hits AS (SELECT DISTINCT s.doc_id FROM sufs s JOIN bl USING (suf))
         |SELECT h.doc_id, h.host, (t.doc_id IS NOT NULL) AS blocked
         |FROM h LEFT JOIN hits t USING (doc_id) ORDER BY h.doc_id""".stripMargin),

    // q114: per-source corpus datasheet — the q107 donor planting
    // re-derived, the global dup election keyed on text (the C2e
    // within-engine-equality convention), every aggregate an exact
    // integer except the 4-dp mean
    "q114_corpus_datasheet" ->
      """WITH planted AS (
        |  SELECT d.doc_id, d.source, d.lang,
        |         CASE WHEN d.doc_id % 10 = 9 THEN o.text ELSE d.text END AS text
        |  FROM documents d LEFT JOIN documents o ON o.doc_id = d.doc_id - 4),
        |w AS (SELECT doc_id, source, lang, text,
        |        CASE WHEN trim(text) = '' THEN 0
        |             ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |        END AS n_words,
        |        min(doc_id) OVER (PARTITION BY text) AS keep
        |      FROM planted)
        |SELECT source,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_words) AS BIGINT) AS total_words,
        |       round(CAST(sum(n_words) AS DOUBLE) / count(*), 4) AS mean_words,
        |       CAST(count(*) FILTER (n_words < 40) AS BIGINT) AS n_short,
        |       CAST(count(*) FILTER (doc_id <> keep) AS BIGINT) AS n_exact_dups,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM w GROUP BY source ORDER BY source""".stripMargin,

    // q115: per-domain boilerplate line removal — planting, census
    // (blank lines exempt), per-domain boilerplate sets, and the
    // order-preserving strip all re-derived from raw rows
    "q115_boilerplate_strip" -> (sitePagesOracleCtes(plainBodyCte, "") +
      """,
        |sel AS (SELECT l.doc_id, l.source, l.ls,
        |          list_filter(l.ls, x -> NOT coalesce(list_contains(b.bls, x), false)) AS kept
        |        FROM l LEFT JOIN bp b USING (source))
        |SELECT doc_id, source, CAST(len(ls) AS BIGINT) AS n_lines,
        |       CAST(len(ls) - len(kept) AS BIGINT) AS n_removed,
        |       array_to_string(kept, chr(10)) AS clean_text
        |FROM sel ORDER BY doc_id""".stripMargin),

    // q116: the composed curation pipeline replayed from scratch —
    // donor planting under per-site templates, the line census +
    // strip, the clean-text dup election, the length gate, and the
    // disjoint per-domain rollup
    "q116_curation_pipeline" ->
      """WITH pages AS (
        |  SELECT d.doc_id, d.source,
        |    concat_ws(chr(10),
        |      'SITE HEADER ' || d.source,
        |      'home | about | contact',
        |      CASE WHEN d.doc_id % 10 = 9 THEN o.text ELSE d.text END,
        |      '(c) 2024 ' || d.source) AS text
        |  FROM documents d LEFT JOIN documents o ON o.doc_id = d.doc_id - 4),
        |l AS (SELECT doc_id, source, string_split(text, chr(10)) AS ls FROM pages),
        |ex AS (SELECT doc_id, source, unnest(ls) AS line FROM l),
        |census AS (SELECT source, line, count(DISTINCT doc_id) AS nd
        |           FROM ex WHERE trim(line) <> '' GROUP BY 1, 2),
        |bp AS (SELECT source, list(line ORDER BY line) AS bls
        |       FROM census WHERE nd >= 3 GROUP BY 1),
        |clean AS (SELECT l.doc_id, l.source,
        |            array_to_string(list_filter(l.ls,
        |              x -> NOT coalesce(list_contains(b.bls, x), false)), chr(10)) AS clean_text
        |          FROM l LEFT JOIN bp b USING (source)),
        |w AS (SELECT doc_id, source, clean_text,
        |        CASE WHEN trim(clean_text) = '' THEN 0
        |             ELSE len(string_split_regex(trim(clean_text), '\s+')) END AS w,
        |        min(doc_id) OVER (PARTITION BY clean_text) AS keep
        |      FROM clean),
        |v AS (SELECT source AS domain, w,
        |        (doc_id <> keep) AS dup,
        |        (w >= 40 AND w <= 200) AS pass
        |      FROM w)
        |SELECT domain,
        |       CAST(count(*) AS BIGINT) AS n_pages,
        |       CAST(count(*) FILTER (dup) AS BIGINT) AS n_dups,
        |       CAST(count(*) FILTER (NOT dup AND NOT pass) AS BIGINT) AS n_gate_failed,
        |       CAST(count(*) FILTER (NOT dup AND pass) AS BIGINT) AS n_kept,
        |       CAST(coalesce(sum(CASE WHEN NOT dup AND pass THEN w END), 0) AS BIGINT) AS kept_words
        |FROM v GROUP BY domain ORDER BY domain""".stripMargin,

    // q117: day-2 boilerplate probe — the census builds from the
    // CORPUS side only, the batch strips against it; the batch-only
    // rare-notice line is absent from the census and must survive
    "q117_boilerplate_probe" -> (sitePagesOracleCtes(plainBodyCte,
      " WHERE (doc_id // 20) % 5 <> 1") +
      """,
        |sel AS (SELECT l.doc_id, l.source, l.ls,
        |          list_filter(l.ls, x -> NOT coalesce(list_contains(b.bls, x), false)) AS kept
        |        FROM l LEFT JOIN bp b USING (source)
        |        WHERE (l.doc_id // 20) % 5 = 1)
        |SELECT doc_id, source, CAST(len(ls) AS BIGINT) AS n_lines,
        |       CAST(len(ls) - len(kept) AS BIGINT) AS n_removed,
        |       array_to_string(kept, chr(10)) AS clean_text
        |FROM sel ORDER BY doc_id""".stripMargin),

    // q122: the one-pass signal battery — every family re-derived from
    // raw rows in one combined SQL built from the SAME modular pieces
    // the individual q27/q28/q29/q103 oracles use, joined per document
    "q122_signal_battery" ->
      (s"""WITH toked AS (
          |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
          |lsc AS (SELECT doc_id, $langScoreCols FROM toked),
          |lang AS (SELECT doc_id, $langCase AS pred_lang FROM lsc),
          |$qualityCtes,
          |bpe AS (SELECT doc_id,
          |   CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens,
          |   round(CAST(length(text) AS DOUBLE)
          |     / greatest(CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT), 1), 4) AS chars_per_token
          |  FROM documents),
          |gtok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents),
          |gts AS (SELECT doc_id, count(*) AS n, sum(length(w)) AS sl,
          |         sum(CASE WHEN regexp_matches(w, '[A-Za-z]') THEN 1 ELSE 0 END) AS aw
          |       FROM gtok GROUP BY 1),
          |gsh AS (SELECT doc_id, count(DISTINCT lower(w)) AS stop_hits FROM gtok
          |       WHERE lower(w) IN ('the','be','to','of','and','that','have','with')
          |       GROUP BY 1),
          |gsy AS (SELECT doc_id,
          |         len(regexp_extract_all(trim(text), '#'))
          |         + len(regexp_extract_all(trim(text), '\\.\\.\\.'))
          |         + len(regexp_extract_all(trim(text), '…')) AS sym
          |       FROM documents),
          |gln AS (SELECT doc_id, trim(unnest(string_split(text, chr(10)))) AS l FROM documents),
          |gls AS (SELECT doc_id, count(*) AS nl,
          |         sum(CASE WHEN regexp_matches(l, '^[-*•]') THEN 1 ELSE 0 END) AS bl,
          |         sum(CASE WHEN regexp_matches(l, '(\\.\\.\\.|…)$$') THEN 1 ELSE 0 END) AS el
          |       FROM gln WHERE l <> '' GROUP BY 1),
          |go AS (SELECT gts.doc_id,
          |        round(CAST(gts.sl AS DOUBLE) / gts.n, 4) AS mean_word_len,
          |        round(CAST(gsy.sym AS DOUBLE) / gts.n, 4) AS symbol_ratio,
          |        round(CAST(coalesce(gls.bl, 0) AS DOUBLE) / greatest(coalesce(gls.nl, 0), 1), 4) AS bullet_frac,
          |        round(CAST(coalesce(gls.el, 0) AS DOUBLE) / greatest(coalesce(gls.nl, 0), 1), 4) AS ellipsis_frac,
          |        round(CAST(gts.aw AS DOUBLE) / gts.n, 4) AS alpha_frac,
          |        CAST(coalesce(gsh.stop_hits, 0) AS BIGINT) AS stop_hits,
          |        gts.n AS gn
          |      FROM gts JOIN gsy ON gsy.doc_id = gts.doc_id
          |        LEFT JOIN gls ON gls.doc_id = gts.doc_id
          |        LEFT JOIN gsh ON gsh.doc_id = gts.doc_id)
          |SELECT s.doc_id, lang.pred_lang, s.n_chars, s.n_tokens, b.bpe_tokens, b.chars_per_token,
          |       s.punct_ratio, s.stop_ratio, s.quality_score,
          |       go.mean_word_len, go.symbol_ratio, go.bullet_frac, go.ellipsis_frac,
          |       go.alpha_frac, go.stop_hits,
          |       (go.gn BETWEEN 20 AND 100000 AND go.mean_word_len BETWEEN 3.0 AND 10.0
          |        AND go.symbol_ratio <= 0.10 AND go.bullet_frac <= 0.50
          |        AND go.ellipsis_frac <= 0.30 AND go.alpha_frac >= 0.80
          |        AND go.stop_hits >= 1) AS gopher_pass
          |FROM scored s JOIN lang ON lang.doc_id = s.doc_id
          |  JOIN bpe b ON b.doc_id = s.doc_id
          |  JOIN go ON go.doc_id = s.doc_id
          |ORDER BY s.doc_id""").stripMargin,

    // q106: domain-reputation gate — per-domain integer-exact rules
    // (doc floor, mean-words floor as sum >= k·n, short-page percent
    // cap as 100·short <= pct·n) re-derived from raw rows
    "q106_domain_gate" ->
      """WITH d AS (
        |  SELECT doc_id, source AS domain,
        |         CASE WHEN trim(text) = '' THEN 0
        |              ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |         END AS n_words
        |  FROM documents),
        |s AS (
        |  SELECT domain, CAST(count(*) AS BIGINT) AS domain_docs,
        |         CAST(sum(n_words) AS BIGINT) AS domain_words,
        |         CAST(count(*) FILTER (n_words < 40) AS BIGINT) AS domain_short
        |  FROM d GROUP BY 1),
        |v AS (SELECT *, (domain_docs >= 5 AND domain_words >= 54 * domain_docs
        |                 AND domain_short * 100 <= 40 * domain_docs) AS domain_ok FROM s)
        |SELECT d.doc_id, d.domain, d.n_words, v.domain_docs, v.domain_words,
        |       v.domain_short, v.domain_ok
        |FROM d JOIN v USING (domain) ORDER BY d.doc_id""".stripMargin,

    // q107: day-2 exact-dedup probe — the oracle keys its index on the
    // TEXT itself where the operator keys on md5 (within-engine
    // equality is all hotness needs — the C2e convention), re-plants
    // the same donor texts, and re-derives the verdicts + sentinels
    "q107_exact_probe" ->
      """WITH corpus AS (SELECT * FROM documents WHERE doc_id % 5 <> 4),
        |b0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 4),
        |batch AS (
        |  SELECT b0.doc_id,
        |         CASE WHEN b0.doc_id % 10 = 9 THEN d.text ELSE b0.text END AS text
        |  FROM b0 LEFT JOIN documents d ON d.doc_id = b0.doc_id - 4),
        |idx AS (SELECT text, min(doc_id) AS keep_id FROM corpus GROUP BY 1)
        |SELECT b.doc_id,
        |       (i.keep_id IS NOT NULL AND i.keep_id <> b.doc_id) AS is_dup,
        |       CAST(CASE WHEN i.keep_id IS NOT NULL AND i.keep_id <> b.doc_id
        |                 THEN i.keep_id ELSE -1 END AS BIGINT) AS dup_of
        |FROM batch b LEFT JOIN idx i USING (text) ORDER BY b.doc_id""".stripMargin,

    // q108: multinomial Naive Bayes language classifier — the oracle
    // re-derives BOTH halves (count fit on the seed, Laplace-smoothed
    // argmax scoring on the batch) with every ln quantized to the 1e-8
    // grid and summed as exact longs (the q93 convention), so the
    // scores and the predictions hash-check digit for digit
    "q108_nb_classifier" -> nbOracleSql,

    // q112: the day-2 NB contract IS the oracle — fit-in-halves +
    // merge must equal the full-seed fit bit-exactly (counts sum as
    // longs before any log), so the oracle is q108's verbatim
    "q112_nb_incremental" -> nbOracleSql,

    // q109: hybrid RRF — the BM25 leg is q90's derivation with a
    // top-30 pool, the dense leg rebuilds the md5 ±1 projection (the
    // q95 CTEs) for corpus AND query and ranks by 4-dp cosine, and the
    // fusion is floor(1e12/(60+rank)) exact-long addition — one
    // correctly-rounded IEEE division per leg, so the fused ordering
    // is engine-exact with no float-sum machinery
    "q109_hybrid_rrf" ->
      """WITH d AS (SELECT doc_id,
        |             regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |           FROM documents),
        |tok AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM d),
        |post AS (SELECT term, doc_id, dl, count(*) AS tf
        |         FROM tok GROUP BY 1, 2, 3),
        |stats AS (SELECT count(*) AS n_docs,
        |            CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |          FROM (SELECT DISTINCT doc_id, dl FROM tok)),
        |probe AS (SELECT * FROM post WHERE term IN ('spark', 'window', 'batch')),
        |dfs AS (SELECT term, count(*) AS df FROM probe GROUP BY 1),
        |contrib AS (SELECT p.doc_id,
        |    CAST(round(
        |      ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
        |      * (p.tf * (1.2 + 1.0))
        |      / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / s.avgdl))
        |      * 100000000.0) AS BIGINT) AS cs
        |  FROM probe p JOIN dfs f ON f.term = p.term CROSS JOIN stats s),
        |sscored AS (SELECT doc_id,
        |    round(CAST(sum(cs) AS DOUBLE) / 100000000.0 + 1e-9, 4) AS score
        |  FROM contrib GROUP BY 1),
        |sleg AS (SELECT doc_id, bm25_rank FROM (
        |    SELECT doc_id,
        |      row_number() OVER (ORDER BY score DESC, doc_id ASC) AS bm25_rank
        |    FROM sscored) WHERE bm25_rank <= 30),
        |th AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS h FROM tok),
        |comp AS (SELECT doc_id, j,
        |    CAST(sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS DOUBLE) AS cmp
        |  FROM th CROSS JOIN generate_series(0, 31) AS dims(j)
        |  GROUP BY doc_id, j),
        |e AS (SELECT doc_id, list(cmp ORDER BY j) AS v FROM comp GROUP BY doc_id),
        |qh AS (SELECT CAST(('0x' || substr(md5(tq), 1, 15)) AS BIGINT) AS h
        |       FROM unnest(['spark', 'window', 'batch']) AS qt(tq)),
        |qcomp AS (SELECT j,
        |    CAST(sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS DOUBLE) AS cmp
        |  FROM qh CROSS JOIN generate_series(0, 31) AS dims(j) GROUP BY j),
        |qv AS (SELECT list(cmp ORDER BY j) AS v FROM qcomp),
        |dn AS (SELECT e.doc_id,
        |    round(list_dot_product(e.v, q.v)
        |          / (sqrt(list_dot_product(e.v, e.v))
        |             * sqrt(list_dot_product(q.v, q.v))), 4) AS cos
        |  FROM e CROSS JOIN qv q),
        |dleg AS (SELECT doc_id, dense_rank FROM (
        |    SELECT doc_id,
        |      row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS dense_rank
        |    FROM dn) WHERE dense_rank <= 30),
        |fused AS (SELECT coalesce(s.doc_id, dd.doc_id) AS doc_id,
        |    coalesce(CAST(floor(1000000000000.0 / (60 + s.bm25_rank)) AS BIGINT), 0)
        |    + coalesce(CAST(floor(1000000000000.0 / (60 + dd.dense_rank)) AS BIGINT), 0)
        |      AS rrf_score,
        |    CAST(coalesce(s.bm25_rank, -1) AS BIGINT) AS bm25_rank,
        |    CAST(coalesce(dd.dense_rank, -1) AS BIGINT) AS dense_rank
        |  FROM sleg s FULL OUTER JOIN dleg dd ON s.doc_id = dd.doc_id),
        |final AS (SELECT *,
        |    row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS rank
        |  FROM fused)
        |SELECT CAST(rank AS BIGINT) AS rank, doc_id, rrf_score, bm25_rank, dense_rank
        |FROM final WHERE rank <= 20 ORDER BY rank""".stripMargin
  )

  /** DuckDB literal for a fix-table string: quotes double, and the
    * invisible U+009D control char renders as chr(157) so the SQL
    * stays printable. */
  private def mojibakeSqlLit(s: String): String =
    "'" + s.flatMap {
      case '\'' => "''"
      case c if c == '\u009d' => "' || chr(157) || '"
      case c => c.toString
    } + "'"

  /** The q104 oracle: a CTE chain s0 → sN, one step per
    * [[TextClean.mojibakeFixes]] entry, each counting the pattern on
    * the PRE-step text (integer //) then applying the replace —
    * mirroring the operator's fold step for step. */
  /** Shared q105/q110 oracle prefix: plant the six messy URL variants
    * and re-derive the canonical form rule by rule (shared regex
    * pieces + the shared tracking-param list — one source of truth
    * with [[graft.operators.Urls.canonicalizeUrl]]). Ends at `p5`,
    * which yields (doc_id, canon_url). */
  /** The q105 messy-URL planting alone (WITH planted AS …) — shared by
    * every URL-family oracle; one source of truth with
    * [[graft.operators.Urls.plantedUrls]]. */
  private def urlPlantedCte: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    CASE doc_id % 6
      |      WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM/articles/' || CAST(doc_id % 100 AS VARCHAR)
      |      WHEN 1 THEN 'https://' || source || '.example.com/articles/' || CAST(doc_id % 100 AS VARCHAR)
      |      WHEN 2 THEN 'https://www.' || source || '.example.com:443/articles/' || CAST(doc_id % 100 AS VARCHAR) || '/'
      |      WHEN 3 THEN 'https://' || source || '.example.com/articles/' || CAST(doc_id % 100 AS VARCHAR) || '#sec-2'
      |      WHEN 4 THEN 'https://' || source || '.example.com/articles/' || CAST(doc_id % 100 AS VARCHAR) || '?page=2&fbclid=IwAB12&utm_source=t.co'
      |      ELSE 'HTTPS://' || source || '.EXAMPLE.com/articles/' || CAST(doc_id % 100 AS VARCHAR) || '/?utm_medium=social'
      |    END AS url
      |  FROM documents)""".stripMargin

  private def urlCanonCtes: String = urlPlantedCte +
    s""",
       |p1 AS (SELECT doc_id, regexp_replace(url, '#.*$$', '') AS nofrag FROM planted),
       |p2 AS (SELECT doc_id,
       |         regexp_replace(nofrag, '\\?.*$$', '') AS base,
       |         coalesce(regexp_extract(nofrag, '\\?(.*)$$', 1), '') AS q FROM p1),
       |p3 AS (SELECT doc_id, q,
       |         lower(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |         regexp_replace(regexp_replace(base, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
       |                        '^[^/]*@', '') AS rest FROM p2),
       |p4 AS (SELECT doc_id, q, scheme,
       |         lower(regexp_extract(rest, '^([^/]*)', 1)) AS auth,
       |         regexp_replace(rest, '^[^/]*', '') AS path FROM p3),
       |p5 AS (SELECT doc_id,
       |         scheme || '://' ||
       |         regexp_replace(CASE WHEN scheme = 'https' THEN regexp_replace(auth, ':443$$', '')
       |                             WHEN scheme = 'http'  THEN regexp_replace(auth, ':80$$', '')
       |                             ELSE auth END, '^(www\\.)+', '') ||
       |         regexp_replace(path, '/+$$', '') ||
       |         CASE WHEN kq = '' THEN '' ELSE '?' || kq END AS canon_url
       |       FROM (SELECT *,
       |               -- coalesce: DuckDB's array_to_string of an EMPTY list is
       |               -- NULL, not '' (Spark's array_join returns '')
       |               coalesce(array_to_string(list_filter(string_split(q, '&'),
       |                 p -> p <> ''
       |                   AND substr(lower(regexp_extract(p, '^([^=]*)', 1)), 1, 4) <> 'utm_'
       |                   AND lower(regexp_extract(p, '^([^=]*)', 1)) NOT IN (${Urls.trackingParams.map(t => s"'$t'").mkString(", ")})), '&'), '') AS kq
       |             FROM p4))""".stripMargin

  /** Shared q108/q112 oracle: the multinomial-NB fit on the FULL
    * marker-planted seed plus the Laplace-smoothed scaled-long argmax
    * scoring of the held-out batch. q112's merged two-half fit must
    * match this full-seed derivation bit for bit (counts sum as longs
    * before any log is taken). */
  private def nbOracleSql: String =
    """WITH planted AS (SELECT doc_id, lang, text || ' marker_' || lang AS text
      |                 FROM documents),
      |seed AS (SELECT * FROM planted WHERE doc_id % 5 <> 4),
      |batch AS (SELECT * FROM planted WHERE doc_id % 5 = 4),
      |stoks AS (SELECT doc_id, lang AS label,
      |                 unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      |          FROM seed),
      |tc AS (SELECT tok, label, CAST(count(*) AS BIGINT) AS c FROM stoks GROUP BY 1, 2),
      |cs AS (SELECT lang AS label, CAST(count(*) AS BIGINT) AS n_docs,
      |              CAST(sum(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS n_tokens
      |       FROM seed GROUP BY 1),
      |v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM tc),
      |td AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS td FROM cs),
      |consts AS (SELECT label,
      |       CAST(round(ln(CAST(n_tokens + (SELECT v FROM v) AS DOUBLE)) * 100000000) AS BIGINT) AS lden,
      |       CAST(round(ln(CAST(n_docs AS DOUBLE) / (SELECT td FROM td)) * 100000000) AS BIGINT) AS lprior
      |       FROM cs),
      |btoks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok FROM batch),
      |dt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n FROM btoks GROUP BY 1, 2),
      |part AS (SELECT doc_id, label,
      |         CAST(sum(n * CAST(round(ln(CAST(c + 1 AS DOUBLE)) * 100000000) AS BIGINT)) AS BIGINT) AS part
      |         FROM dt JOIN tc USING (tok) GROUP BY 1, 2),
      |dl AS (SELECT doc_id, lang,
      |              CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS nd
      |       FROM batch),
      |grid AS (SELECT d.doc_id, d.lang, c.label,
      |         coalesce(p.part, 0) - d.nd * c.lden + c.lprior AS score
      |         FROM dl d CROSS JOIN consts c
      |         LEFT JOIN part p ON p.doc_id = d.doc_id AND p.label = c.label),
      |win AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |                                     ORDER BY score DESC, label ASC) AS rk FROM grid)
      |SELECT doc_id, lang AS true_lang, label AS pred_label,
      |       (label = lang) AS correct, CAST(score AS BIGINT) AS score
      |FROM win WHERE rk = 1 ORDER BY doc_id""".stripMargin

  private def mojibakeOracleSql: String = {
    val base =
      s"""WITH s0 AS (
         |  SELECT doc_id,
         |    text || CASE WHEN doc_id % 2 = 0
         |      THEN ${mojibakeSqlLit(TextClean.mojibakePlant)}
         |      ELSE ${mojibakeSqlLit(TextClean.mojibakeCleanTail)} END AS t,
         |    CAST(0 AS BIGINT) AS c
         |  FROM documents)""".stripMargin
    val steps = TextClean.mojibakeFixes.zipWithIndex.map { case ((bad, good), i) =>
      s"""s${i + 1} AS (SELECT doc_id,
         |  replace(t, ${mojibakeSqlLit(bad)}, ${mojibakeSqlLit(good)}) AS t,
         |  c + (length(t) - length(replace(t, ${mojibakeSqlLit(bad)}, ''))) // ${bad.length} AS c
         |  FROM s$i)""".stripMargin
    }
    (base +: steps).mkString(",\n") +
      s"\nSELECT doc_id, c AS n_fixes, t AS fixed_text FROM s${TextClean.mojibakeFixes.size} ORDER BY doc_id"
  }
}
