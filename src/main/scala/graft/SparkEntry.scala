package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{CustomOps, EventOps, Relational, StatsOps, TextOps, VectorOps}
import graft.streaming.EventStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator family from SURVEY.md §2 appears here as a
  * named query over `/root/testdata/<sf>` with (where SQL-expressible) a
  * DuckDB oracle in [[oracleSql]]. Column names are aliased identically on
  * both sides — the driver's compare sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The ODS-fact-build shape (SURVEY §3 E2): windowed features + star
    * joins in one plan. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> (Relational.q1Agg(_, _)),
    "q2_filter_project" -> (Relational.q2FilterProject(_, _)),
    "q3_star_join"      -> (Relational.q3StarJoin(_, _)),
    "q4_dim_lookup"     -> (Relational.q4DimLookup(_, _)),
    "q5_roleplay_join"  -> (Relational.q5RoleplayJoin(_, _)),
    "q6_anti_join"      -> (Relational.q6AntiJoin(_, _)),
    "q6b_semi_join"     -> (Relational.q6bSemiJoin(_, _)),
    "q7_window_lead"    -> (Relational.q7WindowLead(_, _)),
    "q8_window_ma"      -> (Relational.q8WindowMa(_, _)),
    "q9_window_spread"  -> (Relational.q9WindowSpread(_, _)),
    "q10_spread_agg"    -> (Relational.q10SpreadAgg(_, _)),
    "q11_unpivot"       -> (Relational.q11Unpivot(_, _)),
    "q13_union"         -> (Relational.q13Union(_, _)),
    "q14_strings"       -> (Relational.q14Strings(_, _)),
    "q15_datetime"      -> (Relational.q15Datetime(_, _)),
    "q16_topk"          -> (Relational.q16TopK(_, _)),
    "q17_cube"          -> (Relational.q17Cube(_, _)),
    "q18_rollup"        -> (Relational.q18Rollup(_, _)),
    "q19_approx_distinct" -> (Relational.q19ApproxDistinct(_, _)),
    "q20_text_stats"    -> (TextOps.q20TextStats(_, _)),
    "q21_lang_id"       -> (TextOps.q21LangId(_, _)),
    "q22_fingerprint"   -> (TextOps.q22Fingerprint(_, _)),
    "q23_minhash"       -> (TextOps.q23Minhash(_, _)),
    "q24_lsh_pairs"     -> (TextOps.q24LshPairs(_, _)),
    "q25_dedup_summary" -> (TextOps.q25DedupSummary(_, _)),
    "q26_embed_stats"   -> (VectorOps.q26EmbedStats(_, _)),
    "q27_knn_cosine"    -> (VectorOps.q27KnnCosine(_, _)),
    "q28_ann_lsh"       -> (VectorOps.q28AnnLshBuckets(_, _)),
    "q30_events_tumbling" -> (EventOps.q30EventsTumbling(_, _)),
    "q31_sessionize"    -> (EventOps.q31Sessionize(_, _)),
    "q32_asof_join"     -> (EventOps.q32AsofJoin(_, _)),
    "q33_stream_tumbling" -> ((s, d) => EventStream.tumblingCounts(s, d)
      .select("window_start", "event_type", "n_events", "sum_value")),
    "q34_udaf_centmean"  -> (CustomOps.q34UdafCentMean(_, _)),
    "q35_simhash"        -> (CustomOps.q35Simhash(_, _)),
    "q36_multimodal_meta" -> (CustomOps.q36MultimodalMeta(_, _)),
    "q37_multimodal_decode" -> (CustomOps.q37MultimodalDecode(_, _)),
    "q38_range_join"     -> (EventOps.q38RangeJoin(_, _)),
    "q39_quantiles"      -> (Relational.q39Quantiles(_, _)),
    "q40_stringagg"      -> (Relational.q40StringAgg(_, _)),
    "q41_json_extract"   -> (EventOps.q41JsonExtract(_, _)),
    "q42_setops"         -> (Relational.q42SetOps(_, _)),
    "q43_pivot"          -> (Relational.q43Pivot(_, _)),
    "q44_simhash_pairs"  -> (TextOps.q44SimhashPairs(_, _)),
    "q45_normalize"      -> (graft.stg.Normalizer.q45Normalize(_, _)),
    "q46_lsh_audit"      -> (TextOps.q46LshAudit(_, _)),
    "q47_ivf_cells"      -> (VectorOps.q47IvfCells(_, _)),
    "q48_ivf_ann"        -> (VectorOps.q48IvfAnn(_, _)),
    "q49_winnow_fingerprint" -> (TextOps.q49WinnowFingerprint(_, _)),
    "q50_dedup_clusters" -> (TextOps.q50DedupClusters(_, _)),
    "q51_quantize"       -> (VectorOps.q51Quantize(_, _)),
    "q52_select_corpus"  -> (TextOps.q52SelectCorpus(_, _)),
    "q53_frame_sample"   -> (CustomOps.q53FrameSample(_, _)),
    "q54_approx_quantiles" -> (Relational.q54ApproxQuantiles(_, _)),
    "q55_mix_corpus"     -> (TextOps.q55MixCorpus(_, _)),
    "q56_scd2"           -> (Relational.q56Scd2(_, _)),
    "q57_skew_audit"     -> (Relational.q57SkewAudit(_, _)),
    "q58_multimodal_codec" -> (CustomOps.q58MultimodalCodec(_, _)),
    "q59_pack_sequences" -> (TextOps.q59PackSequences(_, _)),
    "q60_decontaminate"  -> (TextOps.q60Decontaminate(_, _)),
    "q61_repetition"     -> (TextOps.q61Repetition(_, _)),
    "q62_bigram_vocab"   -> (TextOps.q62BigramVocab(_, _)),
    "q63_corpus_report"  -> (TextOps.q63CorpusReport(_, _)),
    "q64_salted_agg"     -> (Relational.q64SaltedAgg(_, _)),
    "q65_kmeans_refine"  -> (VectorOps.q65KmeansRefine(_, _)),
    "q66_redact"         -> (TextOps.q66Redact(_, _)),
    "q67_tfidf"          -> (TextOps.q67Tfidf(_, _)),
    "q68_token_entropy"  -> (TextOps.q68TokenEntropy(_, _)),
    "q69_quality_bins"   -> (TextOps.q69QualityBins(_, _)),
    "q70_bloom_semijoin" -> (Relational.q70BloomSemijoin(_, _)),
    "q71_zorder"         -> (Relational.q71ZOrder(_, _)),
    "q72_quota_sample"   -> (TextOps.q72QuotaSample(_, _)),
    "q73_sliding_window" -> (EventOps.q73SlidingWindow(_, _)),
    "q74_chunk"          -> (TextOps.q74Chunk(_, _)),
    "q75_gapfill"        -> (EventOps.q75GapFill(_, _)),
    "q76_multimodal_resize" -> (CustomOps.q76MultimodalResize(_, _)),
    "q77_pq"             -> (VectorOps.q77Pq(_, _)),
    "q78_containment"    -> (TextOps.q78Containment(_, _)),
    "q79_random_projection" -> (VectorOps.q79RandomProjection(_, _)),
    "q80_corr_moments"   -> (Relational.q80CorrMoments(_, _)),
    "q81_funnel"         -> (EventOps.q81Funnel(_, _)),
    "q82_retention"      -> (EventOps.q82Retention(_, _)),
    "q83_grouping_sets"  -> (Relational.q83GroupingSets(_, _)),
    "q84_rank_family"    -> (Relational.q84RankFamily(_, _)),
    "q85_median_mode"    -> (Relational.q85MedianMode(_, _)),
    "q86_edit_distance"  -> (TextOps.q86EditDistance(_, _)),
    "q87_markup_strip"   -> (TextOps.q87MarkupStrip(_, _)),
    "q88_split"          -> (TextOps.q88Split(_, _)),
    "q89_countmin"       -> (TextOps.q89CountMin(_, _)),
    "q90_zscore"         -> (EventOps.q90ZscoreOutliers(_, _)),
    "q91_autocorr"       -> (EventOps.q91Autocorr(_, _)),
    "q92_source_overlap" -> (TextOps.q92SourceOverlap(_, _)),
    "q93_novelty"        -> (TextOps.q93Novelty(_, _)),
    "q94_label_outliers" -> (VectorOps.q94LabelOutliers(_, _)),
    "q95_conversion_lag" -> (EventOps.q95ConversionLag(_, _)),
    "q96_range_frame"    -> (EventOps.q96RangeFrame(_, _)),
    "q97_weighted_quality" -> (TextOps.q97WeightedQuality(_, _)),
    "q98_snapshot_diff"  -> (Relational.q98SnapshotDiff(_, _)),
    "q99_segment_dedup"  -> (TextOps.q99SegmentDedup(_, _)),
    "q100_transitions"   -> (EventOps.q100Transitions(_, _)),
    "q101_logparse"      -> (EventOps.q101LogParse(_, _)),
    "q102_unigram_lm"    -> (TextOps.q102UnigramLm(_, _)),
    "q103_profile"       -> (Relational.q103Profile(_, _)),
    "q104_hotcold_join"  -> (Relational.q104HotColdJoin(_, _)),
    "q105_weighted_sample" -> (TextOps.q105WeightedSample(_, _)),
    "q106_incremental_agg" -> (Relational.q106IncrementalAgg(_, _)),
    "q107_basket_pairs"  -> (EventOps.q107BasketPairs(_, _)),
    "q108_nested_arrays" -> (EventOps.q108NestedArrays(_, _)),
    "q109_checksum"      -> (Relational.q109Checksum(_, _)),
    "q110_pagerank"      -> (EventOps.q110Pagerank(_, _)),
    "q111_concurrency"   -> (EventOps.q111Concurrency(_, _)),
    "q112_cumulative_users" -> (EventOps.q112CumulativeUsers(_, _)),
    "q113_constraint_audit" -> (Relational.q113ConstraintAudit(_, _)),
    "q114_dead_letter"   -> (EventOps.q114DeadLetter(_, _)),
    "q115_histogram"     -> (Relational.q115Histogram(_, _)),
    "q116_mad_outliers"  -> (Relational.q116MadOutliers(_, _)),
    "q117_ab_lift"       -> (EventOps.q117AbLift(_, _)),
    "q118_url_canon"     -> (TextOps.q118UrlCanon(_, _)),
    "q119_bigram_lift"   -> (TextOps.q119BigramLift(_, _)),
    "q120_leave_last_out" -> (EventOps.q120LeaveLastOut(_, _)),
    "q121_decayed_value" -> (Relational.q121DecayedValue(_, _)),
    "q122_phash"         -> (CustomOps.q122Phash(_, _)),
    "q123_entity_resolution" -> (Relational.q123EntityResolution(_, _)),
    "q124_incremental_dedup" -> (TextOps.q124IncrementalDedup(_, _)),
    "q125_cdc_merge"     -> (Relational.q125CdcMerge(_, _)),
    "q126_compaction_plan" -> (TextOps.q126CompactionPlan(_, _)),
    "q127_seasonality"   -> (EventOps.q127Seasonality(_, _)),
    "q128_winsorize"     -> (Relational.q128Winsorize(_, _)),
    "q129_budget_curation" -> (TextOps.q129BudgetCuration(_, _)),
    "q130_journey_patterns" -> (EventOps.q130JourneyPatterns(_, _)),
    "q131_stream_sessions" -> (EventStream.q131StreamSessions(_, _)),
    "q132_feature_hash"  -> (TextOps.q132FeatureHash(_, _)),
    "q133_spike_days"    -> (EventOps.q133SpikeDays(_, _)),
    "q134_freshness"     -> (EventOps.q134Freshness(_, _)),
    "q135_rank_movers"   -> (EventOps.q135RankMovers(_, _)),
    "q136_ann_recall"    -> (VectorOps.q136AnnRecall(_, _)),
    "q137_abc_analysis"  -> (Relational.q137AbcAnalysis(_, _)),
    "q138_diversified_topk" -> (TextOps.q138DiversifiedTopK(_, _)),
    "q139_point_in_time" -> (Relational.q139PointInTime(_, _)),
    "q140_ks_drift"      -> (Relational.q140KsDrift(_, _)),
    "q141_phash_pairs"   -> (CustomOps.q141PhashPairs(_, _)),
    "q142_vocab_growth"  -> (TextOps.q142VocabGrowth(_, _)),
    "q143_token_normalize" -> (TextOps.q143TokenNormalize(_, _)),
    "q144_temperature_mix" -> (TextOps.q144TemperatureMix(_, _)),
    "q145_boilerplate"   -> (TextOps.q145Boilerplate(_, _)),
    "q146_canonical_pick" -> (TextOps.q146CanonicalPick(_, _)),
    "q147_embed_health"  -> (VectorOps.q147EmbedHealth(_, _)),
    "q148_cot_totals"    -> (graft.mart.Extracts.q148CotTotals(_, _)),
    "q149_ma_extract"    -> (graft.mart.Extracts.q149MaExtract(_, _)),
    "q150_stream_enrich" -> (EventStream.q150StreamEnrich(_, _)),
    "q152_hard_negatives" -> (VectorOps.q152HardNegatives(_, _)),
    "q153_epoch_shuffle" -> (TextOps.q153EpochShuffle(_, _)),
    "q154_delete_propagation" -> (TextOps.q154DeletePropagation(_, _)),
    "q155_padding_plan"  -> (TextOps.q155PaddingPlan(_, _)),
    "q156_max_drawdown"  -> (EventOps.q156MaxDrawdown(_, _)),
    "q157_volatility"    -> (EventOps.q157Volatility(_, _)),
    "q158_stream_interval_join" -> (EventStream.q158StreamRangeJoin(_, _)),
    "q159_stream_upsert" -> (EventStream.q159StreamUpsert(_, _)),
    "q160_crossmodal_dedup" -> (TextOps.q160CrossModalDedup(_, _)),
    "q161_semdedup" -> (VectorOps.q161Semdedup(_, _)),
    "q162_shared_passages" -> (TextOps.q162SharedPassages(_, _)),
    "q163_bpe_merges" -> (TextOps.q163BpeMerges(_, _)),
    "q164_water_fill" -> (TextOps.q164WaterFill(_, _)),
    "q165_stream_dedup" -> (graft.streaming.EventStream.q165StreamDedup(_, _)),
    "q166_dsir_weights" -> (TextOps.q166DsirWeights(_, _)),
    "q167_split_assign" -> (TextOps.q167SplitAssign(_, _)),
    "q168_substr_dedup" -> (TextOps.q168SubstrDedup(_, _)),
    "q169_decontam_spans" -> (TextOps.q169DecontamSpans(_, _)),
    "q170_substr_redact" -> (TextOps.q170SubstrRedact(_, _)),
    "q171_audit_trail" -> (graft.stg.Staging.q171AuditTrail(_, _)),
    "q172_stream_sliding" -> ((s, d) => EventStream.slidingCounts(s, d)),
    "q173_ccnet_buckets" -> (TextOps.q173CcnetBuckets(_, _)),
    "q174_stream_stateful" -> ((s, d) =>
      EventStream.statefulUserCounts(s, d)
        .orderBy(org.apache.spark.sql.functions.col("user_id"))),
    "q175_gopher_rules" -> (TextOps.q175GopherRules(_, _)),
    "q176_session_window" -> (EventStream.q176SessionWindow(_, _)),
    "q177_audio_meta" -> (CustomOps.q177AudioMeta(_, _)),
    "q178_quality_logit" -> (TextOps.q178QualityLogit(_, _)),
    "q179_k_anonymity" -> (TextOps.q179KAnonymity(_, _)),
    "q180_bm25" -> (TextOps.q180Bm25(_, _)),
    "q181_vad_segments" -> (CustomOps.q181VadSegments(_, _)),
    "q182_postings" -> (TextOps.q182Postings(_, _)),
    "q183_triplets" -> (VectorOps.q183ContrastiveTriplets(_, _)),
    "q184_bpe_apply" -> (TextOps.q184BpeApply(_, _)),
    "q185_calibration" -> (TextOps.q185Calibration(_, _)),
    "q186_ohlc_bars" -> (EventOps.q186OhlcBars(_, _)),
    "q187_stream_ohlc" -> (EventStream.q187StreamOhlc(_, _)),
    "q188_vocab_coverage" -> (TextOps.q188VocabCoverage(_, _)),
    "q189_triangles" -> (Relational.q189Triangles(_, _)),
    "q190_rrf_fusion" -> (TextOps.q190RrfFusion(_, _)),
    "q191_bpe_train" -> (TextOps.q191BpeTrain(_, _)),
    "q192_max_repeats" -> (TextOps.q192MaxRepeats(_, _)),
    "q193_partitioned_read" -> (graft.operators.Scale.q193PartitionedRead(_, _)),
    "q194_triangle_sample" -> (Relational.q194TriangleSample(_, _)),
    "q195_l_diversity" -> (TextOps.q195LDiversity(_, _)),
    "q196_binary_ann" -> (VectorOps.q196BinaryAnn(_, _)),
    "q197_kcore" -> (Relational.q197KCore(_, _)),
    "q198_bucketed_join" -> (graft.operators.Scale.q198BucketedJoin(_, _)),
    "q199_cdc_chunks" -> (TextOps.q199CdcChunks(_, _)),
    "q200_ann_leaderboard" -> (VectorOps.q200AnnLeaderboard(_, _)),
    "q201_audio_decimate" -> (CustomOps.q201AudioDecimate(_, _)),
    "q202_ols_trend" -> (EventOps.q202OlsTrend(_, _)),
    "q203_cusum_shift" -> (EventOps.q203CusumShift(_, _)),
    "q204_benford" -> (Relational.q204BenfordAudit(_, _)),
    "q205_prefix_simjoin" -> (TextOps.q205PrefixSimJoin(_, _)),
    "q206_theil_sen" -> (EventOps.q206TheilSen(_, _)),
    "q207_naive_backtest" -> (EventOps.q207NaiveBacktest(_, _)),
    "q208_skyline" -> (TextOps.q208SkylineFrontier(_, _)),
    "q209_rolling_actives" -> (EventOps.q209RollingActives(_, _)),
    "q210_t_closeness" -> (TextOps.q210TCloseness(_, _)),
    "q211_join_card_est" -> (Relational.q211JoinCardEst(_, _)),
    "q212_twap" -> (EventOps.q212Twap(_, _)),
    "q213_gram_matrix" -> (VectorOps.q213GramMatrix(_, _)),
    "q214_isotonic" -> (TextOps.q214IsotonicCalibration(_, _)),
    "q215_fisher_scatter" -> (VectorOps.q215FisherScatter(_, _)),
    "q216_path_trigrams" -> (EventOps.q216PathTrigrams(_, _)),
    "q217_contract_checks" -> (Relational.q217ContractChecks(_, _)),
    "q218_streak_dist" -> (EventOps.q218StreakDist(_, _)),
    "q219_ab_test" -> (EventOps.q219AbTest(_, _)),
    "q220_silhouette" -> (VectorOps.q220Silhouette(_, _)),
    "q221_density_clusters" -> (VectorOps.q221DensityClusters(_, _)),
    "q222_containment_join" -> (TextOps.q222ContainmentJoin(_, _)),
    "q223_conversion_hazard" -> (EventOps.q223ConversionHazard(_, _)),
    "q224_attribution" -> (EventOps.q224Attribution(_, _)),
    "q225_bfs_hops" -> (Relational.q225BfsHops(_, _)),
    "q226_als_step" -> (Relational.q226AlsStep(_, _)),
    "q227_vocab_growth" -> (TextOps.q227VocabGrowth(_, _)),
    "q228_conn_comp" -> (Relational.q228ConnComp(_, _)),
    "q229_chunk_census" -> (TextOps.q229ChunkCensus(_, _)),
    "q230_quantile_align" -> (TextOps.q230QuantileAlign(_, _)),
    "q231_sorted_neighborhood" -> (Relational.q231SortedNeighborhood(_, _)),
    "q232_assoc_rules" -> (Relational.q232AssocRules(_, _)),
    "q233_bootstrap_ci" -> (StatsOps.q233BootstrapCi(_, _)),
    "q234_rank_drift" -> (StatsOps.q234RankDrift(_, _)),
    "q235_chi_square" -> (StatsOps.q235ChiSquare(_, _)),
    "q236_roc_auc" -> (TextOps.q236RocAuc(_, _)),
    "q237_hits" -> (Relational.q237Hits(_, _)),
    "q238_clustering_coeff" -> (Relational.q238ClusteringCoeff(_, _)),
    "q239_link_predict" -> (Relational.q239LinkPredict(_, _)),
    "q240_decision_stump" -> (TextOps.q240DecisionStump(_, _)),
    "q241_cluster_purity" -> (VectorOps.q241ClusterPurity(_, _)),
    "q242_dp_release" -> (TextOps.q242DpRelease(_, _)),
    "q243_label_prop" -> (VectorOps.q243LabelProp(_, _)),
    "q244_power_iteration" -> (VectorOps.q244PowerIteration(_, _)),
    "q245_dedup_eval" -> (TextOps.q245DedupEval(_, _)),
    "q246_perm_importance" -> (TextOps.q246PermImportance(_, _)),
    "q247_cv_stump" -> (TextOps.q247CvStump(_, _)),
    "q248_kcenter" -> (VectorOps.q248KCenter(_, _)),
    "q249_retrieval_gain" -> (VectorOps.q249RetrievalGain(_, _)),
    "q250_assortativity" -> (Relational.q250Assortativity(_, _)),
    "q251_good_turing" -> (TextOps.q251GoodTuring(_, _)),
    "q252_cohen_kappa" -> (TextOps.q252CohenKappa(_, _)),
    "q253_source_ablation" -> (TextOps.q253SourceAblation(_, _)),
    "q254_ppr" -> (EventOps.q254PersonalizedPagerank(_, _)),
    "q255_dup_weights" -> (TextOps.q255DupWeights(_, _)),
    "q256_simpson" -> (TextOps.q256SimpsonDiversity(_, _)),
    "q257_minhash_calib" -> (TextOps.q257MinhashCalibration(_, _)),
    "q258_moore_lewis" -> (TextOps.q258MooreLewis(_, _)),
    "q259_jsd_sources" -> (TextOps.q259JsdSources(_, _)),
    "q260_stream_dedup_lookup" -> (EventStream.q260StreamDedupLookup(_, _)),
    "q261_hybrid_eval" -> (TextOps.q261HybridEval(_, _)),
    "q262_hll_distinct" -> (TextOps.q262HllDistinct(_, _)),
    "q263_domain_reweight" -> (TextOps.q263DomainReweight(_, _)),
    "q264_stream_heavy_hitters" -> (EventStream.q264StreamHeavyHitters(_, _)),
    "q265_hard_negatives" -> (VectorOps.q265HardNegatives(_, _)),
    "q266_split_leakage" -> (TextOps.q266SplitLeakage(_, _)),
    "q267_schema_evolution" -> (graft.operators.Scale.q267SchemaEvolution(_, _)),
    "q268_zorder_layout" -> (graft.operators.Scale.q268ZorderLayout(_, _)),
    "q269_sq8_quant" -> (VectorOps.q269Sq8Quant(_, _)),
    "q270_drift_chi2" -> (EventOps.q270DriftChi2(_, _)),
    "q271_full_refresh" -> (graft.stg.Staging.q271FullRefresh(_, _)),
    "q272_truncate_reload" -> (graft.stg.Staging.q272TruncateReload(_, _)),
    "q273_golden_csv" -> (graft.mart.Extracts.q273GoldenCsv(_, _)),
    "q274_usda_capstone" -> (graft.stg.Normalizer.q274UsdaCapstone(_, _)),
    "q275_incremental_lsh" -> (TextOps.q275IncrementalLsh(_, _)),
    "q276_count_min" -> (TextOps.q276CountMin(_, _)),
    "q277_conformal" -> (StatsOps.q277Conformal(_, _)),
    "q278_kneser_ney" -> (TextOps.q278KneserNey(_, _)),
    "q279_ktruss" -> (Relational.q279KTruss(_, _)),
    "q280_sprt" -> (EventOps.q280Sprt(_, _)),
    "q281_textrank" -> (TextOps.q281TextRank(_, _)),
    "q282_boruvka" -> (Relational.q282Boruvka(_, _)),
    "q283_naive_bayes" -> (TextOps.q283NaiveBayes(_, _)),
    "q284_set_cover" -> (TextOps.q284SetCover(_, _)),
    "q285_neyman_alloc" -> (StatsOps.q285NeymanAlloc(_, _)),
    "q286_entropy_rate" -> (EventOps.q286EntropyRate(_, _)),
    "q287_stream_sprt" -> (EventStream.q287StreamSprt(_, _)),
    "q288_stream_hh_scaled" -> (EventStream.q288StreamHeavyHittersScaled(_, _)),
    "q289_stream_cms_hh" -> (EventStream.q289StreamCmsHeavyHitters(_, _)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg"            -> Relational.q1AggSql,
    "q2_filter_project" -> Relational.q2FilterProjectSql,
    "q3_star_join"      -> Relational.q3StarJoinSql,
    "q4_dim_lookup"     -> Relational.q4DimLookupSql,
    "q5_roleplay_join"  -> Relational.q5RoleplayJoinSql,
    "q6_anti_join"      -> Relational.q6AntiJoinSql,
    "q6b_semi_join"     -> Relational.q6bSemiJoinSql,
    "q7_window_lead"    -> Relational.q7WindowLeadSql,
    "q8_window_ma"      -> Relational.q8WindowMaSql,
    "q9_window_spread"  -> Relational.q9WindowSpreadSql,
    "q10_spread_agg"    -> Relational.q10SpreadAggSql,
    "q11_unpivot"       -> Relational.q11UnpivotSql,
    "q13_union"         -> Relational.q13UnionSql,
    "q14_strings"       -> Relational.q14StringsSql,
    "q15_datetime"      -> Relational.q15DatetimeSql,
    "q16_topk"          -> Relational.q16TopKSql,
    "q17_cube"          -> Relational.q17CubeSql,
    "q18_rollup"        -> Relational.q18RollupSql,
    // q19: sketch value can't be hash-compared; the oracle asserts the
    // emitted `sketch_ok` error-bound flag is literal TRUE
    "q19_approx_distinct" -> Relational.q19ApproxDistinctSql,
    "q20_text_stats"    -> TextOps.q20TextStatsSql,
    "q21_lang_id"       -> TextOps.q21LangIdSql,
    "q22_fingerprint"   -> TextOps.q22FingerprintSql,
    "q23_minhash"       -> TextOps.q23MinhashSql,
    "q24_lsh_pairs"     -> TextOps.q24LshPairsSql,
    "q25_dedup_summary" -> TextOps.q25DedupSummarySql,
    "q26_embed_stats"   -> VectorOps.q26EmbedStatsSql,
    "q27_knn_cosine"    -> VectorOps.q27KnnCosineSql,
    "q28_ann_lsh"       -> VectorOps.q28AnnLshBucketsSql,
    "q30_events_tumbling" -> EventOps.q30EventsTumblingSql,
    "q31_sessionize"    -> EventOps.q31SessionizeSql,
    "q32_asof_join"     -> EventOps.q32AsofJoinSql,
    "q33_stream_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, count(*) AS n_events,
        |  sum(floor((value) * 100.0 + 0.5)) / 100.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q34_udaf_centmean"  -> CustomOps.q34UdafCentMeanSql,
    // q35/q44: FNV-1a SimHash recomputed in DuckDB HUGEINT arithmetic
    // from the same constants (SimHash.duckdbSigsCte)
    "q35_simhash"        -> CustomOps.q35SimhashSql,
    "q36_multimodal_meta" -> CustomOps.q36MultimodalMetaSql,
    "q37_multimodal_decode" -> CustomOps.q37MultimodalDecodeSql,
    "q38_range_join"     -> EventOps.q38RangeJoinSql,
    "q39_quantiles"      -> Relational.q39QuantilesSql,
    "q40_stringagg"      -> Relational.q40StringAggSql,
    "q41_json_extract"   -> EventOps.q41JsonExtractSql,
    "q42_setops"         -> Relational.q42SetOpsSql,
    "q43_pivot"          -> Relational.q43PivotSql,
    "q44_simhash_pairs"  -> TextOps.q44SimhashPairsSql,
    "q45_normalize"      -> graft.stg.Normalizer.q45NormalizeSql,
    "q46_lsh_audit"      -> TextOps.q46LshAuditSql,
    "q47_ivf_cells"      -> VectorOps.q47IvfCellsSql,
    "q48_ivf_ann"        -> VectorOps.q48IvfAnnSql,
    "q49_winnow_fingerprint" -> TextOps.q49WinnowFingerprintSql,
    "q50_dedup_clusters" -> TextOps.q50DedupClustersSql,
    "q51_quantize"       -> VectorOps.q51QuantizeSql,
    "q52_select_corpus"  -> TextOps.q52SelectCorpusSql,
    "q53_frame_sample"   -> CustomOps.q53FrameSampleSql,
    "q54_approx_quantiles" -> Relational.q54ApproxQuantilesSql,
    "q55_mix_corpus"     -> TextOps.q55MixCorpusSql,
    "q56_scd2"           -> Relational.q56Scd2Sql,
    "q57_skew_audit"     -> Relational.q57SkewAuditSql,
    // q58: REAL javax.imageio BMP decode; channel sums recomputed by
    // DuckDB from the payload bytes (BGR triplet layout)
    "q58_multimodal_codec" -> CustomOps.q58MultimodalCodecSql,
    "q59_pack_sequences" -> TextOps.q59PackSequencesSql,
    "q60_decontaminate"  -> TextOps.q60DecontaminateSql,
    "q61_repetition"     -> TextOps.q61RepetitionSql,
    "q62_bigram_vocab"   -> TextOps.q62BigramVocabSql,
    "q63_corpus_report"  -> TextOps.q63CorpusReportSql,
    // q64: the salted two-phase rewrite must be invisible vs a plain
    // group-by (l_quantity is integral → exact double sums)
    "q64_salted_agg"     -> Relational.q64SaltedAggSql,
    // q65: one fixed Lloyd iteration — grid-exact per-dim means make
    // the refined centroids identical doubles in both engines
    "q65_kmeans_refine"  -> VectorOps.q65KmeansRefineSql,
    // q66: the redacted string is proven exactly via its md5
    "q66_redact"         -> TextOps.q66RedactSql,
    // q67/q68: ln-based scores land on the 1e-6 grid BEFORE ranking/
    // summation, so FP noise cannot reorder ties or perturb sums
    "q67_tfidf"          -> TextOps.q67TfidfSql,
    "q68_token_entropy"  -> TextOps.q68TokenEntropySql,
    "q69_quality_bins"   -> TextOps.q69QualityBinsSql,
    // q70: the oracle is the PLAIN semi-join — the bloom pre-filter
    // must be semantically invisible (no false negatives)
    "q70_bloom_semijoin" -> Relational.q70BloomSemijoinSql,
    "q71_zorder"         -> Relational.q71ZOrderSql,
    "q72_quota_sample"   -> TextOps.q72QuotaSampleSql,
    // q73: the oracle reconstructs window() arithmetically; q75's LOCF
    // uses last_value IGNORE NULLS over the same total order
    "q73_sliding_window" -> EventOps.q73SlidingWindowSql,
    "q74_chunk"          -> TextOps.q74ChunkSql,
    "q75_gapfill"        -> EventOps.q75GapFillSql,
    // q76: re-decoded sums of the half-size image recomputed from
    // payload byte positions (even columns, even decoded rows)
    "q76_multimodal_resize" -> CustomOps.q76MultimodalResizeSql,
    "q77_pq"             -> VectorOps.q77PqSql,
    // q78: containment over the staged LSH pairs; oracle re-derives
    // the full banded candidate set like q24's
    "q78_containment"    -> TextOps.q78ContainmentSql,
    // q79: the +-1 sign matrix is md5-derived identically in Scala
    // (plan literals) and DuckDB SQL
    "q79_random_projection" -> VectorOps.q79RandomProjectionSql,
    // q80: corr/covar from exact integer moments (the built-ins are
    // FP-order-dependent and would hash-mismatch)
    "q80_corr_moments"   -> Relational.q80CorrMomentsSql,
    "q81_funnel"         -> EventOps.q81FunnelSql,
    "q82_retention"      -> EventOps.q82RetentionSql,
    "q83_grouping_sets"  -> Relational.q83GroupingSetsSql,
    "q84_rank_family"    -> Relational.q84RankFamilySql,
    "q85_median_mode"    -> Relational.q85MedianModeSql,
    "q86_edit_distance"  -> TextOps.q86EditDistanceSql,
    "q87_markup_strip"   -> TextOps.q87MarkupStripSql,
    "q88_split"          -> TextOps.q88SplitSql,
    "q89_countmin"       -> TextOps.q89CountMinSql,
    "q90_zscore"         -> EventOps.q90ZscoreOutliersSql,
    "q91_autocorr"       -> EventOps.q91AutocorrSql,
    "q92_source_overlap" -> TextOps.q92SourceOverlapSql,
    "q93_novelty"        -> TextOps.q93NoveltySql,
    "q94_label_outliers" -> VectorOps.q94LabelOutliersSql,
    "q95_conversion_lag" -> EventOps.q95ConversionLagSql,
    "q96_range_frame"    -> EventOps.q96RangeFrameSql,
    "q97_weighted_quality" -> TextOps.q97WeightedQualitySql,
    "q98_snapshot_diff"  -> Relational.q98SnapshotDiffSql,
    "q99_segment_dedup"  -> TextOps.q99SegmentDedupSql,
    "q100_transitions"   -> EventOps.q100TransitionsSql,
    "q101_logparse"      -> EventOps.q101LogParseSql,
    "q102_unigram_lm"    -> TextOps.q102UnigramLmSql,
    "q103_profile"       -> Relational.q103ProfileSql,
    "q104_hotcold_join"  -> Relational.q104HotColdJoinSql,
    "q105_weighted_sample" -> TextOps.q105WeightedSampleSql,
    "q106_incremental_agg" -> Relational.q106IncrementalAggSql,
    "q107_basket_pairs"  -> EventOps.q107BasketPairsSql,
    "q108_nested_arrays" -> EventOps.q108NestedArraysSql,
    "q109_checksum"      -> Relational.q109ChecksumSql,
    "q110_pagerank"      -> EventOps.q110PagerankSql,
    "q111_concurrency"   -> EventOps.q111ConcurrencySql,
    "q112_cumulative_users" -> EventOps.q112CumulativeUsersSql,
    "q113_constraint_audit" -> Relational.q113ConstraintAuditSql,
    "q114_dead_letter"   -> EventOps.q114DeadLetterSql,
    "q115_histogram"     -> Relational.q115HistogramSql,
    "q116_mad_outliers"  -> Relational.q116MadOutliersSql,
    "q117_ab_lift"       -> EventOps.q117AbLiftSql,
    "q118_url_canon"     -> TextOps.q118UrlCanonSql,
    "q119_bigram_lift"   -> TextOps.q119BigramLiftSql,
    "q120_leave_last_out" -> EventOps.q120LeaveLastOutSql,
    "q121_decayed_value" -> Relational.q121DecayedValueSql,
    "q122_phash"         -> CustomOps.q122PhashSql,
    "q123_entity_resolution" -> Relational.q123EntityResolutionSql,
    "q124_incremental_dedup" -> TextOps.q124IncrementalDedupSql,
    "q125_cdc_merge"     -> Relational.q125CdcMergeSql,
    "q126_compaction_plan" -> TextOps.q126CompactionPlanSql,
    "q127_seasonality"   -> EventOps.q127SeasonalitySql,
    "q128_winsorize"     -> Relational.q128WinsorizeSql,
    "q129_budget_curation" -> TextOps.q129BudgetCurationSql,
    "q130_journey_patterns" -> EventOps.q130JourneyPatternsSql,
    "q131_stream_sessions" -> EventStream.q131StreamSessionsSql,
    "q132_feature_hash"  -> TextOps.q132FeatureHashSql,
    "q133_spike_days"    -> EventOps.q133SpikeDaysSql,
    "q134_freshness"     -> EventOps.q134FreshnessSql,
    "q135_rank_movers"   -> EventOps.q135RankMoversSql,
    "q136_ann_recall"    -> VectorOps.q136AnnRecallSql,
    "q137_abc_analysis"  -> Relational.q137AbcAnalysisSql,
    "q138_diversified_topk" -> TextOps.q138DiversifiedTopKSql,
    "q139_point_in_time" -> Relational.q139PointInTimeSql,
    "q140_ks_drift"      -> Relational.q140KsDriftSql,
    "q141_phash_pairs"   -> CustomOps.q141PhashPairsSql,
    "q142_vocab_growth"  -> TextOps.q142VocabGrowthSql,
    "q143_token_normalize" -> TextOps.q143TokenNormalizeSql,
    "q144_temperature_mix" -> TextOps.q144TemperatureMixSql,
    "q145_boilerplate"   -> TextOps.q145BoilerplateSql,
    "q146_canonical_pick" -> TextOps.q146CanonicalPickSql,
    "q147_embed_health"  -> VectorOps.q147EmbedHealthSql,
    "q148_cot_totals"    -> graft.mart.Extracts.q148CotTotalsSql,
    "q149_ma_extract"    -> graft.mart.Extracts.q149MaExtractSql,
    "q150_stream_enrich" -> EventStream.q150StreamEnrichSql,
    "q152_hard_negatives" -> VectorOps.q152HardNegativesSql,
    "q153_epoch_shuffle" -> TextOps.q153EpochShuffleSql,
    "q154_delete_propagation" -> TextOps.q154DeletePropagationSql,
    "q155_padding_plan"  -> TextOps.q155PaddingPlanSql,
    "q156_max_drawdown"  -> EventOps.q156MaxDrawdownSql,
    "q157_volatility"    -> EventOps.q157VolatilitySql,
    "q158_stream_interval_join" -> EventStream.q158StreamRangeJoinSql,
    "q159_stream_upsert" -> EventStream.q159StreamUpsertSql,
    "q160_crossmodal_dedup" -> TextOps.q160CrossModalDedupSql,
    // q161: SemDeDup — clusters shared with q65's Lloyd CTEs; the 0.45
    // threshold sits below the isotropic corpus's ~0.48 max pairwise
    // cosine so both dispositions appear in the oracled result
    "q161_semdedup" -> VectorOps.q161SemdedupSql,
    // q162: the winnow CTE chain is shared with q49's oracle; integer
    // hash arithmetic is identical in both engines by construction
    "q162_shared_passages" -> TextOps.q162SharedPassagesSql,
    // q163: integer counts only; top-N ties broken by the pair strings
    "q163_bpe_merges" -> TextOps.q163BpeMergesSql,
    // q164: all-integer water-filling; every division guarded
    // non-negative (Spark div truncates, DuckDB // floors — they only
    // agree on non-negatives)
    "q164_water_fill" -> TextOps.q164WaterFillSql,
    // q165: dedup is the identity on the unique-id corpus — the green
    // hash proves the streaming operator drops nothing it shouldn't;
    // drop semantics are StreamingSpec's crafted-duplicate cases
    "q165_stream_dedup" -> graft.streaming.EventStream.q165StreamDedupSql,
    // q166: every ln term gridded before the sum (q68 shape); both
    // grid sites registered in the lnBoundaryHazards guard
    "q166_dsir_weights" -> TextOps.q166DsirWeightsSql,
    // q167: rank-based cuts — exact floor(0.8n)/floor(0.9n) proportions,
    // all-integer arithmetic, md5 rank key with its own salt
    "q167_split_assign" -> TextOps.q167SplitAssignSql,
    // q168: md5 gram keys, packed-BIGINT first-occurrence min, and a
    // fixed-width interval union done as Σ min(W, gap) — all integer
    "q168_substr_dedup" -> TextOps.q168SubstrDedupSql,
    // q169: same integer span-union machinery as q168 against the
    // benchmark gram set; output restricted to training docs
    "q169_decontam_spans" -> TextOps.q169DecontamSpansSql,
    // q170: the redacted text itself is the hashed value — byte-level
    // proof the native two-pointer excision equals the declarative
    // token anti-join; token counts via the shared tcSql guard
    "q170_substr_redact" -> TextOps.q170SubstrRedactSql,
    // q171: audit sink under an injected fixed clock — counts from the
    // same tables, every literal column pure; temporal cols stringified
    "q171_audit_trail" -> graft.stg.Staging.q171AuditTrailSql,
    // q172: hopping windows enumerated by 30-min epoch-grid µs integer
    // truncation (each event in exactly two windows); moneySum cents
    "q172_stream_sliding" -> EventStream.q172StreamSlidingSql,
    // q173: integer nano-nat surprisal grid; tertile cuts via exact
    // interpolated percentile ≡ quantile_cont (q39 pattern); membership
    // compares the same integer against the same double cut both sides
    "q173_ccnet_buckets" -> TextOps.q173CcnetBucketsSql,
    // q174: final mapGroupsWithState state per user ≡ the batch census
    // (strictly-increasing counter ⇒ batch-count-invariant); floored
    // epoch seconds both sides
    "q174_stream_stateful" -> EventStream.q174StreamStatefulSql,
    // q175: every ratio rule decided on an integer 1e-4 grid of the
    // q20-proven metric mirrors; per-rule census needs no total join
    "q175_gopher_rules" -> TextOps.q175GopherRulesSql,
    // q176: built-in session_window vs µs-integer gap sessionization —
    // split iff gap STRICTLY > 30 min (exactly-gap merges; crafted
    // spec pins it), end = last event + gap; every session covered
    // (complete mode emits final extents; session windows reject
    // update mode)
    "q176_session_window" -> EventStream.q176SessionWindowSql,
    // q177: WAV samples are the payload bytes (8-bit unsigned PCM,
    // 128 midline) — the mirror recomputes amplitude from ASCII; the
    // hash proves the RIFF header round trip through the JDK parser
    "q177_audio_meta" -> CustomOps.q177AudioMetaSql,
    // q178: pure integer dot product over gridded features — no
    // doubles, no sigmoid; the boundary decision is an integer sign
    "q178_quality_logit" -> TextOps.q178QualityLogitSql,
    // q179: exact-integer group sizes over bounded QI axes
    "q179_k_anonymity" -> TextOps.q179KAnonymitySql,
    // q180: idf is the rule-8 ln site (gridded per term, hazard-guarded
    // as q180_idf); the saturation term clears to integers via the
    // ×20·Σdl trick, runs in identically-associated doubles, and is
    // gridded before the per-query integer sum
    "q180_bm25" -> TextOps.q180Bm25Sql,
    // q181: window energies and the activity decision are exact
    // integers recomputed by DuckDB from the payload bytes (q177's
    // sample identity); islands are integer rank arithmetic
    "q181_vad_segments" -> CustomOps.q181VadSegmentsSql,
    // q182: posting sample membership is an integer (tf, doc_id) rank;
    // the string renders in rank order on both engines
    "q182_postings" -> TextOps.q182PostingsSql,
    // q183: similarities gridded to 1e-6 integers BEFORE each arm's
    // argmax (rule 10), cand-id tie-breaks; margin = exact integer
    // subtraction displayed once
    "q183_triplets" -> VectorOps.q183ContrastiveTripletsSql,
    // q184: winner pick is an integer-ordered LIMIT 1; merge counting
    // is replace()'s left-to-right non-overlapping contract (identical
    // both engines) in pure integer length arithmetic
    "q184_bpe_apply" -> TextOps.q184BpeApplySql,
    // q185: exact-integer logit bucketed by a one-ulp-safe double
    // floor (Spark div truncation vs DuckDB // floor disagree on
    // negatives — both sides use the explicit floor); rule flags are
    // q175's gridded decisions
    "q185_calibration" -> TextOps.q185CalibrationSql,
    // q186: open/close are PICKS of existing doubles by the unique
    // (ts, event_id) order; volume on the cent grid; bar key crosses
    // engines as a string (temporal-key rule). LOCKSTEP: q187 below
    // reuses this exact val — EngineSpec's "lockstep" test asserts
    // reference equality, so a change here is a change to BOTH rows.
    "q186_ohlc_bars" -> EventOps.q186OhlcBarsSql,
    // q187: the streaming bar builder is hashed against the SAME
    // mirror as batch q186 — stream ≡ batch parity as a driver-checked
    // oracle row; open/close picks ride one packed (second, event_id)
    // BIGINT key (rule 9) inside the windowed aggregate. LOCKSTEP with
    // q186 (same val, mechanically asserted in EngineSpec) — never
    // fork this into its own SQL string.
    "q187_stream_ohlc" -> EventOps.q186OhlcBarsSql,
    // q188: vocabulary cutoff is an integer (count, word) order — a
    // rank-256 frequency tie resolves by word string identically both
    // engines; census is exact integers + one floor division
    "q188_vocab_coverage" -> TextOps.q188VocabCoverageSql,
    // q189: pure integer counts; the (degree, id) order key is one
    // packed BIGINT (rule 9) so orientation ties are impossible
    "q189_triangles" -> Relational.q189TrianglesSql,
    // q190: the mirror nests the q180/q48 oracle texts verbatim as
    // subqueries; reciprocals are integer 10⁶ div (60+rank) (rule 13,
    // non-negative), the fused score an exact integer sum
    "q190_rrf_fusion" -> TextOps.q190RrfFusionSql,
    // q191: 3 unrolled trainer iterations at symbol-row grain — exact
    // integer counts, integer-ordered LIMIT 1 winners, run-parity
    // greedy merges on the unique (word, pos) window key; the 3 CTE
    // blocks are generated from one template so they cannot drift
    "q191_bpe_train" -> TextOps.q191BpeTrainSql,
    // q192: maximal repeated regions by sorted-gram run extension —
    // pure integer position arithmetic; islands keyed by
    // pos − row_number on the unique (doc, pos) order
    "q192_max_repeats" -> TextOps.q192MaxRepeatsSql,
    // q193: partitioned-layout round trip — the Spark side aggregates
    // a partition-pruned read-back of a run-private month-partitioned
    // write; the mirror aggregates the ORIGINAL table, so the hash
    // proves the layout loses nothing (month as string, rule 4;
    // money on the cent grid, rule 2)
    "q193_partitioned_read" -> graft.operators.Scale.q193PartitionedReadSql,
    // q194: deterministic md5-coin edge sampling (exact p = 1/8 by hex
    // prefix, both engines), integer census + integer 512× estimate;
    // the census CTEs are the SAME template as q189's mirror
    "q194_triangle_sample" -> Relational.q194TriangleSampleSql,
    // q195: exact integer class sizes / distinct counts on bounded axes
    "q195_l_diversity" -> TextOps.q195LDiversitySql,
    // q196: the Spark side ranks by packed-word popcount Hamming; the
    // mirror counts per-dimension sign disagreements — the hash proves
    // the bit-packing; rerank reuses q48's raw-cosine discipline
    "q196_binary_ann" -> VectorOps.q196BinaryAnnSql,
    // q197: pure integer degree counts + semi joins, 3 unrolled peel
    // rounds generated from one template on both sides
    "q197_kcore" -> Relational.q197KCoreSql,
    // q198: the Spark side aggregates a bucket-local join of two
    // run-private bucketed tables; the mirror joins the ORIGINAL
    // tables — the hash proves the bucket layout round trip (band =
    // non-negative modulo; integral-double qty sums; cent-grid money)
    "q198_bucketed_join" -> graft.operators.Scale.q198BucketedJoinSql,
    // q199: boundary decisions are md5-prefix compares; chunk
    // fingerprints md5 over the pos-ordered token join; first
    // occurrence one packed BIGINT min (rule 9)
    "q199_cdc_chunks" -> TextOps.q199CdcChunksSql,
    // q200: the mirror nests the q27/q48/q196 oracle texts verbatim
    // (the q190 discipline); recall is exact integer hit counting
    "q200_ann_leaderboard" -> VectorOps.q200AnnLeaderboardSql,
    // q201: real WAV decode + stride-2 decimation; the mirror
    // recomputes from the odd-position payload chars (q177's
    // sample identity) — integer stats, stableRound mean
    "q201_audio_decimate" -> CustomOps.q201AudioDecimateSql,
    // q202: six exact BIGINT moments per type; slope/intercept/R² as
    // rule-7 doubles from the exact sums, intercept from the GRIDDED
    // slope; degenerate-series guards are CASE on the same doubles
    "q202_ols_trend" -> EventOps.q202OlsTrendSql,
    // q203: n-scaled integer cusum (no mean division), change point =
    // max-|C| then min-day; date via pure epoch-day calendar
    // arithmetic (no timezone path)
    "q203_cusum_shift" -> EventOps.q203CusumShiftSql,
    // q204: exact integer counts + floor-division ppm against nine
    // precomputed Benford ppm literals (shared constant table —
    // no query-time transcendental)
    "q204_benford" -> Relational.q204BenfordAuditSql,
    // q205: exact prefix-filtered similarity join over the q24 shingle
    // sets — candidates from rarest-first prefixes, keep decision by
    // the pure-integer cross-multiplied τ test, similarity as ppm
    // floor division; no doubles anywhere
    "q205_prefix_simjoin" -> TextOps.q205PrefixSimJoinSql,
    // q206: pairwise slopes gridded to integer ppm at birth (one
    // correctly-rounded division, rule 10), exact histogram-order-stat
    // median — never a row sort; windowed sums CAST BIGINT (rule 11)
    "q206_theil_sen" -> EventOps.q206TheilSenSql,
    // q207: persistence + seasonal-naive WAPE from exact BIGINT error
    // sums, one floor division per (type, horizon); calendar joins,
    // not observed-row lags
    "q207_naive_backtest" -> EventOps.q207NaiveBacktestSql,
    // q208: frontier from the bounded quality-grid histogram (bucket
    // max + strictly-higher running max), dominance never at doc grain
    "q208_skyline" -> TextOps.q208SkylineFrontierSql,
    // q209: coverage-expansion exact rolling distinct; counts exact
    // BIGINTs, stickiness an integer floor division
    "q209_rolling_actives" -> EventOps.q209RollingActivesSql,
    // q210: exact integer TVD numerator Σ|kl·g − gl·k| on the bounded
    // class × lang spine; ONE rule-7 double scale to ppm; the at-risk
    // decision compares the gridded integer (rule 10)
    "q210_t_closeness" -> TextOps.q210TClosenessSql,
    // q211: System-R containment estimate from bounded 1024-bucket
    // histograms, audited against the exact join count; pure integer
    "q211_join_card_est" -> Relational.q211JoinCardEstSql,
    // q212: interval weights from a (tsec, event_id)-tie-broken lead;
    // exact cents×seconds sums, one stableRound division
    "q212_twap" -> EventOps.q212TwapSql,
    // q213: per-row products gridded to integer micros at birth
    // (identical float→double cast + IEEE multiply), exact order-free
    // BIGINT sums onto the bounded 136-cell axis
    "q213_gram_matrix" -> VectorOps.q213GramMatrixSql,
    // q214: PAVA by its minimax identity — every interval average one
    // exact integer floor division of prefix-sum differences; the fit
    // is pure integer min/max, no FP anywhere
    "q214_isotonic" -> TextOps.q214IsotonicCalibrationSql,
    // q215: per-label sx·sy/n terms gridded to integer micros BEFORE
    // the label sum (rule 2), products in double per rule 7; gram arm
    // nests q213's mirror verbatim (q190 discipline)
    "q215_fisher_scatter" -> VectorOps.q215FisherScatterSql,
    // q216: two stacked leads on the (ts, event_id) tie-broken user
    // window; complete |types|³-bounded census, integer-ppm shares
    "q216_path_trigrams" -> EventOps.q216PathTrigramsSql,
    // q217: eight constraint rows, each an exact integer violation
    // count from anti-joins / key counts / scan filters; a green zero
    // IS the audited fact (q46 pattern)
    "q217_contract_checks" -> Relational.q217ContractChecksSql,
    // q218: gaps-and-islands day − row_number key; bounded histogram
    "q218_streak_dist" -> EventOps.q218StreakDistSql,
    // q219: md5-coin arms, exact integer counts, z² once in rule-7
    // doubles, significance on the 1e-6 grid vs the gridded 1.96²
    // literal (rule 10)
    "q219_ab_test" -> EventOps.q219AbTestSql,
    // q220: distances gridded at birth, per-vector score one identical
    // floor expression, per-cell mean a floor of exact integer sums;
    // assignment subtree = the shared lloydOneStep definition
    "q220_silhouette" -> VectorOps.q220SilhouetteSql,
    // q221: DBSCAN composed from oracled parts — q161 cell-bounded
    // ε-pairs at the same gridded 0.45, q50 min-label components
    // (recursive-CTE closure in the mirror); 7-row integer census
    "q221_density_clusters" -> VectorOps.q221DensityClustersSql,
    // q222: asymmetric prefix filter (contained side only) probed
    // against the full shingle relation; pure-integer containment
    // test; both directions of mutual containment are real rows
    "q222_containment_join" -> TextOps.q222ContainmentJoinSql,
    // q223: life-table hazard without the FP cumulative product —
    // pure integer counts, reverse cumsum on the bounded week axis
    "q223_conversion_hazard" -> EventOps.q223ConversionHazardSql,
    // q224: one union-then-window pass; (tsec, kind, event_id) order
    // puts same-second touches before the purchase deterministically
    "q224_attribution" -> EventOps.q224AttributionSql,
    // q225: Pregel-shape BFS — per-round persisted frontier/reached
    // sets, AS MATERIALIZED mirror; pure integer ids and counts
    "q225_bfs_hops" -> Relational.q225BfsHopsSql,
    // q226: rank-1 ALS — each least-squares divide takes exact integer
    // operands and lands on the 1e-3 grid before anything sums over
    // it; L1 fit census in exact micro units; rule-9 packed top pick
    "q226_als_step" -> Relational.q226AlsStepSql,
    // q227: Heaps-law vocabulary growth on nested md5-prefix samples;
    // exact integer counts at (term, tier) grain
    "q227_vocab_growth" -> TextOps.q227VocabGrowthSql,
    // q229: fragmentation census off q59's packing — shared Scala
    // helper and shared mirror CTE; pure integer boundary arithmetic
    "q229_chunk_census" -> TextOps.q229ChunkCensusSql,
    // q230: quantile normalization — exact decomposed target-rank
    // arithmetic, pooled CDF on the clamped ≤1e4 length grid
    "q230_quantile_align" -> TextOps.q230QuantileAlignSql,
    // q231: multi-pass SNM on q123's shared messy feed — blocked
    // ranks, offset-exploded equi-joins, ground-truth recall census
    "q231_sorted_neighborhood" -> Relational.q231SortedNeighborhoodSql,
    // q232: market-basket rules — exact-integer support/confidence
    // ppm, identical-IEEE gridded lift, rule-10 strong flag
    "q232_assoc_rules" -> Relational.q232AssocRulesSql,
    // q228: min-label-propagation components — persisted per-round
    // label relations, AS MATERIALIZED mirror, integer min/counts
    "q228_conn_comp" -> Relational.q228ConnCompSql,
    // q233: Poisson bootstrap — md5-derived integer weights against
    // literal CDF breakpoints, exact replicate means, order-stat CI
    "q233_bootstrap_ci" -> StatsOps.q233BootstrapCiSql,
    // q234: Mann-Whitney U off the histogram CDF — doubled midranks
    // exact BIGINT, one rule-7 z expression, rule-10 drift flag
    "q234_rank_drift" -> StatsOps.q234RankDriftSql,
    // q235: chi-square independence — full marginal axis incl. zero
    // cells, per-cell micro grid BEFORE the statistic sums (rule 5/8)
    "q235_chi_square" -> StatsOps.q235ChiSquareSql,
    // q236: binned ROC-AUC + threshold sweep — doubled U exact BIGINT
    // on the clamped bucket axis, one rule-7 AUC ratio, integer
    // precision/recall/F1 floor divisions
    "q236_roc_auc" -> TextOps.q236RocAucSql,
    // q237: HITS — q110's ppb normalization discipline per half-step,
    // top-k with unique tie-breaks
    "q237_hits" -> Relational.q237HitsSql,
    // q238: per-node triangle credit off the SAME oriented closing as
    // q189 (shared CTE template), bounded 11-band census
    "q238_clustering_coeff" -> Relational.q238ClusteringCoeffSql,
    // q239: RA index on the q194-sparsified graph — integer ppm, no
    // transcendental, capped wedge centers
    "q239_link_predict" -> Relational.q239LinkPredictSql,
    // q240: PLANET-style histogram split search — one corpus scan,
    // 4×64 candidate relation, rule-9 packed argmin
    "q240_decision_stump" -> TextOps.q240DecisionStumpSql,
    // q241: external cluster validation — rule-9 packed majority per
    // cell on q47's shared assignment
    "q241_cluster_purity" -> VectorOps.q241ClusterPuritySql,
    // q242: discrete-Laplace DP counts — md5 draws vs exact dyadic
    // inverse-CDF literals (one Seq generates both CASEs)
    "q242_dp_release" -> TextOps.q242DpReleaseSql,
    // q243: label propagation on the q221 cell-bounded ε-graph —
    // clamped seeds, rule-9 packed majority, held-out accuracy census
    "q243_label_prop" -> VectorOps.q243LabelPropSql,
    // q244: distributed PCA — one corpus scan to q213's gram (shared
    // CTE), 3 metadata-sized matvec/renormalize iterations
    "q244_power_iteration" -> VectorOps.q244PowerIterationSql,
    // q245: dedup-pipeline eval — exact integer Jaccard threshold,
    // precision over candidates, recall vs bounded-seed brute force
    "q245_dedup_eval" -> TextOps.q245DedupEvalSql,
    // q246: permutation importance — bucketed cyclic derangement
    // (partitioned windows only), exact contribution swap arithmetic
    "q246_perm_importance" -> TextOps.q246PermImportanceSql,
    // q247: k-fold CV of the stump — one scan, per-fold training
    // histograms by subtraction, held-out accuracy census
    "q247_cv_stump" -> TextOps.q247CvStumpSql,
    // q248: Gonzalez greedy k-center — incremental min-distance vs
    // 1-row broadcast centers, rule-9 packed farthest-point argmax
    "q248_kcenter" -> VectorOps.q248KCenterSql,
    // q249: rank-discounted graded gain — harmonic integer discounts
    // (no ln), composes the q27/q48 arms like q136
    "q249_retrieval_gain" -> VectorOps.q249RetrievalGainSql,
    // q250: Newman degree assortativity — exact edge-moment sums, one
    // rule-7 ratio, zero-variance CASE
    "q250_assortativity" -> Relational.q250AssortativitySql,
    // q251: Good–Turing count-of-counts — pure integer, left-join
    // nulls at frequency-spectrum gaps
    "q251_good_turing" -> TextOps.q251GoodTuringSql,
    // q252: Cohen's kappa — exact 2×2 confusion, rule-7 kappa ratio,
    // degenerate marginal CASEs to NULL
    "q252_cohen_kappa" -> TextOps.q252CohenKappaSql,
    // q253: leave-one-source-out ablation — q247 subtraction algebra
    // at source grain, 1-row global broadcast
    "q253_source_ablation" -> TextOps.q253SourceAblationSql,
    // q254: seeded-teleport PPR — q110's iteration/grid verbatim with
    // restart mass on the seed; same staged edge relation
    "q254_ppr" -> EventOps.q254PersonalizedPagerankSql,
    // q255: soft-dedup loss weights — q50's staged clusters composed
    // q52-style, banded integer weight census
    "q255_dup_weights" -> TextOps.q255DupWeightsSql,
    // q256: unbiased Simpson diversity — exact rational, no ln
    "q256_simpson" -> TextOps.q256SimpsonDiversitySql,
    // q257: MinHash sketch calibration — slice-agreement bins vs
    // exact integer Jaccard over the LSH-bounded candidates
    "q257_minhash_calib" -> TextOps.q257MinhashCalibrationSql,
    // q258: Moore-Lewis cross-entropy-difference selection — two
    // smoothed unigram LMs, vocab-grain ln grid, banded score census
    "q258_moore_lewis" -> TextOps.q258MooreLewisSql,
    // q259: Jensen-Shannon divergence per source vs rest — ppb
    // probability grid, integer ln args, closed-form OOV remainder
    "q259_jsd_sources" -> TextOps.q259JsdSourcesSql,
    // q260: streaming near-dup front door — stream-static left join
    // of the doc stream onto the staged q50 clusters; mirror
    // recomputes the clusters via the recursive CTE (the eleventh
    // oracled streaming surface; StreamingSpec holds the batch-twin
    // lockstep)
    "q260_stream_dedup_lookup" -> TextOps.q260StreamDedupLookupSql,
    // q261: hybrid consensus eval — RRF fused recall@5 vs each single
    // arm against the both-arms consensus set; mirror nests the q180,
    // q48, and q190 oracles verbatim
    "q261_hybrid_eval" -> TextOps.q261HybridEvalSql,
    // q262: deterministic HyperLogLog — md5 sketch, integer registers,
    // one IEEE division on spliced literals; exact arm is the truth
    "q262_hll_distinct" -> TextOps.q262HllDistinctSql,
    // q263: one multiplicative-weights domain-reweighting step over
    // per-source excess LM surprisal (linearized DoReMi update —
    // exact rationals, no engine-evaluated exp)
    "q263_domain_reweight" -> TextOps.q263DomainReweightSql,
    // q264: streaming per-day top-3 users — the twelfth oracled
    // streaming surface (watermarked tumbling agg + drained leaderboard)
    "q264_stream_heavy_hitters" -> EventStream.q264StreamHeavyHittersSql,
    // q265: DPR-style hard-negative mining — BM25 candidates labeled by
    // exact-semantic membership, cosine as the hardness key
    "q265_hard_negatives" -> VectorOps.q265HardNegativesSql,
    // q266: cross-split near-dup leakage — q88's split function over
    // the staged q50 clusters, per-split-pair spanning census
    "q266_split_leakage" -> TextOps.q266SplitLeakageSql,
    // q267: schema-evolution merged read — two parquet generations,
    // old rows surface the evolved column as NULL
    "q267_schema_evolution" -> graft.operators.Scale.q267SchemaEvolutionSql,
    // q268: native Morton-interleave layout key — census per z-range
    // exhibits the both-dimensions-bounded clustering property
    "q268_zorder_layout" -> graft.operators.Scale.q268ZorderLayoutSql,
    // q269: int8 scalar-quantization error audit — per-dim affine code
    // grid, relative reconstruction error in exact ppb
    "q269_sq8_quant" -> VectorOps.q269Sq8QuantSql,
    // q270: two-sample chi-square drift monitor — first vs second
    // stream half over a bounded 16-band value axis, no transcendental
    "q270_drift_chi2" -> EventOps.q270DriftChi2Sql,
    // q271: S11 full-refresh sink — overwrite replaces the stale
    // snapshot; census of the read-back table = the refresh alone
    "q271_full_refresh" -> graft.stg.Staging.q271FullRefreshSql,
    // q272: S12 truncate-reload temp + J4 upsert composition — temp
    // holds ONLY the last batch, merged holds each key exactly once
    "q272_truncate_reload" -> graft.stg.Staging.q272TruncateReloadSql,
    // q273: S3 golden CSV writer — text round trip loses nothing and
    // renders every date in the golden 'yyyy-MM-dd HH:mm:ss' format
    "q273_golden_csv" -> graft.mart.Extracts.q273GoldenCsvSql,
    // q274: S8 normalization capstone — the tabula-shaped checked-in
    // fixture through the reference's full repair chain incl. the
    // positional junk-row skip q45 could not oracle
    "q274_usda_capstone" -> graft.stg.Normalizer.q274UsdaCapstoneSql,
    // q275: incremental LSH maintenance — the append path censused
    // against the FULL-REBUILD mirror (invisible-rewrite oracle)
    "q275_incremental_lsh" -> TextOps.q275IncrementalLshSql,
    // q276: count-min sketch — bounded 4x512 sketch's estimates beside
    // exact counts for the top-20 trigrams; over_ppm >= 0 always (the
    // CMS one-sided guarantee), bit-exact via md5-slice hash rows
    "q276_count_min" -> TextOps.q276CountMinSql,
    // q277: split-conformal prediction intervals — q̂ is an exact
    // order statistic off the bounded centi-score histogram CDF;
    // k > n_cal yields the textbook infinite interval (NULL q̂,
    // coverage 1e6) in both engines
    "q277_conformal" -> StatsOps.q277ConformalSql,
    // q278: interpolated Kneser-Ney — top-20 bigram calibration table
    // off the shared q62 bigram grain; d=3/4 keeps the discounted
    // numerator exact integer, the KN probability is one rule-7
    // double expression ppm-gridded
    "q278_kneser_ney" -> TextOps.q278KneserNeySql,
    // q279: k-truss peel census — edge-grain cohesion beside q197's
    // k-core; round 0 support reads the staged triangle relation,
    // later rounds re-close wedges only on the shrinking survivors
    "q279_ktruss" -> Relational.q279KTrussSql,
    // q280: Wald SPRT sequential monitor — Spark runs the q111
    // two-phase prefix decomposition, the oracle the single-phase
    // walk; first boundary crossing via min(n) + equi-join back
    "q280_sprt" -> EventOps.q280SprtSql,
    // q281: TextRank keywords — q110's ppb power iteration at
    // vocabulary grain over the symmetrized co-occurrence graph
    "q281_textrank" -> TextOps.q281TextRankSql,
    // q282: Borůvka spanning forest — per-component packed-BIGINT
    // argmin picks (cut-property certified), bounded contraction hops,
    // cross-round anti-join census
    "q282_boruvka" -> Relational.q282BoruvkaSql,
    // q283: trained multinomial NB lang classifier — all four ln
    // sites micro-nat gridded + hazard-registered; scores exact
    // BIGINT sums; unseen tokens need no join arm (ln 1 = 0)
    "q283_naive_bayes" -> TextOps.q283NaiveBayesSql,
    // q284: greedy set cover — packed-max pick per round, NULL pick
    // on an exhausted universe reported as doc -1 both sides
    "q284_set_cover" -> TextOps.q284SetCoverSql,
    // q285: Neyman allocation + Hamilton rounding — exact integer
    // apportionment on the |sources| axis; zero-variance corpora fall
    // back to proportional-to-size identically both sides
    "q285_neyman_alloc" -> StatsOps.q285NeymanAllocSql,
    // q286: Markov entropy rate — both ln sites micro-nat gridded +
    // hazard-registered; per-pair terms exact non-negative BIGINTs;
    // reads the q110/q254 staged transition relation
    "q286_entropy_rate" -> EventOps.q286EntropyRateSql,
    // q287: the q280 SPRT as a streaming front door — same oracle SQL
    // (q131 single-batch validity argument: one parquet file = one
    // micro-batch); the multi-batch carry path is StreamingSpec's
    "q287_stream_sprt" -> EventOps.q280SprtSql,
    // q288: the scale-safe q264 twin — update-mode windowed agg (state
    // evicted by watermark) + foreachBatch keyed top-k store bounded
    // by (windows × k); same oracle SQL as q264, cut-and-re-enter
    // multi-batch path is StreamingSpec's
    "q288_stream_hh_scaled" -> EventStream.q264StreamHeavyHittersSql,
    // q289: the sketch-bounded heavy-hitter shape — per-day count-min
    // cells maintained additively across micro-batches (state
    // |days|x2048 regardless of user cardinality), distinct-candidate
    // probe + rank at readout; oracle replays the SAME md5-slice
    // sketch (q276 discipline), so est_cms is bit-exact, not approx
    "q289_stream_cms_hh" -> EventStream.q289StreamCmsHeavyHittersSql,
  )
}
