package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Documents, Events, MLFeatures, PipelineE2E, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (names carry the
  * §2 id); `oracleSql` holds the DuckDB-equivalent SQL over the same
  * parquet tables, with identical column aliases and ORDER BY so the
  * driver's sorted-column hash compare is deterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"          -> (Relational.q1Agg _),
    "s3_parquet_scan" -> (Relational.s3ParquetScan _),
    "p2_select"       -> (Relational.p2Select _),
    "p5_between"      -> (Relational.p5Between _),
    "p6p7p8_predicates" -> (Relational.p6p7p8Predicates _),
    "f_scalar_fns"    -> (Relational.fScalarFns _),
    "a1_mode"         -> (Relational.a1Mode _),
    "a2_mean"         -> (Relational.a2Mean _),
    "a4_topk_freq"    -> (Relational.a4TopK _),
    "a5_distinct"     -> (Relational.a5Distinct _),
    "a6_summary"      -> (Relational.a6Summary _),
    "a9_percentile"   -> (Relational.a9Percentile _),
    "j1_left_join"    -> (Relational.j1LeftJoin _),
    "j2_inner_join"   -> (Relational.j2InnerJoin _),
    "j3_semi_join"    -> (Relational.j3SemiJoin _),
    "j4_anti_join"    -> (Relational.j4AntiJoin _),
    "j5_asof_join"    -> (Events.j5AsofJoin _),
    "o1_topk_limit"   -> (Relational.o1TopkLimit _),
    "u2_union"        -> (Relational.u2Union _),
    "w1_row_number"   -> (Relational.w1RowNumber _),
    "w2_in_subquery"  -> (Relational.w2InSubquery _),
    "w3_running_sum"  -> (Relational.w3RunningSum _),
    "r3_distinct"     -> (Relational.r3Distinct _),
    "f2_date_parse"   -> (Relational.f2DateParse _),
    "a_cube"          -> (Relational.aCube _),
    "s6_csv_roundtrip" -> (Relational.s6CsvRoundtrip _),
    "a_pivot"         -> (Relational.aPivot _),
    "u3_intersect_except" -> (Relational.u3IntersectExcept _),
    "w4_lead_ntile"   -> (Relational.w4LeadNtile _),
    "s9_json_roundtrip" -> (Relational.s9JsonRoundtrip _),
    "s5_orc_roundtrip" -> (Relational.s5OrcRoundtrip _),
    "s5_partitioned_roundtrip" -> (Relational.s5PartitionedRoundtrip _),
    "q1_typed"        -> (Relational.q1Typed _),
    "q3_shipping"     -> (Relational.q3Shipping _),
    "q5_local_supplier" -> (Relational.q5LocalSupplier _),
    "u_upsert"        -> (Relational.uUpsert _),
    "s_merge_schema"  -> (Relational.sMergeSchema _),
    "dq_checks"       -> (Relational.dqChecks _),
    "w5_rank_family"  -> (Relational.w5RankFamily _),
    "a_rollup"        -> (Relational.aRollup _),
    "a_stats_corr"    -> (Relational.aStatsCorr _),
    "a_map_metrics"   -> (Relational.aMapMetrics _),
    "m5_parse_emp_length" -> (MLFeatures.m5ParseEmpLength _),
    "a1_modes_multi"  -> (MLFeatures.a1ModesMulti _),
    "ops_mean_impute" -> (MLFeatures.opsMeanImpute _),
    "m1_string_indexer" -> (MLFeatures.m1StringIndexer _),
    "m2_one_hot"      -> (MLFeatures.m2OneHot _),
    "m6_label_encode" -> (MLFeatures.m6LabelEncode _),
    "m7_binary_target" -> (MLFeatures.m7BinaryTarget _),
    "m8_psi"          -> (MLFeatures.m8Psi _),
    "a7_value_counts" -> (MLFeatures.a7ValueCounts _),
    "d1_exact_dedup"  -> (Documents.d1ExactDedup _),
    "d2_minhash_lsh"  -> (Documents.d2MinHashLsh _),
    "d3_simhash"      -> (Documents.d3SimHash _),
    "d4_ngram_jaccard" -> (Documents.d4NgramJaccard _),
    "d5_embed_dup"    -> (Documents.d5EmbedDup _),
    "d6_dedup_clusters" -> (Documents.d6DedupClusters _),
    "d8_semantic_dedup" -> (Documents.d8SemanticDedup _),
    "t1_token_count"  -> (Documents.t1TokenCount _),
    "t2_quality"      -> (Documents.t2Quality _),
    "t5_tfidf"        -> (Documents.t5TfIdf _),
    "t6_repetition"   -> (Documents.t6Repetition _),
    "t7_redact_pii"   -> (Documents.t7RedactPii _),
    "t8_pack_sequences" -> (Documents.t8PackSequences _),
    "t9_lm_score"     -> (Documents.t9LmScore _),
    "r4_quota_sample" -> (Documents.r4QuotaSample _),
    "d7_incremental_dedup" -> (Documents.d7IncrementalDedup _),
    "d15_fp_store" -> (Documents.d15FpStore _),
    "r5_temperature_mix" -> (Documents.r5TemperatureMix _),
    "t10_contamination" -> (Documents.t10Contamination _),
    "t14_bloom_decontam" -> (Documents.t14BloomDecontam _),
    "t11_chunking"    -> (Documents.t11Chunking _),
    "s_jsonl_roundtrip" -> (Documents.sJsonlRoundtrip _),
    "llm_pretrain_pipeline" -> (Documents.llmPretrainPipeline _),
    "llm_corpus_pipeline" -> (Documents.llmCorpusPipeline _),
    "j6_range_join"   -> (Events.j6RangeJoin _),
    "t3_lang_id"      -> (Documents.t3LangId _),
    "t4_fingerprint"  -> (Documents.t4Fingerprint _),
    "ann1_brute_force" -> (Documents.ann1BruteForce _),
    "ann2_lsh"        -> (Documents.ann2Lsh _),
    "t1_tumbling_window" -> (Events.t1TumblingWindow _),
    "s_sessionize"    -> (Events.sessionize _),
    "f_json_extract"  -> (Events.fJsonExtract _),
    "pipeline_e2e"    -> (PipelineE2E.featureStoreStats _),
    "r1_sample"       -> (MLFeatures.r1Sample _),
    "r2_hash_split"   -> (MLFeatures.r2HashSplit _),
    "m9_class_metrics" -> (MLFeatures.m9ClassMetrics _),
    "mm1_media_meta"  -> (Documents.mm1MediaMeta _),
    "mm2_media_features" -> (Documents.mm2MediaFeatures _),
    "ann3_ivf"        -> (Documents.ann3Ivf _),
    "g_explode_slice" -> (Documents.gExplodeSlice _),
    "d9_dup_spans"    -> (Documents.d9DupSpans _),
    "r6_epoch_mix"    -> (Documents.r6EpochMix _),
    "t12_quality_cut" -> (Documents.t12QualityCut _),
    "a10_approx_distinct" -> (Relational.a10ApproxDistinct _),
    "a12_approx_quantiles" -> (Relational.a12ApproxQuantiles _),
    "a11_heavy_hitters" -> (Relational.a11HeavyHitters _),
    "d10_incremental_neardup" -> (Documents.d10IncrementalNearDup _),
    "j7_salted_join"  -> (Relational.j7SaltedJoin _),
    "s_compact_roundtrip" -> (Relational.sCompactRoundtrip _),
    "s_zorder_roundtrip" -> (Relational.sZorderRoundtrip _),
    "r7_shuffle_shard" -> (Documents.r7ShuffleShard _),
    // exact distinct counts: the gate value-compares against DuckDB's
    // exact COUNT(DISTINCT); the operator's scale default is approx
    // (spec pins approx within 5% of exact)
    "dq_profile"      -> ((s: SparkSession, dir: String) =>
      Relational.dqProfile(s, dir, exact = true)),
    "j8_full_outer"   -> (Relational.j8FullOuter _),
    "t13_hopping_window" -> (Events.t13HoppingWindow _),
    "llm_shard_pipeline" -> (Documents.llmShardPipeline _),
    "w6_range_frame"  -> (Relational.w6RangeFrame _),
    "a_grouping_sets" -> (Relational.aGroupingSets _),
    "d11_neardup_store" -> (Documents.d11NearDupStore _),
    "d12_semantic_wc" -> (Documents.d12SemanticWc _),
    "d13_dedup_rewrite" -> (Documents.d13DedupRewrite _),
    "a_unpivot"       -> (Relational.aUnpivot _),
    "ann4_ivf_store"  -> (Documents.ann4IvfStore _),
    "d14_store_append" -> (Documents.d14StoreAppend _),
    "d29_neardup_compacted" -> (Documents.d29NearDupCompacted _),
    "t15_decontam_rewrite" -> (Documents.t15DecontamRewrite _),
    "t16_stratified_cut" -> (Documents.t16StratifiedCut _),
    "t17_vocab_per_lang" -> (Documents.t17VocabPerLang _),
    "ann5_ivf_append" -> (Documents.ann5IvfAppend _),
    "ann20_ivf_rebuilt" -> (Documents.ann20IvfRebuilt _),
    "d16_cluster_best" -> (Documents.d16ClusterBest _),
    "d17_canonical_dedup" -> (Documents.d17CanonicalDedup _),
    "dq_skew_stats"   -> (Relational.dqSkewStats _),
    "u_scd2"          -> (Relational.uScd2 _),
    "llm_curation_pipeline" -> (Documents.llmCurationPipeline _),
    "ann6_hybrid_rerank" -> (Documents.ann6HybridRerank _),
    "t18_self_dedup_rewrite" -> (Documents.t18SelfDedupRewrite _),
    "s_publish_roundtrip" -> (Documents.sPublishRoundtrip _),
    "s_publish_compact" -> (Documents.sPublishCompact _),
    "t19_decontam_auto" -> (Documents.t19DecontamAuto _),
    "ann7_cell_stats" -> (Documents.ann7CellStats _),
    "d18_char_dedup_rewrite" -> (Documents.d18CharDedupRewrite _),
    "s_publish_zorder" -> (Documents.sPublishZorder _),
    "d19_boilerplate" -> (Documents.d19Boilerplate _),
    "m13_quality_filter" -> (Documents.m13QualityFilter _),
    "d20_boilerplate_store" -> (Documents.d20BoilerplateStore _),
    "t20_gopher_rules" -> (Documents.t20GopherRules _),
    "ann8_pq_adc" -> (Documents.ann8PqAdc _),
    "ann9_pq_store" -> (Documents.ann9PqStore _),
    "r8_dsir_select" -> (Documents.r8DsirSelect _),
    "llm_select_pipeline" -> (Documents.llmSelectPipeline _),
    "ann10_ivf_pq" -> (Documents.ann10IvfPq _),
    "t21_bpe_encode" -> (Documents.t21BpeEncode _),
    "t22_corpus_card" -> (Documents.t22CorpusCard _),
    "m14_text_drift" -> (Documents.m14TextDrift _),
    "t23_decontam_store" -> (Documents.t23DecontamStore _),
    "t29_decontam_stream" -> (Documents.t29DecontamStream _),
    "m15_release_gate" -> (Documents.m15ReleaseGate _),
    "m16_incremental_reproc" -> (Documents.m16IncrementalReproc _),
    "ann11_incremental_reembed" -> (Documents.ann11IncrementalReembed _),
    "r12_curriculum_order" -> (Documents.r12CurriculumOrder _),
    "t24_bigram_lm" -> (Documents.t24BigramLm _),
    "t25_ccnet_buckets" -> (Documents.t25CcnetBuckets _),
    "r9_leakage_split" -> (Documents.r9LeakageSplit _),
    "r10_unimax" -> (Documents.r10Unimax _),
    "llm_ccnet_pipeline" -> (Documents.llmCcnetPipeline _),
    "t26_bigram_lm_store" -> (Documents.t26BigramLmStore _),
    "t27_snapshot_diff" -> (Documents.t27SnapshotDiff _),
    "t28_ngram_novelty" -> (Documents.t28NgramNovelty _),
    "r11_cluster_split" -> (Documents.r11ClusterSplit _),
    "mm3_frame_sample" -> (Documents.mm3FrameSample _),
    "r13_doremi" -> (Documents.r13Doremi _),
    "llm_doremi_mix" -> (Documents.llmDoremiMix _),
    "llm_doremi_pipeline" -> (Documents.llmDoremiPipeline _),
    "t30_char_entropy" -> (Documents.t30CharEntropy _),
    "d21_prototypicality" -> (Documents.d21Prototypicality _),
    "llm_d4_pipeline" -> (Documents.llmD4Pipeline _),
    "t31_c4_line_clean" -> (Documents.t31C4LineClean _),
    "llm_curriculum_pipeline" -> (Documents.llmCurriculumPipeline _),
    "t32_vocab_growth" -> (Documents.t32VocabGrowth _),
    "t33_html_strip" -> (Documents.t33HtmlStrip _),
    "d22_url_dedup" -> (Documents.d22UrlDedup _),
    "ann12_hard_negatives" -> (Documents.ann12HardNegatives _),
    "ann13_cdc_maintenance" -> (Documents.ann13CdcMaintenance _),
    "d23_dedup_stream" -> (Documents.d23DedupStream _),
    "d24_boilerplate_stream" -> (Documents.d24BoilerplateStream _),
    "d25_neardup_stream" -> (Documents.d25NearDupStream _),
    "t34_lm_stream" -> (Documents.t34LmScoreStream _),
    "t35_fuzzy_decontam" -> (Documents.t35FuzzyDecontam _),
    "mm4_image_dedup" -> (Documents.mm4ImageDedup _),
    "mm5_image_dedup_store" -> (Documents.mm5ImageDedupStore _),
    "mm7_audio_dedup" -> (Documents.mm7AudioDedup _),
    "llm_decontam_report" -> (Documents.llmDecontamReport _),
    "mm8_video_dedup" -> (Documents.mm8VideoDedup _),
    "t37_link_rank" -> (Documents.t37LinkRank _),
    "llm_rank_select" -> (Documents.llmRankSelect _),
    "mm6_image_dedup_stream" -> (Documents.mm6ImageDedupStream _),
    "llm_rag_pipeline" -> (Documents.llmRagPipeline _),
    "t36_fuzzy_decontam_store" -> (Documents.t36FuzzyDecontamStore _),
    "ann15_ivf_stream" -> (Documents.ann15IvfStream _),
    "ann19_pq_stream" -> (Documents.ann19PqStream _),
    "ann14_hard_negatives_ann" -> (Documents.ann14HardNegativesAnn _),
    "r14_length_buckets" -> (Documents.r14LengthBuckets _),
    "llm_web_pipeline" -> (Documents.llmWebPipeline _),
    "d26_exact_dedup_stream" -> (Documents.d26ExactDedupStream _),
    "d27_corpus_ingest_stream" -> (Documents.d27CorpusIngestStream _),
    "t38_link_rank_dangling" -> (Documents.t38LinkRankDangling _),
    "llm_rank_weighted_mix" -> (Documents.llmRankWeightedMix _),
    "mm9_audio_dedup_stream" -> (Documents.mm9AudioDedupStream _),
    "mm10_video_dedup_stream" -> (Documents.mm10VideoDedupStream _),
    "d28_soft_dedup" -> (Documents.d28SoftDedup _),
    "llm_softdedup_mix" -> (Documents.llmSoftdedupMix _),
    "t39_url_filter" -> (Documents.t39UrlFilter _),
    "t40_fim_transform" -> (Documents.t40FimTransform _),
    "t41_text_scrub" -> (Documents.t41TextScrub _),
    "llm_code_pipeline" -> (Documents.llmCodePipeline _),
    "t42_domain_prior" -> (Documents.t42DomainPrior _),
    "llm_refinedweb_pipeline" -> (Documents.llmRefinedwebPipeline _),
    "ann16_filtered_ann" -> (Documents.ann16FilteredAnn _),
    "ann17_knn_join" -> (Documents.ann17KnnJoin _),
    "t43_chat_render" -> (Documents.t43ChatRender _),
    "llm_sft_pipeline" -> (Documents.llmSftPipeline _),
    "ann18_medoid_assign" -> (Documents.ann18MedoidAssign _),
    "llm_diversity_sample" -> (Documents.llmDiversitySample _),
    "t44_span_corrupt" -> (Documents.t44SpanCorrupt _),
    "m17_retrieval_metrics" -> (Documents.m17RetrievalMetrics _),
    "llm_dpo_pairs" -> (Documents.llmDpoPairs _),
    "t45_sft_dedup_stream" -> (Documents.t45SftDedupStream _),
    "llm_chat_from_logs" -> (Documents.llmChatFromLogs _),
    "t46_bm25_topk" -> (Documents.t46Bm25TopK _),
    "llm_hybrid_retrieval" -> (Documents.llmHybridRetrieval _),
    "t47_bm25_store" -> (Documents.t47Bm25Store _),
    "t48_bm25_append" -> (Documents.t48Bm25Append _),
    "t49_bm25_pruned" -> (Documents.t49Bm25Pruned _),
    "t50_decontam_compacted" -> (Documents.t50DecontamCompacted _),
    "t51_bm25_rebuilt" -> (Documents.t51Bm25Rebuilt _),
    "d30_fp_compacted" -> (Documents.d30FpCompacted _),
    "fuzz_differential" -> (graft.queries.Fuzz.fuzzDifferential _),
  ) ++ graft.queries.Medallion.queries

  /** T20's oracle: every Gopher rule statistic recomputed on RAW gram
    * strings (the engine's doc-local sorted-run scan must agree with a
    * plain per-(doc, gram) GROUP BY). Char-mass convention: count ×
    * charLen per gram, raw text length as the denominator — see
    * TextAnalysis.gramCoverage. */
  private val gopherTopNs = Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  private val gopherDupNs = Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12,
    9 -> 0.11, 10 -> 0.10)

  /** The conjunction the `keep` flag pins — shared by t20's oracle and
    * the llm_select_pipeline composite's kept-docs stage. */
  private val gopherKeepRules: String = (Seq(
    "n_words BETWEEN 50 AND 100000",
    "mean_word_len BETWEEN 3 AND 10",
    "symbol_ratio <= 0.1",
    "alpha_word_frac >= 0.8",
    "stop_hits >= 2") ++
    gopherTopNs.map { case (n, thr) => s"top${n}_frac <= $thr" } ++
    gopherDupNs.map { case (n, thr) => s"dup${n}_frac <= $thr" })
    .mkString(" AND ")

  /** T24's oracle chain through `scored` (one row per ≥2-token doc
    * with its bigram count and interpolated LM score) — shared by the
    * t24 gate and t25's bucket census. Caps tie-break on md5 hex (the
    * engine's collation-proof rule); the interpolation writes
    * `(1 - 0.7)` as a subtraction so both engines evaluate the
    * identical double. */
  private val bigramLmCtes: String =
    """WITH tok AS (SELECT doc_id AS id,
      |  regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |uniall AS (SELECT w, count(*) AS uc
      |  FROM (SELECT unnest(ws) AS w FROM tok) GROUP BY w),
      |dn AS (SELECT CAST(sum(uc) AS BIGINT) + count(*) AS denom FROM uniall),
      |uni AS (SELECT w, uc FROM uniall ORDER BY uc DESC, md5(w) LIMIT 100000),
      |db AS (SELECT id, unnest(list_transform(range(1, len(ws)),
      |    i -> {'p': ws[i], 'c': ws[i + 1]})) AS bg
      |  FROM tok WHERE len(ws) >= 2),
      |db2 AS (SELECT id, bg.p AS p, bg.c AS c FROM db),
      |bc AS (SELECT p, c, count(*) AS bc FROM db2 GROUP BY p, c
      |  ORDER BY bc DESC, md5(p || ' ' || c) LIMIT 200000),
      |scored AS (SELECT db2.id, count(*) AS n_bigrams,
      |  round(avg(ln((CASE WHEN coalesce(pu.uc, 0) > 0
      |      THEN coalesce(bc.bc, 0) * 1.0 / pu.uc ELSE 0 END) * 0.7
      |    + ((coalesce(cu.uc, 0) + 1) * 1.0 / denom) * (1 - 0.7))), 6) AS avg_logp
      |  FROM db2 LEFT JOIN bc ON db2.p = bc.p AND db2.c = bc.c
      |  LEFT JOIN uni pu ON db2.p = pu.w
      |  LEFT JOIN uni cu ON db2.c = cu.w, dn
      |  GROUP BY db2.id)""".stripMargin

  /** The TARGET-TRAINED variant of [[bigramLmCtes]] — model CTEs read
    * the src0 slice, scoring reads the whole corpus (tok carries lang
    * for consumers that bucket) — shared by the llm_ccnet_pipeline and
    * t26_bigram_lm_store oracles so the two store-equals-live gates
    * can never drift apart on the chain itself. Same FP-order and
    * md5-tie-break conventions as the single-corpus chain. */
  private val targetBigramLmCtes: String =
    """WITH tok AS (SELECT doc_id AS id, lang,
      |  regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |ttok AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ws
      |  FROM documents WHERE source = 'src0'),
      |uniall AS (SELECT w, count(*) AS uc
      |  FROM (SELECT unnest(ws) AS w FROM ttok) GROUP BY w),
      |dn AS (SELECT CAST(sum(uc) AS BIGINT) + count(*) AS denom FROM uniall),
      |uni AS (SELECT w, uc FROM uniall ORDER BY uc DESC, md5(w) LIMIT 100000),
      |tb AS (SELECT unnest(list_transform(range(1, len(ws)),
      |    i -> {'p': ws[i], 'c': ws[i + 1]})) AS bg
      |  FROM ttok WHERE len(ws) >= 2),
      |tb2 AS (SELECT bg.p AS p, bg.c AS c FROM tb),
      |bc AS (SELECT p, c, count(*) AS bc FROM tb2 GROUP BY p, c
      |  ORDER BY bc DESC, md5(p || ' ' || c) LIMIT 200000),
      |db AS (SELECT id, unnest(list_transform(range(1, len(ws)),
      |    i -> {'p': ws[i], 'c': ws[i + 1]})) AS bg
      |  FROM tok WHERE len(ws) >= 2),
      |db2 AS (SELECT id, bg.p AS p, bg.c AS c FROM db),
      |scored AS (SELECT db2.id, count(*) AS n_bigrams,
      |  round(avg(ln((CASE WHEN coalesce(pu.uc, 0) > 0
      |      THEN coalesce(bc.bc, 0) * 1.0 / pu.uc ELSE 0 END) * 0.7
      |    + ((coalesce(cu.uc, 0) + 1) * 1.0 / denom) * (1 - 0.7))), 6) AS avg_logp
      |  FROM db2 LEFT JOIN bc ON db2.p = bc.p AND db2.c = bc.c
      |  LEFT JOIN uni pu ON db2.p = pu.w
      |  LEFT JOIN uni cu ON db2.c = cu.w, dn
      |  GROUP BY db2.id)""".stripMargin

  /** The gopher-rule CTE chain through `f` (one row per doc with every
    * rule value), over relation `rel` — reused by t20's oracle and the
    * llm_select_pipeline composite. */
  private def gopherCtes(rel: String): String = {
    val topNs = gopherTopNs
    val dupNs = gopherDupNs
    val gramCtes = (topNs ++ dupNs).map(_._1).map { n =>
      s"""g$n AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - $n + 2),
         |    i -> array_to_string(list_slice(ws, i, i + $n - 1), ' '))) AS s
         |  FROM t WHERE len(ws) >= $n),
         |c$n AS (SELECT doc_id, s, count(*) AS c FROM g$n GROUP BY doc_id, s),
         |m$n AS (SELECT doc_id, max(c * length(s)) AS maxp,
         |  sum(CASE WHEN c >= 2 THEN c * length(s) ELSE 0 END) AS dups
         |  FROM c$n GROUP BY doc_id)""".stripMargin
    }.mkString(",\n")
    val fracCols = (topNs.map { case (n, _) =>
      s"round(coalesce(m$n.maxp, 0) * 1.0 / n_chars, 6) AS top${n}_frac"
    } ++ dupNs.map { case (n, _) =>
      s"round(coalesce(m$n.dups, 0) * 1.0 / n_chars, 6) AS dup${n}_frac"
    }).mkString(",\n  ")
    val joins = (topNs ++ dupNs).map(_._1)
      .map(n => s"LEFT JOIN m$n ON b.doc_id = m$n.doc_id").mkString(" ")
    s"""t AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS ws FROM $rel),
       |base AS (SELECT doc_id, text, ws,
       |  CAST(len(ws) AS BIGINT) AS n_words,
       |  round(list_sum(list_transform(ws, w -> length(w))) * 1.0 / greatest(len(ws), 1), 6) AS mean_word_len,
       |  round(((length(text) - length(replace(text, '#', ''))) +
       |    (length(text) - length(replace(text, '...', ''))) / 3) * 1.0
       |    / greatest(len(ws), 1), 6) AS symbol_ratio,
       |  round(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) * 1.0
       |    / greatest(len(ws), 1), 6) AS alpha_word_frac,
       |  CAST((CASE WHEN list_contains(ws, 'the') THEN 1 ELSE 0 END)
       |    + (CASE WHEN list_contains(ws, 'a') THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits,
       |  greatest(length(text), 1) AS n_chars
       |  FROM t),
       |$gramCtes,
       |f AS (SELECT b.doc_id, n_words, mean_word_len, symbol_ratio,
       |  alpha_word_frac, stop_hits,
       |  $fracCols
       |  FROM base b $joins)""".stripMargin
  }

  private val gopherSql: String =
    s"""WITH ${gopherCtes("documents")}
       |SELECT *, CAST(CASE WHEN $gopherKeepRules THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM f ORDER BY doc_id""".stripMargin

  /** The DSIR CTE chain (distinct `d`-prefixed names so it composes
    * with other chains in one WITH): target = src0 slice of `rel`, raw
    * pool = all of `rel`; ends at `dw` (doc_id, log_w). Shared by r8's
    * oracle and the llm_select_pipeline composite. */
  private def dsirCtes(rel: String): String =
    s"""dt AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS ws FROM $rel),
       |dg AS (SELECT doc_id, source, unnest(ws) AS g FROM dt
       |  UNION ALL
       |  SELECT doc_id, source, unnest(list_transform(range(1, len(ws)),
       |    i -> ws[i] || ' ' || ws[i+1])) AS g
       |  FROM dt WHERE len(ws) >= 2),
       |db AS (SELECT doc_id, source,
       |  (strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 16 +
       |  (strpos('0123456789abcdef', substr(md5(g), 2, 1)) - 1) AS bk FROM dg),
       |dtc AS (SELECT bk, count(*) AS c FROM db WHERE source = 'src0' GROUP BY bk),
       |drc AS (SELECT bk, count(*) AS c FROM db GROUP BY bk),
       |dtt AS (SELECT sum(c) AS tot FROM dtc),
       |drt AS (SELECT sum(c) AS tot FROM drc),
       |dratio AS (SELECT r.bk,
       |  ln((coalesce(t.c, 0) + 1.0) / (dtt.tot + 256)) -
       |  ln((r.c + 1.0) / (drt.tot + 256)) AS lr
       |  FROM drc r LEFT JOIN dtc t USING (bk), dtt, drt),
       |dw AS (SELECT doc_id, round(sum(lr), 6) AS log_w
       |  FROM db JOIN dratio ON db.bk = dratio.bk GROUP BY doc_id)""".stripMargin

  /** R13's oracle CTEs — DoReMi excess loss and one-EG-step weights
    * over the hashed-gram bucket distributions (dsirCtes' bucket rule,
    * keyed by source). `mw` carries (source, n_grams, excess, weight);
    * excess is rounded to 6 dp BEFORE the exponential on both engines
    * (the r8 rule: bucket-sum order differs in the last ulps and the
    * softmax must not see it). Constants pinned to the gate: eta 10,
    * smoothing 0.1, 256 buckets. */
  private val doremiCtes: String =
    """mt AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |mg AS (SELECT doc_id, source, unnest(ws) AS g FROM mt
      |  UNION ALL
      |  SELECT doc_id, source, unnest(list_transform(range(1, len(ws)),
      |    i -> ws[i] || ' ' || ws[i+1])) AS g
      |  FROM mt WHERE len(ws) >= 2),
      |mb AS (SELECT source,
      |  (strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 16 +
      |  (strpos('0123456789abcdef', substr(md5(g), 2, 1)) - 1) AS bk FROM mg),
      |mc AS (SELECT source, bk, count(*) AS c FROM mb GROUP BY source, bk),
      |ma AS (SELECT source, bk, c,
      |  sum(c) OVER (PARTITION BY source) AS totd,
      |  sum(c) OVER (PARTITION BY bk) AS cb,
      |  sum(c) OVER () AS tot FROM mc),
      |mx AS (SELECT source, CAST(max(totd) AS BIGINT) AS n_grams,
      |  round(sum((c * 1.0 / totd) *
      |    (ln((c + 1.0) / (totd + 256)) - ln((cb + 1.0) / (tot + 256)))), 6) AS excess
      |  FROM ma GROUP BY source),
      |mw AS (SELECT source, n_grams, excess,
      |  round(0.9 * exp(excess * 10) / sum(exp(excess * 10)) OVER ()
      |    + 0.1 / count(*) OVER (), 6) AS weight FROM mx)""".stripMargin

  /** The ranked-selection tail over `dw` (no LIMIT — callers append). */
  private val dsirSelect: String =
    """SELECT doc_id AS id, log_w,
      |  CAST(row_number() OVER (ORDER BY log_w DESC, doc_id) AS BIGINT) AS rank
      |FROM dw ORDER BY log_w DESC, doc_id""".stripMargin

  /** Shared by d19 (batch operator) and d20 (at-rest store path) —
    * per-source boilerplate election (≥ 3 distinct docs of one source
    * share the 5-gram) recomputed from scratch; removal has NO
    * keep-first exception. */
  private val boilerplateSql: String =
    """WITH t AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |g AS (SELECT doc_id, source, u.p AS p, u.s AS s FROM (
      |  SELECT doc_id, source, unnest(list_transform(range(1, len(ws) - 3),
      |    i -> {'p': i, 's': ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]})) AS u
      |  FROM t WHERE len(ws) >= 5)),
      |boiler AS (SELECT source, s FROM g GROUP BY source, s
      |  HAVING count(DISTINCT doc_id) >= 3),
      |cov AS (SELECT DISTINCT doc_id, unnest(range(p, p + 5)) AS i
      |  FROM g SEMI JOIN boiler ON g.source = boiler.source AND g.s = boiler.s),
      |tok AS (SELECT doc_id, u.i AS i, u.w AS w FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1), i -> {'i': i, 'w': ws[i]})) AS u FROM t)),
      |kept AS (SELECT tok.doc_id, tok.i, tok.w FROM tok ANTI JOIN cov
      |  ON tok.doc_id = cov.doc_id AND tok.i = cov.i),
      |outp AS (SELECT doc_id, count(*) AS n_kept,
      |  string_agg(w, ' ' ORDER BY i) AS clean_text FROM kept GROUP BY doc_id)
      |SELECT t.doc_id, CAST(len(ws) AS BIGINT) AS n_toks,
      |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
      |  coalesce(clean_text, '') AS clean_text
      |FROM t LEFT JOIN outp ON t.doc_id = outp.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** t35/t36 shared oracle: the synthesized eval suite + cross-set
    * exact jaccard + whole-doc flag. */
  private val fuzzyDecontamSql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |ev AS (SELECT doc_id + 500000000 AS doc_id,
        |  regexp_split_to_array(trim(CASE WHEN doc_id % 2 = 0
        |    THEN text || ' extra' ELSE text END), '\s+') AS ws
        |  FROM documents WHERE doc_id % 97 = 0),
        |shc AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
        |  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s FROM t),
        |she AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
        |  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s FROM ev),
        |szc AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
        |sze AS (SELECT doc_id, count(*) AS sz FROM she GROUP BY doc_id),
        |pr AS (SELECT e.doc_id AS id_a, c.doc_id AS id_b, count(*) AS shared
        |  FROM she e JOIN shc c ON e.s = c.s GROUP BY 1, 2),
        |jp AS (SELECT id_b, shared * 1.0 / (sa.sz + sb.sz - shared) AS j
        |  FROM pr JOIN sze sa ON id_a = sa.doc_id JOIN szc sb ON id_b = sb.doc_id
        |  WHERE shared * 1.0 / (sa.sz + sb.sz - shared) >= 0.8),
        |hits AS (SELECT id_b AS doc_id, round(max(j), 6) AS eval_jaccard FROM jp GROUP BY id_b)
        |SELECT t.doc_id, h.eval_jaccard,
        |  CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END AS contaminated
        |FROM t LEFT JOIN hits h ON t.doc_id = h.doc_id
        |ORDER BY t.doc_id""".stripMargin

  /** mm4/mm7 shared oracle: the %5-twin dup-group structure both
    * perceptual fingerprints are contracted to mirror. */
  private val mediaDupGroupsSql: String =
    """WITH t AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
      |m AS (SELECT doc_id AS media_id, text FROM t
      |  UNION ALL SELECT doc_id + 500000000, text FROM t WHERE doc_id % 5 = 0),
      |g AS (SELECT media_id,
      |  min(media_id) OVER (PARTITION BY text) AS group_id,
      |  count(*) OVER (PARTITION BY text) AS n_in_group FROM m)
      |SELECT media_id, group_id, CAST(n_in_group AS BIGINT) AS n_in_group,
      |  CASE WHEN n_in_group > 1 THEN 1 ELSE 0 END AS is_dup
      |FROM g ORDER BY media_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "s3_parquet_scan" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "p2_select" ->
      "SELECT c_custkey, c_mktsegment FROM customer ORDER BY c_custkey",
    "p5_between" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p6p7p8_predicates" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE o_orderstatus = 'F' AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_custkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    "f_scalar_fns" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000 THEN 'high'
        |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS price_band,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
        |  round((2002 - year(o_orderdate)) * 12 + (1 - month(o_orderdate))
        |    + CASE WHEN day(o_orderdate) = 1 THEN 0.0
        |           ELSE (1 - day(o_orderdate)) / 31.0 END, 6) AS months_ago,
        |  upper(trim(o_orderpriority)) AS prio_norm,
        |  coalesce(o_orderstatus, 'MISSING') AS status_filled,
        |  CAST(regexp_extract(o_orderpriority, '^(\d+)', 1) AS INTEGER) AS prio_rank
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin,
    "a1_mode" ->
      """SELECT o_orderpriority FROM orders GROUP BY o_orderpriority
        |ORDER BY count(*) DESC, o_orderpriority ASC LIMIT 1""".stripMargin,
    "a2_mean" ->
      "SELECT round(avg(l_quantity), 6) AS avg_qty FROM lineitem",
    "a4_topk_freq" ->
      """SELECT p_brand, count(*) AS cnt FROM part GROUP BY p_brand
        |ORDER BY cnt DESC, p_brand ASC LIMIT 10""".stripMargin,
    "a5_distinct" ->
      "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",
    "a6_summary" ->
      """SELECT c_mktsegment,
        |  count(*) AS n,
        |  round(avg(c_acctbal), 6) AS avg_bal,
        |  round(min(c_acctbal), 4) AS min_bal,
        |  round(max(c_acctbal), 4) AS max_bal,
        |  round(stddev(c_acctbal), 6) AS std_bal,
        |  round(sum(c_acctbal), 4) AS sum_bal
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY avg_bal DESC, c_mktsegment ASC""".stripMargin,
    "a9_percentile" ->
      """SELECT
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        |  round(quantile_cont(o_totalprice, 0.90), 4) AS p90
        |FROM orders""".stripMargin,
    "j1_left_join" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  round(sum(c_acctbal), 4) AS sum_bal
        |FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "j2_inner_join" ->
      """SELECT o_orderstatus, count(*) AS n_lines,
        |  round(sum(l_extendedprice), 4) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "j3_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "j4_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "j5_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts, max(value) AS vvalue FROM events
        |  WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
        |  round(p.value, 4) AS p_value,
        |  round(v.vvalue, 4) AS asof_value,
        |  strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS asof_ts
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin,
    "j6_range_join" ->
      """WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events),
        |iv AS (SELECT CAST(i AS BIGINT) AS interval_id,
        |    mn + i * i * (mx - mn + 1) // 400 AS istart,
        |    mn + (i + 1) * (i + 1) * (mx - mn + 1) // 400 AS iend
        |  FROM range(20) t(i), b)
        |SELECT interval_id, count(e.event_id) AS n_events
        |FROM iv LEFT JOIN events e
        |  ON epoch_us(e.ts) >= iv.istart AND epoch_us(e.ts) < iv.iend
        |GROUP BY interval_id ORDER BY interval_id""".stripMargin,
    "t9_lm_score" ->
      """WITH tok AS (SELECT doc_id AS id,
        |  unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents),
        |vocab AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        |s AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS v FROM vocab)
        |SELECT id, count(*) AS n_tokens,
        |  round(avg(ln((cnt + 1) * 1.0 / (total + v))), 6) AS avg_logp
        |FROM tok JOIN vocab USING (token), s
        |GROUP BY id ORDER BY id""".stripMargin,
    "o1_topk_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "u2_union" ->
      """SELECT o_orderstatus, count(*) AS n FROM (
        |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  UNION ALL
        |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |) GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "w1_row_number" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk = 1 ORDER BY o_custkey""".stripMargin,
    "w2_in_subquery" ->
      """SELECT strftime(o_orderdate, '%Y-%m-%d') AS o_day, count(*) AS n,
        |  round(sum(o_totalprice), 4) AS sum_price
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) IN (
        |  SELECT DISTINCT CAST(o_orderdate AS DATE) FROM orders
        |  ORDER BY 1 DESC LIMIT 30)
        |GROUP BY 1 ORDER BY o_day""".stripMargin,
    "w3_running_sum" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_qty,
        |  lag(l_quantity, 1) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS prev_qty
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "r3_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "s6_csv_roundtrip" ->
      """SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 4) AS sum_bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "a_pivot" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS qty_f,
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "u3_intersect_except" ->
      """WITH early AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
        |late AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |SELECT o_custkey, 'both' AS set_op FROM (SELECT * FROM early INTERSECT SELECT * FROM late)
        |UNION ALL
        |SELECT o_custkey, 'early_only' FROM (SELECT * FROM early EXCEPT SELECT * FROM late)
        |ORDER BY set_op, o_custkey""".stripMargin,
    "w4_lead_ntile" ->
      """SELECT o_custkey, o_orderkey,
        |  lead(o_orderkey, 1) OVER w AS next_orderkey,
        |  ntile(4) OVER w AS quartile
        |FROM orders WHERE o_custkey <= 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "s9_json_roundtrip" ->
      """SELECT n_regionkey, count(*) AS n FROM nation
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "s5_orc_roundtrip" ->
      """SELECT p_brand, count(*) AS n, round(sum(p_retailprice), 4) AS sum_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "s5_partitioned_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 4) AS sum_price
        |FROM orders WHERE year(o_orderdate) = 1997
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q1_typed" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "w5_rank_family" ->
      """SELECT c_custkey, c_mktsegment,
        |  dense_rank() OVER w AS drank,
        |  round(percent_rank() OVER w, 6) AS prank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM customer WHERE c_custkey <= 200
        |WINDOW w AS (PARTITION BY c_mktsegment
        |  ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_custkey""".stripMargin,
    "a_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "dq_checks" ->
      """WITH checks AS (
        |  SELECT 'orders_pk_unique' AS check,
        |    count(*) - count(DISTINCT o_orderkey) AS violations FROM orders
        |  UNION ALL SELECT 'customer_pk_unique',
        |    count(*) - count(DISTINCT c_custkey) FROM customer
        |  UNION ALL SELECT 'lineitem_pk_unique',
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem
        |  UNION ALL SELECT 'orders_custkey_not_null',
        |    count(CASE WHEN o_custkey IS NULL THEN 1 END) FROM orders
        |  UNION ALL SELECT 'orders_customer_fk', count(*) FROM orders o
        |    WHERE o_custkey IS NOT NULL AND NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |  UNION ALL SELECT 'lineitem_orders_fk', count(*) FROM lineitem l
        |    WHERE l_orderkey IS NOT NULL AND NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL SELECT 'lineitem_discount_range',
        |    count(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 END)
        |    FROM lineitem)
        |SELECT "check", CAST(violations AS BIGINT) AS violations,
        |  violations = 0 AS passed
        |FROM checks ORDER BY "check"""".stripMargin,
    "u_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS version
        |  FROM orders),
        |upd AS (SELECT o_orderkey, 'U' AS o_orderstatus,
        |    CAST(round(CAST(o_totalprice AS DECIMAL(15,2)) * 1.1, 2) AS DOUBLE)
        |      AS o_totalprice, 2 AS version
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
        |latest AS (SELECT * FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
        |  FROM u) WHERE rn = 1)
        |SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 4) AS sum_price
        |FROM latest GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "s_merge_schema" ->
      """WITH m AS (
        |  SELECT n_nationkey, n_name, CAST(NULL AS BIGINT) AS n_regionkey FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, n_name, n_regionkey FROM nation)
        |SELECT n_regionkey, count(*) AS n, count(n_regionkey) AS n_with_region
        |FROM m GROUP BY n_regionkey ORDER BY n_regionkey NULLS FIRST""".stripMargin,
    "a_stats_corr" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
        |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a_map_metrics" ->
      """SELECT '2024-01-07' AS week_date, 'lgbm' AS model_name,
        |  round(avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 4) AS avg_f,
        |  round(avg(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 4) AS avg_o,
        |  round(avg(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 4) AS avg_p,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
        |  CAST(count(DISTINCT o_orderstatus) AS INTEGER) AS n_grades
        |FROM orders ORDER BY week_date""".stripMargin,
    "f2_date_parse" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%b-%Y') AS mmm_yyyy,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS parsed,
        |  round((2002 - year(o_orderdate)) * 12 + (1 - month(o_orderdate)), 6) AS months_since
        |FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""".stripMargin,
    "a_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "m5_parse_emp_length" ->
      s"""WITH raw AS (SELECT p_partkey,
        |  CASE WHEN p_size >= 40 THEN '10+ years'
        |       WHEN p_size = 1 THEN '< 1 year'
        |       WHEN p_size % 7 = 0 THEN 'missing'
        |       WHEN p_size % 11 = 0 THEN 'garbage value'
        |       ELSE p_size || ' years' END AS emp_length FROM part)
        |SELECT p_partkey, emp_length,
        |  ${graft.queries.Medallion.empLengthIntSql} AS emp_length_int
        |FROM raw ORDER BY p_partkey""".stripMargin,
    "a1_modes_multi" ->
      """SELECT col_name, mode_value FROM (
        |  SELECT 'l_returnflag' AS col_name, CAST(l_returnflag AS VARCHAR) AS mode_value,
        |    ROW_NUMBER() OVER (ORDER BY count(*) DESC, CAST(l_returnflag AS VARCHAR) ASC) AS rk
        |  FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY l_returnflag
        |  UNION ALL
        |  SELECT 'l_linestatus', CAST(l_linestatus AS VARCHAR),
        |    ROW_NUMBER() OVER (ORDER BY count(*) DESC, CAST(l_linestatus AS VARCHAR) ASC)
        |  FROM lineitem WHERE l_linestatus IS NOT NULL GROUP BY l_linestatus
        |  UNION ALL
        |  SELECT 'l_quantity', CAST(l_quantity AS VARCHAR),
        |    ROW_NUMBER() OVER (ORDER BY count(*) DESC, CAST(l_quantity AS VARCHAR) ASC)
        |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY l_quantity
        |) WHERE rk = 1 ORDER BY col_name""".stripMargin,
    "ops_mean_impute" ->
      """WITH t AS (SELECT nullif(l_discount, 0.05) AS disc FROM lineitem),
        |m AS (SELECT avg(disc) AS am FROM t)
        |SELECT round(sum(coalesce(disc, am)), 4) AS sum_disc,
        |  CAST(sum(CASE WHEN disc IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
        |  count(*) AS n
        |FROM t, m""".stripMargin,
    "m1_string_indexer" ->
      """SELECT c_mktsegment,
        |  ROW_NUMBER() OVER (ORDER BY count(*) DESC, c_mktsegment ASC) - 1 AS idx,
        |  count(*) AS cnt
        |FROM customer GROUP BY c_mktsegment ORDER BY idx""".stripMargin,
    "m2_one_hot" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS o_orderstatus_ohe_F,
        |  CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS o_orderstatus_ohe_O,
        |  CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS o_orderstatus_ohe_P
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin,
    "m6_label_encode" ->
      """WITH mapping AS (
        |  SELECT c_mktsegment, ROW_NUMBER() OVER (ORDER BY c_mktsegment) - 1 AS label_idx
        |  FROM (SELECT DISTINCT c_mktsegment FROM customer))
        |SELECT c.c_mktsegment, m.label_idx, count(*) AS n
        |FROM customer c JOIN mapping m ON c.c_mktsegment = m.c_mktsegment
        |GROUP BY c.c_mktsegment, m.label_idx ORDER BY label_idx""".stripMargin,
    "m7_binary_target" ->
      """SELECT CAST(c_mktsegment IN ('AUTOMOBILE', 'BUILDING') AS INTEGER) AS target,
        |  count(*) AS n
        |FROM customer GROUP BY 1 ORDER BY target""".stripMargin,
    // M9: both engines derive the same deterministic prediction fixture,
    // and the metric algebra divides exact integer counts — bit-identical
    // doubles, rounded only at the end (see MLFeatures.m9ClassMetrics)
    "m9_class_metrics" ->
      """WITH preds AS (SELECT o_orderstatus AS label,
        |    CASE WHEN o_orderkey % 10 = 0 THEN
        |      CASE o_orderstatus WHEN 'F' THEN 'O' WHEN 'O' THEN 'P' ELSE 'F' END
        |    ELSE o_orderstatus END AS pred
        |  FROM orders),
        |conf AS (SELECT label, pred, count(*) AS n FROM preds GROUP BY 1, 2),
        |classes AS (SELECT label AS cls FROM conf
        |  UNION SELECT pred FROM conf),
        |tp AS (SELECT label AS cls, n AS tp FROM conf WHERE label = pred),
        |bylabel AS (SELECT label AS cls, sum(n) AS support FROM conf GROUP BY 1),
        |bypred AS (SELECT pred AS cls, sum(n) AS pred_n FROM conf GROUP BY 1),
        |j AS (SELECT c.cls, coalesce(tp.tp, 0) AS tp,
        |    coalesce(bylabel.support, 0) AS support,
        |    coalesce(bypred.pred_n, 0) AS pred_n
        |  FROM classes c LEFT JOIN tp ON c.cls = tp.cls
        |  LEFT JOIN bylabel ON c.cls = bylabel.cls
        |  LEFT JOIN bypred ON c.cls = bypred.cls),
        |m AS (SELECT cls,
        |    CASE WHEN pred_n = 0 THEN 0.0 ELSE tp * 1.0 / pred_n END AS p,
        |    CASE WHEN support = 0 THEN 0.0 ELSE tp * 1.0 / support END AS r,
        |    support
        |  FROM j)
        |SELECT cls, round(p, 6) AS precision, round(r, 6) AS recall,
        |  round(CASE WHEN p + r = 0 THEN 0.0 ELSE 2 * p * r / (p + r) END, 6) AS f1,
        |  CAST(support AS BIGINT) AS support
        |FROM m ORDER BY cls""".stripMargin,
    // R1's sampled SET is Spark-RNG-specific, but a healthy sampler's
    // per-class count always sits within ±5σ+1 of n·p — the oracle pins
    // the classes, totals, and that flag (see MLFeatures.r1Sample).
    "r1_sample" ->
      """SELECT o_orderstatus, count(*) AS n_total, 1 AS within_ci
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // R2's membership rule is md5-threshold (Sampling.portableTestMember
    // with pct=20 → threshold 0x0.3333…, 32 hex digits of 0.2), which any
    // engine recomputes exactly — the oracle re-derives the member SET,
    // not just the split fractions.
    "r2_hash_split" ->
      """WITH b AS (SELECT c_mktsegment,
        |    md5(CAST(c_custkey AS VARCHAR) || 'split')
        |      < '33333333333333333333333333333333' AS t
        |  FROM customer)
        |SELECT c_mktsegment,
        |  CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS n_train,
        |  CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_test
        |FROM b GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "m8_psi" ->
      """WITH expected AS (SELECT o_totalprice AS v FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
        |actual AS (SELECT o_totalprice AS v FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'),
        |b AS (SELECT quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs FROM expected),
        |ebuck AS (SELECT CASE WHEN v <= bs[1] THEN 0 WHEN v <= bs[2] THEN 1
        |  WHEN v <= bs[3] THEN 2 WHEN v <= bs[4] THEN 3 WHEN v <= bs[5] THEN 4
        |  WHEN v <= bs[6] THEN 5 WHEN v <= bs[7] THEN 6 WHEN v <= bs[8] THEN 7
        |  WHEN v <= bs[9] THEN 8 ELSE 9 END AS bucket FROM expected, b),
        |abuck AS (SELECT CASE WHEN v <= bs[1] THEN 0 WHEN v <= bs[2] THEN 1
        |  WHEN v <= bs[3] THEN 2 WHEN v <= bs[4] THEN 3 WHEN v <= bs[5] THEN 4
        |  WHEN v <= bs[6] THEN 5 WHEN v <= bs[7] THEN 6 WHEN v <= bs[8] THEN 7
        |  WHEN v <= bs[9] THEN 8 ELSE 9 END AS bucket FROM actual, b),
        |buckets AS (SELECT range AS bucket FROM range(10)),
        |ep AS (SELECT bucket, count(*) / (SELECT count(*) FROM expected) AS p FROM ebuck GROUP BY bucket),
        |ap AS (SELECT bucket, count(*) / (SELECT count(*) FROM actual) AS p FROM abuck GROUP BY bucket),
        |j AS (SELECT buckets.bucket, coalesce(ep.p, 0) AS e, coalesce(ap.p, 0) AS a
        |  FROM buckets LEFT JOIN ep ON buckets.bucket = ep.bucket
        |  LEFT JOIN ap ON buckets.bucket = ap.bucket),
        |c AS (SELECT CASE WHEN e = 0 THEN 0.0001 ELSE e END AS e,
        |             CASE WHEN a = 0 THEN 0.0001 ELSE a END AS a FROM j)
        |SELECT round(sum((a - e) * ln(a / e)), 6) AS psi FROM c""".stripMargin,
    "a7_value_counts" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, event_type ASC""".stripMargin,
    "g_explode_slice" ->
      """SELECT w, count(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')[1:5]) AS w FROM documents)
        |GROUP BY w ORDER BY n DESC, w ASC""".stripMargin,
    "d1_exact_dedup" ->
      """SELECT doc_id, n_chars FROM (
        |  SELECT doc_id, n_chars, ROW_NUMBER() OVER (
        |    PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |    ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "d2_minhash_lsh" -> ngramJaccardSql,
    "d4_ngram_jaccard" -> ngramJaccardSql,
    "d6_dedup_clusters" -> dedupClustersSql,
    "r11_cluster_split" -> clusterSplitSql,
    "t5_tfidf" ->
      """WITH toks AS (SELECT doc_id,
        |  unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents),
        |tf AS (SELECT doc_id AS id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT id, token, tf, df,
        |  round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf
        |FROM tf JOIN dfq USING (token), n
        |WHERE id < 25
        |ORDER BY id, token""".stripMargin,
    "t6_repetition" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents)
        |SELECT doc_id,
        |  round(1.0 - len(list_distinct(ws)) * 1.0 / greatest(len(ws), 1), 6) AS rep_ratio,
        |  round(list_max(list_transform(list_distinct(ws),
        |    x -> len(list_filter(ws, w -> w = x)))) * 1.0
        |    / greatest(len(ws), 1), 6) AS max_token_ratio
        |FROM t ORDER BY doc_id""".stripMargin,
    "t7_redact_pii" ->
      """WITH t AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 7 = 0 THEN ' contact alice@example.com or 555-123-4567'
        |       WHEN doc_id % 7 = 3 THEN ' server at 192.168.0.1'
        |       ELSE '' END AS text2 FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |  + len(regexp_extract_all(text2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
        |  + len(regexp_extract_all(text2, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_pii,
        |  length(regexp_replace(regexp_replace(regexp_replace(text2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g')) AS n_chars_redacted
        |FROM t ORDER BY doc_id""".stripMargin,
    "t8_pack_sequences" ->
      """WITH t AS (SELECT doc_id AS id, doc_id % 8 AS shard,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens FROM documents),
        |c AS (SELECT id, shard, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY shard ORDER BY id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT id, shard, n_tokens,
        |  CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS chunk_id
        |FROM c ORDER BY id""".stripMargin,
    "llm_corpus_pipeline" ->
      """WITH t0 AS (SELECT doc_id, lang, text,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |      ORDER BY doc_id) AS rn
        |  FROM documents),
        |feat AS (SELECT doc_id, lang, text,
        |    regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM t0 WHERE rn = 1),
        |scored AS (SELECT doc_id, lang, ws,
        |    round(least(len(ws) / 50.0, 1.0) * 0.5
        |      + least(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in')))
        |          / greatest(len(ws) * 0.05, 1.0), 1.0) * 0.5
        |      - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |          / greatest(length(text), 1), 6) AS q,
        |    round(1.0 - len(list_distinct(ws)) * 1.0 / greatest(len(ws), 1), 6) AS rep
        |  FROM feat),
        |ranked AS (SELECT doc_id, lang, ws,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS qrk
        |  FROM scored WHERE q >= 0.4 AND rep < 0.5),
        |sampled AS (SELECT doc_id, lang, len(ws) AS n_tokens, doc_id % 4 AS shard
        |  FROM ranked WHERE qrk <= 40),
        |packed AS (SELECT doc_id, lang, shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM sampled)
        |SELECT lang, shard, count(*) AS n_docs,
        |  max(CAST(floor((cum - n_tokens) / 256.0) AS BIGINT)) AS max_chunk,
        |  CAST(sum(n_tokens) AS BIGINT) AS tok_total
        |FROM packed GROUP BY lang, shard ORDER BY lang, shard""".stripMargin,
    "r4_quota_sample" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 30 ORDER BY lang, doc_id""".stripMargin,
    "d7_incremental_dedup" ->
      """WITH fp AS (SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |batch AS (SELECT * FROM fp WHERE doc_id % 5 = 0),
        |corpus AS (SELECT * FROM fp WHERE doc_id % 5 <> 0),
        |keep AS (SELECT fp, min(doc_id) AS doc_id FROM batch GROUP BY fp)
        |SELECT doc_id, fp FROM keep
        |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = keep.fp)
        |ORDER BY doc_id""".stripMargin,
    // the Bloom-routed store path is exact (see d15FpStore) → d7's oracle
    "d15_fp_store" ->
      """WITH fp AS (SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |batch AS (SELECT * FROM fp WHERE doc_id % 5 = 0),
        |corpus AS (SELECT * FROM fp WHERE doc_id % 5 <> 0),
        |keep AS (SELECT fp, min(doc_id) AS doc_id FROM batch GROUP BY fp)
        |SELECT doc_id, fp FROM keep
        |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = keep.fp)
        |ORDER BY doc_id""".stripMargin,
    // D30: the fp store FOLDED (generations + per-batch blooms into the
    // base) must serve d15's probe semantics over the landed union —
    // the store side is base(%5∈{1,2}) ∪ append(%5∈{3,4}) = %5<>0, so
    // the oracle is d15's verbatim; a fold losing an fp row or bloom
    // coverage re-admits a duplicate and hash-fails
    "d30_fp_compacted" ->
      """WITH fp AS (SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |batch AS (SELECT * FROM fp WHERE doc_id % 5 = 0),
        |corpus AS (SELECT * FROM fp WHERE doc_id % 5 <> 0),
        |keep AS (SELECT fp, min(doc_id) AS doc_id FROM batch GROUP BY fp)
        |SELECT doc_id, fp FROM keep
        |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = keep.fp)
        |ORDER BY doc_id""".stripMargin,
    "r5_temperature_mix" ->
      """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |q AS (SELECT lang,
        |    CAST(greatest(1, least(n,
        |      floor(200.0 * (pow(n, 0.5) / sum(pow(n, 0.5)) OVER ())))) AS BIGINT)
        |      AS quota
        |  FROM counts),
        |r AS (SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM documents)
        |SELECT r.lang AS lang, r.doc_id AS doc_id FROM r JOIN q ON r.lang = q.lang
        |WHERE rk <= quota ORDER BY r.lang, r.doc_id""".stripMargin,
    "s_jsonl_roundtrip" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "llm_pretrain_pipeline" ->
      """WITH fp AS (SELECT doc_id, lang, text,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE doc_id % 97 <> 0),
        |keep AS (SELECT fp, min(doc_id) AS doc_id FROM fp GROUP BY fp),
        |dd AS (SELECT f.doc_id, f.lang,
        |    regexp_split_to_array(trim(f.text), '\s+') AS ws
        |  FROM fp f JOIN keep k ON f.doc_id = k.doc_id),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
        |  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s FROM dd),
        |esh AS (SELECT doc_id AS eval_id, unnest(list_distinct(list_transform(
        |    range(1, len(ews) - 1), i -> ews[i] || ' ' || ews[i+1] || ' ' || ews[i+2]))) AS s
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ews
        |        FROM documents WHERE doc_id % 97 = 0)),
        |contam AS (SELECT DISTINCT doc_id FROM (
        |  SELECT c.doc_id, e.eval_id, count(*) AS shared
        |  FROM sh c JOIN esh e ON c.s = e.s GROUP BY 1, 2) WHERE shared >= 2),
        |clean AS (SELECT * FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
        |counts AS (SELECT lang, count(*) AS n FROM clean GROUP BY lang),
        |q AS (SELECT lang,
        |    CAST(greatest(1, least(n,
        |      floor(300.0 * (pow(n, 0.5) / sum(pow(n, 0.5)) OVER ())))) AS BIGINT)
        |      AS quota
        |  FROM counts),
        |r AS (SELECT lang, doc_id, ws, ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM clean),
        |mixed AS (SELECT r.lang, r.doc_id, r.ws FROM r JOIN q ON r.lang = q.lang
        |  WHERE rk <= quota),
        |ch AS (SELECT lang, doc_id, ws,
        |    unnest(range(0, greatest(len(ws), 1), 24)) AS start FROM mixed),
        |chunks AS (SELECT lang, doc_id,
        |    len(list_slice(ws, start + 1, start + 32)) AS n_tokens FROM ch)
        |SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
        |  CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens
        |FROM chunks GROUP BY lang ORDER BY lang""".stripMargin,
    "t11_chunking" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents WHERE doc_id < 50),
        |st AS (SELECT doc_id, ws, unnest(range(0, greatest(len(ws), 1), 24)) AS start
        |  FROM t)
        |SELECT doc_id, CAST(start / 24 AS BIGINT) AS chunk_id,
        |  array_to_string(list_slice(ws, start + 1, start + 32), ' ') AS chunk_text,
        |  CAST(len(list_slice(ws, start + 1, start + 32)) AS BIGINT) AS n_tokens
        |FROM st ORDER BY doc_id, chunk_id""".stripMargin,
    "t10_contamination" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
        |  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s FROM t),
        |corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0),
        |ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 97 = 0),
        |pairs AS (SELECT c.doc_id, e.eval_id, count(*) AS shared
        |  FROM corpus c JOIN ev e ON c.s = e.s GROUP BY 1, 2)
        |SELECT doc_id, max(shared) AS max_shared, count(*) AS n_eval_hits
        |FROM pairs WHERE shared >= 2 GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the Bloom path is exact after its verify join, so its oracle is
    // t10's: same report, different scale shape on the Spark side
    "t14_bloom_decontam" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
        |  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s FROM t),
        |corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0),
        |ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 97 = 0),
        |pairs AS (SELECT c.doc_id, e.eval_id, count(*) AS shared
        |  FROM corpus c JOIN ev e ON c.s = e.s GROUP BY 1, 2)
        |SELECT doc_id, max(shared) AS max_shared, count(*) AS n_eval_hits
        |FROM pairs WHERE shared >= 2 GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d5_embed_dup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,
    // D8 = d5's cosine pair join + d6's recursive-CTE closure, pruned to
    // each component's minimum id (singletons keep themselves)
    "d8_semantic_dedup" ->
      s"""WITH RECURSIVE $semanticKeeperCtes
        |SELECT ee.vec_id FROM e ee LEFT JOIN comp c ON ee.vec_id = c.cid
        |WHERE c.cluster_id IS NULL OR c.cluster_id = ee.vec_id
        |ORDER BY ee.vec_id""".stripMargin,
    // d12: the exact keeper rows again, each flagged kept_wc=1 — the
    // within-cell variant keeping every exact keeper IS the superset
    // invariant (fewer edges ⇒ finer components); see Documents.d12SemanticWc
    "d12_semantic_wc" ->
      s"""WITH RECURSIVE $semanticKeeperCtes
        |SELECT ee.vec_id, 1 AS kept_wc
        |FROM e ee LEFT JOIN comp c ON ee.vec_id = c.cid
        |WHERE c.cluster_id IS NULL OR c.cluster_id = ee.vec_id
        |ORDER BY ee.vec_id""".stripMargin,
    "t1_token_count" ->
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |  CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
        |    w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t2_quality" ->
      """WITH t AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents)
        |SELECT doc_id,
        |  length(text) AS n_chars_q,
        |  len(ws) AS n_words,
        |  round(list_sum(list_transform(ws, w -> length(w) * 1.0)) / len(ws), 6) AS mean_word_len,
        |  round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |    / greatest(length(text), 1), 6) AS punct_ratio,
        |  round(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in'))) * 1.0
        |    / len(ws), 6) AS stopword_ratio,
        |  round(least(len(ws) / 50.0, 1.0) * 0.5
        |    + least(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in')))
        |        / greatest(len(ws) * 0.05, 1.0), 1.0) * 0.5
        |    - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |        / greatest(length(text), 1), 6) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "t3_lang_id" ->
      """WITH t AS (SELECT doc_id, lang, regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM documents),
        |s AS (SELECT doc_id, lang,
        |  len(list_filter(ws, w -> w IN ('der','die','das','und','ist','nicht','ein','mit'))) AS s_de,
        |  len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in','that'))) AS s_en,
        |  len(list_filter(ws, w -> w IN ('el','la','los','las','es','y','que','un'))) AS s_es,
        |  len(list_filter(ws, w -> w IN ('le','la','les','et','est','que','un','une'))) AS s_fr,
        |  len(list_filter(ws, w -> w IN ('的','是','了','在','和','有','我','不'))) AS s_zh
        |FROM t)
        |SELECT doc_id, lang,
        |  CASE WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
        |       WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
        |       WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
        |       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
        |       ELSE 'zh' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,
    "t4_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ann1_brute_force" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
        |scored AS (SELECT q_id, e.vec_id AS n_id, list_cosine_similarity(qv, e.v) AS cos
        |  FROM q, e WHERE e.vec_id <> q_id),
        |r AS (SELECT q_id, n_id, cos, ROW_NUMBER() OVER (
        |  PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank FROM scored)
        |SELECT q_id, rank, n_id, round(cos, 6) AS cos_sim FROM r
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "ann2_lsh" -> annGateSql,
    "ann3_ivf" -> annGateSql,
    // ann4 = ann3's answers through the partition-pruned at-rest index
    "ann4_ivf_store" -> annGateSql,
    // ann5: the grow path emits the same pinned (query × rank) grid
    "ann5_ivf_append" -> annGateSql,
    // ann20: churn → monitor → side-by-side rebuild → probe; same
    // pinned grid (the invariant flags are engine-verified in-plan,
    // the recall floor measured against post-churn brute force)
    "ann20_ivf_rebuilt" -> annGateSql,
    "ann8_pq_adc" -> annGateSql,
    "ann9_pq_store" -> annGateSql,
    "ann10_ivf_pq" -> annGateSql,
    // ann6: fully value-compared — the candidate stage is the exact
    // baseline (ann1's oracle) and the re-rank is deterministic
    // arithmetic over rounded inputs
    "ann6_hybrid_rerank" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
        |scored AS (SELECT q_id, e.vec_id AS n_id, list_cosine_similarity(qv, e.v) AS cos
        |  FROM q, e WHERE e.vec_id <> q_id),
        |cand AS (SELECT q_id, n_id, round(cos, 6) AS cos_sim FROM (
        |  SELECT q_id, n_id, cos, ROW_NUMBER() OVER (
        |    PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rnk FROM scored)
        |  WHERE rnk <= 20),
        |dq AS (SELECT doc_id AS n_id,
        |  round(least(len(ws) / 50.0, 1.0) * 0.5
        |    + least(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in')))
        |        / greatest(len(ws) * 0.05, 1.0), 1.0) * 0.5
        |    - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |        / greatest(length(text), 1), 6) AS ql
        |  FROM (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents)),
        |h AS (SELECT q_id, n_id, round(cos_sim * 0.8 + ql * 0.2, 6) AS combined
        |  FROM cand JOIN dq USING (n_id)),
        |r AS (SELECT q_id, n_id, combined, ROW_NUMBER() OVER (
        |  PARTITION BY q_id ORDER BY combined DESC, n_id ASC) AS rank FROM h)
        |SELECT q_id, CAST(rank AS INT) AS rank, n_id, combined FROM r
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    // T17: exact per-language token census, rank cast to INT (Spark
    // row_number is int32, DuckDB's is int64)
    "t17_vocab_per_lang" ->
      """WITH c AS (SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents),
        |g AS (SELECT lang, token, count(*) AS n FROM c GROUP BY 1, 2),
        |r AS (SELECT lang, token, n,
        |  row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rank FROM g)
        |SELECT lang, token, n, CAST(rank AS INT) AS rank FROM r
        |WHERE rank <= 10 ORDER BY lang, rank""".stripMargin,
    // T16: per-language exact quartile threshold, quality recomputed
    // (t12's oracle with the threshold stratified by lang)
    "t16_stratified_cut" ->
      """WITH t AS (SELECT doc_id, lang, text, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |q AS (SELECT doc_id, lang,
        |  round(least(len(ws) / 50.0, 1.0) * 0.5
        |    + least(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in')))
        |        / greatest(len(ws) * 0.05, 1.0), 1.0) * 0.5
        |    - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |        / greatest(length(text), 1), 6) AS quality
        |  FROM t),
        |thr AS (SELECT lang, quantile_cont(quality, 0.25) AS thr FROM q GROUP BY lang)
        |SELECT q.doc_id, q.lang, q.quality FROM q JOIN thr USING (lang)
        |WHERE q.quality >= thr.thr
        |ORDER BY q.doc_id""".stripMargin,
    "d3_simhash" -> simhashGateSql,
    // d14 = the d10/d11 semantics with the corpus landed in TWO store
    // installments (write + append) — same ground truth
    "d14_store_append" -> crossSetJaccardSql,
    // D29: d14's flow with the install + append generations FOLDED
    // into one batch=0 before the probe — same ground truth, so any
    // row the fold loses or duplicates moves a jaccard and hash-fails
    "d29_neardup_compacted" -> crossSetJaccardSql,
    "t1_tumbling_window" ->
      """SELECT strftime(make_timestamp(
        |    CAST(floor(epoch(ts) / 604800) * 604800 AS BIGINT) * 1000000),
        |    '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "s_sessionize" ->
      """WITH e AS (SELECT user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
        |l AS (SELECT user_id, ts, es,
        |  lag(es) OVER (PARTITION BY user_id ORDER BY ts) AS prev_es FROM e),
        |n AS (SELECT user_id, ts, es,
        |  CASE WHEN prev_es IS NULL OR es - prev_es > 1800 THEN 1 ELSE 0 END AS new_sess FROM l),
        |s AS (SELECT user_id, es,
        |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id FROM n),
        |g AS (SELECT user_id, sess_id, max(es) - min(es) AS dur, count(*) AS n_events
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions, round(avg(dur), 6) AS avg_dur_sec,
        |  CAST(sum(n_events) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "f_json_extract" ->
      """SELECT event_type,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // all three payloads are REAL synthesized containers with
    // SQL-recomputable sizes (Multimodal.fromDocuments): audio = WAV
    // (44-byte canonical header + one 16-bit sample per utf-8 text
    // byte), image = binary PPM ("P6\nL 1\n255\n" header + 3 RGB
    // bytes per text byte), video = Y4M ("YUV4MPEG2 W<L> H1 F25:1 Ip
    // A1:1 Cmono\n" = 35 + digits(L) header, + 4 frames of "FRAME\n"
    // + L luminance bytes). L = max(text bytes, 1) — the empty-text
    // guard pads a single space byte so every container stays valid.
    "mm1_media_meta" ->
      """WITH t AS (SELECT doc_id, greatest(octet_length(encode(text)), 1) AS L
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS modality,
        |  CASE WHEN doc_id % 3 = 1 THEN 44 + 2 * L
        |    WHEN doc_id % 3 = 0 THEN 10 + length(CAST(L AS VARCHAR)) + 3 * L
        |    ELSE 59 + length(CAST(L AS VARCHAR)) + 4 * L END AS n_bytes
        |FROM t ORDER BY media_id""".stripMargin,
    // MM2's feature values are JVM-side (Goertzel band energies for
    // the WAV route, luminance histogram for the PPM route, temporal
    // luminance means for the Y4M route), but every route's algebra
    // pins hard invariants the oracle CAN recompute: 16 slots; WAV
    // band energies lie in [0, 1], PPM histogram fractions sum to 1,
    // Y4M per-bin means lie in [0, 1] with a positive sum (see
    // Documents.mm2MediaFeatures).
    "mm2_media_features" ->
      """WITH t AS (SELECT doc_id, greatest(octet_length(encode(text)), 1) AS L
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS modality,
        |  CASE WHEN doc_id % 3 = 1 THEN 44 + 2 * L
        |    WHEN doc_id % 3 = 0 THEN 10 + length(CAST(L AS VARCHAR)) + 3 * L
        |    ELSE 59 + length(CAST(L AS VARCHAR)) + 4 * L END AS n_bytes,
        |  16 AS feat_dim, 1 AS feat_ok
        |FROM t ORDER BY media_id""".stripMargin,
    "pipeline_e2e" -> pipelineE2ESql,
    // D9's engine path hashes grams to 8 bytes before exchanging; the
    // oracle recomputes the document frequencies on the raw gram
    // strings — counts are hash-projection-invariant.
    "d9_dup_spans" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS s
        |  FROM t WHERE len(ws) >= 5),
        |dupset AS (SELECT s FROM g GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
        |dup AS (SELECT doc_id, count(*) AS n_dup FROM g JOIN dupset USING (s) GROUP BY doc_id)
        |SELECT t.doc_id, CAST(greatest(len(ws) - 4, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup,
        |  round(coalesce(n_dup, 0) * 1.0 / greatest(len(ws) - 4, 1), 6) AS dup_frac
        |FROM t LEFT JOIN dup ON t.doc_id = dup.doc_id ORDER BY t.doc_id""".stripMargin,
    "r6_epoch_mix" ->
      """SELECT doc_id, source, epoch FROM (
        |  SELECT doc_id, source, unnest(range(1,
        |    CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 2
        |      WHEN 'src2' THEN 2 ELSE 1 END + 1)) AS epoch
        |  FROM documents)
        |ORDER BY doc_id, epoch""".stripMargin,
    // T12: DuckDB's quantile_cont uses the same (n-1)*frac linear
    // interpolation as Spark's exact percentile, over the same
    // 6-dp-rounded scores; rows AT the threshold are kept on both sides.
    "t12_quality_cut" ->
      """WITH t AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |q AS (SELECT doc_id,
        |  round(least(len(ws) / 50.0, 1.0) * 0.5
        |    + least(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in')))
        |        / greatest(len(ws) * 0.05, 1.0), 1.0) * 0.5
        |    - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |        / greatest(length(text), 1), 6) AS quality
        |  FROM t),
        |thr AS (SELECT quantile_cont(quality, 0.25) AS thr FROM q)
        |SELECT doc_id, quality FROM q, thr WHERE quality >= thr
        |ORDER BY doc_id""".stripMargin,
    // A10: the HLL estimate is engine-specific, so the oracle pins the
    // exact counts plus the within-5%-of-exact flag (rsd = 2%).
    "a10_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_exact, 1 AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the GK sketch's rank-error contract pinned: every flag 1, n_rows
    // data-dependent — a sketch past its ±n/acc bound flips a flag
    "a12_approx_quantiles" ->
      """SELECT q, (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
        |  1 AS rank_ok
        |FROM (SELECT unnest([0.25, 0.5, 0.75]) AS q) ORDER BY q""".stripMargin,
    // exact hot set recomputed; in_sketch pinned to 1 — freqItems'
    // contract is superset-above-support, so any 0 is a sketch bug
    "a11_heavy_hitters" ->
      """WITH t AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |tot AS (SELECT count(*) AS n FROM t)
        |SELECT tok, count(*) AS n, 1 AS in_sketch
        |FROM t GROUP BY tok
        |HAVING count(*) > 0.01 * (SELECT n FROM tot)
        |ORDER BY tok""".stripMargin,
    // D10: exact ground-truth cross-set Jaccard pairs (batch = doc_id
    // % 5 = 0 vs landed corpus = the rest) — same shingle machinery as
    // the d2/d4 oracle, pairs restricted to batch×corpus.
    // D13: the keep-first removal rule recomputed from scratch —
    // positional grams, global first occurrence (doc, pos), covered-
    // position union, token-level anti join, ordered reassembly
    "d13_dedup_rewrite" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |g AS (SELECT doc_id, u.p AS p, u.s AS s FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3),
        |    i -> {'p': i, 's': ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]})) AS u
        |  FROM t WHERE len(ws) >= 5)),
        |occ AS (SELECT doc_id, p, ROW_NUMBER() OVER (PARTITION BY s ORDER BY doc_id, p) AS rn FROM g),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(p, p + 5)) AS i FROM occ WHERE rn > 1),
        |tok AS (SELECT doc_id, u.i AS i, u.w AS w FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1), i -> {'i': i, 'w': ws[i]})) AS u FROM t)),
        |kept AS (SELECT tok.doc_id, tok.i, tok.w FROM tok ANTI JOIN cov
        |  ON tok.doc_id = cov.doc_id AND tok.i = cov.i),
        |outp AS (SELECT doc_id, count(*) AS n_kept,
        |  string_agg(w, ' ' ORDER BY i) AS clean_text FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(ws) AS BIGINT) AS n_toks,
        |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(clean_text, '') AS clean_text
        |FROM t LEFT JOIN outp ON t.doc_id = outp.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // D18: the char-granular keep-first removal recomputed from scratch
    // — substring windows, global first occurrence (doc, pos), covered-
    // position union, character-level anti join, ordered reassembly
    // (d13's SQL with substr windows replacing word grams)
    "d18_char_dedup_rewrite" ->
      """WITH t AS (SELECT doc_id, text FROM documents WHERE doc_id < 1500),
        |g AS (SELECT doc_id, u.p AS p, u.s AS s FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, length(text) - 18),
        |    i -> {'p': i, 's': substr(text, i, 20)})) AS u
        |  FROM t WHERE length(text) >= 20)),
        |occ AS (SELECT doc_id, p, ROW_NUMBER() OVER (PARTITION BY s ORDER BY doc_id, p) AS rn FROM g),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(p, p + 20)) AS i FROM occ WHERE rn > 1),
        |ch AS (SELECT doc_id, u.i AS i, u.c AS c FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
        |    i -> {'i': i, 'c': substr(text, i, 1)})) AS u FROM t)),
        |kept AS (SELECT ch.doc_id, ch.i, ch.c FROM ch ANTI JOIN cov
        |  ON ch.doc_id = cov.doc_id AND ch.i = cov.i),
        |outp AS (SELECT doc_id, count(*) AS n_kept,
        |  string_agg(c, '' ORDER BY i) AS clean_text FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(clean_text, '') AS clean_text
        |FROM t LEFT JOIN outp ON t.doc_id = outp.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // D19: per-source boilerplate election (≥ 3 distinct docs of the
    // same source share the 5-gram) recomputed from scratch; removal
    // has NO keep-first exception — every occurrence drops.
    // D20 shares this oracle verbatim: the at-rest store path over a
    // fresh base install IS the batch operator (summed per-batch
    // distinct-doc counts with one batch = the batch's counts), so the
    // two entries can only stay green together.
    "d19_boilerplate" -> boilerplateSql,
    "d20_boilerplate_store" -> boilerplateSql,
    "t20_gopher_rules" -> gopherSql,
    // R8: DSIR selection — bucket = first two md5 hex digits (strpos
    // arithmetic here, conv() engine-side); ranking on the 6-dp-rounded
    // weight so ulp-order summation differences can't move the cut
    "r8_dsir_select" ->
      s"""WITH ${dsirCtes("documents")}
        |$dsirSelect
        |LIMIT 100""".stripMargin,
    // T21: the merge list is corpus-derived (no SQL twin) — the oracle
    // pins ids, word counts, and the detok/bounds invariants at 1
    "t21_bpe_encode" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
        |  CAST(1 AS BIGINT) AS detok_ok, CAST(1 AS BIGINT) AS bounds_ok
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    // M14: m8's PSI recompute over text-quality scores of two corpus
    // slices (same quality formula as t12's oracle)
    "m14_text_drift" ->
      """WITH scored AS (SELECT doc_id,
        |  round(least(len(ws) / 50.0, 1.0) * 0.5
        |    + least(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in')))
        |        / greatest(len(ws) * 0.05, 1.0), 1.0) * 0.5
        |    - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |        / greatest(length(text), 1), 6) AS v
        |  FROM (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents)),
        |expected AS (SELECT v FROM scored WHERE doc_id % 3 <> 0),
        |actual AS (SELECT v FROM scored WHERE doc_id % 3 = 0),
        |b AS (SELECT quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs FROM expected),
        |ebuck AS (SELECT CASE WHEN v <= bs[1] THEN 0 WHEN v <= bs[2] THEN 1
        |  WHEN v <= bs[3] THEN 2 WHEN v <= bs[4] THEN 3 WHEN v <= bs[5] THEN 4
        |  WHEN v <= bs[6] THEN 5 WHEN v <= bs[7] THEN 6 WHEN v <= bs[8] THEN 7
        |  WHEN v <= bs[9] THEN 8 ELSE 9 END AS bucket FROM expected, b),
        |abuck AS (SELECT CASE WHEN v <= bs[1] THEN 0 WHEN v <= bs[2] THEN 1
        |  WHEN v <= bs[3] THEN 2 WHEN v <= bs[4] THEN 3 WHEN v <= bs[5] THEN 4
        |  WHEN v <= bs[6] THEN 5 WHEN v <= bs[7] THEN 6 WHEN v <= bs[8] THEN 7
        |  WHEN v <= bs[9] THEN 8 ELSE 9 END AS bucket FROM actual, b),
        |buckets AS (SELECT range AS bucket FROM range(10)),
        |ep AS (SELECT bucket, count(*) / (SELECT count(*) FROM expected) AS p FROM ebuck GROUP BY bucket),
        |ap AS (SELECT bucket, count(*) / (SELECT count(*) FROM actual) AS p FROM abuck GROUP BY bucket),
        |j AS (SELECT buckets.bucket, coalesce(ep.p, 0) AS e, coalesce(ap.p, 0) AS a
        |  FROM buckets LEFT JOIN ep ON buckets.bucket = ep.bucket
        |  LEFT JOIN ap ON buckets.bucket = ap.bucket),
        |c AS (SELECT CASE WHEN e = 0 THEN 0.0001 ELSE e END AS e,
        |             CASE WHEN a = 0 THEN 0.0001 ELSE a END AS a FROM j)
        |SELECT round(sum((a - e) * ln(a / e)), 6) AS psi FROM c""".stripMargin,
    // T24: the CCNet-style interpolated bigram LM — counts, the
    // md5-tiebroken caps, and the per-position interpolation
    // recomputed from scratch. `(1 - 0.7)` is written as the
    // SUBTRACTION, not 0.3: the engine evaluates the double
    // 1 - 0.7 = 0.30000000000000004, and the oracle must evaluate the
    // identical bits or every 6-dp score is one ULP of drift away
    // from a hash miss.
    "t24_bigram_lm" -> (bigramLmCtes +
      """
        |SELECT t.id, CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  sc.avg_logp
        |FROM tok t LEFT JOIN scored sc ON t.id = sc.id
        |ORDER BY t.id""".stripMargin),
    // T25: head/middle/tail per language over the t24 score; thirds by
    // exact integer arithmetic so the boundary cannot drift
    "t25_ccnet_buckets" -> (bigramLmCtes +
      """,
        |bk AS (SELECT sc.id, d.lang, sc.avg_logp,
        |  row_number() OVER (PARTITION BY d.lang
        |    ORDER BY sc.avg_logp DESC, sc.id) AS rk,
        |  count(*) OVER (PARTITION BY d.lang) AS n
        |  FROM scored sc JOIN documents d ON sc.id = d.doc_id)
        |SELECT lang,
        |  CASE WHEN (rk - 1) * 3 < n - 1 THEN 'head'
        |    WHEN (rk - 1) * 3 < (n - 1) * 2 THEN 'middle'
        |    ELSE 'tail' END AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CAST(avg_logp AS DECIMAL(20,6))) AS DOUBLE) AS logp_sum
        |FROM bk GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin),
    // R9: the fingerprint-keyed md5-threshold split — 25% test =
    // threshold '4000…' (the r2 convention); distinct-fingerprint
    // counts pin the group-keyed-ness
    "r9_leakage_split" ->
      """WITH b AS (SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |s AS (SELECT doc_id, fp,
        |  CASE WHEN md5(fp || 'split')
        |    < '40000000000000000000000000000000' THEN 'test'
        |    ELSE 'train' END AS split FROM b)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT fp) AS BIGINT) AS n_groups
        |FROM s GROUP BY split ORDER BY split""".stripMargin,
    // LLM_CCNET: the target-trained variant of the t24 chain — model
    // CTEs read the src0 slice, scoring reads the whole corpus, then
    // t25's integer thirds + the head/middle keep. Same FP-order and
    // DECIMAL-sum conventions as t24/t25.
    "llm_ccnet_pipeline" -> (targetBigramLmCtes +
      """,
        |bk AS (SELECT sc.id, t.lang, sc.avg_logp,
        |  row_number() OVER (PARTITION BY t.lang
        |    ORDER BY sc.avg_logp DESC, sc.id) AS rk,
        |  count(*) OVER (PARTITION BY t.lang) AS n
        |  FROM scored sc JOIN tok t ON sc.id = t.id
        |  WHERE sc.avg_logp IS NOT NULL)
        |SELECT lang,
        |  CASE WHEN (rk - 1) * 3 < n - 1 THEN 'head'
        |    WHEN (rk - 1) * 3 < (n - 1) * 2 THEN 'middle'
        |    ELSE 'tail' END AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CAST(avg_logp AS DECIMAL(20,6))) AS DOUBLE) AS logp_sum,
        |  CAST(CASE WHEN (CASE WHEN (rk - 1) * 3 < n - 1 THEN 'head'
        |    WHEN (rk - 1) * 3 < (n - 1) * 2 THEN 'middle'
        |    ELSE 'tail' END) <> 'tail' THEN 1 ELSE 0 END AS BIGINT) AS kept
        |FROM bk GROUP BY lang, bucket, kept ORDER BY lang, bucket""".stripMargin),
    // LLM_CURRICULUM: the target-trained LM chain feeding a global
    // easy-first row_number — CCNet score as curriculum difficulty;
    // any scoring drift or rank-offset misalignment shifts positions
    "llm_curriculum_pipeline" -> (targetBigramLmCtes +
      """,
        |pos AS (SELECT id, avg_logp,
        |  row_number() OVER (ORDER BY avg_logp DESC, id) AS position
        |  FROM scored WHERE avg_logp IS NOT NULL)
        |SELECT id AS doc_id, avg_logp, CAST(position AS BIGINT) AS position
        |FROM pos ORDER BY doc_id""".stripMargin),
    // T26: the SAME target-trained scoring through the at-rest model
    // store — store ≡ live is the contract, so the oracle recomputes
    // the llm_ccnet chain's per-doc scores in full
    "t26_bigram_lm_store" -> (targetBigramLmCtes +
      """
        |SELECT t.id, CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  sc.avg_logp
        |FROM tok t LEFT JOIN scored sc ON t.id = sc.id
        |ORDER BY t.id""".stripMargin),
    // T28: per-doc distinct-gram overlap vs the src0 reference,
    // recomputed on RAW gram strings (the d9 convention against the
    // engine's 128-bit hashes); division order mirrored exactly
    "t28_ngram_novelty" ->
      """WITH c AS (SELECT doc_id AS id,
        |  regexp_split_to_array(trim(text), '\s+') AS ws FROM documents
        |  WHERE source <> 'src0'),
        |r AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents WHERE source = 'src0'),
        |dg AS (SELECT DISTINCT id, unnest(list_transform(range(1, len(ws) - 3),
        |    i -> array_to_string(list_slice(ws, i, i + 4), ' '))) AS g
        |  FROM c WHERE len(ws) >= 5),
        |rg AS (SELECT DISTINCT unnest(list_transform(range(1, len(ws) - 3),
        |    i -> array_to_string(list_slice(ws, i, i + 4), ' '))) AS g
        |  FROM r WHERE len(ws) >= 5),
        |tot AS (SELECT id, count(*) AS n_grams FROM dg GROUP BY id),
        |mat AS (SELECT id, count(*) AS n_matched FROM dg SEMI JOIN rg
        |  ON dg.g = rg.g GROUP BY id)
        |SELECT c.id, CAST(coalesce(t.n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched,
        |  CASE WHEN coalesce(t.n_grams, 0) > 0
        |    THEN round(1.0 - coalesce(m.n_matched, 0) / t.n_grams, 6)
        |    ELSE NULL END AS novelty
        |FROM c LEFT JOIN tot t ON c.id = t.id
        |LEFT JOIN mat m ON c.id = m.id
        |ORDER BY c.id""".stripMargin,
    // T27: the doc-level crawl diff — fingerprint classification over
    // the full-outer id join, recomputed from scratch (the canonical
    // form is the dedup family's)
    "t27_snapshot_diff" ->
      """WITH e AS (SELECT doc_id AS id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE doc_id % 7 <> 0),
        |a AS (SELECT doc_id AS id,
        |  md5(trim(regexp_replace(lower(
        |    CASE WHEN doc_id % 11 = 0 THEN text || ' edited' ELSE text END),
        |    '\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE doc_id % 5 <> 0),
        |j AS (SELECT coalesce(e.id, a.id) AS id,
        |  CASE WHEN e.id IS NULL THEN 'added'
        |    WHEN a.id IS NULL THEN 'removed'
        |    WHEN e.fp IS NOT DISTINCT FROM a.fp THEN 'same'
        |    ELSE 'changed' END AS status
        |  FROM e FULL OUTER JOIN a ON e.id = a.id)
        |SELECT status, CAST(count(*) AS BIGINT) AS n_docs
        |FROM j GROUP BY status ORDER BY status""".stripMargin,
    // M16: incremental ≡ full — the oracle recomputes t20's Gopher
    // rules over the FULL edited new snapshot; the engine only
    // reprocessed the changed+added sliver and carried `same` rows
    // forward, so a stale carry, a double-processed doc, or a missed
    // moved doc all hash-fail
    "m16_incremental_reproc" ->
      s"""WITH newsnap AS (SELECT doc_id,
         |  CASE WHEN doc_id % 11 = 0 THEN text || ' edited' ELSE text END AS text
         |  FROM documents WHERE doc_id % 5 <> 0),
         |${gopherCtes("newsnap")}
         |SELECT *, CAST(CASE WHEN $gopherKeepRules THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM f ORDER BY doc_id""".stripMargin,
    // ANN11: the maintenance contract — after tombstone + re-embed the
    // index's LIVE rows are exactly the new snapshot's vectors. Spark
    // reads them back out of the index files; DuckDB recomputes the
    // integer-grid embedding of the new snapshot directly (elements
    // < 97 are float-exact, sums exact in double — no rounding needed)
    "ann11_incremental_reembed" ->
      """WITH new_snap AS (SELECT doc_id,
        |  CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 11 <> 0)
        |SELECT doc_id,
        |  CAST(list_sum(list_transform(range(0,8),
        |    i -> (length(text)*31 + doc_id*17 + i*7) % 97)) AS DOUBLE) AS vec_l1,
        |  CAST((length(text)*31 + doc_id*17) % 97 AS DOUBLE) AS v0
        |FROM new_snap ORDER BY doc_id""".stripMargin,
    // R12: the distributed global rank's degenerate one-group case vs
    // DuckDB's plain row_number — any offset misalignment shifts every
    // position
    "r12_curriculum_order" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY length(text), doc_id) AS BIGINT)
        |    AS position
        |FROM documents ORDER BY doc_id""".stripMargin,
    // R10: UniMax water filling replayed as a recursive CTE (languages
    // in ascending-capacity order, alloc = min(cap, remaining //
    // left)), doc census as full epochs + an md5-rank window-cumsum
    // prefix — every step integer, so the replay is bit-for-bit
    "r10_unimax" ->
      """WITH RECURSIVE t AS (SELECT doc_id AS id, lang,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ntok
        |  FROM documents),
        |lt AS (SELECT lang, CAST(sum(ntok) AS BIGINT) AS tot,
        |  CAST(count(*) AS BIGINT) AS nd FROM t GROUP BY lang),
        |caps AS (SELECT lang, tot, nd, 2 * tot AS cap,
        |  CAST(row_number() OVER (ORDER BY 2 * tot, lang) AS BIGINT) AS rk,
        |  CAST(count(*) OVER () AS BIGINT) AS nl FROM lt),
        |rec AS (
        |  SELECT CAST(0 AS BIGINT) AS rk, CAST(100000 AS BIGINT) AS remaining,
        |    CAST(NULL AS VARCHAR) AS lang, CAST(0 AS BIGINT) AS cap,
        |    CAST(0 AS BIGINT) AS alloc
        |  UNION ALL
        |  SELECT c.rk,
        |    r.remaining - least(c.cap, r.remaining // (c.nl - c.rk + 1)),
        |    c.lang, c.cap, least(c.cap, r.remaining // (c.nl - c.rk + 1))
        |  FROM rec r JOIN caps c ON c.rk = r.rk + 1),
        |q AS (SELECT rec.lang, rec.cap, rec.alloc, lt.tot, lt.nd,
        |  rec.alloc // lt.tot AS ep, rec.alloc % lt.tot AS rem
        |  FROM rec JOIN lt ON rec.lang = lt.lang WHERE rec.rk > 0),
        |ranked AS (SELECT lang, doc_id AS id, ntok,
        |  sum(ntok) OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || 'unimax'), doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM (SELECT doc_id, lang,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ntok
        |    FROM documents)),
        |part AS (SELECT r.lang, CAST(count(*) AS BIGINT) AS pn,
        |  CAST(sum(r.ntok) AS BIGINT) AS ptok
        |  FROM ranked r JOIN q ON r.lang = q.lang WHERE r.cum <= q.rem
        |  GROUP BY r.lang)
        |SELECT q.lang, q.cap AS cap_toks, q.alloc AS alloc_toks,
        |  CAST(q.ep * q.nd + coalesce(p.pn, 0) AS BIGINT) AS n_docs_sel,
        |  CAST(q.ep * q.tot + coalesce(p.ptok, 0) AS BIGINT) AS tok_sel
        |FROM q LEFT JOIN part p ON q.lang = p.lang
        |ORDER BY q.lang""".stripMargin,
    // MM3: every video row is a 4-frame 25-fps Y4M (160 ms), sampled
    // at one frame per 80 ms → offsets {0, 80}, sample_idx {0, 1},
    // src_frame_idx {0, 2} (offset·fps/1000 — the SOURCE frame at the
    // timestamp, distinct from the sample ordinal); the decoded frame
    // count is pinned 4 — a truncated frame walk or a row falling to
    // the undecodable marker breaks the value
    "mm3_frame_sample" ->
      """WITH v AS (SELECT doc_id AS media_id FROM documents
        |  WHERE doc_id % 3 = 2),
        |off AS (SELECT unnest([0, 80]) AS offset_ms)
        |SELECT media_id, CAST(offset_ms AS BIGINT) AS offset_ms,
        |  CAST(offset_ms // 80 AS BIGINT) AS sample_idx,
        |  CAST(offset_ms * 25 // 1000 AS BIGINT) AS src_frame_idx,
        |  4 AS n_frames_decoded
        |FROM v, off ORDER BY media_id, sample_idx""".stripMargin,
    // R13: DoReMi domain weights — bucket counts, the three windowed
    // totals, the per-token KL excess (rounded BEFORE the exponential,
    // the r8 ulp rule), and the smoothed one-EG-step softmax all
    // replayed in one WITH-chain
    "r13_doremi" ->
      s"""WITH $doremiCtes
        |SELECT source AS domain, n_grams, excess, weight FROM mw
        |ORDER BY domain""".stripMargin,
    // The weights APPLIED: floor(200·w) ≥ 1 quota per domain, rows
    // picked by the engine-portable md5 rank (the r4 idiom)
    "llm_doremi_mix" ->
      s"""WITH $doremiCtes,
        |mq AS (SELECT source, greatest(1, CAST(floor(200 * weight) AS BIGINT)) AS quota FROM mw),
        |mr AS (SELECT dd.source, dd.doc_id, ROW_NUMBER() OVER (PARTITION BY dd.source
        |    ORDER BY md5(CAST(dd.doc_id AS VARCHAR)), dd.doc_id) AS rk
        |  FROM documents dd)
        |SELECT mr.source, mr.doc_id FROM mr JOIN mq ON mr.source = mq.source
        |WHERE rk <= quota ORDER BY mr.source, mr.doc_id""".stripMargin,
    // DoReMi tokenize-once composite: the mix chain plus a per-doc
    // token census joined onto the selection (census convention:
    // len(split(trim(text))) — the r10 rule)
    "llm_doremi_pipeline" ->
      s"""WITH $doremiCtes,
        |mq AS (SELECT source, greatest(1, CAST(floor(200 * weight) AS BIGINT)) AS quota FROM mw),
        |mr AS (SELECT dd.source, dd.doc_id, ROW_NUMBER() OVER (PARTITION BY dd.source
        |    ORDER BY md5(CAST(dd.doc_id AS VARCHAR)), dd.doc_id) AS rk
        |  FROM documents dd),
        |cen AS (SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok
        |  FROM documents)
        |SELECT mr.source, mr.doc_id, cen.n_tok
        |FROM mr JOIN mq ON mr.source = mq.source
        |  JOIN cen ON mr.doc_id = cen.doc_id
        |WHERE rk <= quota ORDER BY mr.source, mr.doc_id""".stripMargin,
    // D21: prototypicality, one-cell degenerate case — centroid = the
    // per-dim mean embedding; cosine rounded 6 dp BEFORE ranking (the
    // dsir rule), drop = the ceil(0.3·n) most prototypical
    "d21_prototypicality" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cm AS (SELECT i, avg(v[i]) AS mv FROM e, (SELECT unnest(range(1, 65)) AS i) GROUP BY i),
        |mv AS (SELECT list(mv ORDER BY i) AS m FROM cm),
        |sc AS (SELECT vec_id, round(list_cosine_similarity(v, m), 6) AS proto_sim FROM e, mv),
        |rk AS (SELECT vec_id, proto_sim,
        |  row_number() OVER (ORDER BY proto_sim DESC, vec_id) AS rank,
        |  count(*) OVER () AS n FROM sc)
        |SELECT vec_id, proto_sim, CAST(rank AS BIGINT) AS rank,
        |  CAST(rank > ceil(0.3 * n) AS INTEGER) AS kept
        |FROM rk ORDER BY vec_id""".stripMargin,
    // The D4 pipeline: d8's keeper closure chained into d21's
    // mean-prototype rank — dedup survivors only, then the 30% drop
    "llm_d4_pipeline" ->
      s"""WITH RECURSIVE $semanticKeeperCtes,
        |keep AS (SELECT ee.vec_id, ee.v FROM e ee LEFT JOIN comp c ON ee.vec_id = c.cid
        |  WHERE c.cluster_id IS NULL OR c.cluster_id = ee.vec_id),
        |cm AS (SELECT i, avg(v[i]) AS mv FROM keep, (SELECT unnest(range(1, 65)) AS i) GROUP BY i),
        |mv AS (SELECT list(mv ORDER BY i) AS m FROM cm),
        |sc AS (SELECT vec_id, round(list_cosine_similarity(v, m), 6) AS proto_sim FROM keep, mv),
        |rk AS (SELECT vec_id, proto_sim,
        |  row_number() OVER (ORDER BY proto_sim DESC, vec_id) AS rank,
        |  count(*) OVER () AS n FROM sc)
        |SELECT vec_id, proto_sim, CAST(rank AS BIGINT) AS rank,
        |  CAST(rank > ceil(0.3 * n) AS INTEGER) AS kept
        |FROM rk ORDER BY vec_id""".stripMargin,
    // T30: char entropy — the native kernel vs a per-char group-count
    // replay; H = ln N − (Σ n·ln n)/N, rounded 6 dp on both sides
    "t30_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
        |cc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c),
        |e AS (SELECT doc_id,
        |  round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 6) AS char_entropy
        |  FROM cc GROUP BY doc_id)
        |SELECT doc_id, char_entropy,
        |  CAST(char_entropy >= 2.85 AS INTEGER) AS keep
        |FROM e ORDER BY doc_id""".stripMargin,
    // T31: C4 line cleaning — the gate's (doc_id, line_idx)-keyed
    // multi-line construction replayed (5-word lines, %3 punct drop,
    // %7 javascript tail, %13 lorem / %17 curly closing line), then
    // every line and page rule recomputed on the synthesized text
    "t31_c4_line_clean" ->
      """WITH c4t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |c4l AS (SELECT doc_id, list_transform(
        |    range(1, greatest(CAST(ceil(len(ws) / 5.0) AS BIGINT), 1) + 1),
        |    i -> array_to_string(list_slice(ws, (i-1)*5 + 1, (i-1)*5 + 5), ' ')
        |      || CASE WHEN (doc_id + i) % 7 = 0 THEN ' javascript break' ELSE '' END
        |      || CASE WHEN (doc_id + i) % 3 < 2 THEN '.' ELSE '' END) AS lns
        |  FROM c4t),
        |c4b AS (SELECT doc_id, array_to_string(lns, chr(10)) AS b FROM c4l),
        |c4m AS (SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN b || chr(10) || 'lorem ipsum dolor sit amet.'
        |         WHEN doc_id % 17 = 0 THEN b || chr(10) || 'const cfg = { a: 1 } now done.'
        |         WHEN doc_id % 19 = 0 THEN b || chr(10) || 'this page has badword content today.'
        |         ELSE b END AS mt FROM c4b),
        |c4s AS (SELECT doc_id, mt, string_split(mt, chr(10)) AS ls FROM c4m),
        |c4k AS (SELECT doc_id, mt, ls,
        |    list_filter(ls, l -> regexp_matches(trim(l), '[.!?"'']$')
        |      AND len(regexp_split_to_array(trim(l), '\s+')) >= 5
        |      AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM c4s)
        |SELECT doc_id, CAST(len(ls) AS INTEGER) AS total_lines,
        |  CAST(len(kept) AS INTEGER) AS kept_lines,
        |  coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
        |  CAST(NOT contains(lower(mt), 'lorem ipsum') AND NOT contains(mt, '{')
        |    AND NOT contains(mt, '}') AND NOT contains(lower(mt), 'badword')
        |    AND len(kept) >= 3 AS INTEGER) AS keep
        |FROM c4k ORDER BY doc_id""".stripMargin,
    // T32: Heaps'-law vocab growth — bucket = (rank−1)·10 div N + 1
    // in doc_id order, cumulative distinct = tokens first seen in
    // buckets 1..b; all-integer, no rounding
    "t32_vocab_growth" ->
      """WITH vgr AS (SELECT doc_id, text,
        |    row_number() OVER (ORDER BY doc_id) AS rk,
        |    count(*) OVER () AS n FROM documents),
        |vgb AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      t -> len(t) > 0) AS tks,
        |    (rk - 1) * 10 // n + 1 AS bucket FROM vgr),
        |vgt AS (SELECT bucket, unnest(tks) AS tok FROM vgb),
        |vgp AS (SELECT bucket, count(*) AS docs, sum(len(tks)) AS toks
        |  FROM vgb GROUP BY bucket),
        |vgf AS (SELECT tok, min(bucket) AS bucket FROM vgt GROUP BY tok),
        |vgn AS (SELECT bucket, count(*) AS new_tokens FROM vgf GROUP BY bucket)
        |SELECT vgp.bucket,
        |  CAST(sum(docs) OVER (ORDER BY vgp.bucket) AS BIGINT) AS docs_cum,
        |  CAST(sum(toks) OVER (ORDER BY vgp.bucket) AS BIGINT) AS tokens_cum,
        |  CAST(sum(coalesce(new_tokens, 0)) OVER (ORDER BY vgp.bucket) AS BIGINT) AS vocab_cum
        |FROM vgp LEFT JOIN vgn ON vgp.bucket = vgn.bucket
        |ORDER BY vgp.bucket""".stripMargin,
    // T33: HTML extraction — the gate's synthesized page replayed,
    // then the SAME chain: script/style/comment blocks out, tags →
    // space, entities decoded with &amp; LAST, whitespace collapsed
    "t33_html_strip" ->
      """WITH hh AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || doc_id || '</title><script type="text/javascript">var x = 1; if (x < 2) { x = 2; }</script><style>.c { color: red; }</style></head><body><!-- note ' || doc_id || ' --><h1>Heading</h1><p>' || text || '</p>'
        |  || CASE WHEN doc_id % 3 = 0 THEN '<p>See &lt;a&gt; &amp;amp; &quot;quotes&quot;&nbsp;here.</p>' ELSE '' END
        |  || CASE WHEN doc_id % 4 = 0 THEN '<a href="http://ex.com/' || doc_id || '">link text</a>' ELSE '' END
        |  || '</body></html>' AS h FROM documents),
        |hst AS (SELECT doc_id, h, regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(h, '(?is)<head[^>]*>.*?</head>', ' ', 'g'),
        |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |    '(?s)<!--.*?-->', ' ', 'g') AS s FROM hh),
        |htg AS (SELECT doc_id, h, regexp_replace(s, '<[^>]+>', ' ', 'g') AS s FROM hst),
        |hde AS (SELECT doc_id, h, replace(replace(replace(replace(replace(replace(s,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |    '&nbsp;', ' '), '&amp;', '&') AS s FROM htg)
        |SELECT doc_id,
        |  trim(regexp_extract(h, '(?is)<title[^>]*>(.*?)</title>', 1)) AS title,
        |  CAST((length(h) - length(replace(h, '<a href', ''))) // 7 AS INTEGER) AS n_links,
        |  trim(regexp_replace(s, '\s+', ' ', 'g')) AS text
        |FROM hde ORDER BY doc_id""".stripMargin,
    // D22: URL canonicalization chain replayed step for step (RE2
    // backrefs are \1 where Spark's are $1 — same semantics), then
    // latest-crawl-wins: row_number over (canon, ts desc, id desc)
    "d22_url_dedup" ->
      """WITH uu AS (SELECT doc_id, doc_id % 97 AS fetch_ts,
        |  'HTTPS://WWW.Site' || (doc_id % 7) || '.COM:443/Dir' || (doc_id % 50) || '/page'
        |  || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
        |  || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' || (doc_id % 5) ELSE '' END
        |  || CASE WHEN doc_id % 5 = 0 THEN '#sec' || doc_id ELSE '' END AS url
        |  FROM documents),
        |uc1 AS (SELECT doc_id, fetch_ts,
        |  regexp_replace(regexp_replace(url, '#.*$', ''), '(?i)^https?://', '') AS ns FROM uu),
        |uc2 AS (SELECT doc_id, fetch_ts,
        |  regexp_replace(regexp_replace(lower(regexp_extract(ns, '^([^/?#]+)', 1)),
        |    '^www\.', ''), ':(80|443)$', '') AS host,
        |  regexp_replace(ns, '^[^/?#]+', '') AS pathq FROM uc1),
        |uc3 AS (SELECT doc_id, fetch_ts, host || regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(pathq, '(?i)[?&]utm_[^&#]*', '', 'g'),
        |    '^([^?]*)&', '\1?'), '[?&]$', ''), '^([^?]*)/$', '\1') AS canon_url
        |  FROM uc2),
        |ucr AS (SELECT canon_url, doc_id, fetch_ts,
        |  row_number() OVER (PARTITION BY canon_url ORDER BY fetch_ts DESC, doc_id DESC) AS rn,
        |  count(*) OVER (PARTITION BY canon_url) AS n_crawls FROM uc3)
        |SELECT canon_url, doc_id, fetch_ts, n_crawls
        |FROM ucr WHERE rn = 1 ORDER BY canon_url""".stripMargin,
    // ANN12: hard negatives — ann1's brute-force chain with the
    // cross-label predicate; the negative's label rides in the output
    "ann12_hard_negatives" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv, label AS ql FROM e WHERE vec_id % 37 = 0),
        |scored AS (SELECT q_id, e.vec_id AS n_id, e.label AS n_label,
        |  list_cosine_similarity(qv, e.v) AS cos
        |  FROM q, e WHERE e.label <> ql),
        |r AS (SELECT q_id, n_id, n_label, cos, ROW_NUMBER() OVER (
        |  PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank FROM scored)
        |SELECT q_id, rank, n_id, n_label, round(cos, 6) AS cos_sim
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    // ANN13: CDC index maintenance — the oracle applies both mutation
    // batches' CASE logic to the corpus and recomputes the integer-grid
    // embedding of every LIVE doc (the ann11 embedding convention)
    "ann13_cdc_maintenance" ->
      """WITH fin AS (SELECT doc_id,
        |  CASE
        |    WHEN doc_id % 5 <> 0 AND doc_id % 13 = 0 AND doc_id % 3 = 0
        |      THEN text || ' v3'
        |    WHEN doc_id % 5 <> 0 AND doc_id % 13 = 0 THEN text || ' v2'
        |    WHEN doc_id % 5 <> 0 AND doc_id % 13 <> 0 AND doc_id % 17 = 0
        |      AND doc_id % 2 = 0 THEN text || ' back'
        |    ELSE text END AS t,
        |  CASE
        |    WHEN doc_id % 5 <> 0 THEN
        |      (doc_id % 13 = 0 OR doc_id % 17 <> 0 OR doc_id % 2 = 0)
        |    ELSE (doc_id % 2 = 0 AND doc_id % 3 <> 0) END AS live
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(list_sum(list_transform(range(0,8),
        |    i -> (length(t)*31 + doc_id*17 + i*7) % 97)) AS DOUBLE) AS vec_l1,
        |  CAST((length(t)*31 + doc_id*17) % 97 AS DOUBLE) AS v0
        |FROM fin WHERE live ORDER BY doc_id""".stripMargin,
    // T34: streamed LM-score ingest — the t26 target-trained chain plus
    // the kept-threshold on the 6-dp rounded score (both engines filter
    // the SAME rounded value, so the boundary cannot ulp-flip)
    "t34_lm_stream" -> (targetBigramLmCtes +
      """
        |SELECT id, CAST(n_bigrams AS BIGINT) AS n_bigrams, avg_logp
        |FROM scored WHERE avg_logp IS NOT NULL AND avg_logp >= -3.6
        |ORDER BY id""".stripMargin),
    // D24: streamed boilerplate ingest — the d19 election/coverage/
    // rewrite chain evaluated at each batch's HORIZON (landed+evens
    // for batch 1, everything for batch 2; bi -1 = landed store
    // install, never published)
    "d24_boilerplate_stream" ->
      """WITH t AS (SELECT doc_id, source,
        |  CASE WHEN doc_id % 31 = 0 THEN -1 ELSE doc_id % 2 END AS bi,
        |  regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |g AS (SELECT doc_id, source, bi, u.p AS p, u.s AS s FROM (
        |  SELECT doc_id, source, bi, unnest(list_transform(range(1, len(ws) - 3),
        |    i -> {'p': i, 's': ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]})) AS u
        |  FROM t WHERE len(ws) >= 5)),
        |bcnt AS (SELECT source, s,
        |  count(DISTINCT CASE WHEN bi <= 0 THEN doc_id END) AS c0,
        |  count(DISTINCT doc_id) AS c1
        |  FROM g GROUP BY source, s),
        |cov AS (SELECT DISTINCT g.doc_id, unnest(range(g.p, g.p + 5)) AS i
        |  FROM g JOIN bcnt ON g.source = bcnt.source AND g.s = bcnt.s
        |  WHERE g.bi >= 0 AND
        |    ((g.bi = 0 AND bcnt.c0 >= 3) OR (g.bi = 1 AND bcnt.c1 >= 3))),
        |st AS (SELECT doc_id, ws FROM t WHERE bi >= 0),
        |tok AS (SELECT doc_id, u.i AS i, u.w AS w FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1), i -> {'i': i, 'w': ws[i]})) AS u FROM st)),
        |kept AS (SELECT tok.doc_id, tok.i, tok.w FROM tok ANTI JOIN cov
        |  ON tok.doc_id = cov.doc_id AND tok.i = cov.i),
        |outp AS (SELECT doc_id, count(*) AS n_kept,
        |  string_agg(w, ' ' ORDER BY i) AS clean_text FROM kept GROUP BY doc_id)
        |SELECT st.doc_id, CAST(len(ws) AS BIGINT) AS n_toks,
        |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(clean_text, '') AS clean_text
        |FROM st LEFT JOIN outp ON st.doc_id = outp.doc_id
        |ORDER BY st.doc_id""".stripMargin,
    // T35/T36: fuzzy decontamination — eval construction + cross-set
    // exact jaccard + max-per-doc flag in one chain (round(max) =
    // max(round) by monotonicity); t36 is the at-rest store path and
    // SHARES this oracle (store = live is the contract, the t23
    // convention)
    "t35_fuzzy_decontam" -> fuzzyDecontamSql,
    // MM4/MM7: perceptual-hash image dedup / volume-invariant audio
    // dedup — one shared oracle replaying the group structure both
    // fingerprints are CONTRACTED to mirror (text equality + the
    // planted %5 twin arithmetic: brightness shift for images, ×2
    // gain for audio); invariance, discrimination and keeper election
    // all land in one hash
    "mm4_image_dedup" -> mediaDupGroupsSql,
    "mm7_audio_dedup" -> mediaDupGroupsSql,
    "mm8_video_dedup" -> mediaDupGroupsSql,
    // T37: integer-exact PageRank, all 3 Jacobi iterations UNROLLED —
    // floor division + integer sums are the kernel's portability
    // design, so the replay is bit-exact with no float tolerance
    "t37_link_rank" ->
      """WITH nn AS (SELECT doc_id AS id FROM documents WHERE doc_id < 2000),
        |mc AS (SELECT count(*) AS m FROM nn),
        |e AS (SELECT id AS src, (id * 7 + 1) % (SELECT m FROM mc) AS dst FROM nn
        |  UNION ALL SELECT id, (id * 13 + 2) % (SELECT m FROM mc) FROM nn
        |  UNION ALL SELECT id, (id * 31 + 5) % (SELECT m FROM mc) FROM nn),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
        |r0 AS (SELECT id, CAST(1000000000000 AS BIGINT) AS pr FROM nn),
        |s1 AS (SELECT e.dst AS id, sum(r0.pr // deg.d) AS s FROM e
        |  JOIN deg ON e.src = deg.src JOIN r0 ON r0.id = e.src GROUP BY e.dst),
        |r1 AS (SELECT nn.id, CAST(150000000000 + (85 * coalesce(s1.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nn LEFT JOIN s1 ON nn.id = s1.id),
        |s2 AS (SELECT e.dst AS id, sum(r1.pr // deg.d) AS s FROM e
        |  JOIN deg ON e.src = deg.src JOIN r1 ON r1.id = e.src GROUP BY e.dst),
        |r2 AS (SELECT nn.id, CAST(150000000000 + (85 * coalesce(s2.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nn LEFT JOIN s2 ON nn.id = s2.id),
        |s3 AS (SELECT e.dst AS id, sum(r2.pr // deg.d) AS s FROM e
        |  JOIN deg ON e.src = deg.src JOIN r2 ON r2.id = e.src GROUP BY e.dst),
        |r3 AS (SELECT nn.id, CAST(150000000000 + (85 * coalesce(s3.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nn LEFT JOIN s3 ON nn.id = s3.id)
        |SELECT id AS doc_id, pr FROM r3 ORDER BY doc_id""".stripMargin,
    // T38: the dangling-mass variant — %5 nodes have no outlinks; each
    // unrolled iteration adds the dangling rank sum's floor-divided
    // uniform share inside the damped term, exactly like the kernel
    "t38_link_rank_dangling" ->
      """WITH nn AS (SELECT doc_id AS id FROM documents WHERE doc_id < 2000),
        |mc AS (SELECT count(*) AS m FROM nn),
        |e AS (SELECT id AS src, (id * 7 + 1) % (SELECT m FROM mc) AS dst FROM nn WHERE id % 5 <> 0
        |  UNION ALL SELECT id, (id * 13 + 2) % (SELECT m FROM mc) FROM nn WHERE id % 5 <> 0
        |  UNION ALL SELECT id, (id * 31 + 5) % (SELECT m FROM mc) FROM nn WHERE id % 5 <> 0),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
        |r0 AS (SELECT id, CAST(1000000000000 AS BIGINT) AS pr FROM nn),
        |d0 AS (SELECT coalesce(sum(pr), 0) AS dm FROM r0 WHERE id NOT IN (SELECT src FROM deg)),
        |s1 AS (SELECT e.dst AS id, sum(r0.pr // deg.d) AS s FROM e
        |  JOIN deg ON e.src = deg.src JOIN r0 ON r0.id = e.src GROUP BY e.dst),
        |r1 AS (SELECT nn.id, CAST(150000000000 + (85 * (coalesce(s1.s, 0)
        |    + (SELECT dm FROM d0) // (SELECT m FROM mc))) // 100 AS BIGINT) AS pr
        |  FROM nn LEFT JOIN s1 ON nn.id = s1.id),
        |d1 AS (SELECT coalesce(sum(pr), 0) AS dm FROM r1 WHERE id NOT IN (SELECT src FROM deg)),
        |s2 AS (SELECT e.dst AS id, sum(r1.pr // deg.d) AS s FROM e
        |  JOIN deg ON e.src = deg.src JOIN r1 ON r1.id = e.src GROUP BY e.dst),
        |r2 AS (SELECT nn.id, CAST(150000000000 + (85 * (coalesce(s2.s, 0)
        |    + (SELECT dm FROM d1) // (SELECT m FROM mc))) // 100 AS BIGINT) AS pr
        |  FROM nn LEFT JOIN s2 ON nn.id = s2.id),
        |d2 AS (SELECT coalesce(sum(pr), 0) AS dm FROM r2 WHERE id NOT IN (SELECT src FROM deg)),
        |s3 AS (SELECT e.dst AS id, sum(r2.pr // deg.d) AS s FROM e
        |  JOIN deg ON e.src = deg.src JOIN r2 ON r2.id = e.src GROUP BY e.dst),
        |r3 AS (SELECT nn.id, CAST(150000000000 + (85 * (coalesce(s3.s, 0)
        |    + (SELECT dm FROM d2) // (SELECT m FROM mc))) // 100 AS BIGINT) AS pr
        |  FROM nn LEFT JOIN s3 ON nn.id = s3.id)
        |SELECT id AS doc_id, pr FROM r3 ORDER BY doc_id""".stripMargin,
    // Rank-weighted selection: t37's unrolled Jacobi chain + t30's
    // entropy recount joined into one ranked LIMIT (ties broken by id)
    "llm_rank_select" ->
      """WITH nn AS (SELECT doc_id AS id FROM documents WHERE doc_id < 2000),
        |mc AS (SELECT count(*) AS m FROM nn),
        |e AS (SELECT id AS src, (id * 7 + 1) % (SELECT m FROM mc) AS dst FROM nn
        |  UNION ALL SELECT id, (id * 13 + 2) % (SELECT m FROM mc) FROM nn
        |  UNION ALL SELECT id, (id * 31 + 5) % (SELECT m FROM mc) FROM nn),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
        |r0 AS (SELECT id, CAST(1000000000000 AS BIGINT) AS pr FROM nn),
        |s1 AS (SELECT e.dst AS id, sum(r0.pr // deg.d) AS s FROM e
        |  JOIN deg ON e.src = deg.src JOIN r0 ON r0.id = e.src GROUP BY e.dst),
        |r1 AS (SELECT nn.id, CAST(150000000000 + (85 * coalesce(s1.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nn LEFT JOIN s1 ON nn.id = s1.id),
        |s2 AS (SELECT e.dst AS id, sum(r1.pr // deg.d) AS s FROM e
        |  JOIN deg ON e.src = deg.src JOIN r1 ON r1.id = e.src GROUP BY e.dst),
        |r2 AS (SELECT nn.id, CAST(150000000000 + (85 * coalesce(s2.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nn LEFT JOIN s2 ON nn.id = s2.id),
        |s3 AS (SELECT e.dst AS id, sum(r2.pr // deg.d) AS s FROM e
        |  JOIN deg ON e.src = deg.src JOIN r2 ON r2.id = e.src GROUP BY e.dst),
        |r3 AS (SELECT nn.id, CAST(150000000000 + (85 * coalesce(s3.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nn LEFT JOIN s3 ON nn.id = s3.id),
        |ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
        |  FROM documents WHERE doc_id < 2000),
        |cc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c),
        |en AS (SELECT doc_id,
        |  round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 6) AS char_entropy
        |  FROM cc GROUP BY doc_id)
        |SELECT r3.id AS doc_id, r3.pr, en.char_entropy
        |FROM r3 JOIN en ON r3.id = en.doc_id
        |WHERE en.char_entropy >= 2.85
        |ORDER BY r3.pr DESC, doc_id LIMIT 100""".stripMargin,
    // Rank-WEIGHTED draw: the unrolled Jacobi chain feeds the
    // Efraimidis–Spirakis priority — 24-bit md5 uniform via strpos hex
    // arithmetic (the shuffleShard portability rule), ln, 6-dp round,
    // top-200 by (priority, id)
    "llm_rank_weighted_mix" ->
      """WITH nn AS (SELECT doc_id AS id FROM documents WHERE doc_id < 2000),
        |mc AS (SELECT count(*) AS m FROM nn),
        |e AS (SELECT id AS src, (id * 7 + 1) % (SELECT m FROM mc) AS dst FROM nn
        |  UNION ALL SELECT id, (id * 13 + 2) % (SELECT m FROM mc) FROM nn
        |  UNION ALL SELECT id, (id * 31 + 5) % (SELECT m FROM mc) FROM nn),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
        |r0 AS (SELECT id, CAST(1000000000000 AS BIGINT) AS pr FROM nn),
        |s1 AS (SELECT e.dst AS id, sum(r0.pr // deg.d) AS s FROM e
        |  JOIN deg ON e.src = deg.src JOIN r0 ON r0.id = e.src GROUP BY e.dst),
        |r1 AS (SELECT nn.id, CAST(150000000000 + (85 * coalesce(s1.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nn LEFT JOIN s1 ON nn.id = s1.id),
        |s2 AS (SELECT e.dst AS id, sum(r1.pr // deg.d) AS s FROM e
        |  JOIN deg ON e.src = deg.src JOIN r1 ON r1.id = e.src GROUP BY e.dst),
        |r2 AS (SELECT nn.id, CAST(150000000000 + (85 * coalesce(s2.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nn LEFT JOIN s2 ON nn.id = s2.id),
        |s3 AS (SELECT e.dst AS id, sum(r2.pr // deg.d) AS s FROM e
        |  JOIN deg ON e.src = deg.src JOIN r2 ON r2.id = e.src GROUP BY e.dst),
        |r3 AS (SELECT nn.id, CAST(150000000000 + (85 * coalesce(s3.s, 0)) // 100 AS BIGINT) AS pr
        |  FROM nn LEFT JOIN s3 ON nn.id = s3.id),
        |pv AS (SELECT r3.id AS doc_id, r3.pr, d.lang,
        |  list_sum(list_transform(range(6), i ->
        |    (strpos('0123456789abcdef',
        |       substring(md5(CAST(r3.id AS VARCHAR)), CAST(i + 1 AS INT), 1)) - 1)
        |    * CAST(16 ** (5 - i) AS BIGINT))) AS v
        |  FROM r3 JOIN documents d ON d.doc_id = r3.id),
        |pp AS (SELECT doc_id, lang, pr,
        |  round(ln((v + 1) / 16777216.0) * 1e12 / pr, 6) AS priority FROM pv),
        |keep AS (SELECT * FROM pp ORDER BY priority DESC, doc_id LIMIT 200)
        |SELECT doc_id, lang, pr, priority FROM keep ORDER BY doc_id""".stripMargin,
    // MM5: at-rest image dedup — keeper rule replayed on text equality
    // (what the dHash is contracted to mirror); store slice excluded,
    // min-id election within the batch
    "mm5_image_dedup_store" ->
      """WITH t AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
        |st AS (SELECT DISTINCT text FROM t WHERE doc_id % 31 = 0),
        |b AS (SELECT doc_id AS media_id, text FROM t WHERE doc_id % 31 <> 0
        |  UNION ALL SELECT doc_id + 500000000, text FROM t
        |  WHERE doc_id % 31 = 0 AND doc_id % 10 = 0),
        |k AS (SELECT media_id,
        |  CASE WHEN media_id = min(media_id) OVER (PARTITION BY text)
        |    AND text NOT IN (SELECT text FROM st) THEN 1 ELSE 0 END AS kept
        |  FROM b)
        |SELECT media_id, kept FROM k ORDER BY media_id""".stripMargin,
    // MM6: the streamed twin — cross-batch keeper rule (batch index =
    // id parity, batch 1 first), store slice excluded; published table
    // is the hashed surface, so order/append/publish slips all land
    "mm6_image_dedup_stream" ->
      """WITH t AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
        |st AS (SELECT DISTINCT text FROM t WHERE doc_id % 31 = 0),
        |b AS (SELECT doc_id AS media_id, text FROM t WHERE doc_id % 31 <> 0
        |  UNION ALL SELECT doc_id + 500000000, text FROM t
        |  WHERE doc_id % 31 = 0 AND doc_id % 10 = 0),
        |r AS (SELECT media_id, text, row_number() OVER (PARTITION BY text
        |  ORDER BY CASE WHEN media_id % 2 = 0 THEN 1 ELSE 2 END, media_id) AS rn
        |  FROM b)
        |SELECT media_id FROM r
        |WHERE rn = 1 AND text NOT IN (SELECT text FROM st)
        |ORDER BY media_id""".stripMargin,
    // MM9: the audio-modality streamed twin — SAME keeper-rule replay
    // as mm6 (the fingerprint is contracted to mirror text equality;
    // gain twins are invariance-dropped), proving the shared
    // store/stream seam end-to-end for a second modality
    "mm9_audio_dedup_stream" ->
      """WITH t AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
        |st AS (SELECT DISTINCT text FROM t WHERE doc_id % 31 = 0),
        |b AS (SELECT doc_id AS media_id, text FROM t WHERE doc_id % 31 <> 0
        |  UNION ALL SELECT doc_id + 500000000, text FROM t
        |  WHERE doc_id % 31 = 0 AND doc_id % 10 = 0),
        |r AS (SELECT media_id, text, row_number() OVER (PARTITION BY text
        |  ORDER BY CASE WHEN media_id % 2 = 0 THEN 1 ELSE 2 END, media_id) AS rn
        |  FROM b)
        |SELECT media_id FROM r
        |WHERE rn = 1 AND text NOT IN (SELECT text FROM st)
        |ORDER BY media_id""".stripMargin,
    // MM10: the video-modality streamed twin — the trio's third member
    // on the SAME keeper-rule replay (frames derive per-text, so the
    // fingerprint mirrors text equality; +16 brightness twins are
    // invariance-dropped), closing the store/stream seam for all three
    "mm10_video_dedup_stream" ->
      """WITH t AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
        |st AS (SELECT DISTINCT text FROM t WHERE doc_id % 31 = 0),
        |b AS (SELECT doc_id AS media_id, text FROM t WHERE doc_id % 31 <> 0
        |  UNION ALL SELECT doc_id + 500000000, text FROM t
        |  WHERE doc_id % 31 = 0 AND doc_id % 10 = 0),
        |r AS (SELECT media_id, text, row_number() OVER (PARTITION BY text
        |  ORDER BY CASE WHEN media_id % 2 = 0 THEN 1 ELSE 2 END, media_id) AS rn
        |  FROM b)
        |SELECT media_id FROM r
        |WHERE rn = 1 AND text NOT IN (SELECT text FROM st)
        |ORDER BY media_id""".stripMargin,
    // D28: SoftDeDup reweighting — canonical md5 commonness and the
    // rounded 1/n weight recomputed from the raw planted corpus
    "d28_soft_dedup" ->
      """WITH t AS (SELECT doc_id, text FROM documents),
        |b AS (SELECT doc_id, text FROM t
        |  UNION ALL SELECT doc_id + 500000, upper(text) || '!!!' FROM t
        |    WHERE doc_id % 7 = 0
        |  UNION ALL SELECT doc_id + 600000, '  ' || text || ' .' FROM t
        |    WHERE doc_id % 13 = 0),
        |k AS (SELECT doc_id, md5(trim(regexp_replace(regexp_replace(
        |  lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')))
        |  AS fp FROM b),
        |c AS (SELECT fp, count(*) AS n_copies FROM k GROUP BY fp)
        |SELECT k.doc_id, c.n_copies,
        |  round(1.0 / c.n_copies, 6) AS soft_weight
        |FROM k JOIN c USING (fp) ORDER BY doc_id""".stripMargin,
    // SoftDeDup mix: d28's weight chain feeding the ES priority (the
    // llm_rank_weighted_mix portability convention) and a top-300 cut
    "llm_softdedup_mix" ->
      """WITH t AS (SELECT doc_id, text FROM documents),
        |b AS (SELECT doc_id, text FROM t
        |  UNION ALL SELECT doc_id + 500000, upper(text) || '!!!' FROM t
        |    WHERE doc_id % 7 = 0
        |  UNION ALL SELECT doc_id + 600000, '  ' || text || ' .' FROM t
        |    WHERE doc_id % 13 = 0),
        |k AS (SELECT doc_id, md5(trim(regexp_replace(regexp_replace(
        |  lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')))
        |  AS fp FROM b),
        |c AS (SELECT fp, count(*) AS n_copies FROM k GROUP BY fp),
        |w AS (SELECT k.doc_id, c.n_copies,
        |  round(1.0 / c.n_copies, 6) AS soft_weight
        |  FROM k JOIN c USING (fp)),
        |pv AS (SELECT doc_id, n_copies, soft_weight,
        |  list_sum(list_transform(range(6), i ->
        |    (strpos('0123456789abcdef',
        |       substring(md5(CAST(doc_id AS VARCHAR)), CAST(i + 1 AS INT), 1)) - 1)
        |    * CAST(16 ** (5 - i) AS BIGINT))) AS v FROM w),
        |pp AS (SELECT doc_id, n_copies, soft_weight,
        |  round(ln((v + 1) / 16777216.0) * 1.0 / soft_weight, 6) AS priority
        |  FROM pv),
        |keep AS (SELECT * FROM pp ORDER BY priority DESC, doc_id LIMIT 300)
        |SELECT doc_id, n_copies, soft_weight, priority FROM keep
        |ORDER BY doc_id""".stripMargin,
    // T39: URL curation — host/registered-domain extraction, blocklist
    // verdict, and the occurrence-count score replayed on the raw URL
    "t39_url_filter" ->
      """WITH t AS (SELECT doc_id FROM documents),
        |u AS (SELECT doc_id, 'https://' ||
        |  CASE WHEN doc_id % 11 = 0
        |         THEN 'www.tracker' || CAST(doc_id % 2 AS VARCHAR) || '.com'
        |       WHEN doc_id % 7 = 0
        |         THEN 'blog' || CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
        |       ELSE 'site' || CAST(doc_id % 9 AS VARCHAR) || '.com' END ||
        |  '/p' || CAST(doc_id % 50 AS VARCHAR) ||
        |  CASE WHEN doc_id % 13 = 0 THEN '/casino-games' ELSE '' END ||
        |  CASE WHEN doc_id % 17 = 0 THEN '?ref=xxx&x=1' ELSE '' END AS url
        |  FROM t),
        |h AS (SELECT doc_id, url, regexp_replace(regexp_replace(lower(
        |    regexp_extract(regexp_replace(url, '(?i)^https?://', ''),
        |      '^([^/?#]+)', 1)), '^www\.', ''), ':[0-9]+$', '') AS host
        |  FROM u),
        |d AS (SELECT doc_id, url, string_split(host, '.') AS parts FROM h),
        |rd AS (SELECT doc_id, url,
        |  CASE WHEN len(parts) >= 3 AND
        |         array_to_string(parts[len(parts)-1:], '.') IN
        |           ('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',
        |            'org.au','co.jp','or.jp','ne.jp','com.br','com.cn',
        |            'com.mx','co.in','co.kr','com.tw','com.sg','co.za',
        |            'com.ar','com.tr')
        |       THEN array_to_string(parts[len(parts)-2:], '.')
        |       ELSE array_to_string(parts[len(parts)-1:], '.') END AS domain
        |  FROM d),
        |sc AS (SELECT doc_id, url, domain,
        |  CAST((length(lower(url)) - length(replace(lower(url), 'casino', ''))) / 6
        |     + (length(lower(url)) - length(replace(lower(url), 'xxx', ''))) / 3
        |    AS BIGINT) AS url_score,
        |  domain IN ('tracker0.com', 'tracker1.com', 'spam.co.uk') AS blocked
        |  FROM rd)
        |SELECT doc_id, url, domain, blocked, url_score,
        |  (NOT blocked) AND url_score <= 0 AS keep
        |FROM sc ORDER BY doc_id""".stripMargin,
    // T40: FIM — the md5 apply-decision, both mod-draw cut points, and
    // the three substrings replayed character-for-character
    "t40_fim_transform" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |u AS (SELECT doc_id, text, n,
        |  list_sum(list_transform(range(6), i ->
        |    (strpos('0123456789abcdef', substring(
        |       md5(CAST(doc_id AS VARCHAR) || ':fim'),
        |       CAST(i + 1 AS INT), 1)) - 1)
        |    * CAST(16 ** (5 - i) AS BIGINT))) AS vf,
        |  list_sum(list_transform(range(6), i ->
        |    (strpos('0123456789abcdef', substring(
        |       md5(CAST(doc_id AS VARCHAR) || ':a'),
        |       CAST(i + 1 AS INT), 1)) - 1)
        |    * CAST(16 ** (5 - i) AS BIGINT))) AS va,
        |  list_sum(list_transform(range(6), i ->
        |    (strpos('0123456789abcdef', substring(
        |       md5(CAST(doc_id AS VARCHAR) || ':b'),
        |       CAST(i + 1 AS INT), 1)) - 1)
        |    * CAST(16 ** (5 - i) AS BIGINT))) AS vb
        |  FROM t),
        |c AS (SELECT doc_id, text, n, vf / 16777216.0 < 0.5 AS fim_applied,
        |  va % (n + 1) AS a, vb FROM u),
        |c2 AS (SELECT doc_id, text, n, fim_applied, a,
        |  a + vb % (n - a + 1) AS b FROM c)
        |SELECT doc_id, fim_applied,
        |  CASE WHEN fim_applied THEN
        |    '<PRE>' || substring(text, 1, CAST(a AS INT)) ||
        |    '<SUF>' || substring(text, CAST(b + 1 AS INT), CAST(n - b AS INT)) ||
        |    '<MID>' || substring(text, CAST(a + 1 AS INT), CAST(b - a AS INT))
        |  ELSE text END AS fim_text
        |FROM c2 ORDER BY doc_id""".stripMargin,
    // T41: scrub — planted controls rebuilt with chr(), the three
    // regexp passes replayed with the global flag (Spark's default)
    "t41_text_scrub" ->
      """WITH t AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN chr(1) || chr(7) ELSE '' END ||
        |  text ||
        |  CASE WHEN doc_id % 5 = 0
        |    THEN chr(13) || chr(10) || ' tail' || chr(160) || 'x' || chr(8203)
        |    ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0 THEN chr(65279) || chr(133) ELSE '' END
        |  AS raw FROM documents),
        |c AS (SELECT doc_id, raw, regexp_replace(regexp_replace(
        |  regexp_replace(raw, '\r\n?', chr(10), 'g'),
        |  '[\x{A0}]', ' ', 'g'),
        |  '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}\x{80}-\x{9F}\x{FEFF}\x{200B}-\x{200D}]',
        |  '', 'g') AS clean_text FROM t)
        |SELECT doc_id, clean_text,
        |  CAST(length(raw) - length(clean_text) AS BIGINT) AS n_scrubbed
        |FROM c ORDER BY doc_id""".stripMargin,
    // Code-pretraining composite: scrub (t41) -> exact dedup on the
    // SCRUBBED text (d1's fp — the scrub is what makes the encoding
    // twins byte-equal) -> FIM on the scrubbed length (t40) -> pack
    // (t8); each fragment is the individually-proven oracle block
    "llm_code_pipeline" ->
      """WITH t AS (SELECT doc_id, text FROM documents),
        |b AS (SELECT doc_id, text FROM t
        |  UNION ALL SELECT doc_id + 700000,
        |    chr(65279) || text || chr(8203) || chr(7) FROM t
        |    WHERE doc_id % 9 = 0),
        |c AS (SELECT doc_id, regexp_replace(regexp_replace(
        |  regexp_replace(text, '\r\n?', chr(10), 'g'),
        |  '[\x{A0}]', ' ', 'g'),
        |  '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}\x{80}-\x{9F}\x{FEFF}\x{200B}-\x{200D}]',
        |  '', 'g') AS clean FROM b),
        |k AS (SELECT doc_id, clean, row_number() OVER (
        |  PARTITION BY md5(trim(regexp_replace(lower(clean), '\s+', ' ', 'g')))
        |  ORDER BY doc_id) AS rn FROM c),
        |kk AS (SELECT doc_id, clean, length(clean) AS n FROM k WHERE rn = 1),
        |u AS (SELECT doc_id, clean, n,
        |  list_sum(list_transform(range(6), i ->
        |    (strpos('0123456789abcdef', substring(
        |       md5(CAST(doc_id AS VARCHAR) || ':fim'),
        |       CAST(i + 1 AS INT), 1)) - 1)
        |    * CAST(16 ** (5 - i) AS BIGINT))) AS vf,
        |  list_sum(list_transform(range(6), i ->
        |    (strpos('0123456789abcdef', substring(
        |       md5(CAST(doc_id AS VARCHAR) || ':a'),
        |       CAST(i + 1 AS INT), 1)) - 1)
        |    * CAST(16 ** (5 - i) AS BIGINT))) AS va,
        |  list_sum(list_transform(range(6), i ->
        |    (strpos('0123456789abcdef', substring(
        |       md5(CAST(doc_id AS VARCHAR) || ':b'),
        |       CAST(i + 1 AS INT), 1)) - 1)
        |    * CAST(16 ** (5 - i) AS BIGINT))) AS vb
        |  FROM kk),
        |cc AS (SELECT doc_id, clean, n, vf / 16777216.0 < 0.5 AS fim_applied,
        |  va % (n + 1) AS a, vb FROM u),
        |c2 AS (SELECT doc_id, clean, n, fim_applied, a,
        |  a + vb % (n - a + 1) AS b FROM cc),
        |f AS (SELECT doc_id, fim_applied,
        |  CASE WHEN fim_applied THEN
        |    '<PRE>' || substring(clean, 1, CAST(a AS INT)) ||
        |    '<SUF>' || substring(clean, CAST(b + 1 AS INT), CAST(n - b AS INT)) ||
        |    '<MID>' || substring(clean, CAST(a + 1 AS INT), CAST(b - a AS INT))
        |  ELSE clean END AS fim_text FROM c2),
        |p AS (SELECT doc_id AS id, doc_id % 8 AS shard, fim_applied,
        |  len(regexp_split_to_array(trim(fim_text), '\s+')) AS n_tokens FROM f),
        |cum AS (SELECT id, shard, n_tokens, fim_applied,
        |  sum(n_tokens) OVER (PARTITION BY shard ORDER BY id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM p)
        |SELECT id AS doc_id, shard, n_tokens,
        |  CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS chunk_id,
        |  fim_applied
        |FROM cum ORDER BY doc_id""".stripMargin,
    // T42: domain prior — registered domain (t39's extraction), t12's
    // quality replay, DECIMAL sums and the qsum >= thr*n verdict
    "t42_domain_prior" ->
      """WITH t AS (SELECT doc_id, text,
        |  regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |q AS (SELECT doc_id,
        |  round(least(len(ws) / 50.0, 1.0) * 0.5
        |    + least(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in')))
        |        / greatest(len(ws) * 0.05, 1.0), 1.0) * 0.5
        |    - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |        / greatest(length(text), 1), 6) AS quality
        |  FROM t),
        |u AS (SELECT doc_id, quality,
        |  CASE WHEN doc_id % 11 = 0
        |         THEN 'tracker' || CAST(doc_id % 2 AS VARCHAR) || '.com'
        |       WHEN doc_id % 7 = 0
        |         THEN 'blog' || CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
        |       ELSE 'site' || CAST(doc_id % 9 AS VARCHAR) || '.com' END
        |    AS domain,
        |  'https://' ||
        |  CASE WHEN doc_id % 11 = 0
        |         THEN 'www.tracker' || CAST(doc_id % 2 AS VARCHAR) || '.com'
        |       WHEN doc_id % 7 = 0
        |         THEN 'blog' || CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
        |       ELSE 'site' || CAST(doc_id % 9 AS VARCHAR) || '.com' END ||
        |  '/p' || CAST(doc_id % 50 AS VARCHAR) AS url
        |  FROM q),
        |g AS (SELECT domain, count(*) AS domain_docs,
        |  sum(CAST(quality AS DECIMAL(18,6))) AS qsum FROM u GROUP BY domain)
        |SELECT u.doc_id, u.domain, g.domain_docs,
        |  CAST(g.qsum AS DOUBLE) AS domain_qsum,
        |  g.domain_docs < 20 OR
        |    g.qsum >= CAST(0.81 AS DECIMAL(18,6)) * g.domain_docs AS keep
        |FROM u JOIN g USING (domain) ORDER BY doc_id""".stripMargin,
    // RefinedWeb composite: t39's URL gate, then t42's domain prior
    // computed over the URL SURVIVORS only, then the page verdict
    "llm_refinedweb_pipeline" ->
      """WITH t AS (SELECT doc_id, text,
        |  regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |q AS (SELECT doc_id,
        |  round(least(len(ws) / 50.0, 1.0) * 0.5
        |    + least(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in')))
        |        / greatest(len(ws) * 0.05, 1.0), 1.0) * 0.5
        |    - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |        / greatest(length(text), 1), 6) AS quality
        |  FROM t),
        |u AS (SELECT doc_id, quality,
        |  CASE WHEN doc_id % 11 = 0
        |         THEN 'tracker' || CAST(doc_id % 2 AS VARCHAR) || '.com'
        |       WHEN doc_id % 7 = 0
        |         THEN 'blog' || CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
        |       ELSE 'site' || CAST(doc_id % 9 AS VARCHAR) || '.com' END
        |    AS domain,
        |  CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END AS url_score
        |  FROM q),
        |uk AS (SELECT doc_id, quality, domain FROM u
        |  WHERE domain NOT IN ('tracker0.com', 'tracker1.com')
        |    AND url_score <= 0),
        |g AS (SELECT domain, count(*) AS domain_docs,
        |  sum(CAST(quality AS DECIMAL(18,6))) AS qsum FROM uk GROUP BY domain)
        |SELECT uk.doc_id, uk.domain, g.domain_docs,
        |  CAST(g.qsum AS DOUBLE) AS domain_qsum
        |FROM uk JOIN g USING (domain)
        |WHERE g.domain_docs < 20 OR
        |  g.qsum >= CAST(0.81 AS DECIMAL(18,6)) * g.domain_docs
        |ORDER BY doc_id""".stripMargin,
    // LLM-RAG retrieval composite: chunk (t11's chain) -> integer-grid
    // embed (ann11's convention) -> IVF at nProbe = nCells (exact, the
    // ann14 replayability rule) -> top-3 with provenance; rank on
    // unrounded cosine with chunk-key tie-break, rounded on output
    "llm_rag_pipeline" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |  FROM documents WHERE doc_id < 1500),
        |st AS (SELECT doc_id, ws, unnest(range(0, greatest(len(ws), 1), 24)) AS start
        |  FROM t),
        |ch AS (SELECT doc_id, CAST(start / 24 AS BIGINT) AS chunk_id,
        |  CAST(len(list_slice(ws, start + 1, start + 32)) AS BIGINT) AS n_tokens
        |  FROM st),
        |ck AS (SELECT doc_id, chunk_id, n_tokens,
        |  doc_id * 100000 + chunk_id AS chunk_key FROM ch),
        |ce AS (SELECT doc_id, chunk_id, n_tokens, chunk_key,
        |  list_transform(range(0, 8),
        |    i -> CAST((n_tokens * 31 + chunk_key * 17 + i * 7) % 97 AS DOUBLE)) AS v
        |  FROM ck),
        |q AS (SELECT unnest(range(0, 10)) AS query_id),
        |qv AS (SELECT query_id, list_transform(range(0, 8),
        |    i -> CAST((query_id * 13 + i * 5 + 3) % 97 AS DOUBLE)) AS v FROM q),
        |sc AS (SELECT query_id, chunk_key, doc_id, chunk_id, n_tokens,
        |  list_cosine_similarity(qv.v, ce.v) AS cos FROM qv, ce),
        |rk AS (SELECT query_id, doc_id, chunk_id, n_tokens, cos,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, chunk_key ASC) AS rank
        |  FROM sc)
        |SELECT query_id, rank, doc_id, chunk_id, n_tokens, round(cos, 6) AS cos_sim
        |FROM rk WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "t36_fuzzy_decontam_store" -> fuzzyDecontamSql,
    // Decontam REPORT: both channels vs t35's suite + the policy CASE
    // (drop > rewrite > clean) in one chain; the exact channel is
    // t10's >= 2-shared-grams rule, the fuzzy channel t35's whole-doc
    // jaccard; `pr` feeds BOTH (shared distinct-gram counts)
    "llm_decontam_report" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |ev AS (SELECT doc_id + 500000000 AS doc_id,
        |  regexp_split_to_array(trim(CASE WHEN doc_id % 2 = 0
        |    THEN text || ' extra' ELSE text END), '\s+') AS ws
        |  FROM documents WHERE doc_id % 97 = 0),
        |shc AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
        |  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s FROM t),
        |she AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
        |  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s FROM ev),
        |pr AS (SELECT c.doc_id, e.doc_id AS eval_id, count(*) AS shared
        |  FROM shc c JOIN she e ON c.s = e.s GROUP BY 1, 2),
        |ex AS (SELECT doc_id, max(shared) AS max_shared, count(*) AS n_eval_hits
        |  FROM pr WHERE shared >= 2 GROUP BY doc_id),
        |szc AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
        |sze AS (SELECT doc_id, count(*) AS sz FROM she GROUP BY doc_id),
        |jp AS (SELECT pr.doc_id, shared * 1.0 / (sa.sz + sb.sz - shared) AS j
        |  FROM pr JOIN sze sa ON pr.eval_id = sa.doc_id
        |  JOIN szc sb ON pr.doc_id = sb.doc_id
        |  WHERE shared * 1.0 / (sa.sz + sb.sz - shared) >= 0.8),
        |hits AS (SELECT doc_id, round(max(j), 6) AS eval_jaccard FROM jp GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(ex.max_shared, 0) AS max_shared,
        |  coalesce(ex.n_eval_hits, 0) AS n_eval_hits, h.eval_jaccard,
        |  CASE WHEN h.doc_id IS NOT NULL THEN 'drop'
        |       WHEN coalesce(ex.max_shared, 0) >= 2 THEN 'rewrite'
        |       ELSE 'clean' END AS status
        |FROM t LEFT JOIN ex ON t.doc_id = ex.doc_id
        |LEFT JOIN hits h ON t.doc_id = h.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // D25: streamed near-dup ingest — sequential survivor semantics
    // replayed from one exact jaccard pair set: batch 1 (evens) drops
    // vs landed (bi -1) + within-batch smaller-id rule; batch 2 (odds)
    // drops vs landed + batch-1 SURVIVORS + within-batch rule
    "d25_neardup_stream" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |  CASE WHEN doc_id % 31 = 0 THEN -1 ELSE doc_id % 2 END AS bi,
        |  regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
        |  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s FROM t),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |jp AS (SELECT id_a, id_b FROM pr
        |  JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE shared * 1.0 / (sa.sz + sb.sz - shared) >= 0.8),
        |edges AS (SELECT id_a AS s, id_b AS d FROM jp
        |  UNION ALL SELECT id_b, id_a FROM jp),
        |bt AS (SELECT doc_id, bi FROM t),
        |drop0 AS (SELECT DISTINCT e.s AS doc_id FROM edges e
        |  JOIN bt sb ON e.s = sb.doc_id AND sb.bi = 0
        |  JOIN bt xb ON e.d = xb.doc_id
        |  WHERE xb.bi = -1 OR (xb.bi = 0 AND xb.doc_id < e.s)),
        |surv0 AS (SELECT doc_id FROM bt WHERE bi = 0
        |  AND doc_id NOT IN (SELECT doc_id FROM drop0)),
        |drop1 AS (SELECT DISTINCT e.s AS doc_id FROM edges e
        |  JOIN bt sb ON e.s = sb.doc_id AND sb.bi = 1
        |  JOIN bt xb ON e.d = xb.doc_id
        |  WHERE xb.bi = -1
        |    OR (xb.bi = 0 AND xb.doc_id IN (SELECT doc_id FROM surv0))
        |    OR (xb.bi = 1 AND xb.doc_id < e.s)),
        |surv1 AS (SELECT doc_id FROM bt WHERE bi = 1
        |  AND doc_id NOT IN (SELECT doc_id FROM drop1))
        |SELECT doc_id, n_chars FROM t
        |WHERE doc_id IN (SELECT doc_id FROM surv0
        |  UNION ALL SELECT doc_id FROM surv1)
        |ORDER BY doc_id""".stripMargin,
    // ANN15: streamed IVF ingest — after the base install + two
    // appended micro-batches the live index must serve the WHOLE
    // corpus's integer-grid embedding (the ann11 convention)
    "ann15_ivf_stream" ->
      """SELECT doc_id,
        |  CAST(list_sum(list_transform(range(0,8),
        |    i -> (length(text)*31 + doc_id*17 + i*7) % 97)) AS DOUBLE) AS vec_l1,
        |  CAST((length(text)*31 + doc_id*17) % 97 AS DOUBLE) AS v0
        |FROM documents ORDER BY doc_id""".stripMargin,
    // ANN19: the PQ ingest loop — integer-grid embedding, every
    // subspace argmin (CASE order = the engine's first-minimum
    // tie-break), reconstruction norm from the grid's literal norm2
    // constants. The grid values are GENERATED from the same
    // f(j,c,t) = (j·13 + c·7 + t·3) mod 17 the engine installs
    // (Documents.pqGrid), so both sides recompute, neither copies.
    "ann19_pq_stream" -> ann19PqSql,
    // D23: streamed exact-dedup ingest — the keeper rule replayed over
    // (batch index, doc_id) per normalized fingerprint, landed slice's
    // fingerprints excluded (the store install)
    "d23_dedup_stream" ->
      """WITH b AS (SELECT doc_id, n_chars, doc_id % 2 AS bi,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE doc_id % 31 <> 0),
        |landed AS (SELECT DISTINCT
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE doc_id % 31 = 0),
        |r AS (SELECT doc_id, n_chars, fp, ROW_NUMBER() OVER (
        |  PARTITION BY fp ORDER BY bi, doc_id) AS rn FROM b)
        |SELECT doc_id, n_chars FROM r
        |WHERE rn = 1 AND fp NOT IN (SELECT fp FROM landed)
        |ORDER BY doc_id""".stripMargin,
    // D26: the deterministic streaming exact-dedup transform — the
    // whitespace-twin construction replayed, then the keeper rule
    // rn = 1 over (batch ordinal, id) per normalized fingerprint.
    // Cross-batch twins catch a batch-blind global-min-id dedup;
    // negative-id same-batch twins catch an arrival-order
    // representative (the pre-round-15 dropDuplicatesWithinWatermark)
    "d26_exact_dedup_stream" ->
      """WITH aug AS (
        |  SELECT doc_id, text, n_chars,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS bi FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' ', n_chars, 1 FROM documents
        |  WHERE doc_id % 2 <> 0 AND doc_id % 7 = 0
        |  UNION ALL
        |  SELECT -doc_id - 1, ' ' || text, n_chars, 1 FROM documents
        |  WHERE doc_id % 2 = 0 AND doc_id % 11 = 0),
        |r AS (SELECT doc_id, n_chars, ROW_NUMBER() OVER (
        |  PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |  ORDER BY bi, doc_id) AS rn FROM aug)
        |SELECT doc_id, n_chars FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // D27: the streaming corpus-ingest pipeline — keeper rule over the
    // cross-batch-twinned corpus, then the 6-dp quality and repetition
    // gates on the KEEPER's case-folded text, then per-language doc and
    // raw-text token counts in the one emitted event-time window
    "d27_corpus_ingest_stream" ->
      """WITH aug AS (
        |  SELECT doc_id, text, lang,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS bi FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' ', lang, 1 FROM documents
        |  WHERE doc_id % 2 <> 0 AND doc_id % 7 = 0),
        |k AS (SELECT *, ROW_NUMBER() OVER (
        |  PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |  ORDER BY bi, doc_id) AS rn FROM aug),
        |s AS (SELECT lang, text, lower(text) AS lt,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        |  FROM k WHERE rn = 1),
        |g AS (SELECT lang, text FROM s WHERE
        |  round(least(len(ws) / 50.0, 1.0) * 0.5
        |    + least(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in')))
        |        / greatest(len(ws) * 0.05, 1.0), 1.0) * 0.5
        |    - (length(lt) - length(regexp_replace(lt, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |        / greatest(length(lt), 1), 6) >= 0.655
        |  AND round(1.0 - len(list_distinct(ws)) * 1.0 / greatest(len(ws), 1), 6) < 0.515)
        |SELECT '2024-03-01 00:00:00' AS win_start, lang,
        |  count(*) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tok_total
        |FROM g GROUP BY lang ORDER BY lang""".stripMargin,
    // ANN14: ANN-fed hard negatives — exact top-20 over-fetch replayed
    // as a candidate-rank window (unrounded cos, the bruteForceTopK
    // rule), then the label join + cross-label re-rank on the ROUNDED
    // cos_sim (the hardNegativesFromCandidates rule)
    "ann14_hard_negatives_ann" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv, label AS ql FROM e WHERE vec_id % 37 = 0),
        |scored AS (SELECT q_id, ql, e.vec_id AS n_id, e.label AS n_label,
        |  list_cosine_similarity(qv, e.v) AS cos
        |  FROM q, e WHERE e.vec_id <> q_id),
        |cand AS (SELECT q_id, ql, n_id, n_label, round(cos, 6) AS cos_sim,
        |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS crk
        |  FROM scored),
        |neg AS (SELECT q_id, n_id, n_label, cos_sim,
        |  row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id ASC) AS rank
        |  FROM cand WHERE crk <= 20 AND n_label <> ql)
        |SELECT q_id, rank, n_id, n_label, cos_sim
        |FROM neg WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    // R14: length buckets — bit-length bucket, 2^bucket−1 pad
    // ceiling, within-bucket rank div 20; all integer arithmetic
    "r14_length_buckets" ->
      """WITH lb AS (SELECT doc_id, greatest(len(list_filter(
        |    regexp_split_to_array(trim(text), '\s+'), t -> len(t) > 0)), 1) AS n_tok
        |  FROM documents),
        |lk AS (SELECT doc_id, n_tok, CAST(length(bin(n_tok)) AS BIGINT) AS bucket FROM lb),
        |lr AS (SELECT doc_id, n_tok, bucket,
        |  row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rk FROM lk)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, bucket,
        |  CAST(power(2, bucket) AS BIGINT) - 1 AS pad_to,
        |  CAST((rk - 1) // 20 AS BIGINT) AS batch_idx
        |FROM lr ORDER BY doc_id""".stripMargin,
    // Web-ingest composite: t33's extraction chain + d22's URL
    // canonicalization + keep-latest window + t30's entropy replay,
    // all on the one synthesized crawl frame
    "llm_web_pipeline" ->
      """WITH whh AS (SELECT doc_id, doc_id % 97 AS fetch_ts,
        |  '<html><head><title>Doc ' || doc_id || '</title><script type="text/javascript">var x = 1; if (x < 2) { x = 2; }</script><style>.c { color: red; }</style></head><body><!-- note ' || doc_id || ' --><h1>Heading</h1><p>' || text || '</p>'
        |  || CASE WHEN doc_id % 3 = 0 THEN '<p>See &lt;a&gt; &amp;amp; &quot;quotes&quot;&nbsp;here.</p>' ELSE '' END
        |  || CASE WHEN doc_id % 4 = 0 THEN '<a href="http://ex.com/' || doc_id || '">link text</a>' ELSE '' END
        |  || '</body></html>' AS h,
        |  'HTTPS://WWW.Site' || (doc_id % 7) || '.COM:443/Dir' || (doc_id % 50) || '/page'
        |  || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
        |  || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' || (doc_id % 5) ELSE '' END
        |  || CASE WHEN doc_id % 5 = 0 THEN '#sec' || doc_id ELSE '' END AS url
        |  FROM documents),
        |wex AS (SELECT doc_id, fetch_ts, url, trim(regexp_replace(
        |  replace(replace(replace(replace(replace(replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(h, '(?is)<head[^>]*>.*?</head>', ' ', 'g'),
        |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g'),
        |      '<[^>]+>', ' ', 'g'),
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |    '&nbsp;', ' '), '&amp;', '&'),
        |  '\s+', ' ', 'g')) AS xt FROM whh),
        |wc1 AS (SELECT doc_id, fetch_ts, xt,
        |  regexp_replace(regexp_replace(url, '#.*$', ''), '(?i)^https?://', '') AS ns FROM wex),
        |wc2 AS (SELECT doc_id, fetch_ts, xt,
        |  regexp_replace(regexp_replace(lower(regexp_extract(ns, '^([^/?#]+)', 1)),
        |    '^www\.', ''), ':(80|443)$', '') AS host,
        |  regexp_replace(ns, '^[^/?#]+', '') AS pathq FROM wc1),
        |wc3 AS (SELECT doc_id, fetch_ts, xt, host || regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(pathq, '(?i)[?&]utm_[^&#]*', '', 'g'),
        |    '^([^?]*)&', '\1?'), '[?&]$', ''), '^([^?]*)/$', '\1') AS canon_url
        |  FROM wc2),
        |wcr AS (SELECT doc_id, xt, canon_url,
        |  row_number() OVER (PARTITION BY canon_url ORDER BY fetch_ts DESC, doc_id DESC) AS rn,
        |  count(*) OVER (PARTITION BY canon_url) AS n_crawls FROM wc3),
        |wsur AS (SELECT doc_id, canon_url, n_crawls, xt FROM wcr WHERE rn = 1),
        |wch AS (SELECT doc_id, unnest(string_split(xt, '')) AS c FROM wsur),
        |wcc AS (SELECT doc_id, c, count(*) AS n FROM wch GROUP BY doc_id, c),
        |wen AS (SELECT doc_id,
        |  round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 6) AS char_entropy
        |  FROM wcc GROUP BY doc_id)
        |SELECT w.doc_id, canon_url, n_crawls, char_entropy,
        |  CAST(char_entropy >= 2.85 AS INTEGER) AS keep
        |FROM wsur w JOIN wen ON w.doc_id = wen.doc_id
        |ORDER BY w.doc_id""".stripMargin,
    // M15: the release gate — t22's card per snapshot side + m14's PSI
    // chain + the FULL decision rule (hard: vanished group / share
    // collapse past 50% / dup-rate jump past 0.10 / psi ≥ 0.25; soft
    // evidence — appeared group or share moved past 25% — escalates
    // the psi watch band [0.1, 0.25)) recomputed in one WITH. Divides
    // guard with greatest(·, 1) exactly where the engine branches on
    // zero counts, so the arithmetic is identical on both sides.
    "m15_release_gate" ->
      """WITH t AS (SELECT doc_id, source, lang, text,
        |  CASE WHEN doc_id % 3 = 0 THEN 'a' ELSE 'e' END AS side,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |  regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |q AS (SELECT doc_id, source, lang, side, fp,
        |  round(least(len(ws) / 50.0, 1.0) * 0.5
        |    + least(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in')))
        |        / greatest(len(ws) * 0.05, 1.0), 1.0) * 0.5
        |    - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |        / greatest(length(text), 1), 6) AS v
        |  FROM t),
        |d AS (SELECT *, CASE WHEN count(*) OVER (PARTITION BY side, fp) > 1
        |  THEN 1 ELSE 0 END AS dup FROM q),
        |card AS (SELECT source, lang,
        |  CAST(sum(CASE WHEN side = 'e' THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_e,
        |  CAST(sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_a,
        |  CAST(sum(CASE WHEN side = 'e' THEN dup ELSE 0 END) AS BIGINT) AS dup_docs_e,
        |  CAST(sum(CASE WHEN side = 'a' THEN dup ELSE 0 END) AS BIGINT) AS dup_docs_a
        |  FROM d GROUP BY source, lang),
        |expected AS (SELECT v FROM q WHERE side = 'e'),
        |actual AS (SELECT v FROM q WHERE side = 'a'),
        |b AS (SELECT quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs FROM expected),
        |ebuck AS (SELECT CASE WHEN v <= bs[1] THEN 0 WHEN v <= bs[2] THEN 1
        |  WHEN v <= bs[3] THEN 2 WHEN v <= bs[4] THEN 3 WHEN v <= bs[5] THEN 4
        |  WHEN v <= bs[6] THEN 5 WHEN v <= bs[7] THEN 6 WHEN v <= bs[8] THEN 7
        |  WHEN v <= bs[9] THEN 8 ELSE 9 END AS bucket FROM expected, b),
        |abuck AS (SELECT CASE WHEN v <= bs[1] THEN 0 WHEN v <= bs[2] THEN 1
        |  WHEN v <= bs[3] THEN 2 WHEN v <= bs[4] THEN 3 WHEN v <= bs[5] THEN 4
        |  WHEN v <= bs[6] THEN 5 WHEN v <= bs[7] THEN 6 WHEN v <= bs[8] THEN 7
        |  WHEN v <= bs[9] THEN 8 ELSE 9 END AS bucket FROM actual, b),
        |buckets AS (SELECT range AS bucket FROM range(10)),
        |ep AS (SELECT bucket, count(*) / (SELECT count(*) FROM expected) AS p FROM ebuck GROUP BY bucket),
        |ap AS (SELECT bucket, count(*) / (SELECT count(*) FROM actual) AS p FROM abuck GROUP BY bucket),
        |j AS (SELECT buckets.bucket, coalesce(ep.p, 0) AS e, coalesce(ap.p, 0) AS a
        |  FROM buckets LEFT JOIN ep ON buckets.bucket = ep.bucket
        |  LEFT JOIN ap ON buckets.bucket = ap.bucket),
        |c AS (SELECT CASE WHEN e = 0 THEN 0.0001 ELSE e END AS e,
        |             CASE WHEN a = 0 THEN 0.0001 ELSE a END AS a FROM j),
        |psiv AS (SELECT round(sum((a - e) * ln(a / e)), 6) AS psi FROM c),
        |tot AS (SELECT greatest(sum(n_docs_e), 1) AS te,
        |  greatest(sum(n_docs_a), 1) AS ta FROM card),
        |flags AS (SELECT
        |  max(CASE WHEN n_docs_e > 0 AND n_docs_a = 0 THEN 1
        |    WHEN n_docs_e > 0 AND n_docs_a * 1.0 / ta < n_docs_e * 1.0 / te * 0.5 THEN 1
        |    WHEN n_docs_e > 0 AND dup_docs_a * 1.0 / greatest(n_docs_a, 1)
        |      - dup_docs_e * 1.0 / greatest(n_docs_e, 1) > 0.10 THEN 1
        |    ELSE 0 END) AS hard,
        |  max(CASE WHEN n_docs_e = 0 AND n_docs_a > 0 THEN 1
        |    WHEN n_docs_e > 0 AND abs(n_docs_a * 1.0 / ta - n_docs_e * 1.0 / te)
        |      > 0.25 * (n_docs_e * 1.0 / te) THEN 1
        |    ELSE 0 END) AS soft
        |  FROM card, tot),
        |verdict AS (SELECT psi,
        |  CAST(CASE WHEN psi >= 0.25 OR hard = 1 THEN 0
        |    WHEN psi >= 0.1 AND soft = 1 THEN 0 ELSE 1 END AS BIGINT) AS accept
        |  FROM flags, psiv)
        |SELECT source, lang, n_docs_e, n_docs_a, dup_docs_e, dup_docs_a,
        |  psi, accept
        |FROM card, verdict ORDER BY source, lang""".stripMargin,
    // T22: the per-(source, lang) corpus datasheet — quality uses the
    // t12-proven formula + interpolation pair, dup flags the shared
    // fingerprint rule; integer sums CAST (gotcha 19)
    "t22_corpus_card" ->
      """WITH t AS (SELECT doc_id, source, lang, text,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS ntok,
        |  regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |q AS (SELECT doc_id, source, lang, fp, ntok,
        |  round(least(len(ws) / 50.0, 1.0) * 0.5
        |    + least(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in')))
        |        / greatest(len(ws) * 0.05, 1.0), 1.0) * 0.5
        |    - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |        / greatest(length(text), 1), 6) AS q
        |  FROM t),
        |d AS (SELECT *, CASE WHEN count(*) OVER (PARTITION BY fp) > 1
        |  THEN 1 ELSE 0 END AS dup FROM q)
        |SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS tok_total,
        |  CAST(sum(CAST(q AS DECIMAL(16,6))) AS DOUBLE) AS q_sum,
        |  min(q) AS q_min, max(q) AS q_max,
        |  CAST(sum(dup) AS BIGINT) AS dup_docs
        |FROM d GROUP BY source, lang ORDER BY source, lang""".stripMargin,
    // the gopher→DSIR composite: both chains' CTEs in one WITH, the
    // DSIR pool being the gopher-kept docs (filter before selection)
    "llm_select_pipeline" ->
      s"""WITH ${gopherCtes("documents")},
        |kept AS (SELECT d.* FROM documents d
        |  JOIN (SELECT doc_id FROM f WHERE $gopherKeepRules) k USING (doc_id)),
        |${dsirCtes("kept")}
        |$dsirSelect
        |LIMIT 50""".stripMargin,
    // M13: the classifier gate's pinned held-out grid — ids and labels
    // are pure id arithmetic, flags must all be 1 (r1_sample pattern)
    "m13_quality_filter" ->
      """WITH h AS (
        |  SELECT doc_id, 1 AS label FROM documents WHERE doc_id % 2 <> 0
        |  UNION ALL
        |  SELECT 1000000 + i AS doc_id, 0 AS label FROM range(0, 100) r(i)
        |  WHERE (1000000 + i) % 2 <> 0)
        |SELECT doc_id, label, 1 AS p_ok, 1 AS sep_ok FROM h
        |ORDER BY doc_id""".stripMargin,
    "a_unpivot" ->
      """WITH a AS (SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty,
        |    round(sum(l_extendedprice), 4) AS sum_price,
        |    round(avg(l_discount), 6) AS avg_disc
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, metric, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
        |  UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
        |  UNION ALL SELECT l_returnflag, 'avg_disc', avg_disc FROM a)
        |ORDER BY l_returnflag, metric""".stripMargin,
    "d10_incremental_neardup" -> crossSetJaccardSql,
    // d11 is the SAME semantics through the at-rest store —
    // store-equals-live is the contract the shared oracle enforces
    "d11_neardup_store" -> crossSetJaccardSql,
    // J7: salting is shuffle topology only — the oracle is the PLAIN
    // join + aggregate the salted plan must be row-identical to.
    "j7_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // S-compact: compaction is a file-layout rewrite only — the oracle
    // recomputes the aggregate from the ORIGINAL table.
    "s_compact_roundtrip" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "s_zorder_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
        |  CAST(sum(l_partkey) AS BIGINT) AS sum_pk,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "dq_profile" ->
      """SELECT * FROM (
        |  SELECT 'doc_id' AS col_name, count(*) - count(doc_id) AS n_null,
        |    count(DISTINCT doc_id) AS n_distinct,
        |    CAST(min(doc_id) AS VARCHAR) AS min_val,
        |    CAST(max(doc_id) AS VARCHAR) AS max_val FROM documents
        |  UNION ALL SELECT 'lang', count(*) - count(lang),
        |    count(DISTINCT lang), CAST(min(lang) AS VARCHAR),
        |    CAST(max(lang) AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'source', count(*) - count(source),
        |    count(DISTINCT source), CAST(min(source) AS VARCHAR),
        |    CAST(max(source) AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'n_chars', count(*) - count(n_chars),
        |    count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR),
        |    CAST(max(n_chars) AS VARCHAR) FROM documents)
        |ORDER BY col_name""".stripMargin,
    "j8_full_outer" ->
      """WITH c AS (SELECT c_custkey FROM customer WHERE c_custkey <= 1000),
        |o AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
        |SELECT side, count(*) AS n FROM (
        |  SELECT CASE WHEN c.c_custkey IS NULL THEN 'order_only'
        |    WHEN o.o_custkey IS NULL THEN 'customer_only'
        |    ELSE 'both' END AS side
        |  FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey)
        |GROUP BY side ORDER BY side""".stripMargin,
    "a_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 4) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    // W6: RANGE (value-bounded) frame on epoch seconds; floor() on the
    // oracle side per gotcha 6 (unix_timestamp truncates to seconds).
    "w6_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
        |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 4) AS trailing_30d
        |FROM orders WHERE o_custkey <= 200
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // LLM shard pipeline: the chain recomputed from scratch — epoch
    // unnest, md5 shard/rank arithmetic (the r7 rule over the composite
    // row key), then the per-shard summary.
    "llm_shard_pipeline" ->
      """WITH m AS (SELECT doc_id, text,
        |    unnest(range(1, CASE WHEN source IN ('src0','src1')
        |      THEN 2 ELSE 1 END + 1)) AS epoch
        |  FROM documents),
        |k AS (SELECT doc_id, text, doc_id * 10 + epoch AS row_key FROM m),
        |sh AS (SELECT doc_id, text,
        |  CAST((strpos('0123456789abcdef',
        |    substr(md5(CAST(row_key AS VARCHAR)), 1, 1)) - 1) % 8 AS BIGINT) AS shard,
        |  CAST(ROW_NUMBER() OVER (
        |    PARTITION BY (strpos('0123456789abcdef',
        |      substr(md5(CAST(row_key AS VARCHAR)), 1, 1)) - 1) % 8
        |    ORDER BY substr(md5(CAST(row_key AS VARCHAR)), 2, 31), row_key)
        |    AS BIGINT) AS pos
        |  FROM k)
        |SELECT shard, count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tok_total,
        |  max(pos) AS max_pos
        |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,
    // T13: hopping window = the t1 epoch bucketing crossed with the
    // two window offsets (len/slide = 2 windows per event).
    "t13_hopping_window" ->
      """SELECT strftime(make_timestamp(
        |    (CAST(floor(epoch(ts) / 604800) * 604800 AS BIGINT)
        |      - o.o * 604800) * 1000000),
        |    '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) AS o(o)
        |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    // R7: shard + position are pure md5 string arithmetic — recomputed
    // verbatim (strpos instead of a hex-to-int builtin DuckDB lacks).
    "r7_shuffle_shard" ->
      """SELECT doc_id, shard, pos FROM (
        |  SELECT doc_id,
        |    CAST((strpos('0123456789abcdef',
        |      substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 8 AS BIGINT) AS shard,
        |    CAST(ROW_NUMBER() OVER (
        |      PARTITION BY (strpos('0123456789abcdef',
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 8
        |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 2, 31), doc_id)
        |      AS BIGINT) AS pos
        |  FROM documents)
        |ORDER BY shard, pos""".stripMargin,
    // T15: span-level decontamination recomputed from scratch — eval
    // 5-gram set, corpus positional grams, semi-join → covered
    // positions, token anti join, ordered reassembly (d13's pattern
    // with the eval set replacing the first-occurrence rule)
    "t15_decontam_rewrite" -> decontamRewriteSql,
    // t23 is the SAME semantics through the at-rest eval-gram store
    // (Bloom sidecar + exact verify) — store-equals-live is the
    // contract the shared oracle enforces, like d11/d20
    "t23_decontam_store" -> decontamRewriteSql,
    // the streaming ingest loop publishes what the direct rewrite
    // computes (streamed ≡ direct, now on the hard signal)
    "t29_decontam_stream" -> decontamRewriteSql,
    // T19: the size-ROUTED rewrite (Bloom-flag docs, rewrite only the
    // flagged sliver) is bit-identical to t15 BY CONTRACT — sharing
    // t15's oracle verbatim IS the gate on that contract
    "t19_decontam_auto" -> decontamRewriteSql,
    // T50: the store FOLDED (generations + bloom sidecars + stats into
    // batch 0) must still serve t15's exact answers over the suite
    // union — a fold losing a gram row or bloom coverage hash-fails
    "t50_decontam_compacted" -> decontamRewriteSql,
    "d16_cluster_best" -> clusterBestSql,
    // D17: min id per canonical form, the form pinned via its md5
    "d17_canonical_dedup" ->
      """WITH k AS (SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents)
        |SELECT min(doc_id) AS doc_id, fp FROM k GROUP BY fp
        |ORDER BY doc_id""".stripMargin,
    // LLM curation composite: canonical-dedup keepers → t15's
    // span-removal chain over the survivors → t16's stratified cut
    // over the CLEANED text → per-lang census; every stage's oracle
    // block is individually proven (d17 / t15 / t16 / t2)
    "llm_curation_pipeline" ->
      """WITH t AS (SELECT doc_id, lang, text, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |corp AS (SELECT doc_id, lang, text, ws FROM t WHERE doc_id % 97 <> 0),
        |keep AS (SELECT min(doc_id) AS doc_id FROM (
        |  SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM corp) GROUP BY fp),
        |surv AS (SELECT corp.* FROM corp SEMI JOIN keep ON corp.doc_id = keep.doc_id),
        |eg AS (SELECT DISTINCT u AS s FROM (
        |  SELECT unnest(list_transform(range(1, len(ws) - 3),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS u
        |  FROM t WHERE doc_id % 97 = 0 AND len(ws) >= 5)),
        |g AS (SELECT doc_id, u.p AS p, u.s AS s FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3),
        |    i -> {'p': i, 's': ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]})) AS u
        |  FROM surv WHERE len(ws) >= 5)),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(p, p + 5)) AS i
        |  FROM g SEMI JOIN eg ON g.s = eg.s),
        |tok AS (SELECT doc_id, u.i AS i, u.w AS w FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1), i -> {'i': i, 'w': ws[i]})) AS u FROM surv)),
        |kept AS (SELECT tok.doc_id, tok.i, tok.w FROM tok ANTI JOIN cov
        |  ON tok.doc_id = cov.doc_id AND tok.i = cov.i),
        |outp AS (SELECT doc_id, count(*) AS n_kept,
        |  string_agg(w, ' ' ORDER BY i) AS clean_text FROM kept GROUP BY doc_id),
        |clean AS (SELECT surv.doc_id, surv.lang,
        |  CAST(coalesce(outp.n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(outp.clean_text, '') AS ctext
        |  FROM surv LEFT JOIN outp ON surv.doc_id = outp.doc_id),
        |q AS (SELECT doc_id, lang, n_kept,
        |  round(least(len(ws2) / 50.0, 1.0) * 0.5
        |    + least(len(list_filter(ws2, w -> w IN ('the','a','of','and','is','to','in')))
        |        / greatest(len(ws2) * 0.05, 1.0), 1.0) * 0.5
        |    - (length(ctext) - length(regexp_replace(ctext, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |        / greatest(length(ctext), 1), 6) AS quality
        |  FROM (SELECT *, regexp_split_to_array(trim(ctext), '\s+') AS ws2 FROM clean)),
        |thr AS (SELECT lang, quantile_cont(quality, 0.25) AS thr FROM q GROUP BY lang),
        |fin AS (SELECT q.* FROM q JOIN thr USING (lang) WHERE q.quality >= thr.thr)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_kept) AS BIGINT) AS tok_total,
        |  round(sum(quality), 4) AS quality_sum
        |FROM fin GROUP BY lang ORDER BY lang""".stripMargin,
    // T18: d13's removal chain with first-occurrence keyed PER DOC
    // (ROW_NUMBER partitioned by (doc, gram) instead of gram alone)
    "t18_self_dedup_rewrite" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |g AS (SELECT doc_id, u.p AS p, u.s AS s FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3),
        |    i -> {'p': i, 's': ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]})) AS u
        |  FROM t WHERE len(ws) >= 5)),
        |occ AS (SELECT doc_id, p, ROW_NUMBER() OVER (
        |  PARTITION BY doc_id, s ORDER BY p) AS rn FROM g),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(p, p + 5)) AS i FROM occ WHERE rn > 1),
        |tok AS (SELECT doc_id, u.i AS i, u.w AS w FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1), i -> {'i': i, 'w': ws[i]})) AS u FROM t)),
        |kept AS (SELECT tok.doc_id, tok.i, tok.w FROM tok ANTI JOIN cov
        |  ON tok.doc_id = cov.doc_id AND tok.i = cov.i),
        |outp AS (SELECT doc_id, count(*) AS n_kept,
        |  string_agg(w, ' ' ORDER BY i) AS clean_text FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(ws) AS BIGINT) AS n_toks,
        |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(clean_text, '') AS clean_text
        |FROM t LEFT JOIN outp ON t.doc_id = outp.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // S-PUBLISH: the manifest commit is a file-layout protocol only —
    // the oracle recomputes from the ORIGINAL table, so an orphan batch
    // leaking into the read (or a committed batch going missing) fails
    "s_publish_roundtrip" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // S-PUBLISH-COMPACT: compaction under the manifest is a pure
    // file-layout flip — the oracle is the clean table, so a leaked
    // orphan, lost batch, or double-counted row across the flip fails
    "s_publish_compact" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // S-PUBLISH-ZORDER: clustering is a layout flip only — same clean-
    // table oracle as the publish/compact family
    "s_publish_zorder" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // U-SCD2: the change-suppressed interval build recomputed from
    // scratch (lag change filter → lead valid_to → census)
    "u_scd2" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS version FROM orders),
        |v2 AS (SELECT o_orderkey, 'U' AS o_orderstatus,
        |    CAST(round(CAST(o_totalprice AS DECIMAL(15,2)) * 1.1, 2) AS DOUBLE) AS o_totalprice,
        |    2 AS version FROM orders WHERE o_orderkey % 7 = 0),
        |v3 AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 28 = 0 THEN 'X' ELSE 'U' END AS o_orderstatus,
        |    CAST(round(CAST(o_totalprice AS DECIMAL(15,2)) * 1.1, 2) AS DOUBLE) AS o_totalprice,
        |    3 AS version FROM orders WHERE o_orderkey % 14 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3),
        |chg AS (SELECT o_orderkey, o_orderstatus, o_totalprice, version FROM (
        |  SELECT *, lag(o_orderstatus) OVER w AS _ps, lag(o_totalprice) OVER w AS _pp
        |  FROM u WINDOW w AS (PARTITION BY o_orderkey ORDER BY version))
        |  WHERE _ps IS NULL OR _ps <> o_orderstatus OR _pp <> o_totalprice),
        |hist AS (SELECT version, o_orderstatus, o_totalprice,
        |    lead(version) OVER (PARTITION BY o_orderkey ORDER BY version) AS valid_to
        |  FROM chg)
        |SELECT version, o_orderstatus,
        |  CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INT) AS is_current,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 4) AS sum_price
        |FROM hist GROUP BY 1, 2, 3
        |ORDER BY version, o_orderstatus, is_current""".stripMargin,
    // ANN7: the drift monitor's stats row recounted by DuckDB straight
    // from the at-rest index parquet (cell = hive partition column) —
    // dq_skew_stats' formula over the index instead of a table column
    "ann7_cell_stats" -> ivfCellStatsSql,
    // DQ-skew: exact key-count distribution stats; sums cast (gotcha 19)
    "dq_skew_stats" ->
      """WITH c AS (SELECT l_suppkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
        |top AS (SELECT CAST(sum(n) AS BIGINT) AS top_n
        |  FROM (SELECT n FROM c ORDER BY n DESC, k LIMIT 10)),
        |agg AS (SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
        |  max(n) AS max_n, round(avg(n), 4) AS mean_n,
        |  round(max(n) / avg(n), 4) AS skew_ratio FROM c)
        |SELECT n_keys, n_rows, max_n, mean_n, skew_ratio,
        |  round(top_n * 1.0 / n_rows, 6) AS top_share
        |FROM agg, top""".stripMargin,
    // ANN16: filtered vector search under the nProbe=nCells exactness
    // convention — the oracle is ann1's brute force restricted to the
    // lang='en' id set (the IN-subquery is the semi-join twin of the
    // engine's cell-side pre-filter)
    "ann16_filtered_ann" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
        |c AS (SELECT vec_id, v FROM e
        |  WHERE vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')),
        |scored AS (SELECT q_id, c.vec_id AS n_id, list_cosine_similarity(qv, c.v) AS cos
        |  FROM q, c WHERE c.vec_id <> q_id),
        |r AS (SELECT q_id, n_id, cos, ROW_NUMBER() OVER (
        |  PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank FROM scored)
        |SELECT q_id, rank, n_id, round(cos, 6) AS cos_sim FROM r
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    // ANN17: k-NN join at nProbe=nCells ⇒ exact all-pairs — the oracle
    // is the n² self-join top-3 on the capped fixture
    "ann17_knn_join" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 120),
        |scored AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
        |  list_cosine_similarity(a.v, b.v) AS cos
        |  FROM e a, e b WHERE a.vec_id <> b.vec_id),
        |r AS (SELECT q_id, n_id, cos, ROW_NUMBER() OVER (
        |  PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank FROM scored)
        |SELECT q_id, rank, n_id, round(cos, 6) AS cos_sim FROM r
        |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    // T43: the chat render is deterministic string assembly — template,
    // turn order, offsets, and prompt fingerprint all recomputed
    "t43_chat_render" ->
      """WITH b AS (SELECT doc_id, doc_id % 40 AS conv_id,
        |  substring(text, 1, 120) AS t FROM documents),
        |r AS (SELECT conv_id, doc_id,
        |  CASE WHEN (row_number() OVER (PARTITION BY conv_id ORDER BY doc_id)) % 2 = 1
        |       THEN 'user' ELSE 'assistant' END AS role, t FROM b),
        |t AS (SELECT conv_id, doc_id,
        |  '<|' || role || '|>' || t || '<|end|>' AS rt FROM r),
        |g AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
        |  string_agg(rt, '' ORDER BY doc_id) AS text,
        |  arg_max(rt, doc_id) AS last_rt FROM t GROUP BY conv_id)
        |SELECT conv_id, n_turns, text,
        |  CAST(length(text) - length(last_rt) AS BIGINT) AS resp_start,
        |  CAST(length(last_rt) AS BIGINT) AS resp_len,
        |  md5(substring(text, 1, length(text) - length(last_rt))) AS prompt_fp
        |FROM g ORDER BY conv_id""".stripMargin,
    // LLM SFT composite: fixture construction (base convs + prompt-twin
    // convs with a different final response), render, min-conv keeper
    // per prompt_fp, t8's shard-local pack — one WITH-chain, one hash
    "llm_sft_pipeline" ->
      """WITH b AS (SELECT doc_id, doc_id % 20 AS conv_id,
        |  substring(text, 1, 100) AS t FROM documents WHERE doc_id < 400),
        |rn AS (SELECT conv_id, doc_id, t,
        |  row_number() OVER (PARTITION BY conv_id ORDER BY doc_id) AS rn,
        |  count(*) OVER (PARTITION BY conv_id) AS n FROM b),
        |roled AS (SELECT conv_id, doc_id AS ord,
        |  CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
        |  t, rn, n FROM rn),
        |base AS (SELECT conv_id, ord, role, t FROM roled),
        |twin AS (SELECT conv_id + 1000 AS conv_id, ord, role, t
        |  FROM roled WHERE conv_id < 10 AND rn < n),
        |synth AS (SELECT conv_id + 1000 AS conv_id,
        |  CAST(100000000 AS BIGINT) AS ord, 'assistant' AS role,
        |  'ALT ' || CAST(conv_id AS VARCHAR) AS t
        |  FROM (SELECT DISTINCT conv_id FROM roled WHERE conv_id < 10)),
        |turns AS (SELECT * FROM base UNION ALL SELECT * FROM twin
        |  UNION ALL SELECT * FROM synth),
        |rend AS (SELECT conv_id, ord,
        |  '<|' || role || '|>' || t || '<|end|>' AS rt FROM turns),
        |g AS (SELECT conv_id, string_agg(rt, '' ORDER BY ord) AS text,
        |  arg_max(rt, ord) AS last_rt FROM rend GROUP BY conv_id),
        |rfp AS (SELECT conv_id, text,
        |  CAST(length(text) - length(last_rt) AS BIGINT) AS resp_start,
        |  md5(substring(text, 1, length(text) - length(last_rt))) AS prompt_fp
        |  FROM g),
        |keep AS (SELECT prompt_fp, min(conv_id) AS conv_id
        |  FROM rfp GROUP BY prompt_fp),
        |surv AS (SELECT rfp.* FROM rfp JOIN keep USING (prompt_fp, conv_id)),
        |tok AS (SELECT conv_id AS id, conv_id % 4 AS shard,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |  prompt_fp, resp_start FROM surv),
        |c AS (SELECT id, shard, n_tokens, prompt_fp, resp_start,
        |  sum(n_tokens) OVER (PARTITION BY shard ORDER BY id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM tok)
        |SELECT id, shard, n_tokens,
        |  CAST(floor((cum - n_tokens) / 256.0) AS BIGINT) AS chunk_id,
        |  prompt_fp, resp_start
        |FROM c ORDER BY id""".stripMargin,
    // ANN18: medoid assignment is pure arithmetic — argmax cosine over
    // the 8 seed vectors, ties to the smaller seed id
    "ann18_medoid_assign" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id AS cell, v AS sv FROM e WHERE vec_id < 8),
        |x AS (SELECT e.vec_id, s.cell,
        |  list_cosine_similarity(e.v, s.sv) AS cs FROM e, s),
        |r AS (SELECT vec_id, cell, cs, ROW_NUMBER() OVER (
        |  PARTITION BY vec_id ORDER BY cs DESC, cell ASC) AS rk FROM x)
        |SELECT vec_id, cell, round(cs, 6) AS cell_sim FROM r
        |WHERE rk = 1 ORDER BY vec_id""".stripMargin,
    // Diversity composite: ann18's assignment + r4's md5 quota draw
    // keyed on the CELL — both stages replayed, one hash
    "llm_diversity_sample" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id AS cell, v AS sv FROM e WHERE vec_id < 8),
        |x AS (SELECT e.vec_id, s.cell,
        |  list_cosine_similarity(e.v, s.sv) AS cs FROM e, s),
        |r AS (SELECT vec_id, cell, cs, ROW_NUMBER() OVER (
        |  PARTITION BY vec_id ORDER BY cs DESC, cell ASC) AS rk FROM x),
        |a AS (SELECT vec_id, cell, round(cs, 6) AS cell_sim FROM r WHERE rk = 1),
        |q AS (SELECT vec_id, cell, cell_sim, ROW_NUMBER() OVER (
        |  PARTITION BY cell ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS qrk
        |  FROM a)
        |SELECT vec_id, cell, cell_sim FROM q WHERE qrk <= 12
        |ORDER BY vec_id""".stripMargin,
    // T44: span corruption replayed end-to-end — t40's u24 hex-digit
    // noise per segment, integer segment bounds, DuckDB's INCLUSIVE
    // list_slice(begin, end) mapped onto Spark's (start, length)
    "t44_span_corrupt" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
        |  FROM documents),
        |b AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS L FROM t),
        |u AS (SELECT doc_id, tk, L,
        |  list_sum(list_transform(range(6), i ->
        |    (strpos('0123456789abcdef', substring(
        |       md5(CAST(doc_id AS VARCHAR) || ':s0'),
        |       CAST(i + 1 AS INT), 1)) - 1)
        |    * CAST(16 ** (5 - i) AS BIGINT))) AS v0,
        |  list_sum(list_transform(range(6), i ->
        |    (strpos('0123456789abcdef', substring(
        |       md5(CAST(doc_id AS VARCHAR) || ':s1'),
        |       CAST(i + 1 AS INT), 1)) - 1)
        |    * CAST(16 ** (5 - i) AS BIGINT))) AS v1,
        |  list_sum(list_transform(range(6), i ->
        |    (strpos('0123456789abcdef', substring(
        |       md5(CAST(doc_id AS VARCHAR) || ':s2'),
        |       CAST(i + 1 AS INT), 1)) - 1)
        |    * CAST(16 ** (5 - i) AS BIGINT))) AS v2
        |  FROM b),
        |g AS (SELECT doc_id, tk, L,
        |  CAST(floor(L * 0 / 3.0) AS BIGINT) AS ss0,
        |  CAST(floor(L * 1 / 3.0) AS BIGINT) AS se0,
        |  CAST(floor(L * 1 / 3.0) AS BIGINT) AS ss1,
        |  CAST(floor(L * 2 / 3.0) AS BIGINT) AS se1,
        |  CAST(floor(L * 2 / 3.0) AS BIGINT) AS ss2,
        |  CAST(floor(L * 3 / 3.0) AS BIGINT) AS se2,
        |  v0, v1, v2 FROM u),
        |sp AS (SELECT doc_id, tk, L, ss0, se0, ss1, se1, ss2, se2,
        |  se0 - ss0 > 2 AS c0, se1 - ss1 > 2 AS c1, se2 - ss2 > 2 AS c2,
        |  ss0 + v0 % greatest(se0 - ss0 - 1, 1) AS p0,
        |  ss1 + v1 % greatest(se1 - ss1 - 1, 1) AS p1,
        |  ss2 + v2 % greatest(se2 - ss2 - 1, 1) AS p2
        |  FROM g),
        |o AS (SELECT doc_id, L,
        |  (CASE WHEN c0 THEN 1 ELSE 0 END + CASE WHEN c1 THEN 1 ELSE 0 END
        |   + CASE WHEN c2 THEN 1 ELSE 0 END) AS n_spans,
        |  (CASE WHEN c0 THEN list_slice(tk, ss0 + 1, p0) || ['<extra_id_0>']
        |      || list_slice(tk, p0 + 3, se0)
        |    ELSE list_slice(tk, ss0 + 1, se0) END)
        |  || (CASE WHEN c1 THEN list_slice(tk, ss1 + 1, p1) || ['<extra_id_1>']
        |      || list_slice(tk, p1 + 3, se1)
        |    ELSE list_slice(tk, ss1 + 1, se1) END)
        |  || (CASE WHEN c2 THEN list_slice(tk, ss2 + 1, p2) || ['<extra_id_2>']
        |      || list_slice(tk, p2 + 3, se2)
        |    ELSE list_slice(tk, ss2 + 1, se2) END) AS inp,
        |  (CASE WHEN c0 THEN ['<extra_id_0>'] || list_slice(tk, p0 + 1, p0 + 2)
        |    ELSE CAST([] AS VARCHAR[]) END)
        |  || (CASE WHEN c1 THEN ['<extra_id_1>'] || list_slice(tk, p1 + 1, p1 + 2)
        |    ELSE CAST([] AS VARCHAR[]) END)
        |  || (CASE WHEN c2 THEN ['<extra_id_2>'] || list_slice(tk, p2 + 1, p2 + 2)
        |    ELSE CAST([] AS VARCHAR[]) END)
        |  || ['<extra_id_3>'] AS tgt
        |  FROM sp)
        |SELECT doc_id, L AS n_tokens, CAST(n_spans AS BIGINT) AS n_spans,
        |  array_to_string(inp, ' ') AS input_text,
        |  array_to_string(tgt, ' ') AS target_text
        |FROM o ORDER BY doc_id""".stripMargin,
    // M17: IR metrics recomputed end to end — ann1's exact top-5 as the
    // ranked run, same-label pairs as qrels, recall/MRR/nDCG per query
    "m17_retrieval_metrics" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv, label AS ql FROM e
        |  WHERE vec_id < 20),
        |sc AS (SELECT q_id, e.vec_id AS n_id,
        |  list_cosine_similarity(qv, e.v) AS cos
        |  FROM q, e WHERE e.vec_id <> q_id),
        |res AS (SELECT q_id, n_id, rank FROM (
        |  SELECT q_id, n_id, cos, ROW_NUMBER() OVER (
        |    PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank FROM sc)
        |  WHERE rank <= 5),
        |rel AS (SELECT q.q_id, e.vec_id AS n_id FROM q
        |  JOIN e ON e.label = q.ql AND e.vec_id <> q.q_id),
        |nr AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_rel FROM rel
        |  GROUP BY q_id),
        |h AS (SELECT res.q_id, res.rank,
        |  CASE WHEN rel.n_id IS NOT NULL THEN 1 ELSE 0 END AS hit
        |  FROM res LEFT JOIN rel
        |    ON res.q_id = rel.q_id AND res.n_id = rel.n_id),
        |pq AS (SELECT q_id, CAST(sum(hit) AS BIGINT) AS hits,
        |  coalesce(max(CASE WHEN hit = 1 THEN 1.0 / rank END), 0.0) AS mrr_raw,
        |  sum(CASE WHEN hit = 1 THEN 1.0 / log2(rank + 1) ELSE 0.0 END) AS dcg
        |  FROM h GROUP BY q_id),
        |j AS (SELECT pq.q_id, coalesce(nr.n_rel, 0) AS n_rel, hits, mrr_raw, dcg,
        |  list_sum(list_transform(range(1,
        |    CAST(greatest(least(coalesce(nr.n_rel, 0), 5), 1) AS BIGINT) + 1),
        |    i -> 1.0 / log2(i + 1))) AS idcg
        |  FROM pq LEFT JOIN nr USING (q_id))
        |SELECT q_id, n_rel, hits,
        |  round(CASE WHEN n_rel > 0 THEN hits * 1.0 / n_rel ELSE 0.0 END, 6)
        |    AS recall_at_k,
        |  round(mrr_raw, 6) AS mrr,
        |  round(CASE WHEN n_rel > 0 THEN dcg / idcg ELSE 0.0 END, 6)
        |    AS ndcg_at_k
        |FROM j ORDER BY q_id""".stripMargin,
    // DPO pairs: the llm_sft twin construction + render, then the
    // (chosen, rejected) election by response length — chosen ties to
    // the smaller conv, rejected to the larger, margins exact
    "llm_dpo_pairs" ->
      """WITH b AS (SELECT doc_id, doc_id % 20 AS conv_id,
        |  substring(text, 1, 100) AS t FROM documents WHERE doc_id < 400),
        |rn AS (SELECT conv_id, doc_id, t,
        |  row_number() OVER (PARTITION BY conv_id ORDER BY doc_id) AS rn,
        |  count(*) OVER (PARTITION BY conv_id) AS n FROM b),
        |roled AS (SELECT conv_id, doc_id AS ord,
        |  CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
        |  t, rn, n FROM rn),
        |base AS (SELECT conv_id, ord, role, t FROM roled),
        |twin AS (SELECT conv_id + 1000 AS conv_id, ord, role, t
        |  FROM roled WHERE conv_id < 10 AND rn < n),
        |synth AS (SELECT conv_id + 1000 AS conv_id,
        |  CAST(100000000 AS BIGINT) AS ord, 'assistant' AS role,
        |  'ALT ' || CAST(conv_id AS VARCHAR) AS t
        |  FROM (SELECT DISTINCT conv_id FROM roled WHERE conv_id < 10)),
        |turns AS (SELECT * FROM base UNION ALL SELECT * FROM twin
        |  UNION ALL SELECT * FROM synth),
        |rend AS (SELECT conv_id, ord,
        |  '<|' || role || '|>' || t || '<|end|>' AS rt FROM turns),
        |g AS (SELECT conv_id, string_agg(rt, '' ORDER BY ord) AS text,
        |  arg_max(rt, ord) AS last_rt FROM rend GROUP BY conv_id),
        |cand AS (SELECT conv_id AS c,
        |  md5(substring(text, 1, length(text) - length(last_rt))) AS prompt_fp,
        |  CAST(length(last_rt) AS DOUBLE) AS s, last_rt AS resp FROM g),
        |w1 AS (SELECT prompt_fp, c, s, resp,
        |  row_number() OVER (PARTITION BY prompt_fp
        |    ORDER BY s DESC, c ASC) AS rch,
        |  row_number() OVER (PARTITION BY prompt_fp
        |    ORDER BY s ASC, c DESC) AS rrj,
        |  count(*) OVER (PARTITION BY prompt_fp) AS n FROM cand),
        |ch AS (SELECT prompt_fp, CAST(n AS BIGINT) AS n_candidates,
        |  c AS chosen_conv, resp AS chosen_response, s AS chs
        |  FROM w1 WHERE rch = 1),
        |rj AS (SELECT prompt_fp, c AS rejected_conv,
        |  resp AS rejected_response, s AS rjs FROM w1 WHERE rrj = 1)
        |SELECT ch.prompt_fp, n_candidates, chosen_conv, rejected_conv,
        |  chosen_response, rejected_response, round(chs - rjs, 6) AS margin
        |FROM ch JOIN rj USING (prompt_fp)
        |WHERE n_candidates >= 2 ORDER BY prompt_fp""".stripMargin,
    // T45: the streaming SFT dedup — llm_sft's render chain (base +
    // twins + the fresh-prompt v2 duplicate pairs), then d26's keeper
    // rule on the PROMPT fingerprint: first batch wins, min conv
    // within the batch
    "t45_sft_dedup_stream" ->
      """WITH b AS (SELECT doc_id, doc_id % 20 AS conv_id,
        |  substring(text, 1, 100) AS t FROM documents WHERE doc_id < 400),
        |rn AS (SELECT conv_id, doc_id, t,
        |  row_number() OVER (PARTITION BY conv_id ORDER BY doc_id) AS rn,
        |  count(*) OVER (PARTITION BY conv_id) AS n FROM b),
        |roled AS (SELECT conv_id, doc_id AS ord,
        |  CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
        |  t, rn, n FROM rn),
        |base AS (SELECT conv_id, ord, role, t FROM roled),
        |twin AS (SELECT conv_id + 1000 AS conv_id, ord, role, t
        |  FROM roled WHERE conv_id < 10 AND rn < n),
        |synth AS (SELECT conv_id + 1000 AS conv_id,
        |  CAST(100000000 AS BIGINT) AS ord, 'assistant' AS role,
        |  'ALT ' || CAST(conv_id AS VARCHAR) AS t
        |  FROM (SELECT DISTINCT conv_id FROM roled WHERE conv_id < 10)),
        |turns AS (SELECT * FROM base UNION ALL SELECT * FROM twin
        |  UNION ALL SELECT * FROM synth),
        |rend AS (SELECT conv_id, ord,
        |  '<|' || role || '|>' || t || '<|end|>' AS rt FROM turns),
        |g AS (SELECT conv_id, string_agg(rt, '' ORDER BY ord) AS text,
        |  arg_max(rt, ord) AS last_rt FROM rend GROUP BY conv_id),
        |r0 AS (SELECT conv_id,
        |  md5(substring(text, 1, length(text) - length(last_rt))) AS prompt_fp,
        |  CAST(length(last_rt) AS BIGINT) AS resp_len FROM g),
        |rend2 AS (SELECT conv_id, ord,
        |  '<|' || role || '|>v2 ' || t || '<|end|>' AS rt FROM turns
        |  WHERE conv_id BETWEEN 10 AND 14),
        |g2 AS (SELECT conv_id, string_agg(rt, '' ORDER BY ord) AS text,
        |  arg_max(rt, ord) AS last_rt FROM rend2 GROUP BY conv_id),
        |r2 AS (SELECT conv_id,
        |  md5(substring(text, 1, length(text) - length(last_rt))) AS prompt_fp,
        |  CAST(length(last_rt) AS BIGINT) AS resp_len FROM g2),
        |aug AS (
        |  SELECT conv_id, prompt_fp, resp_len,
        |    CASE WHEN conv_id < 1000 THEN 1 ELSE 2 END AS bi FROM r0
        |  UNION ALL SELECT conv_id + 3000, prompt_fp, resp_len, 2 FROM r2
        |  UNION ALL SELECT conv_id + 4000, prompt_fp, resp_len, 2 FROM r2),
        |k AS (SELECT conv_id, prompt_fp, resp_len, ROW_NUMBER() OVER (
        |  PARTITION BY prompt_fp ORDER BY bi, conv_id) AS krn FROM aug)
        |SELECT conv_id, prompt_fp, resp_len FROM k WHERE krn = 1
        |ORDER BY conv_id""".stripMargin,
    // Chat-from-logs: s_sessionize's session chain + t43's render —
    // sessions become conversations, events become turns keyed by
    // event_id, the full render + offsets recomputed
    "llm_chat_from_logs" ->
      """WITH e AS (SELECT event_id, ts, user_id, event_type FROM events),
        |l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |  AS prev_ts FROM e),
        |n AS (SELECT *, CASE WHEN prev_ts IS NULL
        |    OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END
        |  AS new_sess FROM l),
        |s AS (SELECT event_id, user_id, event_type,
        |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sess_id FROM n),
        |tu AS (SELECT CAST(user_id * 100000 + sess_id AS BIGINT) AS conv_id,
        |  event_id AS ord, event_type,
        |  row_number() OVER (PARTITION BY user_id, sess_id
        |    ORDER BY event_id) AS rn FROM s),
        |t AS (SELECT conv_id, ord,
        |  '<|' || (CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant' END)
        |  || '|>' || event_type || '#' || CAST(ord % 100 AS VARCHAR)
        |  || '<|end|>' AS rt FROM tu),
        |g AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
        |  string_agg(rt, '' ORDER BY ord) AS text,
        |  arg_max(rt, ord) AS last_rt FROM t GROUP BY conv_id)
        |SELECT conv_id, n_turns, text,
        |  CAST(length(text) - length(last_rt) AS BIGINT) AS resp_start,
        |  CAST(length(last_rt) AS BIGINT) AS resp_len,
        |  md5(substring(text, 1, length(text) - length(last_rt))) AS prompt_fp
        |FROM g ORDER BY conv_id""".stripMargin,
    // T46: BM25 recomputed end to end — case-folded terms, tf/df/dl,
    // df-pruned postings, the Okapi formula with LITERAL-shaped
    // constants ((1.2 + 1), (1 - 0.75)) so both engines fold the same
    // IEEE doubles
    "t46_bm25_topk" -> bm25GateSql,
    // T47: the same answers through the bucket-partitioned at-rest
    // index (the d14/ann4 store-equals-live convention)
    "t47_bm25_store" -> bm25GateSql,
    // T48: two-installment install + exact-long stats update — same
    // ground truth
    "t48_bm25_append" -> bm25GateSql,
    // T49: the df-based stopword prune LIVE (maxDfRatio = 0.5) on the
    // realistic-vocabulary fixture — the oracle builds the same
    // synthetic corpus and replays the PRUNED scoring; an engine that
    // scored the df=N stopwords (tiny but nonzero idf) hash-fails
    "t49_bm25_pruned" -> bm25PrunedGateSql,
    // t51: the rebuilt-store probe must equal the SAME pruned live
    // replay — a stale generation or stats entry surviving the
    // reinstall shifts every idf and hash-fails here
    "t51_bm25_rebuilt" -> bm25PrunedGateSql,
    // cross-engine differential fuzz: 12 seeded operator compositions
    // (joins/fills/windows/aggs over the real tables), digested
    // order-insensitively; the oracle text is generated from the SAME
    // seeds, so both engines replay identical plans
    "fuzz_differential" -> graft.queries.Fuzz.fuzzDifferentialSql,
    // Hybrid retrieval: the t46 run (top-20) + the ann1 vector run
    // (top-20) fused by reciprocal-rank — rank arithmetic only
    "llm_hybrid_retrieval" ->
      """WITH body AS (SELECT doc_id AS n_id,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
        |dl AS (SELECT n_id, CAST(len(tk) AS BIGINT) AS dl FROM body),
        |tf AS (SELECT n_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
        |  SELECT n_id, unnest(tk) AS term FROM body) GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl),
        |post AS (SELECT tf.n_id, tf.term, tf.tf, dl.dl, st.avgdl,
        |  ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) AS idf
        |  FROM tf JOIN dl USING (n_id) JOIN df USING (term), st
        |  WHERE df.df <= 1.0 * st.n_docs),
        |q AS (SELECT doc_id AS q_id, substring(text, 1, 60) AS q_text
        |  FROM documents WHERE doc_id % 83 = 0 AND doc_id < 500),
        |qt AS (SELECT q_id, unnest(list_distinct(
        |  regexp_split_to_array(trim(lower(q_text)), '\s+'))) AS term FROM q),
        |sc AS (SELECT q_id, n_id,
        |  round(sum(idf * (tf * (1.2 + 1)) /
        |    (tf + 1.2 * ((1 - 0.75) + 0.75 * dl / avgdl))), 6) AS bm25
        |  FROM qt JOIN post USING (term) GROUP BY 1, 2),
        |l20 AS (SELECT q_id, n_id, rank FROM (
        |  SELECT q_id, n_id, ROW_NUMBER() OVER (
        |    PARTITION BY q_id ORDER BY bm25 DESC, n_id ASC) AS rank FROM sc)
        |  WHERE rank <= 20),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |qv AS (SELECT vec_id AS q_id, v AS qvec FROM e
        |  WHERE vec_id % 83 = 0 AND vec_id < 500),
        |vsc AS (SELECT q_id, e.vec_id AS n_id,
        |  list_cosine_similarity(qvec, e.v) AS cos
        |  FROM qv, e WHERE e.vec_id <> q_id),
        |v20 AS (SELECT q_id, n_id, rank FROM (
        |  SELECT q_id, n_id, ROW_NUMBER() OVER (
        |    PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank FROM vsc)
        |  WHERE rank <= 20),
        |f AS (SELECT coalesce(l.q_id, v.q_id) AS q_id,
        |  coalesce(l.n_id, v.n_id) AS n_id,
        |  round(coalesce(1.0 / (l.rank + 60), 0.0)
        |    + coalesce(1.0 / (v.rank + 60), 0.0), 6) AS rrf
        |  FROM l20 l FULL OUTER JOIN v20 v
        |    ON l.q_id = v.q_id AND l.n_id = v.n_id),
        |r AS (SELECT q_id, n_id, rrf, ROW_NUMBER() OVER (
        |  PARTITION BY q_id ORDER BY rrf DESC, n_id ASC) AS rank FROM f)
        |SELECT q_id, rank, n_id, rrf FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
  ) ++ graft.queries.Medallion.oracleSql

  /** pipeline_e2e oracle: the query parquet-dumps its deterministic gold
    * tables + loan silver (PipelineE2E.oracleDumpDir, same process so the
    * pid-scoped path matches), and DuckDB independently recomputes the
    * store assembly — 3 left joins, full-row distinct, grade filter,
    * label counts, grade distribution. feature_cols is derived from the
    * dumped schemas (join width minus the 3 dropped key/label columns),
    * so a silent schema change fails the hash. */
  private def pipelineE2ESql: String = {
    val t = graft.queries.PipelineE2E.oracleDumpDir
    s"""WITH lab AS (SELECT grade, count(*) AS n
       |  FROM read_parquet('$t/silver_loan/*.parquet')
       |  WHERE grade IS NOT NULL GROUP BY grade),
       |j AS (SELECT * FROM read_parquet('$t/gold_loan/*.parquet') l
       |  LEFT JOIN read_parquet('$t/gold_demo/*.parquet') dm USING (member_id, snapshot_date)
       |  LEFT JOIN read_parquet('$t/gold_fin/*.parquet') f USING (member_id, snapshot_date)
       |  LEFT JOIN read_parquet('$t/gold_credit/*.parquet') c USING (member_id, snapshot_date))
       |SELECT
       |  (SELECT count(*) FROM (SELECT DISTINCT * FROM j WHERE grade IS NOT NULL)) AS feature_rows,
       |  (SELECT count(*) FROM (DESCRIBE SELECT * FROM read_parquet('$t/gold_loan/*.parquet')))
       |   + (SELECT count(*) - 2 FROM (DESCRIBE SELECT * FROM read_parquet('$t/gold_demo/*.parquet')))
       |   + (SELECT count(*) - 2 FROM (DESCRIBE SELECT * FROM read_parquet('$t/gold_fin/*.parquet')))
       |   + (SELECT count(*) - 2 FROM (DESCRIBE SELECT * FROM read_parquet('$t/gold_credit/*.parquet')))
       |   - 3 AS feature_cols,
       |  (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM lab) AS label_rows,
       |  (SELECT string_agg(grade || ':' || n, ',' ORDER BY grade) FROM lab) AS grade_dist""".stripMargin
  }

  /** Shared CTE prefix: word-3-gram shingles, per-doc sizes, per-pair
    * shared counts — the ground-truth Jaccard machinery used by the
    * d2/d4 pair oracles and the d6 cluster oracle. */
  private val ngramPairCtes: String =
    """t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
      |  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s FROM t),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)""".stripMargin

  /** Shared CTE prefix for the d8/d12 oracles: exact cosine ≥ 0.45
    * pairs, symmetrized edges, recursive closure, min-id component
    * labels — DuckDB's ground-truth SemDeDup keeper machinery. */
  private val semanticKeeperCtes: String =
    """e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.v, b.v) >= 0.45),
      |edges AS (SELECT id_a AS s, id_b AS d FROM p
      |  UNION SELECT id_b, id_a FROM p),
      |walk(s, r) AS (SELECT s, s FROM (SELECT DISTINCT s FROM edges) nodes
      |  UNION SELECT e2.s, w.r FROM edges e2 JOIN walk w ON e2.d = w.s),
      |comp AS (SELECT s AS cid, min(r) AS cluster_id FROM walk GROUP BY s)""".stripMargin

  /** Shared oracle for d10 (live recompute) and d11 (at-rest store):
    * ground-truth CROSS-SET word-3-gram jaccard pairs ≥ 0.8 — batch
    * (doc_id % 5 = 0) against corpus (doc_id % 5 ≠ 0). */
  private val crossSetJaccardSql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws) - 1),
      |  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s FROM t),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      |  FROM sh a JOIN sh b ON a.s = b.s
      |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0 GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  round(shared * 1.0 / (sa.sz + sb.sz - shared), 6) AS jaccard
      |FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
      |WHERE shared * 1.0 / (sa.sz + sb.sz - shared) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  /** d3's gate oracle: the d2/d4 ground-truth jaccard pair rows plus the
    * two invariant flags the Spark side computes over the (DuckDB-
    * inexpressible) simhash pair set — see Documents.d3SimHash. */
  private val simhashGateSql: String =
    s"""WITH $ngramPairCtes
      |SELECT id_a, id_b,
      |  round(shared * 1.0 / (sa.sz + sb.sz - shared), 6) AS jaccard,
      |  1 AS sim_pairs_valid, 1 AS sim_recall_ge_075
      |FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
      |WHERE shared * 1.0 / (sa.sz + sb.sz - shared) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  /** t15/t19's shared oracle: span-level decontamination recomputed
    * from scratch — eval 5-gram set, corpus positional grams, semi-join
    * → covered positions, token anti join, ordered reassembly. t19 (the
    * size-routed variant forced onto its Bloom route) shares it
    * verbatim because bit-identical output IS the routing contract. */
  private val decontamRewriteSql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |c AS (SELECT doc_id, ws FROM t WHERE doc_id % 97 <> 0),
      |eg AS (SELECT DISTINCT u AS s FROM (
      |  SELECT unnest(list_transform(range(1, len(ws) - 3),
      |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS u
      |  FROM t WHERE doc_id % 97 = 0 AND len(ws) >= 5)),
      |g AS (SELECT doc_id, u.p AS p, u.s AS s FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3),
      |    i -> {'p': i, 's': ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]})) AS u
      |  FROM c WHERE len(ws) >= 5)),
      |cov AS (SELECT DISTINCT doc_id, unnest(range(p, p + 5)) AS i
      |  FROM g SEMI JOIN eg ON g.s = eg.s),
      |tok AS (SELECT doc_id, u.i AS i, u.w AS w FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1), i -> {'i': i, 'w': ws[i]})) AS u FROM c)),
      |kept AS (SELECT tok.doc_id, tok.i, tok.w FROM tok ANTI JOIN cov
      |  ON tok.doc_id = cov.doc_id AND tok.i = cov.i),
      |outp AS (SELECT doc_id, count(*) AS n_kept,
      |  string_agg(w, ' ' ORDER BY i) AS clean_text FROM kept GROUP BY doc_id)
      |SELECT c.doc_id, CAST(len(ws) AS BIGINT) AS n_toks,
      |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
      |  coalesce(clean_text, '') AS clean_text
      |FROM c LEFT JOIN outp ON c.doc_id = outp.doc_id
      |ORDER BY c.doc_id""".stripMargin

  /** ann7's oracle: recount the per-cell occupancy distribution of the
    * at-rest IVF index from its own parquet files (cell read from the
    * hive partition path, CAST to INT so tie-ordering in the top-K sum
    * matches Spark's integer cell ordering, not string ordering). The
    * path is pid-scoped and interpolated at dump time — same process,
    * same files the query measured. */
  private def ivfCellStatsSql: String = {
    val p = graft.queries.Documents.ivfStatsDir
    s"""WITH c AS (SELECT CAST(cell AS INT) AS k, count(*) AS n
      |  FROM read_parquet('$p/cells/batch=*/cell=*/*.parquet', hive_partitioning = 1)
      |  GROUP BY 1),
      |top AS (SELECT CAST(sum(n) AS BIGINT) AS top_n
      |  FROM (SELECT n FROM c ORDER BY n DESC, k LIMIT 10)),
      |agg AS (SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
      |  max(n) AS max_n, round(avg(n), 4) AS mean_n,
      |  round(max(n) / avg(n), 4) AS skew_ratio FROM c)
      |SELECT n_keys, n_rows, max_n, mean_n, skew_ratio,
      |  round(top_n * 1.0 / n_rows, 6) AS top_share
      |FROM agg, top""".stripMargin
  }

  /** ann2/ann3's gate oracle: the pinned (query × rank) grid with every
    * invariant flag at 1 — see Documents.annInvariantGate. */
  /** ANN19's oracle, GENERATED from the same f(j,c,t) = (j·13 + c·7 +
    * t·3) mod 17 grid the engine installs (Documents.pqGrid) — the
    * doremi literal rule applied to a whole codebook: both sides
    * recompute the constants, neither copies a magic table. m=2
    * subspaces × k=4 centroids × subDim=4; distances are sums of
    * squared small-int differences (exact in double), argmin CASE
    * order = the engine's first-minimum tie-break. */
  private val ann19PqSql: String = {
    def f(j: Int, c: Int, t: Int): Int = (j * 13 + c * 7 + t * 3) % 17
    val es = (0 until 8).map(i =>
      s"  CAST((length(text)*31 + doc_id*17 + $i*7) % 97 AS DOUBLE) AS e$i")
      .mkString(",\n")
    def dist(j: Int, c: Int): String = (0 until 4).map { t =>
      val e = s"e${4 * j + t}"; val g = f(j, c, t)
      s"($e - $g)*($e - $g)"
    }.mkString(" + ")
    val dists = (for { j <- 0 to 1; c <- 0 to 3 }
      yield s"  ${dist(j, c)} AS d$j$c").mkString(",\n")
    def argmin(j: Int): String =
      s"CASE WHEN d${j}0 <= d${j}1 AND d${j}0 <= d${j}2 AND d${j}0 <= d${j}3 THEN 0 " +
        s"WHEN d${j}1 <= d${j}2 AND d${j}1 <= d${j}3 THEN 1 " +
        s"WHEN d${j}2 <= d${j}3 THEN 2 ELSE 3 END"
    def n2(j: Int, c: Int): Int = (0 until 4).map(t => f(j, c, t) * f(j, c, t)).sum
    def norm(j: Int): String =
      s"CASE c$j " + (0 to 3).map(c => s"WHEN $c THEN ${n2(j, c)}").mkString(" ") +
        " END"
    s"""WITH e AS (SELECT doc_id,
       |$es
       |FROM documents),
       |d AS (SELECT doc_id,
       |$dists
       |FROM e),
       |cd AS (SELECT doc_id,
       |  ${argmin(0)} AS c0,
       |  ${argmin(1)} AS c1
       |FROM d)
       |SELECT doc_id, c0, c1,
       |  CAST(${norm(0)} + ${norm(1)} AS DOUBLE) AS recon_norm
       |FROM cd ORDER BY doc_id""".stripMargin
  }

  /** The t46/t47 shared oracle: BM25 end to end over the gate's query
    * set (maxDfRatio = 1.0 — see t46Bm25TopK's scaladoc). */
  private val bm25GateSql: String =
    """WITH body AS (SELECT doc_id AS n_id,
      |  regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM documents),
      |dl AS (SELECT n_id, CAST(len(tk) AS BIGINT) AS dl FROM body),
      |tf AS (SELECT n_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
      |  SELECT n_id, unnest(tk) AS term FROM body) GROUP BY 1, 2),
      |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl),
      |post AS (SELECT tf.n_id, tf.term, tf.tf, dl.dl, st.avgdl,
      |  ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) AS idf
      |  FROM tf JOIN dl USING (n_id) JOIN df USING (term), st
      |  WHERE df.df <= 1.0 * st.n_docs),
      |q AS (SELECT doc_id AS q_id, substring(text, 1, 60) AS q_text
      |  FROM documents WHERE doc_id % 83 = 0 AND doc_id < 500),
      |qt AS (SELECT q_id, unnest(list_distinct(
      |  regexp_split_to_array(trim(lower(q_text)), '\s+'))) AS term FROM q),
      |sc AS (SELECT q_id, n_id,
      |  round(sum(idf * (tf * (1.2 + 1)) /
      |    (tf + 1.2 * ((1 - 0.75) + 0.75 * dl / avgdl))), 6) AS bm25
      |  FROM qt JOIN post USING (term) GROUP BY 1, 2),
      |r AS (SELECT q_id, n_id, bm25, ROW_NUMBER() OVER (
      |  PARTITION BY q_id ORDER BY bm25 DESC, n_id ASC) AS rank FROM sc)
      |SELECT q_id, rank, n_id, bm25 FROM r WHERE rank <= 5
      |ORDER BY q_id, rank""".stripMargin

  /** The t49/t51 shared oracle: BM25 with the df-based stopword prune
    * (maxDfRatio = 0.5) replayed end to end over the
    * realistic-vocabulary fixture — shared so the live gate (t49) and
    * the rebuilt-store gate (t51) can never drift apart. */
  private val bm25PrunedGateSql: String =
    """WITH corpus AS (SELECT doc_id,
      |  'the of the w' || CAST(doc_id % 211 AS VARCHAR) ||
      |  ' w' || CAST(doc_id % 211 AS VARCHAR) ||
      |  ' x' || CAST(doc_id % 997 AS VARCHAR) ||
      |  CASE WHEN doc_id % 3 = 0 THEN ' longtail filler pad' ELSE '' END
      |  AS text FROM documents),
      |body AS (SELECT doc_id AS n_id,
      |  regexp_split_to_array(trim(lower(text)), '\s+') AS tk FROM corpus),
      |dl AS (SELECT n_id, CAST(len(tk) AS BIGINT) AS dl FROM body),
      |tf AS (SELECT n_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
      |  SELECT n_id, unnest(tk) AS term FROM body) GROUP BY 1, 2),
      |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl),
      |post AS (SELECT tf.n_id, tf.term, tf.tf, dl.dl, st.avgdl,
      |  ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) AS idf
      |  FROM tf JOIN dl USING (n_id) JOIN df USING (term), st
      |  WHERE df.df <= 0.5 * st.n_docs),
      |q AS (SELECT doc_id AS q_id,
      |  'the w' || CAST(doc_id % 211 AS VARCHAR) ||
      |  ' x' || CAST(doc_id % 997 AS VARCHAR) AS q_text
      |  FROM documents WHERE doc_id % 83 = 0 AND doc_id < 500),
      |qt AS (SELECT q_id, unnest(list_distinct(
      |  regexp_split_to_array(trim(lower(q_text)), '\s+'))) AS term FROM q),
      |sc AS (SELECT q_id, n_id,
      |  round(sum(idf * (tf * (1.2 + 1)) /
      |    (tf + 1.2 * ((1 - 0.75) + 0.75 * dl / avgdl))), 6) AS bm25
      |  FROM qt JOIN post USING (term) GROUP BY 1, 2),
      |r AS (SELECT q_id, n_id, bm25, ROW_NUMBER() OVER (
      |  PARTITION BY q_id ORDER BY bm25 DESC, n_id ASC) AS rank FROM sc)
      |SELECT q_id, rank, n_id, bm25 FROM r WHERE rank <= 5
      |ORDER BY q_id, rank""".stripMargin

  private val annGateSql: String =
    """SELECT e.vec_id AS q_id, CAST(r.range AS INT) AS rank,
      |  1 AS sim_ok, 1 AS neighbor_ok, 1 AS recall_floor_ok
      |FROM embeddings e CROSS JOIN range(1, 6) r
      |WHERE e.vec_id < 5
      |ORDER BY q_id, rank""".stripMargin

  /** Shared oracle for d2 (MinHash+LSH, exact-verified) and d4 (direct
    * n-gram Jaccard): ground-truth word-3-gram Jaccard pairs ≥ 0.8. */
  private val ngramJaccardSql: String =
    s"""WITH $ngramPairCtes
      |SELECT id_a, id_b,
      |  round(shared * 1.0 / (sa.sz + sb.sz - shared), 6) AS jaccard
      |FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
      |WHERE shared * 1.0 / (sa.sz + sb.sz - shared) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  /** d6 oracle: transitive closure of the ground-truth pair graph via a
    * recursive CTE, each doc labeled with the min reachable id;
    * singletons label themselves. */
  /** The exact-pair component closure (jp -> edges -> walk -> comp)
    * shared by the d6/d16/r11 oracles — one constant so an edit to
    * the closure (threshold, walk rule) cannot silently desynchronize
    * the three gates that depend on identical clustering. */
  private val componentClosureCtes: String =
    """jp AS (SELECT id_a, id_b
      |  FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
      |  WHERE shared * 1.0 / (sa.sz + sb.sz - shared) >= 0.8),
      |edges AS (SELECT id_a AS s, id_b AS d FROM jp
      |  UNION SELECT id_b, id_a FROM jp),
      |walk(s, r) AS (SELECT s, s FROM (SELECT DISTINCT s FROM edges) nodes
      |  UNION SELECT e.s, w.r FROM edges e JOIN walk w ON e.d = w.s),
      |comp AS (SELECT s AS doc_id, min(r) AS cluster_id FROM walk GROUP BY s)""".stripMargin

  private val dedupClustersSql: String =
    s"""WITH RECURSIVE $ngramPairCtes,
      |$componentClosureCtes
      |SELECT dd.doc_id, coalesce(c.cluster_id, dd.doc_id) AS cluster_id
      |FROM documents dd LEFT JOIN comp c ON dd.doc_id = c.doc_id
      |ORDER BY dd.doc_id""".stripMargin

  /** r11 oracle: d6's recursive component closure feeding the
    * md5-threshold split keyed on the cluster label (25% → the r2/r9
    * '4000…' threshold), censused per side. */
  private val clusterSplitSql: String =
    s"""WITH RECURSIVE $ngramPairCtes,
      |$componentClosureCtes,
      |lab AS (SELECT dd.doc_id, coalesce(c.cluster_id, dd.doc_id) AS cl
      |  FROM documents dd LEFT JOIN comp c ON dd.doc_id = c.doc_id),
      |sp AS (SELECT doc_id, cl,
      |  CASE WHEN md5(CAST(cl AS VARCHAR) || 'split')
      |    < '40000000000000000000000000000000' THEN 'test'
      |    ELSE 'train' END AS split FROM lab)
      |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(DISTINCT cl) AS BIGINT) AS n_clusters
      |FROM sp GROUP BY split ORDER BY split""".stripMargin

  /** d16 oracle: d6's recursive component closure, every doc scored with
    * t2's composite quality expression (rounded 6 dp on BOTH sides so
    * the argmax ranks identical values), keeper = row_number 1 per
    * cluster ordered (q DESC, doc_id). */
  private val clusterBestSql: String =
    s"""WITH RECURSIVE $ngramPairCtes,
      |$componentClosureCtes,
      |lab AS (SELECT d2.doc_id, coalesce(c.cluster_id, d2.doc_id) AS cluster_id,
      |  round(least(len(ws) / 50.0, 1.0) * 0.5
      |    + least(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in')))
      |        / greatest(len(ws) * 0.05, 1.0), 1.0) * 0.5
      |    - (length(txt) - length(regexp_replace(txt, '[^a-zA-Z0-9\\s]', '', 'g'))) * 1.0
      |        / greatest(length(txt), 1), 6) AS q
      |  FROM (SELECT doc_id, text AS txt,
      |    regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents) d2
      |  LEFT JOIN comp c ON d2.doc_id = c.doc_id),
      |mem AS (SELECT cluster_id, count(*) AS n_members FROM lab GROUP BY cluster_id),
      |keep AS (SELECT cluster_id, doc_id AS keeper_id FROM (
      |  SELECT cluster_id, doc_id,
      |    row_number() OVER (PARTITION BY cluster_id ORDER BY q DESC, doc_id) AS rn
      |  FROM lab) WHERE rn = 1)
      |SELECT lab.doc_id, lab.cluster_id, lab.q, keep.keeper_id, mem.n_members,
      |  CASE WHEN lab.doc_id = keep.keeper_id THEN 1 ELSE 0 END AS kept
      |FROM lab JOIN keep USING (cluster_id) JOIN mem USING (cluster_id)
      |ORDER BY lab.doc_id""".stripMargin
}
