"""Named query builders — the engine's ``queries()`` surface.

Every query keyed here has (a) a Spark builder ``(spark, sf_dir) ->
DataFrame`` and (b), where ANSI-SQL-expressible, a DuckDB oracle twin
with identical column names and value semantics.

Registration order is part of the driver contract: the correctness
gate compares only the FIRST ``GATE_SLOTS`` entries of ``queries()``
against their oracles, so

1. the gate window holds oracled queries only (a rows-only query in
   a slot would waste it),
2. rows-only queries (no oracle by design — BLAS/ sketch /
   probabilistic results) are registered last,
3. when more oracled queries exist than slots, the overflow set is
   chosen deliberately (``GATE_OVERFLOW``): trivial scalar
   projections that stay covered by ``tests/test_oracle_parity.py``
   and ``tools/check_oracle.py``, which always run the FULL surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import llm_queries, reference_queries

Builder = Callable[[SparkSession, str], DataFrame]

# The driver's correctness gate reads this many leading entries.
GATE_SLOTS = 50

# Oracled queries deliberately registered past the gate window.
# With more oracled queries than slots this set is ROTATED each
# round, so every query gets a driver-green attestation on a fixed
# cadence (roughly every fifth round now that 243 oracled queries
# share 50 slots — that count is asserted against the real surface
# by tests/test_gate_window.py::test_cadence_comment_count, so it
# can no longer drift). Round 11: no first-timers are pending, so
# the window is pure returners — the whole 43-name r06-attested
# block (q25…q120, the longest-parked) plus the 7-name head of the
# next-oldest (r07-attested) block (q03-q08, q11). Everything else
# parks here: the 50 queries the r10 window attested, the 50
# r09-attested ones, the 50 r08-attested ones, and the 43
# remaining r07-attested ones. All parked queries stay covered
# every round by tests/test_oracle_parity.py and
# tools/check_oracle.py, which run the FULL surface.
GATE_OVERFLOW: tuple[str, ...] = (
    # parked round 11 (driver-green in r10): the 50 queries the
    # r10 window attested (the 20 q251-q272 first-timers + the 30
    # q01-q114 returners)
    "q01_pricing_summary",
    "q02_brand_usage_wins",
    "q09_anti_join_new_keys",
    "q10_semi_join_kept_keys",
    "q15_range_join_season",
    "q22_priority_share",
    "q24_merge_upsert",
    "q59_last_completed_seasons",
    "q60_current_plus_seasons",
    "q113_shipping_priority",
    "q114_local_supplier_volume",
    "q65_int8_quantize",
    "q69_doc_length_deciles",
    "q71_event_percentiles",
    "q75_tfidf_top_terms",
    "q76_winnow_fingerprints",
    "q77_cluster_centroid_sums",
    "q79_frame_sample_plan",
    "q80_per_source_dup_stats",
    "q81_event_funnel",
    "q82_rolling_daily_events",
    "q83_cross_source_leakage",
    "q84_incremental_neardup",
    "q103_neardup_index_build",
    "q104_neardup_probe",
    "q106_scd2_asof_snapshot",
    "q107_retention_cohorts",
    "q108_verbatim_decontamination",
    "q111_contamination_report",
    "q112_neardup_dedup_export",
    "q251_mjpeg_mp4_frame_extract",
    "q252_kruskal_wallis",
    "q253_mann_whitney_u",
    "q254_kendall_tau_b",
    "q255_theil_sen_trend",
    "q256_t_closeness_audit",
    "q257_copurchase_clustering",
    "q258_url_domain_census",
    "q259_langid_cohens_kappa",
    "q260_ab_mde_power",
    "q261_langid_class_prf",
    "q262_session_incident_overlap",
    "q263_readability_census",
    "q264_winsorized_means",
    "q265_jaccard_threshold_sweep",
    "q266_durbin_watson",
    "q267_leadlag_crosscorrelation",
    "q268_forecast_backtest",
    "q271_budget_greedy_selection",
    "q272_dedup_capture_recapture",
    # parked round 10 (driver-green in r09): the 50 queries the
    # r09 window attested (the 12 q21-q58 returners + the 38
    # q212-q250 first-timers)
    "q21_multikey_sort",
    "q23_surrogate_keys",
    "q27_season_calendar",
    "q30_sliding_window",
    "q36_ann_bruteforce_topk",
    "q42_ann_ivf_topk",
    "q46_rollup",
    "q49_sql_view_api",
    "q50_column_profile",
    "q51_salted_join",
    "q56_asof_join",
    "q58_dense_ids_scale",
    "q212_streaming_ks_snapshot",
    "q213_streaming_psi_snapshot",
    "q214_streaming_kl_snapshot",
    "q215_top_ngram_mass",
    "q216_vocab_overlap_matrix",
    "q217_heaps_vocab_growth",
    "q218_dedup_survivorship",
    "q219_split_leakage_audit",
    "q220_bmp_decode_meta",
    "q221_embedding_norm_census",
    "q222_revenue_concentration",
    "q223_quality_auc",
    "q224_source_lang_mutual_info",
    "q225_integrity_audit",
    "q226_png_decode_meta",
    "q227_gif_decode_meta",
    "q228_grouped_ols_regression",
    "q229_gif_frame_extract",
    "q230_dp_source_histogram",
    "q231_copurchase_triangles",
    "q232_ngram_overlap_scores",
    "q233_pareto_frontier",
    "q235_ulaw_decode_meta",
    "q236_mp4_container_meta",
    "q237_jpeg_decode_meta",
    "q238_html_boilerplate_extract",
    "q239_spearman_correlation",
    "q240_benford_audit",
    "q241_retrieval_eval_metrics",
    "q242_mp3_frame_census",
    "q243_mixed_media_census",
    "q244_streaming_dp_snapshot",
    "q245_bootstrap_mean_ci",
    "q246_media_embedding_bands",
    "q247_record_linkage_scores",
    "q248_mojibake_census",
    "q249_l_diversity_census",
    "q250_ab_test_readout",
    # parked round 9 (driver-green in r08): the 50 queries the r08
    # window attested (the 8 q12-q20 returners + the 42 q168-q211
    # first-timers)
    "q12_key_synthesis",
    "q13_ts_parse_strict",
    "q14_url_encode",
    "q16_element_at_default",
    "q17_json_extract",
    "q18_null_mask_fill",
    "q19_case_round",
    "q20_window_rank",
    "q168_forecast_revenue_change",
    "q169_daily_autocorrelation",
    "q170_dow_seasonality",
    "q171_audience_intersect_all",
    "q172_dsir_importance",
    "q173_dup_span_census",
    "q174_chunk_plan",
    "q175_kanon_census",
    "q176_grouping_sets",
    "q177_ks_source_drift",
    "q178_zipf_slope",
    "q179_textrank_keywords",
    "q180_pmi_collocations",
    "q181_lexical_entropy",
    "q182_psi_drift",
    "q183_semantic_decontamination",
    "q184_bigram_surprisal",
    "q185_min_cost_supplier",
    "q186_important_part_values",
    "q187_containment_pairs",
    "q188_per_source_quality_cap",
    "q189_source_kl_divergence",
    "q190_seeded_shuffle_order",
    "q192_token_kl_drift",
    "q193_semantic_dedup_export",
    "q194_hybrid_rrf_topk",
    "q195_quantile_normalize",
    "q196_temperature_mix",
    "q197_last_touch_attribution",
    "q198_hard_negative_mining",
    "q200_trailing_window_features",
    "q201_corpus_datasheet",
    "q202_key_skew_census",
    "q203_event_transition_matrix",
    "q204_fulfillment_lag",
    "q205_leakage_safe_split",
    "q206_pps_sample_per_source",
    "q207_value_welch_ttest",
    "q208_dup_cluster_size_census",
    "q209_chisq_source_lang",
    "q210_effective_tokens_per_source",
    "q211_rfm_segmentation",
    # parked round 8 (driver-green in r07): the 43 still-parked
    # queries of the 50 the r07 window attested (q03-q08/q11
    # rotated back in as round-11 returners to top up the window
    # past the 43-name r06-attested block); these are now the
    # longest-parked block and return first in round 12
    "q97_adaptive_length_gate",
    "q98_shard_manifest",
    "q99_ppm_decode_meta",
    "q101_token_budget_apportion",
    "q102_ppm_resize_meta",
    "q123_returned_item_reporting",
    "q124_large_volume_customers",
    "q125_embedding_drift",
    "q126_source_token_mix",
    "q127_fuzzy_blocked_pairs",
    "q129_late_shipment_priority",
    "q130_promo_revenue_share",
    "q131_quality_resample",
    "q132_token_cooccurrence",
    "q133_sessionization",
    "q134_bpe_pair_merges",
    "q135_volume_shipping",
    "q136_market_share",
    "q137_daily_event_anomaly",
    "q139_wav_frame_inventory",
    "q142_customer_order_distribution",
    "q144_event_cube",
    "q145_daily_matrix_unpivot",
    "q146_audience_except_all",
    "q147_forward_fill",
    "q148_top_supplier_revenue",
    "q149_small_quantity_revenue",
    "q150_disjunctive_parts_revenue",
    "q151_waiting_suppliers",
    "q152_idle_premium_customers",
    "q153_inverted_postings",
    "q155_ewma_lag_chain",
    "q157_product_line_revenue",
    "q158_priority_line_classes",
    "q159_supplier_part_breadth",
    "q160_excess_volume_suppliers",
    "q161_linear_interpolation",
    "q162_score_calibration",
    "q163_ngram_novelty",
    "q164_user_journeys",
    "q165_robust_outlier_stats",
    "q166_pps_token_sample",
    "q167_cusum_changepoint",
)

# Newly-added oracled queries queued for their FIRST driver
# attestation: when the window is full, every oracled query added
# mid-round waits here — registered right AFTER the window
# (full-surface oracle checks still verify them every round;
# tools/check_oracle.py + tests/test_oracle_parity.py) and rotated
# in next round. Distinct from GATE_OVERFLOW on purpose:
# overflow names must carry a PAST driver-green row, pending names
# must carry NONE (both machine-checked in test_gate_window.py — a
# query with a driver row hiding here would dodge re-attestation).
# Round 11 had no pending first-timers (round 10 added zero new
# queries by design), so the rotation is pure returners: the whole
# 43-name r06-attested block plus the 7-name head of the
# r07-attested block. Oracled queries added during round 11 queue
# here as they land. Round-12 plan: promote all pending
# first-timers plus the longest-parked returners (the remaining
# r07-attested block, starting at q97) to fill the 50 slots.
GATE_PENDING: tuple[str, ...] = ()


def _merged() -> dict[str, Builder]:
    out: dict[str, Builder] = {}
    out.update(reference_queries.QUERIES)
    out.update(llm_queries.QUERIES)
    return out


def all_queries() -> dict[str, Builder]:
    merged = _merged()
    oracles = all_oracles()
    gated = [
        n
        for n in merged
        if n in oracles
        and n not in GATE_OVERFLOW
        and n not in GATE_PENDING
    ]
    if len(gated) > GATE_SLOTS:
        raise RuntimeError(
            f"{len(gated)} oracled queries for {GATE_SLOTS} gate slots — "
            "move stable ones to GATE_OVERFLOW (driver-green rows) or "
            "new ones to GATE_PENDING in plans/__init__.py"
        )
    pending = [n for n in GATE_PENDING if n in merged]
    overflow = [n for n in GATE_OVERFLOW if n in merged]
    rows_only = [n for n in merged if n not in oracles]
    return {n: merged[n] for n in (*gated, *pending, *overflow, *rows_only)}


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(reference_queries.ORACLES)
    out.update(llm_queries.ORACLES)
    return out
