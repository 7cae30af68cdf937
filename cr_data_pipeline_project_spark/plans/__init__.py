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
# round, so every query gets a driver-green attestation at least
# every other round: round 5 brings back the 41 queries parked
# during round 4 (all driver-green in CORRECTNESS_r02/r03) and
# parks ALL 50 r04-attested ones below — the freed 9 slots hold the
# nine new round-5 oracled queries (q103/q104, q106-q108,
# q111-q114), so every round-5 addition gets driver attestation this
# round. All parked queries stay covered every round by
# tests/test_oracle_parity.py and tools/check_oracle.py, which run
# the FULL surface.
GATE_OVERFLOW: tuple[str, ...] = (
    # parked round 5 (driver-green in r04): the reference-query and
    # dedup/text/sampling entries attested in CORRECTNESS_r04; they
    # return in round 6
    "q01_pricing_summary",
    "q02_brand_usage_wins",
    "q09_anti_join_new_keys",
    "q10_semi_join_kept_keys",
    "q15_range_join_season",
    "q22_priority_share",
    "q24_merge_upsert",
    "q25_insert_if_absent",
    "q26_cascade_delete",
    "q28_tumbling_window",
    "q29_sessionization",
    "q45_nested_flatten",
    "q31_dedup_exact_groups",
    "q32_dedup_fingerprint_keep",
    "q33_ngram_jaccard_pairs",
    "q34_minhash_lsh_pairs",
    "q35_simhash_pairs",
    "q37_embedding_neardup",
    "q53_group_zscore",
    "q52_hash_split",
    "q38_text_quality",
    "q39_lang_id",
    "q40_token_count",
    "q41_fingerprint",
    "q57_dataset_mixing",
    "q55_curation_pipeline",
    "q43_multimodal_meta",
    "q61_repetition_ratio",
    "q62_pii_redaction",
    "q63_stratified_sample",
    "q64_sequence_packing",
    "q66_dedup_clusters",
    "q67_event_pivot",
    "q68_audience_setops",
    "q70_term_doc_freq",
    "q86_bloom_prefilter_gate",
    "q87_chunk_dedup",
    "q88_ngram_decontamination",
    "q89_scd2_intervals",
    "q90_stratified_sample_scale",
    "q92_cluster_representatives",
    # parked mid-round-5 (driver-green in r04) to open slots for the
    # round-5 additions q103/q104 (the q84 build/probe bench split)
    # and q106-q108 (as-of snapshot, retention cohorts, verbatim
    # decontamination)
    "q93_decontaminated_export",
    "q94_wav_decode_meta",
    "q95_state_at_event",
    "q96_snapshot_diff",
    "q97_adaptive_length_gate",
    # ...and q111/q112 (contamination report, near-dup dedup export)
    # and q113/q114 (TPC-H Q3/Q5 multi-way-join shapes)
    "q98_shard_manifest",
    "q99_ppm_decode_meta",
    "q101_token_budget_apportion",
    "q102_ppm_resize_meta",
)

# Newly-added oracled queries queued for their FIRST driver
# attestation: the window already holds the 41 returners (whose
# fresh attestation this round is the rotation invariant) plus nine
# new queries, so additions past nine wait here — registered right
# AFTER the window (full-surface oracle checks still verify them
# every round; tools/check_oracle.py + tests/test_oracle_parity.py)
# and rotated in next round. Distinct from GATE_OVERFLOW on purpose:
# overflow names must carry a PAST driver-green row, pending names
# must carry NONE (both machine-checked in test_gate_window.py — a
# query with a driver row hiding here would dodge re-attestation).
GATE_PENDING: tuple[str, ...] = (
    "q116_windowed_heavy_hitters",
    "q117_embedding_standardize",
    "q118_grouped_correlation",
    "q119_stickiness_dau_wau",
    "q120_quality_tier_budgets",
)


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
