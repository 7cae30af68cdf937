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
# every other round: round 4 brings back the 26 queries parked
# during round 3 (text/curation analytics, mutations, streaming
# batch twins — all driver-green in CORRECTNESS_r02) and parks the
# 26 freshly r03-attested ones below — all of which stay covered
# every round by tests/test_oracle_parity.py and
# tools/check_oracle.py, which run the FULL surface.
GATE_OVERFLOW: tuple[str, ...] = (
    # parked round 4 (driver-green in r03): scalar/projection
    # reference queries + the round-3 additions q75-q77/q79-q84,
    # plus nine more r03-attested queries parked to open slots for
    # the round-4 additions q86-q90/q92-q95 (they return in round 5),
    # and six more (q04/q42/q51/q56/q69/q71, all r03-green) parked
    # for the late-round-4 additions q96-q99, q101 and q102
    "q04_recent_rankings_top100",
    "q42_ann_ivf_topk",
    "q51_salted_join",
    "q56_asof_join",
    "q69_doc_length_deciles",
    "q71_event_percentiles",
    "q20_window_rank",
    "q23_surrogate_keys",
    "q36_ann_bruteforce_topk",
    "q30_sliding_window",
    "q46_rollup",
    "q49_sql_view_api",
    "q50_column_profile",
    "q58_dense_ids_scale",
    "q65_int8_quantize",
    "q03_player_win_rate",
    "q05_player_clan_view",
    "q06_distinct_single",
    "q07_dedup_by_key",
    "q08_dedup_composite_count",
    "q11_union_dedup",
    "q12_key_synthesis",
    "q13_ts_parse_strict",
    "q14_url_encode",
    "q16_element_at_default",
    "q17_json_extract",
    "q18_null_mask_fill",
    "q19_case_round",
    "q21_multikey_sort",
    "q27_season_calendar",
    "q59_last_completed_seasons",
    "q60_current_plus_seasons",
    "q75_tfidf_top_terms",
    "q76_winnow_fingerprints",
    "q77_cluster_centroid_sums",
    "q79_frame_sample_plan",
    "q80_per_source_dup_stats",
    "q81_event_funnel",
    "q82_rolling_daily_events",
    "q83_cross_source_leakage",
    "q84_incremental_neardup",
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
        n for n in merged if n in oracles and n not in GATE_OVERFLOW
    ]
    if len(gated) > GATE_SLOTS:
        raise RuntimeError(
            f"{len(gated)} oracled queries for {GATE_SLOTS} gate slots — "
            "move stable ones to GATE_OVERFLOW in plans/__init__.py"
        )
    overflow = [n for n in GATE_OVERFLOW if n in merged]
    rows_only = [n for n in merged if n not in oracles]
    return {n: merged[n] for n in (*gated, *overflow, *rows_only)}


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(reference_queries.ORACLES)
    out.update(llm_queries.ORACLES)
    return out
