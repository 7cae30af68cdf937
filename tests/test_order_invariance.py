"""Row-order / physical-layout invariance gate.

Hash-exact oracle parity must not depend on storage accidents: row
order inside the parquet, row-group boundaries, or file-internal
ordering. Any query whose result changes when they change is
depending on luck — an un-tiebroken row_number, a first()/limit
without order, a keep-rule resolved by arrival order, a float fold
whose partial order follows input order. This test permutes the
sf0.001 fixtures (tools/shuffle_fixtures.py, seeded) and re-runs
oracle parity for the order-sensitive-PRONE subset of the surface:
every rank/window/keep-rule/top-k/dense-id/prefix-sum/as-of/
sessionization query. The full-surface shuffled sweep is a
one-liner documented in the tool's docstring and was run green in
round 10 (docs/SCALE.md).
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


shuffle_fixtures = _load_tool("shuffle_fixtures")
check_oracle = _load_tool("check_oracle")

# Every query whose plan contains a rank/row_number keep rule, a
# top-k, a dense-id / prefix-sum / as-of / sessionization /
# forward-fill construct, or ordered array aggregation — the shapes
# where an order-luck bug would live.
ORDER_PRONE = [
    "q04_recent_rankings_top100",
    "q07_dedup_by_key",
    "q20_window_rank",
    "q21_multikey_sort",
    "q23_surrogate_keys",
    "q30_sliding_window",
    "q32_dedup_fingerprint_keep",
    "q36_ann_bruteforce_topk",
    "q56_asof_join",
    "q58_dense_ids_scale",
    "q69_doc_length_deciles",
    "q71_event_percentiles",
    "q92_cluster_representatives",
    "q95_state_at_event",
    "q98_shard_manifest",
    "q133_sessionization",
    "q147_forward_fill",
    "q161_linear_interpolation",
    "q164_user_journeys",
    "q166_pps_token_sample",
    "q190_seeded_shuffle_order",
    "q195_quantile_normalize",
    "q205_leakage_safe_split",
    "q239_spearman_correlation",
    "q253_mann_whitney_u",
    "q262_session_incident_overlap",
    "q271_budget_greedy_selection",
]


@pytest.fixture(scope="module")
def shuffled_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("shuffled") / "sf0.001")
    shuffle_fixtures.shuffle_dir("/root/testdata/sf0.001", dst, seed=1009)
    return dst


@pytest.fixture(scope="module")
def duck(shuffled_dir):
    con = duckdb.connect()
    for t in shuffle_fixtures.TABLES:
        p = os.path.join(shuffled_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


def test_order_prone_queries_survive_row_shuffle(spark, shuffled_dir, duck):
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = [n for n in ORDER_PRONE if n not in qs or n not in oracles]
    assert not missing, f"subset names drifted: {missing}"

    failures = []
    for name in ORDER_PRONE:
        spark_pdf = qs[name](spark, shuffled_dir).toPandas()
        duck_pdf = duck.execute(oracles[name]).fetchdf()
        problems = check_oracle.compare(name, spark_pdf, duck_pdf)
        if problems:
            failures.append((name, problems))
    assert not failures, failures
