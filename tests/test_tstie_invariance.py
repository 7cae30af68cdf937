"""Timestamp-tie invariance gate — the fifth data-shape adversary
(shuffle → order, skew → hot keys, nullify → missing values,
extremes → magnitudes, ties → equal timestamps).

The clean fixtures never tie: every events.ts is unique, so every
`Window.orderBy(ts)`, sessionization lag, as-of probe and
latest-event argmax has been accidentally TOTAL — a missing
tiebreak can never show. tools/tstie_fixtures.py manufactures three
tie shapes (within-user donor ties ~10%, midnight snaps ~3%, one
global hot instant ~1%) and this gate re-runs oracle parity for the
tie-PRONE subset: every query that orders, windows, sessionizes,
as-of joins, or argmaxes over events.ts. At 100 TB a window whose
intra-tie order is engine-dependent returns different rows on every
run; surviving this gate means every ordering in the engine carries
a deterministic total tiebreak (event_id) on BOTH engines.
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


tstie_fixtures = _load_tool("tstie_fixtures")
check_oracle = _load_tool("check_oracle")

# Every query whose plan orders by events.ts: lag/lead chains,
# sessionization and session stats, tumbling/sliding/trailing
# windows on the boundary, as-of probes, funnels/journeys/
# transitions, forward-fill and interpolation, rank-by-recency.
TIE_PRONE = [
    "q28_tumbling_window",
    "q29_sessionization",
    "q30_sliding_window",
    "q56_asof_join",
    "q81_event_funnel",
    "q82_rolling_daily_events",
    "q106_scd2_asof_snapshot",
    "q116_windowed_heavy_hitters",
    "q133_sessionization",
    "q147_forward_fill",
    "q155_ewma_lag_chain",
    "q161_linear_interpolation",
    "q164_user_journeys",
    "q167_cusum_changepoint",
    "q197_last_touch_attribution",
    "q200_trailing_window_features",
    "q203_event_transition_matrix",
    "q262_session_incident_overlap",
]


@pytest.fixture(scope="module")
def tied_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("tsties") / "sf0.001")
    info = tstie_fixtures.tieify_dir(
        "/root/testdata/sf0.001", dst, seed=2031
    )
    # the adversary must be real: all three tie shapes landed and
    # distinctness actually collapsed
    assert info["n_user_ties"] > 0
    assert info["n_midnight"] > 0
    assert info["n_hot"] > 0
    assert info["n_distinct_after"] < info["n_distinct_before"]
    return dst


@pytest.fixture(scope="module")
def duck(tied_dir):
    con = duckdb.connect()
    for t in tstie_fixtures.TABLES:
        p = os.path.join(tied_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


def test_tie_prone_queries_survive_equal_timestamps(spark, tied_dir, duck):
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = [n for n in TIE_PRONE if n not in qs or n not in oracles]
    assert not missing, f"subset names drifted: {missing}"

    failures = []
    for name in TIE_PRONE:
        spark_pdf = qs[name](spark, tied_dir).toPandas()
        duck_pdf = duck.execute(oracles[name]).fetchdf()
        problems = check_oracle.compare(name, spark_pdf, duck_pdf)
        if problems:
            failures.append((name, problems))
    assert not failures, failures
