"""Extreme-magnitude invariance gate — the fourth data-shape
adversary (shuffle → order luck, skew → hot-key luck, nullify →
clean-column luck, extremes → benign-magnitude luck).

tools/extreme_fixtures.py injects exact-power-of-two outliers
(±2^19 … 2^24) into the statistics columns (events.value,
customer.c_acctbal, supplier.s_acctbal) and shifts one whole
event_type group by +2^16 so its variance-class statistics run at
mean ≫ spread — the regime where raw-moment kernels
(Σx² − (Σx)²/n) catastrophically cancel while centered kernels
survive. Because every injected value is exactly representable as a
double AND under decimal(38,6), any engine/oracle divergence on the
mutated copy is a real semantics bug, never float noise.

The full-surface sweep on an extreme copy passed 243/0/29 on first
run in round 11 (the centered-moment and fixed-order-finish
contracts from rounds 8-10 held); this gate keeps the
magnitude-PRONE subset — variance/z-score kernels, percentile and
rank tails, range-derived bins (PSI/KS/histograms), leading-digit
audits, robust/rank statistics — pinned against regression on every
suite run.
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


extreme_fixtures = _load_tool("extreme_fixtures")
check_oracle = _load_tool("check_oracle")

# Queries whose kernels are exposed to magnitude: variance/z-score
# (cancellation), percentiles/ranks (heavy tail), range-derived bins
# (PSI, KS, profile min/max), leading digits (Benford), acctbal
# thresholds, robust/rank statistics, and regression/forecast chains
# over events.value.
MAGNITUDE_PRONE = [
    "q50_column_profile",
    "q53_group_zscore",
    "q71_event_percentiles",
    "q137_daily_event_anomaly",
    "q152_idle_premium_customers",
    "q165_robust_outlier_stats",
    "q167_cusum_changepoint",
    "q177_ks_source_drift",
    "q182_psi_drift",
    "q195_quantile_normalize",
    "q207_value_welch_ttest",
    "q240_benford_audit",
    "q245_bootstrap_mean_ci",
    "q250_ab_test_readout",
    "q255_theil_sen_trend",
    "q264_winsorized_means",
    "q266_durbin_watson",
    "q268_forecast_backtest",
]


@pytest.fixture(scope="module")
def extreme_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("extreme") / "sf0.001")
    info = extreme_fixtures.extremify_dir(
        "/root/testdata/sf0.001", dst, seed=2029
    )
    # the adversary must be real: outliers landed in all three
    # statistics columns and one event_type group got the mean shift
    assert info["n_outliers"].get("events", 0) > 0
    assert info["n_outliers"].get("customer", 0) > 0
    assert info["n_outliers"].get("supplier", 0) > 0
    assert info.get("shift_type")
    return dst


@pytest.fixture(scope="module")
def duck(extreme_dir):
    con = duckdb.connect()
    for t in extreme_fixtures.TABLES:
        p = os.path.join(extreme_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


def test_magnitude_prone_queries_survive_extremes(
    spark, extreme_dir, duck
):
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = [n for n in MAGNITUDE_PRONE if n not in qs or n not in oracles]
    assert not missing, f"subset names drifted: {missing}"

    failures = []
    for name in MAGNITUDE_PRONE:
        spark_pdf = qs[name](spark, extreme_dir).toPandas()
        duck_pdf = duck.execute(oracles[name]).fetchdf()
        problems = check_oracle.compare(name, spark_pdf, duck_pdf)
        if problems:
            failures.append((name, problems))
    assert not failures, failures
