"""Singleton-group invariance gate — the eighth data-shape
adversary (shuffle → order, skew → hot keys, nullify → missing
values, extremes → magnitudes, ties → equal timestamps, unitext →
ASCII-only luck, const → variance luck, singleton → group-size
luck).

The const adversary zeroed VARIANCE (many rows, one value); this
one zeroes the SAMPLE SIZE. tools/singleton_fixtures.py plants one
singleton event_type (whose group has n = 1 in every
type-partitioned statistic), moves that event to a lonely midnight
3 days past the fixture's range (a calendar gap followed by a
one-event day), and plants a singleton source / market segment /
order priority. Every n−1 denominator — sample stddev, Bessel
variance, regression df — is now exactly zero for one group, which
under Spark 4 ANSI is a CRASH if unguarded, while DuckDB's IEEE
mode silently produces NaN: the contract must be explicit on both.

First run found TWO real crashes in round 11: q53's group z-score
(the n−1 division inside group_moments, a different zero from the
const adversary's stddev = 0) and q207's Welch t-test (singleton
type → v1 df = 0). Both now carry an n < 2 → NULL contract in both
engines, with CASE guards keeping the division unevaluated.
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


singleton_fixtures = _load_tool("singleton_fixtures")
check_oracle = _load_tool("check_oracle")

# Every query that partitions a statistic, census, spine, rank, or
# rollup by one of the singleton-planted keys (event_type, day,
# source, c_mktsegment, o_orderpriority).
SIZE_PRONE = [
    "q22_priority_share",
    "q46_rollup",
    "q53_group_zscore",
    "q71_event_percentiles",
    "q116_windowed_heavy_hitters",
    "q126_source_token_mix",
    "q137_daily_event_anomaly",
    "q152_idle_premium_customers",
    "q167_cusum_changepoint",
    "q169_daily_autocorrelation",
    "q170_dow_seasonality",
    "q175_kanon_census",
    "q177_ks_source_drift",
    "q188_per_source_quality_cap",
    "q203_event_transition_matrix",
    "q206_pps_sample_per_source",
    "q207_value_welch_ttest",
    "q224_source_lang_mutual_info",
    "q228_grouped_ols_regression",
    "q268_forecast_backtest",
]


@pytest.fixture(scope="module")
def singleton_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("singleton") / "sf0.001")
    info = singleton_fixtures.singletonify_dir(
        "/root/testdata/sf0.001", dst
    )
    # the adversary must be real: all four singletons planted
    assert "singleton_event_id" in info
    assert "singleton_doc_id" in info
    assert "singleton_custkey" in info
    assert "singleton_orderkey" in info
    return dst


@pytest.fixture(scope="module")
def duck(singleton_dir):
    con = duckdb.connect()
    for t in singleton_fixtures.TABLES:
        p = os.path.join(singleton_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


def test_size_prone_queries_survive_singletons(spark, singleton_dir, duck):
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = [n for n in SIZE_PRONE if n not in qs or n not in oracles]
    assert not missing, f"subset names drifted: {missing}"

    failures = []
    for name in SIZE_PRONE:
        spark_pdf = qs[name](spark, singleton_dir).toPandas()
        duck_pdf = duck.execute(oracles[name]).fetchdf()
        problems = check_oracle.compare(name, spark_pdf, duck_pdf)
        if problems:
            failures.append((name, problems))
    assert not failures, failures
