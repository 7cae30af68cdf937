"""Constant-collapse invariance gate — the seventh data-shape
adversary (shuffle → order, skew → hot keys, nullify → missing
values, extremes → magnitudes, ties → equal timestamps, unitext →
ASCII-only luck, const → variance luck).

Every statistics kernel divides by something — stddev, Σ(x−x̄)²,
max−min, distinct counts — and the clean fixtures guarantee every
group is dispersed, so every denominator has been accidentally
nonzero. tools/const_fixtures.py collapses the modal event_type's
values to one constant (zero variance inside the partition
z-scores/t-tests/correlations use), the modal day's values to
another (a zero-dispersion point in daily series kernels), and the
modal source's documents to one identical sentence (token variance
gone, a source-sized exact-duplicate cluster — the degenerate limit
the 30% skew adversary only approaches).

This adversary found TWO real bugs on its first run in round 11:
q53's z-score CRASHED with an ANSI DIVIDE_BY_ZERO on the
zero-variance group (now an explicit NULL contract in both
engines), and q172's DSIR score landed exactly on a 6-digit
rounding half-boundary (wsum5=47943, n_grams=60 → 0.0079905) where
Spark's BigDecimal HALF_UP and DuckDB's scaled-double ROUND
legitimately disagree — the finish now computes half-up rounding in
exact BIGINT rational arithmetic on both sides.
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


const_fixtures = _load_tool("const_fixtures")
check_oracle = _load_tool("check_oracle")

# Every query whose denominator the collapse can zero out, plus the
# dedup family meeting a source-sized exact-duplicate cluster.
VARIANCE_PRONE = [
    "q53_group_zscore",
    "q66_dedup_clusters",
    "q80_per_source_dup_stats",
    "q137_daily_event_anomaly",
    "q165_robust_outlier_stats",
    "q167_cusum_changepoint",
    "q169_daily_autocorrelation",
    "q172_dsir_importance",
    "q177_ks_source_drift",
    "q181_lexical_entropy",
    "q182_psi_drift",
    "q184_bigram_surprisal",
    "q207_value_welch_ttest",
    "q208_dup_cluster_size_census",
    "q228_grouped_ols_regression",
    "q239_spearman_correlation",
    "q253_mann_whitney_u",
    "q255_theil_sen_trend",
    "q266_durbin_watson",
    "q272_dedup_capture_recapture",
]


@pytest.fixture(scope="module")
def const_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("const") / "sf0.001")
    info = const_fixtures.constify_dir("/root/testdata/sf0.001", dst)
    # the adversary must be real: all three collapses landed
    assert info["n_flat_type"] > 1
    assert info["n_flat_day"] > 1
    assert info["n_mirrored"] > 1
    return dst


@pytest.fixture(scope="module")
def duck(const_dir):
    con = duckdb.connect()
    for t in const_fixtures.TABLES:
        p = os.path.join(const_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


def test_variance_prone_queries_survive_collapse(spark, const_dir, duck):
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = [n for n in VARIANCE_PRONE if n not in qs or n not in oracles]
    assert not missing, f"subset names drifted: {missing}"

    failures = []
    for name in VARIANCE_PRONE:
        spark_pdf = qs[name](spark, const_dir).toPandas()
        duck_pdf = duck.execute(oracles[name]).fetchdf()
        problems = check_oracle.compare(name, spark_pdf, duck_pdf)
        if problems:
            failures.append((name, problems))
    assert not failures, failures
