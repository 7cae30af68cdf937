"""Drift kernels (operators/drift.py): review-flagged edge cases the
oracle can't see — null monitored values, empty reference — plus an
independent scipy-free KS recompute."""

from pyspark.sql import Row, functions as F

from cr_data_pipeline_project_spark.operators import drift


def _counts(spark, vals):
    df = spark.createDataFrame(
        [Row(x=v) for v in vals], "x: long"
    )
    return drift.value_counts(df, "x")


def test_ks_identical_distributions_with_nulls_is_zero(spark):
    """A nullable monitored column: both sides hold the same
    multiset (incl. NULLs) — KS must be exactly 0. A non-null-safe
    full-outer merge produced two separate NULL rows and a phantom
    CDF step (review finding)."""
    vals = [1, 2, 2, 3, None, None]
    a, b = _counts(spark, vals), _counts(spark, vals)
    row = drift.ks_from_counts(a, b).collect()[0]
    assert row["ks_num"] == 0 and row["ks_stat"] == 0.0
    assert row["n1"] == len(vals) and row["n2"] == len(vals)


def test_ks_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    va = [rng.randrange(20) for _ in range(300)]
    vb = [rng.randrange(25) for _ in range(200)]
    row = drift.ks_from_counts(
        _counts(spark, va), _counts(spark, vb)
    ).collect()[0]
    n1, n2 = len(va), len(vb)
    want = max(
        abs(sum(1 for x in va if x <= v) * n2 - sum(1 for x in vb if x <= v) * n1)
        for v in set(va) | set(vb)
    )
    assert row["ks_num"] == want
    assert row["ks_stat"] == round(want / (n1 * n2), 6)


def test_psi_empty_reference_signals_drift_not_stable(spark):
    """An empty reference must NOT annihilate the live side into a
    0.0 'stable' verdict (review finding: cross-join with an empty
    cut table dropped every live row). With no cuts, all live mass
    lands in bin 1 and PSI is large."""
    ref = _counts(spark, [])
    live = _counts(spark, [1, 2, 3, 4, 5] * 20)
    rows = drift.psi_from_counts(ref, live).collect()
    assert len(rows) == 10
    by_bin = {r["bin"]: r for r in rows}
    # nothing annihilated: every live row still counted somewhere
    assert sum(r["live_n"] for r in rows) == 100
    assert sum(r["ref_n"] for r in rows) == 0
    psi = by_bin[10]["psi_cum"]
    assert psi > 0.25, psi  # 'shifted' verdict, not silent stable


def test_psi_identical_distributions_near_zero(spark):
    vals = list(range(100)) * 5
    rows = drift.psi_from_counts(
        _counts(spark, vals), _counts(spark, vals)
    ).collect()
    psi = {r["bin"]: r for r in rows}[10]["psi_cum"]
    assert abs(psi) < 1e-6, psi
    # every decile bin carries ~equal reference mass (exact quantile
    # cuts on 500 uniform rows)
    ns = [r["ref_n"] for r in rows]
    assert min(ns) > 0 and max(ns) <= 2 * min(ns)


def test_psi_detects_shift(spark):
    ref = _counts(spark, list(range(100)) * 5)
    live = _counts(spark, [v + 60 for v in range(100)] * 5)
    rows = drift.psi_from_counts(ref, live).collect()
    psi = {r["bin"]: r for r in rows}[10]["psi_cum"]
    assert psi > 0.25, psi
