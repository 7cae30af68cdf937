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


def test_unigram_kl_zero_for_identical_groups(spark):
    """Two groups with identical token distributions sit at KL ≈ 0
    (up to the ln-pinning quantum); a
    group spamming one token scores strictly higher."""
    from cr_data_pipeline_project_spark.operators.drift import unigram_kl

    same = "alpha beta gamma delta"
    rows = [("g1", same), ("g2", same)]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: r for r in unigram_kl(df, "text", "source").collect()}
    # both groups EQUAL the mixture → 0 up to the 1e-5 ln pinning
    # quantum (each pinned ln rounds independently, so the four
    # factors leave a ±quantum residue instead of cancelling)
    assert abs(got["g1"]["kl_nats"]) < 1e-4
    assert got["g1"]["kl_nats"] == got["g2"]["kl_nats"]
    assert got["g1"]["n_tokens"] == 4 and got["g1"]["distinct_tokens"] == 4

    # a group that skews the shared vocab diverges from the mixture
    rows2 = rows + [("g3", "alpha alpha alpha alpha alpha alpha")]
    df2 = spark.createDataFrame(rows2, "source string, text string")
    got2 = {
        r["source"]: r["kl_nats"]
        for r in unigram_kl(df2, "text", "source").collect()
    }
    assert got2["g1"] == got2["g2"]
    assert got2["g3"] > 0.0 and got2["g1"] > 0.0


def test_unigram_kl_matches_direct_formula(spark):
    """The sparse closed-form absent-mass identity equals the naive
    full-vocab smoothed KL computed in Python (up to the 1e-5 ln
    pinning)."""
    import math

    from collections import Counter

    from cr_data_pipeline_project_spark.operators.drift import unigram_kl

    rows = [
        ("a", "x x y z"),
        ("a", "x w"),
        ("b", "y y y q q z"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: r["kl_nats"] for r in unigram_kl(df, "text", "source").collect()}

    groups = {}
    for g, t in rows:
        groups.setdefault(g, []).extend(t.split(" "))
    corpus = Counter(w for ws in groups.values() for w in ws)
    V, n_c = len(corpus), sum(corpus.values())
    for g, ws in groups.items():
        cg = Counter(ws)
        n_g = len(ws)
        kl = 0.0
        for w in corpus:
            pg = (cg[w] + 1) / (n_g + V)
            pc = (corpus[w] + 1) / (n_c + V)
            kl += pg * math.log(pg / pc)
        assert abs(got[g] - kl) < 1e-4, (g, got[g], kl)
