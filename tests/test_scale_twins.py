"""Sketch-based scale twins vs their exact oracle-checkable
baselines: the approx result must track the exact one within declared
tolerances at fixture scale."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.plans.llm_queries import (
    q69_doc_length_deciles,
    q72_deciles_scale,
)
from cr_data_pipeline_project_spark.plans.reference_queries import (
    q50_column_profile,
    q73_column_profile_approx,
)


def test_deciles_scale_agrees_with_exact_ntile(spark, sf_dir):
    exact = {
        r["doc_id"]: r["decile"] for r in q69_doc_length_deciles(spark, sf_dir).collect()
    }
    approx = {
        r["doc_id"]: r["decile"] for r in q72_deciles_scale(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    diffs = [abs(exact[k] - approx[k]) for k in exact]
    agree = sum(1 for d in diffs if d == 0) / len(diffs)
    # cut-point bucketing keeps ties together, NTILE splits them —
    # identical for most rows, never further than one decile apart
    assert agree >= 0.85, agree
    assert max(diffs) <= 1, max(diffs)


def test_quality_tiers_scale_agrees_with_exact_ntile(spark, sf_dir):
    """q122 (sketch-cutpoint quartiles) vs q120 (exact global NTILE):
    row-level tier assignment must agree ≥85% and never differ by
    more than one tier, and the aggregate must conserve the corpus
    exactly (same doc count and token mass across tiers)."""
    from pyspark.sql.window import Window

    from cr_data_pipeline_project_spark.operators import textstats
    from cr_data_pipeline_project_spark.operators.groupstats import (
        quantile_buckets,
    )
    from cr_data_pipeline_project_spark.catalog import table
    from cr_data_pipeline_project_spark.plans.llm_queries import (
        q120_quality_tier_budgets,
        q122_quality_tiers_scale,
    )

    docs = table(spark, "documents", sf_dir)
    scored = textstats.quality_score(
        docs.select("doc_id", "text"), "text"
    ).select("doc_id", "n_tokens", F.col("quality_score").alias("__q"))
    w = Window.orderBy(F.col("__q"), F.col("doc_id"))
    exact = {
        r["doc_id"]: r["tier"]
        for r in scored.withColumn("tier", F.ntile(4).over(w)).collect()
    }
    approx = {
        r["doc_id"]: r["bucket"]
        for r in quantile_buckets(scored, "__q", n_buckets=4).collect()
    }
    assert set(exact) == set(approx)
    diffs = [abs(exact[k] - approx[k]) for k in exact]
    agree = sum(1 for d in diffs if d == 0) / len(diffs)
    assert agree >= 0.85, agree
    assert max(diffs) <= 1, max(diffs)

    # the tier-level outputs conserve the corpus exactly
    e = q120_quality_tier_budgets(spark, sf_dir).collect()
    a = q122_quality_tiers_scale(spark, sf_dir).collect()
    assert {r["tier"] for r in a} <= {1, 2, 3, 4}
    assert sum(r["n_docs"] for r in a) == sum(r["n_docs"] for r in e)
    assert sum(r["total_tokens"] for r in a) == sum(
        r["total_tokens"] for r in e
    )


def test_rolling_distinct_sketch_tracks_exact(spark, sf_dir):
    """q128 (per-day HLL sketches unioned over a 7-day window) must
    track the exact rolling distinct within 5% per day (lgK=12 ⇒
    rsd≈1.6%, 3σ≈5%) and cover every day the exact path covers."""
    from cr_data_pipeline_project_spark.catalog import table
    from cr_data_pipeline_project_spark.plans.llm_queries import (
        q128_rolling_distinct_sketch,
    )

    approx = {
        r["day"]: r["approx_users_7d"]
        for r in q128_rolling_distinct_sketch(spark, sf_dir).collect()
    }
    ev = table(spark, "events", sf_dir).select(
        F.to_date("ts").alias("day"), "user_id"
    )
    days = ev.select("day").distinct()
    exact = {
        r["day"]: r["n"]
        for r in days.alias("s")
        .join(
            ev.alias("e"),
            (F.col("e.day") <= F.col("s.day"))
            & (F.col("e.day") >= F.date_sub(F.col("s.day"), 6)),
        )
        .groupBy(F.col("s.day").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for d, n in exact.items():
        assert abs(approx[d] - n) <= max(2, 0.05 * n), (d, approx[d], n)


def test_approx_profile_tracks_exact(spark, sf_dir):
    exact = {
        r["column_name"]: r for r in q50_column_profile(spark, sf_dir).collect()
    }
    approx = {
        r["column_name"]: r
        for r in q73_column_profile_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for c, e in exact.items():
        a = approx[c]
        # everything except the sketch estimate is exact
        assert a["n_rows"] == e["n_rows"]
        assert a["n_nulls"] == e["n_nulls"]
        assert a["min_str"] == e["min_str"]
        assert a["max_str"] == e["max_str"]
        # HLL++ at rsd=0.02: allow 5% (≈2.5 sigma)
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(
            1, 0.05 * e["n_distinct"]
        ), (c, a["n_distinct"], e["n_distinct"])


def test_exact_profile_plans_no_expand(spark, sf_dir):
    """The r02 regression: >1 countDistinct in one aggregate plans an
    Expand that replicates every row per distinct column. The exact
    profiler must stay Expand-free."""
    plan = q50_column_profile(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan


def test_semantic_dedup_export_scale_twin_agrees(spark, sf_dir):
    """q199 (bucketed SemDeDup export) vs q193 (all-pairs exactness
    baseline) at fixture scale: identical kept sets when the
    bucketed pair recall is total, and structurally valid either
    way (one representative per component, kept ⊆ corpus,
    representatives are component-quality argmaxes)."""
    from cr_data_pipeline_project_spark.plans import all_queries

    qs = all_queries()
    exact = qs["q193_semantic_dedup_export"](spark, sf_dir).collect()
    scale = qs["q199_semantic_dedup_export_scale"](spark, sf_dir).collect()

    kept_exact = {r["doc_id"] for r in exact}
    kept_scale = {r["doc_id"] for r in scale}
    # multi-probe assignment recovers every fixture pair (planted
    # dups are FAR above the 0.45 threshold); agreement must be
    # near-total — allow a one-doc wobble for a boundary-straddling
    # pair, no more
    assert len(kept_exact.symmetric_difference(kept_scale)) <= 2, (
        len(kept_exact), len(kept_scale)
    )
    # structural invariants hold regardless of recall
    comps = {}
    for r in scale:
        assert r["component_id"] not in comps  # one rep per component
        comps[r["component_id"]] = r["doc_id"]
