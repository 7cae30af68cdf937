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
