"""Sketch-based approximate aggregates: error bounds the gate can't
hash-check."""

from cr_data_pipeline_project_spark.plans import all_queries


def test_approx_distinct_within_5pct(spark, sf_dir):
    row = all_queries()["q47_approx_distinct"](spark, sf_dir).collect()[0]
    approx, exact = row["approx_parts"], row["exact_parts"]
    assert exact > 0
    assert abs(approx - exact) / exact < 0.05, (approx, exact)
