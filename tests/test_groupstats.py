"""Group-wise z-score: exact vs applyInPandas agreement."""

from cr_data_pipeline_project_spark.catalog import table
from cr_data_pipeline_project_spark.operators.groupstats import (
    zscore_exact,
    zscore_pandas,
)


def test_exact_and_pandas_agree(spark, sf_dir):
    ev = table(spark, "events", sf_dir)
    a = {
        r["event_id"]: r["zscore"]
        for r in zscore_exact(ev, "event_type", "value", "event_id").collect()
    }
    b = {
        r["event_id"]: r["zscore"]
        for r in zscore_pandas(ev, "event_type", "value", "event_id").collect()
    }
    assert set(a) == set(b) and len(a) == ev.count()
    worst = max(abs(a[k] - b[k]) for k in a)
    assert worst <= 1e-6, worst  # both rounded to 6dp; ties may differ 1ulp


def test_zscore_moments(spark, sf_dir):
    import math

    ev = table(spark, "events", sf_dir)
    rows = zscore_exact(ev, "event_type", "value", "event_id").collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["zscore"])
    for vals in by_type.values():
        n = len(vals)
        assert abs(sum(vals) / n) < 1e-3  # mean ≈ 0
        var = sum(v * v for v in vals) / (n - 1)
        assert abs(var - 1.0) < 1e-2  # variance ≈ 1
        assert all(not math.isnan(v) for v in vals)


def test_anomaly_gate_rejects_float_threshold(spark, sf_dir):
    """The exact-integer gate squares z_threshold against BIGINT
    moments — a float caller must fail loudly, not silently demote
    the cross-engine bit-exactness contract (round-6 advisory)."""
    import pytest

    from cr_data_pipeline_project_spark.operators.groupstats import (
        daily_count_anomaly,
    )

    ev = table(spark, "events", sf_dir)
    daily = ev.groupBy(
        ev.event_type, ev.ts.cast("date").alias("d")
    ).count().withColumnRenamed("count", "c")
    with pytest.raises(TypeError, match="z_threshold must be int"):
        daily_count_anomaly(daily, z_threshold=2.5)
    with pytest.raises(TypeError, match="z_threshold must be int"):
        daily_count_anomaly(daily, z_threshold=True)
