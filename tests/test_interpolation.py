"""q161 linear interpolation: the bracket semantics the fixture
can't exercise (it has no NULL values on non-error rows) — a
NULL-valued non-error row must not donate its timestamp while the
value comes from an earlier row."""

import datetime as dt
import os

from cr_data_pipeline_project_spark.plans.reference_queries import (
    q161_linear_interpolation,
)


def _events_dir(spark, tmp_path, rows):
    d = str(tmp_path / "synth_sf")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def _t(s):
    return dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)


def test_null_valued_bracket_rows_do_not_skew_anchor(spark, tmp_path):
    rows = [
        (1, 1, _t(0), "view", 5.0),
        (2, 1, _t(90), "view", None),   # non-error but valueless
        (3, 1, _t(100), "error", 777.0),
        (4, 1, _t(200), "view", 15.0),
    ]
    d = _events_dir(spark, tmp_path, rows)
    got = {
        r["event_id"]: r["value_interp"]
        for r in q161_linear_interpolation(spark, d).collect()
    }
    # the bracket is (t=0, 5.0) .. (t=200, 15.0): value AND timestamp
    # from the SAME rows — 5 + 10 * (100/200) = 10.0 exactly.
    assert got[3] == 10.0
    assert got[1] == 5.0 and got[4] == 15.0
    assert got[2] is None  # non-error rows keep their value verbatim


def test_edges_and_equal_timestamp_bracket(spark, tmp_path):
    rows = [
        # user 2: leading and trailing errors stay NULL
        (10, 2, _t(0), "error", 0.0),
        (11, 2, _t(10), "view", 4.0),
        (12, 2, _t(20), "error", 0.0),
        # user 3: bracket rows share one timestamp -> previous value,
        # no divide-by-zero
        (20, 3, _t(5), "view", 1.0),
        (21, 3, _t(5), "error", 0.0),
        (22, 3, _t(5), "view", 9.0),
    ]
    d = _events_dir(spark, tmp_path, rows)
    got = {
        r["event_id"]: r["value_interp"]
        for r in q161_linear_interpolation(spark, d).collect()
    }
    assert got[10] is None and got[12] is None  # unbracketed edges
    assert got[11] == 4.0
    assert got[21] == 1.0  # delta-t = 0 -> previous value
