"""Salted join equivalence, column profiler, partitioned-lake
pruning."""

import os

from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.operators.profile import profile_columns
from cr_data_pipeline_project_spark.operators.skew import salted_join
from cr_data_pipeline_project_spark.pipeline import Lake


def test_salted_join_equals_plain_join(spark):
    # heavy skew: one hot key dominating
    skewed = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(k, 0) for k in range(2, 10)],
        "k long, payload long",
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 10)], "k long, name string"
    )
    plain = sorted(
        tuple(r) for r in skewed.join(small, "k").select("k", "payload", "name").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(skewed, small, ["k"], salt=4)
        .select("k", "payload", "name")
        .collect()
    )
    assert plain == salted


def test_salted_join_left_keeps_unmatched(spark):
    skewed = spark.createDataFrame([(1, 1), (99, 2)], "k long, payload long")
    small = spark.createDataFrame([(1, "one")], "k long, name string")
    out = {
        r["k"]: r["name"]
        for r in salted_join(skewed, small, ["k"], salt=4, how="left").collect()
    }
    assert out == {1: "one", 99: None}


def test_profile_columns_single_pass(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", None), ("a", 3)], "s string, x int"
    )
    out = {r["column_name"]: r for r in profile_columns(df, ["s", "x"]).collect()}
    assert out["s"]["n_rows"] == 3 and out["s"]["n_nulls"] == 0
    assert out["s"]["n_distinct"] == 2
    assert out["x"]["n_nulls"] == 1 and out["x"]["n_distinct"] == 2
    assert out["x"]["min_str"] == "1" and out["x"]["max_str"] == "3"


def test_asof_join_keeps_colliding_left_rows(spark):
    """Two left rows sharing (key, ts) must BOTH survive — the max-by
    window partitions by the unique left id, not (key, ts)."""
    import datetime as dt

    from cr_data_pipeline_project_spark.operators.rangejoin import as_of_join

    t = dt.datetime(2024, 1, 1, 12, 0)
    left = spark.createDataFrame(
        [(1, 7, t), (2, 7, t), (3, 7, dt.datetime(2023, 1, 1))],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, dt.datetime(2024, 1, 1, 0, 0), "recent"),
         (7, dt.datetime(2020, 1, 1), "old")],
        "k long, rts timestamp, tag string",
    )
    out = {
        r["event_id"]: r["tag"]
        for r in as_of_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts", left_id="event_id"
        ).collect()
    }
    assert out == {1: "recent", 2: "recent", 3: "old"}


def test_lake_partitioned_matches_prunes(spark, tmp_path):
    import datetime as dt

    from cr_data_pipeline_project_spark import schemas

    lake = Lake(spark, os.path.join(str(tmp_path), "lake"))
    rows = [
        (1, "k1", dt.datetime(2025, 1, 10), True, 7, "#A", "#B", "2025-01",
         1, 1800, 25, 2, 1, 5000, 100, 200, None),
        (2, "k2", dt.datetime(2025, 2, 10), False, 7, "#A", "#B", "2025-02",
         1, 1825, -20, 0, 3, 4000, 0, 0, None),
    ]
    lake.append("matches", spark.createDataFrame(rows, schemas.MATCHES))
    # hive layout on disk
    assert os.path.isdir(os.path.join(lake.path("matches"), "season_id=2025-01"))
    got = lake.read("matches").where(F.col("season_id") == "2025-01")
    assert got.count() == 1
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "season_id" in plan.split(
        "PartitionFilters"
    )[1][:120]


def test_salted_join_rejects_row_multiplying_how(spark):
    import pytest

    from cr_data_pipeline_project_spark.operators.skew import salted_join as sj

    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([(1, "y")], "k int, w string")
    with pytest.raises(ValueError, match="inner/left/left_semi"):
        sj(a, b, ["k"], salt=4, how="right")
    with pytest.raises(ValueError, match="inner/left/left_semi"):
        sj(a, b, ["k"], salt=4, how="full")


def test_interval_join_bucketed_left_restores_unmatched(spark):
    """how='left': facts outside every interval survive with NULL
    interval attributes (previously untested path)."""
    import datetime as dt

    from cr_data_pipeline_project_spark.operators.rangejoin import (
        interval_join_bucketed,
    )

    fact = spark.createDataFrame(
        [(1, dt.datetime(2025, 1, 10)), (2, dt.datetime(2030, 6, 15))],
        "fact_id int, ts timestamp",
    )
    ivals = spark.createDataFrame(
        [("S1", dt.datetime(2025, 1, 1), dt.datetime(2025, 2, 1))],
        "season_id string, sn_start_date timestamp, sn_end_date timestamp",
    )
    out = interval_join_bucketed(
        fact, ivals, "ts", how="left"
    )
    rows = {r["fact_id"]: r["season_id"] for r in out.collect()}
    assert rows == {1: "S1", 2: None}


def test_interval_join_bucketed_left_rejects_shared_names(spark):
    import datetime as dt

    import pytest

    from cr_data_pipeline_project_spark.operators.rangejoin import (
        interval_join_bucketed,
    )

    fact = spark.createDataFrame(
        [(1, dt.datetime(2025, 1, 10), "x")],
        "fact_id int, ts timestamp, season_id string",
    )
    ivals = spark.createDataFrame(
        [("S1", dt.datetime(2025, 1, 1), dt.datetime(2025, 2, 1))],
        "season_id string, sn_start_date timestamp, sn_end_date timestamp",
    )
    with pytest.raises(ValueError, match="disjoint"):
        interval_join_bucketed(fact, ivals, "ts", how="left")


def test_interval_overlap_join_bounds_and_buckets(spark):
    """interval_overlap_join: inclusive bounds (touching endpoints
    DO overlap), disjoint intervals don't, multi-bucket spans dedupe
    to one pair row, and the bucketed result equals the naive
    non-equi join."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cr_data_pipeline_project_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    d = dt.datetime
    left = spark.createDataFrame(
        [
            (1, d(2024, 1, 1, 7, 0), d(2024, 1, 1, 8, 0)),    # touches start
            (2, d(2024, 1, 1, 9, 30), d(2024, 1, 1, 12, 15)),  # spans 4 buckets
            (3, d(2024, 1, 1, 10, 0, 0, 1), d(2024, 1, 1, 11, 0)),  # misses by 1us
            (4, d(2024, 1, 2, 8, 30), d(2024, 1, 2, 8, 45)),   # inside
        ],
        "lid int, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [
            ("w1", d(2024, 1, 1, 8, 0), d(2024, 1, 1, 10, 0)),
            ("w2", d(2024, 1, 2, 8, 0), d(2024, 1, 2, 10, 0)),
        ],
        "rid string, rs timestamp, re timestamp",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re",
            left_keys=["lid"], right_keys=["rid"], bucket="hour",
        ).collect()
    )
    assert got == [(1, "w1"), (2, "w1"), (4, "w2")]
    naive = sorted(
        (r.lid, r.rid)
        for r in left.join(
            right,
            (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")),
        ).collect()
    )
    assert got == naive


def test_interval_overlap_join_guards(spark):
    """Round-10 hardening: shared column names, inverted intervals,
    and runaway (open-ended) spans all raise loud ValueErrors
    instead of failing ambiguously or silently exploding the
    calendar sequence; bucket='auto' picks a granularity from the
    observed p99 span and still matches the naive non-equi join."""
    import datetime as dt

    import pytest

    from cr_data_pipeline_project_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    d = dt.datetime
    left = spark.createDataFrame(
        [
            (1, d(2024, 1, 1, 7, 0), d(2024, 1, 1, 8, 0)),
            (2, d(2024, 1, 1, 9, 30), d(2024, 1, 1, 12, 15)),
        ],
        "lid int, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [("w1", d(2024, 1, 1, 8, 0), d(2024, 1, 1, 10, 0))],
        "rid string, rs timestamp, re timestamp",
    )

    # shared column name → loud, not an ambiguous-reference error
    with pytest.raises(ValueError, match="disjoint"):
        interval_overlap_join(
            left, right.withColumnRenamed("rid", "lid"),
            "ls", "le", "rs", "re", left_keys=["lid"], right_keys=["lid"],
        )

    # inverted interval (end < start) → loud, not a cryptic
    # F.sequence step error
    inverted = spark.createDataFrame(
        [(9, d(2024, 1, 1, 12, 0), d(2024, 1, 1, 7, 0))],
        "lid int, ls timestamp, le timestamp",
    )
    with pytest.raises(ValueError, match="inverted"):
        interval_overlap_join(
            inverted, right, "ls", "le", "rs", "re",
            left_keys=["lid"], right_keys=["rid"], bucket="hour",
        )

    # one pathological open-ended interval (a year-long "incident")
    # at hour buckets → 8,760-bucket calendar explosion refused
    open_ended = spark.createDataFrame(
        [(7, d(2024, 1, 1, 0, 0), d(2025, 1, 1, 0, 0))],
        "lid int, ls timestamp, le timestamp",
    )
    with pytest.raises(ValueError, match="span"):
        interval_overlap_join(
            open_ended, right, "ls", "le", "rs", "re",
            left_keys=["lid"], right_keys=["rid"], bucket="hour",
            max_span_buckets=1000,
        )
    # ...but a coarser bucket bounds the same data fine, and
    # 'auto' picks one that matches the naive join
    from pyspark.sql import functions as F

    both = left.unionByName(open_ended)
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            both, right, "ls", "le", "rs", "re",
            left_keys=["lid"], right_keys=["rid"], bucket="auto",
        ).collect()
    )
    naive = sorted(
        (r.lid, r.rid)
        for r in both.join(
            right,
            (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")),
        ).collect()
    )
    assert got == naive

    # unknown bucket name → loud
    with pytest.raises(ValueError, match="unsupported bucket"):
        interval_overlap_join(
            left, right, "ls", "le", "rs", "re",
            left_keys=["lid"], right_keys=["rid"], bucket="fortnight",
        )


def test_interval_overlap_join_null_bounds_refused(spark):
    """Round-10 ADVICE: rows with NULL start/end previously sailed
    through validation (min/max skip nulls) and were then silently
    dropped by the null F.sequence — a caller trusting validate=True
    lost rows with no signal. Null bounds on EITHER side must now
    fail validation loudly, counted per side."""
    import datetime as dt

    import pytest

    from cr_data_pipeline_project_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    d = dt.datetime
    left = spark.createDataFrame(
        [
            (1, d(2024, 1, 1, 7, 0), d(2024, 1, 1, 8, 0)),
            (2, None, d(2024, 1, 1, 9, 0)),
        ],
        "lid int, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [("w1", d(2024, 1, 1, 8, 0), d(2024, 1, 1, 10, 0))],
        "rid string, rs timestamp, re timestamp",
    )
    with pytest.raises(ValueError, match="NULL interval bounds"):
        interval_overlap_join(
            left, right, "ls", "le", "rs", "re",
            left_keys=["lid"], right_keys=["rid"], bucket="hour",
        )
    # null end on the RIGHT side is caught too
    right_null = spark.createDataFrame(
        [("w1", d(2024, 1, 1, 8, 0), None)],
        "rid string, rs timestamp, re timestamp",
    )
    with pytest.raises(ValueError, match="1 right"):
        interval_overlap_join(
            left.where("ls is not null"), right_null,
            "ls", "le", "rs", "re",
            left_keys=["lid"], right_keys=["rid"], bucket="hour",
        )


def test_interval_overlap_join_validate_opt_out(spark):
    """validate=False skips the span-stats job but then requires an
    explicit bucket (auto needs the observed spans); results match
    the validated path."""
    import datetime as dt

    import pytest

    from cr_data_pipeline_project_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    d = dt.datetime
    left = spark.createDataFrame(
        [(1, d(2024, 1, 1, 7, 0), d(2024, 1, 1, 8, 0))],
        "lid int, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [("w1", d(2024, 1, 1, 8, 0), d(2024, 1, 1, 10, 0))],
        "rid string, rs timestamp, re timestamp",
    )
    with pytest.raises(ValueError, match="explicit bucket"):
        interval_overlap_join(
            left, right, "ls", "le", "rs", "re",
            left_keys=["lid"], right_keys=["rid"], validate=False,
        )
    got = interval_overlap_join(
        left, right, "ls", "le", "rs", "re",
        left_keys=["lid"], right_keys=["rid"],
        bucket="hour", validate=False,
    ).collect()
    assert [(r.lid, r.rid) for r in got] == [(1, "w1")]


def test_interval_overlap_join_random_granularity_sweep(spark):
    """Seeded randomized sweep across bucket granularities: random
    interval sets (seconds-long to days-long, touching endpoints,
    containment, zero-length points) must match the naive non-equi
    join at EVERY granularity coarse enough for the span guard —
    a bucket-boundary bug (truncation vs sequence step mismatch)
    shows up as a missing or duplicated pair at exactly one
    granularity."""
    import datetime as dt
    import random

    from pyspark.sql import functions as F

    from cr_data_pipeline_project_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    rng = random.Random(262)
    base = dt.datetime(2024, 3, 1)

    def intervals(n, max_span_s):
        out = []
        for i in range(n):
            start = base + dt.timedelta(seconds=rng.randrange(14 * 86400))
            span = rng.choice(
                (0, 1, 59, 60, 3599, 3600, rng.randrange(max_span_s + 1))
            )
            out.append((i, start, start + dt.timedelta(seconds=span)))
        return out

    left = spark.createDataFrame(
        intervals(60, 6 * 3600), "lid int, ls timestamp, le timestamp"
    )
    right = spark.createDataFrame(
        [(f"r{i}", s, e) for i, s, e in intervals(25, 2 * 86400)],
        "rid string, rs timestamp, re timestamp",
    )
    naive = sorted(
        (r.lid, r.rid)
        for r in left.join(
            right,
            (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")),
        ).collect()
    )
    assert naive  # the fixture must actually overlap
    for bucket in ("minute", "hour", "day", "week", "auto"):
        got = sorted(
            (r.lid, r.rid)
            for r in interval_overlap_join(
                left, right, "ls", "le", "rs", "re",
                left_keys=["lid"], right_keys=["rid"],
                bucket=bucket, max_span_buckets=10_000,
            ).collect()
        )
        assert got == naive, bucket
