"""SCD type-2 interval derivation from a change feed."""

from datetime import datetime

from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.operators.scd import scd2_intervals


def _ts(s):
    return datetime.fromisoformat(s)


def test_scd2_runs_collapse(spark):
    rows = [
        (1, "free", _ts("2024-01-01T00:00:00")),
        (1, "free", _ts("2024-01-02T00:00:00")),  # no change → merged
        (1, "pro", _ts("2024-01-03T00:00:00")),
        (1, "pro", _ts("2024-01-04T00:00:00")),
        (1, "free", _ts("2024-01-05T00:00:00")),  # value returns → new run
        (2, "pro", _ts("2024-01-01T00:00:00")),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp"
    )
    got = sorted(
        scd2_intervals(df, "user_id", "event_type", "ts").collect(),
        key=lambda r: (r.user_id, r.valid_from),
    )
    assert [(r.user_id, r.state) for r in got] == [
        (1, "free"),
        (1, "pro"),
        (1, "free"),
        (2, "pro"),
    ]
    # intervals chain: valid_to of run i == valid_from of run i+1
    assert got[0].valid_from == _ts("2024-01-01T00:00:00")
    assert got[0].valid_to == _ts("2024-01-03T00:00:00")
    assert got[1].valid_to == _ts("2024-01-05T00:00:00")
    assert got[2].valid_to is None  # current value
    assert got[3].valid_to is None


def test_scd2_tie_deterministic(spark):
    """Two different values at the same timestamp order by the value
    tiebreak — same answer on every run/partitioning."""
    rows = [
        (1, "b", _ts("2024-01-01T00:00:00")),
        (1, "a", _ts("2024-01-01T00:00:00")),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp"
    )
    got = scd2_intervals(df, "user_id", "event_type", "ts").collect()
    states = [r.state for r in sorted(got, key=lambda r: (r.state))]
    assert states == ["a", "b"]


def test_state_at_covers_every_event_once(spark):
    rows = [
        (1, "free", _ts("2024-01-01T00:00:00")),
        (1, "pro", _ts("2024-01-03T00:00:00")),
        (1, "free", _ts("2024-01-05T00:00:00")),
        (2, "pro", _ts("2024-01-02T00:00:00")),
    ]
    feed = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp"
    )
    from cr_data_pipeline_project_spark.operators.scd import state_at

    hist = scd2_intervals(feed, "user_id", "event_type", "ts")
    facts = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-02T12:00:00")),  # inside run 1
            (101, 1, _ts("2024-01-03T00:00:00")),  # AT a boundary → new run
            (102, 1, _ts("2024-01-09T00:00:00")),  # open interval
            (103, 2, _ts("2024-01-02T00:00:01")),
            (104, 2, _ts("2024-01-01T00:00:00")),  # before first run
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    got = {
        r.event_id: r.state
        for r in state_at(facts, hist, "user_id", "ts").collect()
    }
    assert got == {100: "free", 101: "pro", 102: "free", 103: "pro"}
    # 'left' keeps uncovered facts with NULL state
    left = {
        r.event_id: r.state
        for r in state_at(facts, hist, "user_id", "ts", how="left").collect()
    }
    assert left[104] is None and len(left) == 5


def test_scd2_delete_events_close_intervals(spark):
    """CDC-tombstone-shaped feed: a delete closes the open interval at
    its ts (no current row until a re-add); consecutive deletes
    collapse; a delete carrying a value normalizes to the same
    sentinel; a delete for an absent key contributes nothing."""
    rows = [
        (1, "free", False, _ts("2024-01-01T00:00:00")),
        (1, "pro", False, _ts("2024-01-03T00:00:00")),
        (1, None, True, _ts("2024-01-05T00:00:00")),    # delete
        (1, "junk", True, _ts("2024-01-06T00:00:00")),  # dup delete w/ value
        (1, "free", False, _ts("2024-01-08T00:00:00")), # re-add
        (2, "pro", False, _ts("2024-01-01T00:00:00")),
        (2, None, True, _ts("2024-01-02T00:00:00")),    # deleted, stays gone
        (3, None, True, _ts("2024-01-01T00:00:00")),    # delete absent key
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, is_delete boolean, ts timestamp"
    )
    got = sorted(
        scd2_intervals(
            df, "user_id", "event_type", "ts", delete_col="is_delete"
        ).collect(),
        key=lambda r: (r.user_id, r.valid_from),
    )
    assert [(r.user_id, r.state) for r in got] == [
        (1, "free"),
        (1, "pro"),
        (1, "free"),
        (2, "pro"),
    ]
    # the delete's ts closes the run it follows
    assert got[1].valid_to == _ts("2024-01-05T00:00:00")
    assert got[2].valid_from == _ts("2024-01-08T00:00:00")
    assert got[2].valid_to is None
    assert got[3].valid_to == _ts("2024-01-02T00:00:00")  # key 2: closed, gone
    # user 3 (delete before any add) emits nothing; user 2 has no
    # current row
    assert all(r.user_id != 3 for r in got)
    current = [r for r in got if r.valid_to is None]
    assert [(r.user_id, r.state) for r in current] == [(1, "free")]


def test_scd2_delete_col_null_reads_as_upsert(spark):
    rows = [
        (1, "a", None, _ts("2024-01-01T00:00:00")),
        (1, "b", False, _ts("2024-01-02T00:00:00")),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, is_delete boolean, ts timestamp"
    )
    got = scd2_intervals(
        df, "user_id", "event_type", "ts", delete_col="is_delete"
    ).collect()
    assert sorted((r.user_id, r.state) for r in got) == [(1, "a"), (1, "b")]


def test_scd2_delete_none_equals_plain(spark):
    """delete_col=None must reproduce the original two-window plan
    exactly on a delete-free feed (same rows, same intervals)."""
    rows = [
        (1, "x", _ts("2024-01-01T00:00:00")),
        (1, "y", _ts("2024-01-02T00:00:00")),
        (2, "x", _ts("2024-01-01T00:00:00")),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp"
    ).withColumn("no_del", F.lit(False))
    plain = sorted(
        map(tuple, scd2_intervals(df, "user_id", "event_type", "ts")
            .select("user_id", "state", "valid_from", "valid_to").collect())
    )
    deled = sorted(
        map(tuple, scd2_intervals(
            df, "user_id", "event_type", "ts", delete_col="no_del"
        ).select("user_id", "state", "valid_from", "valid_to").collect())
    )
    assert plain == deled


def test_scd2_same_ts_delete_vs_upsert_is_deterministic(spark):
    """An upsert and a delete sharing (key, ts) must resolve the same
    way on every run: the delete orders LAST (tombstone wins — the
    CDC in-batch rule), regardless of input row order."""
    for order in ([0, 1], [1, 0]):
        rows = [
            (1, "a", False, _ts("2024-01-01T00:00:00")),
            (1, None, True, _ts("2024-01-01T00:00:00")),
        ]
        df = spark.createDataFrame(
            [rows[i] for i in order],
            "user_id bigint, event_type string, is_delete boolean, ts timestamp",
        ).repartition(4)
        got = scd2_intervals(
            df, "user_id", "event_type", "ts", delete_col="is_delete"
        ).collect()
        # the upsert's run exists, closed at the same instant; no
        # current row survives
        assert [(r.user_id, r.state, r.valid_to is None) for r in got] == [
            (1, "a", False)
        ], order
