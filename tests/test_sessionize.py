"""Gap-based sessionization (operators/sessionize.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.operators.sessionize import (
    session_stats,
    sessionize,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, u, datetime(2024, 1, 1, h, m, s)) for i, (u, h, m, s) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp",
    )


def test_gap_splits_sessions(spark):
    df = _ev(
        spark,
        [
            (1, 10, 0, 0),
            (1, 10, 20, 0),   # 20 min gap -> same session
            (1, 11, 0, 0),    # 40 min gap -> new session
            (1, 11, 10, 0),
            (2, 9, 0, 0),     # other user: independent numbering
        ],
    )
    out = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in sessionize(df, gap_minutes=30, order_tiebreak="event_id").collect()
    }
    assert out[(1, 0)] == 1 and out[(1, 1)] == 1
    assert out[(1, 2)] == 2 and out[(1, 3)] == 2
    assert out[(2, 4)] == 1


def test_exact_gap_stays_in_session(spark):
    # strict > starts a new session: exactly 30 minutes apart = same
    df = _ev(spark, [(1, 10, 0, 0), (1, 10, 30, 0), (1, 11, 0, 1)])
    idx = [
        r["session_idx"]
        for r in sessionize(df, gap_minutes=30, order_tiebreak="event_id")
        .orderBy("event_id")
        .collect()
    ]
    assert idx == [1, 1, 2]  # 30:00 same; 30:01 over the gap


def test_session_stats_duration_exact(spark):
    df = _ev(spark, [(1, 10, 0, 0), (1, 10, 5, 30), (1, 12, 0, 0)])
    rows = {
        r["session_idx"]: r
        for r in session_stats(df, gap_minutes=30).collect()
    }
    assert rows[1]["n_events"] == 2
    assert rows[1]["duration_sec"] == 330
    assert rows[2]["n_events"] == 1
    assert rows[2]["duration_sec"] == 0


def test_same_ts_events_share_session(spark):
    df = _ev(spark, [(1, 10, 0, 0), (1, 10, 0, 0), (1, 10, 0, 0)])
    out = session_stats(df, gap_minutes=30, order_tiebreak="event_id").collect()
    assert len(out) == 1 and out[0]["n_events"] == 3


def test_fixture_sessions_partition_invariant(spark, sf_dir):
    """Session stats are identical under any input partitioning —
    the shuffle-on-user_id contract."""
    from cr_data_pipeline_project_spark.catalog import table

    ev = (
        table(spark, "events", sf_dir)
        .where(F.col("user_id").isNotNull())
        .select("event_id", "user_id", "ts")
    )
    a = session_stats(ev, order_tiebreak="event_id").orderBy("user_id", "session_idx")
    b = session_stats(ev.repartition(13), order_tiebreak="event_id").orderBy(
        "user_id", "session_idx"
    )
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
    # sanity: session count between 1 and n_events per user
    agg = (
        session_stats(ev, order_tiebreak="event_id")
        .groupBy("user_id")
        .agg(F.max("session_idx").alias("mx"), F.sum("n_events").alias("n"))
    )
    bad = agg.where((F.col("mx") < 1) | (F.col("mx") > F.col("n"))).count()
    assert bad == 0


def test_batch_matches_streaming_session_window(spark, tmp_path):
    """The batch sessionizer and Structured Streaming's
    session_window agree on the fixture-shaped data: same session
    starts, same per-session event counts, and the streaming end =
    batch end + gap (session_window pads the inactivity gap onto the
    close — documented Spark semantics)."""
    import json
    import os

    from cr_data_pipeline_project_spark.streaming.incremental import (
        sessionized_event_counts,
    )

    events = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:20:00"),   # same session (20 min)
        (1, "2024-01-01 01:00:00"),   # new session (40 min)
        (2, "2024-01-01 00:05:00"),
        (2, "2024-01-01 00:34:00"),   # 29 min -> same session
        (2, "2024-01-01 02:00:00"),   # new session
    ]
    src = os.path.join(str(tmp_path), "sess_src")
    os.makedirs(src)
    with open(os.path.join(src, "e.json"), "w") as f:
        for uid, ts in events:
            f.write(json.dumps({"user_id": uid, "ts": ts}) + "\n")
        # sentinel far in the future: advances the watermark so every
        # real session finalizes in availableNow mode
        f.write(
            json.dumps({"user_id": 99, "ts": "2024-01-02 00:00:00"}) + "\n"
        )

    stream = spark.readStream.schema("user_id long, ts timestamp").json(src)
    q = (
        sessionized_event_counts(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_parity")
        .outputMode("append")
        .option(
            "checkpointLocation", os.path.join(str(tmp_path), "ckpt_sess")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["user_id"], str(r["session_start"])): (
            r["n_events"],
            str(r["session_end"]),
        )
        for r in spark.sql(
            "select * from sess_parity where user_id < 99"
        ).collect()
    }

    batch_df = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(events)],
        "event_id long, user_id long, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    batch = {
        (r["user_id"], str(r["session_start"])): (
            r["n_events"],
            str(r["session_end"]),
        )
        for r in session_stats(
            batch_df, gap_minutes=30, order_tiebreak="event_id"
        ).collect()
    }

    assert set(streamed) == set(batch)
    for key, (n_stream, end_stream) in streamed.items():
        n_batch, end_batch = batch[key]
        assert n_stream == n_batch, key
        # streaming end pads the gap onto the last event
        from datetime import datetime, timedelta

        eb = datetime.fromisoformat(end_batch)
        es = datetime.fromisoformat(end_stream)
        assert es == eb + timedelta(minutes=30), key
