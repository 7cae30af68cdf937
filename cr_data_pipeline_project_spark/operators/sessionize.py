"""Gap-based sessionization — the batch twin of streaming session
windows.

Splits each user's event stream into sessions wherever the gap
between consecutive events exceeds ``gap`` (the classic web-analytics
30-minute rule). This is the batch re-expression of Structured
Streaming's ``session_window`` (already exercised in
``streaming/incremental.py``): identical semantics, computed as

    new_session = (ts - lag(ts) over user-ordered window) > gap
    session_idx = running sum of new_session over the same window

so each event gets a (user, session_idx) key, and session-level
facts are one groupBy away.

Scale: both window functions partition by the user key — millions of
independent, small partitions (a user's events fit a task by
construction; nobody has 10⁹ events). ONE shuffle on user_id is
shared by the lag, the running sum, and the downstream session
aggregate (Catalyst reuses the sort order), and event payloads never
shuffle a second time. Skewed power-users are bounded by per-user
event caps upstream; a truly pathological key would go through the
q51 salting path with per-chunk session stitching.

Reference parity: the reference pipeline has no sessionizer (its
events are API snapshots); this is part of the beyond-reference
training-data/event-analytics surface, same family as q28-q30.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_tiebreak: str | Column | None = None,
) -> DataFrame:
    """Tag every event with ``session_idx`` (1-based, per user, in
    time order). Events exactly ``gap_minutes`` apart stay in the
    same session (strict > starts a new one) — matching
    ``session_window``'s gap semantics. ``order_tiebreak`` makes the
    within-user order total when timestamps can collide (same-ts
    events must land in the same session either way, and do — a zero
    gap is never > gap — but a deterministic order keeps plans
    replay-stable)."""
    order = [F.col(ts_col)]
    if order_tiebreak is not None:
        order.append(
            F.col(order_tiebreak)
            if isinstance(order_tiebreak, str)
            else order_tiebreak
        )
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_us = F.lit(gap_minutes * 60 * 1_000_000).cast("long")
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(prev.isNull(), F.lit(1)).otherwise(
        (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > gap_us
        ).cast("int")
    )
    return df.withColumn(
        "session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_tiebreak: str | Column | None = None,
) -> DataFrame:
    """Per-session facts: start/end, event count, duration. Duration
    is exact integer seconds (micros diff DIV 1e6) so cross-engine
    parity holds; the groupBy reuses the sessionize shuffle (same
    user_col key)."""
    tagged = sessionize(df, user_col, ts_col, gap_minutes, order_tiebreak)
    return tagged.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("duration_sec"),
    )
