"""Season-calendar generation as a native DataFrame program.

Re-expresses /root/reference/src/helper_functions.py:7-73: a season
starts at the *first Monday of each month + 09:05:00 UTC* and ends one
second before the next season starts. ``season_id`` is the start
month formatted ``yyyy-MM``.

Instead of the reference's per-month Python loops, the whole calendar
is a single ``sequence()``-generated DataFrame (one row per month) —
no driver-side loop, trivially parallel, and usable as the broadcast
side of the season-attribution range join
(:mod:`..operators.rangejoin`, SURVEY.md J7).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def season_calendar(
    spark: SparkSession, from_month: str, n_months: int
) -> DataFrame:
    """Seasons covering ``n_months`` months starting at ``from_month``
    (a 'yyyy-MM-01' date string). Returns
    ``(season_id, sn_start_date, sn_end_date)``.

    Generates ``n_months + 1`` first-Mondays so every returned season
    has a successor to derive its end bound from (the reference builds
    ``len(first_mondays) - 1`` seasons the same way,
    helper_functions.py:27-29).
    """
    months = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(from_month).cast("date"),
                F.add_months(F.lit(from_month).cast("date"), n_months),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month_start")
    )
    mondays = months.select(
        F.col("month_start"),
        (
            F.next_day(F.date_sub(F.col("month_start"), 1), "Mon").cast("timestamp")
            + F.expr("INTERVAL 9 HOURS 5 MINUTES")
        ).alias("sn_start_date"),
    )
    # lead() over a single global ordering: the calendar is O(100)
    # rows (one per month) — a one-partition window here is fine even
    # at 100 TB of fact data, because only the tiny dim flows through.
    w_next = F.lead("sn_start_date").over(Window.orderBy("sn_start_date"))
    out = (
        mondays.withColumn("next_start", w_next)
        .where(F.col("next_start").isNotNull())
        .select(
            F.date_format("sn_start_date", "yyyy-MM").alias("season_id"),
            F.col("sn_start_date"),
            (F.col("next_start") - F.expr("INTERVAL 1 SECOND")).alias("sn_end_date"),
        )
    )
    return out


def _month_floor(d: _dt.datetime, months_back: int) -> str:
    """'yyyy-MM-01' for ``months_back`` months before ``d``'s month."""
    idx = d.year * 12 + (d.month - 1) - months_back
    return f"{idx // 12:04d}-{idx % 12 + 1:02d}-01"


def last_n_completed_seasons(
    spark: SparkSession, n: int = 3, ref_date: _dt.datetime | None = None
) -> DataFrame:
    """Seasons fully completed before ``ref_date`` — the reference's
    only pure-function test seam (helper_functions.py:7-38):
    ``completed`` means ``sn_end_date < ref_date``.

    Faithful to the reference quirk: it builds the ``n + 1`` seasons
    starting in the ``n + 1`` months before the ref month and keeps
    every completed one, so the result has ``n + 1`` rows once the
    ref month's own rollover (first Monday 09:05) has passed, and
    ``n`` rows before it.
    """
    ref_date = ref_date or _dt.datetime.utcnow()
    cal = season_calendar(spark, _month_floor(ref_date, n + 1), n + 1)
    return cal.where(F.col("sn_end_date") < F.lit(ref_date))


def current_plus_n_seasons(
    spark: SparkSession, n: int = 3, ref_date: _dt.datetime | None = None
) -> DataFrame:
    """The season containing ``ref_date`` plus its next ``n``
    successors (helper_functions.py:40-74: the current row is the one
    with ``sn_start_date <= ref_date <= sn_end_date``; futures are
    the first ``n`` seasons with ``sn_start_date > ref_date``).

    Generates with the reference's same margins (2 months back,
    ``n + 4`` forward) so boundary placements of the first Monday
    can't drop the current season."""
    ref_date = ref_date or _dt.datetime.utcnow()
    cal = season_calendar(spark, _month_floor(ref_date, 2), n + 6)
    ref = F.lit(ref_date)
    current = cal.where(
        (F.col("sn_start_date") <= ref) & (ref <= F.col("sn_end_date"))
    )
    future = (
        cal.where(F.col("sn_start_date") > ref)
        .orderBy("sn_start_date")
        .limit(n)
    )
    return current.unionByName(future)


def seasons_for_range(
    spark: SparkSession, min_ts: _dt.datetime, max_ts: _dt.datetime
) -> DataFrame:
    """Calendar guaranteed to cover [min_ts, max_ts] — the broadcast
    dim for season attribution of a fact table's timestamp column."""
    start_month = (min_ts.replace(day=1) - _dt.timedelta(days=40)).strftime(
        "%Y-%m-01"
    )
    n_months = (
        (max_ts.year - min_ts.year) * 12 + (max_ts.month - min_ts.month) + 4
    )
    return season_calendar(spark, start_month, n_months)
