"""Golden tests for the season-calendar generator — semantics pinned
to /root/reference/src/helper_functions.py:7-73 (first Monday of each
month + 09:05:00 UTC start; next first Monday + 09:04:59 end)."""

import datetime as dt

from cr_data_pipeline_project_spark.functions.calendar import (
    season_calendar,
    seasons_for_range,
)

# First Mondays of 2025, independently computed.
FIRST_MONDAYS_2025 = {
    "2025-01": dt.datetime(2025, 1, 6, 9, 5),
    "2025-02": dt.datetime(2025, 2, 3, 9, 5),
    "2025-03": dt.datetime(2025, 3, 3, 9, 5),
    "2025-04": dt.datetime(2025, 4, 7, 9, 5),
    "2025-05": dt.datetime(2025, 5, 5, 9, 5),
    "2025-06": dt.datetime(2025, 6, 2, 9, 5),
    "2025-07": dt.datetime(2025, 7, 7, 9, 5),
    "2025-08": dt.datetime(2025, 8, 4, 9, 5),
    "2025-09": dt.datetime(2025, 9, 1, 9, 5),  # month starts on Monday
    "2025-10": dt.datetime(2025, 10, 6, 9, 5),
    "2025-11": dt.datetime(2025, 11, 3, 9, 5),
    "2025-12": dt.datetime(2025, 12, 1, 9, 5),
}


def test_season_calendar_2025(spark):
    rows = {
        r["season_id"]: r
        for r in season_calendar(spark, "2025-01-01", 12).collect()
    }
    assert set(rows) == set(FIRST_MONDAYS_2025)
    for sid, start in FIRST_MONDAYS_2025.items():
        assert rows[sid]["sn_start_date"] == start, sid
    # end bound: one second before the next season's start
    assert rows["2025-01"]["sn_end_date"] == dt.datetime(2025, 2, 3, 9, 4, 59)
    assert rows["2025-08"]["sn_end_date"] == dt.datetime(2025, 9, 1, 9, 4, 59)


def test_seasons_cover_range(spark):
    df = seasons_for_range(
        spark, dt.datetime(2024, 5, 15), dt.datetime(2024, 8, 20)
    )
    rows = df.collect()
    starts = [r["sn_start_date"] for r in rows]
    assert min(starts) <= dt.datetime(2024, 5, 15)
    ends = [r["sn_end_date"] for r in rows]
    assert max(ends) >= dt.datetime(2024, 8, 20)
    # seasons tile the range with no gaps: each end + 1s == next start
    rows.sort(key=lambda r: r["sn_start_date"])
    for a, b in zip(rows, rows[1:]):
        assert a["sn_end_date"] + dt.timedelta(seconds=1) == b["sn_start_date"]


# ------------------------------------------------------------------ #
# ref-date-relative entry points (helper_functions.py:7-74)           #
# ------------------------------------------------------------------ #

from cr_data_pipeline_project_spark.functions.calendar import (  # noqa: E402
    current_plus_n_seasons,
    last_n_completed_seasons,
)


def _by_id(df):
    return {r["season_id"]: r for r in df.collect()}


def test_last_n_completed_mid_month(spark):
    """ref mid-September 2024: the ref month's rollover (Sep 2 09:05)
    has passed, so the reference's build window yields n+1 = 4
    completed seasons (its documented quirk, reproduced exactly)."""
    got = _by_id(
        last_n_completed_seasons(spark, 3, dt.datetime(2024, 9, 15))
    )
    assert sorted(got) == ["2024-05", "2024-06", "2024-07", "2024-08"]
    assert got["2024-05"]["sn_start_date"] == dt.datetime(2024, 5, 6, 9, 5)
    assert got["2024-08"]["sn_start_date"] == dt.datetime(2024, 8, 5, 9, 5)
    assert got["2024-08"]["sn_end_date"] == dt.datetime(2024, 9, 2, 9, 4, 59)


def test_last_n_completed_before_rollover(spark):
    """ref on the first Monday BEFORE 09:05: the previous season is
    still live → exactly n completed seasons."""
    got = _by_id(
        last_n_completed_seasons(spark, 3, dt.datetime(2024, 9, 2, 5, 0))
    )
    assert sorted(got) == ["2024-05", "2024-06", "2024-07"]


def test_last_n_completed_at_rollover_instant(spark):
    """end < ref is strict: at exactly 09:05:00 the old season (ends
    09:04:59) counts as completed."""
    got = _by_id(
        last_n_completed_seasons(spark, 3, dt.datetime(2024, 9, 2, 9, 5, 0))
    )
    assert "2024-08" in got and len(got) == 4


def test_last_n_completed_month_starting_on_monday(spark):
    """July and April 2024 start on a Monday — the first-Monday
    search must pick day 1, not day 8."""
    got = _by_id(
        last_n_completed_seasons(spark, 2, dt.datetime(2024, 7, 10))
    )
    assert sorted(got) == ["2024-04", "2024-05", "2024-06"]
    assert got["2024-04"]["sn_start_date"] == dt.datetime(2024, 4, 1, 9, 5)
    assert got["2024-06"]["sn_end_date"] == dt.datetime(2024, 7, 1, 9, 4, 59)


def test_current_plus_n(spark):
    got = _by_id(current_plus_n_seasons(spark, 2, dt.datetime(2024, 9, 15)))
    assert sorted(got) == ["2024-09", "2024-10", "2024-11"]
    assert got["2024-09"]["sn_start_date"] == dt.datetime(2024, 9, 2, 9, 5)
    assert got["2024-09"]["sn_end_date"] == dt.datetime(2024, 10, 7, 9, 4, 59)
    assert got["2024-11"]["sn_end_date"] == dt.datetime(2024, 12, 2, 9, 4, 59)


def test_current_plus_n_on_boundary(spark):
    """ref exactly at a season start: that season is current
    (start <= ref), not future."""
    got = _by_id(
        current_plus_n_seasons(spark, 1, dt.datetime(2024, 10, 7, 9, 5))
    )
    assert sorted(got) == ["2024-10", "2024-11"]
