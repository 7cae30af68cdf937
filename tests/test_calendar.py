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
