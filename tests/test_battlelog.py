"""Battlelog ingest/flatten parity with the reference transform
(api_extract.py:162-252): filters, null-coercion, array defaults,
key synthesis, season attribution."""

import datetime as dt
import os

from cr_data_pipeline_project_spark.functions.calendar import season_calendar
from cr_data_pipeline_project_spark.sources.battlelog import (
    flatten_match_cards,
    flatten_matches,
    read_battlelog_json,
)

from helpers import battle, write_battlelog_json


def _raw(spark, tmp_path, records):
    p = os.path.join(str(tmp_path), "battlelog.json")
    write_battlelog_json(p, records)
    return read_battlelog_json(spark, p)


def test_flatten_happy_path(spark, tmp_path):
    raw = _raw(spark, tmp_path, [("#ME", [battle()])])
    rows = flatten_matches(raw).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["battle_time"] == dt.datetime(2025, 1, 13, 10, 15)
    assert r["match_key"] == "2025-01-13 10:15:00_#ME"
    assert r["is_win"] is True  # 2 > 1 (api_extract.py:212)
    assert r["princess_tower1_hp"] == 1000 and r["princess_tower2_hp"] == 2000
    assert float(r["elixir_leaked"]) == 3.5


def test_non_pathoflegend_filtered(spark, tmp_path):
    raw = _raw(
        spark,
        tmp_path,
        [("#ME", [battle(), battle(btype="casual2v2", battle_time="20250113T111500.000Z")])],
    )
    assert flatten_matches(raw).count() == 1  # P4, api_extract.py:217
    assert flatten_match_cards(raw).count() == 8  # filtered there too, :250


def test_bad_battletime_coerced_and_dropped(spark, tmp_path):
    raw = _raw(
        spark,
        tmp_path,
        [("#ME", [battle(), battle(battle_time="not-a-timestamp")])],
    )
    # errors='coerce' → null → dropped from matches (api_extract.py:213-214)
    assert flatten_matches(raw).count() == 1


def test_short_tower_array_defaults_zero(spark, tmp_path):
    raw = _raw(spark, tmp_path, [("#ME", [battle(towers=(750,))])])
    r = flatten_matches(raw).collect()[0]
    assert r["princess_tower1_hp"] == 750
    assert r["princess_tower2_hp"] == 0  # P13 default, api_extract.py:218-219


def test_match_cards_eight_per_view_keyed_naturally(spark, tmp_path):
    raw = _raw(spark, tmp_path, [("#ME", [battle()]), ("#YOU", [battle()])])
    cards = flatten_match_cards(raw).collect()
    assert len(cards) == 16
    keys = {(r["match_key"], r["player_id"]) for r in cards}
    assert len(keys) == 2
    assert all(r["card_id"] == str(int(r["card_id"])) for r in cards)  # str ids


def test_season_attribution_range_join(spark, tmp_path):
    raw = _raw(
        spark,
        tmp_path,
        [
            (
                "#ME",
                [
                    battle(),  # 2025-01-13 → season 2025-01
                    battle(battle_time="19990101T000000.000Z"),  # outside calendar
                ],
            )
        ],
    )
    seasons = season_calendar(spark, "2025-01-01", 3)
    rows = {r["battle_time"].year: r for r in flatten_matches(raw, seasons).collect()}
    assert rows[2025]["season_id"] == "2025-01"
    assert rows[1999]["season_id"] is None  # helper_functions.py:85 → None


def test_two_tracked_players_same_battle_two_views(spark, tmp_path):
    """A battle between two tracked players yields two match views
    (db_creation_script.sql:83-84)."""
    b1 = battle(opp_tag="#YOU")
    b2 = battle(crowns=1, opp_crowns=2, opp_tag="#ME")
    raw = _raw(spark, tmp_path, [("#ME", [b1]), ("#YOU", [b2])])
    rows = flatten_matches(raw).collect()
    assert len(rows) == 2
    assert {r["match_key"] for r in rows} == {
        "2025-01-13 10:15:00_#ME",
        "2025-01-13 10:15:00_#YOU",
    }
