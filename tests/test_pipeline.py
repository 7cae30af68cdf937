"""End-to-end pipeline runs on a scratch lake: idempotency of the
incremental gates, MERGE update semantics, cascade purge, the
8-per-deck invariant, and a clean audit — the behaviors the reference
enforces via DB constraints + log invariants (SURVEY.md §5)."""

import os

import pytest
from pyspark.sql import functions as F

from cr_data_pipeline_project_spark import pipeline, schemas
from cr_data_pipeline_project_spark.sources.battlelog import read_battlelog_json

from helpers import battle, card_row, clan_row, player_row, write_battlelog_json


@pytest.fixture()
def lake(spark, tmp_path):
    return pipeline.Lake(spark, os.path.join(str(tmp_path), "lake"))


def _inputs(spark, tmp_path, *, tag="#ME", with_second_battle=False, player_name="alice"):
    battles = [battle()]
    if with_second_battle:
        battles.append(battle(battle_time="20250114T093000.000Z", crowns=0, opp_crowns=3))
    p = os.path.join(str(tmp_path), f"bl_{len(battles)}_{player_name}.json")
    write_battlelog_json(p, [(tag, battles)])
    return dict(
        rankings=spark.createDataFrame(
            [(tag, "2025-01", 1, 2000)], schemas.SEASON_RANKINGS
        ),
        players=spark.createDataFrame(
            [player_row(tag, player_name, "#CLAN")], schemas.PLAYERS
        ),
        clans=spark.createDataFrame([clan_row("#CLAN")], schemas.CLANS),
        cards=spark.createDataFrame(
            [card_row(i) for i in range(1, 9)], schemas.CARDS
        ),
        battlelogs=read_battlelog_json(spark, p),
    )


def test_first_run_loads_everything(spark, lake, tmp_path):
    stats = pipeline.run_etl(
        spark, lake, **_inputs(spark, tmp_path),
        calendar_from="2025-01-01", calendar_months=3,
    )
    assert stats["seasons_inserted"] == 3
    assert stats["matches_inserted"] == 1
    assert stats["match_cards_inserted"] == 8
    m = lake.read("matches").collect()[0]
    assert m["season_id"] == "2025-01" and m["match_view_id"] == 1


def test_second_run_is_incremental_and_idempotent(spark, lake, tmp_path):
    pipeline.run_etl(
        spark, lake, **_inputs(spark, tmp_path),
        calendar_from="2025-01-01", calendar_months=3,
    )
    # same battle again + one genuinely new battle
    stats2 = pipeline.run_etl(
        spark, lake, **_inputs(spark, tmp_path, with_second_battle=True),
        calendar_from="2025-01-01", calendar_months=3,
    )
    assert stats2["seasons_inserted"] == 0  # already present
    assert stats2["matches_inserted"] == 1  # only the new battle
    assert stats2["match_cards_inserted"] == 8
    assert lake.read("matches").count() == 2
    # surrogate ids continue from the existing max (M6)
    ids = sorted(r["match_view_id"] for r in lake.read("matches").collect())
    assert ids == [1, 2]
    assert pipeline.audit(spark, lake)["dup_match_keys"] == 0


def test_merge_updates_dims(spark, lake, tmp_path):
    pipeline.run_etl(
        spark, lake, **_inputs(spark, tmp_path),
        calendar_from="2025-01-01", calendar_months=3,
    )
    stats = pipeline.run_etl(
        spark, lake, **_inputs(spark, tmp_path, player_name="alice-renamed"),
        calendar_from="2025-01-01", calendar_months=3,
    )
    assert stats["players_total"] == 1
    assert lake.read("players").collect()[0]["player_name"] == "alice-renamed"


def test_purge_cascades_child_first(spark, lake, tmp_path):
    pipeline.run_etl(
        spark, lake, **_inputs(spark, tmp_path),
        calendar_from="2025-01-01", calendar_months=3,
    )
    ins = _inputs(spark, tmp_path, tag="#GONE", player_name="bob")
    pipeline.run_etl(
        spark, lake, **ins, calendar_from="2025-01-01", calendar_months=3
    )
    assert lake.read("players").count() == 2
    # third run purges #GONE
    ins3 = _inputs(spark, tmp_path)
    pipeline.run_etl(
        spark, lake, **ins3, failed_players=["#GONE"],
        calendar_from="2025-01-01", calendar_months=3,
    )
    assert lake.read("players").where(F.col("player_id") == "#GONE").count() == 0
    assert lake.read("matches").where(F.col("player_id") == "#GONE").count() == 0
    assert lake.read("match_cards").where(F.col("player_id") == "#GONE").count() == 0


def test_cards_null_elixir_coerced(spark, lake, tmp_path):
    ins = _inputs(spark, tmp_path)
    ins["cards"] = spark.createDataFrame(
        [("99", "mystery", "epic", None, True)], schemas.CARDS
    )
    pipeline.run_etl(
        spark, lake, **ins, calendar_from="2025-01-01", calendar_months=3
    )
    row = lake.read("cards").where(F.col("card_id") == "99").collect()[0]
    assert row["elixir_cost"] == 0  # db_ops.py:129 null→0


def test_audit_clean_after_runs(spark, lake, tmp_path):
    pipeline.run_etl(
        spark, lake, **_inputs(spark, tmp_path),
        calendar_from="2025-01-01", calendar_months=3,
    )
    counts = pipeline.audit(spark, lake)
    assert counts == {k: 0 for k in counts}
