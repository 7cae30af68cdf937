"""End-to-end pipeline runs on a scratch lake: idempotency of the
incremental gates, MERGE update semantics, cascade purge, the
8-per-deck invariant, and a clean audit — the behaviors the reference
enforces via DB constraints + log invariants (SURVEY.md §5).

The five-run lifecycle (first load → incremental re-run → dim rename
→ new player → purge) executes ONCE in a module-scoped fixture; tests
assert on the recorded stats and final lake state.  One standalone
run covers the cards null-coercion path.
"""

import os

import pytest
from pyspark.sql import functions as F

from cr_data_pipeline_project_spark import pipeline, schemas
from cr_data_pipeline_project_spark.sources.battlelog import read_battlelog_json

from helpers import battle, card_row, clan_row, player_row, write_battlelog_json


def _inputs(spark, base, *, tag="#ME", with_second_battle=False, player_name="alice"):
    battles = [battle()]
    if with_second_battle:
        battles.append(battle(battle_time="20250114T093000.000Z", crowns=0, opp_crowns=3))
    p = os.path.join(str(base), f"bl_{len(battles)}_{player_name}_{tag.strip('#')}.json")
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


CAL = dict(calendar_from="2025-01-01", calendar_months=3)


@pytest.fixture(scope="module")
def lifecycle(spark, tmp_path_factory):
    """Five chained run_etl calls on one lake; returns (lake, stats list,
    snapshots dict) for read-only assertions."""
    base = tmp_path_factory.mktemp("pipeline_lifecycle")
    lake = pipeline.Lake(spark, os.path.join(str(base), "lake"))
    stats = []
    snapshots = {}

    # run 1: first load
    stats.append(pipeline.run_etl(spark, lake, **_inputs(spark, base), **CAL))
    snapshots["after_first"] = {
        "matches": lake.read("matches").collect(),
    }
    # run 2: same battle again + one new battle → incremental
    stats.append(
        pipeline.run_etl(
            spark, lake, **_inputs(spark, base, with_second_battle=True), **CAL
        )
    )
    snapshots["audit_after_two"] = pipeline.audit(spark, lake)
    snapshots["after_second"] = {
        "matches": lake.read("matches").collect(),
    }
    # run 3: dim rename → MERGE update, no new facts
    stats.append(
        pipeline.run_etl(
            spark, lake, **_inputs(spark, base, player_name="alice-renamed"), **CAL
        )
    )
    snapshots["players_after_rename"] = lake.read("players").collect()
    # run 4: second player appears
    stats.append(
        pipeline.run_etl(
            spark, lake, **_inputs(spark, base, tag="#GONE", player_name="bob"), **CAL
        )
    )
    snapshots["players_after_bob"] = lake.read("players").collect()
    # run 5: #GONE fails to fetch → cascade purge child-first
    stats.append(
        pipeline.run_etl(
            spark, lake, **_inputs(spark, base), failed_players=["#GONE"], **CAL
        )
    )
    snapshots["final_audit"] = pipeline.audit(spark, lake)
    return lake, stats, snapshots


def test_first_run_loads_everything(lifecycle):
    _, stats, snapshots = lifecycle
    assert stats[0]["seasons_inserted"] == 3
    assert stats[0]["matches_inserted"] == 1
    assert stats[0]["match_cards_inserted"] == 8
    m = snapshots["after_first"]["matches"][0]
    assert m["season_id"] == "2025-01" and m["match_view_id"] == 1


def test_second_run_is_incremental_and_idempotent(lifecycle):
    _, stats, snapshots = lifecycle
    assert stats[1]["seasons_inserted"] == 0  # already present
    assert stats[1]["matches_inserted"] == 1  # only the new battle
    assert stats[1]["match_cards_inserted"] == 8
    rows = snapshots["after_second"]["matches"]
    assert len(rows) == 2
    # surrogate ids continue from the existing max (M6)
    assert sorted(r["match_view_id"] for r in rows) == [1, 2]
    assert snapshots["audit_after_two"]["dup_match_keys"] == 0


def test_merge_updates_dims(lifecycle):
    _, stats, snapshots = lifecycle
    assert stats[2]["players_total"] == 1
    assert snapshots["players_after_rename"][0]["player_name"] == "alice-renamed"


def test_purge_cascades_child_first(spark, lifecycle):
    lake, _, snapshots = lifecycle
    assert len(snapshots["players_after_bob"]) == 2
    assert lake.read("players").where(F.col("player_id") == "#GONE").count() == 0
    assert lake.read("matches").where(F.col("player_id") == "#GONE").count() == 0
    assert lake.read("match_cards").where(F.col("player_id") == "#GONE").count() == 0


def test_audit_clean_after_runs(lifecycle):
    _, _, snapshots = lifecycle
    counts = snapshots["final_audit"]
    assert counts == {k: 0 for k in counts}


def test_cards_null_elixir_coerced(spark, tmp_path):
    lake = pipeline.Lake(spark, os.path.join(str(tmp_path), "lake"))
    ins = _inputs(spark, tmp_path)
    ins["cards"] = spark.createDataFrame(
        [("99", "mystery", "epic", None, True)], schemas.CARDS
    )
    pipeline.run_etl(spark, lake, **ins, **CAL)
    row = lake.read("cards").where(F.col("card_id") == "99").collect()[0]
    assert row["elixir_cost"] == 0  # db_ops.py:129 null→0
