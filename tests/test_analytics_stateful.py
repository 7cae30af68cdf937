"""Reference analytics layer (views + procs) on a scratch lake, the
applyInPandasWithState operator, and lake compaction."""

import os

import pytest
from pyspark.sql import functions as F

from cr_data_pipeline_project_spark import analytics, pipeline, schemas
from cr_data_pipeline_project_spark.sources.battlelog import read_battlelog_json

from helpers import (
    battle,
    card_row,
    clan_row,
    few_partitions,
    player_row,
    write_battlelog_json,
)


# Module scope: one ETL run serves every read-only assertion below
# (compaction only rewrites file layout, never content).
@pytest.fixture(scope="module")
def loaded_lake(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("analytics_lake")
    lake = pipeline.Lake(spark, os.path.join(str(tmp), "lake"))
    p = os.path.join(str(tmp), "bl.json")
    write_battlelog_json(
        p,
        [
            ("#A", [battle(), battle(battle_time="20250114T090000.000Z", crowns=0, opp_crowns=2)]),
            ("#B", [battle(battle_time="20250115T090000.000Z", crowns=3, opp_crowns=0)]),
        ],
    )
    pipeline.run_etl(
        spark,
        lake,
        rankings=spark.createDataFrame(
            [("#A", "2025-01", 1, 2000), ("#B", "2025-01", 2, 1990)],
            schemas.SEASON_RANKINGS,
        ),
        players=spark.createDataFrame(
            [player_row("#A", "alice", "#CLAN"), player_row("#B", "bob", "#CLAN")],
            schemas.PLAYERS,
        ),
        clans=spark.createDataFrame([clan_row("#CLAN", "guild")], schemas.CLANS),
        cards=spark.createDataFrame(
            [card_row(i, name=f"card{i}") for i in range(1, 9)], schemas.CARDS
        ),
        battlelogs=read_battlelog_json(spark, p),
        calendar_from="2025-01-01",
        calendar_months=2,
    )
    return lake


def test_vw_recent_rankings(spark, loaded_lake):
    rows = analytics.vw_recent_rankings(loaded_lake).collect()
    assert [(r["player_id"], r["rank"]) for r in rows] == [("#A", 1), ("#B", 2)]
    assert rows[0]["player_name"] == "alice"


def test_vw_player_clan(spark, loaded_lake):
    out = analytics.vw_player_clan(loaded_lake)
    # column set pinned to the reference view (db_creation_script.sql:197-205)
    assert out.columns == [
        "player_id",
        "player_name",
        "clan_name",
        "clan_score",
        "members",
    ]
    rows = {r["player_id"]: r for r in out.collect()}
    assert {p: r["clan_name"] for p, r in rows.items()} == {
        "#A": "guild",
        "#B": "guild",
    }
    assert rows["#A"]["members"] == 30


def test_usp_player_win_rate(spark, loaded_lake):
    # #A: 1 win, 1 loss → 50.0; proc emits (player_id, win_rate)
    rows = analytics.usp_player_win_rate(loaded_lake, "#A", "2025-01").collect()
    assert [(r["player_id"], r["win_rate"]) for r in rows] == [("#A", 50.0)]
    # no matches → EMPTY result set (the proc GROUPs BY player_id,
    # db_creation_script.sql:209-221), not a NULL row
    assert (
        analytics.usp_player_win_rate(loaded_lake, "#NOBODY", "2025-01").count() == 0
    )


def test_usp_card_usage_wins(spark, loaded_lake):
    # proc parameter matches card_name (db_creation_script.sql:238)
    row = analytics.usp_card_usage_wins(loaded_lake, "card1", "2025-01").collect()[0]
    # card 1 appears in all 3 match views; 2 of 3 were wins
    assert float(row["usage_rate"]) == 100.0
    assert row["win_rate"] == 66.67
    analytics.register_views(loaded_lake)
    assert spark.sql("SELECT COUNT(*) n FROM vw_recent_rankings").collect()[0]["n"] == 2


def test_compaction_reduces_files(spark, loaded_lake):
    # force extra small files with more appends
    extra = loaded_lake.read("season_rankings")
    for _ in range(3):
        loaded_lake.append("season_rankings", extra.limit(0))
    before = loaded_lake.compact("season_rankings", target_files=1)
    import glob, os as _os

    after = len(
        glob.glob(
            _os.path.join(loaded_lake.path("season_rankings"), "**", "*.parquet"),
            recursive=True,
        )
    )
    assert after <= before
    assert loaded_lake.read("season_rankings").count() == 2


def test_stateful_running_player_stats(spark, tmp_path):
    """applyInPandasWithState over a file stream: cumulative tallies
    and win streaks across micro-batches."""
    src = os.path.join(str(tmp_path), "stream_src")
    out = os.path.join(str(tmp_path), "stateful_out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(src)
    from cr_data_pipeline_project_spark.streaming.incremental import (
        stream_battlelog_json,
    )
    from cr_data_pipeline_project_spark.streaming.stateful import (
        running_player_stats,
    )
    from cr_data_pipeline_project_spark.sources.battlelog import flatten_matches

    def run_once(expect_rows):
        with few_partitions(spark, 1):
            raw = stream_battlelog_json(spark, src)

            def sink(batch_df, batch_id):
                batch_df.write.mode("append").parquet(out)

            # update-mode stateful output needs an update-capable sink:
            # foreachBatch (the file sink is append-only)
            q = (
                running_player_stats(flatten_matches(raw))
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            # With ProcessingTimeTimeout the availableNow query stays
            # alive firing empty timeout-check micro-batches, so both
            # awaitTermination and processAllAvailable can block
            # behind that churn (a livelock when batches are fast).
            # Deterministic drain: the data batch lands in the sink
            # within the first batches — poll for it, then stop.
            import time

            deadline = time.time() + 120
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= expect_rows:
                        break
                except Exception:  # sink dir not created yet
                    pass
                time.sleep(0.5)
            q.stop()
            q.awaitTermination(30)

    # batch 1: W, W  → streak 2
    write_battlelog_json(
        os.path.join(src, "b1.json"),
        [("#S", [battle(), battle(battle_time="20250113T110000.000Z")])],
    )
    run_once(expect_rows=1)
    # batch 2: L, W → total 4, wins 3, cur streak 1, best 2
    write_battlelog_json(
        os.path.join(src, "b2.json"),
        [
            (
                "#S",
                [
                    battle(battle_time="20250113T120000.000Z", crowns=0, opp_crowns=1),
                    battle(battle_time="20250113T130000.000Z"),
                ],
            )
        ],
    )
    run_once(expect_rows=2)
    rows = sorted(
        spark.read.parquet(out).collect(), key=lambda r: r["total_battles"]
    )
    assert [(r["total_battles"], r["total_wins"], r["cur_streak"], r["best_streak"]) for r in rows] == [
        (2, 2, 2, 2),
        (4, 3, 1, 2),
    ]
