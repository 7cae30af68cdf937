"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's closest semantics: its per-run "have I seen this
match_key" gate is a hand-rolled key-value state
(/root/reference/etl_pipeline_script.py:128-133). Built-in
``dropDuplicates`` covers that; this module shows the *general*
mechanism for state Spark doesn't have built-in — here, a per-player
running battle tally with win-streak tracking that emits one update
row per micro-batch and expires idle players by processing-time
timeout.

Scale notes: state lives in the state store keyed by player —
partitioned by the grouping key, so it scales horizontally;
the timeout bounds state size the way the watermark bounds
dropDuplicates state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "player_id string, total_battles long, total_wins long, "
    "cur_streak long, best_streak long"
)
STATE_SCHEMA = "total long, wins long, cur long, best long"


def running_player_stats(matches: DataFrame, idle_timeout_ms: int = 3_600_000) -> DataFrame:
    """Streaming per-player tally: input needs (player_id, is_win,
    battle_time); emits cumulative totals + win streaks each batch.
    State expires after ``idle_timeout_ms`` of processing-time
    inactivity."""
    import pandas as pd

    def update(key, pdfs, state: GroupState):
        (player_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            total, wins, cur, best = state.get
        else:
            total, wins, cur, best = 0, 0, 0, 0
        for pdf in pdfs:
            # deterministic replay: process battles in event-time order
            pdf = pdf.sort_values("battle_time")
            for w in pdf["is_win"]:
                total += 1
                if bool(w):
                    wins += 1
                    cur += 1
                    best = max(best, cur)
                else:
                    cur = 0
        state.update((total, wins, cur, best))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "player_id": [player_id],
                "total_battles": [total],
                "total_wins": [wins],
                "cur_streak": [cur],
                "best_streak": [best],
            }
        )

    return (
        matches.select("player_id", "is_win", "battle_time")
        .groupBy("player_id")
        .applyInPandasWithState(
            update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
