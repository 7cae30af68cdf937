"""Slowly-changing-dimension (type 2) history derivation.

The reference maintains current-state dimensions with MERGE upserts
(src/db_ops.py:62-149) — each key holds only its latest attribute
value. A training-data warehouse usually wants the *history* too:
which value was in effect when, so facts can join the dimension
AS OF their event time (see ``operators/rangejoin.py`` /
``operators.rangejoin.asof_join`` for the consuming side). This
module derives that SCD-2 interval table (Kimball's type-2
slowly-changing dimension) declaratively from an ordered change
feed.

Scale notes: one shuffle on the entity key; both windows share the
same (key) partitioning so Catalyst plans a single Exchange with two
partition-local sorts. No state is buffered beyond the running lag/
lead frames. Skewed entities (one bot user emitting 10⁸ events)
bound at |events of that key| rows through a spilling WindowExec —
for such feeds pre-aggregate exact duplicates per (key, value, ts)
first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse an ordered change feed into SCD-2 validity intervals:
    one row per (key, run of equal consecutive values) with
    ``valid_from`` (first ts of the run) and ``valid_to`` (start of
    the next run, NULL for the current value).

    Deterministic under timestamp ties via ``tiebreak_col`` (defaults
    to the value column itself)."""
    tb: Column = F.col(tiebreak_col or value_col)
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), tb)
    changed = (
        df.withColumn("__prev", F.lag(value_col).over(w))
        .where(
            F.col("__prev").isNull()
            | (F.col("__prev") != F.col(value_col))
        )
        .drop("__prev")
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col(ts_col), tb)
    return changed.select(
        F.col(key_col),
        F.col(value_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )
