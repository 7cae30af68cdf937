"""Slowly-changing-dimension (type 2) history derivation.

The reference maintains current-state dimensions with MERGE upserts
(src/db_ops.py:62-149) — each key holds only its latest attribute
value. A training-data warehouse usually wants the *history* too:
which value was in effect when, so facts can join the dimension
AS OF their event time (see ``operators/rangejoin.py`` /
``operators.rangejoin.as_of_join``, and :func:`state_at` below, for
the consuming side). This
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
    delete_col: str | None = None,
) -> DataFrame:
    """Collapse an ordered change feed into SCD-2 validity intervals:
    one row per (key, run of equal consecutive values) with
    ``valid_from`` (first ts of the run) and ``valid_to`` (start of
    the next run, NULL for the current value).

    Deterministic under timestamp ties via ``tiebreak_col`` (defaults
    to the value column itself).

    ``delete_col`` (optional boolean column) marks DELETE events —
    the feed shape a CDC source with tombstones produces: a delete at
    ts T closes the key's open interval (``valid_to = T``) without
    opening a new one, so the key has NO current row until a later
    re-add opens a fresh interval. Mechanically, delete events ride
    through the run-collapse as their own runs (normalized to one
    sentinel run regardless of any value they carry, so consecutive
    deletes collapse) and are dropped after the ``lead`` has used
    their ts as the preceding run's ``valid_to``. A delete for an
    absent key contributes nothing. NULL in the column reads as
    ``False`` (an upsert)."""
    tb: Column = F.col(tiebreak_col or value_col)
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), tb)
    if delete_col is None:
        changed = (
            df.withColumn("__prev", F.lag(value_col).over(w))
            .where(
                F.col("__prev").isNull()
                | (F.col("__prev") != F.col(value_col))
            )
            .drop("__prev")
        )
        return changed.select(
            F.col(key_col),
            F.col(value_col).alias("state"),
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w).alias("valid_to"),
        )
    value_type = dict(df.dtypes)[value_col]
    mark = F.coalesce(F.col(delete_col), F.lit(False))
    # Deterministic total order including the delete flag: an upsert
    # and a delete at the SAME (ts, tiebreak) would otherwise sort
    # nondeterministically (the flag isn't in the base tiebreak) and
    # replays could flip which one lands last. Upserts order BEFORE
    # deletes (False < True), so at identical timestamps the
    # tombstone wins — the same in-batch conflict rule the CDC path
    # uses.
    wd = Window.partitionBy(key_col).orderBy(F.col(ts_col), mark, tb)
    # run identity: (is_delete, value), with delete rows normalized
    # to a single sentinel so consecutive deletes form one run
    cur = F.when(
        mark,
        F.struct(
            F.lit(True).alias("d"),
            F.lit(None).cast(value_type).alias("v"),
        ),
    ).otherwise(
        F.struct(F.lit(False).alias("d"), F.col(value_col).alias("v"))
    )
    changed = (
        df.withColumn("__cur", cur)
        .withColumn("__prev", F.lag("__cur").over(wd))
        .where(
            F.col("__prev").isNull()
            | ~F.col("__prev").eqNullSafe(F.col("__cur"))
        )
    )
    return (
        changed.select(
            F.col(key_col),
            F.col("__cur.v").alias("state"),
            F.col("__cur.d").alias("__d"),
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(wd).alias("valid_to"),
        )
        .where(~F.col("__d"))
        .drop("__d")
    )


def state_at(
    fact: DataFrame,
    history: DataFrame,
    key_col: str,
    ts_col: str,
    how: str = "inner",
) -> DataFrame:
    """Attach the SCD-2 state in effect at each fact row's event time:
    the interval with ``valid_from ≤ ts < valid_to`` (open interval —
    NULL valid_to — covers to +∞). Exactly one interval matches per
    covered fact row, since :func:`scd2_intervals` emits a disjoint
    partition of time per key.

    Scale: this is an EQUI-join on the entity key with the interval
    bounds as a residual filter — both sides hash/sort-merge on the
    key, no broadcast and no interval explosion needed, so a
    corpus-sized dimension history (every user's full change log)
    joins a corpus-sized fact table with one key shuffle each. (The
    broadcast ``interval_join`` in operators/rangejoin.py is the
    right tool only when the interval table is dimension-small.)"""
    dim = history.select(
        F.col(key_col),
        F.col("state"),
        F.col("valid_from"),
        F.col("valid_to"),
    )
    cond = (
        (fact[key_col] == dim[key_col])
        & (fact[ts_col] >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (fact[ts_col] < dim["valid_to"]))
    )
    return fact.join(dim, cond, how).drop(dim[key_col])
