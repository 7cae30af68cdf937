"""Skew mitigation: salted joins.

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin`` — on by default in our sessions);
explicit salting is the deterministic fallback when a single join key
dominates (the classic hot-user/hot-document problem at 100 TB) or
when AQE can't see the skew (e.g. the skewed side is the output of an
exchange-free stage).

``salted_join`` replicates the *small* side ``salt`` times and
scatters the skewed side uniformly across the replicas: the hot key's
rows land in ``salt`` different tasks instead of one straggler.
Results are exactly equal to the unsalted join (verified by an
oracle-matched query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted across ``salt`` buckets.

    The small side is exploded ``salt``× (fine — it is small by
    contract); the skewed side gets a uniform pseudo-random salt
    derived from its own key columns + a row-unique hash, keeping the
    operation deterministic (no ``rand()`` — re-executions of a lost
    task must salt identically or results are corrupted)."""
    if how not in ("inner", "left", "left_semi"):
        # right/full would duplicate unmatched small-side rows salt×
        # (each exploded replica survives the join unmatched)
        raise ValueError(f"salted_join supports inner/left/left_semi, got {how!r}")
    salt_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    # deterministic per-row salt: hash all columns (stable under
    # retries, unlike rand())
    skew_salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*skewed.columns), F.lit(salt))
    )
    out = skew_salted.join(salt_small, [*on, "__salt"], how)
    return out.drop("__salt")
