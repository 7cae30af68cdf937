"""Column profiling — the data-quality summary every ingestion
pipeline runs before training-data release: per-column row/null/
distinct counts and min/max.

Two shapes:

- :func:`profile_columns` — EXACT. One aggregate per column over a
  column-pruned scan. Deliberately NOT one multi-``countDistinct``
  pass: Spark plans >1 distinct aggregate via an Expand node that
  replicates every input row once per distinct column (3 columns →
  3× the rows through the aggregate — measured 3.8 s vs <1 s at
  sf0.1). With columnar parquet, N single-column scans read the same
  bytes as one N-column scan, each stage is a narrow two-level
  hash aggregate, and the per-column jobs run from one cached plan
  shape. The oracle-checkable baseline.
- :func:`profile_columns_approx` — the 100 TB path. ONE full-width
  pass; ``approx_count_distinct`` (HLL++) is an ordinary mergeable
  aggregate, so no Expand, bounded memory, one shuffle of one row.
  Distinct counts carry the sketch's relative error (default 2%),
  which profiler/audit semantics tolerate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def _shape(agg: DataFrame, col_name: str) -> DataFrame:
    return agg.select(
        F.lit(col_name).alias("column_name"),
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_str",
        "max_str",
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact profile: (column_name, n_rows, n_nulls, n_distinct,
    min_str, max_str), one row per column — min/max rendered as
    strings so heterogeneous column types stack into one result."""
    parts = []
    for c in cols:
        agg = df.select(c).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_nulls"),
            F.countDistinct(F.col(c)).alias("n_distinct"),
            F.min(F.col(c)).cast("string").alias("min_str"),
            F.max(F.col(c)).cast("string").alias("max_str"),
        )
        parts.append(_shape(agg, c))
    return reduce(lambda a, b: a.unionByName(b), parts)


def profile_columns_approx(
    df: DataFrame, cols: list[str], rsd: float = 0.02
) -> DataFrame:
    """Single-pass sketch profile — same schema as
    :func:`profile_columns`; ``n_distinct`` is approximate
    (HLL++, relative standard deviation ``rsd``)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__nulls_{c}"),
            F.approx_count_distinct(F.col(c), rsd).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__nulls_{c}").alias("n_nulls"),
                        F.col(f"__dist_{c}").alias("n_distinct"),
                        F.col(f"__min_{c}").alias("min_str"),
                        F.col(f"__max_{c}").alias("max_str"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")
