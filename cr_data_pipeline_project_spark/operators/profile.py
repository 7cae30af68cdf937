"""Column profiling — the data-quality summary every ingestion
pipeline runs before training-data release: per-column row/null/
distinct counts and min/max, computed in ONE pass over the table
(all measures are parallel aggregates of a single scan; the output
is reshaped to one row per column).

Scale: one scan + one tiny shuffle; at 100 TB this is the cheapest
shape possible — never profile column-by-column (N scans)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Returns (column_name, n_rows, n_nulls, n_distinct, min_str,
    max_str) — min/max rendered as strings so heterogeneous column
    types stack into one result."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            F.countDistinct(F.col(c)).alias(f"__dist_{c}"),
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
                        F.col(f"__nulls_{c}").cast("bigint").alias("n_nulls"),
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
