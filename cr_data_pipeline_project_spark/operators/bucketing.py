"""Bucketed (co-located) table layout — the shuffle-elimination
contract for repeated big-big joins.

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle
of both sides. When the same join key is hit repeatedly
(orders⋈lineitem on orderkey, every session/affiliation join), the
production answer is to PRE-partition both tables by the key at
write time: Spark's ``bucketBy(n, key)`` hashes rows into a fixed
number of per-file buckets recorded in the catalog, and the planner
then proves co-partitioning and plans a sort-merge join with NO
Exchange on either side (``sortBy`` additionally removes the sort).
The shuffle is paid ONCE at ingest, amortized over every subsequent
join/aggregation on that key — the same contract as Hive bucketing
and Iceberg's bucket partition transform.

``tests/test_bucketing.py`` asserts the contract mechanically: the
joined plan of two co-bucketed tables contains zero Exchange
operators, while the identical join on plain parquet shuffles both
sides.

Scale notes:
- Choose ``n_buckets`` ≈ total-size / target-partition-size at the
  LARGEST table's scale (buckets are fixed at write time; too few
  buckets → giant tasks at read time). Both sides of a co-located
  join must use the same bucket count and key.
- groupBy on the bucket key also skips its Exchange — bucketed
  layout pays for aggregation pipelines too, not just joins.
- The in-memory catalog scopes bucket metadata to the session; a
  real deployment records it in the metastore (Hive/Glue/Unity),
  where it persists across jobs. The write path is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str | list[str],
    n_buckets: int,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed parquet table: hash-partitioned
    into ``n_buckets`` file groups on ``bucket_col`` (optionally
    sorted within buckets, which lets the sort-merge join skip its
    sorts too). ``path`` makes the table external (data at ``path``,
    metadata in the catalog)."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, cols[0], *cols[1:])
    )
    if sort:
        w = w.sortBy(cols[0], *cols[1:])
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. The
    planner proves co-partitioning from the catalog metadata and
    emits a sort-merge join with no Exchange (verified by
    tests/test_bucketing.py); with sorted buckets the per-bucket
    sorts vanish too."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
