"""Mutation operators (SURVEY.md §2.6): MERGE upsert, insert-if-absent,
cascade delete, deterministic surrogate keys.

The reference runs these as SQL Server MERGE / NOT-IN gates / ordered
DELETEs (/root/reference/src/db_ops.py:32-149,
/root/reference/etl_pipeline_script.py:43-50,97-112,128-147). Here
each is a *pure DataFrame transformation* (so it composes and tests
like any query) plus a parquet write-path wrapper.

Scale notes (100 TB)
--------------------
- ``upsert``: new ∪ (old ⟕anti new). The anti join shuffles on the
  key unless the *new* side is small — in the reference's workload the
  per-run delta is ~10³ rows vs ~10⁵ accumulated, so the delta side is
  broadcast (AQE will pick this; we hint it explicitly). On a
  transactional lake format this becomes a native ``MERGE INTO``;
  plain parquet needs partition-overwrite. Partition facts by a
  time-derived column so a MERGE rewrites only touched partitions.
- ``insert_if_absent``: left-anti against *existing keys only* —
  never read old non-key columns; on parquet the key projection is a
  column-pruned scan.
- ``cascade_delete``: child→parent write ordering preserved from the
  reference (FK safety is a consumer contract even without enforced
  FKs).
- ``add_surrogate_keys``: a single global ``row_number`` window
  serializes one stage; acceptable for per-batch deltas (10³-10⁶
  rows). For backfilling billions of rows use
  ``zipWithIndex``-style: per-partition counts → offset cumsum →
  partition-local id + offset, implemented in
  :func:`assign_dense_ids`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE semantics (db_ops.py:62-93 `MERGE ... WHEN MATCHED UPDATE
    WHEN NOT MATCHED INSERT`): every source row wins; target rows
    without a source match survive unchanged."""
    cols = target.columns
    unmatched = target.join(F.broadcast(source.select(*keys)), keys, "left_anti")
    return source.select(*cols).unionByName(unmatched.select(*cols))


def insert_if_absent(
    new: DataFrame, existing_keys: DataFrame, keys: list[str]
) -> DataFrame:
    """Incremental-dedup gate (etl_pipeline_script.py:43-44,128-133):
    rows of ``new`` whose key is not already present."""
    return new.join(existing_keys.select(*keys), keys, "left_anti")


def cascade_delete(
    tables: dict[str, DataFrame], key: str, purge_keys: DataFrame
) -> dict[str, DataFrame]:
    """Purge ``purge_keys`` from every table that carries ``key``
    (db_ops.py:53-59). Caller writes results child-first."""
    out = {}
    pk = F.broadcast(purge_keys.select(key))
    for name, df in tables.items():
        out[name] = df.join(pk, key, "left_anti") if key in df.columns else df
    return out


def add_surrogate_keys(
    df: DataFrame, natural_key: list[str], id_col: str, start_at: int = 0
) -> DataFrame:
    """Deterministic dense ids ordered by the natural key — replaces
    SQL Server's ``INT IDENTITY(1,1)`` (db_creation_script.sql:87) +
    the re-read-the-mapping join (etl_pipeline_script.py:141-145).
    Deterministic unlike ``monotonically_increasing_id``; serializes
    one window — use for per-batch deltas, see module scale notes."""
    w = Window.orderBy(*natural_key)
    return df.withColumn(id_col, F.row_number().over(w) + F.lit(start_at))


def assign_dense_ids(df: DataFrame, id_col: str, start_at: int = 0) -> DataFrame:
    """Scale path for dense unique ids: zipWithIndex semantics without
    a global sort — per-partition offsets computed from partition
    sizes. Ids are dense + unique but ordering is partition order (not
    a total key order); pair with a ``repartitionByRange`` upstream
    when a sorted id space is wanted."""
    spark = df.sparkSession
    parts = df.rdd.mapPartitionsWithIndex(
        lambda i, it: [(i, sum(1 for _ in it))]
    ).collect()
    offsets = {}
    acc = start_at
    for i, n in sorted(parts):
        offsets[i] = acc
        acc += n
    boff = spark.sparkContext.broadcast(offsets)
    schema = df.schema.add(id_col, "long", False)

    def attach(i, it):
        base = boff.value[i]
        for j, row in enumerate(it):
            yield (*row, base + j + 1)

    return spark.createDataFrame(df.rdd.mapPartitionsWithIndex(attach), schema)
