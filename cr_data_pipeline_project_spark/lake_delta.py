"""Pluggable Delta Lake backend for the engine's table layer.

The snapshot :class:`~cr_data_pipeline_project_spark.pipeline.Lake`
re-creates the transactionality of the reference's DB-side
MERGE/DELETE (/root/reference/src/db_ops.py:62-149) on plain parquet
with a versioned layout and an atomic pointer commit. When the
``delta-spark`` package is on the Python path (it is not baked into
this container — everything here is import-gated and the test suite
skips cleanly without it), :class:`DeltaLake` provides the same
surface over a transactional format instead:

- ``overwrite``   → Delta transactional overwrite (the commit is the
  Delta log entry, not a pointer rename)
- ``merge``       → a NATIVE ``MERGE INTO`` (file-level rewrite of
  only the touched files, vs the snapshot lake's full-table rewrite)
- ``delete``      → native ``DELETE`` (same file-level granularity)
- ``read(version=...)`` → Delta time travel (``versionAsOf``)
- ``compact``     → OPTIMIZE-style bin-packing rewrite

Both classes expose the subset of methods ``pipeline.run_etl`` uses
(``read / append / overwrite / exists / path``), so the backend slots
in behind the pipeline without touching its logic —
``make_lake(spark, root)`` picks Delta when available and falls back
to the snapshot lake otherwise.

Scale notes (100 TB)
--------------------
- MERGE/DELETE rewrite only the files containing matched rows; with
  the dims ≪ facts layout the win over full-snapshot rewrites grows
  with table size. Facts stay append-only either way.
- Delta's log checkpoints bound metadata reads; pair the matches
  table's ``season_id`` partitioning with data-skipping statistics so
  incremental gates prune files, not just partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    """True when the delta-spark Python package is importable."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def delta_builder_confs() -> dict[str, str]:
    """Session-builder confs Delta requires (SQL extension + catalog).
    These are build-time (static) confs — pass them to
    ``session.get_session(extra_confs=...)`` or a raw builder; they
    cannot be applied to an already-running session."""
    return {
        "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
        "spark.sql.catalog.spark_catalog": (
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        ),
    }


def make_lake(spark: SparkSession, root: str, backend: str = "auto"):
    """Factory: ``backend='delta'`` forces :class:`DeltaLake` (raises
    if delta-spark is absent), ``'snapshot'`` forces the parquet
    snapshot lake, ``'auto'`` picks Delta when importable."""
    from .pipeline import Lake

    if backend == "snapshot":
        return Lake(spark, root)
    if backend == "delta" and not delta_available():
        raise ImportError(
            "backend='delta' requested but the delta-spark package "
            "is not importable in this environment"
        )
    if backend == "auto" and not delta_available():
        return Lake(spark, root)
    if backend not in ("auto", "delta"):
        raise ValueError(f"unknown lake backend: {backend!r}")
    return DeltaLake(spark, root)


class DeltaLake:
    """Delta-backed table layer with the snapshot lake's surface.

    Tables live at ``<root>/<name>`` as Delta tables. Requires a
    session built with :func:`delta_builder_confs`."""

    # same fact layout as the snapshot lake
    PARTITIONING: dict[str, list[str]] = {"matches": ["season_id"]}

    def __init__(self, spark: SparkSession, root: str):
        if not delta_available():
            raise ImportError("delta-spark is required for DeltaLake")
        self.spark = spark
        self.root = root

    # ------------------------------------------------------------ #
    # paths / existence                                             #
    # ------------------------------------------------------------ #

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def data_dir(self, name: str) -> str:
        return self.path(name)

    def exists(self, name: str) -> bool:
        return os.path.isdir(os.path.join(self.path(name), "_delta_log"))

    def _table(self, name: str):
        from delta.tables import DeltaTable

        return DeltaTable.forPath(self.spark, self.path(name))

    # ------------------------------------------------------------ #
    # read / write                                                  #
    # ------------------------------------------------------------ #

    def read(self, name: str, version: int | None = None) -> DataFrame:
        """Current snapshot, or ``versionAsOf`` time travel."""
        if not self.exists(name):
            from . import schemas

            return self.spark.createDataFrame([], schemas.DOMAIN[name])
        r = self.spark.read.format("delta")
        if version is not None:
            r = r.option("versionAsOf", version)
        return r.load(self.path(name))

    def versions(self, name: str) -> list[int]:
        """Committed Delta log versions, oldest first."""
        hist = self._table(name).history().select("version").collect()
        return sorted(int(r["version"]) for r in hist)

    def append(self, name: str, df: DataFrame) -> None:
        w = df.write.format("delta").mode("append")
        parts = self.PARTITIONING.get(name)
        if parts:
            w = w.partitionBy(*parts)
        w.save(self.path(name))

    def overwrite(self, name: str, df: DataFrame) -> None:
        """Transactional full overwrite — readers of the previous
        version are unaffected (the Delta log is the commit point,
        playing the snapshot lake's pointer-rename role)."""
        w = (
            df.write.format("delta")
            .mode("overwrite")
            .option("overwriteSchema", "true")
        )
        parts = self.PARTITIONING.get(name)
        if parts:
            w = w.partitionBy(*parts)
        w.save(self.path(name))

    # ------------------------------------------------------------ #
    # native mutations (the reference's MERGE / DELETE)             #
    # ------------------------------------------------------------ #

    def merge(self, name: str, src: DataFrame, keys: list[str]) -> None:
        """Native MERGE upsert (M1-M3): update matched rows, insert
        the rest — file-level rewrite of only the touched files,
        replacing the snapshot lake's read→upsert→overwrite cycle
        (operators/mutations.py:39)."""
        if not self.exists(name):
            self.overwrite(name, src)
            return
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
        (
            self._table(name)
            .alias("t")
            .merge(src.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    def delete(self, name: str, condition: str) -> None:
        """Native DELETE (M5 building block); ``condition`` is a SQL
        boolean expression over the table's columns."""
        self._table(name).delete(condition)

    def compact(self, name: str, target_files: int = 1) -> int:
        """Bin-packing compaction. Uses OPTIMIZE when this Delta
        build exposes it, else a transactional coalesce rewrite.
        Returns the data-file count before compaction."""
        before = len(
            [
                f
                for f in os.listdir(self.path(name))
                if f.endswith(".parquet")
            ]
        )
        tbl = self._table(name)
        if hasattr(tbl, "optimize"):
            tbl.optimize().executeCompaction()
        else:
            self.overwrite(name, self.read(name).coalesce(target_files))
        return before
