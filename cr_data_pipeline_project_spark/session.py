"""SparkSession factory and runtime preparation.

Two entry points:

- :func:`get_session` — build a session with the engine's defaults
  (UTC timezone, AQE, Arrow, sane shuffle-partition count for local
  mode). Used by tests and ``bench.py``.
- :func:`prepare` — apply the *runtime-settable* subset of those
  defaults to an externally-owned session (the correctness driver
  hands us its own SparkSession; we must not assume it was built with
  our configs). Idempotent and cheap; every query builder calls it.

Scale notes (100 TB / 1000 executors)
-------------------------------------
- AQE on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic broadcast decisions are essential at scale;
  static ``spark.sql.shuffle.partitions`` is only the *initial* value.
- UTC session timezone is a *correctness* requirement: every
  timestamp→string rendering (key synthesis, date_format) must agree
  with the oracle, independent of cluster-node timezones.
- Arrow enabled: all Pandas-UDF / mapInPandas operators ship batches
  via Arrow, not pickle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs applied to ANY session we touch.
_RUNTIME_CONFS: dict[str, str] = {
    # Correctness: deterministic timestamp rendering & parsing.
    "spark.sql.session.timeZone": "UTC",
    # The fixture events table stores TIMESTAMP(NANOS) which Spark
    # cannot read natively; read as long nanos and convert in the
    # catalog (truncation to micros matches DuckDB's behavior).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for pandas_udf / mapInPandas / toPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE: coalesce post-shuffle partitions, split skewed joins.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def prepare(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf may be static on some builds; defaults still work
            # for everything except the nanos events table.
            pass
    return spark


def get_session(
    app_name: str = "cr-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or
    ``local[*]``). On a real cluster, pass ``master=None`` and set the
    master via spark-submit; everything here remains valid.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus_env) if cpus_env else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    if extra_confs:
        for k, v in extra_confs.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate may have returned a pre-existing session whose
    # builder-time confs were ignored — re-apply runtime ones.
    return prepare(spark)
