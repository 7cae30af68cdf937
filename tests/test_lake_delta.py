"""Pluggable Delta backend: factory fallback is always testable;
the Delta round-trip itself skips cleanly when delta-spark is not
installed (it is not baked into this container), mirroring
test_jdbc.py's skip-if-unavailable pattern."""

import os

import pytest

from cr_data_pipeline_project_spark import lake_delta, pipeline


def test_factory_falls_back_to_snapshot_lake(spark, tmp_path):
    lake = lake_delta.make_lake(spark, str(tmp_path), backend="auto")
    if lake_delta.delta_available():
        assert isinstance(lake, lake_delta.DeltaLake)
    else:
        assert isinstance(lake, pipeline.Lake)


def test_factory_forced_backends(spark, tmp_path):
    lake = lake_delta.make_lake(spark, str(tmp_path), backend="snapshot")
    assert isinstance(lake, pipeline.Lake)
    with pytest.raises(ValueError):
        lake_delta.make_lake(spark, str(tmp_path), backend="nope")
    if not lake_delta.delta_available():
        with pytest.raises(ImportError):
            lake_delta.make_lake(spark, str(tmp_path), backend="delta")


def test_delta_roundtrip_merge_delete_timetravel(spark, tmp_path):
    """Append → merge-upsert → delete → time-travel over a real Delta
    table. Skips without delta-spark; when it runs it needs a session
    built with delta_builder_confs() (SQL extension + catalog)."""
    if not lake_delta.delta_available():
        pytest.skip("delta-spark not installed")
    if (
        spark.conf.get("spark.sql.extensions", "")
        .find("DeltaSparkSessionExtension")
        < 0
    ):
        pytest.skip("session not built with the Delta SQL extension")

    lake = lake_delta.DeltaLake(spark, os.path.join(str(tmp_path), "dl"))
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, val string"
    )
    lake.overwrite("t", base)
    assert {tuple(r) for r in lake.read("t").collect()} == {(1, "a"), (2, "b")}

    # MERGE: update id=2, insert id=3
    delta_df = spark.createDataFrame(
        [(2, "B"), (3, "c")], "id long, val string"
    )
    lake.merge("t", delta_df, ["id"])
    assert {tuple(r) for r in lake.read("t").collect()} == {
        (1, "a"),
        (2, "B"),
        (3, "c"),
    }

    lake.delete("t", "id = 1")
    assert {tuple(r) for r in lake.read("t").collect()} == {(2, "B"), (3, "c")}

    # time travel back to the first commit
    v0 = min(lake.versions("t"))
    assert {tuple(r) for r in lake.read("t", version=v0).collect()} == {
        (1, "a"),
        (2, "b"),
    }
