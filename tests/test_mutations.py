"""Mutation-layer tests: upsert / insert-if-absent / cascade delete /
surrogate keys — pure-DF semantics plus the parquet write path
(reference behavior: db_ops.py:32-149, etl_pipeline_script.py:43-147)."""

import os

from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.operators import mutations


def _players(spark, rows):
    return spark.createDataFrame(rows, "player_id string, name string, trophies int")


def test_upsert_source_wins_and_target_survives(spark):
    target = _players(spark, [("#A", "alice", 100), ("#B", "bob", 200)])
    source = _players(spark, [("#B", "bobby", 250), ("#C", "cara", 50)])
    out = {r["player_id"]: r for r in mutations.upsert(target, source, ["player_id"]).collect()}
    assert len(out) == 3
    assert out["#A"]["name"] == "alice"  # unmatched target survives
    assert out["#B"]["name"] == "bobby" and out["#B"]["trophies"] == 250  # updated
    assert out["#C"]["name"] == "cara"  # inserted


def test_upsert_idempotent(spark):
    target = _players(spark, [("#A", "alice", 100)])
    source = _players(spark, [("#A", "alice2", 101)])
    once = mutations.upsert(target, source, ["player_id"])
    twice = mutations.upsert(once, source, ["player_id"])
    assert sorted(once.collect()) == sorted(twice.collect())


def test_insert_if_absent(spark):
    new = _players(spark, [("#A", "a", 1), ("#B", "b", 2), ("#C", "c", 3)])
    existing = _players(spark, [("#B", "x", 0)]).select("player_id")
    out = mutations.insert_if_absent(new, existing, ["player_id"]).collect()
    assert sorted(r["player_id"] for r in out) == ["#A", "#C"]


def test_cascade_delete_child_parent(spark):
    players = _players(spark, [("#A", "a", 1), ("#B", "b", 2)])
    matches = spark.createDataFrame(
        [("m1", "#A"), ("m2", "#B"), ("m3", "#B")], "match_key string, player_id string"
    )
    purge = spark.createDataFrame([("#B",)], "player_id string")
    out = mutations.cascade_delete(
        {"matches": matches, "players": players}, "player_id", purge
    )
    assert [r["player_id"] for r in out["players"].collect()] == ["#A"]
    assert [r["match_key"] for r in out["matches"].collect()] == ["m1"]


def test_surrogate_keys_deterministic(spark):
    df = spark.createDataFrame(
        [("k2",), ("k1",), ("k3",)], "match_key string"
    )
    out1 = mutations.add_surrogate_keys(df, ["match_key"], "id", start_at=10)
    out2 = mutations.add_surrogate_keys(df, ["match_key"], "id", start_at=10)
    got1 = {r["match_key"]: r["id"] for r in out1.collect()}
    got2 = {r["match_key"]: r["id"] for r in out2.collect()}
    assert got1 == got2 == {"k1": 11, "k2": 12, "k3": 13}


def test_assign_dense_ids_unique_and_dense(spark):
    df = spark.range(0, 1000).repartition(7).withColumnRenamed("id", "x")
    out = mutations.assign_dense_ids(df, "rid", start_at=100)
    ids = [r["rid"] for r in out.collect()]
    assert sorted(ids) == list(range(101, 1101))


def test_assign_dense_ids_multipartition_deterministic(spark):
    """Range-partitioned + sorted input ⇒ ids equal the global
    row_number over the key, stably across runs (the documented
    sorted-id-space recipe)."""
    base = (
        spark.range(0, 500)
        .withColumnRenamed("id", "k")
        .repartitionByRange(9, "k")
        .sortWithinPartitions("k")
    )
    got1 = {
        r["k"]: r["rid"]
        for r in mutations.assign_dense_ids(base, "rid").collect()
    }
    got2 = {
        r["k"]: r["rid"]
        for r in mutations.assign_dense_ids(base, "rid").collect()
    }
    assert got1 == got2 == {k: k + 1 for k in range(500)}


def test_assign_dense_ids_plan_is_jvm_only(spark):
    """No Python/RDD nodes: the scale path must stay inside codegen
    (round-1 verdict flagged the old RDD round-trip)."""
    df = spark.range(0, 100).repartition(5)
    out = mutations.assign_dense_ids(df, "rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Scan ExistingRDD" not in plan
    assert "BroadcastHashJoin" in plan


def test_parquet_append_roundtrip(spark, tmp_path):
    """S10 — bulk append sink (db_ops.py:44-50) on a scratch lake."""
    p = os.path.join(str(tmp_path), "players")
    a = _players(spark, [("#A", "a", 1)])
    b = _players(spark, [("#B", "b", 2)])
    a.write.mode("append").parquet(p)
    b.write.mode("append").parquet(p)
    assert spark.read.parquet(p).count() == 2


def test_upsert_write_path_overwrite(spark, tmp_path):
    """M1 fallback without a transactional format: anti-join-union +
    overwrite to a staging dir then swap (here: direct overwrite with
    a re-read via cache to break lineage on the source files)."""
    p = os.path.join(str(tmp_path), "dim")
    _players(spark, [("#A", "a", 1), ("#B", "b", 2)]).write.parquet(p)
    target = spark.read.parquet(p)
    source = _players(spark, [("#B", "b2", 3)])
    merged = mutations.upsert(target, source, ["player_id"]).cache()
    merged.count()  # materialize before overwriting the input files
    merged.write.mode("overwrite").parquet(p)
    out = {r["player_id"]: r["name"] for r in spark.read.parquet(p).collect()}
    assert out == {"#A": "a", "#B": "b2"}
