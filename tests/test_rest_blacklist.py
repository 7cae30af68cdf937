"""REST fetch layer (S1-S5) + blacklist state (S6/S7)."""

import os

from pyspark.sql import types as T

from cr_data_pipeline_project_spark.sources import blacklist, rest

SCHEMA = T.StructType(
    [
        T.StructField("player_id", T.StringType()),
        T.StructField("trophies", T.IntegerType()),
    ]
)

FAKE_DB = {"#A": {"player_id": "#A", "trophies": 100}, "#B": {"player_id": "#B", "trophies": 200}}


def fake_fetcher(pid):
    return FAKE_DB.get(pid)


def test_fetch_small_collects_rows_and_failures(spark):
    df, failed = rest.fetch_small(
        spark, ["#A", "#MISSING", "#B"], fake_fetcher, SCHEMA
    )
    rows = {r["player_id"]: r["trophies"] for r in df.collect()}
    assert rows == {"#A": 100, "#B": 200}
    assert failed == ["#MISSING"]  # api_extract.py:52-54 capture path


def test_fetch_small_exception_counts_as_failure(spark):
    def boom(pid):
        raise RuntimeError("api down")

    df, failed = rest.fetch_small(spark, ["#A"], boom, SCHEMA)
    assert df.count() == 0 and failed == ["#A"]


def test_fetch_distributed_marks_fetch_ok(spark):
    ids = spark.createDataFrame([("#A",), ("#NOPE",), ("#B",)], "player_id string")
    # defined inline: executors can't import the test module, and
    # cloudpickle serializes closures by value
    db = dict(FAKE_DB)
    out = rest.fetch_distributed(
        ids,
        "player_id",
        lambda pid: db.get(pid),
        "player_id string, trophies int, fetch_ok boolean",
        per_partition_rate=10_000,
    )
    rows = {r["player_id"]: (r["trophies"], r["fetch_ok"]) for r in out.collect()}
    assert rows["#A"] == (100, True)
    assert rows["#NOPE"][1] is False  # routed to blacklist downstream
    assert rows["#B"] == (200, True)


def test_blacklist_union_rewrite(tmp_path):
    p = os.path.join(str(tmp_path), "dropped", "dropped_players.json")
    assert blacklist.read_blacklist(p) == []
    assert blacklist.merge_blacklist(p, ["#B", "#A"]) == ["#A", "#B"]
    # union + dedup on re-merge (etl_pipeline_script.py:66)
    assert blacklist.merge_blacklist(p, ["#B", "#C"]) == ["#A", "#B", "#C"]
    assert blacklist.read_blacklist(p) == ["#A", "#B", "#C"]


def test_filter_blacklisted_prefetch_gate(spark):
    ids = spark.createDataFrame([("#A",), ("#B",), ("#C",)], "player_id string")
    kept = blacklist.filter_blacklisted(ids, "player_id", ["#B"])
    assert sorted(r["player_id"] for r in kept.collect()) == ["#A", "#C"]
    # empty blacklist is a no-op (no filter node added)
    assert blacklist.filter_blacklisted(ids, "player_id", []).count() == 3


def test_rate_limiter_paces():
    import time

    rl = rest.RateLimiter(per_second=50)
    t0 = time.monotonic()
    for _ in range(5):
        rl.wait()
    assert time.monotonic() - t0 >= 4 * 0.02 - 0.005
