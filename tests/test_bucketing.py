"""Bucketed-layout contract: co-bucketed tables join with ZERO
Exchange operators (the shuffle was paid once at write time), while
the identical join on plain parquet shuffles both sides. This is the
mechanical proof behind the 100 TB co-located-join story in
operators/bucketing.py and docs/SCALE.md."""

import os

import pytest
from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.catalog import table
from cr_data_pipeline_project_spark.operators.bucketing import (
    cobucketed_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    # Materialize so AQE finalizes, then read the executed plan —
    # the initial plan hides post-AQE exchange elimination/insertion.
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    o = table(spark, "orders", SF)
    li = table(spark, "lineitem", SF)
    write_bucketed(
        o, "b_orders", "o_orderkey", 8, path=os.path.join(str(tmp_path), "o")
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        8,
        path=os.path.join(str(tmp_path), "l"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_eliminates_all_exchanges(spark, bucketed_tables):
    # Disable auto-broadcast: at fixture scale the planner would
    # broadcast these tiny tables, hiding the property under test —
    # at 100 TB neither fact side is broadcastable and sort-merge is
    # the only strategy, so that's the regime the assertion models.
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, lt, rt, "o_orderkey").select(
            "o_orderkey", "o_totalprice", "l_quantity"
        )
        plan = _final_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan

        # identical join on plain parquet must shuffle — the
        # bucketed layout is what removed the exchanges
        o = table(spark, "orders", SF)
        li = table(spark, "lineitem", SF).withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        baseline = _final_plan(
            o.join(li, "o_orderkey").select(
                "o_orderkey", "o_totalprice", "l_quantity"
            )
        )
        assert "Exchange" in baseline
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cobucketed_join_values_match_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = sorted(
        (r["o_orderkey"], r["l_linenumber"])
        for r in cobucketed_join(spark, lt, rt, "o_orderkey")
        .select("o_orderkey", "l_linenumber")
        .collect()
    )
    o = table(spark, "orders", SF)
    li = table(spark, "lineitem", SF).withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    want = sorted(
        (r["o_orderkey"], r["l_linenumber"])
        for r in o.join(li, "o_orderkey")
        .select("o_orderkey", "l_linenumber")
        .collect()
    )
    assert got == want and len(got) > 0


def test_groupby_on_bucket_key_skips_exchange(spark, bucketed_tables):
    """Bucketed layout pays for aggregations too: a groupBy on the
    bucket key needs no shuffle — partial and final agg fuse over
    the pre-partitioned scan."""
    _, rt = bucketed_tables
    agg = (
        spark.table(rt)
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = _final_plan(agg)
    assert "Exchange" not in plan, plan
