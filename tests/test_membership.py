"""Bloom-style prefiltered membership gate: exactness vs the plain
anti-join, under sketch sizes that force heavy bucket collisions."""

import pytest
from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.operators.membership import (
    bucket_sketch,
    prefiltered_new_keys,
)


def _plain_new_keys(incoming, existing, key, ek):
    return (
        incoming.select(key)
        .where(F.col(key).isNotNull())
        .distinct()
        .join(
            existing.select(F.col(ek).alias(key)).where(
                F.col(key).isNotNull()
            ),
            key,
            "left_anti",
        )
    )


@pytest.mark.parametrize("m", [4, 64, 1 << 13])
def test_exactness_under_collisions(spark, m):
    """The sketch only routes — the answer must equal the plain
    NOT IN anti-join even when m is tiny (every bucket collides)."""
    incoming = spark.range(0, 500).select(
        (F.col("id") * 3 % 400).alias("k")
    )
    existing = spark.range(0, 200).select((F.col("id") * 2).alias("ek"))
    got = sorted(
        r.k for r in prefiltered_new_keys(incoming, existing, "k", "ek", m=m).collect()
    )
    want = sorted(
        r.k for r in _plain_new_keys(incoming, existing, "k", "ek").collect()
    )
    assert got == want
    assert len(got) > 0


def test_nulls_dropped(spark):
    incoming = spark.createDataFrame(
        [(1,), (None,), (7,)], "k bigint"
    )
    existing = spark.createDataFrame([(1,), (None,)], "ek bigint")
    got = sorted(r.k for r in prefiltered_new_keys(incoming, existing, "k", "ek").collect())
    assert got == [7]


def test_sketch_bounded_and_no_false_negatives(spark):
    """Sketch row count ≤ m; every existing key's bucket is in it."""
    existing = spark.range(0, 5000).select(F.col("id").alias("ek"))
    m = 256
    sk = bucket_sketch(existing, "ek", m)
    assert sk.count() <= m
    missed = (
        existing.select(
            F.pmod(F.xxhash64("ek"), F.lit(m)).alias("__bucket")
        )
        .distinct()
        .join(sk, "__bucket", "left_anti")
        .count()
    )
    assert missed == 0


def test_definite_new_skips_exact_join(spark):
    """With m large vs the existing-key spread, most genuinely new
    keys must resolve via sketch miss (the scale-path claim): the
    residual exact join sees only sketch-positive rows."""
    existing = spark.range(0, 100).select(F.col("id").alias("ek"))
    incoming = spark.range(10_000, 11_000).select(F.col("id").alias("k"))
    m = 1 << 13
    sk = bucket_sketch(existing, "ek", m)
    sketch_positive = (
        incoming.select(
            F.pmod(F.xxhash64("k"), F.lit(m)).alias("__bucket")
        )
        .join(sk, "__bucket", "left_semi")
        .count()
    )
    # fill factor ≈ 100/8192 ≈ 1.2% ⇒ ~12 of 1000 collide in expectation
    assert sketch_positive < 100
    assert prefiltered_new_keys(incoming, existing, "k", "ek", m=m).count() == 1000
