"""Product quantization: codebook shape, code validity, and the
reconstruction-error contract (PQ must beat the 1-centroid-per-
subspace baseline it degenerates to at k=1)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.catalog import table
from cr_data_pipeline_project_spark.operators import pq

SF = "/root/testdata/sf0.001"


def test_pq_shapes_and_code_range(spark):
    emb = table(spark, "embeddings", SF)
    books = pq.pq_fit(emb, m=8, k=16, n_iter=1)
    rows = books.collect()
    assert {r["sub"] for r in rows} == set(range(8))
    assert all(0 <= r["cid"] < 16 for r in rows)
    assert all(len(r["cv"]) == 8 for r in rows)  # 64 dims / 8 subspaces

    codes = pq.pq_encode(emb, books)
    got = codes.collect()
    assert len(got) == emb.count()
    assert all(len(r["codes"]) == 8 for r in got)
    assert all(all(0 <= c < 16 for c in r["codes"]) for r in got)


def test_pq_decode_round_trip_dims(spark):
    emb = table(spark, "embeddings", SF)
    books = pq.pq_fit(emb, m=8, k=16, n_iter=1)
    codes = pq.pq_encode(emb, books)
    hat = pq.pq_decode(codes, books)
    assert all(len(r["vec_hat"]) == 64 for r in hat.collect())
    # every reconstructed sub-vector IS a codebook row
    cb = {
        (r["sub"], tuple(round(x, 9) for x in r["cv"]))
        for r in books.collect()
    }
    for r in hat.limit(10).collect():
        for s in range(8):
            sub = tuple(round(x, 9) for x in r["vec_hat"][s * 8 : (s + 1) * 8])
            assert (s, sub) in cb


def test_pq_beats_one_centroid_baseline(spark):
    """Mean squared reconstruction error at k=16 must be strictly
    below the k=1 degenerate fit (each subspace collapsed to its
    mean) — the minimal 'the codebooks learned something' bar."""
    emb = table(spark, "embeddings", SF)

    def mse(k):
        rep = pq.pq_reconstruction_report(emb, m=8, k=k, n_iter=2)
        row = rep.agg(F.avg("recon_err").alias("e")).collect()[0]
        return float(row["e"])

    assert mse(16) < mse(1)


def test_pq_rejects_indivisible_dim(spark):
    import pytest

    emb = table(spark, "embeddings", SF)
    with pytest.raises(ValueError):
        pq.pq_fit(emb, m=7)
