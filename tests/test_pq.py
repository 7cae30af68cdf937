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


def test_pq_sampled_seeding_exact(spark):
    """The hash-thresholded seeding sample must yield EXACTLY the k
    smallest-hash rows per subspace — identical to a full-subspace
    window — because the filter keeps every hash below the cut. Run
    at n_iter=0 (pure seeds) on a corpus large enough to trigger the
    sampling path (n_per_sub > max(128, 8k))."""
    import random

    from pyspark.sql.window import Window

    rng = random.Random(77)
    n, m, k, seed = 600, 4, 8, 42
    rows = [
        (i, [float(rng.gauss(0, 1)) for _ in range(16)]) for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq.pq_fit(emb, m=m, k=k, n_iter=0, seed=seed)

    # independent full-window reference (what the unsampled path did)
    sub_d = 4
    slices = F.array(*[F.slice("embedding", s * sub_d + 1, sub_d) for s in range(m)])
    ref_rows = emb.select(
        F.col("vec_id").alias("_id"), F.posexplode(slices).alias("sub", "sv")
    )
    w = Window.partitionBy("sub").orderBy(
        F.xxhash64("_id", F.lit(seed) + F.col("sub")), F.col("_id")
    )
    ref = (
        ref_rows.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            "sub",
            (F.col("__rn") - F.lit(1)).cast("int").alias("cid"),
            F.col("sv").alias("cv"),
        )
    )
    # the sampling path triggers by construction: n_per_sub (600) is
    # far above the oversample target max(128, 8*8)=128
    assert n > max(128, 8 * k)
    got = {(r["sub"], r["cid"]): tuple(r["cv"]) for r in books.collect()}
    want = {(r["sub"], r["cid"]): tuple(r["cv"]) for r in ref.collect()}
    assert len(got) == m * k
    assert got == want


def test_pq_rejects_indivisible_dim(spark):
    import pytest

    emb = table(spark, "embeddings", SF)
    with pytest.raises(ValueError):
        pq.pq_fit(emb, m=7)


def test_pq_adc_topk_recall_on_planted_twins(spark):
    """ADC search over planted near-dup twins (base i ↔ noisy copy
    i+1000): the twin must rank inside the top-5 for most probes —
    the operating-point recall bar for m=8, k=16 codebooks. Random
    fixture vectors carry no neighbor structure PQ could preserve,
    so the bar is on planted structure, like the hyperplane-LSH
    test. Self-matches must never appear."""
    import random

    rng = random.Random(11)
    base = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(40)]
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append(
            (i + 1000, [float(x + rng.gauss(0, 0.05)) for x in v])
        )
    # background corpus: unrelated vectors
    for j in range(2000, 2400):
        rows.append((j, [float(rng.gauss(0, 1)) for _ in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    books = pq.pq_fit(emb, m=8, k=16, n_iter=2)
    codes = pq.pq_encode(emb, books)
    queries = emb.where(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq.pq_topk(
        codes, books, queries, query_id_col="query_id", k=5
    ).collect()
    by_q = {}
    for r in out:
        assert r.neighbor_id != r.query_id
        assert 1 <= r.rank <= 5
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert len(by_q) == 40
    hits = sum(1 for q, ns in by_q.items() if q + 1000 in ns)
    assert hits / 40 >= 0.8, f"ADC twin recall {hits}/40"


def test_ivfpq_topk_recall_and_cell_pruning(spark):
    """IVF-PQ on planted twins: routing + ADC must still recover the
    twin for most probes at nprobe=4/8 cells, every result must come
    from a probed cell, and results must agree with the full-scan
    pq_topk wherever the probed cells contain the full-scan winners."""
    import random

    import numpy as np

    from cr_data_pipeline_project_spark.operators import clustering

    rng = random.Random(23)
    base = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(30)]
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((i + 1000, [float(x + rng.gauss(0, 0.05)) for x in v]))
    for j in range(2000, 2300):
        rows.append((j, [float(rng.gauss(0, 1)) for _ in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cells = clustering.kmeans_fit(emb, 8, "vec_id", "embedding", n_iter=2)
    assigned = clustering.kmeans_assign(emb, cells, "vec_id", "embedding")
    books = pq.pq_fit(emb, m=8, k=16, n_iter=2)
    codes = pq.pq_encode(emb, books).join(
        assigned.withColumnRenamed("cluster_id", "cell"), "vec_id"
    )
    queries = emb.where(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq.ivfpq_topk(
        codes, books, cells, queries, query_id_col="query_id", k=5, nprobe=4
    ).collect()
    by_q = {}
    for r in out:
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    hits = sum(1 for q, ns in by_q.items() if q + 1000 in ns)
    assert hits / 30 >= 0.7, f"IVF-PQ twin recall {hits}/30"

    # every emitted neighbor lives in one of its query's probed cells
    cell_of = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    crows = sorted(cells.collect(), key=lambda r: r["cid"])
    C = np.array([list(r["cv"]) for r in crows])
    cids = np.array([r["cid"] for r in crows])
    cn = (C * C).sum(axis=1)
    qv = {r["vec_id"]: np.array(r["embedding"]) for r in emb.where(F.col("vec_id") < 30).collect()}
    for q, ns in by_q.items():
        D = cn - 2.0 * (C @ qv[q])
        probed = set(int(c) for c in cids[np.argsort(D, kind="stable")[:4]])
        for n in ns:
            assert cell_of[n] in probed, (q, n)


def test_pq_skips_malformed_vectors(spark):
    """A null or wrong-dimension embedding must be dropped before the
    Arrow kernels, not crash the job (same contract as the similarity
    kernels)."""
    import random

    rng = random.Random(3)
    rows = [(i, [float(rng.gauss(0, 1)) for _ in range(64)]) for i in range(60)]
    bad = [(9001, None), (9002, [1.0, 2.0])]
    emb = spark.createDataFrame(
        rows + bad, "vec_id long, embedding array<double>"
    )
    books = pq.pq_fit(emb, m=8, k=8, n_iter=1)
    codes = pq.pq_encode(emb, books)
    ids = {r.vec_id for r in codes.collect()}
    assert 9001 not in ids and 9002 not in ids
    assert len(ids) == 60


def test_ivfpq_cell_partitioned_layout_prunes_files(spark, tmp_path):
    """The 100 TB claim made checkable: codes written PARTITIONED BY
    cell let a probed-cells filter prune parquet partitions at plan
    time — the scan's PartitionFilters must carry the cell predicate
    and the input files must shrink to the probed subset."""
    import os

    from cr_data_pipeline_project_spark.operators import clustering

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cells = clustering.kmeans_fit(emb, 8, "vec_id", "embedding", n_iter=1)
    assigned = clustering.kmeans_assign(emb, cells, "vec_id", "embedding")
    books = pq.pq_fit(emb, m=8, k=8, n_iter=1)
    codes = pq.pq_encode(emb, books).join(
        assigned.withColumnRenamed("cluster_id", "cell"), "vec_id"
    )
    path = os.path.join(str(tmp_path), "codes_by_cell")
    codes.write.partitionBy("cell").parquet(path)

    back = spark.read.parquet(path)
    probed = back.where(F.col("cell").isin([0, 1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # physical proof: only the probed cells' files are read
    n_all = back.select(F.input_file_name()).distinct().count()
    n_probed = probed.select(F.input_file_name()).distinct().count()
    assert 0 < n_probed < n_all
    # and the rows really are the probed subset
    assert probed.count() == back.where("cell in (0, 1)").count() > 0


def test_pq_rerank_improves_on_adc_and_matches_exact_scores(spark):
    """Exact rerank over an ADC shortlist: twin recall must be at
    least ADC's, and every reranked score must equal the exact cosine
    the brute-force baseline computes for the same pair."""
    import random

    from cr_data_pipeline_project_spark.operators.similarity import (
        brute_force_topk,
    )

    rng = random.Random(31)
    base = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(25)]
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((i + 1000, [float(x + rng.gauss(0, 0.05)) for x in v]))
    for j in range(2000, 2300):
        rows.append((j, [float(rng.gauss(0, 1)) for _ in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    books = pq.pq_fit(emb, m=8, k=16, n_iter=2)
    codes = pq.pq_encode(emb, books)
    queries = emb.where(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    shortlist = pq.pq_topk(codes, books, queries, query_id_col="query_id", k=40)
    adc5 = {
        (r.query_id, r.neighbor_id)
        for r in shortlist.where(F.col("rank") <= 5).collect()
    }
    reranked = pq.pq_rerank(
        shortlist, emb, queries, query_id_col="query_id", k=5
    ).collect()
    rr5 = {(r.query_id, r.neighbor_id) for r in reranked}

    def twin_recall(pairs):
        return sum(1 for q in range(25) if (q, q + 1000) in pairs) / 25

    assert twin_recall(rr5) >= twin_recall(adc5)
    assert twin_recall(rr5) >= 0.9  # exact scoring fixes ADC misses

    # reranked scores are the EXACT cosine the baseline computes
    exact = {
        (r["query_id"], r["neighbor_id"]): r["score"]
        for r in brute_force_topk(
            emb, emb.where(F.col("vec_id") < 25), k=50
        ).collect()
    }
    for r in reranked:
        key = (r.query_id, r.neighbor_id)
        if key in exact:
            assert abs(r.score - exact[key]) < 1e-9, key


def test_pq_malformed_first_row_does_not_poison_dim(spark):
    """A null or short vector in the FIRST row must neither crash the
    dimension sniff nor lock it onto the malformed size — the fit
    keys off the corpus's dominant vector size."""
    import random

    rng = random.Random(5)
    rows = [(0, None), (1, [1.0, 2.0])] + [
        (i, [float(rng.gauss(0, 1)) for _ in range(64)]) for i in range(2, 50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq.pq_fit(emb, m=8, k=8, n_iter=1)
    assert all(len(r["cv"]) == 8 for r in books.collect())
    codes = pq.pq_encode(emb, books)
    ids = {r.vec_id for r in codes.collect()}
    assert 0 not in ids and 1 not in ids and len(ids) == 48


def test_pq_rerank_custom_query_id_col(spark):
    """pq_rerank must accept a non-default query_id_col: the
    candidates frame always carries the literal 'query_id' column,
    the parameter names the column in `queries` only."""
    import random

    rng = random.Random(9)
    rows = [(i, [float(rng.gauss(0, 1)) for _ in range(64)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq.pq_fit(emb, m=8, k=8, n_iter=1)
    codes = pq.pq_encode(emb, books)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    shortlist = pq.pq_topk(codes, books, queries, query_id_col="probe_id", k=10)
    out = pq.pq_rerank(
        shortlist, emb, queries, query_id_col="probe_id", k=3
    ).collect()
    assert {r.query_id for r in out} == {0, 1, 2}
    assert all(1 <= r.rank <= 3 for r in out)
