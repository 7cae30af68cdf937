"""Distributed k-means (Lloyd's algorithm) over embedding columns.

Replaces the IVF centroid "stand-in" (a deterministic id-prefix
sample) with a real fit: deterministic hash-sample seeding, then
``n_iter`` Lloyd rounds expressed entirely as DataFrame ops — the
assign step is a broadcast join against the (tiny) centroid table
reduced by a map-side-combining argmin aggregate, the update step a
``posexplode`` + two-level groupBy producing element-wise means.

Reference parity: the reference engine has no clustering operator;
this exists to make the IVF ANN path (operators/similarity.py,
SURVEY.md §2 similarity-search family) honest — IVF recall depends
on centroid quality, and an id-prefix sample is a poor partitioner
for real corpora.

Scale notes (100 TB / billions of vectors)
------------------------------------------
- Per iteration: one broadcast join (centroids are k×dim doubles —
  tiny, always under the broadcast threshold) and two aggregations.
  The argmin aggregate partial-combines map-side, so the first
  shuffle carries ≤1 row per vector (never the N×k scored rows); the
  mean aggregate partial-combines (cid, pos) sums, so the second
  shuffle carries ~k×dim×n_partitions partial rows, independent of
  corpus size.
- A window (`row_number over partitionBy(_id)`) would shuffle all
  N×k scored rows — the aggregate argmin is the scalable shape.
- Iterations are driver-side loop steps over distributed plans; each
  new centroid table ``localCheckpoint``s to cut lineage, exactly
  like operators/graph.py's label propagation.
- Seeding samples the k rows with the smallest ``xxhash64(id,
  seed)`` — engine- and partitioning-independent. The fitted means
  are float-sum-order dependent in the last ulps (as in every
  distributed k-means); tests assert inertia decrease and assignment
  quality, not bit-exact centroids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from .similarity import as_double_vec

__all__ = ["kmeans_fit", "kmeans_assign", "inertia"]


def _sqdist(a: Column, b: Column) -> Column:
    """Squared L2 via sequential fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(
    vecs: DataFrame, cents: DataFrame, engine: str = "expr"
) -> DataFrame:
    """(_id, vd) × centroids → (_id, vd, cid) of the nearest
    centroid, ties broken on smallest cid.

    ``engine='expr'``: broadcast join + struct-min aggregate — pure
    JVM, bit-reproducible sequential folds, the shape the oracled
    IVF assignment shares. Partial aggregation collapses the k
    candidates per vector map-side, but each of the N×k distance
    folds evaluates interpreted — cost grows linearly in k.

    ``engine='arrow'``: one BLAS GEMM per Arrow batch against all k
    centroids (similarity.nearest_centroids) — no N×k row expansion
    at all, constant-ish cost in k. Summation order differs in the
    last ulps, so this path serves the fit loop and other
    recall-gated surfaces, not bit-parity-tested assignment."""
    if engine == "arrow":
        from .similarity import nearest_centroids

        return nearest_centroids(
            vecs, cents, probe=1, id_col="_id", vec_col="vd", carry_vec=True
        ).select("_id", "vd", "cid")
    scored = vecs.join(F.broadcast(cents)).withColumn(
        "_d", _sqdist(F.col("vd"), F.col("cv"))
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.min(F.struct(F.col("_d"), F.col("cid"))).alias("_m"),
            # all rows in the group share the vector; first() is
            # value-deterministic here
            F.first("vd").alias("vd"),
        )
        .select("_id", "vd", F.col("_m.cid").alias("cid"))
    )


def kmeans_fit(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    n_iter: int = 5,
    seed: int = 42,
    engine: str = "arrow",
) -> DataFrame:
    """Fit k centroids with Lloyd's algorithm; returns
    ``(cid int, cv array<double>)``. The Lloyd loop's assign step
    defaults to the Arrow GEMM engine (see :func:`_assign`) — the
    fit is ulp-tolerant by contract (tests assert inertia descent
    and assignment quality, never bit-exact centroids), and the
    GEMM keeps per-iteration cost flat as k grows toward the √N
    centroid counts a real IVF fit wants. Pass ``engine='expr'``
    for the pure-JVM fold loop."""
    vecs = corpus.select(
        F.col(id_col).alias("_id"), as_double_vec(vec_col).alias("vd")
    ).localCheckpoint(eager=True)

    # deterministic seeds, numbered 0..k-1 in hash order (k rows on
    # the driver-side window is trivial)
    seeds = (
        vecs.select(F.xxhash64(F.col("_id"), F.lit(seed)).alias("_h"), "vd")
        .orderBy("_h")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("_h")) - F.lit(1)).alias("cid"),
            F.col("vd").alias("cv"),
        )
    )
    if n_iter <= 0:
        return seeds.localCheckpoint(eager=True)

    # Centroid update: ONE groupBy(cid) with a per-position avg each
    # (map-side partial-combining, k×dim aggregate state) instead of
    # the posexplode + (cid, pos) aggregate + refold — the explode
    # fanned every vector into dim rows and shuffled them per
    # iteration (optimization round 12, guide §2.3 "aggregate before
    # you shuffle"). try_element_at keeps the ragged-vector
    # semantics of the per-pos form: a position absent from a short
    # vector is NULL and avg() skips it.
    def _update(assigned, dim):
        avgs = [
            F.avg(
                F.try_element_at(F.col("vd"), F.lit(i + 1))
            ).alias(f"__a{i}")
            for i in range(dim)
        ]
        arr = F.array(*[F.col(f"__a{i}") for i in range(dim)])
        return assigned.groupBy("cid").agg(*avgs).select(
            "cid", arr.alias("cv")
        )

    if engine == "arrow":
        # Lloyd generations stay DRIVER-SIDE between iterations (the
        # pq_fit round-12 trim): the k-row codebook is collect-
        # bounded by the same contract the Arrow assigner already
        # relies on (it ships the table in the task closure), so the
        # seed checkpoint, the per-iteration generation checkpoints
        # AND the assigner's per-iteration re-collect all fold into
        # one collect per generation; dim rides the seed collect.
        # Only the FINAL generation checkpoints (the returned
        # DataFrame keeps its round-11 form).
        rows = seeds.collect()
        if not rows:
            return seeds.localCheckpoint(eager=True)
        dim = max(len(r["cv"]) for r in rows)
        cents = None
        for i in range(n_iter):
            assigned = _assign(vecs, rows, engine="arrow")
            upd = _update(assigned, dim)
            if i < n_iter - 1:
                rows = upd.collect()
            else:
                cents = upd.localCheckpoint(eager=True)
        return cents

    cents = seeds.localCheckpoint(eager=True)
    dim = int(cents.agg(F.max(F.size("cv"))).first()[0])
    for _ in range(n_iter):
        assigned = _assign(vecs, cents, engine=engine)
        cents = _update(assigned, dim).localCheckpoint(eager=True)
    return cents


def kmeans_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "emb",
) -> DataFrame:
    """Assign every vector to its nearest fitted centroid (squared
    L2). Returns ``(id_col, cluster_id)``. Centroids broadcast."""
    vecs = corpus.select(
        F.col(id_col).alias("_id"), as_double_vec(vec_col).alias("vd")
    )
    return _assign(vecs, centroids).select(
        F.col("_id").alias(id_col), F.col("cid").alias("cluster_id")
    )


def inertia(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "emb",
) -> float:
    """Sum of squared distances to the nearest centroid — the
    quantity Lloyd iterations monotonically decrease (up to float
    summation noise). One aggregate; for monitoring/tests."""
    vecs = corpus.select(
        F.col(id_col).alias("_id"), as_double_vec(vec_col).alias("vd")
    )
    scored = vecs.join(F.broadcast(centroids)).withColumn(
        "_d", _sqdist(F.col("vd"), F.col("cv"))
    )
    row = (
        scored.groupBy("_id")
        .agg(F.min("_d").alias("d"))
        .agg(F.sum("d").alias("s"))
        .collect()[0]
    )
    return float(row["s"])
