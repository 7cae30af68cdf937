"""Product quantization (PQ) for embedding compression — the codebook
companion to the scalar int8 path (operators/similarity.py:int8
quantization) and the missing third leg of the IVF family: IVF routes
(coarse), PQ compresses (fine), reranking verifies (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

A dim-d vector splits into ``m`` contiguous sub-vectors; each
subspace gets its own k-centroid codebook (k ≤ 256 → one byte per
subspace), and a vector stores only its m sub-centroid ids: 64
float32 dims → 8 bytes at m=8, a 32× compression with bounded
reconstruction error.

Scale notes (100 TB / billions of vectors)
------------------------------------------
- Fitting: m independent k-means runs over sliced sub-vectors —
  each is the audited kmeans_fit shape (Arrow-GEMM assign +
  (cid, pos) partial sums); the m-loop is a driver loop over
  distributed jobs, m is small (8-16) by construction.
- Encoding: per subspace one flat centroid table of k×(d/m) doubles
  (tiny — k ≤ 256) assigns via the same GEMM kernel; the m
  assignments regroup to one codes row per vector with ONE shuffle
  (groupBy id over (id, sub, cid) rows — m small ints per vector,
  never the vectors themselves).
- Decoding joins codes to codebooks on (sub, cid) — broadcast-sized
  dimension — and refolds; used for reranking candidates and for the
  reconstruction-error telemetry, never the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import as_double_vec


def pq_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    n_iter: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Fit per-subspace codebooks. Returns (sub int, cid int,
    cv array<double>[d/m]) — m·k rows, broadcast-sized by
    construction. ``dim`` must divide evenly by ``m`` (asserted
    against the first row)."""
    from .clustering import kmeans_fit

    dim = len(df.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_d = dim // m
    v = df.select(F.col(id_col).alias("_id"), as_double_vec(vec_col).alias("_v"))
    books = None
    for s in range(m):
        sliced = v.select(
            "_id", F.slice("_v", s * sub_d + 1, sub_d).alias("sv")
        )
        cb = kmeans_fit(
            sliced, k, "_id", "sv", n_iter=n_iter, seed=seed + s
        ).select(F.lit(s).alias("sub"), "cid", "cv")
        books = cb if books is None else books.unionByName(cb)
    return books.localCheckpoint(eager=True)


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as its m sub-centroid ids. Returns
    (id_col, codes array<int>[m]). Per-subspace assignment runs the
    Arrow-GEMM kernel against that subspace's (tiny) codebook; the m
    id-streams regroup with one groupBy-id shuffle carrying m small
    ints per vector."""
    from .similarity import nearest_centroids

    rows = codebooks.groupBy("sub").count().orderBy("sub").collect()
    subs = [int(r["sub"]) for r in rows]  # bounded: m rows
    sub_d = len(codebooks.select("cv").first()[0])
    v = df.select(F.col(id_col).alias("_id"), as_double_vec(vec_col).alias("_v"))

    parts = None
    for s in subs:
        sliced = v.select(
            "_id", F.slice("_v", s * sub_d + 1, sub_d).alias("sv")
        )
        cb = codebooks.where(F.col("sub") == s).select("cid", "cv")
        a = nearest_centroids(
            sliced, cb, probe=1, id_col="_id", vec_col="sv"
        ).select("_id", F.lit(s).alias("sub"), "cid")
        parts = a if parts is None else parts.unionByName(a)
    return (
        parts.groupBy("_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "cid"))),
                lambda x: x["cid"],
            ).alias("codes")
        )
        .select(F.col("_id").alias(id_col), "codes")
    )


def pq_decode(
    codes: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Reconstruct approximate vectors from codes: explode (sub, cid),
    join the broadcast codebook, refold sub-vectors in subspace
    order. Returns (id_col, vec_hat array<double>)."""
    exploded = codes.select(
        F.col(id_col), F.posexplode("codes").alias("sub", "cid")
    )
    joined = exploded.join(F.broadcast(codebooks), ["sub", "cid"])
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub", "cv"))),
                    lambda x: x["cv"],
                )
            ).alias("vec_hat")
        )
    )


def pq_reconstruction_report(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    n_iter: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Fit → encode → decode → per-vector squared reconstruction
    error, the telemetry a compression rollout watches. Returns
    (id_col, n_codes int, recon_err double). Error folds JVM-side
    (zip_with/aggregate) on the rejoined (v, v_hat) pair — one
    key-equi join, vectors shuffle once each."""
    books = pq_fit(df, id_col, vec_col, m=m, k=k, n_iter=n_iter, seed=seed)
    codes = pq_encode(df, books, id_col, vec_col)
    hat = pq_decode(codes, books, id_col)
    v = df.select(F.col(id_col), as_double_vec(vec_col).alias("_v"))
    err = F.aggregate(
        F.zip_with(
            F.col("_v"), F.col("vec_hat"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        v.join(hat, id_col)
        .join(codes, id_col)
        .select(
            F.col(id_col),
            F.size("codes").alias("n_codes"),
            F.round(err, 6).alias("recon_err"),
        )
    )
