"""Embedding linear algebra — distributed PCA fit + projection /
whitening.

PCA over an embedding column is the standard preprocessing step of
the semantic-dedup / retrieval stack (SemDeDup preprocesses with
normalization + dimensionality reduction; OPQ rotates subspaces
before PQ): fit once, project everywhere.

The fit is the classic two-moment reduction, kept fully distributed:

1. **Partials** (``mapInPandas``): each Arrow batch reduces to ONE
   row — (n, Σx [d doubles], ΣxᵀX [d² doubles]) — a numpy GEMM per
   batch, so worker memory is O(d²) regardless of corpus size.
2. **Combine** (explode + groupBy): partial rows explode to
   (idx, value) and sum per index — a partial-combining aggregate on
   d+d²+1 keys (4 161 for d=64). No driver-side loop; the tree is
   Spark's.
3. **Eigendecomposition** (driver): the COVARIANCE matrix — d×d,
   i.e. 32 KB at d=64, bounded by the embedding width by contract,
   never by corpus size — is collected and ``numpy.linalg.eigh``'d.
   This is the textbook boundary: distributed moments, local
   O(d³) solve (d ≤ a few thousand for any real embedding).

Projection is expression-only: k dot products via ``zip_with`` +
``aggregate`` HOFs — whole-stage codegen, no Python in the serve
path, broadcast-free (the k×d components inline as literals).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class PCAModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows = principal axes, unit norm
    explained_var: np.ndarray  # (k,) eigenvalues, descending
    n: int

    @property
    def dim(self) -> int:
        return int(self.mean.shape[0])

    @property
    def k(self) -> int:
        return int(self.components.shape[0])


def _moment_sums_by_dim(df: DataFrame, vec_col: str) -> dict[int, np.ndarray]:
    """Distributed (n, Σx, vec(ΣxᵀX)) per vector-LENGTH class, one
    pass, no upfront dimension: {d: flat (1+d+d²) vector}. Folding
    the length census into the moment pass removes the separate
    dominant-size probe job fit_pca ran first (optimization round 12,
    guide §1.2). Per-class accumulation order matches the old
    fixed-dim kernel exactly (same rows, same batch order), and the
    output stays bounded: Σ_classes (1+d+d²) rows."""

    def partials(batches):
        accs: dict[int, np.ndarray] = {}
        for pdf in batches:
            groups: dict[int, list] = {}
            for v in pdf[vec_col]:
                if v is None:
                    continue
                groups.setdefault(len(v), []).append(
                    np.asarray(v, dtype=np.float64)
                )
            for d, vs in groups.items():
                acc = accs.get(d)
                if acc is None:
                    acc = accs[d] = np.zeros(
                        1 + d + d * d, dtype=np.float64
                    )
                X = np.stack(vs) if d else np.zeros((len(vs), 0))
                acc[0] += len(X)
                acc[1 : 1 + d] += X.sum(axis=0)
                acc[1 + d :] += (X.T @ X).ravel()
        if accs:
            yield pd.DataFrame(
                {
                    "d": list(accs),
                    "p": [a.tolist() for a in accs.values()],
                }
            )

    part = df.select(vec_col).mapInPandas(partials, "d int, p array<double>")
    summed = (
        part.select("d", F.posexplode("p").alias("idx", "v"))
        .groupBy("d", "idx")
        .agg(F.sum("v").alias("s"))
        .collect()  # bounded: Σ_length-classes (1+d+d²) rows
    )
    out: dict[int, np.ndarray] = {}
    for r in summed:
        d = int(r["d"])
        if d not in out:
            out[d] = np.zeros(1 + d + d * d, dtype=np.float64)
        out[d][r["idx"]] = r["s"]
    return out


def fit_pca(
    df: DataFrame, vec_col: str = "embedding", k: int | None = 8
) -> PCAModel:
    """Fit a k-component PCA of ``vec_col`` (``k=None`` → full rank,
    the orthogonal-rotation case). Deterministic: moments are float
    sums (combine order varies in the last ulps; the eigensolve is
    stable far beyond that), eigenvector SIGN is pinned by making
    each component's largest-|coordinate| entry positive."""
    # dimension = the corpus's MOST COMMON vector size (the pq_fit
    # convention): sniffing the first row would lock onto a malformed
    # minority-width vector and silently drop every valid one. The
    # length census rides the moment pass itself (one job, not two);
    # the dominance tie-break (higher count, then smaller dim)
    # matches the old ORDER BY count DESC, size ASC probe.
    by_dim = _moment_sums_by_dim(df, vec_col)
    if not by_dim:
        raise ValueError("empty corpus: no non-null vectors to fit")
    dim = min(
        by_dim, key=lambda d: (-int(by_dim[d][0]), d)
    )
    if k is None:
        k = dim
    m = by_dim[dim]
    n = int(m[0])
    if n < 2:
        raise ValueError(f"need >=2 vectors to fit PCA, got {n}")
    s = m[1 : 1 + dim]
    xtx = m[1 + dim :].reshape(dim, dim)
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # symmetrize float noise for eigh
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # (k, d)
    # sign convention: largest-|coordinate| entry positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mean,
        components=np.ascontiguousarray(comps),
        explained_var=np.maximum(w[order], 0.0),
        n=n,
    )


def _dot_lit(vec: Column, row: np.ndarray) -> Column:
    lit_arr = F.array(*[F.lit(float(x)) for x in row])
    return F.aggregate(
        F.zip_with(vec, lit_arr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def project_pca(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pc",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Append ``out_col`` = the k PCA scores of each vector
    (optionally whitened: score / sqrt(eigenvalue), giving unit
    variance per axis). Pure expressions — the centered dot products
    compile to codegen; the k×d components travel inside the plan as
    literals (k·d doubles, trivially broadcast with the task
    binary)."""
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(float(x)) for x in model.mean]),
        lambda a, b: a - b,
    )
    scores = []
    for i in range(model.k):
        sc = _dot_lit(centered, model.components[i])
        if whiten:
            sc = sc / float(np.sqrt(model.explained_var[i] + eps))
        scores.append(sc)
    return df.withColumn(out_col, F.array(*scores))


def reconstruction_sse(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
) -> float:
    """Mean squared reconstruction error of the k-dim projection —
    the quality telemetry of a fitted PCA (analogous to q109's PQ
    reconstruction report). Computed distributed: project, rebuild
    from mean + components, one aggregate."""
    proj = project_pca(df, model, vec_col=vec_col, out_col="__pc")
    # rebuilt_j = mean_j + Σ_i pc_i * comp[i][j]; error via expressions
    comp_cols = [
        F.array(*[F.lit(float(x)) for x in model.components[:, j]])
        for j in range(model.dim)
    ]
    mean_arr = model.mean
    err_terms = []
    for j in range(model.dim):
        rebuilt_j = F.lit(float(mean_arr[j])) + F.aggregate(
            F.zip_with(F.col("__pc"), comp_cols[j], lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        orig_j = F.element_at(F.col(vec_col).cast("array<double>"), j + 1)
        err_terms.append(F.pow(orig_j - rebuilt_j, F.lit(2.0)))
    total = err_terms[0]
    for t in err_terms[1:]:
        total = total + t
    row = proj.agg(F.avg(total).alias("mse")).first()
    return float(row["mse"])


@dataclass
class OPQModel:
    """Parametric OPQ transform (Ge et al., CVPR 2013 — public):
    full-rank PCA rotation with the principal dimensions re-ordered
    by BALANCED greedy allocation across the m product-quantizer
    subspaces (each new dim, in descending-eigenvalue order, goes to
    the unfilled subspace with the smallest variance log-product).
    Decorrelates coordinates AND equalizes subspace information — the
    two properties that make per-subspace codebooks spend their bits
    evenly."""

    mean: np.ndarray       # (d,)
    rotation: np.ndarray   # (d, d) orthonormal; row blocks of d/m = subspaces
    m: int
    eigvals: np.ndarray    # (d,) variance of each ROTATED coordinate

    @property
    def dim(self) -> int:
        return int(self.mean.shape[0])

    def subspace_logvar(self) -> np.ndarray:
        """Σ log-eigenvalue per subspace — the balance telemetry."""
        sub_d = self.dim // self.m
        lv = np.log(np.maximum(self.eigvals, 1e-12))
        return lv.reshape(self.m, sub_d).sum(axis=1)


def fit_opq_rotation(
    df: DataFrame, vec_col: str = "embedding", m: int = 8
) -> OPQModel:
    """Fit the parametric-OPQ rotation: one distributed PCA fit
    (full rank) + a driver-side greedy allocation over the d
    eigenvalues — O(d log d), trivially bounded."""
    model = fit_pca(df, vec_col, k=None)
    d = model.dim
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    cap = d // m
    logv = np.log(np.maximum(model.explained_var, 1e-12))
    buckets: list[list[int]] = [[] for _ in range(m)]
    load = np.zeros(m)
    for i in range(d):  # descending eigenvalue order already
        open_b = [b for b in range(m) if len(buckets[b]) < cap]
        b = min(open_b, key=lambda j: (load[j], j))
        buckets[b].append(i)
        load[b] += logv[i]
    perm = [i for b in buckets for i in b]
    return OPQModel(
        mean=model.mean,
        rotation=np.ascontiguousarray(model.components[perm]),
        m=m,
        eigvals=model.explained_var[perm],
    )


def rotate_vectors(
    df: DataFrame,
    model: OPQModel,
    vec_col: str = "embedding",
    out_col: str = "rotated",
) -> DataFrame:
    """Append ``out_col`` = R·(x − mean): an Arrow-batched GEMM per
    batch (a full-rank rotation as d expression dot products would
    defeat codegen — d² multiplies per row belong in BLAS). Energy
    is preserved exactly up to float rounding (R orthonormal), so
    downstream PQ reconstruction errors are comparable in either
    frame. Malformed rows (null / wrong width) yield NULL."""
    from pyspark.sql.functions import pandas_udf

    R = model.rotation
    mu = model.mean
    d = model.dim

    @pandas_udf("array<double>")
    def rot(col: pd.Series) -> pd.Series:
        vals = col.tolist()
        ok = [
            i
            for i, v in enumerate(vals)
            if v is not None and len(v) == d
        ]
        out = [None] * len(vals)
        if ok:
            X = np.asarray([vals[i] for i in ok], dtype=np.float64) - mu
            Y = X @ R.T
            for j, i in enumerate(ok):
                out[i] = Y[j].tolist()
        return pd.Series(out)

    return df.withColumn(out_col, rot(F.col(vec_col)))
