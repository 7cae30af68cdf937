"""Distributed PCA (operators/embedops.py): moment-sum fit,
expression-only projection, whitening, reconstruction telemetry."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.catalog import table
from cr_data_pipeline_project_spark.operators.embedops import (
    fit_pca,
    project_pca,
    reconstruction_sse,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return table(spark, "embeddings", sf_dir).select("vec_id", "embedding")


@pytest.fixture(scope="module")
def model(emb):
    return fit_pca(emb, "embedding", k=6)


def _np_data(emb):
    rows = emb.orderBy("vec_id").collect()
    return np.array([r["embedding"] for r in rows], dtype=np.float64), [
        r["vec_id"] for r in rows
    ]


def test_components_orthonormal(model):
    g = model.components @ model.components.T
    assert np.allclose(g, np.eye(model.k), atol=1e-8)


def test_explained_variance_descending(model):
    ev = model.explained_var
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    assert ev[0] > 0


def test_fit_matches_numpy(emb, model):
    """Mean/covariance eigenstructure vs a straight numpy PCA of the
    collected corpus — the distributed moment path must agree."""
    X, _ = _np_data(emb)
    assert np.allclose(model.mean, X.mean(axis=0), atol=1e-9)
    cov = np.cov(X, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][: model.k]
    assert np.allclose(model.explained_var, np.maximum(w[order], 0), atol=1e-7)
    for i, j in enumerate(order):
        c = v[:, j]
        m = int(np.argmax(np.abs(c)))
        if c[m] < 0:
            c = -c
        assert np.allclose(model.components[i], c, atol=1e-6), f"component {i}"


def test_projection_matches_numpy(emb, model):
    X, ids = _np_data(emb)
    expected = (X - model.mean) @ model.components.T
    got = {
        r["vec_id"]: np.array(r["__pc"])
        for r in project_pca(emb, model, out_col="__pc").collect()
    }
    for vid, exp in zip(ids, expected):
        assert np.allclose(got[vid], exp, atol=1e-8)


def test_whitened_scores_unit_variance(emb, model):
    proj = project_pca(emb, model, out_col="__pc", whiten=True)
    X = np.array([r["__pc"] for r in proj.collect()])
    v = X.var(axis=0)
    assert np.allclose(v, 1.0, atol=1e-3)


def test_reconstruction_beats_mean_only(emb, model):
    """k-component reconstruction must beat the 0-component (mean
    only) baseline, and equal the eigenvalue tail by Pythagoras."""
    X, _ = _np_data(emb)
    mean_only_mse = float(((X - X.mean(axis=0)) ** 2).sum(axis=1).mean())
    mse = reconstruction_sse(emb, model)
    assert mse < mean_only_mse
    cov = np.cov(X, rowvar=False, bias=True)
    w = np.linalg.eigvalsh(cov)
    tail = float(np.sort(w)[::-1][model.k :].sum())
    assert abs(mse - tail) < 1e-6 * max(1.0, tail)


def test_fit_ignores_malformed_rows(spark, model, emb):
    """Null and wrong-width vectors don't poison the moments."""
    bad = spark.createDataFrame(
        [(10_001, None), (10_002, [1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    m2 = fit_pca(emb.unionByName(bad), "embedding", k=6)
    assert m2.n == model.n
    assert np.allclose(m2.components, model.components, atol=1e-9)


def test_fit_empty_raises(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty corpus"):
        fit_pca(empty, "embedding", k=2)


def test_projection_plan_is_codegen(emb, model):
    """The serve path stays JVM-side: no Python evals in the
    projection plan (the fit's mapInPandas is not part of it)."""
    plan = project_pca(emb, model, out_col="__pc")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ------------------------------------------------------------------ #
# parametric OPQ rotation                                             #
# ------------------------------------------------------------------ #


@pytest.fixture(scope="module")
def opq(emb):
    from cr_data_pipeline_project_spark.operators.embedops import (
        fit_opq_rotation,
    )

    return fit_opq_rotation(emb, "embedding", m=8)


def test_opq_rotation_orthonormal(opq):
    g = opq.rotation @ opq.rotation.T
    assert np.allclose(g, np.eye(opq.dim), atol=1e-8)


def test_opq_preserves_energy(spark, emb, opq):
    """‖R(x − μ)‖² == ‖x − μ‖² per vector (orthogonal transform)."""
    from cr_data_pipeline_project_spark.operators.embedops import (
        rotate_vectors,
    )

    rows = rotate_vectors(emb, opq, "embedding", "rot").limit(50).collect()
    for r in rows:
        x = np.asarray(r["embedding"], dtype=np.float64) - opq.mean
        y = np.asarray(r["rot"])
        assert abs(float(x @ x) - float(y @ y)) < 1e-9
        assert np.allclose(y, opq.rotation @ x, atol=1e-9)


def test_opq_allocation_balances_subspaces(emb, opq):
    """Greedy allocation's subspace log-variance spread must not
    exceed the naive contiguous PCA split's (it equalizes the
    per-subspace information PQ bits pay for)."""
    from cr_data_pipeline_project_spark.operators.embedops import fit_pca

    full = fit_pca(emb, "embedding", k=None)
    sub_d = full.dim // opq.m
    lv = np.log(np.maximum(full.explained_var, 1e-12))
    contiguous = lv.reshape(opq.m, sub_d).sum(axis=1)
    balanced = opq.subspace_logvar()
    assert balanced.max() - balanced.min() <= (
        contiguous.max() - contiguous.min()
    ) + 1e-9
    # same multiset of eigenvalues, just re-ordered
    assert np.allclose(
        np.sort(opq.eigvals), np.sort(full.explained_var), atol=1e-12
    )


def test_opq_rotation_null_and_malformed_rows(spark, opq):
    from cr_data_pipeline_project_spark.operators.embedops import (
        rotate_vectors,
    )

    bad = spark.createDataFrame(
        [(1, None), (2, [1.0] * 3)],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r["rot"] for r in
           rotate_vectors(bad, opq, "embedding", "rot").collect()}
    assert out[1] is None and out[2] is None


def test_opq_pq_error_comparable(spark, sf_dir):
    """End to end: PQ in the OPQ frame must not be worse than PQ in
    the raw frame beyond fit jitter (on anisotropic real corpora it
    is strictly better; the synthetic fixture is near-isotropic, so
    the contract here is 'no regression')."""
    from cr_data_pipeline_project_spark.plans import all_queries

    rows = {
        r["variant"]: r
        for r in all_queries()["q141_opq_pq_reconstruction"](
            spark, sf_dir
        ).collect()
    }
    assert rows["raw"]["n_vecs"] == rows["opq"]["n_vecs"] > 0
    assert rows["opq"]["mean_recon_err"] <= rows["raw"]["mean_recon_err"] * 1.10
